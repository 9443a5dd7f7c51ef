"""Cascade semantics tests: transformer steps, changed-only filter,
keep-best labeling, low-rank retry, parent rescue, method labels
(SURVEY.md §3.1 traced behaviors).  Pure batch-local — no Ray needed."""

import pandas as pd
import pytest

from georay.cascade import process_addresses_df
from georay.config import (ADDR_KEY, CITY, COUNTRY, HOUSENBR, POSTCODE,
                           STREET, PipelineConfig)
from georay.corpus import make_addresses
from georay.gazetteer import GazetteerSpec, get_gazetteer
from georay.parser import AddressParser
from georay.transforms import apply_transformers, clean_addr_in


@pytest.fixture(scope="module")
def world():
    spec = GazetteerSpec()
    return spec, get_gazetteer(spec), AddressParser(), PipelineConfig()


def _addr(key, street, hn, pc, city, country="Belgium"):
    return {ADDR_KEY: key, STREET: street, HOUSENBR: hn, POSTCODE: pc,
            CITY: city, COUNTRY: country}


def _run(world, rows):
    spec, gaz, parser, cfg = world
    return process_addresses_df(pd.DataFrame(rows), gaz, parser, cfg)


def test_clean_addr_in():
    # utils.py:107-131 examples
    assert clean_addr_in("Avenue Fonsny, , , , ") == "Avenue Fonsny"
    assert clean_addr_in("Avenue Fonsny, , 1060, , ") == "Avenue Fonsny, 1060"
    assert clean_addr_in(", , x") == "x"


def test_changed_only_filter(world):
    spec, gaz, parser, cfg = world
    df = pd.DataFrame([_addr("1", "Avenue Fonsny", "20", "1060", "Bruxelles")])
    # nonum blanks the housenumber -> changed -> kept
    out = apply_transformers(df, ["nonum"], parser, gaz, cfg)
    assert len(out) == 1 and out.iloc[0][HOUSENBR] == ""
    # nonum on an already-empty housenumber -> unchanged -> dropped
    df2 = pd.DataFrame([_addr("1", "Avenue Fonsny", "", "1060", "Bruxelles")])
    out2 = apply_transformers(df2, ["nonum"], parser, gaz, cfg)
    assert len(out2) == 0
    # orig passes everything through
    assert len(apply_transformers(df, ["orig"], parser, gaz, cfg)) == 1


def test_clean_address_matches_at_orig(world):
    spec, gaz, parser, cfg = world
    st = gaz.places[gaz.places.place_rank == 26].iloc[0]
    out = _run(world, [_addr("k1", st["name"], "4", st["post_code"],
                             st["post_name"])])
    m = out[out.status == "match"]
    assert len(m) == 1
    assert m.iloc[0]["m_method"] == "orig"
    assert m.iloc[0]["m_place_rank"] == 30       # building-level
    assert m.iloc[0]["o_house_number"] == "4"
    assert m.iloc[0]["c_sim_street"] >= 0.5
    # original input restored on the output row (utils.py:1271)
    assert m.iloc[0][STREET] == st["name"]


def test_box_number_triggers_cleansed_retry(world):
    spec, gaz, parser, cfg = world
    st = gaz.places[gaz.places.place_rank == 26].iloc[0]
    out = _run(world, [_addr("k1", st["name"], "4 bt 2", st["post_code"],
                             st["post_name"])])
    m = out[out.status == "match"]
    assert len(m) == 1
    # "4 bt 2" can't hit a building directly; retry with leading digits does
    assert m.iloc[0]["m_place_rank"] == 30
    assert bool(m.iloc[0]["m_match_on_cleansed_house_number"]) is True


def test_street_only_match_is_rank_26(world):
    spec, gaz, parser, cfg = world
    st = gaz.places[gaz.places.place_rank == 26].iloc[0]
    out = _run(world, [_addr("k1", st["name"], "", st["post_code"],
                             st["post_name"])])
    m = out[out.status == "match"]
    assert len(m) == 1 and m.iloc[0]["m_place_rank"] == 26


def test_nostreet_final_fallback(world):
    spec, gaz, parser, cfg = world
    city = gaz.places[gaz.places.place_rank == 16].iloc[0]
    # valid postcode, hopeless street -> ends at nostreet with a city match
    out = _run(world, [_addr("k1", "Zzzz Qqqq Xyzzy", "99", city["post_code"],
                             city["post_name"])])
    m = out[out.status == "match"]
    assert len(m) == 1
    assert m.iloc[0]["m_method"] == "nostreet"
    assert m.iloc[0]["m_place_rank"] == 16


def test_garbage_is_unmatched(world):
    out = _run(world, [_addr("k1", "Qwxyz Zzyzx", "1", "123", "Atlantis")])
    assert (out.status == "unmatched").all()


def test_misspelling_recovered_by_photon_step(world):
    spec, gaz, parser, cfg = world
    streets = gaz.places[(gaz.places.place_rank == 26)
                         & (gaz.places.name.str.len() >= 12)]
    st = streets.iloc[0]
    name = st["name"]
    mis = name[:4] + name[5:]          # drop 5th char
    out = _run(world, [_addr("k1", mis, "4", st["post_code"], st["post_name"])])
    m = out[out.status == "match"]
    assert len(m) == 1
    assert "photon" in m.iloc[0]["m_method"]


def test_parent_rescue_on_dutch_only_road(world):
    spec, gaz, parser, cfg = world
    # variant-9 streets: road reported NL-only but name_fr exists
    cand = gaz.places[(gaz.places.place_rank == 26)
                      & (gaz.places.name_fr != "")
                      & (gaz.places.street_name == gaz.places.name_nl)]
    assert len(cand) > 0, "synthetic world must contain NL-only-road streets"
    st = cand.iloc[0]
    out = _run(world, [_addr("k1", st["name_fr"], "4", st["post_code"],
                             st["post_name"])])
    m = out[out.status == "match"]
    assert len(m) == 1
    # matched the building whose road is the Dutch name -> only possible
    # via the parent-place alt-name rescue (check_result_utils.py:560-644)
    assert m.iloc[0]["m_method"] == "orig"
    assert m.iloc[0]["m_place_rank"] == 30
    assert m.iloc[0]["o_street_name"] == st["name_nl"]


def test_rejects_have_distance_to_match(world):
    spec, gaz, parser, cfg = world
    st = gaz.places[gaz.places.place_rank == 26].iloc[0]
    out = _run(world, [_addr("k1", st["name"], "", st["post_code"],
                             st["post_name"])])
    rej = out[out.status == "reject"]
    if len(rej):  # same-name streets in the hot city produce tail rejects
        assert (rej["m_reject_reason"].isin(["tail", "mismatch"])).all()
        assert rej["m_distance_to_match"].notna().all()


def test_full_batch_every_class_resolves(world):
    spec, gaz, parser, cfg = world
    addrs = make_addresses(120, spec=spec, seed=11)
    out = process_addresses_df(
        addrs.drop(columns=["truth_class", "truth_street_place_id"]),
        gaz, parser, cfg)
    m = out[out.status == "match"]
    # one match max per address; >=90% match rate on the synthetic mix
    assert m[ADDR_KEY].is_unique
    assert len(m) >= 0.9 * 120
    # all input keys accounted for
    assert set(out[ADDR_KEY]) == set(addrs[ADDR_KEY])
    # extra house number columns populated for matches
    assert (m["o_in_house_number"] == m[HOUSENBR]).all()


def test_osm_structured_mode(world):
    spec, gaz, parser, _ = world
    from georay.config import PipelineConfig
    cfg = PipelineConfig(osm_structured=True)
    st = gaz.places[gaz.places.place_rank == 26].iloc[0]
    out = process_addresses_df(
        pd.DataFrame([_addr("k1", st["name"], "4", st["post_code"],
                            st["post_name"])]), gaz, parser, cfg)
    m = out[out.status == "match"]
    assert len(m) == 1 and m.iloc[0]["m_place_rank"] == 30
    assert m.iloc[0]["m_method"] == "orig"


def test_nozip_nocountry_transformers(world):
    spec, gaz, parser, cfg = world
    df = pd.DataFrame([_addr("1", "Avenue Fonsny", "20", "1060",
                             "Bruxelles")])
    out = apply_transformers(df, ["nozip"], parser, gaz, cfg)
    assert len(out) == 1 and out.iloc[0][POSTCODE] == ""
    out2 = apply_transformers(df, ["nocountry"], parser, gaz, cfg)
    assert len(out2) == 1 and out2.iloc[0][COUNTRY] == ""


def test_cascade_memo_cold_warm_identical():
    """The per-worker result memo must be invisible in outputs: a batch
    processed cold (memo empty), then again warm (all hits), and with
    the memo disabled, yields identical rows."""
    import pandas as pd

    from georay.cascade import process_addresses_df
    from georay.config import ADDR_KEY, PipelineConfig
    from georay.gazetteer import GazetteerSpec, get_gazetteer
    from georay.parser import AddressParser

    gaz = get_gazetteer(GazetteerSpec())
    # fresh memo namespace for this test's config
    parser = AddressParser()
    st = gaz.places[gaz.places.place_rank == 26].head(4)
    rows = []
    for i, (_, s) in enumerate(st.iterrows()):
        for rep in range(2):   # in-batch duplicates too
            rows.append({ADDR_KEY: f"m{i}_{rep}", "street_name": s["name"],
                         "house_number": "4", "post_code": s["post_code"],
                         "post_name": s["post_name"],
                         "country_name": "Belgium"})
    df = pd.DataFrame(rows)
    cfg_memo = PipelineConfig(with_cascade_memo=True)
    cfg_plain = PipelineConfig(with_cascade_memo=False)

    def canon(out):
        return (out.sort_values([ADDR_KEY, "status", "m_place_id"])
                .reset_index(drop=True)
                .sort_index(axis=1))

    cold = canon(process_addresses_df(df, gaz, parser, cfg_memo))
    warm = canon(process_addresses_df(df, gaz, parser, cfg_memo))
    plain = canon(process_addresses_df(df, gaz, parser, cfg_plain))
    pd.testing.assert_frame_equal(cold, warm)
    pd.testing.assert_frame_equal(cold, plain)


def test_cascade_memo_duplicate_addr_key_different_tuples():
    """A batch may (illegitimately but non-fatally) reuse one addr_key
    for different address tuples — the memo path must produce the same
    rows as the plain path, not crash (synthetic representative keys)."""
    import pandas as pd

    from georay.cascade import process_addresses_df
    from georay.config import ADDR_KEY, PipelineConfig
    from georay.gazetteer import GazetteerSpec, get_gazetteer
    from georay.parser import AddressParser

    gaz = get_gazetteer(GazetteerSpec())
    parser = AddressParser()
    st = gaz.places[gaz.places.place_rank == 26].head(2)
    rows = []
    for _, s in st.iterrows():   # SAME addr_key, two different streets
        rows.append({ADDR_KEY: "same_key", "street_name": s["name"],
                     "house_number": "4", "post_code": s["post_code"],
                     "post_name": s["post_name"],
                     "country_name": "Belgium"})
    df = pd.DataFrame(rows)

    # memo path: each row resolves via its own tuple (the plain path's
    # key-based joins fan out on duplicated keys — the REST layer
    # rejects them; this path must stay sane, not crash)
    out = process_addresses_df(df, gaz, parser,
                               PipelineConfig(with_cascade_memo=True))
    matches = out[out["status"] == "match"]
    assert len(matches) == 2               # one per distinct tuple
    assert set(matches["street_name"]) == set(st["name"])
    assert (out[ADDR_KEY] == "same_key").all()


def test_worker_memos_off_identical():
    """with_worker_memos=False (cache-neutral scaling mode) must yield
    byte-identical cascade output: every per-address component memo
    (shaped-candidate explode, photon features, gazetteer candidate /
    result caches, parser memo, free-text parse cache) is a pure
    memoization, so disabling them changes cost only."""
    import pandas as pd

    from georay.cascade import process_addresses_df
    from georay.config import ADDR_KEY, PipelineConfig
    from georay.gazetteer import GazetteerSpec, get_gazetteer
    from georay.parser import AddressParser

    gaz = get_gazetteer(GazetteerSpec())
    parser = AddressParser()
    st = gaz.places[gaz.places.place_rank == 26].head(5)
    rows = []
    for i, (_, s) in enumerate(st.iterrows()):
        rows.append({ADDR_KEY: f"w{i}", "street_name": s["name"],
                     "house_number": "4", "post_code": s["post_code"],
                     "post_name": s["post_name"],
                     "country_name": "Belgium"})
        rows.append({ADDR_KEY: f"w{i}t", "street_name": s["name"][:-1] + "x",
                     "house_number": "999", "post_code": s["post_code"],
                     "post_name": s["post_name"],
                     "country_name": "Belgium"})  # typo path: fuzzy probes
    df = pd.DataFrame(rows)
    on = PipelineConfig(with_cascade_memo=False, with_worker_memos=True)
    off = PipelineConfig(with_cascade_memo=False, with_worker_memos=False)

    def canon(out):
        return (out.sort_values([ADDR_KEY, "status", "m_place_id"])
                .reset_index(drop=True)
                .sort_index(axis=1))

    a = canon(process_addresses_df(df, gaz, parser, on))
    # run the memo-on path TWICE so caches are warm, then compare off
    a2 = canon(process_addresses_df(df, gaz, parser, on))
    p_off = AddressParser()
    p_off.memo_enabled = False
    b = canon(process_addresses_df(df, gaz, p_off, off))
    pd.testing.assert_frame_equal(a, a2)
    pd.testing.assert_frame_equal(a, b)
