"""The clean-and-retry geocoding cascade, batch-local.

This is the engine's core operator: the whole 10-step cascade of
/root/reference/utils.py:1195-1279 (``process_addresses``) executes inside
ONE ``map_batches`` actor stage per batch — anti-joins between steps are
boolean masks, candidate explode + re-attach never leave the batch
(SURVEY.md §2.4: no shuffle needed), and the gazetteer/parser state is
built once per actor process.

Step internals mirror ``transform_and_process`` (utils.py:589-688),
``process_osm`` (utils.py:303-441), ``osm_parse_and_split``
(utils.py:443-539), ``add_addr_out_columns`` (utils.py:543-579),
``retry_with_low_place_rank`` (utils.py:225-299), and ``match_parent``
(check_result_utils.py:560-644).

Deviation from the reference (documented): ``output.other`` joins the
leftover address values in SORTED order — the reference joins a Python
set (utils.py:568-574), whose order is hash-randomized across processes;
sorting makes distributed runs deterministic.  The street comparator
splits on " - " and takes a max, so scores are unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .compare import keep_bests
from .config import (ADDR_KEY, C_SIM_CITY, C_SIM_HOUSENBR, C_SIM_POSTCODE,
                     C_SIM_STREET, C_SIM_STREET_WHICH, CITY, CMP_FIELDS,
                     COUNTRY, DROP_ADDR_ITEMS, HOUSENBR, INPUT_FIELDS,
                     M_CLEANSED_HN, M_DIST_TO_MATCH, M_METHOD, M_OSM_ORDER,
                     M_PLACE_ID, M_PLACE_RANK, M_REJECT_REASON,
                     M_TRANSFORMED, O_CITY, O_COUNTRY, O_DISPLAY,
                     O_HOUSENBR, O_IN_HOUSENBR, O_LAT, O_LON, O_LPOST_HN,
                     O_LPOST_UNIT, O_OTHER, O_POSTCODE, O_STREET, POSTCODE,
                     STATUS, STREET, PipelineConfig)
from .gazetteer import GazetteerSpec, get_gazetteer
from .geom import haversine_km
from .parser import AddressParser
from .transforms import apply_transformers, assemble_full_address

_COLLAPSE_STREET = ["road", "pedestrian", "footway", "cycleway", "path",
                    "address27", "construction", "hamlet", "park", "square"]
_COLLAPSE_CITY = ["town", "village", "city_district", "county", "city"]

# fixed output schema (SURVEY.md §1.4: fixed Arrow schema, open-ended tail
# collapsed into o_other)
RESULT_COLUMNS: dict[str, object] = {
    ADDR_KEY: "", STREET: "", HOUSENBR: "", POSTCODE: "", CITY: "",
    COUNTRY: "", STATUS: "", M_METHOD: "", M_TRANSFORMED: "",
    M_OSM_ORDER: -1, M_PLACE_RANK: -1, M_PLACE_ID: -1,
    M_REJECT_REASON: "", M_DIST_TO_MATCH: np.nan, M_CLEANSED_HN: False,
    **{c: "" for c in CMP_FIELDS},
    O_STREET: "", O_HOUSENBR: "", O_POSTCODE: "", O_CITY: "", O_COUNTRY: "",
    O_OTHER: "", O_DISPLAY: "", O_LAT: np.nan, O_LON: np.nan,
    O_IN_HOUSENBR: "", O_LPOST_HN: "", O_LPOST_UNIT: "",
    C_SIM_STREET: np.nan, C_SIM_HOUSENBR: np.nan, C_SIM_POSTCODE: np.nan,
    C_SIM_CITY: np.nan, C_SIM_STREET_WHICH: "",
    "candidate_json": "",
}

_FLOAT_COLS = {M_DIST_TO_MATCH, O_LAT, O_LON, C_SIM_STREET, C_SIM_HOUSENBR,
               C_SIM_POSTCODE, C_SIM_CITY}
_INT_COLS = {M_OSM_ORDER, M_PLACE_RANK, M_PLACE_ID}
_BOOL_COLS = {M_CLEANSED_HN}


def _result_type(col: str) -> pa.DataType:
    if col in _FLOAT_COLS:
        return pa.float64()
    if col in _INT_COLS:
        return pa.int64()
    if col in _BOOL_COLS:
        return pa.bool_()
    return pa.string()


# canonical Arrow schema of the finalized cascade frame (RESULT_COLUMNS
# order) — conversions to/from pandas at the batch boundary go through
# this instead of per-column type inference
RESULT_SCHEMA = pa.schema([(c, _result_type(c)) for c in RESULT_COLUMNS])


def _coalesce_from_dict(addr: dict, keys: list[str]) -> str | None:
    for k in keys:
        v = addr.get(k)
        if v is not None and v == v:
            return v
    return None


_CAND_COLS = [M_TRANSFORMED, M_OSM_ORDER, "n_place_id", "n_place_rank",
              "n_lat", "n_lon", "n_display_name", "n_category",
              "n_namedetails", O_STREET, O_CITY, O_HOUSENBR, O_COUNTRY,
              O_POSTCODE, O_OTHER, O_DISPLAY, O_LAT, O_LON]


def _shape_candidates(addr: str, results: list[dict],
                      with_json: bool = False) -> list[dict]:
    """Explode one geocode result list into candidate rows with the o_*
    columns derived (osm_parse_and_split + add_addr_out_columns,
    utils.py:443-579).  ``with_json`` attaches the raw geocoder record
    as a JSON string (``candidate_json``) — the long-mode full-fidelity
    tail the fixed o_* schema otherwise collapses (reference long mode
    returns every Nominatim field, nominatimwrapper.py:632-648)."""
    rows = []
    for order, r in enumerate(results):
        address = r.get("address", {})
        nd = r.get("namedetails") or {}
        # namedetails only kept for highways (utils.py:513-514)
        namedetails = (" - ".join(nd.values())
                       if r.get("category") == "highway" else "")
        o_street = _coalesce_from_dict(address, _COLLAPSE_STREET)
        o_city = _coalesce_from_dict(address, _COLLAPSE_CITY)
        o_hn = address.get("house_number")
        o_country = address.get("country")
        o_pc = address.get("postcode")
        picked = {o_street, o_city, o_hn, o_country, o_pc}
        other = sorted({v for k, v in address.items()
                        if k not in DROP_ADDR_ITEMS and v is not None
                        and v not in picked})
        extra = {}
        if with_json:
            import json as _json
            extra["candidate_json"] = _json.dumps(r, sort_keys=True,
                                                  default=str)
        rows.append({
            **extra,
            M_TRANSFORMED: addr, M_OSM_ORDER: order,
            "n_place_id": int(r["place_id"]),
            "n_place_rank": int(r["place_rank"]),
            "n_lat": float(r["lat"]), "n_lon": float(r["lon"]),
            "n_display_name": r.get("display_name", ""),
            "n_category": r.get("category", ""),
            "n_namedetails": namedetails,
            O_STREET: o_street, O_CITY: o_city, O_HOUSENBR: o_hn,
            O_COUNTRY: o_country, O_POSTCODE: o_pc,
            O_OTHER: " - ".join(other),
            O_DISPLAY: r.get("display_name", ""),
            O_LAT: float(r["lat"]), O_LON: float(r["lon"]),
        })
    return rows


def _explode_candidates(uniq_addrs: list[str], gazetteer, cfg: PipelineConfig
                        ) -> pd.DataFrame:
    """Per unique transformed address: geocode the free-text string and
    explode candidates.

    The shaped rows are memoized per worker on the gazetteer instance:
    real corpora are Zipf-skewed (the same street recurs across many
    documents), so across batches most addresses are repeats — the
    geocode + dict shaping then collapses to a dict hit.  Shared row
    dicts are read-only downstream (DataFrame construction copies)."""
    use_memo = cfg.with_worker_memos
    memo = getattr(gazetteer, "_explode_memo", None)
    if memo is None:
        memo = gazetteer._explode_memo = {}
    wj = cfg.with_candidate_json
    key_tail = (cfg.max_results, cfg.check_results, wj)
    rows = []
    for addr in uniq_addrs:
        hit = memo.get((addr, key_tail)) if use_memo else None
        if hit is None:
            results = gazetteer.search(addr, limit=cfg.max_results,
                                       namedetails=cfg.check_results,
                                       use_cache=use_memo)
            hit = _shape_candidates(addr, results, with_json=wj)
            if use_memo and len(memo) < (1 << 17):
                memo[(addr, key_tail)] = hit
        rows.extend(hit)
    cols = (["candidate_json"] if wj else []) + _CAND_COLS
    return pd.DataFrame(rows, columns=cols)


def _match_parent(results: pd.DataFrame, rejects: pd.DataFrame, gazetteer,
                  cfg: PipelineConfig) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Parent-place rescue for mismatch rejects of unmatched addresses
    (check_result_utils.py:560-644): street (highway) parents only, alt
    names exploded and re-validated."""
    if rejects.shape[0] == 0:
        return results, rejects
    cand = rejects[(rejects[M_REJECT_REASON] == "mismatch")
                   & (~rejects[ADDR_KEY].isin(results[ADDR_KEY]))]
    if cand.shape[0] == 0:
        return results, rejects
    # one details pass per UNIQUE place_id (round-3: was a per-row
    # iterrows loop with 2 point lookups each), then a vectorized
    # merge-explode of the highway parents' alt names
    alt_map_rows = []
    for pid in pd.unique(cand["n_place_id"]):
        det = gazetteer.details(pid)
        parent_id = det.get("parent_place_id", 0)
        if not parent_id:
            continue
        pdet = gazetteer.details(parent_id)
        if pdet.get("category") != "highway":
            continue
        for lang, alt in pdet.get("names", {}).items():
            alt_map_rows.append((pid, alt))
    if not alt_map_rows:
        return results, rejects
    alt_map = pd.DataFrame(alt_map_rows, columns=["n_place_id",
                                                  "n_alt_name"])
    alts = (cand.drop(columns=[M_REJECT_REASON])
            .reset_index(names="_src_index")
            .merge(alt_map, on="n_place_id", how="inner"))
    # alt equal to street name adds nothing (check_result_utils.py:617)
    alts = alts[alts["n_alt_name"] != alts[O_STREET]]
    if alts.shape[0] == 0:
        return results, rejects
    keep, _ = keep_bests(
        alts, street_cols_a=["n_alt_name"], housenbr_col_a=O_HOUSENBR,
        postcode_col_a=O_POSTCODE, city_col_a=O_CITY,
        street_col_b=STREET, housenbr_col_b=HOUSENBR,
        postcode_col_b=POSTCODE, city_col_b=CITY,
        secondary_sort_col=M_OSM_ORDER, threshold=cfg.similarity_threshold)
    if keep.shape[0] == 0:
        return results, rejects
    keep = keep.drop(columns=["n_alt_name", "_src_index"])
    results = pd.concat([results, keep], sort=False)
    saved = set(zip(keep[ADDR_KEY], keep["n_place_id"]))
    mask = [(k, p) in saved for k, p in
            zip(rejects[ADDR_KEY], rejects["n_place_id"])]
    rejects = rejects[~np.array(mask)]
    return results, rejects


def _structured_candidates(sent: pd.DataFrame, gazetteer,
                           cfg: PipelineConfig) -> pd.DataFrame:
    """osm_structured mode: query the geocoder with the five components
    directly instead of the assembled free-text string (get_osm_struct
    branch of process_osm, utils.py:352-375); dedup on the component
    tuple, keyed back via the transformed-address string."""
    uniq = sent.drop_duplicates(
        subset=[M_TRANSFORMED]).loc[:, [M_TRANSFORMED, STREET, HOUSENBR,
                                        POSTCODE, CITY, COUNTRY]]
    frames = []
    for row in uniq.itertuples(index=False):
        results = gazetteer.search_structured(
            street=getattr(row, STREET), housenumber=getattr(row, HOUSENBR),
            postcode=getattr(row, POSTCODE), city=getattr(row, CITY),
            country=getattr(row, COUNTRY), limit=cfg.max_results,
            namedetails=cfg.check_results,
            use_cache=cfg.with_worker_memos)
        frames.append((getattr(row, M_TRANSFORMED), results))
    rows = []
    wj = cfg.with_candidate_json
    for addr, results in frames:
        rows.extend(_shape_candidates(addr, results, with_json=wj))
    cols = (["candidate_json"] if wj else []) + _CAND_COLS
    return pd.DataFrame(rows, columns=cols)


def _process_osm(sent: pd.DataFrame, gazetteer, cfg: PipelineConfig,
                 check_results: bool) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Geocode + explode + validate-or-head(1) (utils.py:303-441)."""
    empty = pd.DataFrame(columns=list(sent.columns) + [M_REJECT_REASON])
    if sent.shape[0] == 0:
        return empty, empty
    if cfg.osm_structured:
        cands = _structured_candidates(sent, gazetteer, cfg)
    else:
        uniq = sent[M_TRANSFORMED].drop_duplicates().tolist()
        cands = _explode_candidates(uniq, gazetteer, cfg)
    osm = sent.merge(cands, on=M_TRANSFORMED)
    if osm.shape[0] == 0:
        return empty, empty
    if check_results:
        keep, reject = keep_bests(
            osm, street_cols_a=[O_STREET, O_OTHER, "n_namedetails"],
            housenbr_col_a=O_HOUSENBR, postcode_col_a=O_POSTCODE,
            city_col_a=O_CITY, street_col_b=STREET,
            housenbr_col_b=HOUSENBR, postcode_col_b=POSTCODE,
            city_col_b=CITY, secondary_sort_col=M_OSM_ORDER,
            threshold=cfg.similarity_threshold)
        if cfg.use_osm_parent:
            keep, reject = _match_parent(keep, reject, gazetteer, cfg)
    else:
        keep = osm.groupby(ADDR_KEY, sort=False).head(1).copy()
        reject = osm[~osm.index.isin(keep.index)].copy()
        reject[M_REJECT_REASON] = "tail"
    return keep, reject


def _retry_low_place_rank(results: pd.DataFrame, sent: pd.DataFrame,
                          gazetteer, cfg: PipelineConfig,
                          check_results: bool) -> pd.DataFrame:
    """Strip the house number to leading digits and re-geocode results with
    place_rank < 30; keep retries that reach rank 30
    (utils.py:225-299)."""
    low = results[results["n_place_rank"] < 30]
    if low.shape[0] == 0:
        return results
    retry = low[[ADDR_KEY]].merge(sent, on=ADDR_KEY)
    hn = retry[HOUSENBR].fillna("").astype(str)
    retry = retry[~hn.str.match(r"^[0-9]*$")]
    if retry.shape[0] == 0:
        return results
    retry = retry.copy()
    retry[HOUSENBR] = (retry[HOUSENBR].fillna("").astype(str)
                       .str.extract(r"^([0-9]+)")[0].fillna(""))
    retry[M_TRANSFORMED] = assemble_full_address(retry)
    keep, _ = _process_osm(retry, gazetteer, cfg, check_results)
    if keep.shape[0] == 0:
        return results
    keep = keep[keep["n_place_rank"] == 30].copy()
    if keep.shape[0] == 0:
        return results
    keep[M_CLEANSED_HN] = True
    return pd.concat([results[~results[ADDR_KEY].isin(keep[ADDR_KEY])], keep],
                     sort=False)


def _transform_and_process(chunk: pd.DataFrame, transformers: list[str],
                           gazetteer, parser, cfg: PipelineConfig
                           ) -> tuple[pd.DataFrame, pd.DataFrame, dict]:
    """One cascade step (utils.py:589-688)."""
    method = "+".join(transformers)
    stats = {"method": method, "todo": int(chunk.shape[0]), "sent": 0,
             "match": 0, "match_26": 0, "reject_rec": 0, "reject_addr": 0,
             "reject_mism": 0}
    empty = pd.DataFrame(columns=[ADDR_KEY])
    if chunk.shape[0] == 0:
        return empty, empty, stats
    transformed = apply_transformers(chunk, transformers, parser, gazetteer, cfg)
    if transformed.shape[0] == 0:
        return empty, empty, stats
    transformed = transformed.copy()
    transformed[M_TRANSFORMED] = assemble_full_address(transformed)
    if cfg.check_with_transformed:
        sent = transformed
    else:
        sent = transformed[[M_TRANSFORMED, ADDR_KEY]].merge(
            chunk, on=ADDR_KEY)
    stats["sent"] = int(sent.shape[0])
    results, rejected = _process_osm(sent, gazetteer, cfg, cfg.check_results)
    if cfg.with_cleansed_number_on_26 and results.shape[0] > 0:
        results = _retry_low_place_rank(results, sent, gazetteer, cfg,
                                        cfg.check_results)
    results = results.copy()
    results[M_METHOD] = method
    rejected = rejected.copy()
    rejected[M_METHOD] = method
    # compare-time echo: freeze the exact four strings the comparator
    # saw on every candidate row BEFORE _run_cascade restores the
    # original input columns — rows from the cleansed-hn retry carry
    # the digits-only house number they were actually re-scored with.
    # These make every cascade method SQL-scorable downstream (the
    # adjudication / selection oracles read them as snapshot params).
    for fr in (results, rejected):
        if fr.shape[0] == 0:
            continue
        for cmp_col, src in zip(CMP_FIELDS,
                                (STREET, HOUSENBR, POSTCODE, CITY)):
            fr[cmp_col] = (fr[src].fillna("").astype(str)
                           if src in fr.columns else "")
    stats["match"] = int(results.shape[0])
    # full reference step-stats parity (utils.py:678-686): cleansed-hn
    # match count, distinct rejected addresses, distinct mismatches
    stats["match_26"] = (
        int(sum(x is True or x == 1 for x in results[M_CLEANSED_HN]
                if x == x and x is not None))
        if M_CLEANSED_HN in results.columns else 0)
    stats["reject_rec"] = int(rejected.shape[0])
    stats["reject_addr"] = (int(rejected[ADDR_KEY].nunique())
                            if rejected.shape[0] else 0)
    stats["reject_mism"] = (
        int(rejected.loc[rejected[M_REJECT_REASON] == "mismatch",
                         ADDR_KEY].nunique())
        if rejected.shape[0] and M_REJECT_REASON in rejected.columns else 0)
    return results, rejected, stats


def _extra_house_number(df: pd.DataFrame, parser) -> pd.DataFrame:
    """libpostal house-number extraction for matched rows
    (utils.py:783-846): o_in_house_number = input housenumber,
    o_lpost_house_number / o_lpost_unit from parsing
    'street hn, pc city'."""
    if df.shape[0] == 0:
        return df
    df = df.copy()
    df[O_IN_HOUSENBR] = df[HOUSENBR].fillna("").astype(str)
    full = (df[STREET].fillna("").astype(str) + " "
            + df[HOUSENBR].fillna("").astype(str) + ", "
            + df[POSTCODE].fillna("").astype(str) + " "
            + df[CITY].fillna("").astype(str)).str.strip()

    def _hn(s):
        try:
            pairs = parser.parse(s)
            return (";".join(v for v, l in pairs if l == "house_number"),
                    ";".join(v for v, l in pairs if l == "unit"))
        except Exception:
            err = "error during Libpostal processing"  # utils.py:806-807
            return (err, err)

    vals = [_hn(s) for s in full]
    df[O_LPOST_HN] = [v[0] for v in vals]
    df[O_LPOST_UNIT] = [v[1] for v in vals]
    return df


def _finalize(df: pd.DataFrame, extra_cols: list[str]) -> pd.DataFrame:
    """Project to the fixed result schema with stable dtypes.

    Built as a dict of typed numpy arrays then ONE DataFrame
    construction: the previous column-by-column insert ran three full
    passes per string column (astype(object) + where + fillna/astype)
    plus block-manager consolidation per insert — pure memory traffic,
    which is what caps multi-worker scaling on a shared socket."""
    n = len(df)
    data: dict = {}
    for col, default in RESULT_COLUMNS.items():
        if col in df.columns:
            v = df[col]
            if col in _FLOAT_COLS:
                data[col] = pd.to_numeric(v, errors="coerce").to_numpy(
                    dtype=np.float64, na_value=np.nan)
            elif col in _INT_COLS:
                if pd.api.types.is_integer_dtype(v):
                    # already exact — no float64 round-trip (ids above
                    # 2^53 would silently corrupt)
                    data[col] = v.to_numpy(dtype=np.int64)
                elif pd.api.types.is_float_dtype(v):
                    # exactness already bounded by the float64 source
                    data[col] = v.to_numpy(dtype=np.float64,
                                           na_value=-1.0).astype(np.int64)
                else:
                    try:  # object column of python ints / NA: exact via
                        # the nullable Int64 extension array
                        ia = pd.array(v.to_numpy(dtype=object,
                                                 na_value=None),
                                      dtype="Int64")
                        data[col] = ia.to_numpy(dtype=np.int64,
                                                na_value=-1)
                    except (ValueError, TypeError):
                        data[col] = pd.to_numeric(
                            v, errors="coerce").to_numpy(
                            dtype=np.float64, na_value=-1.0
                        ).astype(np.int64)
            elif col in _BOOL_COLS:
                a = v.to_numpy(dtype=object, na_value=False)
                data[col] = np.fromiter((bool(x) for x in a), dtype=bool,
                                        count=n)
            else:
                a = v.to_numpy(dtype=object, na_value="")
                if not all(type(x) is str for x in a):
                    a = np.array([x if type(x) is str
                                  else ("" if x is None else str(x))
                                  for x in a], dtype=object)
                data[col] = a
        else:
            if col in _FLOAT_COLS:
                data[col] = np.full(n, np.float64(default))
            elif col in _INT_COLS:
                data[col] = np.full(n, np.int64(default))
            elif col in _BOOL_COLS:
                data[col] = np.full(n, bool(default))
            else:
                data[col] = np.full(n, str(default), dtype=object)
    for col in extra_cols:
        data[col] = (df[col].to_numpy() if col in df.columns
                     else np.full(n, None, dtype=object))
    return pd.DataFrame(data, index=df.index)


def _run_cascade(inputs: pd.DataFrame, gazetteer, parser,
                 cfg: PipelineConfig,
                 stats_out: list | None = None) -> pd.DataFrame:
    """The cascade proper over a NORMALIZED input frame (str-typed base
    columns) → fixed-schema finalized frame.  Factored out so the
    per-worker result memo can run it on unique-address representatives
    only (see process_addresses_df)."""
    import time as _time
    base_cols = [ADDR_KEY] + INPUT_FIELDS
    chunk = inputs
    matches = []
    rejects = []
    for step_idx, transformers in enumerate(cfg.cascade):
        t0 = _time.perf_counter()
        try:
            res, rej, _stats = _transform_and_process(
                chunk, transformers, gazetteer, parser, cfg)
        except Exception as exc:  # step failure labels, never kills (utils.py:1255-1261)
            res = chunk[[ADDR_KEY]].copy()
            res[M_METHOD] = "error on " + "+".join(transformers) + f": {type(exc).__name__}"
            rej = pd.DataFrame(columns=[ADDR_KEY])
            _stats = {"method": "+".join(transformers),
                      "todo": int(chunk.shape[0]), "sent": 0,
                      "match": int(res.shape[0]), "match_26": 0,
                      "reject_rec": 0, "reject_addr": 0, "reject_mism": 0}
        if stats_out is not None:
            _stats["step"] = step_idx
            _stats["seconds"] = round(_time.perf_counter() - t0, 6)
            stats_out.append(_stats)
        if res.shape[0] > 0:
            matches.append(res)
        if rej.shape[0] > 0 and cfg.with_rejected:
            rejects.append(rej)
        matched_keys = res[ADDR_KEY] if res.shape[0] else pd.Series([], dtype=object)
        chunk = chunk[~chunk[ADDR_KEY].isin(matched_keys)]
        if chunk.shape[0] == 0:
            break

    match_df = (pd.concat(matches, sort=False).drop_duplicates(
        subset=[ADDR_KEY]) if matches else pd.DataFrame(columns=[ADDR_KEY]))
    rej_df = (pd.concat(rejects, sort=False) if rejects
              else pd.DataFrame(columns=[ADDR_KEY]))

    # restore original input columns (utils.py:1271)
    match_df = match_df.drop(columns=[c for c in INPUT_FIELDS
                                      if c in match_df.columns])
    match_df = match_df.merge(inputs[base_cols], on=ADDR_KEY, how="left")
    if cfg.with_extra_house_number and match_df.shape[0] > 0:
        match_df = _extra_house_number(match_df, parser)

    # reject → distance to that address's match (utils.py:1080-1093)
    if rej_df.shape[0] > 0 and "n_lat" in rej_df.columns and "n_lat" in match_df.columns:
        m = match_df[[ADDR_KEY, "n_lat", "n_lon"]].rename(
            columns={"n_lat": "_mlat", "n_lon": "_mlon"})
        rej_df = rej_df.merge(m, on=ADDR_KEY, how="left")
        ok = rej_df["_mlat"].notna() & rej_df["n_lat"].notna()
        d = np.full(len(rej_df), np.nan)
        if ok.any():
            d[ok.to_numpy()] = np.round(haversine_km(
                rej_df.loc[ok, "n_lat"], rej_df.loc[ok, "n_lon"],
                rej_df.loc[ok, "_mlat"], rej_df.loc[ok, "_mlon"]), 3)
        rej_df[M_DIST_TO_MATCH] = d

    match_df[M_PLACE_ID] = match_df.get("n_place_id", pd.Series(dtype=float))
    match_df[M_PLACE_RANK] = match_df.get("n_place_rank", pd.Series(dtype=float))
    match_df[STATUS] = "match"
    if rej_df.shape[0] > 0:
        rej_df[M_PLACE_ID] = rej_df.get("n_place_id", pd.Series(dtype=float))
        rej_df[M_PLACE_RANK] = rej_df.get("n_place_rank", pd.Series(dtype=float))
        rej_df[STATUS] = "reject"
        rej_df = rej_df.drop(columns=[c for c in INPUT_FIELDS
                                      if c in rej_df.columns])
        rej_df = rej_df.merge(inputs[base_cols], on=ADDR_KEY, how="left")

    unmatched = inputs[~inputs[ADDR_KEY].isin(match_df[ADDR_KEY])].copy()
    unmatched[STATUS] = "unmatched"

    parts = [p for p in (match_df, rej_df, unmatched) if p.shape[0] > 0]
    if not parts:
        return _finalize(pd.DataFrame(columns=base_cols), [])
    allrows = pd.concat(parts, sort=False, ignore_index=True)
    return _finalize(allrows, [])


def _cascade_with_memo(inputs: pd.DataFrame, gazetteer, parser,
                       cfg: PipelineConfig) -> pd.DataFrame:
    """Per-worker FULL-CASCADE memo keyed on the 5 input fields: the
    cascade is a deterministic function of (street, housenumber,
    postcode, city, country) — addr_key only labels rows — and real
    corpora repeat addresses heavily (the bench corpus is 83% repeats),
    so the cascade runs once per UNIQUE address per worker and every
    other occurrence assembles its result rows from typed cached arrays.

    The memo is capped per worker per config; overflow keys are still
    computed (and served batch-locally), just not retained."""
    memo_all = getattr(gazetteer, "_cascade_memo", None)
    if memo_all is None:
        memo_all = gazetteer._cascade_memo = {}
    ckey = repr(cfg)
    sub = memo_all.get(ckey)
    if sub is None:
        sub = memo_all[ckey] = {}

    keys = list(zip(*(inputs[c].tolist() for c in INPUT_FIELDS)))
    aks = inputs[ADDR_KEY].tolist()
    reps, seen = [], set()
    for i, k in enumerate(keys):
        if k not in sub and k not in seen:
            seen.add(k)
            reps.append(i)
    local: dict = {}
    if reps:
        # SYNTHETIC representative keys: a caller batch may reuse one
        # addr_key for different address tuples (the REST layer rejects
        # that, this function must not crash on it) — unique synthetic
        # keys guarantee one output group per representative tuple.
        # Real keys never enter this frame, so only uniqueness among
        # reps matters; keys must be plain printable strings (pandas'
        # string hashtable truncates at an embedded NUL, collapsing
        # groups).
        rep_inputs = inputs.iloc[reps].copy()
        rep_aks = [f"r{j}" for j in range(len(reps))]
        rep_inputs[ADDR_KEY] = rep_aks
        out_rep = _run_cascade(rep_inputs, gazetteer, parser, cfg)
        rec_cols = [c for c in out_rep.columns if c != ADDR_KEY]
        ak_to_key = dict(zip(rep_aks, (keys[i] for i in reps)))
        # contiguous-slice storage (a pandas groupby per representative
        # address would re-introduce per-group overhead): stable-sort by
        # addr_key, slice + COPY per key (a view would pin the whole
        # representative batch's arrays in the memo for its lifetime)
        akcol = out_rep[ADDR_KEY].to_numpy()
        order = np.argsort(akcol, kind="mergesort")
        aks_sorted = akcol[order]
        arrs = {c: out_rep[c].to_numpy()[order] for c in rec_cols}
        starts = np.flatnonzero(np.r_[True,
                                      aks_sorted[1:] != aks_sorted[:-1]])
        ends = np.r_[starts[1:], len(aks_sorted)]
        for s, e in zip(starts, ends):
            s, e = int(s), int(e)
            rec = {c: arrs[c][s:e].copy() for c in rec_cols}
            k = ak_to_key[aks_sorted[s]]
            local[k] = rec
            if len(sub) < (1 << 15):
                sub[k] = rec
    per_row = [sub.get(k) or local[k] for k in keys]
    counts = np.array([len(r[STATUS]) for r in per_row])
    data = {ADDR_KEY: np.repeat(np.array(aks, dtype=object), counts)}
    if per_row:
        for c in per_row[0]:
            data[c] = np.concatenate([r[c] for r in per_row])
    return pd.DataFrame(data)


def process_addresses_df(df: pd.DataFrame, gazetteer, parser,
                         cfg: PipelineConfig,
                         stats_out: list | None = None) -> pd.DataFrame:
    """Full cascade over one batch of addresses → fixed-schema frame with
    one row per match/reject plus 'unmatched' stubs
    (utils.py:1195-1279).

    ``stats_out`` (optional list) receives one dict per executed cascade
    step: {step, method, todo, sent, match, reject_rec, seconds} — the
    reference's ``timestats``/step-stats analogue (base.py:275-301,
    utils.py:678-686), surfaced instead of discarded.  Stats passes
    bypass the result memo so counters reflect the real cascade."""
    base_cols = [ADDR_KEY] + INPUT_FIELDS
    extra_cols = [c for c in df.columns if c not in base_cols]
    inputs = df[base_cols].copy()
    for c in base_cols:
        inputs[c] = inputs[c].fillna("").astype(str)

    if (stats_out is None and cfg.with_cascade_memo
            and inputs.shape[0] > 0):
        out = _cascade_with_memo(inputs, gazetteer, parser, cfg)
    else:
        out = _run_cascade(inputs, gazetteer, parser, cfg, stats_out)
    if extra_cols:
        out = out.merge(df[[ADDR_KEY] + extra_cols].drop_duplicates(
            subset=[ADDR_KEY]), on=ADDR_KEY, how="left")
    return out


class CascadeGeocoder:
    """Actor-pool callable for ``map_batches``: gazetteer + parser built
    once per actor process (``get_gazetteer`` is process-cached), the full
    cascade applied per batch (SURVEY.md §2.3)."""

    def __init__(self, spec: GazetteerSpec | None = None,
                 cfg: PipelineConfig | None = None):
        self.spec = spec or GazetteerSpec()
        self.cfg = cfg or PipelineConfig()
        self.gazetteer = get_gazetteer(self.spec)
        self.parser = AddressParser()
        self.parser.memo_enabled = self.cfg.with_worker_memos

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Arrow-native split (round-4, mirrors the span path): only the
        6 input columns enter pandas; any passthrough columns are
        re-attached on the Arrow side with an integer take — the whole-
        batch ``to_pandas`` round-trip was the flat path's dominant
        memory traffic."""
        import pyarrow.compute as pc
        base = [ADDR_KEY] + INPUT_FIELDS
        extra = [c for c in batch.column_names if c not in base]
        df = batch.select(base).to_pandas()
        out = process_addresses_df(df, self.gazetteer, self.parser,
                                   self.cfg)
        res_tbl = pa.Table.from_pandas(out[list(RESULT_COLUMNS)],
                                       schema=RESULT_SCHEMA,
                                       preserve_index=False)
        if not extra:
            return res_tbl
        # cascade emits >=1 row per addr_key; keys are batch-unique
        lookup = {k: i for i, k in enumerate(batch[ADDR_KEY].to_pylist())}
        idx = pa.array([lookup[k] for k in out[ADDR_KEY]], pa.int64())
        cols = {c: res_tbl[c] for c in res_tbl.column_names}
        for c in extra:
            cols[c] = pc.take(batch[c], idx)
        return pa.table(cols)


# Per-worker-process component cache for the STATELESS-TASK execution
# plan: Ray task workers are long-lived and reused across tasks and
# dataset executions, so a module-level cache gives the same state
# amortization as an actor pool WITHOUT fixed pool sizing, per-execution
# actor spawn cost (process fork + imports + index build), or CPU
# reservation — the scheduler stays elastic.  Actor pools remain the
# right tool for heavy state (GPU models); for a ~30 MB deterministic
# index, cached tasks measure strictly faster (bench.py history).
_PROCESS_COMPONENT_CACHE: dict = {}


def _tune_worker_gc() -> None:
    """Freeze the long-lived gazetteer/parser/memo objects out of the GC
    scan set and raise the gen-0 threshold — the cascade allocates
    millions of short-lived objects per batch, and cyclic-GC rescans of
    the frozen index were measurable overhead at high worker counts.
    SCOPED to the cascade: non-cascade batch fns restore default GC via
    ``_workergc.default_gc`` when they take over a reused worker (see
    _workergc docstring for the measured interference)."""
    from ._workergc import cascade_gc
    cascade_gc()


def span_cascade_fn(spec: GazetteerSpec | None = None,
                    cfg: PipelineConfig | None = None):
    """Build a picklable stateless-task batch fn running the span cascade
    with per-process component caching."""
    spec = spec or GazetteerSpec()
    cfg = cfg or PipelineConfig()
    key = ("span_cascade", spec, repr(cfg))

    def fn(batch: pa.Table) -> pa.Table:
        worker = _PROCESS_COMPONENT_CACHE.get(key)
        if worker is None:
            worker = SpanCascadeGeocoder(spec=spec, cfg=cfg)
            _PROCESS_COMPONENT_CACHE[key] = worker
        _tune_worker_gc()  # no-op when already in cascade GC mode
        return worker(batch)

    return fn


def address_cascade_fn(spec: GazetteerSpec | None = None,
                       cfg: PipelineConfig | None = None):
    """Stateless-task batch fn for the flat-address cascade."""
    spec = spec or GazetteerSpec()
    cfg = cfg or PipelineConfig()
    key = ("addr_cascade", spec, repr(cfg))

    def fn(batch: pa.Table) -> pa.Table:
        worker = _PROCESS_COMPONENT_CACHE.get(key)
        if worker is None:
            worker = CascadeGeocoder(spec=spec, cfg=cfg)
            _PROCESS_COMPONENT_CACHE[key] = worker
        _tune_worker_gc()  # no-op when already in cascade GC mode
        return worker(batch)

    return fn


STEP_STATS_SCHEMA = pa.schema([
    ("step", pa.int64()), ("method", pa.string()), ("todo", pa.int64()),
    ("sent", pa.int64()), ("match", pa.int64()), ("match_26", pa.int64()),
    ("reject_rec", pa.int64()), ("reject_addr", pa.int64()),
    ("reject_mism", pa.int64()), ("seconds", pa.float64())])


def step_stats_fn(spec: GazetteerSpec | None = None,
                  cfg: PipelineConfig | None = None,
                  spans: bool = False):
    """Stateless-task batch fn for a dedicated stats pass: runs the full
    cascade per batch and emits ONE ROW PER CASCADE STEP with the
    reference's timestats/step-stats counters (base.py:275-301 reset per
    request; utils.py:678-686 todo/sent/match/reject) instead of the
    geocode rows.  Aggregate with ``pipeline.step_stats``."""
    spec = spec or GazetteerSpec()
    cfg = cfg or PipelineConfig()
    key = ("addr_cascade", spec, repr(cfg))

    def fn(batch: pa.Table) -> pa.Table:
        worker = _PROCESS_COMPONENT_CACHE.get(key)
        if worker is None:
            worker = CascadeGeocoder(spec=spec, cfg=cfg)
            _PROCESS_COMPONENT_CACHE[key] = worker
        if spans:
            from .spans import explode_spans
            df = explode_spans(batch).to_pandas()
            df = df[df["is_address"]]
        else:
            df = batch.to_pandas()
        stats: list[dict] = []
        if df.shape[0]:
            process_addresses_df(df[[ADDR_KEY] + INPUT_FIELDS],
                                 worker.gazetteer, worker.parser, worker.cfg,
                                 stats_out=stats)
        return pa.Table.from_pylist(
            [{k: s.get(k) for k in STEP_STATS_SCHEMA.names} for s in stats],
            schema=STEP_STATS_SCHEMA)

    return fn


class SpanCascadeGeocoder(CascadeGeocoder):
    """Cascade over exploded document spans: only rows with
    ``is_address == True`` enter the cascade; other spans pass through with
    status='not_address' so the downstream re-assembly sees every span
    (the span-sequence invariant)."""

    PASSTHROUGH = ["doc_id", "span_idx", "kind", "text", "media_ref",
                   "offset", "is_address"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Arrow-native split: only address rows (≈30% of spans) enter
        pandas, and only their 6 input columns — the heavy ``text``
        passthrough column never leaves Arrow (the cascade's dominant
        memory traffic was converting every span's text to Python objects
        and back, plus two object-string merges, per batch)."""
        import pyarrow.compute as pc
        mask = batch["is_address"]
        addr_tbl = batch.filter(mask)
        rest_tbl = batch.filter(pc.invert(mask))
        parts = []
        if addr_tbl.num_rows > 0:
            addr_df = addr_tbl.select([ADDR_KEY] + INPUT_FIELDS).to_pandas()
            out = process_addresses_df(addr_df, self.gazetteer,
                                       self.parser, self.cfg)
            res_tbl = pa.Table.from_pandas(out[list(RESULT_COLUMNS)],
                                           schema=RESULT_SCHEMA,
                                           preserve_index=False)
            # passthrough re-attach: integer take on the Arrow side (the
            # cascade emits >=1 row per addr_key; keys are batch-unique)
            lookup = {k: i for i, k in enumerate(
                addr_tbl[ADDR_KEY].to_pylist())}
            idx = pa.array([lookup[k] for k in out[ADDR_KEY]], pa.int64())
            cols = {c: res_tbl[c] for c in res_tbl.column_names}
            for c in self.PASSTHROUGH:
                cols[c] = pc.take(addr_tbl[c], idx)
            parts.append(pa.table(cols))
        if rest_tbl.num_rows > 0 or not parts:
            n = rest_tbl.num_rows
            cols = {}
            for col, default in RESULT_COLUMNS.items():
                if col == ADDR_KEY:
                    cols[col] = rest_tbl[ADDR_KEY]
                elif col == STATUS:
                    cols[col] = pa.repeat(pa.scalar("not_address"), n)
                else:
                    cols[col] = pa.repeat(
                        pa.scalar(default, _result_type(col)), n)
            for c in self.PASSTHROUGH:
                cols[c] = rest_tbl[c]
            parts.append(pa.table(cols))
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)
