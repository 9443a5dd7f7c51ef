"""User-extension surface + sink packing: custom transformer registry
(SURVEY.md §2.9), struct sink (§1.4), table adapter."""

import pandas as pd
import pytest

import ray.data

from georay.config import HOUSENBR, STREET, PipelineConfig
from georay.gazetteer import GazetteerSpec, get_gazetteer
from georay.parser import AddressParser
from georay.transforms import (TRANSFORMER_REGISTRY, apply_transformers,
                               register_transformer)

SPEC = GazetteerSpec()


def test_register_custom_transformer_in_cascade():
    # NOTE: the changed-only filter compares case-insensitively
    # (utils.py:774), so the custom step must make a real change
    def strip_marker(df, parser, gaz, cfg):
        df = df.copy()
        df[STREET] = df[STREET].str.replace(" ZZZ", "", regex=False)
        return df

    register_transformer("stripmarker", strip_marker)
    try:
        gaz = get_gazetteer(SPEC)
        st = gaz.places[gaz.places.place_rank == 26].iloc[0]
        df = pd.DataFrame([{"addr_key": "1", STREET: st["name"] + " ZZZ",
                            HOUSENBR: "4", "post_code": st["post_code"],
                            "post_name": st["post_name"],
                            "country_name": "Belgium"}])
        out = apply_transformers(df, ["stripmarker"], AddressParser(), gaz,
                                 PipelineConfig())
        assert out.iloc[0][STREET] == st["name"]
        # an upper-case-only transformer is filtered as unchanged
        register_transformer("uppercase",
                             lambda d, p, g, c: d.assign(
                                 **{STREET: d[STREET].str.upper()}))
        out2 = apply_transformers(df, ["uppercase"], AddressParser(), gaz,
                                  PipelineConfig())
        assert len(out2) == 0
        # custom step also runs inside a full cascade config
        cfg = PipelineConfig()
        cfg.cascade.insert(1, ["stripmarker"])
        from georay.cascade import process_addresses_df
        res = process_addresses_df(df, gaz, AddressParser(), cfg)
        m = res[res.status == "match"]
        assert len(m) == 1 and m.iloc[0]["m_method"] == "stripmarker"
    finally:
        TRANSFORMER_REGISTRY.pop("stripmarker", None)
        TRANSFORMER_REGISTRY.pop("uppercase", None)


def test_register_rejects_builtin_collision():
    with pytest.raises(ValueError):
        register_transformer("photon", lambda *a: None)
    with pytest.raises(ValueError):
        register_transformer("regex[init]", lambda *a: None)


def test_pack_nested_sink(ray_session, tmp_path):
    from georay.corpus import make_addresses
    from georay.pipeline import geocode_addresses, pack_nested
    from georay.tables import write_table

    addrs = make_addresses(20, spec=SPEC, seed=2).drop(
        columns=["truth_class", "truth_street_place_id"])
    ds = geocode_addresses(ray.data.from_pandas(addrs), spec=SPEC,
                           batch_size=32)
    nested = pack_nested(ds)
    schema = nested.schema()
    import pyarrow as pa
    by_name = dict(zip(schema.names, schema.types))
    assert pa.types.is_struct(by_name["input"])
    assert pa.types.is_struct(by_name["output"])
    assert pa.types.is_struct(by_name["spatial"])
    # round-trips through the table adapter (parquet in this sandbox)
    out_dir = str(tmp_path / "nested")
    write_table(nested, out_dir)
    back = ray.data.read_parquet(out_dir).to_pandas()
    assert len(back) == nested.count()
    row = back.iloc[0]
    assert "street_name" in row["input"]
    assert "lat" in row["output"]
