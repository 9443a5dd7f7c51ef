"""Per-step cascade statistics (the reference's timestats analogue,
base.py:275-301 + utils.py:678-686) and checkpoint lineage counters."""

import pandas as pd

import ray.data

from georay.cascade import process_addresses_df
from georay.config import ADDR_KEY, INPUT_FIELDS, PipelineConfig
from georay.gazetteer import GazetteerSpec, get_gazetteer
from georay.parser import AddressParser

SPEC = GazetteerSpec()


def _addr_frame(n=6):
    gaz = get_gazetteer(SPEC)
    streets = gaz.places[gaz.places.place_rank == 26].head(n)
    rows = []
    for i, (_, st) in enumerate(streets.iterrows()):
        rows.append({ADDR_KEY: f"k{i}", "street_name": st["name"],
                     "house_number": "4", "post_code": st["post_code"],
                     "post_name": st["post_name"], "country_name": "Belgium"})
    # one unresolvable row exercises the deeper cascade steps
    rows.append({ADDR_KEY: "kx", "street_name": "Zzz Qqq Nowhere",
                 "house_number": "999", "post_code": "9999",
                 "post_name": "Nulleville", "country_name": "Belgium"})
    return pd.DataFrame(rows)


def test_stats_out_reconciles():
    gaz = get_gazetteer(SPEC)
    parser = AddressParser()
    cfg = PipelineConfig()
    stats = []
    out = process_addresses_df(_addr_frame(), gaz, parser, cfg,
                               stats_out=stats)
    assert stats, "stats_out must receive one record per executed step"
    # counters reconcile with the output statuses
    n_match_rows = int((out["status"] == "match").sum())
    assert sum(s["match"] for s in stats) == n_match_rows
    # todo chain: step k+1 todo == step k todo - step k matches
    for prev, cur in zip(stats, stats[1:]):
        assert cur["todo"] == prev["todo"] - prev["match"]
    for s in stats:
        assert s["seconds"] >= 0.0
        # full reference parity (utils.py:678-686)
        assert set(s) >= {"step", "method", "todo", "sent", "match",
                          "match_26", "reject_rec", "reject_addr",
                          "reject_mism", "seconds"}
        assert s["reject_addr"] <= s["reject_rec"]
        assert s["reject_mism"] <= s["reject_addr"]


def test_step_stats_dataset_rollup(ray_session):
    from georay.pipeline import step_stats
    df = _addr_frame()
    ds = ray.data.from_pandas(df).repartition(2)
    stats = step_stats(ds, spec=SPEC).to_pandas()
    assert set(stats.columns) == {"step", "method", "todo", "sent", "match",
                                  "match_26", "reject_rec", "reject_addr",
                                  "reject_mism", "seconds"}
    first = stats[stats["step"] == 0].iloc[0]
    assert first["method"] == "orig"
    assert int(first["todo"]) == len(df)
    # cascade resolves the resolvable rows at step 0
    assert int(first["match"]) >= len(df) - 2


def test_pipeline_counters(ray_session, tmp_path):
    from georay.checkpoint import pipeline_counters, run_resumable
    from georay.pipeline import geocode_addresses

    df = _addr_frame()

    def build():
        return geocode_addresses(ray.data.from_pandas(df), spec=SPEC,
                                 with_tiles=False)

    manifest = run_resumable([("p0", build)], str(tmp_path / "run"),
                             counters_fn=pipeline_counters)
    rec = manifest.records()[0]
    counters = rec["counters"]
    assert "status" in counters and "match_by_method" in counters
    assert counters["status"].get("match", 0) >= len(df) - 2
    assert sum(counters["match_by_method"].values()) == \
        counters["status"].get("match", 0)


def test_manifest_step_stats_reconcile(ray_session, tmp_path):
    """Lineage records carry per-step counters+seconds (VERDICT r2 #8)
    and reconcile with the partition's own status counters: the stats
    pass re-runs the same deterministic cascade, so summed per-step
    match counts must equal the output's matched rows."""
    from georay.checkpoint import pipeline_counters, run_resumable
    from georay.pipeline import geocode_addresses, step_stats

    df = _addr_frame()
    cfg = PipelineConfig(with_rejected=False)

    def build():
        return geocode_addresses(ray.data.from_pandas(df), spec=SPEC,
                                 cfg=cfg, with_tiles=False)

    def build_stats():
        return step_stats(ray.data.from_pandas(df), spec=SPEC, cfg=cfg)

    out_dir = str(tmp_path / "run")
    manifest = run_resumable([("p0", build)], out_dir,
                             counters_fn=pipeline_counters,
                             step_stats_builders={"p0": build_stats})
    rec = manifest.records()[0]
    steps = rec["step_stats"]
    assert steps and steps == sorted(steps, key=lambda s: s["step"])
    for s in steps:
        assert set(s) >= {"step", "method", "todo", "sent", "match",
                          "seconds"}
        assert s["seconds"] >= 0.0
    assert sum(s["match"] for s in steps) == \
        rec["counters"]["status"].get("match", 0)
    # the record survives a manifest reload (resume path reads JSONL)
    from georay.checkpoint import Manifest
    rec2 = Manifest(out_dir).records()[0]
    assert rec2["step_stats"] == steps
