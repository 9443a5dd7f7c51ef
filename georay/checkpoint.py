"""Checkpointed, resumable runs: per-partition lineage + counters.

North-rule requirement (BASELINE.json): "every partition emits lineage
records and counters to a checkpoint store so runs resume mid-pipeline".
The reference has none of this (a crash loses the whole batch,
SURVEY.md §3.3).

Design: the job driver splits the input into shards (files or row
ranges).  Each shard runs as its own streaming Dataset pipeline and
writes one output partition directory; on completion a lineage record
(shard id, rows in/out, status counters, wall seconds, output path) is
appended to ``manifest.jsonl``.  On resume, completed shards are skipped
— output is idempotent at shard granularity, never one giant file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import ray.data


class Manifest:
    """Append-only JSONL lineage store for one run directory."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "manifest.jsonl")
        self._done: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        self._done[rec["partition_id"]] = rec

    def is_done(self, partition_id: str) -> bool:
        return partition_id in self._done

    def record(self, partition_id: str, **fields) -> None:
        rec = {"partition_id": partition_id, "ts": time.time(), **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._done[partition_id] = rec

    def records(self) -> list[dict]:
        return list(self._done.values())


def run_resumable(shards: list[tuple[str, Callable[[], "ray.data.Dataset"]]],
                  out_dir: str,
                  counters_fn: Callable[["ray.data.Dataset"], dict] | None = None,
                  step_stats_builders: dict[str, Callable[[], "ray.data.Dataset"]] | None = None,
                  write_fn: Callable[["ray.data.Dataset", str], None] | None = None
                  ) -> Manifest:
    """Run each (partition_id, dataset_builder) shard to its own parquet
    partition directory, skipping shards the manifest already marks done.

    ``counters_fn`` (optional) computes per-partition metric counters from
    the shard's output dataset (e.g. status counts) — stored in the
    lineage record.

    ``step_stats_builders`` (optional) maps partition_id -> a builder of
    that shard's per-cascade-step stats Dataset (``pipeline.step_stats``:
    one row per step with todo/sent/match/reject counters and wall
    seconds).  When given, each lineage record carries a ``step_stats``
    list, so a resumed run's manifest shows where the time and the
    matches went per partition.  The stats pass re-runs the cascade
    memo-free (stats must reflect the real per-step flow, not cache
    hits), roughly doubling shard cost — an audit-run option.

    ``write_fn`` (optional) writes a Dataset to a directory path —
    defaults to ``Dataset.write_parquet``; pass ``tables.write_table``
    to route output through the Lance-or-Parquet table adapter.

    ``out_dir`` must be a LOCAL-filesystem path (or a mounted one): the
    crash-idempotent commit uses an atomic directory rename, which object
    stores don't provide.  For s3://-style outputs, point ``out_dir`` at
    local/NFS staging and sync committed partitions, or swap the
    tmp-dir+rename for a pyarrow.fs-based marker-file protocol.
    """
    import shutil
    if "://" in out_dir and not out_dir.startswith("file://"):
        raise ValueError(
            f"run_resumable requires a local-filesystem out_dir, got "
            f"{out_dir!r} (atomic rename is the commit primitive)")
    manifest = Manifest(out_dir)
    for partition_id, build in shards:
        if manifest.is_done(partition_id):
            continue
        t0 = time.time()
        part_dir = os.path.join(out_dir, f"part={partition_id}")
        # crash idempotency: a shard killed mid-write must not leave
        # partial files that a resume would double-count — write to a
        # .tmp dir and rename into place before recording the manifest
        part_tmp = part_dir + ".tmp"
        for stale in (part_tmp, part_dir):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        ds = build()
        (write_fn or ray.data.Dataset.write_parquet)(ds, part_tmp)
        os.rename(part_tmp, part_dir)
        out = ray.data.read_parquet(part_dir)
        rows = out.count()
        counters = counters_fn(out) if counters_fn else {}
        extra: dict = {}
        stats_build = (step_stats_builders or {}).get(partition_id)
        if stats_build is not None:
            sdf = stats_build().to_pandas().sort_values("step")
            extra["step_stats"] = [
                {k: (round(float(v), 6) if k == "seconds" else
                     v if isinstance(v, str) else int(v))
                 for k, v in rec.items()}
                for rec in sdf.to_dict("records")]
        manifest.record(partition_id, rows=rows,
                        seconds=round(time.time() - t0, 3),
                        path=part_dir, counters=counters, **extra)
    return manifest


def _rollup(ds: "ray.data.Dataset", col: str) -> dict:
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.group_by(col).aggregate([([], "count_all")])
        return t.rename_columns([col, "n"])
    pdf = (ds.map_batches(fn, batch_format="pyarrow")
             .groupby(col).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    return {str(k): int(v) for k, v in zip(pdf[col], pdf["n"])}


def status_counters(ds: "ray.data.Dataset") -> dict:
    """Default per-partition counters: rows per status label (the
    reference's step stats analogue, utils.py:678-686)."""
    try:
        return _rollup(ds, "status")
    except Exception:
        return {}


def pipeline_counters(ds: "ray.data.Dataset") -> dict:
    """Lineage counters for a geocode-output partition: rows per status
    AND per cascade step/method (match + reject counts by ``m_method``
    — the per-step slice of the reference's step stats that is derivable
    from the output rows; exact todo/sent per step come from the
    dedicated ``pipeline.step_stats`` pass)."""
    out: dict = {}
    try:
        out["status"] = _rollup(ds, "status")
        import pyarrow.compute as pc
        match = ds.map_batches(
            lambda b: b.filter(pc.equal(b["status"], "match")),
            batch_format="pyarrow")
        out["match_by_method"] = _rollup(match, "m_method")
    except Exception:
        pass
    return out
