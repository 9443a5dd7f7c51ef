"""Deterministic sampling operators for training-data curation.

At 100 TB, RNG-based sampling is irreproducible across reruns, cluster
sizes and partial failures; content-addressed sampling (order by a hash
of the stable row id) gives the same sample for the same input on any
topology, and is exactly SQL-replicable (``ORDER BY md5(id)``) for the
oracle.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def _md5_str(v) -> str:
    return hashlib.md5(str(v).encode("utf-8")).hexdigest()


def hash_weighted_keep(ds, id_col: str, weight_col: str,
                       scale: int = 1000):
    """Deterministic importance subsampling: keep a row iff
    ``md5(str(id)) lower-64 (big-endian) mod scale < weight`` — each
    row survives with probability weight/scale, but the coin flip is
    the row's CONTENT hash, so reruns, resumes, cluster sizes, and
    incremental corpus growth all keep exactly the same rows (the
    property quality-weighted training-data resampling needs; an RNG
    would resample history on every change).  Stateless single map, no
    shuffle; SQL mirrors it via the hex-parsed md5 (see content_split
    for why DuckDB's md5_number builtins don't apply)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        hv = np.array(
            [int(hashlib.md5(str(v).encode()).hexdigest()[16:], 16)
             % scale for v in ids], np.int64)
        return batch.filter(pa.array(hv < w))

    return ds.map_batches(keep, batch_format="pyarrow")


def content_split(ds, id_col: str, weights=(80, 10, 10),
                  names=("train", "val", "test")):
    """Deterministic train/val/test split by content hash: a row's split
    is ``md5(str(id)) mod sum(weights)`` bucketed by the cumulative
    weights — no RNG state, so any rerun, cluster size, resume, or
    late-arriving shard lands every row in the same split (the property
    a training-data pipeline needs for reproducible holdouts and for
    splitting incrementally-growing corpora without reshuffling old
    rows).  Stateless single map; no shuffle.  Emits (id, split)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    total = int(sum(weights))
    cuts = np.cumsum(weights)

    def assign(batch: pa.Table) -> pa.Table:
        # lower 64 hex digits big-endian: SQL mirrors it exactly via
        # cast('0x' || substr(md5(id), 17, 16) as ubigint) — DuckDB's
        # md5_number_* builtins are byte-reversed and would not match
        ids = batch[id_col].to_pylist()
        hv = np.array(
            [int(hashlib.md5(str(v).encode()).hexdigest()[16:], 16)
             % total for v in ids], np.int64)
        si = np.searchsorted(cuts, hv, side="right")
        return pa.table({id_col: batch[id_col],
                         "split": pa.array([names[i] for i in si],
                                           pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")


def deterministic_sample_per_key(ds, key_col: str, id_col: str,
                                 k: int) -> pa.Table:
    """Stratified sample: the ``k`` rows with the smallest
    ``md5(str(id))`` per key (ties broken by id) — a reproducible
    per-stratum sample with no RNG state.

    Plan (no shuffle): per-batch partial top-k per key inside
    ``map_batches`` — each task emits at most (keys-in-batch x k) rows —
    then one driver merge bounded by keys x blocks x k.  The same
    partial-then-merge shape as the global top-k operator; with many
    strata swap the driver merge for a keyed groupby."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, id_col]).to_pandas()
        df["_h"] = [_md5_str(v) for v in df[id_col]]
        df = df.sort_values(["_h", id_col], kind="mergesort")
        df = df.groupby(key_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({key_col: pa.array([], pa.string()),
                         id_col: pa.array([], pa.int64())})
    final = (parts.sort_values(["_h", id_col], kind="mergesort")
             .groupby(key_col, sort=False).head(k))
    final = final.sort_values([key_col, "_h"], kind="mergesort")
    return pa.Table.from_pandas(final[[key_col, id_col]],
                                preserve_index=False)
