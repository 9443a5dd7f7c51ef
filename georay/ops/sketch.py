"""Distributed sketches: HyperLogLog distinct-count registers.

The sketch is built per batch (one row per touched bucket) and merged by
one tiny ``groupby(bucket).max`` — the shuffle moves at most
2^p × blocks rows regardless of input size, the classic
mergeable-summary shape for 100-TB cardinality estimation.

Determinism: the value hash is the little-endian first 8 md5 digest
bytes (== DuckDB ``md5_number_upper``, the same convention as
ops/dedup), so the REGISTERS themselves — not just the estimate — are
reproducible in ANSI SQL and oracle-checked bit-for-bit
(entrylib.q_doc_hll_registers).  The float estimate is driver-side only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max

_WORD = re.compile(r"\w+", re.ASCII)


def _hash64(values: list[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8],
                        "little") for v in values],
        dtype=np.uint64)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized exact bit length of uint64 values (no float log2 —
    misrounds near powers of two)."""
    w = w.copy()
    out = np.zeros(len(w), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        w[big] >>= np.uint64(shift)
    out[w > 0] += 1
    return out


def hll_partial(values: list[str], p: int) -> pa.Table:
    """Registers touched by one batch of values: (bucket, rho) rows."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if values:
        h = _hash64(values)
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        # rho: 1-based position of the first set bit in the (64-p)-bit
        # suffix, (64-p)+1 when the suffix is all zeros
        rho = (64 - p) - _bit_length_u64(w) + 1
        np.maximum.at(regs, bucket, rho)
    nz = np.flatnonzero(regs)
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "rho": pa.array(regs[nz])})


def hll_registers(ds: "ray.data.Dataset", p: int = 10, *,
                  text_col: str = "text",
                  tokenize: bool = True) -> "ray.data.Dataset":
    """HyperLogLog registers over the (tokenized) column: per-batch
    partial registers, one bounded groupby-max merge.

    ``tokenize=True`` counts distinct lowercased ``\\w+`` tokens (the
    corpus-vocabulary cardinality); ``False`` counts distinct raw cell
    values."""
    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col].to_pylist()
        if tokenize:
            seen: set[str] = set()
            for t in col:
                seen.update(_WORD.findall((t or "").lower()))
            vals = list(seen)
        else:
            vals = list({v for v in col if v is not None})
        return hll_partial(vals, p)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bucket").aggregate(Max("rho", alias_name="rho"))


def hll_estimate(registers: pd.DataFrame, p: int = 10) -> float:
    """Standard HLL estimate from merged registers (driver-side; the
    register table is at most 2^p rows).  Includes the small-range
    linear-counting correction."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if len(registers):
        regs[registers["bucket"].to_numpy(np.int64)] = \
            registers["rho"].to_numpy(np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
