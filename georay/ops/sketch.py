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


def cms_partial(tokens: list[str], counts: np.ndarray,
                depth: int, width: int) -> pa.Table:
    """Count-min registers touched by one batch: (row, bucket, n) rows.
    Hash r of a token is the little-endian first-8-md5-bytes of
    ``"{r}|{token}"`` mod width (== DuckDB
    ``md5_number_upper(r || '|' || tok) % width``)."""
    from .md5vec import md5_u64_le
    rows = []
    for r in range(depth):
        h = md5_u64_le([f"{r}|{t}".encode("utf-8") for t in tokens])
        bucket = (h % np.uint64(width)).astype(np.int64)
        regs = np.zeros(width, dtype=np.int64)
        np.add.at(regs, bucket, counts)
        nz = np.flatnonzero(regs)
        rows.append(pa.table({
            "row": pa.array(np.full(len(nz), r, dtype=np.int64)),
            "bucket": pa.array(nz.astype(np.int64)),
            "n": pa.array(regs[nz])}))
    return pa.concat_tables(rows)


def cms_registers(ds: "ray.data.Dataset", depth: int = 4, width: int = 512,
                  *, text_col: str = "text") -> "ray.data.Dataset":
    """Count-min sketch over the tokenized column: per-batch partial
    registers (token counts hashed ``depth`` ways), one bounded
    groupby-SUM merge — the shuffle moves at most depth×width rows per
    block regardless of corpus size (the additive mergeable-summary
    dual of the HLL max-merge above).  Registers — not just point
    estimates — are bit-exact vs the SQL oracle; point queries
    (min over rows of register[r][h_r(tok)]) never underestimate."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        cnt: Counter = Counter()
        for t in batch[text_col].to_pylist():
            cnt.update(_WORD.findall((t or "").lower()))
        if not cnt:
            return pa.table({"row": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        toks = list(cnt.keys())
        counts = np.fromiter(cnt.values(), dtype=np.int64, count=len(toks))
        return cms_partial(toks, counts, depth, width)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (partials.groupby(["row", "bucket"])
            .aggregate(Sum("n", alias_name="n")))


def cms_point_estimate(registers: pd.DataFrame, tokens: list[str],
                       depth: int = 4, width: int = 512) -> np.ndarray:
    """Point-query estimates from merged registers (driver-side; the
    register table is at most depth×width rows): min over hash rows."""
    from .md5vec import md5_u64_le
    regs = np.zeros((depth, width), dtype=np.int64)
    if len(registers):
        regs[registers["row"].to_numpy(np.int64),
             registers["bucket"].to_numpy(np.int64)] = \
            registers["n"].to_numpy(np.int64)
    est = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        h = md5_u64_le([f"{r}|{t}".encode("utf-8") for t in tokens])
        bucket = (h % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, regs[r, bucket])
    return est


def bloom_bits(ds: "ray.data.Dataset", n_hashes: int = 3, m_bits: int = 4096,
               *, text_col: str = "text") -> "ray.data.Dataset":
    """Bloom filter over the distinct token vocabulary: the membership
    member of the sketch trio (HLL = cardinality, CMS = frequency,
    Bloom = membership).  Per batch, each distinct token sets
    ``n_hashes`` bit positions (hash r = md5 of ``"{r}|{token}"`` mod
    m, the CMS convention); the merge is one bounded distinct on the
    SET bit positions (≤ m rows total) — OR-mergeable like every
    register sketch here, and the BITS are compared exactly in SQL."""
    from .md5vec import md5_u64_le

    def partial(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for t in batch[text_col].to_pylist():
            seen.update(_WORD.findall((t or "").lower()))
        if not seen:
            return pa.table({"bit_pos": pa.array([], pa.int64())})
        toks = list(seen)
        bits = []
        for r in range(n_hashes):
            h = md5_u64_le([f"{r}|{t}".encode("utf-8") for t in toks])
            bits.append((h % np.uint64(m_bits)).astype(np.int64))
        return pa.table({"bit_pos": pa.array(
            np.unique(np.concatenate(bits)))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ..shuffle import distinct_on
    return distinct_on(partials, ["bit_pos"])


def bloom_might_contain(bits: "pd.DataFrame", tokens: list[str],
                        n_hashes: int = 3,
                        m_bits: int = 4096) -> np.ndarray:
    """Membership probe against merged bits (driver-side; ≤ m rows):
    True iff ALL n_hashes positions are set — no false negatives."""
    from .md5vec import md5_u64_le
    bitset = np.zeros(m_bits, dtype=bool)
    if len(bits):
        bitset[bits["bit_pos"].to_numpy(np.int64)] = True
    ok = np.ones(len(tokens), dtype=bool)
    for r in range(n_hashes):
        h = md5_u64_le([f"{r}|{t}".encode("utf-8") for t in tokens])
        ok &= bitset[(h % np.uint64(m_bits)).astype(np.int64)]
    return ok
