"""Vectorized MD5 over batches of short messages.

The dedup family's per-token cost is one ``hashlib.md5`` call per
n-gram (round-3 verdict's top perf nit): the md5 CHOICE is load-bearing
— the LSH oracles replicate signatures in SQL via DuckDB's
``md5_number_upper``/``md5`` builtins bit-for-bit — so the fix is not a
different hash but a batched implementation: the full MD5 compression
function (published RFC 1321 algorithm) evaluated with numpy uint32
lanes across ALL messages of a batch at once.  64 steps of vectorized
32-bit arithmetic over m-element arrays replace m Python-level digest
calls; messages are grouped by padded block count so ragged lengths
stay dense.  Parity with ``hashlib.md5`` is pinned by tests (exact +
hypothesis).

Scope: optimized for SHORT messages (shingles, words, n-grams — 1-3
blocks).  Messages longer than ``_FALLBACK_BLOCKS`` blocks fall back to
``hashlib`` (rare tail; a huge message would otherwise widen the whole
group's matrix).
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np

assert sys.byteorder == "little", "md5vec assumes a little-endian host"

# RFC 1321 constants
_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
              + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, dtype=np.uint32)
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64)))
              * (2.0 ** 32)).astype(np.uint64).astype(np.uint32)
# message word index per step
_G = np.array([i for i in range(16)]
              + [(5 * i + 1) % 16 for i in range(16, 32)]
              + [(3 * i + 5) % 16 for i in range(32, 48)]
              + [(7 * i) % 16 for i in range(48, 64)], dtype=np.int64)

_INIT = (np.uint32(0x67452301), np.uint32(0xEFCDAB89),
         np.uint32(0x98BADCFE), np.uint32(0x10325476))

_FALLBACK_BLOCKS = 16  # > ~1 KB messages go through hashlib
_CHUNK_BYTES = 1 << 20  # per-chunk padded-matrix budget (arena-recyclable)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _compress_group(padded: np.ndarray, nblocks: int) -> np.ndarray:
    """MD5 over a dense (g, nblocks*64) uint8 matrix of fully padded
    messages -> (g, 16) uint8 digests."""
    g = padded.shape[0]
    words = np.ascontiguousarray(padded).view("<u4").reshape(g, nblocks, 16)
    a0 = np.full(g, _INIT[0], dtype=np.uint32)
    b0 = np.full(g, _INIT[1], dtype=np.uint32)
    c0 = np.full(g, _INIT[2], dtype=np.uint32)
    d0 = np.full(g, _INIT[3], dtype=np.uint32)
    for blk in range(nblocks):
        m = words[:, blk, :]                     # (g, 16)
        a, b, c, d = a0.copy(), b0.copy(), c0.copy(), d0.copy()
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            f = f + a + _K[i] + m[:, _G[i]]      # uint32 wraps
            a, d, c = d, c, b
            b = b + _rotl(f, int(_S[i]))
        a0 += a
        b0 += b
        c0 += c
        d0 += d
    out = np.empty((g, 16), dtype=np.uint8)
    out[:, 0:4] = a0.view(np.uint8).reshape(g, 4)
    out[:, 4:8] = b0.view(np.uint8).reshape(g, 4)
    out[:, 8:12] = c0.view(np.uint8).reshape(g, 4)
    out[:, 12:16] = d0.view(np.uint8).reshape(g, 4)
    return out


def md5_digests(msgs: list[bytes]) -> np.ndarray:
    """(m, 16) uint8 MD5 digests of ``msgs`` — bit-identical to
    ``hashlib.md5(msg).digest()`` per row."""
    m = len(msgs)
    if m == 0:
        return np.empty((0, 16), dtype=np.uint8)
    lens = np.fromiter((len(s) for s in msgs), dtype=np.int64, count=m)
    buf = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    offs = np.zeros(m, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return md5_digests_ranges(buf, offs, lens)


def md5_digests_ranges(buf: np.ndarray, offs: np.ndarray,
                       lens: np.ndarray) -> np.ndarray:
    """MD5 digests of ``m`` messages given as (offset, length) ranges of
    one shared uint8 buffer — the zero-copy form for overlapping
    messages (rolling n-gram shingles ARE slices of the joined token
    stream, so callers skip building one Python string per gram
    entirely).

    Messages are grouped by EXACT length: each group's padded block
    matrix is one dense gather from the buffer with the padding bytes
    (0x80 + bit length) written once per group — no per-row masks, no
    per-row Python.  Shingle/word workloads have few distinct lengths,
    so the per-group overhead amortizes; pathological all-distinct-
    length long inputs degrade to per-group ≈ per-message overhead
    (still hashlib-comparable) or hit the block-count fallback."""
    m = len(offs)
    out = np.empty((m, 16), dtype=np.uint8)
    if m == 0:
        return out
    if m < 64:
        # tiny batches: per-group numpy setup exceeds hashlib's per-call
        # cost — identical output either way
        raw = buf.tobytes()
        for i in range(m):
            o = int(offs[i])
            out[i] = np.frombuffer(
                hashlib.md5(raw[o:o + int(lens[i])]).digest(),
                dtype=np.uint8)
        return out
    for ln in np.unique(lens):
        sel = np.flatnonzero(lens == ln)
        ln = int(ln)
        nb = (ln + 9 + 63) // 64
        if nb > _FALLBACK_BLOCKS:
            for i in sel:
                o = int(offs[i])
                out[i] = np.frombuffer(
                    hashlib.md5(buf[o:o + ln].tobytes()).digest(),
                    dtype=np.uint8)
            continue
        w = nb * 64
        # fixed-size chunks: keeps every scratch array small enough to
        # recycle through the malloc arena — one huge (g, w) matrix is
        # freshly mmap'd per call and first-touch page faults dominate
        # (measured 50x the arithmetic on this VM)
        step = max(1, _CHUNK_BYTES // w)
        pos = np.arange(ln, dtype=np.int64)
        bit_tail = np.array([(ln * 8 >> (8 * b)) & 0xFF for b in range(8)],
                            dtype=np.uint8)
        for c0 in range(0, len(sel), step):
            csel = sel[c0:c0 + step]
            padded = np.zeros((len(csel), w), dtype=np.uint8)
            if ln:
                padded[:, :ln] = buf[offs[csel][:, None] + pos[None, :]]
            padded[:, ln] = 0x80
            padded[:, w - 8:] = bit_tail
            out[csel] = _compress_group(padded, nb)
    return out


def md5_u64_le(msgs: list[bytes]) -> np.ndarray:
    """First 8 digest bytes as little-endian uint64 per message — the
    dedup family's shingle-hash convention (equals DuckDB
    ``md5_number_upper`` byte order used by the LSH oracles)."""
    return _u64_of(md5_digests(msgs))


def md5_u64_le_ranges(buf: np.ndarray, offs: np.ndarray,
                      lens: np.ndarray) -> np.ndarray:
    """Range-based variant of ``md5_u64_le`` (shared-buffer messages)."""
    return _u64_of(md5_digests_ranges(buf, offs, lens))


def _u64_of(d: np.ndarray) -> np.ndarray:
    if not len(d):
        return np.zeros(0, dtype=np.uint64)
    return np.ascontiguousarray(d[:, :8]).view("<u8").reshape(-1)


def md5_hex(msgs: list[bytes]) -> list[str]:
    """Hex digests per message (``hashlib.md5(m).hexdigest()`` parity):
    ONE ``bytes.hex()`` over the digest matrix, sliced per row."""
    d = md5_digests(msgs)
    full = d.tobytes().hex()
    return [full[i * 32:(i + 1) * 32] for i in range(len(msgs))]
