"""Parity tests for the vectorized MD5 kernel (ops/md5vec.py) and the
range-based shingle hasher built on it — both must be bit-identical to
hashlib/the scalar definitions (the LSH SQL oracles depend on md5
bit-parity with DuckDB's md5 builtins)."""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georay.ops.dedup import (MinHasher, _shingle_hashes, _shingle_ranges,
                              _WORD)
from georay.ops.md5vec import (md5_digests, md5_hex, md5_u64_le,
                               md5_u64_le_ranges)


def test_md5_digests_exact_cases():
    msgs = [b"", b"a", b"abc", b"message digest",
            b"x" * 55, b"x" * 56, b"x" * 63, b"x" * 64, b"x" * 65,
            b"x" * 119, b"x" * 120, b"y" * 1200, b"z" * 5000]
    d = md5_digests(msgs)
    for i, m in enumerate(msgs):
        assert d[i].tobytes() == hashlib.md5(m).digest(), len(m)
    assert md5_hex(msgs) == [hashlib.md5(m).hexdigest() for m in msgs]
    u = md5_u64_le(msgs)
    for i, m in enumerate(msgs):
        assert int(u[i]) == int.from_bytes(
            hashlib.md5(m).digest()[:8], "little")


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), max_size=40))
def test_md5_digests_hypothesis(msgs):
    d = md5_digests(msgs)
    for i, m in enumerate(msgs):
        assert d[i].tobytes() == hashlib.md5(m).digest()


def test_md5_ranges_overlapping():
    buf = np.frombuffer(b"the quick brown fox jumps", dtype=np.uint8)
    starts = np.array([0, 4, 10, 0], dtype=np.int64)
    lens = np.array([3, 5, 9, 25], dtype=np.int64)
    got = md5_u64_le_ranges(buf, starts, lens)
    raw = buf.tobytes()
    for i in range(4):
        m = raw[starts[i]:starts[i] + lens[i]]
        assert int(got[i]) == int.from_bytes(
            hashlib.md5(m).digest()[:8], "little")


def _shingle_hashes_scalar(text, n):
    """The original per-gram join + hashlib definition (test oracle)."""
    toks = [t.lower() for t in _WORD.findall(text or "")]
    if len(toks) < n:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                        "little") for s in joined], dtype=np.uint64)


TEXTS = ["Avenue Fonsny 20, 1060 Bruxelles, Belgium",
         "", "one", "two words", "a b c d e f g h", "ünïcode Çity tést",
         "the same the same the same the same", "12 34 56 78 90"]


def test_shingle_ranges_parity():
    for n in (2, 3, 16):
        from georay.ops.md5vec import md5_u64_le_ranges as rng
        buf, st, ln, counts = _shingle_ranges(TEXTS, n)
        h = rng(buf, st, ln)
        bounds = np.r_[0, np.cumsum(counts)]
        for i, t in enumerate(TEXTS):
            expect = _shingle_hashes_scalar(t, n)
            got = h[bounds[i]:bounds[i + 1]]
            assert np.array_equal(got, expect), (t, n)
            assert np.array_equal(_shingle_hashes(t, n), expect)


def test_shingle_ranges_short_docs_whole_flag():
    buf, st, ln, counts = _shingle_ranges(["one two", "a b c d"], 3,
                                          short_docs_whole=False)
    assert counts.tolist() == [0, 2]


def test_signatures_batch_parity():
    h = MinHasher(k=16, shingle_n=3)
    batch = h.signatures_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        assert np.array_equal(batch[i], h.signature(t)), t
