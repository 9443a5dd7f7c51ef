"""Training-data curation operators over the ``documents`` table:
Gopher-style repetition signals, benchmark decontamination, PII scrub.

Scale notes (100 TB):

- ``repetition_signals`` and ``pii_scrub`` are embarrassingly parallel
  per-document ``map_batches`` fns — no shuffle, no state.
- ``decontaminate`` follows the published benchmark-decontamination
  recipe (n-gram overlap vs a held-out eval set): the benchmark side is
  SMALL by definition (eval sets are a few MB), so its distinct n-gram
  hashes are collected on the driver, ``ray.put`` once, and read
  worker-locally inside the corpus scan — a broadcast semi-join, no
  shuffle of the 100 TB side.  The driver set is bounded by the
  benchmark token count, never by corpus size.

All hash/ratio arithmetic mirrors the DuckDB oracles bit-for-bit:
word tokens are RE2-``\\w+`` lowercased (re.ASCII), n-gram hashes are
little-endian first-8-md5-bytes (== DuckDB ``md5_number_upper``), and
ratios are reported in integer basis points via floor(x*10000 + 0.5)
computed with the same double ops on both sides.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

_WORD = re.compile(r"\w+", re.ASCII)  # RE2-\w parity for the SQL oracle


# ---------------------------------------------------------------- repetition

def repetition_signals(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals over word bigrams:

    - ``top_bigram_bp``: share of bigram occurrences taken by the single
      most frequent bigram (the "top n-gram fraction" filter),
    - ``dup_bigram_bp``: share of bigram occurrences that are repeats of
      an already-seen bigram (the "duplicate n-gram fraction" filter),

    both in integer basis points; 0 when the document has < 2 tokens.
    Used as a quality gate: high values flag boilerplate / spam pages.
    """
    texts = batch[text_col].to_pylist()
    top_bp = np.zeros(len(texts), dtype=np.int64)
    dup_bp = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = [w.lower() for w in _WORD.findall(t or "")]
        if len(toks) < 2:
            continue
        counts = Counter(zip(toks, toks[1:]))
        tot = len(toks) - 1
        top = max(counts.values())
        dup = tot - len(counts)
        # same double op order as the SQL: (x / tot) * 10000 + 0.5
        top_bp[i] = int(np.floor(top / tot * 10000 + 0.5))
        dup_bp[i] = int(np.floor(dup / tot * 10000 + 0.5))
    out = batch.append_column("top_bigram_bp", pa.array(top_bp))
    return out.append_column("dup_bigram_bp", pa.array(dup_bp))


# ------------------------------------------------------------ decontamination

def _gram_hashes(text: str, n: int) -> np.ndarray:
    """uint64 hashes of word n-grams (space-joined, lowercased); empty
    for documents shorter than n tokens — matches the SQL oracle's
    ``len(lst) >= n`` guard exactly (unlike dedup._shingle_hashes, which
    emits a whole-text shingle for short docs)."""
    toks = [w.lower() for w in _WORD.findall(text or "")]
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    joined = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                        "little") for s in joined],
        dtype=np.uint64)


def benchmark_gram_hashes(bench_ds: "ray.data.Dataset", n: int = 4,
                          text_col: str = "text") -> np.ndarray:
    """Distinct n-gram hashes of the benchmark/eval set, as a sorted
    uint64 array ready for ``ray.put``.  Each task emits its batch's
    DISTINCT hashes (map-side combine), so the driver merge is bounded
    by benchmark vocabulary, not occurrences."""
    def partial(batch: pa.Table) -> pa.Table:
        hs: set = set()
        for t in batch[text_col].to_pylist():
            hs.update(_gram_hashes(t, n).tolist())
        return pa.table({"h": pa.array(sorted(hs), pa.uint64())})

    parts = bench_ds.map_batches(partial, batch_format="pyarrow")
    cols = [b["h"].to_numpy(zero_copy_only=False)
            for b in parts.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not cols:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(cols)).astype(np.uint64)


def decontaminate(ds: "ray.data.Dataset", bench_grams_ref,
                  n: int = 4, id_col: str = "doc_id",
                  text_col: str = "text") -> "ray.data.Dataset":
    """Flag corpus documents sharing >= 1 word n-gram with the benchmark
    set: (id, n_hits) rows for contaminated documents only, where
    ``n_hits`` counts the DISTINCT benchmark n-grams present.  The
    benchmark side is a ``ray.put`` handle to the sorted uint64 hash
    array (read zero-copy in every task); membership is a vectorized
    ``np.searchsorted`` per document."""
    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_grams_ref)  # worker-local after first fetch
        ids, hits = [], []
        for rid, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            hs = np.unique(_gram_hashes(t, n))
            if not hs.size or not bench.size:
                continue
            pos = np.searchsorted(bench, hs)
            pos[pos == bench.size] = 0
            k = int(np.count_nonzero(bench[pos] == hs))
            if k:
                ids.append(rid)
                hits.append(k)
        return pa.table({id_col: pa.array(ids, batch[id_col].type),
                         "n_hits": pa.array(hits, pa.int64())})

    return ds.map_batches(flag, batch_format="pyarrow")


# ------------------------------------------------------------------- chunking

def chunk_documents(batch: pa.Table, chunk_tokens: int = 64,
                    stride: int = 48, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Sliding-window document chunking (the context-window prep step for
    training/embedding pipelines): windows of ``chunk_tokens`` word
    tokens at ``stride`` spacing; a document shorter than one window
    yields exactly one chunk.  Emits (id, chunk_idx, chunk_ntok,
    chunk_md5) — the md5 is over the space-rejoined token window, so
    chunk CONTENT is verified without shipping it.  Stateless flat map:
    output rows ≈ input tokens / stride, no shuffle."""
    ids_out, idxs, ntoks, md5s = [], [], [], []
    for rid, t in zip(batch[id_col].to_pylist(),
                      batch[text_col].to_pylist()):
        toks = [w.lower() for w in _WORD.findall(t or "")]
        n = len(toks)
        if n == 0:
            continue
        if n <= chunk_tokens:
            n_chunks = 1
        else:
            n_chunks = -(-(n - chunk_tokens) // stride) + 1
        for i in range(n_chunks):
            win = toks[i * stride: i * stride + chunk_tokens]
            ids_out.append(rid)
            idxs.append(i)
            ntoks.append(len(win))
            md5s.append(hashlib.md5(
                " ".join(win).encode("utf-8")).hexdigest())
    return pa.table({id_col: pa.array(ids_out, batch[id_col].type),
                     "chunk_idx": pa.array(idxs, pa.int64()),
                     "chunk_ntok": pa.array(ntoks, pa.int64()),
                     "chunk_md5": pa.array(md5s, pa.string())})


# ------------------------------------------------------------------ PII scrub

# RE2-compatible and re.ASCII-identical patterns: \b, \d, {m,n}, [\w.]
# all classify the same bytes on both sides.
_EMAIL = re.compile(r"\w[\w.]*@[\w.]*\w", re.ASCII)
_PHONE = re.compile(r"\b0\d{2}-\d{3}-\d{4}\b", re.ASCII)
_IP = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", re.ASCII)

PII_PATTERNS = (("<EMAIL>", _EMAIL), ("<IP>", _IP), ("<PHONE>", _PHONE))


def pii_scrub(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails, dotted-quad IPs and 0XX-XXX-XXXX phone numbers:
    appends per-kind match counts and the scrubbed text.  Counts are
    taken on the ORIGINAL text, then replacements applied in the fixed
    (email, ip, phone) order — the patterns are mutually non-overlapping
    by construction, so order only matters for determinism."""
    texts = batch[text_col].to_pylist()
    n_em = np.empty(len(texts), dtype=np.int64)
    n_ip = np.empty(len(texts), dtype=np.int64)
    n_ph = np.empty(len(texts), dtype=np.int64)
    scrubbed = []
    for i, t in enumerate(texts):
        t = t or ""
        n_em[i] = len(_EMAIL.findall(t))
        n_ip[i] = len(_IP.findall(t))
        n_ph[i] = len(_PHONE.findall(t))
        for tag, pat in PII_PATTERNS:
            t = pat.sub(tag, t)
        scrubbed.append(t)
    out = batch.append_column("n_emails", pa.array(n_em))
    out = out.append_column("n_ips", pa.array(n_ip))
    out = out.append_column("n_phones", pa.array(n_ph))
    return out.append_column("scrubbed", pa.array(scrubbed, pa.string()))
