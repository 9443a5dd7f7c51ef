"""Text analysis stages over the ``documents`` table: token counting,
quality scoring, language ID, document fingerprinting.

All are stateless vectorized ``map_batches`` fns except ``LangId`` (holds
compiled patterns + stopword tables per actor).  The md5 content key and
the simple count/ratio features are deliberately expressible in ANSI SQL
so the DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# re.ASCII so \w/\s agree with the DuckDB oracles' RE2 semantics
# (RE2 \w is ASCII-only): accented chars must classify identically on
# both sides for the hash-match to hold on non-ASCII input.
_WS = re.compile(r"\s+", re.ASCII)
_TOKEN = re.compile(r"\w+|[^\w\s]", re.ASCII)  # BPE-ish piece count
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "that", "with"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "pour",
           "que", "dans", "au", "aux", "du"},
    "nl": {"de", "het", "een", "en", "van", "is", "voor", "dat", "met",
           "aan", "op", "te", "zijn"},
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens (whitespace), n_pieces (word/punct pieces), n_chars,
    punct_ratio — all SQL-replicable."""
    texts = batch[text_col].to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_pieces = np.empty(len(texts), dtype=np.int64)
    n_chars = np.empty(len(texts), dtype=np.int64)
    n_punct = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        n_tok[i] = len([x for x in _WS.split(t.strip()) if x]) if t.strip() else 0
        n_pieces[i] = len(_TOKEN.findall(t))
        n_punct[i] = len(_PUNCT.findall(t))
    out = batch.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("n_pieces", pa.array(n_pieces))
    out = out.append_column("n_chars_calc", pa.array(n_chars))
    out = out.append_column(
        "punct_ratio",
        pa.array(np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)))
    return out


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality in [0,1]: length band + punctuation sanity +
    mean word length band (the published C4/Gopher-style length and
    symbol filters, simplified)."""
    texts = batch[text_col].to_pylist()
    score = np.zeros(len(texts))
    for i, t in enumerate(texts):
        t = t or ""
        toks = [x for x in _WS.split(t.strip()) if x]
        n = len(toks)
        s = 0.0
        if 5 <= n <= 10000:
            s += 0.4
        # multiplication form (not ratio) so the SQL oracle's float
        # comparisons are bit-identical: npunct < 0.2*nch
        if len(_PUNCT.findall(t)) < 0.2 * max(len(t), 1):
            s += 0.3
        nchnw = sum(len(x) for x in toks)
        if n > 0 and 3.0 * n <= nchnw <= 12.0 * n:
            s += 0.3
        score[i] = round(s, 3)
    return batch.append_column("quality", pa.array(score))


def content_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex of the raw text — the exact-dedup key (SQL: md5(text))."""
    keys = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()]
    return batch.append_column("content_key", pa.array(keys, pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 8) -> pa.Table:
    """Karp-Rabin rolling-hash document fingerprint: min hash over all
    ``window``-grams of the normalized text (a winnowing-style sketch from
    the published fingerprinting literature), as int64."""
    out = np.empty(len(batch), dtype=np.int64)
    B = 1000003
    MOD = (1 << 61) - 1
    # Python-int modular arithmetic throughout: numpy int64 silently
    # overflows on h*B and vals*pw (values reach ~2^81), which corrupted
    # the hash; codepoint ord() matches the SQL oracle's ord().
    for i, t in enumerate(batch[text_col].to_pylist()):
        s = _WS.sub(" ", (t or "").lower()).strip()
        if len(s) < window:
            h = 0
            for ch in s:
                h = (h * B + ord(ch)) % MOD
            out[i] = h
            continue
        vals = [ord(c) for c in s]
        h = 0
        pw = pow(B, window - 1, MOD)
        best = MOD
        for j, v in enumerate(vals):
            if j >= window:
                h = (h - vals[j - window] * pw) % MOD
            h = (h * B + v) % MOD
            if j >= window - 1 and h < best:
                best = h
        out[i] = best
    return batch.append_column("fingerprint", pa.array(out))


class LangId:
    """Actor-pool language ID: stopword-hit argmax over en/fr/nl with a
    deterministic tie-break (alphabetical), 'und' when nothing hits."""

    def __init__(self):
        self.word = re.compile(r"[a-zàâäçéèêëîïôöùûüÿ']+", re.I)
        self.tables = {k: frozenset(v) for k, v in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = []
        confs = []
        conf_bp = []
        for t in batch["text"].to_pylist():
            toks = [w.lower() for w in self.word.findall(t or "")]
            if not toks:
                langs.append("und")
                confs.append(0.0)
                conf_bp.append(0)
                continue
            hits = {lang: sum(1 for w in toks if w in tbl)
                    for lang, tbl in self.tables.items()}
            best = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if best[1] == 0:
                langs.append("und")
                confs.append(0.0)
                conf_bp.append(0)
            else:
                langs.append(best[0])
                confs.append(round(best[1] / len(toks), 4))
                # basis-point integer form of the confidence: identical
                # double ops on both sides, so the DuckDB oracle
                # hash-matches without float-rounding-mode drift
                conf_bp.append(int(np.floor(best[1] / len(toks) * 10000
                                            + 0.5)))
        out = batch.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("lang_conf", pa.array(confs, pa.float64()))
        return out.append_column("lang_conf_bp",
                                 pa.array(conf_bp, pa.int64()))


_WORD = re.compile(r"\w+", re.ASCII)  # RE2-\w parity for the SQL oracle


def vocab_partial_counts(batch: pa.Table, text_col: str = "text"
                         ) -> pa.Table:
    """Map-side combiner for corpus vocabulary building: ONE (token, n)
    row per distinct token per batch — occurrences collapse inside the
    task, so the downstream groupby shuffles vocabulary-sized partials
    instead of token-stream-sized rows (the standard wordcount combine;
    at 100 TB the shuffle is bounded by distinct-tokens x blocks)."""
    counts: dict[str, int] = {}
    for t in batch[text_col].to_pylist():
        for tok in _WORD.findall((t or "").lower()):
            counts[tok] = counts.get(tok, 0) + 1
    toks = sorted(counts)
    return pa.table({"token": pa.array(toks, pa.string()),
                     "n": pa.array([counts[t] for t in toks], pa.int64())})


def vocab_topk(ds, k: int = 50, text_col: str = "text") -> pa.Table:
    """Corpus top-k vocabulary (TF-IDF/tokenizer-training precursor):
    per-batch partial counts (combiner above) -> one small groupby over
    the partials -> global top-k by (count desc, token asc) WITHOUT a
    global sort: per-batch partial top-k then a tiny driver merge over
    (k x blocks) rows, mirroring rel_topk_global."""
    import pandas as pd

    parts = ds.map_batches(
        lambda b: vocab_partial_counts(b, text_col),
        batch_format="pyarrow")
    summed = parts.groupby("token").sum("n")

    def part_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["sum(n)", "token"], ascending=[False, True],
            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    tops = summed.map_batches(part_top, batch_format="pyarrow").to_pandas()
    top = tops.sort_values(["sum(n)", "token"], ascending=[False, True],
                           kind="mergesort").head(k)
    return pa.table({"token": pa.array(top["token"], pa.string()),
                     "n": pa.array(top["sum(n)"].to_numpy(), pa.int64())})


def bigram_topk(ds, k: int = 30, text_col: str = "text") -> pa.Table:
    """Corpus top-k adjacent token pairs — the statistic a BPE/WordPiece
    tokenizer-training round maximizes (its next merge IS the most
    frequent adjacent pair).  Same scale plan as ``vocab_topk``:
    map-side combine (one row per distinct pair per batch — the shuffle
    is bounded by distinct pairs × blocks, never the token stream), one
    small groupby over the partials, then per-batch partial top-k with
    a (k × blocks)-row driver merge.  Total order (n desc, pair asc) on
    both sides."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            toks = _WORD.findall((t or "").lower())
            for i in range(len(toks) - 1):
                p = toks[i] + " " + toks[i + 1]
                counts[p] = counts.get(p, 0) + 1
        ks = sorted(counts)
        return pa.table({"pair": pa.array(ks, pa.string()),
                         "n": pa.array([counts[p] for p in ks],
                                       pa.int64())})

    summed = ds.map_batches(partial,
                            batch_format="pyarrow").groupby("pair").sum("n")

    def part_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["sum(n)", "pair"], ascending=[False, True],
            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    tops = summed.map_batches(part_top, batch_format="pyarrow").to_pandas()
    top = tops.sort_values(["sum(n)", "pair"], ascending=[False, True],
                           kind="mergesort").head(k)
    return pa.table({"pair": pa.array(top["pair"], pa.string()),
                     "n": pa.array(top["sum(n)"].to_numpy(), pa.int64())})


def doc_frequencies(ds: "ray.data.Dataset", text_col: str = "text"):
    """Corpus document frequencies (token -> number of docs containing
    it) via map-side combine: each batch emits ONE (token, df_partial)
    row per distinct token, so the groupby shuffles vocabulary-sized
    partials, never the token stream."""
    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for tok in set(_WORD.findall((t or "").lower())):
                counts[tok] = counts.get(tok, 0) + 1
        toks = sorted(counts)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "df": pa.array([counts[t] for t in toks],
                                        pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("token").sum("df")


def tfidf_top_terms(ds: "ray.data.Dataset", df_ref, n_top: int = 3,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Per-document top terms by tf-idf with reciprocal-df weighting
    (score = tf / df): rational in two exact integers, so the double
    division is bit-identical on the engine and the DuckDB oracle — no
    transcendental idf that could flip near-ties between the two sides.
    ``df_ref`` is a ``ray.put`` handle to the (token -> df) dict, read
    worker-locally per task (broadcast, no shuffle of the corpus side).
    The broadcast assumes the vocabulary fits worker memory — beyond
    that, swap this stage for a co-partitioned token join on the same
    (token, df) table.  Emits (id, rank, token, score_bp), rank 1-based
    by (score desc, token asc)."""
    import ray

    def per_doc(batch: pa.Table) -> pa.Table:
        dfs = ray.get(df_ref)
        ids_out, ranks, toks_out, bps = [], [], [], []
        for rid, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            tf: dict[str, int] = {}
            for tok in _WORD.findall((t or "").lower()):
                tf[tok] = tf.get(tok, 0) + 1
            if not tf:
                continue
            scored = sorted(((tok, c / dfs[tok]) for tok, c in tf.items()),
                            key=lambda kv: (-kv[1], kv[0]))[:n_top]
            for r, (tok, s) in enumerate(scored, 1):
                ids_out.append(rid)
                ranks.append(r)
                toks_out.append(tok)
                bps.append(int(np.floor(s * 10000 + 0.5)))
        return pa.table({id_col: pa.array(ids_out, batch[id_col].type),
                         "rank": pa.array(ranks, pa.int64()),
                         "token": pa.array(toks_out, pa.string()),
                         "score_bp": pa.array(bps, pa.int64())})

    return ds.map_batches(per_doc, batch_format="pyarrow")


def corpus_token_counts(ds: "ray.data.Dataset", text_col: str = "text"):
    """Corpus-wide token OCCURRENCE counts (token -> total occurrences)
    via the vocabulary map-side combiner: the shuffle moves one row per
    distinct token per block, never the token stream."""
    return ds.map_batches(
        lambda b: vocab_partial_counts(b, text_col),
        batch_format="pyarrow").groupby("token").sum("n")


def unigram_familiarity(ds: "ray.data.Dataset", counts_ref,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Per-document unigram-LM familiarity signal: the sum over a doc's
    token occurrences of each token's CORPUS count, plus the doc's token
    count — the integer-exact core of an n-gram language-model quality
    filter (docs full of corpus-rare tokens score low; the log-space
    perplexity variant is one vectorized ``np.log`` away but would not
    be bit-comparable to a SQL oracle, so the published columns stay in
    exact integers).

    ``counts_ref`` is a ``ray.put`` handle to the (token -> count) dict
    from ``corpus_token_counts``, read worker-locally per task — the
    same broadcast-small-side pattern as ``tfidf_top_terms``, with the
    same documented vocabulary-fits-in-memory assumption (beyond that,
    a co-partitioned token join replaces the broadcast).  Docs with no
    tokens are omitted (mirrors the SQL join semantics).  ``counts``
    must cover the scored corpus; tokens absent from it count 0 (a
    counts dict built from a filtered corpus degrades gracefully
    instead of raising inside a Ray task)."""
    import ray

    def per_doc(batch: pa.Table) -> pa.Table:
        cnt = ray.get(counts_ref)
        ids_out, ntoks, sums = [], [], []
        for rid, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = _WORD.findall((t or "").lower())
            if not toks:
                continue
            ids_out.append(rid)
            ntoks.append(len(toks))
            sums.append(sum(cnt.get(tok, 0) for tok in toks))
        return pa.table({id_col: pa.array(ids_out, batch[id_col].type),
                         "n_tok": pa.array(ntoks, pa.int64()),
                         "freq_sum": pa.array(sums, pa.int64())})

    return ds.map_batches(per_doc, batch_format="pyarrow")


def length_quantiles(ds: "ray.data.Dataset", qs: tuple = (0.25, 0.5, 0.75,
                                                          0.9, 0.99),
                     text_col: str = "text") -> pa.Table:
    """Exact corpus length quantiles at any scale: per-batch (length →
    count) partial histograms (map-side combine — the shuffle moves one
    row per DISTINCT length per block, never per document), one small
    groupby, then the quantile walk over the merged histogram on the
    driver (bounded by the number of distinct lengths).  Quantile
    definition mirrors DuckDB ``quantile_disc``: the smallest value
    whose cumulative count reaches ``ceil(q * n)``.  Returns
    (q_bp, value) with q in integer basis points."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch[text_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals, counts = np.unique(lens, return_counts=True)
        return pa.table({"value": pa.array(vals, pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("value").sum("n").to_pandas())
    if hist.empty:   # all-empty grouped result loses its schema
        return pa.table({"q_bp": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    hist = hist.sort_values("value", kind="mergesort")
    counts = hist["sum(n)"].to_numpy(np.int64)
    values = hist["value"].to_numpy(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if total == 0:
            continue
        target = max(1, math.ceil(q * total))
        idx = int(np.searchsorted(cum, target, side="left"))
        out_q.append(int(round(q * 10000)))
        out_v.append(int(values[idx]))
    return pa.table({"q_bp": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})
