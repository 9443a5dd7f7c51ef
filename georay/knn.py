"""kNN operators: gazetteer rescue for unresolved addresses (string
similarity) and generic point-kNN joins (SURVEY.md §2.4 net-new row).

Two physical plans, chosen by the size of the reference side:

- broadcast (small side fits memory): the gazetteer/points live in actor
  state (built once per actor from the deterministic spec, or shipped via
  ``ray.put``), each batch scores against it vectorized.  Exact, no
  shuffle — the default at any scale where the reference side is a
  lookup table.
- co-partitioned (both sides large): tag + union the two datasets, add a
  bucket key (postcode prefix / hex-cell prefix), ``groupby(bucket)``
  once, and score inside ``map_groups``.  Documented partitioning
  assumption: a query only needs candidates from its own bucket (ragged
  edges need neighbor-bucket duplication — ``expand`` replicates
  reference rows into adjacent buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import CITY, POSTCODE, STATUS, STREET
from .gazetteer import GazetteerSpec, get_gazetteer
from .textkernels import normalize_street


class KnnRescuer:
    """map_batches actor: for rows with status == 'unmatched', attach the
    top-k gazetteer street suggestions by Jaro-Winkler + token-sort score,
    searched within the postcode-prefix bucket (falls back to global).

    Scoring is BATCHED (round-3 perf item): the whole batch's unique
    (street, postcode-prefix) queries and their prefiltered candidates
    become ONE (pairs x chars) kernel call each for Jaro-Winkler and
    token-sort (``textvec.jaro_winkler_pairs`` / ``lev_similarity_pairs``)
    instead of a per-(row, candidate) Python loop.  The candidate-set
    code matrices are built once per worker in ``__init__``.  The
    token-sort leg uses plain Levenshtein (vectorizable, and
    bit-replicable by the DuckDB oracle's built-in ``levenshtein``)
    instead of the scalar unrestricted Damerau-Levenshtein; this scorer
    is net-new (not reference semantics — the reference comparator
    kernels in compare.py are untouched).  ``prefilter`` is a PERF knob,
    not semantics: with ``prefilter >= bucket size`` the top-k is exact
    over the bucket, which is the mode the content oracle checks."""

    def __init__(self, spec: GazetteerSpec | None = None, k: int = 3,
                 prefilter: int = 100):
        from .textvec import codes_matrix
        self.k = k
        self.prefilter = prefilter
        gaz = get_gazetteer(spec or GazetteerSpec())
        streets = gaz.places[gaz.places.place_rank == 26]
        self.names = streets["name"].map(normalize_street).to_numpy()
        self.place_ids = streets["place_id"].to_numpy()
        self.street_names = streets["name"].to_numpy()
        # padded char-code matrices for the vectorized kernels: raw
        # normalized names + token-sorted forms (both static per worker).
        # uint8: normalize_street output is [A-Z ] only.
        self.cand_codes, self.cand_lens = codes_matrix(list(self.names),
                                                       dtype=np.uint8)
        toksorted = [" ".join(sorted(n.split())) for n in self.names]
        self.tok_codes, self.tok_lens = codes_matrix(toksorted,
                                                     dtype=np.uint8)
        self.pc_prefix: dict[str, np.ndarray] = {}
        pref = streets["post_code"].astype(str).str[:2].to_numpy()
        for p in np.unique(pref):
            self.pc_prefix[p] = np.flatnonzero(pref == p)
        # trigram posting lists (as int arrays, for bincount voting):
        # candidate pre-filter so a bucket miss never degenerates into a
        # full-gazetteer scan
        tri: dict[str, list[int]] = {}
        for i, nm in enumerate(self.names):
            s = f"  {nm} "
            for t in {s[j:j + 3] for j in range(len(s) - 2)}:
                tri.setdefault(t, []).append(i)
        self.trigram: dict[str, np.ndarray] = {
            t: np.array(v, dtype=np.int64) for t, v in tri.items()}
        # bounded per-worker memo: top-k per (street, pc-prefix) — real
        # corpora repeat the same unmatched address across batches
        self._memo: dict = {}

    def _candidate_idxs(self, q: str, idxs: np.ndarray) -> np.ndarray:
        """Prefilter a bucket to <= ``prefilter`` candidates via trigram
        votes (round-2 selection semantics, now bincount-vectorized:
        the per-posting dict scan was ~1 ms per query)."""
        if len(idxs) <= self.prefilter:
            return np.asarray(idxs, dtype=np.int64)
        s = f"  {q} "
        hits = [self.trigram[t]
                for t in {s[j:j + 3] for j in range(len(s) - 2)}
                if t in self.trigram]
        if hits:
            votes = np.bincount(np.concatenate(hits),
                                minlength=len(self.names))
            sub = votes[idxs]
            keep = np.asarray(idxs)[sub > 0]
            if len(keep):
                # top by (-votes, idx): idxs are ascending, stable sort
                order = np.argsort(-votes[keep], kind="stable")
                return keep[order[:self.prefilter]].astype(np.int64)
        # no trigram overlap anywhere — best-effort deterministic slice
        return np.asarray(idxs[:self.prefilter], dtype=np.int64)

    def _score_batch(self, uniq: list[tuple[str, str]]) -> list[tuple]:
        """Top-k for each unique (street, pc2): one pairwise kernel call
        for the whole batch's (query x candidate) pairs."""
        from .textvec import (codes_matrix, jaro_winkler_pairs,
                              lev_similarity_pairs)
        qnorms, cand_lists = [], []
        for street, pc2 in uniq:
            q = normalize_street(street)
            qnorms.append(q)
            if not q:
                cand_lists.append(np.empty(0, dtype=np.int64))
                continue
            idxs = self.pc_prefix.get(pc2)
            if idxs is None or len(idxs) == 0:
                idxs = np.arange(len(self.names))
            cand_lists.append(self._candidate_idxs(q, idxs))
        counts = np.array([len(c) for c in cand_lists], dtype=np.int64)
        results: list[tuple] = [([], [], [])] * len(uniq)
        total = int(counts.sum())
        if total == 0:
            return results
        qc, ql = codes_matrix(qnorms, dtype=np.uint8)
        tq, tl = codes_matrix([" ".join(sorted(q.split())) for q in qnorms],
                              dtype=np.uint8)
        rep = np.repeat(np.arange(len(uniq)), counts)
        cand = np.concatenate([c for c in cand_lists if len(c)])
        # bucket pairs by candidate length: kernel cost scales with the
        # PADDED width, and one 45-char outlier name would otherwise pad
        # every pair.  Sorted-token forms keep the original length (same
        # chars reordered), so one bucketing drives both legs.
        score = np.empty(len(rep), dtype=np.float64)
        clp = self.cand_lens[cand]
        for lo, hi in ((0, 16), (16, 24), (24, 32), (32, 1 << 30)):
            sel = np.flatnonzero((clp > lo) & (clp <= hi))
            if not len(sel):
                continue
            cs, qs = cand[sel], rep[sel]
            w = int(self.cand_lens[cs].max())
            qw = max(int(ql[qs].max()), 1)
            jw = jaro_winkler_pairs(qc[qs, :qw], ql[qs],
                                    self.cand_codes[cs, :w],
                                    self.cand_lens[cs])
            tok = lev_similarity_pairs(tq[qs, :qw], tl[qs],
                                       self.tok_codes[cs, :w],
                                       self.tok_lens[cs])
            score[sel] = 0.5 * jw + 0.5 * tok
        # ONE global (query, -score, idx) sort, then first-k per segment
        # (a per-query lexsort loop was ~25% of the stage)
        order = np.lexsort((cand, -score, rep))
        rep_s, cand_s, score_s = rep[order], cand[order], score[order]
        seg_start = np.r_[True, rep_s[1:] != rep_s[:-1]]
        pos_in_seg = np.arange(len(rep_s)) - np.maximum.accumulate(
            np.where(seg_start, np.arange(len(rep_s)), 0))
        topmask = pos_in_seg < self.k
        rep_t, cand_t, score_t = (rep_s[topmask], cand_s[topmask],
                                  score_s[topmask])
        bounds = np.r_[0, np.cumsum(np.bincount(rep_t,
                                                minlength=len(uniq)))]
        for ui in range(len(uniq)):
            s, e = int(bounds[ui]), int(bounds[ui + 1])
            if s == e:
                continue
            top = cand_t[s:e]
            results[ui] = (
                [int(self.place_ids[j]) for j in top],
                [str(self.street_names[j]) for j in top],
                [round(float(v), 4) for v in score_t[s:e]])
        return results

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac
        n = len(batch)
        sugg_ids: list[list[int]] = [[] for _ in range(n)]
        sugg_names: list[list[str]] = [[] for _ in range(n)]
        sugg_scores: list[list[float]] = [[] for _ in range(n)]
        mask = pac.and_(pac.equal(batch[STATUS], "unmatched"),
                        pac.not_equal(batch[STREET], ""))
        todo = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        if len(todo):
            streets = batch[STREET].take(pa.array(todo)).to_pylist()
            pcs = batch[POSTCODE].take(pa.array(todo)).to_pylist()
            keys = [(st, str(pc)[:2]) for st, pc in zip(streets, pcs)]
            fresh = [kk for kk in dict.fromkeys(keys)
                     if kk not in self._memo]
            if fresh:
                for kk, res in zip(fresh, self._score_batch(fresh)):
                    if len(self._memo) < (1 << 16):
                        self._memo[kk] = res
            for kk, loc in zip(keys, todo):
                hit = self._memo.get(kk)
                if hit is None:   # memo full — score the stragglers solo
                    hit = self._score_batch([kk])[0]
                sugg_ids[loc], sugg_names[loc], sugg_scores[loc] = hit
        out = batch.append_column("knn_place_ids",
                                  pa.array(sugg_ids, pa.list_(pa.int64())))
        out = out.append_column("knn_streets",
                                pa.array(sugg_names, pa.list_(pa.string())))
        return out.append_column("knn_scores",
                                 pa.array(sugg_scores, pa.list_(pa.float64())))


def knn_points_broadcast(query_df: pd.DataFrame, ref_lat: np.ndarray,
                         ref_lon: np.ndarray, ref_ids: np.ndarray,
                         k: int = 3) -> pd.DataFrame:
    """Exact k nearest reference points per query row (haversine), fully
    vectorized: used inside map_batches with the reference arrays held in
    actor state / broadcast.  Returns one row per (query, neighbor) with
    rank 1..k — the layout the DuckDB oracle reproduces with a windowed
    cross join."""
    from .geom import haversine_km
    qlat = query_df["lat"].to_numpy(dtype=np.float64)
    qlon = query_df["lon"].to_numpy(dtype=np.float64)
    out_rows = []
    # chunk queries so the (q × ref) matrix stays small
    chunk = max(1, int(4_000_000 // max(1, len(ref_lat))))
    for s in range(0, len(qlat), chunk):
        e = min(s + chunk, len(qlat))
        d = haversine_km(qlat[s:e, None], qlon[s:e, None],
                         ref_lat[None, :], ref_lon[None, :])
        kk = min(k, d.shape[1])
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        for r in range(e - s):
            cand = part[r]
            order = np.lexsort((ref_ids[cand], d[r, cand]))
            for rank, ci in enumerate(cand[order]):
                out_rows.append((s + r, int(ref_ids[ci]),
                                 float(d[r, ci]), rank + 1))
    res = pd.DataFrame(out_rows, columns=["_qi", "neighbor_id", "dist_km",
                                          "rank"])
    base = query_df.reset_index(drop=True)
    base["_qi"] = np.arange(len(base))
    return base.merge(res, on="_qi").drop(columns=["_qi"])


def knn_join_copartitioned(queries, refs, bucket_fn, score_fn, k: int = 3,
                           query_cols=None, ref_cols=None,
                           num_partitions: int | None = None,
                           neighbor_id_dtype=np.int64):
    """Generic both-sides-large kNN join over Ray Datasets.

    ``bucket_fn(df) -> Series`` assigns the co-partition key to either
    side; ``score_fn(q_df, ref_df) -> (scores, ids)`` scores a whole
    bucket at once — ``scores`` shaped (len(q_df), len(ref_df)) — so the
    kernel is one vectorized matrix op per bucket, never a per-row loop.
    One hash shuffle on the bucket key (partitioned ``grouped_map``, many
    buckets per task — not per-group materialization); top-k selection is
    argpartition + one lexsort per partition, deterministic tie-break on
    (score desc, neighbor id asc).

    ``neighbor_id_dtype``: dtype of the ids ``score_fn`` returns (numpy
    dtype, or ``"string"`` for object ids).  Empty partitions emit a
    typed empty block with this dtype — without it an all-empty
    partition would pin neighbor_id to int64 and a string-id stream
    would mix block schemas."""
    import ray.data  # noqa: F401

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["_side"] = side
            df["_bucket"] = bucket_fn(df)
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    q = queries.map_batches(tag("q"), batch_format="pyarrow")
    r = refs.map_batches(tag("r"), batch_format="pyarrow")
    both = q.union(r)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in df.groupby("_bucket", sort=False):
            qs = g[g["_side"] == "q"]
            rs = g[g["_side"] == "r"]
            if qs.empty or rs.empty:
                continue
            qcols = [c for c in (query_cols if query_cols is not None
                                 else qs.columns)
                     if not str(c).startswith("_")]
            # chunk the query side so the (q_chunk × ref) score matrix
            # stays ~32 MB even in a skewed mega-bucket — full-bucket
            # matrices go quadratic in memory exactly when skew hits
            chunk = max(1, 4_000_000 // max(1, len(rs)))
            for s0 in range(0, len(qs), chunk):
                qc = qs.iloc[s0:s0 + chunk]
                scores, ids = score_fn(qc, rs)
                scores = np.asarray(scores, dtype=np.float64)
                ids = np.asarray(ids)
                nq, nr = scores.shape
                kk = min(k, nr)
                cand = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                row_idx = np.repeat(np.arange(nq), kk)
                col_idx = cand.ravel()
                s = scores[row_idx, col_idx]
                # grouped by query row, then score desc, then id asc
                order = np.lexsort((ids[col_idx], -s, row_idx))
                frame = qc.iloc[row_idx[order]][qcols].reset_index(drop=True)
                frame["neighbor_id"] = ids[col_idx[order]]
                frame["score"] = s[order]
                frame["rank"] = np.tile(np.arange(1, kk + 1), nq)
                frames.append(frame)
        if not frames:
            qs = df[df["_side"] == "q"].iloc[0:0]
            qcols = [c for c in (query_cols if query_cols is not None
                                 else qs.columns)
                     if not str(c).startswith("_")]
            e = qs[qcols].copy()
            # empty object columns would infer as Arrow null and break
            # the stream schema — pin them to string explicitly
            for c in qcols:
                if e[c].dtype == object:
                    e[c] = e[c].astype("string")
            if neighbor_id_dtype == "string":
                e["neighbor_id"] = pd.array([], dtype="string")
            else:
                e["neighbor_id"] = np.array([], dtype=neighbor_id_dtype)
            e["score"] = np.array([], dtype=np.float64)
            e["rank"] = np.array([], dtype=np.int64)
            return e
        return pd.concat(frames, ignore_index=True)

    from .shuffle import grouped_map
    return grouped_map(both, "_bucket", per_partition,
                       num_partitions=num_partitions, group_fn=False)
