"""Micro-benchmark: vectorized co-partitioned kNN join (grouped_map +
per-bucket matrix scoring) vs the naive plan (raw groupby().map_groups
with a per-row scoring loop) on skewed input — one bucket holds half of
each side.

    python scripts/bench_knn_join.py [n_rows]

Prints one JSON line with both wall times.  Results recorded in
BASELINE.md (round-2 kNN join rework).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from georay.knn import knn_join_copartitioned

    rng = np.random.default_rng(11)
    # skew: half of all rows share bucket 0; the rest spread over 63
    def bucket(i):
        return 0 if i % 2 == 0 else 1 + (i % 63)

    qdf = pd.DataFrame({"qid": np.arange(n), "x": rng.uniform(0, 100, n),
                        "bsrc": [bucket(i) for i in range(n)]})
    rdf = pd.DataFrame({"rid": np.arange(n) + 10 * n,
                        "x": rng.uniform(0, 100, n),
                        "bsrc": [bucket(i + 1) for i in range(n)]})
    queries = ray.data.from_pandas(qdf).repartition(8)
    refs = ray.data.from_pandas(rdf).repartition(8)

    def bucket_fn(df):
        return df["bsrc"]

    def score_fn(q_df, ref_df):
        d = np.abs(q_df["x"].to_numpy()[:, None]
                   - ref_df["x"].to_numpy()[None, :])
        return 1.0 / (1.0 + d), ref_df["rid"].to_numpy()

    t0 = time.time()
    out = knn_join_copartitioned(queries, refs, bucket_fn, score_fn, k=3,
                                 query_cols=["qid"])
    n_new = out.count()
    t_new = time.time() - t0

    # naive plan: tag+union then raw groupby(bucket).map_groups with a
    # per-row python loop (the round-1 shape this rework replaced)
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

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g["_side"] == "q"]
        rs = g[g["_side"] == "r"]
        rows = []
        for _, qrow in qs.iterrows():
            scores = 1.0 / (1.0 + (rs["x"] - qrow["x"]).abs()).to_numpy()
            order = np.argsort(-scores)[:3]
            ids = rs["rid"].to_numpy()
            for rank, oi in enumerate(order):
                rows.append({"qid": qrow["qid"], "neighbor_id": ids[oi],
                             "score": float(scores[oi]), "rank": rank + 1})
        return pd.DataFrame(rows)

    t0 = time.time()
    n_old = both.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas").count()
    t_old = time.time() - t0

    print(json.dumps({"n": n, "rows_new": int(n_new), "rows_old": int(n_old),
                      "vectorized_grouped_map_sec": round(t_new, 2),
                      "iterrows_map_groups_sec": round(t_old, 2),
                      "speedup": round(t_old / max(t_new, 1e-9), 2)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
