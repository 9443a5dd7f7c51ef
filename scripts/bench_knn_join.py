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

    def bucket_fn(df):
        return df["bsrc"]

    def score_fn(q_df, ref_df):
        d = np.abs(q_df["x"].to_numpy()[:, None]
                   - ref_df["x"].to_numpy()[None, :])
        return 1.0 / (1.0 + d), ref_df["rid"].to_numpy()

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["_side"] = side
            df["_bucket"] = bucket_fn(df)
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # round-1 shape this rework replaced: per-row python loop inside
        # a raw groupby().map_groups
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

    out = {"n": n}
    scenarios = {
        # many medium buckets — the common spatial-join layout
        "uniform": lambda i: i % 4096,
        # half of all rows share one bucket — hot-key skew
        "skewed": lambda i: 0 if i % 2 == 0 else 1 + (i % 63),
    }
    for name, bucket in scenarios.items():
        qdf = pd.DataFrame({"qid": np.arange(n),
                            "x": rng.uniform(0, 100, n),
                            "bsrc": [bucket(i) for i in range(n)]})
        rdf = pd.DataFrame({"rid": np.arange(n) + 10 * n,
                            "x": rng.uniform(0, 100, n),
                            "bsrc": [bucket(i + 1) for i in range(n)]})
        queries = ray.data.from_pandas(qdf).repartition(8)
        refs = ray.data.from_pandas(rdf).repartition(8)

        t0 = time.time()
        res = knn_join_copartitioned(queries, refs, bucket_fn, score_fn,
                                     k=3, query_cols=["qid"])
        n_new = res.count()
        t_new = time.time() - t0

        q = queries.map_batches(tag("q"), batch_format="pyarrow")
        r = refs.map_batches(tag("r"), batch_format="pyarrow")
        t0 = time.time()
        n_old = q.union(r).groupby("_bucket").map_groups(
            per_bucket, batch_format="pandas").count()
        t_old = time.time() - t0
        assert n_new == n_old, (n_new, n_old)
        out[name] = {"rows": int(n_new),
                     "vectorized_grouped_map_sec": round(t_new, 2),
                     "iterrows_map_groups_sec": round(t_old, 2),
                     "speedup": round(t_old / max(t_new, 1e-9), 2)}

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
