"""Scale evidence for the knn_graph default plan (VERDICT r3 item 2):
at >= 1M x 64-dim, the IVF-bucketed co-partition plan (the plan='auto'
route above the 256 MB broadcast guard) must beat the broadcast plan —
whose reference matrix alone is 1M x 64 x 8 B = 512 MB in the object
store and whose compute is a dense (1M x 1M) similarity sweep.

Usage:  python scripts/bench_knn_graph.py [n_vectors] [dim]

The broadcast side is measured on a deterministic query SLICE (the full
dense sweep is ~6.4e13 flops — running it to completion just burns the
box) and extrapolated linearly in query count (its per-batch cost is
exactly linear: one (b, n_ref) matmul per batch).  The bucketed side
runs END TO END.  Prints one JSON line; numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_vectors(out_dir: str, n: int, dim: int, shard: int = 100_000) -> str:
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    rng = np.random.default_rng(42)
    # clustered vectors (32 latent centers) so IVF bucketing is realistic
    centers = rng.normal(size=(32, dim))
    for s0 in range(0, n, shard):
        m = min(shard, n - s0)
        cid = rng.integers(0, 32, size=m)
        v = centers[cid] + 0.3 * rng.normal(size=(m, dim))
        offs = pa.array(np.arange(0, (m + 1) * dim, dim, dtype=np.int32))
        vec = pa.ListArray.from_arrays(offs, pa.array(v.ravel(),
                                                      pa.float64()))
        t = pa.table({"vec_id": pa.array(np.arange(s0, s0 + m),
                                         pa.int64()),
                      "embedding": vec})
        pq.write_table(t, os.path.join(out_dir, f"part{s0:09d}.parquet"))
    open(marker, "w").write("ok")
    return out_dir


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    bcast_slice = int(os.environ.get("GEORAY_KNN_BCAST_SLICE", "20000"))
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from georay.ops.similarity import kmeans_fit, kmeans_lite, knn_graph

    path = write_vectors(f"/tmp/georay_knn_{n}_{dim}", n, dim)
    ref_bytes = n * dim * 8

    # --- bucketed plan (the auto route at this size), END TO END -------
    ds = ray.data.read_parquet(path)
    t0 = time.time()
    # codebook fit from a stride sample + one distributed refine pass —
    # charged to the bucketed plan's wall time (it's part of the plan)
    sample = ray.data.read_parquet(
        path, columns=["embedding"]).limit(65_536).to_pandas()
    init = kmeans_lite(np.stack(sample["embedding"].to_numpy()),
                       n_clusters=64)
    cents = kmeans_fit(ray.data.read_parquet(path), init, iters=2)
    g = knn_graph(ds, plan="bucketed", centroids=cents, k=3, n_probe=4)
    rows_bucketed = g.count()
    t_bucketed = time.time() - t0

    # --- broadcast plan on a query slice, extrapolated ------------------
    ref = ray.data.read_parquet(path).to_pandas()
    ref_ids = ref["vec_id"].to_numpy()
    ref_vecs = np.stack(ref["embedding"].to_numpy())
    del ref
    qslice = ray.data.read_parquet(path).limit(bcast_slice)
    t0 = time.time()
    gb = knn_graph(qslice, ref_ids=ref_ids, ref_vecs=ref_vecs, k=3,
                   plan="broadcast",
                   max_broadcast_bytes=1 << 62)
    rows_bcast = gb.count()
    t_slice = time.time() - t0
    t_bcast_full_est = t_slice * (n / bcast_slice)

    print(json.dumps({
        "n_vectors": n, "dim": dim, "ref_bytes": ref_bytes,
        "bucketed_sec_end_to_end": round(t_bucketed, 1),
        "bucketed_rows": rows_bucketed,
        "broadcast_slice_queries": bcast_slice,
        "broadcast_slice_sec": round(t_slice, 1),
        "broadcast_slice_rows": rows_bcast,
        "broadcast_full_est_sec": round(t_bcast_full_est, 1),
        "speedup_est": round(t_bcast_full_est / t_bucketed, 1),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
