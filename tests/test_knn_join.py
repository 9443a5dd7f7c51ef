"""Co-partitioned kNN join (the both-sides-large plan, SURVEY.md §2.4)."""

import numpy as np
import pandas as pd

import ray.data

from georay.knn import knn_join_copartitioned, knn_points_broadcast


def test_knn_points_broadcast_exact():
    rng = np.random.default_rng(4)
    ref_lat = rng.uniform(49, 52, 200)
    ref_lon = rng.uniform(2, 6, 200)
    ref_ids = np.arange(1000, 1200)
    q = pd.DataFrame({"qid": [0, 1], "lat": [50.5, 51.0],
                      "lon": [4.0, 5.0]})
    out = knn_points_broadcast(q, ref_lat, ref_lon, ref_ids, k=3)
    assert len(out) == 6
    # verify against brute force for the first query
    from georay.geom import haversine_km
    d = haversine_km(np.full(200, 50.5), np.full(200, 4.0),
                     ref_lat, ref_lon)
    exp = ref_ids[np.lexsort((ref_ids, d))[:3]]
    got = out[out["qid"] == 0].sort_values("rank")["neighbor_id"].to_numpy()
    assert (got == exp).all()


def test_knn_join_copartitioned(ray_session):
    # queries and refs share a bucket key; scoring is 1/(1+|x - y|)
    queries = ray.data.from_items(
        [{"qid": i, "x": float(i), "bucket_src": i % 3} for i in range(9)])
    refs = ray.data.from_items(
        [{"rid": 100 + j, "x": float(j) + 0.25, "bucket_src": j % 3}
         for j in range(9)])

    def bucket_fn(df):
        return df["bucket_src"]

    def score_fn(q_df, ref_df):
        # vectorized bucket contract: (nq, nref) score matrix
        diff = np.abs(q_df["x"].to_numpy()[:, None]
                      - ref_df["x"].to_numpy()[None, :])
        return 1.0 / (1.0 + diff), ref_df["rid"].to_numpy()

    out = knn_join_copartitioned(queries, refs, bucket_fn, score_fn, k=2,
                                 query_cols=["qid"]).to_pandas()
    # every query got 2 neighbors from its own bucket
    assert len(out) == 18
    g0 = out[out["qid"] == 0].sort_values("rank")
    # query x=0 bucket 0; refs in bucket 0 have x in {0.25, 3.25, 6.25}
    assert g0.iloc[0]["neighbor_id"] == 100   # nearest: x=0.25
