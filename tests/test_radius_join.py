"""Spatial range join tests (tiles.radius_join) — verified against a
brute-force all-pairs haversine on the same points."""

import numpy as np
import pytest

import ray.data

from georay.geom import haversine_km
from georay.tiles import radius_join


def _points(n, seed, lat0=49.5, lat1=51.5, lon0=2.5, lon1=6.4):
    rng = np.random.default_rng(seed)
    return {"place_id": np.arange(n, dtype=np.int64),
            "lat": rng.uniform(lat0, lat1, n),
            "lon": rng.uniform(lon0, lon1, n)}


def _brute_pairs(L, R, radius_km, distinct=False):
    dm = haversine_km(L["lat"][:, None], L["lon"][:, None],
                      R["lat"][None, :], R["lon"][None, :])
    hit = dm <= radius_km
    if distinct:
        hit &= L["place_id"][:, None] < R["place_id"][None, :]
    li, ri = np.nonzero(hit)
    return set(zip(L["place_id"][li].tolist(), R["place_id"][ri].tolist()))


def test_radius_join_self_matches_brute(ray_session):
    pts = _points(400, seed=7)
    ds = ray.data.from_arrow(__import__("pyarrow").table(pts))
    got = radius_join(ds, ds, 5.0, distinct_pairs=True,
                      num_partitions=8).to_pandas()
    want = _brute_pairs(pts, pts, 5.0, distinct=True)
    assert set(zip(got["left_id"], got["right_id"])) == want
    # pairs are unique (each unordered pair reported exactly once)
    assert len(got) == len(want)
    # dist_m is a genuine floor-meter distance
    assert (got["dist_m"] >= 0).all() and (got["dist_m"] <= 5000).all()


def test_radius_join_two_sided(ray_session):
    import pyarrow as pa
    L = _points(150, seed=1)
    R = _points(90, seed=2)
    R["place_id"] = R["place_id"] + 10_000  # disjoint id space
    got = radius_join(ray.data.from_arrow(pa.table(L)),
                      ray.data.from_arrow(pa.table(R)),
                      8.0, num_partitions=8).to_pandas()
    want = _brute_pairs(L, R, 8.0)
    assert set(zip(got["left_id"], got["right_id"])) == want


def test_radius_join_empty_result(ray_session):
    import pyarrow as pa
    L = _points(5, seed=3, lat0=49.5, lat1=49.6, lon0=2.5, lon1=2.6)
    R = _points(5, seed=4, lat0=51.0, lat1=51.1, lon0=6.0, lon1=6.1)
    out = radius_join(ray.data.from_arrow(pa.table(L)),
                      ray.data.from_arrow(pa.table(R)),
                      1.0, num_partitions=4)
    # every emitted block stays schema-stable even with zero rows
    # (Ray's Dataset.to_pandas/schema() degrade on an all-empty
    # dataset, so assert on the actual Arrow blocks, which is what
    # downstream operators consume)
    tabs = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    assert sum(t.num_rows for t in tabs) == 0
    for t in tabs:
        assert t.schema.names == ["left_id", "right_id", "dist_m"]


def test_radius_join_boundary_cells(ray_session):
    """Points straddling a grid-cell boundary still pair up (the probe
    replication covers the neighbor cells)."""
    import pyarrow as pa
    # pitch at 1 km is ~0.00904 deg; put two points ~0.9 km apart across
    # a cell boundary in both axes
    pts = {"place_id": np.array([1, 2], dtype=np.int64),
           "lat": np.array([50.000000, 50.008]),
           "lon": np.array([4.000000, 4.002])}
    d = float(haversine_km(pts["lat"][0], pts["lon"][0],
                           pts["lat"][1], pts["lon"][1]))
    assert d < 1.0
    ds = ray.data.from_arrow(pa.table(pts))
    got = radius_join(ds, ds, 1.0, distinct_pairs=True,
                      num_partitions=4).to_pandas()
    assert set(zip(got["left_id"], got["right_id"])) == {(1, 2)}


def test_nearest_join_matches_brute(ray_session):
    import pyarrow as pa
    from georay.tiles import nearest_join
    pts = _points(300, seed=11)
    ds = ray.data.from_arrow(pa.table(pts))
    got = nearest_join(ds, ds, 3.0, exclude_self=True,
                       num_partitions=8).to_pandas()
    dm = haversine_km(pts["lat"][:, None], pts["lon"][:, None],
                      pts["lat"][None, :], pts["lon"][None, :])
    np.fill_diagonal(dm, np.inf)
    want = {}
    for i in range(len(pts["place_id"])):
        j = np.lexsort((pts["place_id"], dm[i]))[0]
        if dm[i, j] <= 3.0:
            want[int(pts["place_id"][i])] = int(pts["place_id"][j])
    assert dict(zip(got["left_id"], got["right_id"])) == want
    # exactly one row per left id
    assert got["left_id"].is_unique


def test_idw_join_matches_bruteforce(ray_session):
    """Integer IDW moments equal a brute-force O(n*m) computation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from georay.geom import haversine_km
    from georay.tiles import idw_join

    rng = np.random.RandomState(5)
    blat = 50.8 + rng.rand(40) * 0.02
    blon = 4.3 + rng.rand(40) * 0.02
    bval = rng.randint(0, 50, 40).astype(np.int64)
    plat = 50.8 + rng.rand(9) * 0.02
    plon = 4.3 + rng.rand(9) * 0.02
    right = ray.data.from_arrow(pa.table({
        "place_id": pa.array(range(40), pa.int64()),
        "lat": pa.array(blat), "lon": pa.array(blon),
        "v": pa.array(bval)}))
    left = ray.data.from_arrow(pa.table({
        "cell_id": pa.array(range(100, 109), pa.int64()),
        "lat": pa.array(plat), "lon": pa.array(plon)}))
    got = idw_join(left, right, 1.0, val_col="v",
                   num_partitions=4).to_pandas().set_index("left_id")

    for i in range(9):
        d = haversine_km(plat[i], plon[i], blat, blon)
        hit = d <= 1.0
        dm = np.floor(d * 1000.0).astype(np.int64)
        w = np.where(hit, 1_000_000_000 // np.maximum(dm, 1), 0)
        num, den = int((w * bval).sum()), int(w.sum())
        if den == 0:
            assert 100 + i not in got.index
        else:
            assert got.loc[100 + i, "num"] == num
            assert got.loc[100 + i, "den"] == den
