"""Grid-based distributed DBSCAN vs a brute-force single-node reference."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute_dbscan(ids, lat, lon, eps_km, min_pts):
    """O(n^2) reference with the same deterministic label rules:
    cluster = min core id reachable via core-core edges; border takes
    the min cluster among core neighbors."""
    from georay.geom import haversine_km
    n = len(ids)
    d = haversine_km(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
    adj = (d <= eps_km) & ~np.eye(n, dtype=bool)
    deg = adj.sum(axis=1)
    is_core = deg + 1 >= min_pts
    # union-find over core-core edges
    parent = {int(ids[i]): int(ids[i]) for i in range(n) if is_core[i]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not is_core[i]:
            continue
        for j in range(n):
            if is_core[j] and adj[i, j]:
                ri, rj = find(int(ids[i])), find(int(ids[j]))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {}
    for i in range(n):
        if is_core[i]:
            comp[int(ids[i])] = find(int(ids[i]))
    # min-label canonicalization
    groups = {}
    for node, root in comp.items():
        groups.setdefault(find(root), []).append(node)
    label = {}
    for members in groups.values():
        m = min(members)
        for node in members:
            label[node] = m
    out = {}
    for i in range(n):
        nid = int(ids[i])
        if is_core[i]:
            out[nid] = ("core", label[nid])
        else:
            cand = [label[int(ids[j])] for j in range(n)
                    if adj[i, j] and is_core[j]]
            if cand:
                out[nid] = ("border", min(cand))
            else:
                out[nid] = ("noise", -1)
    return out


def _run(df, eps_km, min_pts):
    import ray.data
    from georay.cluster import dbscan
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return dbscan(ds, eps_km, min_pts, num_partitions=8).to_pandas()


def test_dbscan_matches_brute(ray_session):
    rng = np.random.RandomState(7)
    # two dense blobs ~200 m wide, a sparse chain, and isolated noise
    blob1 = (50.80 + rng.randn(12) * 0.001, 4.30 + rng.randn(12) * 0.001)
    blob2 = (50.90 + rng.randn(9) * 0.001, 4.50 + rng.randn(9) * 0.001)
    chain = (np.full(4, 50.70) + np.arange(4) * 0.008,
             np.full(4, 4.10))
    lone = (np.array([51.3, 51.5]), np.array([4.9, 3.3]))
    lat = np.concatenate([blob1[0], blob2[0], chain[0], lone[0]])
    lon = np.concatenate([blob1[1], blob2[1], chain[1], lone[1]])
    ids = np.arange(100, 100 + len(lat))
    df = pd.DataFrame({"place_id": ids, "lat": lat, "lon": lon})

    got = _run(df, 1.0, 3).set_index("place_id")
    want = _brute_dbscan(ids, lat, lon, 1.0, 3)
    assert len(got) == len(want)
    for nid, (role, cluster) in want.items():
        assert got.loc[nid, "role"] == role, nid
        assert got.loc[nid, "cluster"] == cluster, nid
    # sanity: both blobs produced core-labeled clusters
    roles = got["role"].value_counts()
    assert roles.get("core", 0) >= 20


def test_dbscan_all_noise(ray_session):
    df = pd.DataFrame({"place_id": [1, 2, 3],
                       "lat": [50.0, 51.0, 52.0],
                       "lon": [4.0, 5.0, 6.0]})
    out = _run(df, 0.5, 2)
    assert sorted(out["place_id"]) == [1, 2, 3]
    assert (out["role"] == "noise").all()
    assert (out["cluster"] == -1).all()
