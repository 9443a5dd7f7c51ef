"""Distributed grid-based DBSCAN over point tables.

Density clustering of geocoded points (eps-radius great-circle
neighborhoods) — the classic post-geocoding spatial analysis the
reference's tile rollups only approximate by fixed binning (there is no
clustering anywhere in `/root/reference`; this is an engine-side
net-new operator in the spirit of SURVEY.md §2.5's rollup family).

Ray-Data-first plan — NO all-pairs matrix, NO driver-side key sets:

1. eps-neighbor pairs via the grid-bucketed ``tiles.radius_join`` (one
   shuffle; each unordered pair found exactly once, doubled map-side
   into a directed edge list).
2. degree per node = one groupby over edge sources; a point is CORE
   iff ``deg + 1 >= min_pts`` (the +1 counts the point itself,
   matching the textbook |N_eps(p)| definition).
3. core flags are attached to both edge endpoints with two
   co-partitioned tag+union shuffles (the core table scales with the
   data, so it is never broadcast or collected).
4. cluster labels = connected components (iterative min-label
   propagation, ``ops.dedup.connected_components``) over the CORE-CORE
   subgraph plus one self-loop per core, so isolated cores label
   themselves.  A cluster's label is its minimum core id —
   deterministic, rerun- and topology-invariant.
5. BORDER points (non-core with >=1 core neighbor) take the MINIMUM
   cluster label among their core neighbors — deterministic, unlike
   textbook DBSCAN's first-visitor assignment.
6. everything else is NOISE (cluster = -1).

Shuffle ledger: 1 (radius join) + 1 (degree) + 2 (flag attach) +
2/round (components; eps-balls are near-cliques, so 2-3 rounds close)
+ 2 (border label) + 1 (final role assembly) — every one over EDGE- or
NODE-sized streams, never point-pair matrices.  Skew is bounded by the
radius join's chunked per-cell scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .tiles import radius_join

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_OUT_SCHEMA = pa.schema([("place_id", pa.int64()), ("role", pa.string()),
                         ("cluster", pa.int64())])


def _flag_edges(edges, key_col: str, cores, carry: list,
                num_partitions: int):
    """Append ``<key_col>_core`` := (edges[key_col] in cores.node) via
    ONE co-partitioned tag+union shuffle.  ``carry`` lists the edge
    columns (beyond key_col) to thread through, each int8/int64/bool."""
    from .shuffle import grouped_map

    names = [key_col] + carry
    out_fields = [(n, pa.int64()) if not n.endswith("_core")
                  else (n, pa.bool_()) for n in names]
    out_schema = pa.schema(out_fields + [(key_col + "_core", pa.bool_())])

    def tag_edges(batch: pa.Table) -> pa.Table:
        cols = {n: batch[n] for n in names}
        cols["_side"] = pa.array(np.zeros(len(batch), np.int8))
        return pa.table(cols)

    def tag_cores(batch: pa.Table) -> pa.Table:
        k = batch["node"]
        cols = {key_col: k}
        for n in carry:
            if n.endswith("_core"):
                cols[n] = pa.array(np.zeros(len(k), bool))
            else:
                cols[n] = pa.array(np.full(len(k), -1, np.int64))
        cols["_side"] = pa.array(np.ones(len(k), np.int8))
        return pa.table(cols)

    def attach(df: pd.DataFrame) -> pa.Table:
        have = df.loc[df["_side"] == 1, key_col]
        ed = df[df["_side"] == 0]
        flag = ed[key_col].isin(have).to_numpy()
        cols = {}
        for n, typ in out_fields:
            arr = ed[n].to_numpy()
            cols[n] = pa.array(arr.astype(bool) if typ == pa.bool_()
                               else arr.astype(np.int64), typ)
        cols[key_col + "_core"] = pa.array(flag, pa.bool_())
        return pa.table(cols)

    tagged = edges.map_batches(tag_edges, batch_format="pyarrow").union(
        cores.map_batches(tag_cores, batch_format="pyarrow"))
    out = grouped_map(tagged, key_col, attach,
                      num_partitions=num_partitions, group_fn=False)
    return out.map_batches(
        lambda b: b if b.num_columns else out_schema.empty_table(),
        batch_format="pyarrow")


def dbscan(points, eps_km: float, min_pts: int, *,
           id_col: str = "place_id", lat_col: str = "lat",
           lon_col: str = "lon", num_partitions: int | None = None):
    """DBSCAN over a point Dataset; returns (place_id, role, cluster)
    with role in {'core','border','noise'} and cluster = the minimum
    core id of the cluster (-1 for noise).  See module docstring for
    the distributed plan."""
    import ray.data

    from .ops.dedup import connected_components
    from .shuffle import adaptive_partitions, grouped_map
    if num_partitions is None:
        num_partitions = adaptive_partitions()

    def bounded(ds):
        # grouped_map/union preserve block granularity, so the flag-join
        # chain would compound tiny blocks (and per-block shuffle cost)
        # stage over stage; cap it at each barrier
        m = ds.materialize()
        if m.num_blocks() > 4 * num_partitions:
            m = m.repartition(num_partitions).materialize()
        return m

    points = points.materialize()  # read twice: pairs + final assembly

    pairs = radius_join(points, points, eps_km, distinct_pairs=True,
                        left_id_col=id_col, right_id_col=id_col,
                        lat_col=lat_col, lon_col=lon_col,
                        num_partitions=num_partitions)

    def double(batch: pa.Table) -> pa.Table:
        u = batch["left_id"].to_numpy(zero_copy_only=False)
        v = batch["right_id"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.r_[u, v], pa.int64()),
                         "v": pa.array(np.r_[v, u], pa.int64())})

    edges = bounded(pairs.map_batches(double, batch_format="pyarrow"))

    if min_pts <= 1:
        # textbook DBSCAN: every point is core at min_pts=1 — isolated
        # points have no edge rows (hence no degree row), so seeding
        # cores from the degree table would mislabel them noise
        cores = points.map_batches(
            lambda b: pa.table({"node": pa.array(
                b[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64())}),
            batch_format="pyarrow").materialize()
    else:
        deg = edges.groupby("u").count()  # (u, count())

        def core_only(batch: pa.Table) -> pa.Table:
            n = batch["count()"].to_numpy(zero_copy_only=False)
            keep = n + 1 >= min_pts
            return pa.table({"node": pa.array(
                batch["u"].to_numpy(zero_copy_only=False)[keep],
                pa.int64())})

        cores = deg.map_batches(core_only,
                                batch_format="pyarrow").materialize()

    e1 = _flag_edges(edges, "u", cores, carry=["v"],
                     num_partitions=num_partitions)
    e2 = bounded(_flag_edges(e1, "v", cores, carry=["u", "u_core"],
                             num_partitions=num_partitions))

    def split_cc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        uc = batch["u_core"].to_numpy(zero_copy_only=False)
        vc = batch["v_core"].to_numpy(zero_copy_only=False)
        m = uc & vc
        return pa.table({"u": batch["u"].filter(pa.array(m)),
                         "v": batch["v"].filter(pa.array(m))})

    def split_border(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        uc = batch["u_core"].to_numpy(zero_copy_only=False)
        vc = batch["v_core"].to_numpy(zero_copy_only=False)
        m = (~uc) & vc
        return pa.table({"u": batch["u"].filter(pa.array(m)),
                         "v": batch["v"].filter(pa.array(m))})

    core_core = e2.map_batches(split_cc, batch_format="pyarrow")
    self_loops = cores.map_batches(
        lambda b: pa.table({"u": b["node"], "v": b["node"]}),
        batch_format="pyarrow")
    cc = connected_components(core_core.union(self_loops), id_a="u",
                              id_b="v", num_partitions=num_partitions
                              ).materialize()  # (node, comp), cores only

    # border label: join border edges to their core endpoint's comp
    # (co-partitioned on v), then min(comp) per border node
    border_edges = e2.map_batches(split_border, batch_format="pyarrow")

    def tag_be(batch: pa.Table) -> pa.Table:
        return pa.table({"v": batch["v"], "u": batch["u"],
                         "comp": pa.array(np.full(len(batch), -1,
                                                  np.int64)),
                         "_side": pa.array(np.zeros(len(batch), np.int8))})

    def tag_cc(batch: pa.Table) -> pa.Table:
        return pa.table({"v": batch["node"],
                         "u": pa.array(np.full(len(batch), -1, np.int64)),
                         "comp": batch["comp"],
                         "_side": pa.array(np.ones(len(batch), np.int8))})

    bc_schema = pa.schema([("node", pa.int64()), ("comp", pa.int64())])

    def join_comp(df: pd.DataFrame) -> pa.Table:
        lut = df[df["_side"] == 1].set_index("v")["comp"]
        ed = df[df["_side"] == 0]
        comp = ed["v"].map(lut).to_numpy()
        return pa.table({"node": pa.array(ed["u"].to_numpy(np.int64),
                                          pa.int64()),
                         "comp": pa.array(comp.astype(np.int64),
                                          pa.int64())})

    bc = grouped_map(
        border_edges.map_batches(tag_be, batch_format="pyarrow").union(
            cc.map_batches(tag_cc, batch_format="pyarrow")),
        "v", join_comp, num_partitions=num_partitions, group_fn=False)
    bc = bc.map_batches(
        lambda b: b if b.num_columns else bc_schema.empty_table(),
        batch_format="pyarrow")
    border = bc.groupby("node").min("comp")  # (node, min(comp))

    # final assembly: one co-partitioned pass over (points ∪ core
    # labels ∪ border labels) keyed on the point id
    def tag_pts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        return pa.table({"node": ids,
                         "comp": pa.array(np.full(len(ids), -1, np.int64)),
                         "_side": pa.array(np.zeros(len(ids), np.int8))})

    def tag_core_lab(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "comp": batch["comp"],
                         "_side": pa.array(np.ones(len(batch), np.int8))})

    def tag_border_lab(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"],
                         "comp": batch["min(comp)"],
                         "_side": pa.array(np.full(len(batch), 2,
                                                   np.int8))})

    def assemble(df: pd.DataFrame) -> pa.Table:
        pts = df[df["_side"] == 0]
        core_lab = df[df["_side"] == 1].set_index("node")["comp"]
        bord_lab = df[df["_side"] == 2].set_index("node")["comp"]
        ids = pts["node"].to_numpy(np.int64)
        ccomp = pts["node"].map(core_lab)
        bcomp = pts["node"].map(bord_lab)
        is_core = ccomp.notna().to_numpy()
        is_border = (~is_core) & bcomp.notna().to_numpy()
        role = np.where(is_core, "core",
                        np.where(is_border, "border", "noise"))
        # integer-exact label path: a float64 intermediate would
        # silently corrupt cluster ids (place_ids) above 2^53
        ccomp_i = ccomp.astype("Int64").fillna(-1).to_numpy(
            dtype=np.int64, na_value=-1)
        bcomp_i = bcomp.astype("Int64").fillna(-1).to_numpy(
            dtype=np.int64, na_value=-1)
        cluster = np.where(is_core, ccomp_i,
                           np.where(is_border, bcomp_i,
                                    np.int64(-1)))
        return pa.table({"place_id": pa.array(ids, pa.int64()),
                         "role": pa.array(role.tolist(), pa.string()),
                         "cluster": pa.array(cluster, pa.int64())})

    tagged = points.map_batches(tag_pts, batch_format="pyarrow").union(
        cc.map_batches(tag_core_lab, batch_format="pyarrow"),
        border.map_batches(tag_border_lab, batch_format="pyarrow"))
    out = grouped_map(tagged, "node", assemble,
                      num_partitions=num_partitions, group_fn=False)
    return out.map_batches(
        lambda b: b if b.num_columns else _OUT_SCHEMA.empty_table(),
        batch_format="pyarrow")
