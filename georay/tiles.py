"""Spatial layer stages: tile assignment, point-in-polygon validation,
and tile rollups (the north rule's net-new operators, SURVEY.md §2.5).

- ``TileAnnotator`` — actor-pool ``map_batches`` stage: assigns the
  H3-style hex cell, the S2-style quadkey cross-check and the
  SQL-checkable square cell to every resolved coordinate, and validates
  the hit against the admin-boundary polygon of its postcode via the
  broadcast polygon index (the engine's ``check_result`` reverse-geocode
  analogue).  Polygon index is built once per actor process from the
  deterministic spec.
- ``rollup_counts`` — tile rollup as partial-aggregate-then-groupby:
  counts are combined inside ``map_batches`` first, so the shuffle moves
  at most (distinct cells × blocks) rows, not the full dataset — the
  skew/salting story for hot postal codes (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from .cells import hex_cell, quad_cell, square_cell
from .config import O_LAT, O_LON, POSTCODE, T_HEX_CELL, T_PIP_OK, T_QUAD_CELL
from .gazetteer import GazetteerSpec, get_gazetteer
from .geom import PolygonIndex

T_SQUARE_CELL = "square_cell"


class TileAnnotator:
    """map_batches callable class: cells + PIP validation per batch."""

    def __init__(self, spec: GazetteerSpec | None = None, hex_res: int = 9,
                 quad_level: int = 18, lat_col: str = O_LAT,
                 lon_col: str = O_LON, pc_col: str | None = POSTCODE):
        self.hex_res = hex_res
        self.quad_level = quad_level
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.pc_col = pc_col
        self.pip: PolygonIndex | None = None
        self.pc_of_polygon: dict[str, str] = {}
        if spec is not None:
            b = get_gazetteer(spec).boundaries
            self.pip = PolygonIndex(
                b["admin_id"].tolist(),
                [(np.asarray(la), np.asarray(lo))
                 for la, lo in zip(b["ring_lat"], b["ring_lon"])])
            self.pc_of_polygon = dict(zip(b["admin_id"], b["post_code"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(lat) & np.isfinite(lon)
        hexc = np.full(len(lat), -1, dtype=np.int64)
        quadc = np.full(len(lat), -1, dtype=np.int64)
        sqc = np.full(len(lat), -1, dtype=np.int64)
        if ok.any():
            hexc[ok] = hex_cell(lat[ok], lon[ok], self.hex_res)
            quadc[ok] = quad_cell(lat[ok], lon[ok], self.quad_level)
            sqc[ok] = square_cell(lat[ok], lon[ok])
        out = batch.append_column(T_HEX_CELL, pa.array(hexc))
        out = out.append_column(T_QUAD_CELL, pa.array(quadc))
        out = out.append_column(T_SQUARE_CELL, pa.array(sqc))
        if self.pip is not None and self.pc_col is not None:
            pip_ok = np.zeros(len(lat), dtype=bool)
            if ok.any():
                located = np.array(self.pip.locate(lat[ok], lon[ok]),
                                   dtype=object)
                # vectorized reverse-geocode check: the containing
                # polygon's postcode must match the candidate's postcode
                pcs = batch[self.pc_col].to_numpy(zero_copy_only=False)[ok]
                loc_pc = pd.Series(located).map(self.pc_of_polygon).to_numpy()
                pip_ok[ok] = (loc_pc == pcs) | (pcs == "")
            out = out.append_column(T_PIP_OK, pa.array(pip_ok))
        return out


def _partial_counts(key_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.group_by(key_col).aggregate([([], "count_all")])
        return t.rename_columns([key_col, "n"])
    return fn


def rollup_counts(ds: "ray.data.Dataset", key_col: str) -> "ray.data.Dataset":
    """Count rows per tile: per-batch combine (pyarrow hash-agg) then one
    small ``groupby(key).sum`` shuffle over the partials."""
    partial = ds.map_batches(_partial_counts(key_col),
                             batch_format="pyarrow")
    return partial.groupby(key_col).aggregate(Sum("n", alias_name="n"))


def rollup_counts_local(ds: "ray.data.Dataset", key_col: str) -> pd.DataFrame:
    """Tile rollup with a driver-side final merge: per-batch partial
    counts stream to the driver (bounded: at most #distinct-cells rows
    per block) and one pandas groupby merges them — no all-to-all
    barrier, no single-reducer tail.  Correct at any input scale because
    the partial stream is bounded by cells × blocks, not rows."""
    partial = ds.map_batches(_partial_counts(key_col),
                             batch_format="pyarrow")
    parts = [b.to_pandas() for b in
             partial.iter_batches(batch_size=None, batch_format="pyarrow")]
    if not parts:
        return pd.DataFrame({key_col: [], "n": []})
    allp = pd.concat(parts, ignore_index=True)
    return (allp.groupby(key_col, sort=False)["n"].sum()
            .reset_index())


def rollup_counts_salted(ds: "ray.data.Dataset", key_col: str,
                         salt: int = 16) -> "ray.data.Dataset":
    """Two-stage salted rollup for skewed keys: first reduce on
    (key, hash%salt), then merge the per-salt partials.  Use when a
    single tile dominates enough that one reducer becomes the straggler
    even after per-batch combining."""
    def add_salt(batch: pa.Table) -> pa.Table:
        t = batch.group_by(key_col).aggregate([([], "count_all")])
        t = t.rename_columns([key_col, "n"])
        s = np.arange(len(t)) % salt
        return t.append_column("_salt", pa.array(s.astype(np.int64)))

    partial = ds.map_batches(add_salt, batch_format="pyarrow")
    stage1 = partial.groupby([key_col, "_salt"]).aggregate(
        Sum("n", alias_name="n"))
    return stage1.groupby(key_col).aggregate(Sum("n", alias_name="n"))


def method_stats(ds: "ray.data.Dataset", method_col: str = "m_method"
                 ) -> pd.DataFrame:
    """Match-method distribution (the reference notebook's value_counts
    eval, SURVEY.md §2.5 'method/match-rate stats')."""
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.group_by(method_col).aggregate([([], "count_all")])
        return t.rename_columns([method_col, "n"])
    out = (ds.map_batches(fn, batch_format="pyarrow")
             .groupby(method_col).aggregate(Sum("n", alias_name="n")))
    return out.to_pandas()


# ---------------------------------------------------------------------------
# Spatial range join (radius join)
# ---------------------------------------------------------------------------

_KM_PER_DEG_LAT = 110.574
_KM_PER_DEG_LON_EQ = 111.320

_RJ_SCHEMA = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                        ("dist_m", pa.int64())])


def _rj_tag(side: int, id_col: str, lat_col: str, lon_col: str,
            pitch_deg: float, grid_w: int, radius_km: float,
            val_col: str | None = None):
    """Batch fn: tag one side of the radius join with grid cells.

    side 0 (build) rows go to their home cell only; side 1 (probe) rows
    are replicated to every cell their radius circle can touch — ±1 cell
    in lat (pitch ≥ radius by construction) and ±kx in lon, where kx is
    computed per batch from the batch's worst-case latitude (longitude
    degrees shrink by cos(lat)).  Each (probe, build) pair therefore
    meets in exactly ONE partition — the build row's home cell — so no
    pair dedup pass is needed downstream."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        val = (batch[val_col].to_numpy(zero_copy_only=False)
               .astype(np.int64) if val_col is not None
               else np.zeros(len(ids), np.int64))
        iy = np.floor((lat + 90.0) / pitch_deg).astype(np.int64)
        ix = np.floor((lon + 180.0) / pitch_deg).astype(np.int64)
        if side == 0:
            cell = iy * grid_w + ix
            return pa.table({
                "cell": pa.array(cell), "side": pa.array(
                    np.zeros(len(ids), np.int8)),
                "rj_id": pa.array(ids), "rj_lat": pa.array(lat),
                "rj_lon": pa.array(lon), "rj_val": pa.array(val)})
        # probe side: replicate to the (2kx+1) x 3 neighborhood
        if len(ids) == 0:
            kx = 0
        else:
            worst = min(np.abs(lat).max(), 89.0)
            reach_deg = radius_km / (_KM_PER_DEG_LON_EQ
                                     * np.cos(np.radians(worst)))
            kx = int(np.ceil(reach_deg / pitch_deg))
        dxs = np.arange(-kx, kx + 1, dtype=np.int64)
        dys = np.array([-1, 0, 1], dtype=np.int64)
        rep = len(dxs) * len(dys)
        cell = ((iy[:, None] + dys[None, :])[:, :, None] * grid_w
                + (ix[:, None] + dxs[None, :])[:, None, :]).reshape(-1)
        idx = np.repeat(np.arange(len(ids)), rep)
        return pa.table({
            "cell": pa.array(cell),
            "side": pa.array(np.ones(len(cell), np.int8)),
            "rj_id": pa.array(ids[idx]), "rj_lat": pa.array(lat[idx]),
            "rj_lon": pa.array(lon[idx]), "rj_val": pa.array(val[idx])})
    return fn


def radius_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                radius_km: float, *,
                left_id_col: str = "place_id", right_id_col: str = "place_id",
                lat_col: str = "lat", lon_col: str = "lon",
                distinct_pairs: bool = False,
                num_partitions: int | None = None,
                chunk_rows: int = 4096) -> "ray.data.Dataset":
    """All (left, right) pairs within ``radius_km`` great-circle distance —
    the spatial range join the reference's reverse-geocode validation
    implies but never distributes.

    Plan (one shuffle, no all-pairs): bucket both sides on a lat/lon grid
    whose pitch ≥ radius in degrees of latitude; the build (right) side
    keeps its home cell, the probe (left) side is replicated to the 3×(2kx
    +1) neighborhood its circle can touch.  One ``grouped_map`` co-locates
    the cells; inside a partition the candidate matrices are chunked
    (``chunk_rows``) so memory stays bounded regardless of cell density;
    exact haversine filters candidates.  Replication factor is the only
    scale cost and is ≤ 3×(2kx+1) (kx = 1 below ~60° latitude).

    Skew: a hot cell costs one dense (probes × builds) scan — bounded by
    point density × cell area, chunked, never materialized whole.  Not
    antimeridian-safe (documented; regional data).

    ``distinct_pairs=True`` keeps only left_id < right_id — the self-join
    "all pairs within R" form with each unordered pair reported once.

    Returns columns: left_id, right_id (int64), dist_m (floor meters).
    """
    pitch_deg = radius_km / _KM_PER_DEG_LAT
    grid_w = int(np.ceil(360.0 / pitch_deg)) + 4

    from .geom import haversine_km
    from .shuffle import adaptive_partitions, grouped_map
    if num_partitions is None:
        num_partitions = adaptive_partitions()

    build = right.map_batches(
        _rj_tag(0, right_id_col, lat_col, lon_col, pitch_deg, grid_w,
                radius_km), batch_format="pyarrow")
    probe = left.map_batches(
        _rj_tag(1, left_id_col, lat_col, lon_col, pitch_deg, grid_w,
                radius_km), batch_format="pyarrow")

    def match_partition(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _RJ_SCHEMA.empty_table()
        cell = df["cell"].to_numpy()
        order = np.argsort(cell, kind="mergesort")
        cell = cell[order]
        side = df["side"].to_numpy()[order]
        ids = df["rj_id"].to_numpy()[order]
        lat = df["rj_lat"].to_numpy()[order]
        lon = df["rj_lon"].to_numpy()[order]
        bounds = np.flatnonzero(np.diff(cell)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(cell)]))
        out_l, out_r, out_d = [], [], []
        for s, e in zip(starts, ends):
            sl = side[s:e]
            pm = sl == 1
            bm = ~pm
            if not pm.any() or not bm.any():
                continue
            pl_id, pl_la, pl_lo = ids[s:e][pm], lat[s:e][pm], lon[s:e][pm]
            bl_id, bl_la, bl_lo = ids[s:e][bm], lat[s:e][bm], lon[s:e][bm]
            for c0 in range(0, len(pl_id), chunk_rows):
                c1 = min(c0 + chunk_rows, len(pl_id))
                dm = haversine_km(pl_la[c0:c1, None], pl_lo[c0:c1, None],
                                  bl_la[None, :], bl_lo[None, :])
                hit = dm <= radius_km
                if distinct_pairs:
                    hit &= pl_id[c0:c1, None] < bl_id[None, :]
                pi, bi = np.nonzero(hit)
                if len(pi):
                    out_l.append(pl_id[c0:c1][pi])
                    out_r.append(bl_id[bi])
                    out_d.append(np.floor(dm[pi, bi] * 1000.0)
                                 .astype(np.int64))
        if not out_l:
            return _RJ_SCHEMA.empty_table()
        return pa.table({"left_id": pa.array(np.concatenate(out_l)),
                         "right_id": pa.array(np.concatenate(out_r)),
                         "dist_m": pa.array(np.concatenate(out_d))})

    both = build.union(probe)
    out = grouped_map(both, "cell", match_partition,
                      num_partitions=num_partitions, group_fn=False)
    # empty shuffle partitions skip the UDF and forward zero-column
    # blocks; restore the typed schema so an all-empty result still
    # carries (left_id, right_id, dist_m)
    return out.map_batches(
        lambda b: b if b.num_columns else _RJ_SCHEMA.empty_table(),
        batch_format="pyarrow")


_NJ_SCHEMA = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                        ("dist_m", pa.int64())])


def nearest_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 radius_km: float, *,
                 left_id_col: str = "place_id",
                 right_id_col: str = "place_id",
                 lat_col: str = "lat", lon_col: str = "lon",
                 exclude_self: bool = False,
                 num_partitions: int | None = None,
                 chunk_rows: int = 4096) -> "ray.data.Dataset":
    """Nearest right-side point within ``radius_km`` for every left point
    (the distributed reverse-geocode primitive; ties broken by smaller
    right id).  Left rows with no neighbor in range are absent from the
    output — the radius bounds both the answer and the search cost.

    Plan: the same grid bucketing as ``radius_join`` (build side home-
    celled, probe side replicated to the reachable neighborhood), but
    each partition emits at most ONE candidate per probe row it saw
    (per-partition argmin over chunked haversine matrices, carrying the
    exact float distance), then a second, candidate-sized shuffle picks
    the global min per probe — the reduce input is bounded by probes ×
    replication factor, never by build-side size."""
    pitch_deg = radius_km / _KM_PER_DEG_LAT
    grid_w = int(np.ceil(360.0 / pitch_deg)) + 4

    from .geom import haversine_km
    from .shuffle import adaptive_partitions, grouped_map
    if num_partitions is None:
        num_partitions = adaptive_partitions()

    build = right.map_batches(
        _rj_tag(0, right_id_col, lat_col, lon_col, pitch_deg, grid_w,
                radius_km), batch_format="pyarrow")
    probe = left.map_batches(
        _rj_tag(1, left_id_col, lat_col, lon_col, pitch_deg, grid_w,
                radius_km), batch_format="pyarrow")

    cand_schema = pa.schema([("left_id", pa.int64()),
                             ("right_id", pa.int64()),
                             ("dist_km", pa.float64())])

    def partial_best(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return cand_schema.empty_table()
        cell = df["cell"].to_numpy()
        order = np.argsort(cell, kind="mergesort")
        cell = cell[order]
        side = df["side"].to_numpy()[order]
        ids = df["rj_id"].to_numpy()[order]
        lat = df["rj_lat"].to_numpy()[order]
        lon = df["rj_lon"].to_numpy()[order]
        bounds = np.flatnonzero(np.diff(cell)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(cell)]))
        out_l, out_r, out_d = [], [], []
        for s, e in zip(starts, ends):
            sl = side[s:e]
            pm = sl == 1
            bm = ~pm
            if not pm.any() or not bm.any():
                continue
            pl_id, pl_la, pl_lo = ids[s:e][pm], lat[s:e][pm], lon[s:e][pm]
            bl_id, bl_la, bl_lo = ids[s:e][bm], lat[s:e][bm], lon[s:e][bm]
            for c0 in range(0, len(pl_id), chunk_rows):
                c1 = min(c0 + chunk_rows, len(pl_id))
                dm = haversine_km(pl_la[c0:c1, None], pl_lo[c0:c1, None],
                                  bl_la[None, :], bl_lo[None, :])
                bad = dm > radius_km
                if exclude_self:
                    bad |= pl_id[c0:c1, None] == bl_id[None, :]
                # argmin by (dist, right_id): mask invalid with +inf,
                # and among equal distances prefer the smaller id by
                # scanning ids in ascending order (stable argmin on a
                # id-sorted build side)
                id_order = np.argsort(bl_id, kind="mergesort")
                dm_s = np.where(bad, np.inf, dm)[:, id_order]
                j = np.argmin(dm_s, axis=1)
                d = dm_s[np.arange(len(j)), j]
                keep = np.isfinite(d)
                if keep.any():
                    out_l.append(pl_id[c0:c1][keep])
                    out_r.append(bl_id[id_order][j[keep]])
                    out_d.append(d[keep])
        if not out_l:
            return cand_schema.empty_table()
        return pa.table({"left_id": pa.array(np.concatenate(out_l)),
                         "right_id": pa.array(np.concatenate(out_r)),
                         "dist_km": pa.array(np.concatenate(out_d))})

    both = build.union(probe)
    cands = grouped_map(both, "cell", partial_best,
                        num_partitions=num_partitions, group_fn=False)

    def global_best(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _NJ_SCHEMA.empty_table()
        df = df.sort_values(["left_id", "dist_km", "right_id"],
                            kind="mergesort")
        best = df.drop_duplicates("left_id", keep="first")
        return pa.table({
            "left_id": pa.array(best["left_id"].to_numpy(np.int64)),
            "right_id": pa.array(best["right_id"].to_numpy(np.int64)),
            "dist_m": pa.array(np.floor(best["dist_km"].to_numpy()
                                        * 1000.0).astype(np.int64))})

    out = grouped_map(cands, "left_id", global_best,
                      num_partitions=max(8, num_partitions // 4),
                      group_fn=False)
    return out.map_batches(
        lambda b: b if b.num_columns else _NJ_SCHEMA.empty_table(),
        batch_format="pyarrow")


_IDW_SCHEMA = pa.schema([("left_id", pa.int64()), ("num", pa.int64()),
                         ("den", pa.int64())])


def idw_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
             radius_km: float, *, val_col: str,
             left_id_col: str = "cell_id", right_id_col: str = "place_id",
             lat_col: str = "lat", lon_col: str = "lon",
             num_partitions: int | None = None,
             chunk_rows: int = 4096) -> "ray.data.Dataset":
    """Inverse-distance-weighted interpolation join: for every left
    (probe) point, the integer-exact IDW moments over right points
    within ``radius_km`` — num = Σ w·v, den = Σ w with
    w = 10⁹ // max(dist_mm→m floor, 1) and v the right side's integer
    ``val_col``.  The estimate is num/den (one exact integer division
    away), and because every term is int64 after the millimeter floor,
    a SQL oracle reproduces the moments bit-for-bit (no float
    summation-order risk).

    Plan: the radius join's grid bucketing verbatim (each (probe,
    build) pair meets in exactly ONE partition), per-partition partial
    moments per probe (chunked matrices bound memory on hot cells),
    then ONE probe-keyed groupby merges partials.  Probes with no
    build point in range are absent from the output (SQL inner-join
    semantics)."""
    from ray.data.aggregate import Sum

    pitch_deg = radius_km / _KM_PER_DEG_LAT
    grid_w = int(np.ceil(360.0 / pitch_deg)) + 4

    from .geom import haversine_km
    from .shuffle import adaptive_partitions, grouped_map
    if num_partitions is None:
        num_partitions = adaptive_partitions()

    build = right.map_batches(
        _rj_tag(0, right_id_col, lat_col, lon_col, pitch_deg, grid_w,
                radius_km, val_col=val_col), batch_format="pyarrow")
    probe = left.map_batches(
        _rj_tag(1, left_id_col, lat_col, lon_col, pitch_deg, grid_w,
                radius_km), batch_format="pyarrow")

    def moments_partition(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _IDW_SCHEMA.empty_table()
        cell = df["cell"].to_numpy()
        order = np.argsort(cell, kind="mergesort")
        cell = cell[order]
        side = df["side"].to_numpy()[order]
        ids = df["rj_id"].to_numpy()[order]
        lat = df["rj_lat"].to_numpy()[order]
        lon = df["rj_lon"].to_numpy()[order]
        val = df["rj_val"].to_numpy()[order]
        bounds = np.flatnonzero(np.diff(cell)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(cell)]))
        out_id, out_num, out_den = [], [], []
        for s, e in zip(starts, ends):
            sl = side[s:e]
            pm = sl == 1
            bm = ~pm
            if not pm.any() or not bm.any():
                continue
            pl_id, pl_la, pl_lo = ids[s:e][pm], lat[s:e][pm], lon[s:e][pm]
            bl_la, bl_lo = lat[s:e][bm], lon[s:e][bm]
            bl_v = val[s:e][bm]
            for c0 in range(0, len(pl_id), chunk_rows):
                c1 = min(c0 + chunk_rows, len(pl_id))
                dm = haversine_km(pl_la[c0:c1, None], pl_lo[c0:c1, None],
                                  bl_la[None, :], bl_lo[None, :])
                hit = dm <= radius_km
                if not hit.any():
                    continue
                dmm = np.floor(dm * 1000.0).astype(np.int64)
                w = np.int64(1_000_000_000) // np.maximum(dmm, 1)
                w = np.where(hit, w, 0)
                out_id.append(pl_id[c0:c1])
                out_num.append((w * bl_v[None, :]).sum(axis=1))
                out_den.append(w.sum(axis=1))
        if not out_id:
            return _IDW_SCHEMA.empty_table()
        t = pa.table({"left_id": pa.array(np.concatenate(out_id)),
                      "num": pa.array(np.concatenate(out_num)),
                      "den": pa.array(np.concatenate(out_den))})
        return t.filter(pa.compute.greater(t["den"], 0))

    both = build.union(probe)
    parts = grouped_map(both, "cell", moments_partition,
                        num_partitions=num_partitions, group_fn=False)
    parts = parts.map_batches(
        lambda b: b if b.num_columns else _IDW_SCHEMA.empty_table(),
        batch_format="pyarrow")
    return parts.groupby("left_id").aggregate(
        Sum("num", alias_name="num"), Sum("den", alias_name="den"))


_COMPACT_SCHEMA = pa.schema([("cell", pa.int64())])


def quad_compact(ds: "ray.data.Dataset", cell_col: str = "cell",
                 group_level: int = 6,
                 num_partitions: int | None = None) -> "ray.data.Dataset":
    """Compact a (possibly duplicated) set of quadtree cell ids to the
    minimal mixed-level cover of the same area — H3 ``compact`` / S2
    ``S2CellUnion::Normalize`` as a Ray Data op (the standard way to
    turn a billion-cell coverage mask into a shippable tile set).

    Plan (scale story): a merge of 4 siblings below level
    ``group_level`` can never cross a level-``group_level`` subtree
    boundary, so ONE hash shuffle co-partitions cells by their
    level-``group_level`` ancestor and each partition compacts its
    subtrees locally (vectorized, ``cells.compact_cells``).  What's
    left at levels <= ``group_level`` is globally bounded by
    4^``group_level`` ids (<= 4096 at the default), so the residue is
    finished in one final task — no driver-side loop, no global
    fixpoint iteration.  Input cells must be non-overlapping (one
    level, or an existing disjoint cover); duplicates co-locate with
    their subtree and are deduped there.
    """
    from .cells import compact_cells
    from .shuffle import grouped_map

    g = np.int64(group_level)
    code_mask = np.int64((1 << 56) - 1)

    def add_anc(batch: pa.Table) -> pa.Table:
        c = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lvl = c >> np.int64(56)
        drop = np.maximum(lvl - g, 0)
        anc = np.where(
            lvl <= g, c,
            (g << np.int64(56)) | ((c & code_mask) >> (2 * drop)))
        return pa.table({"cell": pa.array(c), "anc": pa.array(anc)})

    def compact_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _COMPACT_SCHEMA.empty_table()
        out = compact_cells(df["cell"].to_numpy(), stop_level=group_level)
        return pa.table({"cell": pa.array(out, pa.int64())})

    local = grouped_map(ds.map_batches(add_anc, batch_format="pyarrow"),
                        "anc", compact_part,
                        num_partitions=num_partitions, group_fn=False)

    def split(keep_coarse: bool):
        def fn(batch: pa.Table) -> pa.Table:
            c = batch["cell"].to_numpy(zero_copy_only=False)
            m = (c >> np.int64(56)) <= g
            return batch.filter(pa.array(m if keep_coarse else ~m))
        return fn

    fine = local.map_batches(split(False), batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _COMPACT_SCHEMA.empty_table()
        out = compact_cells(batch["cell"].to_numpy(zero_copy_only=False),
                            stop_level=0)
        return pa.table({"cell": pa.array(out, pa.int64())})

    # the coarse residue is <= 4^group_level ids TOTAL — one task
    coarse = (local.map_batches(split(True), batch_format="pyarrow")
              .repartition(1).map_batches(finish, batch_format="pyarrow"))
    return fine.union(coarse)


def quad_uncompact(ds: "ray.data.Dataset", level: int,
                   cell_col: str = "cell") -> "ray.data.Dataset":
    """Expand a mixed-level quadtree cover to uniform ``level`` cells
    (H3 ``uncompact``): each cell fans out to its 4^(level-lvl)
    descendants.  Pure map-side (no shuffle); vectorized by expansion
    depth so a batch costs O(output cells), not a Python loop per id.
    Cells already at ``level`` pass through; cells DEEPER than
    ``level`` raise (a cover being uncompacted must be at or above the
    target resolution)."""
    code_mask = np.int64((1 << 56) - 1)

    def expand(batch: pa.Table) -> pa.Table:
        c = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(c):
            return pa.table({"cell": pa.array([], pa.int64())})
        lvl = (c >> np.int64(56)).astype(np.int64)
        if (lvl > level).any():
            raise ValueError(f"cover contains cells deeper than {level}")
        out = []
        tag = np.int64(level) << np.int64(56)
        for d in np.unique(level - lvl):
            base = (c[level - lvl == d] & code_mask) << np.int64(2 * d)
            kids = (base[:, None]
                    + np.arange(4 ** d, dtype=np.int64)[None, :])
            out.append(tag | kids.ravel())
        return pa.table({"cell": pa.array(np.concatenate(out))})

    return ds.map_batches(expand, batch_format="pyarrow")
