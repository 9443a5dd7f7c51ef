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
