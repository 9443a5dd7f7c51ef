"""Raster <-> vector operators over a regular lat/lon grid (the north
rule's raster leg, alongside H3/S2 tiling in ``tiles.py`` /
``cells.py``):

- ``rasterize_points`` — vector -> raster: per-cell point-density grid
  via map-side partial counts + one small (row, col) groupby; the
  shuffle moves one row per occupied cell per block, never per point.
- ``rasterize_polygons`` — vector -> raster burn: every grid-cell
  CENTER inside a polygon ring (even-odd ray cast, the same kernel the
  PIP validator uses, ``geom.point_in_polygon``).  Polygons fan out
  across tasks; each task only evaluates the cells inside its
  polygon's bbox, so cost is covered-area-bounded, not grid-bounded.
- ``vectorize_runs`` — raster -> vector: run-length polygonization of
  cells above a threshold into horizontal (row, col_start, col_end)
  segments, co-partitioned by row through ``shuffle.grouped_map``.

Grid convention: ``row = floor((lat - lat0) / cell_deg)``, ``col =
floor((lon - lon0) / cell_deg)``, centers at ``lat0 + (row + 0.5) *
cell_deg`` — every float expression is written in the same literal
form on the engine and the DuckDB oracle so the doubles are
bit-identical (the PIP crossing math is already bit-verified,
entrylib geo_pip_validate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .geom import point_in_polygon

# default grid over the synthetic Belgian-style world (gazetteer spans
# lat 49.63..51.37, lon 2.77..6.22)
LAT0 = 49.6
LON0 = 2.75
CELL_DEG = 0.05
NROWS = 36
NCOLS = 70


def rasterize_points(ds: "ray.data.Dataset", lat_col: str = "lat",
                     lon_col: str = "lon", lat0: float = LAT0,
                     lon0: float = LON0, cell_deg: float = CELL_DEG,
                     nrows: int = NROWS, ncols: int = NCOLS):
    """Point density raster: (row, col, n) for every occupied cell;
    points outside the grid are dropped."""
    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        row = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        col = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        ok = (row >= 0) & (row < nrows) & (col >= 0) & (col < ncols)
        code = row[ok] * ncols + col[ok]
        vals, counts = np.unique(code, return_counts=True)
        return pa.table({"row": pa.array(vals // ncols, pa.int64()),
                         "col": pa.array(vals % ncols, pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    summed = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["row", "col"]).sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"row": batch["row"], "col": batch["col"],
                         "n": batch["sum(n)"]})

    return summed.map_batches(rename, batch_format="pyarrow")


def rasterize_polygons(bnds: "ray.data.Dataset", id_col: str = "bnd_idx",
                       lat0: float = LAT0, lon0: float = LON0,
                       cell_deg: float = CELL_DEG, nrows: int = NROWS,
                       ncols: int = NCOLS):
    """Polygon burn: (id, row, col) for every grid cell whose center
    lies inside the ring (even-odd).  One task per block of polygons;
    the candidate cell set is clipped to each polygon's bbox first."""
    def burn(batch: pa.Table) -> pa.Table:
        ids_out, rows_out, cols_out = [], [], []
        for rid, rlat, rlon in zip(batch[id_col].to_pylist(),
                                   batch["ring_lat"].to_pylist(),
                                   batch["ring_lon"].to_pylist()):
            rlat = np.asarray(rlat, dtype=np.float64)
            rlon = np.asarray(rlon, dtype=np.float64)
            r0 = max(0, int(np.floor((rlat.min() - lat0) / cell_deg)))
            r1 = min(nrows - 1, int(np.floor((rlat.max() - lat0)
                                             / cell_deg)))
            c0 = max(0, int(np.floor((rlon.min() - lon0) / cell_deg)))
            c1 = min(ncols - 1, int(np.floor((rlon.max() - lon0)
                                             / cell_deg)))
            if r1 < r0 or c1 < c0:
                continue
            rr, cc = np.meshgrid(np.arange(r0, r1 + 1, dtype=np.int64),
                                 np.arange(c0, c1 + 1, dtype=np.int64),
                                 indexing="ij")
            rr = rr.ravel()
            cc = cc.ravel()
            clat = lat0 + (rr + 0.5) * cell_deg
            clon = lon0 + (cc + 0.5) * cell_deg
            hit = point_in_polygon(clat, clon, rlat, rlon)
            ids_out.extend([rid] * int(hit.sum()))
            rows_out.extend(rr[hit].tolist())
            cols_out.extend(cc[hit].tolist())
        return pa.table({id_col: pa.array(ids_out, batch[id_col].type),
                         "row": pa.array(rows_out, pa.int64()),
                         "col": pa.array(cols_out, pa.int64())})

    return bnds.map_batches(burn, batch_format="pyarrow")


def vectorize_runs(raster: "ray.data.Dataset", threshold: int = 1,
                   num_partitions: int | None = None):
    """Raster -> vector: merge consecutive above-threshold cells within
    each row into (row, col_start, col_end, n_cells, sum_n) segments.
    Rows are co-partitioned (hash on row), so each segment is built
    entirely locally; the shuffle moves only above-threshold cells."""
    from .shuffle import grouped_map

    filt = raster.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["n"], threshold)),
        batch_format="pyarrow")

    def runs(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["row", "col"], kind="mergesort")
        row = df["row"].to_numpy(np.int64)
        col = df["col"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        if len(df) == 0:
            brk = np.empty(0, dtype=bool)
        else:
            brk = np.r_[True, (row[1:] != row[:-1])
                        | (col[1:] != col[:-1] + 1)]
        seg = np.cumsum(brk) - 1
        out = pd.DataFrame({"row": row, "col": col, "n": n, "seg": seg})
        g = out.groupby("seg", sort=True).agg(
            row=("row", "first"), col_start=("col", "min"),
            col_end=("col", "max"), n_cells=("col", "size"),
            sum_n=("n", "sum"))
        return pa.table({
            "row": pa.array(g["row"].to_numpy(np.int64)),
            "col_start": pa.array(g["col_start"].to_numpy(np.int64)),
            "col_end": pa.array(g["col_end"].to_numpy(np.int64)),
            "n_cells": pa.array(g["n_cells"].to_numpy(np.int64)),
            "sum_n": pa.array(g["sum_n"].to_numpy(np.int64))})

    return grouped_map(filt, "row", runs,
                       num_partitions=num_partitions, group_fn=False)
