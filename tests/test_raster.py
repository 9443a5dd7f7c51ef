"""Raster <-> vector operator tests (georay/raster.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from georay.raster import (rasterize_points, rasterize_polygons,
                           vectorize_runs)


def test_rasterize_points_counts_and_clip(ray_session):
    # two points in the same cell, one in another, one outside the grid
    rows = [{"lat": 49.62, "lon": 2.77},   # row 0, col 0
            {"lat": 49.64, "lon": 2.79},   # row 0, col 0
            {"lat": 49.66, "lon": 2.81},   # row 1, col 1
            {"lat": 10.0, "lon": 100.0}]   # off-grid -> dropped
    got = rasterize_points(ray.data.from_items(rows)).to_pandas()
    got = got.sort_values(["row", "col"]).reset_index(drop=True)
    assert got.to_dict("list") == {"row": [0, 1], "col": [0, 1],
                                   "n": [2, 1]}


def test_rasterize_polygons_square(ray_session):
    # axis-aligned square covering cell centers rows 2..3, cols 4..5
    lat_lo, lat_hi = 49.6 + 2 * 0.05, 49.6 + 4 * 0.05
    lon_lo, lon_hi = 2.75 + 4 * 0.05, 2.75 + 6 * 0.05
    bnds = ray.data.from_items([{
        "bnd_idx": 7,
        "ring_lat": [lat_lo, lat_lo, lat_hi, lat_hi, lat_lo],
        "ring_lon": [lon_lo, lon_hi, lon_hi, lon_lo, lon_lo]}])
    got = rasterize_polygons(bnds).to_pandas()
    cells = set(zip(got["row"], got["col"]))
    assert cells == {(2, 4), (2, 5), (3, 4), (3, 5)}
    assert (got["bnd_idx"] == 7).all()


def test_vectorize_runs_segments(ray_session):
    # row 5: cols 1,2,3 and 7,8 above threshold; col 4 below threshold
    raster = ray.data.from_items(
        [{"row": 5, "col": c, "n": 3} for c in (1, 2, 3, 7, 8)]
        + [{"row": 5, "col": 4, "n": 1},
           {"row": 6, "col": 2, "n": 9}])
    got = vectorize_runs(raster, threshold=2).to_pandas()
    got = got.sort_values(["row", "col_start"]).reset_index(drop=True)
    assert got[["row", "col_start", "col_end", "n_cells", "sum_n"]] \
        .to_dict("records") == [
        {"row": 5, "col_start": 1, "col_end": 3, "n_cells": 3, "sum_n": 9},
        {"row": 5, "col_start": 7, "col_end": 8, "n_cells": 2, "sum_n": 6},
        {"row": 6, "col_start": 2, "col_end": 2, "n_cells": 1, "sum_n": 9}]


def test_raster_roundtrip_consistency(ray_session):
    # vector -> raster -> vector: every segment's sum_n equals the
    # number of source points it covers
    rng = np.random.default_rng(3)
    lats = 49.6 + rng.uniform(0.0, 0.3, 200)
    lons = 2.75 + rng.uniform(0.0, 0.3, 200)
    pts = ray.data.from_items(
        [{"lat": float(a), "lon": float(b)} for a, b in zip(lats, lons)])
    raster = rasterize_points(pts).to_pandas()
    assert raster["n"].sum() == 200
    segs = vectorize_runs(rasterize_points(pts), threshold=1).to_pandas()
    assert segs["sum_n"].sum() == 200
    assert (segs["col_end"] >= segs["col_start"]).all()
