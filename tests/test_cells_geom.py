"""Spatial kernel tests: hex/quad/square cell ids, haversine, PIP
(FIXTURES.md §5 property checks)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georay.cells import (hex_cell, hex_cell_center, quad_cell, quad_parent,
                          square_cell)
from georay.geom import PolygonIndex, haversine_km, point_in_polygon

LAT = st.floats(min_value=-85, max_value=85, allow_nan=False)
LON = st.floats(min_value=-179, max_value=179, allow_nan=False)


def test_hex_cell_deterministic_and_center_roundtrip():
    lat = np.array([50.8333, 51.05, 50.6326])
    lon = np.array([4.35, 3.71, 5.5797])
    c1 = hex_cell(lat, lon, 9)
    c2 = hex_cell(lat, lon, 9)
    assert (c1 == c2).all()
    # center of a cell maps back to the same cell
    clat, clon = hex_cell_center(c1)
    assert (hex_cell(clat, clon, 9) == c1).all()


@given(st.lists(st.tuples(LAT, LON), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_hex_center_within_one_edge(pts):
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    c = hex_cell(lat, lon, 9)
    clat, clon = hex_cell_center(c)
    # center must be within one hex diameter of the point
    size = 2.0 / 2 ** 9
    assert (np.abs(clat - lat) < 2 * size).all()
    assert (np.abs(clon - lon) < 2 * size).all()


@given(st.lists(st.tuples(LAT, LON), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_quad_parent_containment(pts):
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    child = quad_cell(lat, lon, 18)
    parent = quad_cell(lat, lon, 17)
    assert (quad_parent(child) == parent).all()


def test_square_cell_formula():
    # matches the SQL: floor((lat+90)/p)*W + floor((lon+180)/p)
    lat = np.array([50.8333])
    lon = np.array([4.35])
    p = 0.05
    w = int(round(360 / p))
    expect = int(np.floor((50.8333 + 90) / p)) * w + int(np.floor((4.35 + 180) / p))
    assert square_cell(lat, lon)[0] == expect


def test_haversine_known_distance():
    # Brussels -> Antwerp ≈ 41.5 km
    d = haversine_km([50.8503], [4.3517], [51.2194], [4.4025])
    assert 40 < d[0] < 43
    assert haversine_km([50.0], [4.0], [50.0], [4.0])[0] == 0.0


def test_point_in_polygon_square():
    ring_lat = np.array([0.0, 0.0, 1.0, 1.0])
    ring_lon = np.array([0.0, 1.0, 1.0, 0.0])
    lat = np.array([0.5, 1.5, 0.5])
    lon = np.array([0.5, 0.5, 1.5])
    got = point_in_polygon(lat, lon, ring_lat, ring_lon)
    assert got.tolist() == [True, False, False]


@given(st.lists(st.tuples(st.floats(-2, 3, allow_nan=False),
                          st.floats(-2, 3, allow_nan=False)),
                min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_polygon_index_matches_bruteforce(pts):
    # two disjoint squares
    rings = [(np.array([0.0, 0.0, 1.0, 1.0]), np.array([0.0, 1.0, 1.0, 0.0])),
             (np.array([2.0, 2.0, 2.5, 2.5]), np.array([2.0, 2.5, 2.5, 2.0]))]
    idx = PolygonIndex(["a", "b"], rings)
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    got = idx.locate(lat, lon)
    for i in range(len(pts)):
        hits = [pid for pid, (rla, rlo) in zip(["a", "b"], rings)
                if point_in_polygon(lat[i:i+1], lon[i:i+1], rla, rlo)[0]]
        assert got[i] == (hits[0] if hits else None)


def test_geohash_canonical_vectors():
    """Pin against published geohash values (Niemeyer encoding)."""
    from georay.cells import geohash
    assert geohash([57.64911], [10.40744], 7)[0] == "u4pruyd"
    assert geohash([0.0], [0.0], 7)[0] == "s000000"
    assert geohash([-90.0], [-180.0], 7)[0] == "0000000"
    assert geohash([89.99999], [179.99999], 7)[0] == "zzzzzzz"
    # prefix property: nearby points share long prefixes
    a = geohash([50.85030], [4.35170], 7)[0]
    b = geohash([50.85031], [4.35171], 7)[0]
    assert a[:6] == b[:6]
