"""Edge cases for the round-4 geometry kernels: hex k-ring arithmetic
and Douglas-Peucker simplification (pure numpy, no Ray)."""

import numpy as np

from georay.cells import hex_cell, hex_kring, hex_kring_offsets
from georay.geom import dp_simplify


def test_kring_offsets_counts():
    # 3k^2 + 3k + 1 disc cells
    for k in (0, 1, 2, 3):
        assert len(hex_kring_offsets(k)) == 3 * k * k + 3 * k + 1


def test_kring_symmetry_and_self():
    cells = hex_cell(np.array([50.8, 50.85, -12.0]),
                     np.array([4.3, 4.45, 170.0]), 9)
    ctr, nbr = hex_kring(cells, 1)
    assert len(ctr) == 3 * 7
    ring = {}
    for c, n in zip(ctr.tolist(), nbr.tolist()):
        ring.setdefault(c, set()).add(n)
    for c in cells.tolist():
        assert c in ring[c]                       # disc includes self
    # symmetry: b in ring(a) <=> a in ring(b)
    a, b = cells[0], None
    for n in ring[cells[0]]:
        if n != cells[0]:
            b = n
            break
    _, nbr_b = hex_kring(np.array([b]), 1)
    assert a in set(nbr_b.tolist())


def test_dp_keeps_endpoints_and_corners():
    lat = np.array([0.0, 0.5, 1.0, 1.0, 1.0])
    lon = np.array([0.0, 0.001, 0.0, 0.5, 1.0])
    keep = dp_simplify(lat, lon, 0.01)
    assert keep[0] and keep[-1] and keep[2]       # corner survives
    assert not keep[1] and not keep[3]            # near-collinear dropped
    # huge eps: only endpoints
    assert dp_simplify(lat, lon, 10.0).sum() == 2


def test_dp_degenerate_and_tiny():
    assert dp_simplify(np.array([]), np.array([]), 0.1).tolist() == []
    assert dp_simplify(np.array([1.0]), np.array([2.0]), 0.1).tolist() \
        == [True]
    assert dp_simplify(np.array([1.0, 1.0]), np.array([2.0, 2.0]),
                       0.1).tolist() == [True, True]
    # identical endpoints (closed loop): falls back to distance-to-a
    lat = np.array([0.0, 1.0, 0.0])
    lon = np.array([0.0, 0.0, 0.0])
    keep = dp_simplify(lat, lon, 0.5)
    assert keep.tolist() == [True, True, True]


def test_dp_tolerance_invariant():
    # every dropped point is within eps of its enclosing kept segment
    rng = np.random.default_rng(4)
    lat = np.cumsum(rng.normal(0, 0.01, size=60))
    lon = np.cumsum(rng.normal(0, 0.01, size=60))
    eps = 0.005
    keep = dp_simplify(lat, lon, eps)
    kept_idx = np.flatnonzero(keep)
    for j in np.flatnonzero(~keep):
        a = kept_idx[kept_idx < j].max()
        b = kept_idx[kept_idx > j].min()
        ax, ay, bx, by = lon[a], lat[a], lon[b], lat[b]
        px, py = lon[j], lat[j]
        den = np.hypot(bx - ax, by - ay)
        dev = (abs((bx - ax) * (py - ay) - (by - ay) * (px - ax)) / den
               if den else np.hypot(px - ax, py - ay))
        assert dev <= eps + 1e-12
