"""Geometry kernels, from scratch (no geopy/shapely in the sandbox —
SURVEY.md §2.7): vectorized haversine distance, point-in-polygon ray
casting, and a small packed grid index over polygons (the broadcast
"STRtree" held by the PIP-validator stage).

The reference computes reject→match geodesic distance with geopy
(utils.py:1066,1091, rounded to 3); we use the published haversine
formula (mean earth radius 6371.0088 km) — adequate at address scale.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in km (standard haversine)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def point_in_polygon(lat: np.ndarray, lon: np.ndarray,
                     ring_lat: np.ndarray, ring_lon: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: for N points against ONE simple
    polygon ring (closed or open), returns a bool mask of containment.
    Points exactly on an edge may fall either side (standard caveat)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    rlat = np.asarray(ring_lat, dtype=np.float64)
    rlon = np.asarray(ring_lon, dtype=np.float64)
    if rlat[0] == rlat[-1] and rlon[0] == rlon[-1]:
        rlat, rlon = rlat[:-1], rlon[:-1]
    n = len(rlat)
    inside = np.zeros(len(lat), dtype=bool)
    j = n - 1
    for i in range(n):
        yi, xi = rlat[i], rlon[i]
        yj, xj = rlat[j], rlon[j]
        cond = (yi > lat) != (yj > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (lat - yi) / (yj - yi) + xi
        crosses = cond & (lon < xint)
        inside ^= crosses
        j = i
    return inside


class PolygonIndex:
    """Packed bbox grid over a set of polygons — the broadcast side of the
    point-in-polygon validation stage (SURVEY.md §2.3 PipValidatorActor).

    Built once on the driver, shipped via ``ray.put``; queried per batch
    with vectorized candidate filtering (bbox grid) + exact ray casting.
    """

    def __init__(self, polygon_ids: list[str],
                 rings: list[tuple[np.ndarray, np.ndarray]],
                 grid: int = 64):
        self.ids = list(polygon_ids)
        self.rings = [(np.asarray(a, dtype=np.float64),
                       np.asarray(b, dtype=np.float64)) for a, b in rings]
        self.bbox = np.array([[a.min(), a.max(), b.min(), b.max()]
                              for a, b in self.rings])  # lat0,lat1,lon0,lon1
        self.lat0 = float(self.bbox[:, 0].min())
        self.lat1 = float(self.bbox[:, 1].max())
        self.lon0 = float(self.bbox[:, 2].min())
        self.lon1 = float(self.bbox[:, 3].max())
        self.grid = grid
        # grid cell -> list of polygon indices whose bbox overlaps it
        self.cells: dict[tuple[int, int], list[int]] = {}
        for pi, (la0, la1, lo0, lo1) in enumerate(self.bbox):
            gy0, gx0 = self._cell(la0, lo0)
            gy1, gx1 = self._cell(la1, lo1)
            for gy in range(gy0, gy1 + 1):
                for gx in range(gx0, gx1 + 1):
                    self.cells.setdefault((gy, gx), []).append(pi)

    def _cell(self, lat: float, lon: float) -> tuple[int, int]:
        g = self.grid
        gy = int(np.clip((lat - self.lat0) / max(self.lat1 - self.lat0, 1e-12) * g, 0, g - 1))
        gx = int(np.clip((lon - self.lon0) / max(self.lon1 - self.lon0, 1e-12) * g, 0, g - 1))
        return gy, gx

    def locate(self, lat: np.ndarray, lon: np.ndarray) -> list[str | None]:
        """First containing polygon id per point (None if outside all)."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        out: list[str | None] = [None] * len(lat)
        # vectorized grid-cell assignment, then one candidate-polygon pass
        # per occupied cell (vectorized over the cell's points)
        g = self.grid
        gy = np.clip((lat - self.lat0) / max(self.lat1 - self.lat0, 1e-12) * g,
                     0, g - 1).astype(np.int64)
        gx = np.clip((lon - self.lon0) / max(self.lon1 - self.lon0, 1e-12) * g,
                     0, g - 1).astype(np.int64)
        code = gy * g + gx
        order = np.argsort(code, kind="stable")
        bounds = np.flatnonzero(np.r_[True, np.diff(code[order]) != 0])
        cell_pts = {}
        for s, e in zip(bounds, np.r_[bounds[1:], len(order)] if len(order) else []):
            idx = order[s:e]
            cell_pts[(int(gy[idx[0]]), int(gx[idx[0]]))] = idx
        for cell, idxs in cell_pts.items():
            cand = self.cells.get(cell)
            if not cand:
                continue
            ii = np.asarray(idxs)
            la, lo = lat[ii], lon[ii]
            undecided = np.ones(len(ii), dtype=bool)
            for pi in cand:
                if not undecided.any():
                    break
                la0, la1, lo0, lo1 = self.bbox[pi]
                mask = undecided & (la >= la0) & (la <= la1) & (lo >= lo0) & (lo <= lo1)
                if not mask.any():
                    continue
                hit = point_in_polygon(la[mask], lo[mask], *self.rings[pi])
                hit_idx = ii[mask][hit]
                for k in hit_idx:
                    out[k] = self.ids[pi]
                und = undecided[mask]
                und[hit] = False
                undecided[mask] = und
        return out


def dp_simplify(lat: np.ndarray, lon: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (published algorithm),
    iterative stack form, planar degree space (x=lon, y=lat — adequate
    at sub-degree extents; the haversine ops own metric distances).

    Determinism contract the SQL oracle replicates op-for-op: deviation
    = |(bx-ax)(py-ay) - (by-ay)(px-ax)| / sqrt((bx-ax)^2 + (by-ay)^2)
    (degenerate a==b segments fall back to euclidean distance to a),
    split on STRICT dev > eps at the FIRST index attaining the max
    (numpy argmax), endpoints always kept.  Returns a keep mask."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = len(lat)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay = lon[a], lat[a]
        bx, by = lon[b], lat[b]
        px = lon[a + 1:b]
        py = lat[a + 1:b]
        dx = bx - ax
        dy = by - ay
        den = np.sqrt(dx * dx + dy * dy)
        if den == 0.0:
            dev = np.sqrt((px - ax) ** 2 + (py - ay) ** 2)
        else:
            dev = np.abs(dx * (py - ay) - dy * (px - ax)) / den
        i = int(np.argmax(dev))
        if dev[i] > eps:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep
