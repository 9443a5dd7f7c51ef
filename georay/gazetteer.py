"""Deterministic synthetic Belgian-style gazetteer + in-process geocoder index.

The reference delegates geocoding to three sidecar services (Nominatim,
Photon, libpostal — /root/reference/base.py:74-272, docker-compose-full.yml).
The sandbox has no network, so the engine's geocoder stage is an in-actor
deterministic index (SURVEY.md §7): built once per actor process from a
seeded spec, it answers

- ``search(free_text)``        — Nominatim ``search.php?q=`` analogue
  (base.py:74-112): parse the free text, return up to ``limit`` candidate
  records shaped like parsed Nominatim JSON (place_id, place_rank, lat,
  lon, display_name, category, type, address{...}, namedetails).
- ``search_structured(...)``   — ``get_osm_struct`` analogue (base.py:117-173).
- ``details(place_id)``        — ``details.php`` analogue (base.py:178-207):
  parent_place_id, names, category; errors -> {"category": "error",
  "names": {}} like the reference's error contract.
- ``fuzzy(q)``                 — Photon analogue (base.py:210-238): n-gram
  index over street+city names returning GeoJSON-ish features in a stable
  order (score desc, place_id asc — the ``photon_order`` tie-break).

World model: cities on a jittered grid (Zipf-skewed street counts — hot
postal codes for the skew experiments), streets per city (French / Dutch /
bilingual names), buildings VIRTUAL: each street exposes a deterministic
set of house numbers; building place records (place_rank 30, parent =
street) are derived on demand so the index stays O(streets) per actor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pandas as pd

from .textkernels import jaro_winkler, normalize_street

COUNTRY_NAMES = {"belgium", "belgique", "belgie", "belgië", "be"}

_FR_TYPES = ["Rue", "Avenue", "Chaussée", "Boulevard", "Place"]
_NL_SUFFIXES = ["straat", "laan", "steenweg", "weg"]
_STEMS = [
    "Louise", "Fonsny", "Royale", "Neuve", "Verte", "Haute", "Basse",
    "Clovis", "Berten", "Stephanie", "Fontaine", "Eglise", "Gare",
    "Moulin", "Pont", "Chateau", "Parc", "Midi", "Nord", "Brabant",
    "Flandre", "Wavre", "Namur", "Anvers", "Gand", "Mons", "Arlon",
    "Tournai", "Dinant", "Ixelles", "Uccle", "Forest", "Jette",
    "Laeken", "Molenbeek", "Schaerbeek", "Etterbeek", "Auderghem",
    "Waterloo", "Tervuren", "Leuven", "Mechelen", "Hasselt", "Genk",
    "Brugge", "Kortrijk", "Aalst", "Ninove", "Halle", "Vilvoorde",
]
_CITY_NAMES = [
    "Bruxelles", "Anvers", "Gand", "Charleroi", "Liège", "Bruges",
    "Namur", "Louvain", "Mons", "Malines", "Alost", "Tournai",
    "Genk", "Seraing", "Roulers", "Verviers", "Ostende", "Courtrai",
    "Hasselt", "Saint-Nicolas", "Ixelles", "Uccle", "Schaerbeek",
    "Anderlecht", "Forest", "Jette", "Etterbeek", "Evere", "Hal",
    "Vilvorde", "Wavre", "Arlon", "Dinant", "Bastogne", "Eupen",
    "Tongres", "Ypres", "Furnes", "Dixmude", "Nivelles",
]

LAT0, LAT1 = 49.6, 51.4
LON0, LON1 = 2.6, 6.3


@dataclass(frozen=True)
class GazetteerSpec:
    """Seeded sizing for the synthetic world; hashable = usable as a
    per-process cache key inside actors."""
    n_cities: int = 24
    base_streets: int = 30       # Zipf-scaled per city
    houses_per_street: int = 40  # virtual house numbers 1..N (even subset)
    seed: int = 42

    def scaled(self, factor: float) -> "GazetteerSpec":
        return GazetteerSpec(
            n_cities=max(4, int(self.n_cities * factor ** 0.5)),
            base_streets=max(6, int(self.base_streets * factor ** 0.5)),
            houses_per_street=self.houses_per_street,
            seed=self.seed)


def build_gazetteer_tables(spec: GazetteerSpec) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (places, admin_boundaries) as flat DataFrames.

    places: city rows (place_rank 16) + street rows (place_rank 26).
    admin_boundaries: one hexagonal ring per city (FIXTURES.md §4).
    """
    rng = np.random.default_rng(spec.seed)
    n_city = spec.n_cities
    # jittered grid of city centers
    g = int(np.ceil(np.sqrt(n_city)))
    cells = rng.permutation(g * g)[:n_city]
    cy, cx = cells // g, cells % g
    lat = LAT0 + (cy + 0.5 + rng.uniform(-0.2, 0.2, n_city)) * (LAT1 - LAT0) / g
    lon = LON0 + (cx + 0.5 + rng.uniform(-0.2, 0.2, n_city)) * (LON1 - LON0) / g
    city_radius_deg = 0.35 * (LAT1 - LAT0) / g

    rows = []
    bnd = []
    pid_city = 1000
    pid_street = 100000
    for i in range(n_city):
        name = _CITY_NAMES[i % len(_CITY_NAMES)] + ("" if i < len(_CITY_NAMES) else f" {i // len(_CITY_NAMES) + 1}")
        pc = str(1000 + (i * 137) % 9000)
        city_id = pid_city + i
        city_kind = ["city", "town", "village"][i % 3]
        rows.append(dict(place_id=city_id, parent_place_id=0,
                         category="boundary", type="administrative",
                         name=name, name_fr="", name_nl="",
                         street_name="", house_numbers="",
                         post_code=pc, post_name=name,
                         country_name="Belgium", lat=float(lat[i]),
                         lon=float(lon[i]), place_rank=16,
                         city_kind=city_kind))
        # hexagonal admin ring
        ang = np.linspace(0, 2 * np.pi, 7)
        bnd.append(dict(admin_id=pc, post_code=pc, post_name=name,
                        ring_lat=(lat[i] + city_radius_deg * 1.4 * np.sin(ang)).tolist(),
                        ring_lon=(lon[i] + city_radius_deg * 1.4 * np.cos(ang) / np.cos(np.radians(lat[i]))).tolist()))

        # Zipf-skewed street count: city 0 is "hot" (skew experiments)
        n_str = max(4, int(spec.base_streets * n_city / (i + 1) ** 0.8 / 3))
        theta = rng.uniform(0, 2 * np.pi, n_str)
        rad = rng.uniform(0.05, 1.0, n_str) * city_radius_deg
        for j in range(n_str):
            stem = _STEMS[(i * 7 + j) % len(_STEMS)]
            variant = (i * 31 + j * 13) % 10
            fr = ""
            nl = ""
            if variant < 5:                       # French-only
                t = _FR_TYPES[j % len(_FR_TYPES)]
                fr = f"{t} {stem}" if variant % 2 else f"{t} de {stem}"
                primary, road = fr, fr
            elif variant < 7:                     # Dutch-only
                primary = f"{stem}{_NL_SUFFIXES[j % len(_NL_SUFFIXES)]}"
                nl, road = primary, primary
            elif variant < 9:                     # bilingual, road joined
                fr = f"{_FR_TYPES[j % len(_FR_TYPES)]} {stem}"
                nl = f"{stem}{_NL_SUFFIXES[j % len(_NL_SUFFIXES)]}"
                primary = fr
                road = f"{fr} - {nl}"
            else:                                 # bilingual, road NL-only
                fr = f"{_FR_TYPES[(j + 1) % len(_FR_TYPES)]} {stem}"
                nl = f"{stem}{_NL_SUFFIXES[(j + 1) % len(_NL_SUFFIXES)]}"
                primary = nl
                road = nl                         # parent-rescue exercise
            street_id = pid_street + i * 10000 + j
            # deterministic virtual house numbers: evens up to cap
            hn_max = 2 * max(2, spec.houses_per_street // 2)
            slat = float(lat[i] + rad[j] * np.sin(theta[j]))
            slon = float(lon[i] + rad[j] * np.cos(theta[j]) / np.cos(np.radians(lat[i])))
            rows.append(dict(place_id=street_id, parent_place_id=city_id,
                             category="highway", type="residential",
                             name=primary, name_fr=fr, name_nl=nl,
                             street_name=road, house_numbers=f"2-{hn_max}",
                             post_code=pc, post_name=name,
                             country_name="Belgium", lat=slat, lon=slon,
                             place_rank=26, city_kind=city_kind))
    places = pd.DataFrame(rows)
    boundaries = pd.DataFrame(bnd)
    return places, boundaries


_PC_RE = re.compile(r"^([0-9]{4})\b[ ]*(.*)$")
_HN_RE = re.compile(r"^[0-9]+[a-zA-Z]?([ /._-]*(bt|bus|box|b)?[ ]*[0-9]*[a-zA-Z]?)?$")
_DIGITS_RE = re.compile(r"^([0-9]+)")


def _trigrams(s: str) -> set[str]:
    s = f"  {s} "
    return {s[i:i + 3] for i in range(len(s) - 2)}


@lru_cache(maxsize=1 << 17)
def parse_free_text(q: str) -> dict[str, str]:
    """Heuristic free-text split into address components; the engine sends
    'street, housenbr, postcode city, country' (utils.py:639-646).
    Memoized (pure; span texts are Zipf-skewed) — callers must not
    mutate the returned dict (all engine callers only read)."""
    street = hn = pc = city = country = ""
    for seg in [s.strip() for s in (q or "").split(",") if s.strip()]:
        m = _PC_RE.match(seg)
        if m and not pc:
            pc, city = m.group(1), m.group(2).strip()
            continue
        if seg.lower() in COUNTRY_NAMES:
            country = seg
            continue
        if _HN_RE.match(seg) and not hn:
            hn = seg
            continue
        if not street:
            street = seg
        elif not city:
            city = seg
    # embedded house number inside the street segment:
    # "Avenue Fonsny 20" / "20 Avenue Fonsny" (Nominatim resolves these)
    if street and not hn:
        toks = street.split()
        if len(toks) > 1 and re.fullmatch(r"[0-9]+[a-zA-Z]?", toks[-1]):
            hn = toks[-1]
            street = " ".join(toks[:-1])
        elif len(toks) > 1 and re.fullmatch(r"[0-9]+[a-zA-Z]?", toks[0]):
            hn = toks[0]
            street = " ".join(toks[1:])
    return {"street": street, "housenumber": hn, "postcode": pc,
            "city": city, "country": country}


class Gazetteer:
    """The per-actor geocoder index over the synthetic places table."""

    def __init__(self, spec: GazetteerSpec):
        self.spec = spec
        places, boundaries = build_gazetteer_tables(spec)
        self.places = places
        self.boundaries = boundaries
        self.by_id: dict[int, dict] = {r["place_id"]: r for r in places.to_dict("records")}

        # exact street index: (fingerprint(norm street variant), post_code) and
        # (fp, norm city) -> [street place_id]
        self.exact: dict[tuple[str, str], list[int]] = {}
        self.city_by_pc: dict[str, int] = {}
        self.city_by_name: dict[str, int] = {}
        self.trigram: dict[str, list[int]] = {}
        self.norm_variants: dict[int, tuple[str, ...]] = {}
        self._cand_cache: dict[tuple, list] = {}
        streets = places[places.place_rank == 26]
        for r in streets.to_dict("records"):
            pid = r["place_id"]
            pc = r["post_code"]
            cityn = normalize_street(r["post_name"])
            variants = {r["name"], r["name_fr"], r["name_nl"], r["street_name"]}
            norms = set()
            for v in variants:
                if not v:
                    continue
                for part in re.sub(",", " - ", v).split(" - "):
                    key = normalize_street(part)
                    if not key:
                        continue
                    norms.add(key)
                    self.exact.setdefault((key, pc), []).append(pid)
                    self.exact.setdefault((key, cityn), []).append(pid)
                    for t in _trigrams(key):
                        self.trigram.setdefault(t, []).append(pid)
            self.norm_variants[pid] = tuple(sorted(norms))
        for lst in self.exact.values():
            lst.sort()
        # numpy posting lists: fuzzy voting is concatenate + unique
        # instead of a python dict-count loop
        self.trigram_np: dict[str, np.ndarray] = {
            t: np.array(sorted(lst), dtype=np.int64)
            for t, lst in self.trigram.items()}
        self._result_cache: dict[tuple, dict] = {}
        for r in places[places.place_rank == 16].to_dict("records"):
            self.city_by_pc[r["post_code"]] = r["place_id"]
            self.city_by_name[normalize_street(r["post_name"])] = r["place_id"]

    # -- virtual buildings -------------------------------------------------
    def _street_house_numbers(self, street: dict) -> tuple[int, int]:
        lo, hi = street["house_numbers"].split("-")
        return int(lo), int(hi)

    def _building_id(self, street_id: int, hn: int) -> int:
        return street_id * 1000 + hn

    _CLEAN_HN_RE = re.compile(r"^([0-9]+)[a-zA-Z]?$")

    def building_for(self, street: dict, housenumber: str) -> dict | None:
        # Only *clean* house numbers resolve to a building — "30 bt 2" does
        # not (Nominatim behavior the low-place-rank retry exists for,
        # utils.py:225-299): such queries fall back to the street result.
        m = self._CLEAN_HN_RE.match((housenumber or "").strip())
        if not m:
            return None
        hn = int(m.group(1))
        lo, hi = self._street_house_numbers(street)
        if hn < lo or hn > hi or hn % 2 != 0:   # evens only exist
            return None
        bid = self._building_id(street["place_id"], hn)
        dlat = 0.00005 * (hn - lo)
        return dict(street, place_id=bid,
                    parent_place_id=street["place_id"],
                    category="building", type="yes",
                    lat=street["lat"] + dlat,
                    lon=street["lon"] + dlat,
                    place_rank=30, _house_number=str(hn))

    # -- result shaping ----------------------------------------------------
    def _to_result_cached(self, rec: dict, namedetails: bool,
                          use_cache: bool = True) -> dict:
        """Memoized result shaping keyed by place id (callers must not
        mutate the returned dict — the cascade only reads it)."""
        key = (rec["place_id"], namedetails)
        hit = self._result_cache.get(key) if use_cache else None
        if hit is None:
            hit = self._to_result(rec, namedetails)
            if use_cache and len(self._result_cache) < (1 << 17):
                self._result_cache[key] = hit
        return hit

    def _to_result(self, rec: dict, namedetails: bool) -> dict:
        """Shape a place record like a parsed Nominatim JSON item
        (fields kept by base.py:95-108 + address sub-dict)."""
        city_key = {"city": "city", "town": "town", "village": "village"}[rec["city_kind"]]
        address = {"country": rec["country_name"], "country_code": "be",
                   "region": "Belgium", city_key: rec["post_name"],
                   "postcode": rec["post_code"]}
        if rec["place_rank"] >= 26:
            address["road"] = rec["street_name"]
        if rec["place_rank"] == 30:
            address["house_number"] = rec["_house_number"]
        names = {}
        if rec["name"]:
            names["name"] = rec["name"]
        if rec["name_fr"]:
            names["name:fr"] = rec["name_fr"]
        if rec["name_nl"]:
            names["name:nl"] = rec["name_nl"]
        disp_parts = [rec["street_name"] if rec["place_rank"] >= 26 else "",
                      rec.get("_house_number", ""),
                      f"{rec['post_code']} {rec['post_name']}", "Belgium"]
        out = {
            "place_id": int(rec["place_id"]),
            "lat": float(rec["lat"]),
            "lon": float(rec["lon"]),
            "place_rank": int(rec["place_rank"]),
            "display_name": ", ".join(p for p in disp_parts if p),
            "category": rec["category"],
            "type": rec["type"],
            "importance": 0.5,
            "address": address,
        }
        if namedetails:
            out["namedetails"] = names
        return out

    # -- lookups -----------------------------------------------------------
    def _street_candidates(self, street: str, postcode: str, city: str,
                           limit: int, fuzzy: bool = True,
                           use_cache: bool = True
                           ) -> list[tuple[float, int]]:
        """(score, street place_id) candidates: exact name hits, plus — only
        when ``fuzzy`` (the Photon path; Nominatim-style ``search`` is
        strict about typos) — trigram + Jaro-Winkler candidates.  Results
        are memoized per (street, pc, city) — Zipf-skewed corpora repeat
        queries heavily."""
        ck = (street, postcode, city, limit, fuzzy)
        hit = self._cand_cache.get(ck) if use_cache else None
        if hit is not None:
            return hit
        keys = []
        for part in re.sub(",", " - ", street or "").split(" - "):
            k = normalize_street(part)
            if k:
                keys.append(k)
        pcn = (postcode or "").strip()
        cityn = normalize_street(city or "")
        out: dict[int, float] = {}
        for k in keys:
            for loc in (pcn, cityn):
                if not loc:
                    continue
                for pid in self.exact.get((k, loc), []):
                    out[pid] = max(out.get(pid, 0.0), 1.0)
        if not out and keys and fuzzy:
            # fuzzy: vectorized trigram vote then jaro-winkler refine,
            # city/pc filtered
            posts = []
            for k in keys:
                for t in _trigrams(k):
                    p = self.trigram_np.get(t)
                    if p is not None:
                        posts.append(p)
            if posts:
                arr = np.concatenate(posts)
                pids_u, counts = np.unique(arr, return_counts=True)
                top = np.lexsort((pids_u, -counts))[:80]
                cand = [(int(pids_u[i]), int(counts[i])) for i in top]
            else:
                cand = []
            for pid, _ in cand:
                rec = self.by_id[pid]
                if pcn and rec["post_code"] == pcn:
                    loc_ok = True
                elif cityn and normalize_street(rec["post_name"]) == cityn:
                    loc_ok = True
                else:
                    loc_ok = not pcn and not cityn
                if not loc_ok:
                    continue
                best = 0.0
                for nv in self.norm_variants.get(pid, ()):
                    for k in keys:
                        jw = jaro_winkler(nv, k)
                        if jw > best:
                            best = jw
                if best >= 0.82:
                    out[pid] = max(out.get(pid, 0.0), best)
        ranked = sorted(((s, pid) for pid, s in out.items()),
                        key=lambda t: (-t[0], t[1]))[:limit]
        if use_cache and len(self._cand_cache) < (1 << 16):
            self._cand_cache[ck] = ranked
        return ranked

    def search_structured(self, street: str = "", housenumber: str = "",
                          postcode: str = "", city: str = "", country: str = "",
                          limit: int = 50, namedetails: bool = False,
                          use_cache: bool = True) -> list[dict]:
        """Candidate list, deterministic order (score desc, place_id asc) —
        the engine's ``get_osm_struct`` (base.py:117-173)."""
        street = (street or "").strip()
        results: list[dict] = []
        if street:
            cands = self._street_candidates(street, postcode, city, limit,
                                            fuzzy=False, use_cache=use_cache)
            for score, pid in cands:
                rec = self.by_id[pid]
                b = self.building_for(rec, housenumber) if housenumber else None
                if b is not None:
                    results.append(self._to_result_cached(
                        b, namedetails, use_cache=use_cache))
                else:
                    results.append(self._to_result_cached(
                        rec, namedetails, use_cache=use_cache))
                if len(results) >= limit:
                    break
        else:
            # street-less: city/postcode-level match
            pid = None
            pcn = (postcode or "").strip()
            if pcn and pcn in self.city_by_pc:
                pid = self.city_by_pc[pcn]
            else:
                cityn = normalize_street(city or "")
                if cityn and cityn in self.city_by_name:
                    pid = self.city_by_name[cityn]
            if pid is not None:
                results.append(self._to_result_cached(
                    self.by_id[pid], namedetails, use_cache=use_cache))
        return results

    def parse_free_text(self, q: str, use_cache: bool = True) -> dict[str, str]:
        if not use_cache:
            return parse_free_text.__wrapped__(q)
        return parse_free_text(q)

    def search(self, q: str, limit: int = 50, namedetails: bool = False,
               use_cache: bool = True) -> list[dict]:
        parts = self.parse_free_text(q, use_cache=use_cache)
        return self.search_structured(parts["street"], parts["housenumber"],
                                      parts["postcode"], parts["city"],
                                      parts["country"], limit=limit,
                                      namedetails=namedetails,
                                      use_cache=use_cache)

    def details(self, place_id: int) -> dict:
        """Parent/name details; unknown id -> error record
        (base.py:178-207 error contract)."""
        place_id = int(place_id)
        rec = self.by_id.get(place_id)
        if rec is None and place_id > 1000000:
            street = self.by_id.get(place_id // 1000)
            if street is not None:
                hn = place_id % 1000
                b = self.building_for(street, str(hn))
                if b is not None and b["place_id"] == place_id:
                    rec = b
        if rec is None:
            return {"category": "error", "names": {}}
        names = {}
        if rec["name"]:
            names["name"] = rec["name"]
        if rec["name_fr"]:
            names["name:fr"] = rec["name_fr"]
        if rec["name_nl"]:
            names["name:nl"] = rec["name_nl"]
        return {"place_id": int(rec["place_id"]),
                "parent_place_id": int(rec["parent_place_id"]),
                "category": rec["category"], "names": names}

    def fuzzy(self, q: str, limit: int = 20,
              use_cache: bool = True) -> dict:
        """Photon analogue: GeoJSON-ish FeatureCollection with properties
        street/postcode/city/country/name, stable candidate order."""
        parts = self.parse_free_text(q, use_cache=use_cache)
        street = parts["street"] or q
        cands = self._street_candidates(street, parts["postcode"],
                                        parts["city"], limit,
                                        use_cache=use_cache)
        if not cands:
            # retry without location filter
            cands = self._street_candidates(street, "", "", limit,
                                            use_cache=use_cache)
        features = []
        for score, pid in cands:
            rec = self.by_id[pid]
            features.append({
                "type": "Feature",
                "properties": {
                    "name": rec["name"],
                    "street": rec["street_name"],
                    "postcode": rec["post_code"],
                    "city": rec["post_name"],
                    "country": rec["country_name"],
                    "osm_id": int(rec["place_id"]),
                    "type": "street",
                },
                "geometry": {"type": "Point",
                             "coordinates": [rec["lon"], rec["lat"]]},
            })
        return {"type": "FeatureCollection", "features": features}


@lru_cache(maxsize=4)
def get_gazetteer(spec: GazetteerSpec) -> Gazetteer:
    """Per-process cache: actors in the same worker process share the index.

    The built index is ``gc.freeze()``-d immediately: it is immortal
    process state (millions of small dict/tuple objects), and any LATER
    allocation-heavy stage scheduled onto this worker would otherwise
    rescan it on every gen-2 collection.  Freezing here — not only in
    the cascade's GC mode switch — covers workers that build the index
    outside a cascade batch (warm-pool tasks, ad-hoc lookups): measured
    at 32 CPUs, a minhash stage running on warm-pool workers with an
    unfrozen index was 2-3x slower (11-15 s vs ~5 s)."""
    import gc
    g = Gazetteer(spec)
    gc.collect()
    gc.freeze()
    return g
