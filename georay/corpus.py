"""Deterministic synthetic input corpus: perturbed address batches and the
interleaved text+media documents table (BASELINE.json input_hint).

The reference's notebook corpora (three Belgian CSVs, not shipped —
AddressCleanserREST_test.ipynb cell 18) are reproduced in *shape*
(FIXTURES.md §2): every cascade step has perturbation classes that
exercise it.  The documents table has columns
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``;
address-bearing text spans are interleaved with prose and media spans.
Everything derives from (GazetteerSpec, seed, size) — no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import ADDR_KEY, CITY, COUNTRY, HOUSENBR, POSTCODE, STREET
from .gazetteer import GazetteerSpec, build_gazetteer_tables
from .textkernels import remove_accents

# perturbation classes (FIXTURES.md §2) — weights sum to 1
_CLASSES = [
    ("clean", 0.42),          # matches at orig
    ("paren", 0.06),          # "FONSNY (AVE. DE)" -> regex[init]
    ("abbrev", 0.08),         # "av. Fonsny" -> regex[lpost] chain
    ("concat", 0.08),         # street+number in street field -> libpostal
    ("misspell", 0.10),       # -> photon fuzzy
    ("boxnum", 0.08),         # "12 bt 3" -> low-rank retry / nonum
    ("nostreet", 0.06),       # street empty -> nostreet city match
    ("accents", 0.06),        # case/accent mangling (still exact after fold)
    ("wrongcity", 0.03),      # right pc, wrong city
    ("garbage", 0.03),        # unmatchable -> kNN stage
]

_PROSE = [
    "The weather in %s was mild that day.",
    "Invoice #%d follows for your records.",
    "Meeting notes, item %d: budget approved.",
    "Delivery scheduled for week %d.",
    "Customer satisfaction survey result: %d/10.",
]


def _perturb(rng: np.random.Generator, cls: str, street: str, hn: str,
             pc: str, city: str) -> tuple[str, str, str, str, str]:
    country = "Belgium"
    if cls == "clean":
        pass
    elif cls == "paren":
        # "Avenue Fonsny" -> "FONSNY (AVE. DE)" style (config.py:73-74 rule)
        parts = street.split(" ", 1)
        if len(parts) == 2 and parts[0].lower() in (
                "rue", "avenue", "chaussée", "boulevard", "place"):
            abbr = {"rue": "RUE", "avenue": "AVE.", "chaussée": "CHA.",
                    "boulevard": "BLVD", "place": "PLA."}[parts[0].lower()]
            street = f"{parts[1].upper()} ({abbr} )"
        else:
            street = street + " (ZN)"
    elif cls == "abbrev":
        low = street.lower()
        for full, ab in [("rue ", "r. "), ("avenue ", "av. "),
                         ("chaussée ", "chée "), ("boulevard ", "bd ")]:
            if low.startswith(full):
                street = ab + street[len(full):]
                break
        else:
            street = low.replace("'", "' ")
    elif cls == "concat":
        street = f"{street} {hn}"
        hn = ""
    elif cls == "misspell":
        s = list(street)
        pos = int(rng.integers(1, max(2, len(s) - 1)))
        if s[pos].isalpha():
            s[pos] = chr(((ord(s[pos].lower()) - 97 + 1) % 26) + 97)
        street = "".join(s)
        pos2 = int(rng.integers(1, max(2, len(street))))
        street = street[:pos2] + street[pos2 + 1:]  # drop one char
    elif cls == "boxnum":
        hn = f"{hn} bt {int(rng.integers(1, 9))}"
    elif cls == "nostreet":
        street = ""
        hn = ""
    elif cls == "accents":
        street = (remove_accents(street) or "").upper()
        city = city.lower()
    elif cls == "wrongcity":
        city = "Nowhereville"
    elif cls == "garbage":
        street = "Qwxyz Zzyzx " + str(int(rng.integers(100, 999)))
        # 4-digit but leading-zero pc: looks like an address to the span
        # detector, resolves to nothing (no city has a 0xxx postcode)
        pc = f"0{int(rng.integers(100, 999))}"
        city = "Atlantis"
        hn = str(int(rng.integers(1, 99)))
    return street, hn, pc, city, country


def make_addresses(n: int, spec: GazetteerSpec | None = None,
                   seed: int = 7) -> pd.DataFrame:
    """Flat address batch drawn from the gazetteer with perturbations;
    one row per unique ``addr_key`` (dup-key contract,
    nominatimwrapper.py:789-790)."""
    spec = spec or GazetteerSpec()
    places, _ = build_gazetteer_tables(spec)
    streets = places[places.place_rank == 26].reset_index(drop=True)
    rng = np.random.default_rng(seed)
    classes = [c for c, _ in _CLASSES]
    probs = np.array([w for _, w in _CLASSES])
    cls_pick = rng.choice(len(classes), size=n, p=probs / probs.sum())
    # skew: hot city 0 gets disproportionate traffic (Zipf over streets)
    street_idx = (rng.zipf(1.3, size=n * 2) - 1)
    street_idx = street_idx[street_idx < len(streets)][:n]
    while len(street_idx) < n:
        street_idx = np.concatenate(
            [street_idx, rng.integers(0, len(streets), n - len(street_idx))])
    rows = []
    for i in range(n):
        st = streets.iloc[int(street_idx[i])]
        lo, hi = st["house_numbers"].split("-")
        hn = str(int(rng.integers(int(lo), int(hi) + 1)))
        cls = classes[int(cls_pick[i])]
        # use a language variant as the input street sometimes
        name = st["name"]
        if st["name_fr"] and rng.random() < 0.5:
            name = st["name_fr"]
        street, hnbr, pc, city, country = _perturb(
            rng, cls, name, hn, st["post_code"], st["post_name"])
        rows.append({ADDR_KEY: f"a{i:08d}", STREET: street, HOUSENBR: hnbr,
                     POSTCODE: pc, CITY: city, COUNTRY: country,
                     "truth_class": cls,
                     "truth_street_place_id": int(st["place_id"])})
    return pd.DataFrame(rows)


# one parquet shard per SHARD_DOCS documents; bench.py's content-
# addressed sample cutoff derives from the same constant so the doc_id
# range and the corpus layout cannot drift apart
SHARD_DOCS = 1000


def write_bench_corpus(out_dir: str, n_docs: int,
                       spec: GazetteerSpec | None = None,
                       shard_docs: int = SHARD_DOCS, seed: int = 7) -> str:
    """Distributed, deterministic corpus synthesis: each Ray task builds
    one shard with ``make_documents(seed + shard)`` and a shard-prefixed
    doc_id, written as one parquet partition.  Idempotent (marker file);
    generation parallelizes across the cluster instead of the driver."""
    import os

    import ray.data

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    n_shards = max(1, (n_docs + shard_docs - 1) // shard_docs)
    spec = spec or GazetteerSpec()

    def gen(batch) -> pa.Table:
        tables = []
        for shard in batch["id"].to_pylist():
            docs, _ = make_documents(min(shard_docs, n_docs - shard * shard_docs),
                                     spec=spec, seed=seed + shard)
            prefix = f"s{shard:05d}_"
            doc_ids = pa.array([prefix + d for d in
                                docs["doc_id"].to_pylist()], pa.string())
            tables.append(pa.table({"doc_id": doc_ids,
                                    "spans": docs["spans"]}))
        return pa.concat_tables(tables)

    (ray.data.range(n_shards, override_num_blocks=n_shards)
        .map_batches(gen, batch_size=1, batch_format="pyarrow")
        .write_parquet(out_dir))
    open(marker, "w").close()
    return out_dir


def make_documents(n_docs: int, spec: GazetteerSpec | None = None,
                   seed: int = 7, addrs_per_doc: int = 2
                   ) -> tuple[pa.Table, pd.DataFrame]:
    """Interleaved documents table + the flat address table its spans embed.

    Returns ``(documents, addresses)`` where documents has columns
    ``doc_id: string`` and ``spans: list<struct<kind: string, text: string,
    media_ref: string, offset: int32>>`` (BASELINE.json input_hint), and
    each address span's text is the full address string whose components
    live in the addresses frame keyed ``addr_key = {doc_id}_s{span_idx}``.
    """
    rng = np.random.default_rng(seed + 1)
    n_addr_total = n_docs * addrs_per_doc
    addrs = make_addresses(n_addr_total, spec=spec, seed=seed)
    doc_ids = []
    spans_col = []
    addr_keys = []
    k = 0
    for d in range(n_docs):
        doc_id = f"doc{d:08d}"
        spans = []
        offset = 0
        n_spans = int(rng.integers(3, 8))
        addr_slots = set(rng.choice(n_spans, size=min(addrs_per_doc, n_spans),
                                    replace=False).tolist())
        for si in range(n_spans):
            r = rng.random()
            if si in addr_slots and k < len(addrs):
                a = addrs.iloc[k]
                text = ", ".join(x for x in [
                    a[STREET], a[HOUSENBR],
                    f"{a[POSTCODE]} {a[CITY]}".strip(), a[COUNTRY]] if x)
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": offset})
                addr_keys.append((f"{doc_id}_s{si}", a[ADDR_KEY]))
                k += 1
            elif r < 0.25:
                kind = "image" if r < 0.15 else "audio"
                spans.append({"kind": kind, "text": "",
                              "media_ref": f"media://{kind}/{d}/{si}",
                              "offset": offset})
            else:
                t = _PROSE[si % len(_PROSE)]
                text = t % ("Belgium" if "%s" in t else int(rng.integers(1, 99)))
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": offset})
            offset += max(1, len(spans[-1]["text"]))
        doc_ids.append(doc_id)
        spans_col.append(spans)
    span_type = pa.struct([("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "spans": pa.array(spans_col, pa.list_(span_type))})
    # remap addr keys to span keys
    key_map = dict((old, new) for new, old in addr_keys)
    addrs = addrs.iloc[:k].copy()
    addrs[ADDR_KEY] = [key_map.get(a, a) for a in addrs[ADDR_KEY]]
    return docs, addrs
