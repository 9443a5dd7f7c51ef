"""Interleaved-document span handling: extract address-bearing spans and
re-assemble geocoded documents preserving span-sequence equality.

Input table shape (BASELINE.json input_hint):
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.

- ``explode_spans`` — zero-copy-ish Arrow explode (``list_flatten`` +
  ``list_parent_indices``) emitting one row per span with its ordinal;
  address detection + component parse only on text spans that look like
  addresses (cheap 4-digit-postcode regex pre-filter).
- ``reassemble_batch`` — ``groupby(doc_id).map_groups`` group fn that
  rebuilds the span list ordered by span ordinal with geocode results
  attached alongside; the per-row invariant (kind, text, media_ref,
  order) is preserved bit-for-bit.

The explode/re-attach pattern follows SURVEY.md §2.4: candidates never
leave the batch, the only shuffle is the final ``groupby(doc_id)``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .config import (ADDR_KEY, CITY, COUNTRY, HOUSENBR, POSTCODE, STATUS,
                     STREET)
from .gazetteer import parse_free_text

_ADDR_HINT = re.compile(r"\b[0-9]{4}\b")

SPAN_TYPE = pa.struct([("kind", pa.string()), ("text", pa.string()),
                       ("media_ref", pa.string()), ("offset", pa.int32())])

GEO_TYPE = pa.struct([("status", pa.string()), ("lat", pa.float64()),
                      ("lon", pa.float64()), ("place_id", pa.int64()),
                      ("method", pa.string()), ("hex_cell", pa.int64())])


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents batch -> one row per span, with parsed address fields for
    address-bearing text spans (is_address=True)."""
    flat = pc.list_flatten(batch["spans"])
    parent = pc.list_parent_indices(batch["spans"])
    doc_ids = pc.take(batch["doc_id"], parent)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    kind = flat.field("kind")
    text = flat.field("text")
    media = flat.field("media_ref")
    offset = flat.field("offset")

    # span ordinal within document (parent indices are sorted)
    par = parent.to_numpy(zero_copy_only=False)
    if len(par):
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        span_idx = np.arange(len(par)) - np.repeat(starts, np.diff(np.r_[starts, len(par)]))
    else:
        span_idx = np.array([], dtype=np.int64)

    kinds = kind.to_pylist()
    texts = text.to_pylist()
    n = len(texts)
    is_addr = np.zeros(n, dtype=bool)
    street = [""] * n
    hn = [""] * n
    pcx = [""] * n
    city = [""] * n
    country = [""] * n
    for i in range(n):
        t = texts[i]
        if kinds[i] == "text" and t and _ADDR_HINT.search(t) and "," in t:
            parts = parse_free_text(t)
            is_addr[i] = True
            street[i] = parts["street"]
            hn[i] = parts["housenumber"]
            pcx[i] = parts["postcode"]
            city[i] = parts["city"]
            country[i] = parts["country"]

    doc_np = doc_ids.to_numpy(zero_copy_only=False)
    keys = np.char.add(np.char.add(doc_np.astype(str), "_s"),
                       span_idx.astype(str))
    return pa.table({
        "doc_id": doc_ids,
        "span_idx": pa.array(span_idx, pa.int32()),
        "kind": kind, "text": text, "media_ref": media, "offset": offset,
        "is_address": pa.array(is_addr),
        ADDR_KEY: pa.array(keys.tolist(), pa.string()),
        STREET: pa.array(street, pa.string()),
        HOUSENBR: pa.array(hn, pa.string()),
        POSTCODE: pa.array(pcx, pa.string()),
        CITY: pa.array(city, pa.string()),
        COUNTRY: pa.array(country, pa.string()),
    })


def reassemble_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Partition fn for ``grouped_map(ds, "doc_id", ..., group_fn=False)``:
    rebuild each document's ordered span list + a parallel geocode
    annotation list (north-rule invariant: output spans == input spans on
    kind/text/media_ref/order)."""
    has_hex = "hex_cell" in df.columns
    doc_ids, span_lists, geo_lists = [], [], []
    for doc_id, g in df.groupby("doc_id", sort=False):
        g = g.sort_values("span_idx", kind="mergesort")
        spans = [{"kind": k, "text": t, "media_ref": m, "offset": int(o)}
                 for k, t, m, o in zip(g["kind"], g["text"], g["media_ref"],
                                       g["offset"])]
        geo = []
        for is_addr, status, lat, lon, pid, method, hexc in zip(
                g["is_address"], g[STATUS], g["o_lat"], g["o_lon"],
                g["m_place_id"], g["m_method"],
                g["hex_cell"] if has_hex else [-1] * len(g)):
            if bool(is_addr):
                geo.append({"status": status or "",
                            "lat": float(lat) if pd.notna(lat) else float("nan"),
                            "lon": float(lon) if pd.notna(lon) else float("nan"),
                            "place_id": int(pid) if pd.notna(pid) else -1,
                            "method": method or "",
                            "hex_cell": int(hexc) if pd.notna(hexc) else -1})
            else:
                geo.append({"status": "not_address", "lat": float("nan"),
                            "lon": float("nan"), "place_id": -1,
                            "method": "", "hex_cell": -1})
        doc_ids.append(doc_id)
        span_lists.append(spans)
        geo_lists.append(geo)
    return pd.DataFrame({"doc_id": doc_ids, "spans": span_lists,
                         "geocodes": geo_lists})
