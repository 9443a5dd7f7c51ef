"""End-to-end Ray Data pipeline builders (SURVEY.md §7.1 ``pipeline.py``).

Flagship flow (the reference's ``/batchGeocode`` re-expressed Ray-Data-
first, §3.1):

    read_parquet(documents)                        # prune at the read
      -> map_batches(explode_spans)                # Arrow explode, stateless
      -> map_batches(SpanCascadeGeocoder, ...)     # actor pool, whole cascade
      -> map_batches(TileAnnotator, ...)           # actor pool, cells + PIP
      -> [map_batches(KnnRescuer)]                 # actor pool, unresolved
      -> write_parquet / groupby rollups / reassemble

Everything is lazy/streaming; no stage materializes the full dataset.
All builders take an existing Dataset or a path — they never call
``ray.init()``.
"""

from __future__ import annotations

from typing import Any

import ray.data

from .cascade import CascadeGeocoder, SpanCascadeGeocoder
from .config import PipelineConfig
from .corpus import make_documents
from .gazetteer import GazetteerSpec
from .knn import KnnRescuer
from .spans import explode_spans, reassemble_partition
from .tiles import TileAnnotator


class SpanAnnotator:
    """Fused light-annotation stage: tile assignment + PIP validation +
    kNN rescue in one actor pool — one Arrow pass instead of two pools'
    worth of scheduling and conversions."""

    def __init__(self, spec=None, hex_res: int = 9, quad_level: int = 18,
                 with_tiles: bool = True, with_knn: bool = True):
        self.tiles = TileAnnotator(spec=spec, hex_res=hex_res,
                                   quad_level=quad_level) if with_tiles else None
        self.knn = KnnRescuer(spec=spec) if with_knn else None

    def __call__(self, batch):
        if self.tiles is not None:
            batch = self.tiles(batch)
        if self.knn is not None:
            batch = self.knn(batch)
        return batch


def synth_documents_dataset(n_docs: int, spec: GazetteerSpec | None = None,
                            seed: int = 7,
                            parallelism: int = 16) -> "ray.data.Dataset":
    """Deterministic interleaved-documents Dataset (the input_hint table),
    built driver-side once and converted; for larger sizes prefer
    ``write_synth_documents`` + ``read_parquet``."""
    docs, _ = make_documents(n_docs, spec=spec, seed=seed)
    return ray.data.from_arrow(docs).repartition(parallelism)


def annotator_fn(spec=None, hex_res: int = 9, quad_level: int = 18,
                 with_tiles: bool = True, with_knn: bool = True):
    """Picklable stateless-task batch fn for the fused annotator, with
    per-worker-process component caching (see cascade.py rationale)."""
    from .cascade import _PROCESS_COMPONENT_CACHE
    key = ("annotator", spec, hex_res, quad_level, with_tiles, with_knn)

    def fn(batch):
        worker = _PROCESS_COMPONENT_CACHE.get(key)
        if worker is None:
            worker = SpanAnnotator(spec=spec, hex_res=hex_res,
                                   quad_level=quad_level,
                                   with_tiles=with_tiles, with_knn=with_knn)
            _PROCESS_COMPONENT_CACHE[key] = worker
            from .cascade import _tune_worker_gc
            _tune_worker_gc()
        return worker(batch)

    return fn


def geocode_documents(docs: "ray.data.Dataset",
                      spec: GazetteerSpec | None = None,
                      cfg: PipelineConfig | None = None,
                      concurrency: int | tuple | None = None,
                      batch_size: int = 1024,
                      with_knn_rescue: bool = True,
                      with_tiles: bool = True,
                      use_actors: bool = False) -> "ray.data.Dataset":
    """documents -> span-level geocode results (one row per span ×
    match/reject, not_address spans passed through).

    ``batch_size`` counts DOCUMENT rows: the cascade has a few hundred
    ms of fixed per-batch cost (10 steps of frame machinery), so batches
    must hold >=~1500 addresses to amortize it — 1024 docs ≈ 7000 spans
    ≈ 2000 addresses.

    Default execution: stateless tasks with per-worker component caching
    (elastic scheduling, no pool sizing, reused worker processes —
    measured faster and better-scaling than a fixed actor pool for this
    index size).  ``use_actors=True`` switches to the actor-pool plan
    (``concurrency`` then sizes the pool) for heavy-state deployments.
    """
    from .cascade import span_cascade_fn
    spec = spec or GazetteerSpec()
    cfg = cfg or PipelineConfig()
    if use_actors:
        spans = docs.map_batches(explode_spans, batch_format="pyarrow")
        geocoded = spans.map_batches(
            SpanCascadeGeocoder, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency or 8,
            fn_constructor_kwargs={"spec": spec, "cfg": cfg})
        base = concurrency if isinstance(concurrency, int) else 8
        light = max(2, base // 3)
        if with_tiles or with_knn_rescue:
            geocoded = geocoded.map_batches(
                SpanAnnotator, batch_format="pyarrow", batch_size=4096,
                concurrency=light, num_cpus=0.5,
                fn_constructor_kwargs={"spec": spec, "hex_res": cfg.hex_res,
                                       "quad_level": cfg.quad_level,
                                       "with_tiles": with_tiles,
                                       "with_knn": with_knn_rescue})
        return geocoded
    # ONE map op: even "fused" Ray Data operators pay per-op rebatching
    # (slice/concat of the 33-column Arrow batch at every boundary) —
    # measured at ~60% of total CPU for this chain.  Collapsing
    # explode -> cascade -> annotate into a single batch fn doubles
    # throughput; per-document batch_size keeps the cascade's per-batch
    # fixed cost amortized (1024 docs ≈ 7000 spans ≈ 2000 addresses).
    casc = span_cascade_fn(spec, cfg)
    ann = (annotator_fn(spec, cfg.hex_res, cfg.quad_level,
                        with_tiles, with_knn_rescue)
           if (with_tiles or with_knn_rescue) else None)

    def whole(batch):
        out = casc(explode_spans(batch))
        return ann(out) if ann is not None else out

    return docs.map_batches(whole, batch_format="pyarrow",
                            batch_size=batch_size)


def geocode_addresses(addrs: "ray.data.Dataset",
                      spec: GazetteerSpec | None = None,
                      cfg: PipelineConfig | None = None,
                      concurrency: int | tuple | None = None,
                      batch_size: int = 1024,
                      with_tiles: bool = True) -> "ray.data.Dataset":
    """Flat address batch -> cascade results (the /batchGeocode parity
    path, nominatimwrapper.py:709-855).  Stateless-task plan with
    per-worker component caching; ``concurrency`` is accepted for API
    compatibility but the scheduler is elastic."""
    from .cascade import address_cascade_fn
    spec = spec or GazetteerSpec()
    cfg = cfg or PipelineConfig()
    casc = address_cascade_fn(spec, cfg)
    ann = (annotator_fn(spec, cfg.hex_res, cfg.quad_level, True, False)
           if with_tiles else None)

    def whole(batch):
        out = casc(batch)
        return ann(out) if ann is not None else out

    return addrs.map_batches(whole, batch_format="pyarrow",
                             batch_size=batch_size)


def step_stats(ds: "ray.data.Dataset",
               spec: GazetteerSpec | None = None,
               cfg: PipelineConfig | None = None,
               spans: bool = False,
               batch_size: int = 1024) -> "ray.data.Dataset":
    """Per-step cascade statistics over a documents (``spans=True``) or
    flat-address Dataset: one output row per cascade step with summed
    todo/sent/match/reject counters and wall seconds — the reference's
    ``timestats`` analogue (base.py:275-301), computed distributed
    (per-batch partials, one tiny groupby over #steps rows per block)."""
    from ray.data.aggregate import Sum

    from .cascade import step_stats_fn
    partials = ds.map_batches(step_stats_fn(spec, cfg, spans=spans),
                              batch_format="pyarrow", batch_size=batch_size)
    return (partials.groupby(["step", "method"])
            .aggregate(Sum("todo", alias_name="todo"),
                       Sum("sent", alias_name="sent"),
                       Sum("match", alias_name="match"),
                       Sum("match_26", alias_name="match_26"),
                       Sum("reject_rec", alias_name="reject_rec"),
                       Sum("reject_addr", alias_name="reject_addr"),
                       Sum("reject_mism", alias_name="reject_mism"),
                       Sum("seconds", alias_name="seconds")))


def reassemble_documents(span_results: "ray.data.Dataset"
                         ) -> "ray.data.Dataset":
    """Regroup span-level results into documents, preserving span order —
    the one required shuffle (groupby doc_id), SURVEY.md §7.3."""
    import pyarrow.compute as pc

    from .shuffle import grouped_map

    def keep_fn(batch):
        return batch.filter(pc.is_in(
            batch["status"],
            value_set=__import__("pyarrow").array(
                ["match", "unmatched", "not_address"])))
    keep = span_results.map_batches(keep_fn, batch_format="pyarrow")
    return grouped_map(keep, "doc_id", reassemble_partition,
                       group_fn=False)


_NAMESPACES = {
    # flat-internal -> struct-at-the-sink mapping (SURVEY.md §1.4)
    "input": ["addr_key", "street_name", "house_number", "post_code",
              "post_name", "country_name"],
    "metadata": ["m_method", "m_transformed_address", "m_osm_order",
                 "m_place_rank", "m_place_id", "m_reject_reason",
                 "m_distance_to_match",
                 "m_match_on_cleansed_house_number", "candidate_json"],
    "output": ["o_street_name", "o_house_number", "o_post_code",
               "o_post_name", "o_country_name", "o_other",
               "o_display_name", "o_lat", "o_lon", "o_in_house_number",
               "o_lpost_house_number", "o_lpost_unit"],
    "check": ["c_sim_street", "c_sim_street_which", "c_sim_house_number",
              "c_sim_post_code", "c_sim_city"],
    "spatial": ["hex_cell", "quad_cell", "square_cell", "pip_ok"],
}


def pack_nested(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Pack flat result columns into one struct column per namespace —
    the output-sink shape (flat internally, structs at the sink,
    SURVEY.md §1.4).  Leaf names drop the namespace prefix."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        consumed = set()
        for ns, flat_cols in _NAMESPACES.items():
            present = [c for c in flat_cols if c in batch.column_names]
            if not present:
                continue
            leaf = [c.split("_", 1)[1] if c.startswith(("m_", "o_", "c_"))
                    else c for c in present]
            arrays = [batch[c].combine_chunks() if isinstance(
                batch[c], pa.ChunkedArray) else batch[c] for c in present]
            cols[ns] = pa.StructArray.from_arrays(arrays, names=leaf)
            consumed.update(present)
        rest = [c for c in batch.column_names if c not in consumed]
        out = {c: batch[c] for c in rest}
        out.update(cols)
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def validate_addresses(payload: list[dict[str, Any]],
                       mandatory=("addr_key",)) -> None:
    """Driver-side pre-flight mirroring the REST layer's checks:
    mandatory fields (nominatimwrapper.py:784-787) and duplicate-key
    rejection (:789-790)."""
    keys = [p.get("addr_key") for p in payload]
    for f in mandatory:
        missing = [i for i, p in enumerate(payload) if not p.get(f)]
        if missing:
            raise ValueError(f"mandatory field {f!r} missing in rows {missing[:5]}")
    if len(set(keys)) != len(keys):
        raise ValueError("duplicate addr_key values in payload")


MODE_COLUMNS = {
    # output projections per REST mode (nominatimwrapper.py:632-648, 820-837)
    "coordinates": ["addr_key", "o_lat", "o_lon", "status"],
    "short": ["addr_key", "status", "m_method", "m_place_rank", "m_place_id",
              "o_lat", "o_lon", "o_street_name", "o_house_number",
              "o_post_code", "o_post_name", "o_country_name"],
    "long": None,  # all columns
}


def project_mode(ds: "ray.data.Dataset", mode: str) -> "ray.data.Dataset":
    cols = MODE_COLUMNS.get(mode)
    if cols is None:
        return ds
    have = [c for c in cols if c in ds.schema().names]
    return ds.select_columns(have)
