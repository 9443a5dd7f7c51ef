"""Stage-level A/B of the duplicate_spans md5 path (VERDICT r4 item 7):
the vectorized buffer-sliced md5 (ops/md5vec.md5_digests_ranges) vs a
per-gram hashlib loop over the same buffer slices — bit-identical
outputs, interleaved reps, steal fractions disclosed.

    python scripts/bench_dup_spans.py [n_docs] [reps]

Prints one JSON line with per-impl wall times and the oracle-pinned
result count (must match across impls).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _quiet_ray_data_logging, _steal_ticks, _wait_quiet


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    _quiet_ray_data_logging()
    import logging

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data

    from georay.corpus import write_bench_corpus
    from georay.entrylib import spec_for
    from georay.ops.dedup import duplicate_spans
    from georay.spans import explode_spans

    sf_dir = "/root/testdata/sf0.1"
    corpus_dir = f"/tmp/georay_bench/dupspan_{n_docs}"
    write_bench_corpus(corpus_dir, n_docs, spec=spec_for(sf_dir))

    # doc ids must be int64 for min_id aggregation: hash addr_key
    def span_ds_int():
        import numpy as np

        def addr_spans(b: pa.Table) -> pa.Table:
            b = b.filter(b["is_address"]).select(["addr_key", "text"])
            import pandas as pd
            ids = pd.util.hash_array(
                b["addr_key"].to_numpy(zero_copy_only=False)).astype(
                "int64")
            return pa.table({"doc_id": pa.array(np.abs(ids), pa.int64()),
                             "text": b["text"]})

        return (ray.data.read_parquet(corpus_dir,
                                      override_num_blocks=96)
                .map_batches(explode_spans, batch_format="pyarrow")
                .map_batches(addr_spans, batch_format="pyarrow"))

    out: dict = {"n_docs": n_docs, "reps": reps, "impls": {}}
    results: dict[str, int] = {}
    host = os.cpu_count() or 32
    for rep in range(reps):
        for impl in ("vec", "hashlib"):   # interleaved
            _wait_quiet()
            s0, t0 = _steal_ticks(), time.time()
            n = duplicate_spans(span_ds_int(), n=4, sample_hex=16,
                                digest_impl=impl).count()
            dt = round(time.time() - t0, 3)
            steal = round((_steal_ticks() - s0) / (100.0 * host
                                                   * max(dt, 1e-3)), 4)
            out["impls"].setdefault(impl, []).append(
                {"sec": dt, "steal": steal})
            results.setdefault(impl, n)
            assert results[impl] == n, "nondeterministic result"
    assert len(set(results.values())) == 1, \
        f"impls disagree: {results}"
    out["dup_grams"] = results["vec"]
    out["best"] = {k: min(r["sec"] for r in v)
                   for k, v in out["impls"].items()}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
