"""Job driver for the flagship pipeline — the shape you'd hand to
``ray job submit`` on a real cluster (north rule: resumable runs with
per-partition lineage).

    python scripts/run_pipeline.py --input /tmp/georay_bench/sf0.1_60000 \
        --output /tmp/georay_run1 [--shards-per-partition 8]

The input directory's parquet fragments are grouped into partitions;
each partition runs as its own streaming pipeline and writes one output
directory + a lineage record (rows, status counters, seconds).  Re-run
the same command after a crash and completed partitions are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards-per-partition", type=int, default=8)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--spec-factor", type=float, default=1.5)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from georay.checkpoint import pipeline_counters, run_resumable
    from georay.config import PipelineConfig
    from georay.gazetteer import GazetteerSpec
    from georay.pipeline import geocode_documents

    spec = GazetteerSpec().scaled(args.spec_factor)
    cfg = PipelineConfig()

    files = sorted(f for f in os.listdir(args.input)
                   if f.endswith(".parquet"))
    groups = [files[i:i + args.shards_per_partition]
              for i in range(0, len(files), args.shards_per_partition)]

    def build(group):
        def _b():
            paths = [os.path.join(args.input, f) for f in group]
            docs = ray.data.read_parquet(paths)
            return geocode_documents(docs, spec=spec, cfg=cfg)
        return _b

    shards = [(f"p{gi:05d}", build(g)) for gi, g in enumerate(groups)]
    manifest = run_resumable(shards, args.output,
                             counters_fn=pipeline_counters)
    total = {"partitions": len(manifest.records()),
             "rows": sum(r["rows"] for r in manifest.records()),
             "seconds": round(sum(r["seconds"] for r in manifest.records()), 2)}
    print(json.dumps(total))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
