"""End-to-end smoke of the job driver script (VERDICT r2 #9): partial
run at one parallelism level, resume at another, manifest-driven skip,
step-stats lineage — the "this is how you run it on a cluster" artifact.

Runs ``scripts/run_pipeline.py`` in subprocesses (each owns its own Ray
session, as the script would on a real cluster)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_pipeline.py")


def _run(args, cpus):
    proc = subprocess.run(
        [sys.executable, SCRIPT, *args, "--num-cpus", str(cpus)],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_run_pipeline_two_parallelism_resume(ray_session, tmp_path):
    from georay.corpus import write_bench_corpus
    corpus = str(tmp_path / "corpus")
    write_bench_corpus(corpus, 400, shard_docs=100)

    out = str(tmp_path / "run")
    base = ["--input", corpus, "--output", out,
            "--shards-per-partition", "2", "--step-stats"]

    # leg 1: 2 CPUs, stop after one partition (simulated preemption)
    t1 = _run(base + ["--max-partitions", "1"], cpus=2)
    assert t1["partitions"] == 1

    # leg 2: 4 CPUs, finishes the remainder; done partitions are skipped
    t2 = _run(base, cpus=4)
    assert t2["partitions"] == 2
    assert t2["rows"] > t1["rows"]
    # step-stats lineage present and aggregated
    assert t2["step_stats"] and t2["step_stats"][0]["method"] == "orig"
    assert all(s["seconds"] >= 0 for s in t2["step_stats"])

    # leg 3: full resume is a no-op on outputs (identical totals, fast)
    t3 = _run(base, cpus=4)
    assert t3["rows"] == t2["rows"]
    assert t3["partitions"] == t2["partitions"]

    # the manifest records both legs' partitions with step stats
    with open(os.path.join(out, "manifest.jsonl")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 2
    assert all("step_stats" in r and r["step_stats"] for r in recs)
    # reconciliation: per-partition step matches == status-counter matches
    for r in recs:
        assert sum(s["match"] for s in r["step_stats"]) == \
            r["counters"]["status"].get("match", 0)
