"""Per-worker-process GC mode switch.

The cascade tunes the worker's cyclic GC for its allocation profile
(freeze the resident gazetteer/parser/memo objects out of the scan set,
raise the gen-0 threshold — millions of short-lived pandas objects per
batch made default GC rescans measurable).  Ray task workers are reused
across dataset executions, so WITHOUT scoping, a later allocation-heavy
stage in the same session (minhash signatures, ANN matmuls) inherits a
100k-object gen-0 threshold and pays for it: round-2 measured the same
minhash job at 12.4 s standalone vs 24.3 s after a cascade run.

Protocol: cascade batch fns call ``cascade_gc()`` at the top of every
call (a dict-lookup no-op when already in cascade mode); every other
hot batch fn calls ``default_gc()`` likewise.  Both are idempotent and
cost ~100 ns on the no-op path.
"""

from __future__ import annotations

import gc

_MODE = {"mode": "default"}

# CPython defaults — restored when leaving cascade mode.
_DEFAULT_THRESHOLD = (700, 10, 10)
_CASCADE_THRESHOLD = (100000, 50, 50)


def cascade_gc() -> None:
    """Enter cascade GC mode (idempotent): freeze resident state out of
    the GC scan set and raise gen-0 threshold."""
    if _MODE["mode"] == "cascade":
        return
    gc.collect()
    gc.freeze()
    gc.set_threshold(*_CASCADE_THRESHOLD)
    _MODE["mode"] = "cascade"


def default_gc() -> None:
    """Leave cascade GC mode (idempotent): RE-FREEZE current survivors
    (the cascade's memo caches grew AFTER the original freeze, so without
    a refreeze every later gen-2 collection rescans millions of immortal
    memo objects) and restore CPython default thresholds.  Measured
    variants (round 3, 8 runs, cascade-then-minhash at 32 CPUs): this
    combination gave the two fastest and most consistent minhash times
    (5.2/6.4 s vs 11-22 s for unfreeze / threshold-keep / gc-disable),
    though host run-to-run variance remains larger than the variant
    deltas — see BASELINE.md measurement notes."""
    if _MODE["mode"] == "default":
        return
    gc.freeze()
    gc.set_threshold(*_DEFAULT_THRESHOLD)
    _MODE["mode"] = "default"
