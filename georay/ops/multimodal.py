"""Multimodal column plumbing: image/audio/video as opaque binary with
typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages.

The container has no image/audio libraries, so the DECODE KERNELS ARE
STUBS (mandate: "stub the decode step behind a clearly-marked
NotImplementedError or a deterministic fake") — but the Ray-side plumbing
is real and tested: schema (``payload: binary`` + metadata struct), actor
signature, batch sizing (media batches must be SMALL — payload bytes ×
batch_size × concurrency bounds worker heap), and the output layout
(fixed-size feature vector + dims metadata).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# Recommended batch size for ~1 MB payloads on a 4 GB-heap worker:
# batch_size * payload * (in + out copies) << heap  ->  keep it small.
MEDIA_BATCH_SIZE = 64


def synth_media_batch(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media table: (media_id, kind, payload: binary,
    width, height, duration_ms)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, w, h, dur = [], [], [], [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        size = int(rng.integers(256, 4096))
        ids.append(f"m{seed}_{i:06d}")
        kinds.append(kind)
        payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        w.append(int(rng.integers(16, 1024)) if kind != "audio" else 0)
        h.append(int(rng.integers(16, 1024)) if kind != "audio" else 0)
        dur.append(int(rng.integers(100, 60000)) if kind != "image" else 0)
    return pa.table({"media_id": pa.array(ids), "kind": pa.array(kinds),
                     "payload": pa.array(payloads, pa.binary()),
                     "width": pa.array(w, pa.int32()),
                     "height": pa.array(h, pa.int32()),
                     "duration_ms": pa.array(dur, pa.int32())})


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: seeded from the payload digest.
    Replace with a real model forward pass outside the sandbox."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: payload binary -> feature vector + dims metadata.

    ``real=True`` raises NotImplementedError (no codec libs in this
    container); the default deterministic fake keeps the schema, batch
    flow and output layout fully exercised.
    """

    def __init__(self, dim: int = 64, real: bool = False):
        self.dim = dim
        if real:
            raise NotImplementedError(
                "media decoding requires image/audio codec libraries not "
                "present in this container — run with real=False for the "
                "deterministic fake, or install codecs and implement "
                "_decode()")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [_fake_feature(p, self.dim).tolist()
                 for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"])  # never carry bytes forward
        out = out.append_column("feature",
                                pa.array(feats, pa.list_(pa.float32())))
        return out.append_column("feature_dim",
                                 pa.array([self.dim] * len(batch),
                                          pa.int32()))


class FrameSampler:
    """Actor-pool stage for video rows: emit one row per sampled frame
    (every ``stride_ms``), payload replaced by a frame reference — the
    explode layout a real decoder would produce."""

    def __init__(self, stride_ms: int = 1000):
        self.stride_ms = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts = [], [], []
        for i in range(len(batch)):
            if batch["kind"][i].as_py() != "video":
                continue
            dur = batch["duration_ms"][i].as_py()
            mid = batch["media_id"][i].as_py()
            for f, t in enumerate(range(0, max(dur, 1), self.stride_ms)):
                ids.append(mid)
                frame_idx.append(f)
                ts.append(t)
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "frame_idx": pa.array(frame_idx, pa.int32()),
                         "ts_ms": pa.array(ts, pa.int32())})
