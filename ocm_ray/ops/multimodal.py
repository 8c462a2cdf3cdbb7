"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``mime``, declared dims/duration). The Ray-side structure — schema,
actor-pool decode stages, batch sizing for large binaries, output layout
— is real and tested; the actual codec calls are STUBBED because this
container ships no PIL/ffmpeg/torchaudio: each decoder raises
``NotImplementedError`` unless constructed with ``fake=True``, which
produces a deterministic synthetic decode derived from the payload bytes
(so downstream feature stages are exercised end-to-end).

Batch-size guidance encoded in the defaults: with ~1 MB payloads, a
batch of 32 rows ≈ 32 MB ≈ a sane per-actor working set; callers with
10 MB video chunks should drop to batch_size=4 and raise
``DataContext.target_max_block_size`` so blocks aren't split absurdly
small (one row per block is fine for video).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ocm_ray.core.hashing import wanghash

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),      # declared; -1 if unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int = 64, seed: int = 42,
                      payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (for tests/benches — the container
    has no real media); payload = seeded pseudo-random bytes with a
    16-byte header encoding (w, h, duration)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "payload", "mime", "width", "height",
                            "duration_ms")}
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    for i in range(n):
        mime = mimes[i % len(mimes)]
        w, h = (int(rng.integers(32, 512)), int(rng.integers(32, 512))) \
            if mime.startswith(("image", "video")) else (-1, -1)
        dur = int(rng.integers(500, 60000)) if not mime.startswith("image") else -1
        body = rng.integers(0, 256, payload_bytes - 16, dtype=np.uint8).tobytes()
        payload = struct.pack("<iiii", w, h, dur, payload_bytes) + body
        rows["media_id"].append(i)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: payload → decoded pixel tensor + basic stats.

    Real decode requires PIL/turbojpeg (absent here): ``fake=False``
    raises NotImplementedError at first batch. ``fake=True`` produces a
    deterministic (seeded by payload hash) uint8 array of the declared
    dims — the Ray plumbing (constructor-once state, per-batch decode,
    fixed-size-list output column) is identical either way."""

    def __init__(self, fake: bool = False, target_size: Optional[int] = 64):
        self.fake = fake
        self.target = target_size
        self._pil = None
        if not fake:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake and self._pil is None:
            raise NotImplementedError(
                "image decode needs PIL (not in this container); "
                "construct DecodeImage(fake=True) for the deterministic stub")
        t = self.target
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out = np.empty((len(payloads), t * t), dtype=np.uint8)
        means = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            seed = int(wanghash(np.frombuffer(p[:16].ljust(16, b"\0"),
                                              dtype=np.uint64))[0])
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, t * t, dtype=np.uint8)  # "decoded" + "resized"
            out[i] = px
            means[i] = px.mean()
        pixels = pa.FixedSizeListArray.from_arrays(
            pa.array(out.ravel(), type=pa.uint8()), t * t)
        return pa.table({"media_id": pa.array(ids),
                         "pixels": pixels,
                         "mean_luma": pa.array(means)})


class ExtractAudioFeatures:
    """Actor-pool stage: audio payload → fixed-length feature vector.
    Stubbed like DecodeImage (no torchaudio/librosa in the container)."""

    N_FEATURES = 32

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio features need librosa/torchaudio (not in this "
                "container); construct ExtractAudioFeatures(fake=True)")
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), self.N_FEATURES), dtype=np.float32)
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, dtype=np.uint8)[:4096].astype(np.float32)
            chunks = np.array_split(arr, self.N_FEATURES)
            feats[i] = [c.mean() for c in chunks]
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), self.N_FEATURES)
        return pa.table({"media_id": batch.column("media_id"), "features": vec})


def sample_video_frames(batch: pa.Table, every_ms: int = 1000,
                        fake: bool = True) -> pa.Table:
    """Frame-sampling stage (flat_map-shaped: one output row per sampled
    frame). Stub emits (media_id, frame_idx, ts_ms) rows from the
    declared duration — the real decoder would attach pixel tensors."""
    if not fake:
        raise NotImplementedError("video decode needs ffmpeg (absent)")
    ids = batch.column("media_id").to_numpy(zero_copy_only=False)
    dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
    out_id, out_fi, out_ts = [], [], []
    for i, d in zip(ids, dur):
        n = max(0, int(d) // every_ms)
        out_id.extend([int(i)] * n)
        out_fi.extend(range(n))
        out_ts.extend(range(0, n * every_ms, every_ms))
    return pa.table({"media_id": pa.array(out_id, pa.int64()),
                     "frame_idx": pa.array(out_fi, pa.int32()),
                     "ts_ms": pa.array(out_ts, pa.int32())})


def decode_images(ds: Dataset, fake: bool = False, target_size: int = 64,
                  batch_size: int = 32, concurrency: int = 4) -> Dataset:
    """images → pixel tensors via the actor pool (see batch-size note in
    the module docstring)."""
    import ray as _ray

    n = int(_ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(DecodeImage, fn_constructor_kwargs={
        "fake": fake, "target_size": target_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=max(1, min(concurrency, n // 2)), num_cpus=0.5)
