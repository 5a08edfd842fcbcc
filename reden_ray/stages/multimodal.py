"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata
(mime type, dimensions, duration), exactly like ``pages.html`` does in
the KG pipeline.  The Ray-side contract — schemas, actor-pool batch
stages, small batch sizes for wide rows, output layout — is real and
tested; the DECODE KERNELS themselves are stubbed because this
environment ships no image/audio libraries: each stage either raises
``NotImplementedError`` (strict mode) or applies a deterministic fake
(test mode) clearly marked as such.

Swap ``_decode_image_stub`` for a PIL/libvips call (resp. soundfile for
audio) in production; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: pseudo-pixels from a blake2b stream.
    STUB — replace with a real image decoder in production."""
    n = max(1, int(width) * int(height) * 3)
    seed = hashlib.blake2b(payload, digest_size=8).digest()
    out = np.empty(n, dtype=np.uint8)
    pos = 0
    counter = 0
    while pos < n:
        block = hashlib.blake2b(seed + counter.to_bytes(4, "big"), digest_size=64).digest()
        take = min(64, n - pos)
        out[pos : pos + take] = np.frombuffer(block[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out.reshape(int(height), int(width), 3)


class ImageFeatures:
    """Actor-pool stage: decode -> mean-pool grid features.

    ``strict=True`` raises NotImplementedError at the decode step (no
    image library in this container); ``strict=False`` uses the
    deterministic stub so the plumbing is testable end to end.
    Use SMALL ``batch_size`` (e.g. 64) — payload rows are wide.
    """

    def __init__(self, grid: int = 4, strict: bool = False):
        self.grid = grid
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; construct ImageFeatures(strict=False) for the "
                "deterministic stub"
            )
        feats = []
        for payload, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = _decode_image_stub(payload, w, h).astype(np.float32) / 255.0
            g = self.grid
            ys = np.linspace(0, img.shape[0], g + 1, dtype=int)
            xs = np.linspace(0, img.shape[1], g + 1, dtype=int)
            cells = [
                img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean(axis=(0, 1))
                for i in range(g)
                for j in range(g)
            ]
            feats.append(np.concatenate(cells).astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Video analogue: emits ``n_frames`` evenly-spaced frame stubs per
    payload (schema plumbing for a real ffmpeg-based sampler)."""

    def __init__(self, n_frames: int = 4, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video decode not available in this environment")
        ids, frame_idx, frames = [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            for f in range(self.n_frames):
                ids.append(media_id)
                frame_idx.append(f)
                frames.append(
                    hashlib.blake2b(payload + f.to_bytes(4, "big"), digest_size=16).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "thumb": pa.array(frames, pa.binary()),
            }
        )


class ImageResizer:
    """Actor-pool stage: decode -> nearest-neighbor resize -> re-emit
    as a raw RGB payload with updated dimensions.  Same strict/fake
    contract as ImageFeatures; the resize math itself (integer index
    grids) is REAL and library-free, so a production decoder slots in
    without touching the resampling."""

    def __init__(self, out_w: int = 16, out_h: int = 16, strict: bool = False):
        self.out_w = out_w
        self.out_h = out_h
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image library not present in this environment"
            )
        payloads, widths, heights = [], [], []
        for payload, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = _decode_image_stub(payload, w, h)
            ys = (np.arange(self.out_h) * img.shape[0] // self.out_h).astype(int)
            xs = (np.arange(self.out_w) * img.shape[1] // self.out_w).astype(int)
            resized = img[ys][:, xs]
            payloads.append(resized.tobytes())
            widths.append(self.out_w)
            heights.append(self.out_h)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": pa.array(["image/raw-rgb"] * batch.num_rows, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
            }
        )


def _decode_audio_stub(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic fake PCM decode (float32 in [-1, 1]).  STUB —
    replace with soundfile/librosa in production."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.RandomState(seed % (1 << 32))
    return (rng.rand(max(1, n_samples)).astype(np.float32) * 2.0) - 1.0


class AudioChunker:
    """Audio analogue: decode/resample -> fixed-length chunks -> per-chunk
    energy features (RMS + zero-crossing rate, real math over the fake
    PCM).  One output row per (media_id, chunk)."""

    def __init__(self, sample_rate: int = 16000, chunk_s: float = 1.0, strict: bool = False):
        self.sample_rate = sample_rate
        self.chunk = int(sample_rate * chunk_s)
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires an audio library not present in this environment"
            )
        ids, chunk_idx, rms, zcr = [], [], [], []
        for media_id, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_s").to_pylist(),
        ):
            pcm = _decode_audio_stub(payload, int((dur or 1.0) * self.sample_rate))
            n_chunks = max(1, len(pcm) // self.chunk)
            for c in range(n_chunks):
                seg = pcm[c * self.chunk : (c + 1) * self.chunk]
                ids.append(media_id)
                chunk_idx.append(c)
                rms.append(float(np.sqrt(np.mean(seg * seg))))
                zcr.append(float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1]))))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "chunk": pa.array(chunk_idx, pa.int32()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
            }
        )


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("duration_s", pa.float64()),
    ]
)


def synth_audio_table(n: int = 16, seed: int = 6) -> pa.Table:
    """Deterministic fake audio rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(["audio/fake"] * n, pa.string()),
            pa.array([rng.bytes(128) for _ in range(n)], pa.binary()),
            pa.array(rng.uniform(0.5, 3.5, n), pa.float64()),
        ],
        schema=AUDIO_SCHEMA,
    )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256) for _ in range(n)]
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(["image/fake"] * n, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(rng.randint(8, 32, n).astype("int32"), pa.int32()),
            pa.array(rng.randint(8, 32, n).astype("int32"), pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )
