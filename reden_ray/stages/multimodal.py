"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata
(mime type, dimensions, duration), exactly like ``pages.html`` does in
the KG pipeline.  The Ray-side contract — schemas, actor-pool batch
stages, small batch sizes for wide rows, output layout — is real and
tested.

Decode kernels: UNCOMPRESSED containers decode for real, pure numpy —
24/32-bit BI_RGB BMP, binary PPM (P6) for images; RIFF/WAVE PCM
(8/16-bit) for audio — so the image and audio pipelines run STRICT
end to end in this environment.  Compressed formats (JPEG/PNG/MP3/...)
need codec libraries this container doesn't ship: in strict mode they
raise ``NotImplementedError``; in test mode a deterministic fake
(clearly marked) keeps the plumbing drivable.  Swap the dispatch for
PIL/libvips (resp. soundfile) in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct

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


# --- REAL decoders (pure numpy, uncompressed containers) -----------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) 24- or 32-bit BMP to an RGB
    uint8 array of shape (height, width, 3).  Pure numpy: header
    offsets per the public BITMAPFILEHEADER/BITMAPINFOHEADER layout,
    rows padded to 4 bytes, bottom-up (positive height) or top-down
    (negative) both handled."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BI_RGB BMPs decode here "
            f"(got compression={compression}, bpp={bpp})"
        )
    top_down = height < 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_stride * height,
                        offset=data_offset)
    rows = raw.reshape(height, row_stride)[:, : width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); emit RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as a 24-bit bottom-up
    BI_RGB BMP (the fixture writer for the real decoder)."""
    h, w, _ = img.shape
    row_stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_bytes = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + pixel_bytes


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval <= 255) to (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM payload (missing 'P6' magic)")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data,
    # with '#' comments allowed between tokens
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace before pixel data
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPMs not supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload (8-bit unsigned or 16-bit signed,
    any channel count — channels are averaged to mono) to
    (float32 samples in [-1, 1], sample_rate).  Pure numpy chunk walk
    per the public RIFF layout."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit integer PCM WAVs decode here "
            f"(got format={audio_format}, bits={bits})"
        )
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2
        ).astype(np.float32) / 32768.0
    else:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    if n_channels > 1:
        n = (len(samples) // n_channels) * n_channels
        samples = samples[:n].reshape(-1, n_channels).mean(axis=1)
    return samples.astype(np.float32), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono float32 [-1, 1] samples as 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm16))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm16))
        + pcm16
    )


def decode_image(
    payload: bytes,
    mime: str | None = None,
    width: int | None = None,
    height: int | None = None,
    strict: bool = False,
) -> np.ndarray:
    """Dispatch: real decoders by magic bytes (BMP/PPM), else the
    deterministic stub — which strict mode refuses."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if strict:
        raise NotImplementedError(
            f"no real decoder for this payload (mime={mime}); compressed "
            "formats need an image library not present in this environment"
        )
    return _decode_image_stub(payload, width or 1, height or 1)


def decode_audio(
    payload: bytes,
    mime: str | None = None,
    n_samples: int | None = None,
    strict: bool = False,
) -> tuple[np.ndarray, int | None]:
    """Dispatch: real WAV decoder by magic bytes, else the stub
    (strict mode refuses)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if strict:
        raise NotImplementedError(
            f"no real decoder for this payload (mime={mime}); compressed "
            "formats need an audio library not present in this environment"
        )
    return _decode_audio_stub(payload, n_samples or 1), None


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

    BMP/PPM payloads decode for REAL (pure numpy), so ``strict=True``
    runs end to end on uncompressed fixtures in this environment;
    strict only raises when a row needs a codec library (JPEG/PNG...).
    ``strict=False`` falls back to the deterministic stub for such
    rows.  Use SMALL ``batch_size`` (e.g. 64) — payload rows are wide.
    """

    def __init__(self, grid: int = 4, strict: bool = False):
        self.grid = grid
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, mime, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = (
                decode_image(payload, mime, w, h, strict=self.strict).astype(
                    np.float32
                )
                / 255.0
            )
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
        payloads, widths, heights = [], [], []
        for payload, mime, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = decode_image(payload, mime, w, h, strict=self.strict)
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
        ids, chunk_idx, rms, zcr = [], [], [], []
        for media_id, payload, mime, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("duration_s").to_pylist(),
        ):
            pcm, rate = decode_audio(
                payload,
                mime,
                int((dur or 1.0) * self.sample_rate),
                strict=self.strict,
            )
            chunk = int((rate or self.sample_rate) * self.chunk / self.sample_rate)
            n_chunks = max(1, len(pcm) // chunk)
            for c in range(n_chunks):
                seg = pcm[c * chunk : (c + 1) * chunk]
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


def synth_bmp_table(n: int = 32, seed: int = 7) -> pa.Table:
    """Deterministic REAL 24-bit BMP rows: seeded pseudo-random pixel
    fields round-tripped through encode_bmp, so strict-mode decoding
    exercises the genuine container path end to end."""
    rng = np.random.RandomState(seed)
    ids, mimes, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.randint(5, 21))  # odd widths exercise row padding
        h = int(rng.randint(5, 21))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        ids.append(i)
        mimes.append("image/bmp")
        payloads.append(encode_bmp(img))
        widths.append(w)
        heights.append(h)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(mimes, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(widths, pa.int32()),
            pa.array(heights, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


def synth_wav_table(n: int = 16, seed: int = 8, sample_rate: int = 8000) -> pa.Table:
    """Deterministic REAL 16-bit PCM WAV rows: seeded sine mixtures
    through encode_wav."""
    rng = np.random.RandomState(seed)
    ids, mimes, payloads, durs = [], [], [], []
    for i in range(n):
        dur = float(rng.uniform(0.5, 2.0))
        t = np.arange(int(dur * sample_rate)) / sample_rate
        freq = float(rng.uniform(100, 1000))
        amp = float(rng.uniform(0.2, 0.9))
        sig = amp * np.sin(2 * np.pi * freq * t)
        ids.append(i)
        mimes.append("audio/wav")
        payloads.append(encode_wav(sig.astype(np.float32), sample_rate))
        durs.append(dur)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(mimes, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(durs, pa.float64()),
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


# --- REAL video: YUV4MPEG2 (Y4M), uncompressed ---------------------------

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode (n, h, w, 3) uint8 YUV frames as a YUV4MPEG2 stream with
    C444 chroma (one full-resolution plane per component per frame) —
    the uncompressed public container ffmpeg/mplayer exchange raw video
    in."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w, 3) uint8 YUV")
    n, h, w, _ = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()]
    for f in range(n):
        out.append(b"FRAME\n")
        # plane-ordered: all Y, all U, all V
        out.append(np.ascontiguousarray(frames[f].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Decode a C444 YUV4MPEG2 stream to (n, h, w, 3) uint8 — pure
    numpy.  Chroma-subsampled streams (C420 etc.) need a resampler and
    raise ``NotImplementedError`` here."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload (missing magic)")
    hdr_end = payload.index(b"\n")
    params = payload[:hdr_end].decode().split()[1:]
    w = h = None
    chroma = "C420jpeg"  # Y4M default when the C tag is absent
    for p in params:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C"):
            chroma = p
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if chroma != "C444":
        raise NotImplementedError(
            f"only C444 Y4M decodes here (got {chroma}); plug ffmpeg for "
            "subsampled chroma"
        )
    frame_bytes = 3 * w * h
    frames = []
    pos = hdr_end + 1
    buf = memoryview(payload)
    while pos < len(payload):
        nl = payload.index(b"\n", pos)  # FRAME line (may carry params)
        if not payload[pos:nl].startswith(b"FRAME"):
            raise ValueError("malformed Y4M: expected FRAME marker")
        start = nl + 1
        planes = np.frombuffer(buf[start: start + frame_bytes], dtype=np.uint8)
        if planes.size != frame_bytes:
            raise ValueError("truncated Y4M frame")
        frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)


class VideoFrameFeatures:
    """Actor-pool video stage, strict-capable: decode Y4M, sample
    ``n_sample`` evenly-spaced frames, emit per-frame luma statistics
    and a mean-pooled ``grid``x``grid`` Y-plane thumbnail (the shape a
    real embedding model would consume).  Per-payload decode is
    inherently per-row (opaque binary); everything inside a frame is
    vectorized."""

    def __init__(self, n_sample: int = 4, grid: int = 4, strict: bool = False):
        self.n_sample = n_sample
        self.grid = grid
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, mean_y, std_y, thumbs = [], [], [], [], []
        for media_id, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime == "video/x-yuv4mpeg" or payload[:9] == b"YUV4MPEG2":
                frames = decode_y4m(payload)
            elif self.strict:
                raise NotImplementedError(
                    f"no in-sandbox decoder for {mime}; plug ffmpeg/PyAV"
                )
            else:
                frames = _decode_video_stub(payload)
            n = frames.shape[0]
            if n == 0:
                continue
            take = np.unique(
                np.linspace(0, n - 1, min(self.n_sample, n)).astype(np.int64)
            )
            g = self.grid
            for f in take:
                y = frames[f, :, :, 0].astype(np.float64)
                h, w = y.shape
                gh, gw = max(1, h // g), max(1, w // g)
                pooled = (
                    y[: gh * g, : gw * g]
                    .reshape(g, gh, g, gw)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                ids.append(media_id)
                fidx.append(int(f))
                mean_y.append(float(np.round(y.mean(), 4)))
                std_y.append(float(np.round(y.std(), 4)))
                thumbs.append(pooled.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(fidx, pa.int32()),
                "mean_y": pa.array(mean_y, pa.float64()),
                "std_y": pa.array(std_y, pa.float64()),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


def _decode_video_stub(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE (test mode only): 4 frames of byte-seeded
    noise — keeps plumbing drivable for mimes with no in-sandbox
    codec."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(4, 16, 16, 3)).astype(np.uint8)


def synth_y4m_table(n: int = 12, seed: int = 9) -> pa.Table:
    """Deterministic REAL Y4M rows: seeded moving-gradient frames
    through encode_y4m, so strict-mode video decoding exercises the
    genuine container path end to end."""
    rng = np.random.RandomState(seed)
    ids, mimes, payloads, ws, hs, nf = [], [], [], [], [], []
    for i in range(n):
        w = int(rng.randint(8, 25))
        h = int(rng.randint(8, 25))
        k = int(rng.randint(3, 9))
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.empty((k, h, w, 3), np.uint8)
        for f in range(k):
            frames[f, :, :, 0] = ((xx * 7 + yy * 3 + f * 11) % 256).astype(np.uint8)
            frames[f, :, :, 1] = ((xx * 2 + f * 5) % 256).astype(np.uint8)
            frames[f, :, :, 2] = ((yy * 5 + f * 2) % 256).astype(np.uint8)
        ids.append(i)
        mimes.append("video/x-yuv4mpeg")
        payloads.append(encode_y4m(frames))
        ws.append(w)
        hs.append(h)
        nf.append(k)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(mimes, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(ws, pa.int32()),
            pa.array(hs, pa.int32()),
            pa.array(nf, pa.int32()),
        ],
        schema=VIDEO_SCHEMA,
    )
