"""Real pure-numpy media decoders (round-trip goldens + strict-mode
end-to-end): BMP/PPM images, RIFF PCM WAV audio.  These close VERDICT
r3 item 5 — strict mode no longer means 'always raise', it means 'no
fakes': uncompressed containers decode genuinely."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from reden_ray.stages.multimodal import (
    AudioChunker,
    ImageFeatures,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_wav,
    synth_bmp_table,
    synth_wav_table,
)


def test_bmp_round_trip_exact():
    rng = np.random.RandomState(3)
    for w, h in [(1, 1), (5, 7), (16, 16), (13, 9)]:  # odd widths pad rows
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_top_down_and_32bit():
    # hand-build a 2x2 top-down 32-bit BMP: pixels BGRA row-major
    px = bytes(
        [
            1, 2, 3, 0,   10, 20, 30, 0,   # row 0: BGR(A)
            100, 110, 120, 0,   200, 210, 220, 0,
        ]
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(px), 0, 0, 0, 0
    )
    img = decode_bmp(header + px)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [3, 2, 1]  # BGR -> RGB
    assert img[0, 1].tolist() == [30, 20, 10]
    assert img[1, 1].tolist() == [220, 210, 200]


def test_ppm_decode_with_comment():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)


def test_wav_round_trip_and_stereo():
    t = np.arange(800) / 8000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    samples, rate = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000
    assert np.max(np.abs(samples - sig)) < 1e-3  # 16-bit quantization

    # stereo: interleave two channels, expect their mean back
    left = np.full(100, 0.5, np.float64)
    right = np.full(100, -0.25, np.float64)
    inter = np.empty(200)
    inter[0::2], inter[1::2] = left, right
    pcm16 = np.round(inter * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm16)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm16)) + pcm16
    )
    mono, rate = decode_wav(payload)
    assert rate == 8000 and len(mono) == 100
    assert abs(float(mono[0]) - 0.125) < 1e-3


def test_strict_image_pipeline_end_to_end(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_bmp_table(12, seed=7))
    feats = ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"strict": True},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).take_all()
    assert len(feats) == 12
    assert len(feats[0]["feature"]) == 4 * 4 * 3
    assert all(0.0 <= v <= 1.0 for v in feats[0]["feature"])


def test_strict_audio_pipeline_end_to_end(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_wav_table(6, seed=8, sample_rate=8000))
    chunks = ds.map_batches(
        AudioChunker,
        fn_constructor_kwargs={"sample_rate": 8000, "chunk_s": 0.5, "strict": True},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).take_all()
    assert chunks
    # a pure sine of amplitude a has RMS a/sqrt(2); check one full chunk
    rms = [r["rms"] for r in chunks]
    assert all(0.1 < v < 0.7 for v in rms)


def test_strict_still_refuses_compressed():
    fake = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "mime": pa.array(["image/jpeg"], pa.string()),
            "payload": pa.array([b"\xff\xd8\xff\xe0 not a real jpeg"], pa.binary()),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([4], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError):
        ImageFeatures(strict=True)(fake)


def test_y4m_round_trip_exact():
    from reden_ray.stages.multimodal import decode_y4m, encode_y4m

    rng = np.random.RandomState(11)
    for n, h, w in [(1, 1, 1), (3, 9, 13), (6, 16, 8)]:
        fr = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
        assert (decode_y4m(encode_y4m(fr)) == fr).all()


def test_y4m_rejects_subsampled_and_garbage():
    from reden_ray.stages.multimodal import decode_y4m

    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n" + b"\0" * 24)
    with pytest.raises(ValueError):
        decode_y4m(b"nonsense")
    with pytest.raises(ValueError):  # truncated frame payload
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + b"\0" * 10)


def test_strict_video_pipeline_end_to_end(ray_session):
    import ray.data as rd

    from reden_ray.stages.multimodal import (
        VideoFrameFeatures,
        decode_y4m,
        synth_y4m_table,
    )

    tbl = synth_y4m_table(n=8, seed=9)
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            VideoFrameFeatures,
            fn_constructor_kwargs={"n_sample": 3, "grid": 2, "strict": True},
            batch_format="pyarrow",
            concurrency=(1, 2),
            num_cpus=1,
        )
        .to_pandas()
    )
    # every video contributes min(n_sample, n_frames) frames
    nf = {m: int(k) for m, k in zip(tbl.column("media_id").to_pylist(),
                                    tbl.column("n_frames").to_pylist())}
    counts = out.groupby("media_id").size().to_dict()
    assert counts == {m: min(3, k) for m, k in nf.items()}
    # spot-check one frame's mean luma against a direct decode
    row = out.iloc[0]
    frames = decode_y4m(
        tbl.filter(pa.compute.equal(tbl.column("media_id"), int(row.media_id)))
        .column("payload").to_pylist()[0]
    )
    want = float(np.round(frames[int(row.frame), :, :, 0].astype(np.float64).mean(), 4))
    assert row.mean_y == want
    assert len(row.thumb) == 4  # 2x2 uint8 grid


def test_strict_video_refuses_unknown_mime():
    from reden_ray.stages.multimodal import VideoFrameFeatures

    bad = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "mime": pa.array(["video/mp4"], pa.string()),
            "payload": pa.array([b"\x00\x00\x00\x18ftypmp42"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        VideoFrameFeatures(strict=True)(bad)
    # test mode: deterministic stub keeps the plumbing drivable
    out = VideoFrameFeatures(strict=False)(bad)
    assert out.num_rows == 4
