"""MJPEG/AVI video path (llmops/videocodec.py): RIFF container
round-trip, uniform temporal sampling, and the full Spark pipeline —
video payload → sample_frames → decode_image → pixels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.llmops import multimodal as mm
from hadoop_source_spark.llmops import videocodec as vc


def _frame(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + seed) % 256, (y * 5 + 2 * seed) % 256, (x + y + 7 * seed) % 256],
        axis=-1,
    ).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_avi_container_round_trip():
    frames = [_frame(i) for i in range(12)]
    avi = vc.encode_mjpeg_avi(frames, fps=6)
    assert vc.sniff_video(avi) == "avi"
    meta, got = vc.parse_avi(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 12)
    assert meta["us_per_frame"] == 1_000_000 // 6
    assert len(got) == 12
    for i in (0, 5, 11):
        assert _psnr(_frame(i), vc.decode_frame(got[i])) >= 30.0


def test_sample_indices_uniform_and_bounded():
    assert vc.sample_frame_indices(12, 4) == [0, 4, 7, 11]
    assert vc.sample_frame_indices(3, 8) == [0, 1, 2]  # never oversamples
    assert vc.sample_frame_indices(1, 4) == [0]
    assert vc.sample_frame_indices(0, 4) == []
    idx = vc.sample_frame_indices(100, 5)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 5


def test_foreign_codecs_stay_loud():
    with pytest.raises(NotImplementedError):
        vc.parse_avi(_fake_avi_with_codec(b"H264"))
    assert vc.sniff_video(b"\x00\x00\x00\x18ftypisom....") == "mp4"
    with pytest.raises(ValueError):
        vc.parse_avi(b"RIFF\x00\x00\x00\x00WAVE")


def _fake_avi_with_codec(fourcc: bytes) -> bytes:
    frames = [_frame(0)]
    avi = bytearray(vc.encode_mjpeg_avi(frames))
    i = avi.find(b"vidsMJPG")
    avi[i + 4 : i + 8] = fourcc
    return bytes(avi)


def test_video_pipeline_sample_then_decode(spark):
    """The full chain on Spark: AVI payloads → sample_frames (REAL
    temporal sampling, JPEG bytes out) → decode_image (REAL pixels).
    Sampled pixels must match the source frames within JPEG loss."""
    vids = {
        1: [_frame(i) for i in range(10)],
        2: [_frame(100 + i) for i in range(5)],
    }
    payloads = spark.createDataFrame(
        [(d, vc.encode_mjpeg_avi(fs, fps=5)) for d, fs in vids.items()],
        "doc_id long, payload binary",
    )
    sampled = mm.sample_frames(payloads, num_frames=4)
    rows = sampled.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(by_doc[1]) == [0, 3, 6, 9]   # uniform over 10 frames
    assert sorted(by_doc[2]) == [0, 1, 3, 4]   # uniform over 5 frames

    decoded = mm.decode_image(
        sampled.select(
            (F.col("doc_id") * 100 + F.col("frame_idx")).alias("doc_id"),
            F.col("frame").alias("payload"),
        )
    )
    out = {r.doc_id: r for r in decoded.collect()}
    for d, fs in vids.items():
        for i in by_doc[d]:
            r = out[d * 100 + i]
            assert (r.codec, r.height, r.width) == ("jpeg", 24, 32)
            px = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(24, 32, 3)
            # high-seed frames wrap mod 256 often (hard edges), which
            # 4:2:0 chroma decimation penalizes — gate accordingly
            assert _psnr(fs[i], px) >= 22.0
