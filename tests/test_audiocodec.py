"""Real audio decode path: pure-numpy WAV/PCM16 codec + the multimodal
pipeline (decode → band-energy features → cosine top-k)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_source_spark.llmops import audiocodec as ac
from hadoop_source_spark.llmops import multimodal as mm
from hadoop_source_spark.llmops import similarity as sim


def _tone(freq: float, secs: float = 0.25, rate: int = 8000,
          channels: int = 1) -> np.ndarray:
    t = np.arange(int(secs * rate)) / rate
    x = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
    return np.stack([x] * channels, axis=1) if channels > 1 else x


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_round_trip(channels):
    pcm = _tone(440, channels=channels)
    rate, back = ac.decode_wav(ac.encode_wav(pcm, 8000))
    assert rate == 8000
    want = pcm if pcm.ndim == 2 else pcm[:, None]
    assert np.array_equal(back, want)


def test_wav_tolerates_extra_chunks():
    """Chunk-walk must skip LIST/INFO chunks between fmt and data."""
    raw = ac.encode_wav(_tone(440), 8000)
    # splice a LIST chunk after fmt (offset 12+8+16=36)
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    hacked = raw[:36] + extra + raw[36:]
    rate, pcm = ac.decode_wav(hacked)
    assert rate == 8000 and pcm.shape[0] == len(_tone(440))


def test_band_energies_separate_tones():
    """A low tone and a high tone concentrate energy in different bands;
    identical signals give identical features (determinism)."""
    lo = ac.band_energies(_tone(200, rate=8000), n_bands=8)
    hi = ac.band_energies(_tone(3500, rate=8000), n_bands=8)
    assert lo.argmax() < hi.argmax()
    assert np.array_equal(lo, ac.band_energies(_tone(200, rate=8000), n_bands=8))


def test_compressed_audio_stays_stubbed(spark):
    mp3ish = spark.createDataFrame(
        [(1, b"ID3\x04rest-of-an-mp3")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="codec library"):
        mm.decode_audio(mp3ish).collect()
    garbage = spark.createDataFrame(
        [(1, b"not audio")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="RIFF"):
        mm.decode_audio(garbage).collect()
    assert mm.decode_audio(garbage, on_error="skip").count() == 0


def test_wav_corpus_decode_features_topk(spark):
    """WAV corpus through the REAL decode inside mapInPandas, then
    band-energy features into cosine top-k: self-match ranks first, and
    the same-frequency different-phase clip ranks above distant tones."""
    clips = {i: _tone(200 + 300 * i, rate=8000) for i in range(5)}
    payloads = spark.createDataFrame(
        [(i, ac.encode_wav(a, 8000)) for i, a in clips.items()],
        "doc_id long, payload binary",
    )

    decoded = {r.doc_id: r for r in mm.decode_audio(payloads).collect()}
    assert set(decoded) == set(clips)
    for i, a in clips.items():
        r = decoded[i]
        assert (r.sample_rate, r.n_samples, r.channels) == (8000, len(a), 1)
        assert np.array_equal(
            np.frombuffer(bytes(r.pcm), dtype=np.int16), a
        )

    feats = mm.audio_features(payloads, n_bands=16)
    corpus = feats.select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    queries = corpus.select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = sim.brute_force_topk(corpus, queries, k=1)
    for r in top.collect():
        assert r.vec_id == r.query_id
        assert abs(r.cosine - 1.0) < 1e-6
