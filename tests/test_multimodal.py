from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"x" * 5000, ("png", 10, 10, 5000)),
        (2, b"hello world" * 400, ("jpg", 20, 5, 4400)),
        (3, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = extract_features(media, decoder="fake")
    rows = {r["media_id"]: r["feature"] for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3] is None  # null blob → null feature, no crash
    assert len(rows[1]) == FEATURE_DIM
    assert all(0 <= v < 1 for v in rows[1])
    # deterministic across runs
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert rows == rows2
    # schema contract
    assert out.schema["feature"].dataType.simpleString() == "array<float>"


def test_real_decoder_is_explicit_stub(spark, media):
    out = extract_features(media, decoder="real")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()


def test_unknown_decoder_rejected(media):
    with pytest.raises(ValueError):
        extract_features(media, decoder="nope")


def test_frame_sample_chunking(spark, media):
    frames = frame_sample(media, frame_bytes=1024, stride=2)
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("frame_no").alias("first"),
    )
    by_id = {r["media_id"]: (r["n"], r["first"]) for r in got.collect()}
    # blob 1: 5000 bytes → 5 chunks → frames 0,2,4 → 3 sampled
    assert by_id[1] == (3, 0)
    # blob 2: 4400 bytes → 5 chunks → 3 sampled
    assert by_id[2] == (3, 0)
    assert 3 not in by_id  # null blob skipped
    sizes = {
        (r["media_id"], r["frame_no"]): len(r["frame"]) for r in frames.collect()
    }
    assert sizes[(1, 0)] == 1024 and sizes[(1, 4)] == 904  # tail chunk


def test_audio_pcm_stats_matches_numpy(spark):
    """The PCM16 decode is REAL: stats must equal a local numpy
    reference, including odd-trailing-byte truncation and empty blobs."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import audio_pcm_stats

    blobs = {
        1: bytes(range(16)),          # even length
        2: bytes(range(15)),          # odd -> last byte ignored
        3: b"",                        # empty -> null stats
        4: (32767).to_bytes(2, "little") + (32768).to_bytes(2, "little"),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    for k, b in blobs.items():
        v = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2")
        assert got[k].n_samples == len(v)
        if len(v):
            x = v.astype(np.float64)
            assert got[k].rms == round(float(np.sqrt((x * x).sum() / len(v))), 6)
            assert got[k].peak == int(np.abs(v.astype(np.int64)).max())
        else:
            assert got[k].rms is None and got[k].peak is None
    assert got[4].peak == 32768  # -32768 interpreted signed, |.| kept


def test_resize_images_contract(spark):
    """Fake resize: deterministic bytes of exactly width*height, meta
    updated, nulls passed through, real decoder raises at the seam."""
    import pytest

    from datalakeingestion_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"img-bytes")), (2, None)],
        "media_id long, content binary",
    )
    out = {r.media_id: r for r in resize_images(df, 8, 4).collect()}
    assert len(out[1].content) == 32
    assert out[1].meta.width == 8 and out[1].meta.height == 4
    assert out[2].content is None
    again = {r.media_id: r for r in resize_images(df, 8, 4).collect()}
    assert bytes(again[1].content) == bytes(out[1].content)
    with pytest.raises(Exception, match="codec"):
        resize_images(df, 8, 4, decoder="real").collect()
