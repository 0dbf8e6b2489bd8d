"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; transforms
run as Arrow-batched ``mapInPandas`` operators so the bytes never leave the
executors and never pass through row-at-a-time Python.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this environment, so the
decode kernels are STUBBED: ``decoder="fake"`` derives small deterministic
feature vectors from the bytes' md5 (so schema/partitioning/batch-shape —
the Spark-side contract — is fully real and tested), and ``decoder="real"``
raises ``NotImplementedError`` at the exact seam where a codec plugs in.

Scale notes: one media row can be MBs — ``mapInPandas`` streams Arrow
batches, so executor memory is bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` (set lower for large blobs); feature extraction is
embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(blob: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a decode→embed kernel: FEATURE_DIM floats
    in [0,1) from the md5 of the bytes."""
    if blob is None:
        return None
    digest = hashlib.md5(bytes(blob)).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_size_hint: int | None = None
) -> DataFrame:
    """(media_id, feature: array<float>) via Arrow-batched mapInPandas."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires an image/audio codec "
                    "(PIL/ffmpeg) — not available in this environment; "
                    "plug the codec in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": pdf["content"].map(_fake_features),
                }
            )

    return media.select("media_id", "content").mapInPandas(op, _FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, frame_bytes: int = 1024, stride: int = 4
) -> DataFrame:
    """Deterministic "video" frame sampler: every ``stride``-th
    ``frame_bytes`` chunk of the blob becomes a frame row
    (media_id, frame_no, frame: binary). The chunk/stride plumbing is the
    real operator shape; a codec would replace the byte-slicing."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                blob = bytes(blob)
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for frame_no in range(0, n_frames, stride):
                    lo = frame_no * frame_bytes
                    out_ids.append(mid)
                    out_nos.append(frame_no)
                    out_frames.append(blob[lo : lo + frame_bytes])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_frames}
            )

    return media.select("media_id", "content").mapInPandas(op, schema)


def audio_pcm_stats(media: DataFrame) -> DataFrame:
    """Per-clip stats for RAW PCM16 little-endian audio — n_samples, RMS
    amplitude, absolute peak. Unlike the image/video kernels this needs
    NO external codec: raw PCM is just int16 byte pairs, so the decode
    (`numpy.frombuffer('<i2')`) is real, not stubbed — the loudness/
    clipping screen an audio curation pipeline runs before any model.

    Arrow-batched mapInPandas, one BLAS pass per batch, no shuffle; an
    odd trailing byte is ignored (frombuffer semantics). RMS sums squares
    of int16 values in float64 (exact below 2^53), rounds to 6 dp.

    Output: (media_id, n_samples long, rms double, peak long).
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("peak", T.LongType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rmss, peaks = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                b = bytes(blob)
                v = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2")
                ids.append(mid)
                ns.append(len(v))
                if len(v):
                    x = v.astype(np.float64)
                    rmss.append(round(float(np.sqrt((x * x).sum() / len(v))), 6))
                    # widen BEFORE abs: np.abs(int16(-32768)) overflows
                    # back to -32768 and would under-report the peak
                    peaks.append(int(np.abs(v.astype(np.int64)).max()))
                else:
                    rmss.append(None)
                    peaks.append(None)
            yield pd.DataFrame(
                {"media_id": ids, "n_samples": ns, "rms": rmss, "peak": peaks}
            )

    return media.select("media_id", "content").mapInPandas(op, schema)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, decoder: str = "fake"
) -> DataFrame:
    """Image resize plumbing: (media_id, content, meta) -> same shape with
    ``content`` replaced by the resized image bytes and ``meta`` updated
    to the target dimensions. With ``decoder="fake"`` the output bytes
    are a deterministic md5-keyed stream of exactly width*height bytes
    (so schema, meta bookkeeping, batch shape, and downstream joins are
    fully real and testable); ``decoder="real"`` raises at the seam
    where PIL/opencv plugs in. Arrow-batched mapInPandas, no shuffle;
    executor memory bounded by arrow.maxRecordsPerBatch.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "plug a real image codec here (PIL/opencv not in env)"
                )
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    out.append((mid, None, None))
                    continue
                seed = hashlib.md5(bytes(blob)).digest()
                n = width * height
                body = (seed * (n // len(seed) + 1))[:n]
                out.append(
                    (mid, body, ("fake-raw", width, height, len(body)))
                )
            yield pd.DataFrame(
                out, columns=["media_id", "content", "meta"]
            )

    return media.select("media_id", "content").mapInPandas(op, MEDIA_SCHEMA)
