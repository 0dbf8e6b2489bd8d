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
