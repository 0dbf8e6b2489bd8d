"""Round-5 plans: REAL image decode over synthesized PPM media.

The fixtures ship no image files, so the media column is synthesized
IN-PLAN from the documents table: each doc's ASCII text bytes become the
raster of a binary PPM (P6) — header ``P6\\n4 {h}\\n255\\n`` plus the
first ``12·h`` text bytes as 4-wide RGB rows. Because text is pure ASCII
in the fixtures (``ord(char) == byte``), the whole decode → pixel-stats
path is replicable in ANSI SQL, making the REAL image codec
(operators/multimodal.py::decode_image) exactly oracle-checked the same
way the PCM16 audio path is.

Same determinism contract as every plan module: exact integer channel
sums, one division, 6-dp round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register


@register(
    "image_ppm_pixel_stats",
    # body byte i (1-based, i <= 12*h) is text byte i; channel = (i-1)%3
    # (0=R,1=G,2=B). Exact integer sums per channel / (4*h) pixels.
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      CAST(len(text) // 12 AS BIGINT) AS h, text
               FROM documents WHERE len(text) >= 12),
    b AS (SELECT media_id, h,
                 unnest(range(1, CAST(12 * h + 1 AS BIGINT))) AS i, text
          FROM m),
    v AS (SELECT media_id, h, CAST((i - 1) % 3 AS INT) AS ch,
                 ord(substr(text, CAST(i AS INT), 1)) AS val
          FROM b)
    SELECT media_id,
           'ppm' AS format,
           4 AS width,
           CAST(h AS INT) AS height,
           CAST(4 * h AS BIGINT) AS n_pixels,
           round(CAST(SUM(CASE WHEN ch = 0 THEN val END) AS DOUBLE)
                 / (4 * h), 6) AS mean_r,
           round(CAST(SUM(CASE WHEN ch = 1 THEN val END) AS DOUBLE)
                 / (4 * h), 6) AS mean_g,
           round(CAST(SUM(CASE WHEN ch = 2 THEN val END) AS DOUBLE)
                 / (4 * h), 6) AS mean_b
    FROM v GROUP BY media_id, h
    """,
    doc="REAL image decode, exactly oracle-checked: documents' ASCII "
    "bytes are packaged as binary PPM (P6) blobs in-plan, decoded by "
    "the pure-numpy codec (operators/multimodal.py::decode_image — the "
    "same parser that handles on-disk PPM/PGM/BMP24), and reduced to "
    "per-image resolution + exact per-channel means "
    "(multimodal.py::image_stats). Arrow-batched mapInPandas, no "
    "shuffle; the curation screen an image pipeline runs before any "
    "model sees a pixel.",
)
def image_ppm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import image_stats

    docs = load_table(spark, sf_dir, "documents")
    h = F.expr("length(text) div 12")
    media = docs.filter(F.length("text") >= 12).select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.encode(
                F.concat(
                    F.lit("P6\n4 "), h.cast("string"), F.lit("\n255\n")
                ),
                "UTF-8",
            ),
            F.encode(
                F.expr(
                    "substring(text, 1, 12 * (length(text) div 12))"
                ),
                "UTF-8",
            ),
        ).alias("content"),
    )
    return image_stats(media).select(
        "media_id",
        "format",
        "width",
        "height",
        "n_pixels",
        "mean_r",
        "mean_g",
        "mean_b",
    )
