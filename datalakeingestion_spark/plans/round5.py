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


_SWEEP_CONFIGS = ((2, 8), (4, 4), (8, 2))  # (bands, rows): b*r = 16 perms


def _sweep_oracle() -> str:
    """DuckDB twin of the one-pass (b x r) LSH calibration sweep."""
    from ..operators import dedup as dd
    from .llm import _h32_sql, _shingles_sql

    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {dd.MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(dd.MINHASH_A, dd.MINHASH_B))
    )
    band_rows = []
    for b, r in _SWEEP_CONFIGS:
        for j in range(b):
            cols = [f"mh{j * r + k}" for k in range(r)]
            sig = " || ',' || ".join(cols)
            band_rows.append(
                f"SELECT '{b}x{r}' AS config, doc_id, {j} AS band_id, "
                f"{sig} AS band_sig FROM sig"
            )
    bands = "\n         UNION ALL ".join(band_rows)
    return f"""
    WITH sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s
                FROM documents),
    th AS (SELECT doc_id, {_h32_sql('s')} AS h FROM sh),
    sig AS (SELECT doc_id, {mins} FROM th GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (SELECT DISTINCT b1.config AS config, b1.doc_id AS doc_id_a,
                    b2.doc_id AS doc_id_b
             FROM bands b1 JOIN bands b2
               ON b1.config = b2.config AND b1.band_id = b2.band_id
              AND b1.band_sig = b2.band_sig AND b1.doc_id < b2.doc_id),
    up AS (SELECT DISTINCT doc_id_a, doc_id_b FROM cand),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT u.doc_id_a, u.doc_id_b, COUNT(*) AS i
              FROM up u
              JOIN sh t1 ON t1.doc_id = u.doc_id_a
              JOIN sh t2 ON t2.doc_id = u.doc_id_b AND t2.s = t1.s
              GROUP BY u.doc_id_a, u.doc_id_b),
    ver AS (SELECT inter.doc_id_a, inter.doc_id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.doc_id_a
            JOIN sizes sb ON sb.doc_id = inter.doc_id_b
            WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5)
    SELECT c.config,
           COUNT(*)::BIGINT AS n_candidates,
           SUM(CASE WHEN v.doc_id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_true,
           round(SUM(CASE WHEN v.doc_id_a IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS lsh_precision
    FROM cand c
    LEFT JOIN ver v
      ON v.doc_id_a = c.doc_id_a AND v.doc_id_b = c.doc_id_b
    GROUP BY c.config
    """


@register(
    "lsh_threshold_sweep",
    oracle=_sweep_oracle(),
    doc="One-pass (bands x rows) LSH calibration sweep — the grid "
    "companion of lsh_candidate_precision: candidate volume, verified "
    "true positives and precision for (2x8, 4x4, 8x2) over the SAME 16 "
    "minhash perms, so choosing a banding config costs ONE corpus scan "
    "+ one shared Jaccard verify instead of three dedup dry-runs. "
    "Spark: one signature groupBy, per-config band frames unioned "
    "before a single (config, band) equi-join; exact verification runs "
    "once on the DISTINCT union of candidate pairs across configs and "
    "joins back per config.",
)
def lsh_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    # intentional session-lifetime persists (lazy result; LRU-evictable)
    # — see dedup.lsh_candidate_report for the policy
    sh = dd._shingle_table(docs, "text", "doc_id", 3).persist()
    sig = dd._signatures_from_shingles(sh)
    frames = []
    for b, r in _SWEEP_CONFIGS:
        for j in range(b):
            cols = [F.col(f"mh{j * r + k}") for k in range(r)]
            frames.append(
                sig.select(
                    F.lit(f"{b}x{r}").alias("config"),
                    "doc_id",
                    F.lit(j).alias("band_id"),
                    F.concat_ws(",", *cols).alias("band_sig"),
                )
            )
    bands = frames[0]
    for fr in frames[1:]:
        bands = bands.unionByName(fr)
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.config") == F.col("b2.config"))
            & (F.col("b1.band_id") == F.col("b2.band_id"))
            & (F.col("b1.band_sig") == F.col("b2.band_sig"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.config").alias("config"),
            F.col("b1.doc_id").alias("doc_id_a"),
            F.col("b2.doc_id").alias("doc_id_b"),
        )
        .distinct()
        .persist()
    )
    upairs = cand.select("doc_id_a", "doc_id_b").distinct()
    ver = dd._jaccard_verify(upairs, sh, 0.5).select(
        "doc_id_a", "doc_id_b", F.lit(1).alias("_true")
    )
    return (
        cand.join(ver, ["doc_id_a", "doc_id_b"], "left")
        .groupBy("config")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.coalesce(F.col("_true"), F.lit(0)))
            .cast("long")
            .alias("n_true"),
            F.round(
                F.sum(F.coalesce(F.col("_true"), F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("lsh_precision"),
        )
    )


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
           -- exact integer HALF-UP at 6 dp, mirroring the kernel's
           -- (s*2e6 + n) // (2n) / 1e6 — double round() can land on the
           -- other side of a tie when s/n is not representable
           CAST((SUM(CASE WHEN ch = 0 THEN val END) * 2000000 + 4 * h)
                // (8 * h) AS DOUBLE) / 1000000.0 AS mean_r,
           CAST((SUM(CASE WHEN ch = 1 THEN val END) * 2000000 + 4 * h)
                // (8 * h) AS DOUBLE) / 1000000.0 AS mean_g,
           CAST((SUM(CASE WHEN ch = 2 THEN val END) * 2000000 + 4 * h)
                // (8 * h) AS DOUBLE) / 1000000.0 AS mean_b
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
