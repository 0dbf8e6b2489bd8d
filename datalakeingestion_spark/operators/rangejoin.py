"""Bucketed interval (range) join — point-in-interval matching at scale.

The reference has no range join (SURVEY.md §2.4 — its only join-shaped
logic is filter-per-key loops); this is a greenfield operator for the
time-correlation queries a lake engine is expected to run ("events within
5 minutes of an error", "follow-ups within an hour of a signup").

Why not a plain ``left.join(right, point >= start & point < end)``:
without an equi-join key Spark can only plan a BroadcastNestedLoopJoin
(or a cartesian product) for a pure range predicate — O(|L|·|R|) row
comparisons, which is exactly the quadratic blow-up that cannot survive a
100 TB fact table. Even with AQE there is no shuffle key to parallelize
over.

The scalable formulation turns the range predicate into an equi join:

1. pick a bucket width ``w`` ≥ the maximum interval span;
2. each RIGHT interval [start, end) explodes to the (at most 2 when
   span ≤ w) buckets it overlaps: floor(start/w) … floor((end-1)/w);
3. each LEFT point lands in exactly ONE bucket floor(point/w);
4. equi-join on (keys…, bucket) — a plain shuffled hash / sort-merge
   join — then apply the exact range predicate as a residual filter.

Because the left point is in exactly one bucket, every qualifying
(left, right) pair meets in exactly one bucket: no duplicate pairs, no
post-join dedup. The shuffle key is (keys…, bucket) so time spreads the
load even when a single logical key is hot; total shuffled volume is
|L| + ~2·|R| rows instead of |L|·|R| comparisons.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _reject_reserved(df: DataFrame, names: Sequence[str], side: str) -> None:
    """withColumn silently REPLACES an existing column, so a caller column
    named like one of our scratch columns would be overwritten and dropped
    from the output — fail loudly instead (rename/alias first)."""
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"interval join: {side} input already has reserved scratch "
            f"column(s) {clash}; rename them before joining"
        )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: Column,
    right_start: Column,
    right_end: Column,
    bucket_width_us: int,
    keys: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Join each ``left`` row to every ``right`` row whose half-open
    interval ``[right_start, right_end)`` contains ``left_point``.

    ``left_point`` (an expression over ``left``) and ``right_start`` /
    ``right_end`` (expressions over ``right``) must yield epoch
    MICROSECONDS (bigint). ``bucket_width_us`` must be ≥ the largest
    interval span or matches crossing more than one bucket boundary would
    be lost — enforced with a runtime check compiled into the row
    pipeline (a violating row raises, rather than silently dropping
    matches). ``keys`` is an optional list of (left_col, right_col)
    equality pairs joined alongside the bucket.

    Returns ``left.columns + right.columns`` for each qualifying pair;
    column-name collisions are the caller's problem (select/alias first),
    as with a plain ``DataFrame.join``.
    """
    if bucket_width_us <= 0:
        raise ValueError("bucket_width_us must be positive")
    w = int(bucket_width_us)
    _reject_reserved(left, ("__pt", "__lbucket"), "left")
    _reject_reserved(right, ("__iv_s", "__iv_e", "__rbucket", "__bucket"), "right")

    # Materialize the point/interval expressions as side-tagged columns
    # BEFORE the join so the residual predicate resolves unambiguously
    # even when both inputs share column names (e.g. a self join).
    l = left.withColumn("__pt", left_point.cast("long"))
    r = right.withColumn("__iv_s", right_start.cast("long")).withColumn(
        "__iv_e", right_end.cast("long")
    )
    # empty/inverted intervals match nothing by definition — drop them
    # up front (otherwise sequence(start, start-1) explodes them into a
    # DESCENDING junk-bucket pair the residual filter then discards)
    r = r.filter(F.col("__iv_e") > F.col("__iv_s"))

    # Guard: intervals wider than one bucket would need to explode into
    # >2 buckets; raise_error keeps the check distributed (no extra
    # action) while making violations loud instead of silently wrong.
    span_ok = (F.col("__iv_e") - F.col("__iv_s")) <= F.lit(w)
    checked_start = F.when(span_ok, F.col("__iv_s")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval span exceeds bucket width: "),
                (F.col("__iv_e") - F.col("__iv_s")).cast("string"),
            )
        )
    )
    r = r.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(checked_start / w),
                # end is EXCLUSIVE: a bucket-aligned end must not spill an
                # extra (empty) bucket — hence (end - 1).
                F.floor((F.col("__iv_e") - 1) / w),
            )
        ),
    ).withColumnRenamed("__bucket", "__rbucket")
    l = l.withColumn("__lbucket", F.floor(F.col("__pt") / w))

    cond = F.col("__lbucket") == F.col("__rbucket")
    for lc, rc in keys:
        cond = cond & (l[lc] == r[rc])
    joined = l.join(r, cond, "inner").filter(
        (F.col("__pt") >= F.col("__iv_s")) & (F.col("__pt") < F.col("__iv_e"))
    )
    return joined.drop("__pt", "__iv_s", "__iv_e", "__lbucket", "__rbucket")


def interval_join_multires(
    left: DataFrame,
    right: DataFrame,
    left_point: Column,
    right_start: Column,
    right_end: Column,
    base_width_us: int,
    max_span_us: int,
    keys: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """``interval_join`` without the span ≤ width restriction: intervals
    of MIXED sizes each use the tier whose bucket width fits them.

    Tiers double from ``base_width_us`` up to ``max_span_us`` (so
    #tiers = ⌈log2(max_span/base)⌉ + 1). Each RIGHT interval goes to the
    smallest tier whose width ≥ its span — still ≤ 2 buckets there. Each
    LEFT point emits ONE bucket per tier (#tiers rows). The equi join
    runs on (keys…, tier, bucket); a (left, right) pair meets in exactly
    the right's single tier, so no dedup is needed.

    Cost model vs single-resolution: left volume × #tiers (logarithmic in
    the span ratio) instead of right volume × (max_span/width) — the
    difference between 5 tier copies and a 32-bucket explosion when spans
    range over 32× the smallest. A span > ``max_span_us`` raises (same
    loud-not-wrong contract as ``interval_join``).
    """
    if base_width_us <= 0 or max_span_us < base_width_us:
        raise ValueError("need 0 < base_width_us <= max_span_us")
    _reject_reserved(left, ("__pt", "__lt"), "left")
    _reject_reserved(right, ("__iv_s", "__iv_e", "__tier", "__rbucket"), "right")
    widths = [base_width_us]
    while widths[-1] < max_span_us:
        widths.append(widths[-1] * 2)
    n_tiers = len(widths)

    l = left.withColumn("__pt", left_point.cast("long"))
    r = right.withColumn("__iv_s", right_start.cast("long")).withColumn(
        "__iv_e", right_end.cast("long")
    )
    # see interval_join: empty/inverted intervals match nothing
    r = r.filter(F.col("__iv_e") > F.col("__iv_s"))

    span = F.col("__iv_e") - F.col("__iv_s")
    # smallest tier whose width >= span; raise on span > max tier
    tier = F.lit(None).cast("int")
    for t in range(n_tiers - 1, -1, -1):
        tier = F.when(span <= widths[t], F.lit(t)).otherwise(tier)
    tier = F.coalesce(
        tier,
        F.raise_error(
            F.concat(
                F.lit("interval_join_multires: span exceeds max_span_us: "),
                span.cast("string"),
            )
        ).cast("int"),
    )
    r = r.withColumn("__tier", tier)
    width_of = F.element_at(
        F.array(*[F.lit(w).cast("long") for w in widths]), F.col("__tier") + 1
    )
    r = r.withColumn(
        "__rbucket",
        F.explode(
            F.sequence(
                F.floor(F.col("__iv_s") / width_of),
                F.floor((F.col("__iv_e") - 1) / width_of),
            )
        ),
    )

    l = l.withColumn(
        "__lt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("int").alias("tier"),
                        F.floor(F.col("__pt") / widths[t]).alias("bucket"),
                    )
                    for t in range(n_tiers)
                ]
            )
        ),
    )

    cond = (F.col("__lt.tier") == F.col("__tier")) & (
        F.col("__lt.bucket") == F.col("__rbucket")
    )
    for lc, rc in keys:
        cond = cond & (l[lc] == r[rc])
    joined = l.join(r, cond, "inner").filter(
        (F.col("__pt") >= F.col("__iv_s")) & (F.col("__pt") < F.col("__iv_e"))
    )
    return joined.drop("__pt", "__iv_s", "__iv_e", "__lt", "__tier", "__rbucket")
