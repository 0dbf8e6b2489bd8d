"""Property-based checks for the tricky semantics (SURVEY.md §5):
watermark bump, partition-config parsing, coalesce OR-rewrite exactness,
bucket boundaries, portable-hash cross-engine parity.

Hypothesis drives the pure driver-side functions; the Spark-side
properties run as ONE vectorized job over a generated batch (hypothesis-
per-example Spark jobs would be pathologically slow).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datalakeingestion_spark.config.partition_spec import parse_partition_config
from datalakeingestion_spark.ingest.watermark import bump_watermark
from datalakeingestion_spark.operators.relational import coalesce_range_filter

_TS = st.datetimes(
    min_value=datetime(1900, 1, 2), max_value=datetime(2260, 12, 31)
)


@pytest.mark.smoke
@given(_TS)
@settings(max_examples=200, deadline=None)
def test_bump_is_strictly_later_seconds(ts):
    s = ts.strftime("%Y-%m-%d %H:%M:%S")
    bumped = bump_watermark(s, integer_watermark=False)
    assert datetime.strptime(bumped, "%Y-%m-%d %H:%M:%S") == (
        ts.replace(microsecond=0) + timedelta(seconds=1)
    )
    assert bumped > s  # lexical monotonicity in the fixed format


@given(_TS, st.integers(min_value=1, max_value=999_999))
@settings(max_examples=200, deadline=None)
def test_bump_micro_precision(ts, micros):
    s = ts.replace(microsecond=micros).strftime("%Y-%m-%d %H:%M:%S.%f")
    bumped = bump_watermark(s, integer_watermark=False)
    got = datetime.strptime(bumped, "%Y-%m-%d %H:%M:%S.%f")
    assert got == ts.replace(microsecond=micros) + timedelta(microseconds=1)


@given(st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_bump_integer(v):
    assert bump_watermark(str(v), integer_watermark=True) == str(v + 1)


@given(
    st.sampled_from(["time-based", "non-time-based"]),
    st.sampled_from(["YYYY", "YYYYMM", "YYYYMMDD", "1M", "100K", "1K"]),
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll",)), min_size=1, max_size=12
    ),
)
@settings(max_examples=100, deadline=None)
def test_partition_config_parse_total(kind, fmt, col):
    raw = (
        f"({{'partition_seq_no': 1, 'partition_column_type': '{kind}', "
        f"'partition_column': '{col}', 'partition_format': '{fmt}'}},)"
    )
    time_fmt = fmt in ("YYYY", "YYYYMM", "YYYYMMDD")
    valid = (kind == "time-based") == time_fmt
    if valid:
        spec = parse_partition_config(raw)
        assert spec.column == col and spec.kind == kind and spec.fmt == fmt
    else:
        with pytest.raises(ValueError):
            parse_partition_config(raw)


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_partition_config_never_crashes_unexpectedly(raw):
    # total function: either a spec, None, or ValueError — nothing else
    try:
        out = parse_partition_config(raw)
    except ValueError:
        return
    assert out is None or out.column


def test_coalesce_or_rewrite_exactness(spark):
    """coalesce_range_filter ≡ plain coalesce BETWEEN for arbitrary nullable
    pairs — the OR prefilter over-selects but the residual restores
    exactness (one vectorized job over 5000 seeded random rows)."""
    rng = random.Random(42)
    rows = []
    for i in range(5000):
        a = rng.randrange(0, 100) if rng.random() < 0.7 else None
        b = rng.randrange(0, 100) if rng.random() < 0.9 else None
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "id long, a long, b long")
    lo, hi = F.lit(30), F.lit(60)
    ours = coalesce_range_filter(df, ["a", "b"], lo, hi)
    plain = df.filter(F.coalesce(F.col("a"), F.col("b")).between(lo, hi))
    assert sorted(r.id for r in ours.collect()) == sorted(
        r.id for r in plain.collect()
    )
    # and the prefilter really is a superset (over-selection exists)
    prefilter_only = df.filter(
        F.col("a").between(lo, hi) | F.col("b").between(lo, hi)
    )
    assert prefilter_only.count() >= ours.count()


def test_bucket_boundaries_vectorized(spark):
    """int_bucket floor semantics across boundaries incl. the reference's
    exact 1M divisor (FIXTURES.md B4 boundary values)."""
    from datalakeingestion_spark.functions.buckets import date_bucket, int_bucket

    vals = [0, 1, 999, 1000, 1001, 999_999, 1_000_000, 1_000_001, 2**40]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r.b for r in df.select(int_bucket("v", 1_000_000).alias("b")).collect()
    ]
    assert got == [v // 1_000_000 for v in vals]

    rng = random.Random(7)
    ts_rows = [
        (datetime(1900, 1, 1) + timedelta(seconds=rng.randrange(0, 4_000_000_000)),)
        for _ in range(500)
    ]
    tdf = spark.createDataFrame(ts_rows, "t timestamp")
    got = [
        r.p for r in tdf.select(date_bucket(F.col("t"), "YYYYMM").alias("p")).collect()
    ]
    want = [r[0].strftime("%Y%m") for r in ts_rows]
    assert got == want


def test_floor_div_matches_python_floor_for_negatives(spark):
    """floor_div must floor toward −∞ like Python // and DuckDB // —
    Spark's `div` truncates toward zero, which shifts pre-1970
    (negative-epoch) timestamps into the wrong day/week bucket."""
    from datalakeingestion_spark.functions.buckets import (
        epoch_bucket,
        floor_div,
    )

    vals = [-604801, -604800, -604799, -1, 0, 1, 604799, 604800, 604801]
    vals += [random.Random(13).randrange(-10**12, 10**12) for _ in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for d in (7, 86400, 604800):
        got = [
            r.b
            for r in df.select(floor_div("v", d).alias("b")).collect()
        ]
        assert got == [v // d for v in vals], d
    # div truncates: prove floor_div actually differs where it must
    trunc = [
        r.b for r in df.selectExpr("v div 604800 as b").collect()
    ]
    assert trunc != [v // 604800 for v in vals]

    # epoch_bucket: timestamp → floor week, pre-1970 included
    ts = spark.createDataFrame(
        [(datetime(1969, 12, 28, 23, 59, 59),), (datetime(1970, 1, 1),)],
        "t timestamp",
    )
    wks = [
        r.w
        for r in ts.select(epoch_bucket("t", 604800).alias("w")).collect()
    ]
    assert wks == [-1, 0]


def test_portable_hash_cross_engine(spark):
    """portable_hash32/60 must agree with the DuckDB hex-cast formula for
    arbitrary strings — the foundation of every oracle-checkable sketch."""
    import duckdb

    from datalakeingestion_spark.functions.hashing import (
        portable_hash32,
        portable_hash60,
    )

    rng = random.Random(13)
    strings = [
        "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(0, 30)))
        for _ in range(300)
    ] + ["", " ", "ünïcode ❄", "a" * 1000]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: (r.h32, r.h60)
        for r in df.select(
            "s",
            portable_hash32("s").alias("h32"),
            portable_hash60("s").alias("h60"),
        ).collect()
    }
    con = duckdb.connect()
    for s in strings:
        h32, h60 = con.execute(
            "SELECT ('0x'||substr(md5(?),1,8))::BIGINT, "
            "('0x'||substr(md5(?),1,15))::BIGINT",
            [s, s],
        ).fetchone()
        assert got[s] == (h32, h60), repr(s)


def test_retry_semantics():
    from datalakeingestion_spark.utils import with_retries

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert with_retries(flaky, attempts=3, backoff_seconds=0) == "ok"
    assert len(calls) == 3

    def always_fails():
        raise ValueError("permanent")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="permanent"):
        with_retries(always_fails, attempts=2, backoff_seconds=0)


def test_section_logger(tmp_path):
    import pytest as _pytest

    from datalakeingestion_spark.utils import section_logger

    log = section_logger("PROCESS", log_dir=str(tmp_path))
    log.info("hello process")
    for h in log.handlers:
        h.flush()
    assert (tmp_path / "process.out").read_text().strip().endswith("hello process")
    with _pytest.raises(ValueError):
        section_logger("NOPE")


def test_connected_components_matches_union_find(spark):
    """Min-label propagation must equal a reference union-find on seeded
    random graphs (mix of chains, cliques, and isolated pairs)."""
    from datalakeingestion_spark.operators.dedup import connected_components

    rng = random.Random(7)
    for trial in range(3):
        pairs = set()
        # random edges over a 60-node id space plus a guaranteed chain
        for _ in range(50):
            a, b = rng.randrange(60), rng.randrange(60)
            if a != b:
                pairs.add((a, b))
        chain_base = 100 + trial * 20
        pairs.update((chain_base + i, chain_base + i + 1) for i in range(6))
        df = spark.createDataFrame(sorted(pairs), ["doc_id_a", "doc_id_b"])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(df, max_iterations=40).collect()
        }

        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in pairs:
            union(a, b)
        want = {x: find(x) for x in parent}
        assert got == want


def test_interval_join_matches_bruteforce_vectorized(spark):
    """One seeded batch, many (width, span-mix) regimes, both operators —
    bucketed and multi-resolution interval joins must equal the O(n·m)
    brute force exactly (hypothesis-per-example Spark jobs are too slow;
    the regimes vary inside one job, per this file's convention)."""
    from datalakeingestion_spark.operators.rangejoin import (
        interval_join,
        interval_join_multires,
    )

    rng = random.Random(42)
    points = [(i, rng.randrange(0, 20_000)) for i in range(250)]
    for width, max_span, use_multires in [
        (1, 1, False),            # degenerate width
        (97, 97, False),          # prime width, bucket-misaligned
        (500, 500, False),
        (100, 6_400, True),       # spans over 64x the base width
        (64, 8_192, True),
    ]:
        intervals = []
        for j in range(120):
            s = rng.randrange(-500, 20_000)  # negatives: pre-range intervals
            span = rng.randrange(0, max_span + 1)  # includes empty
            intervals.append((j, s, s + span))
        l = spark.createDataFrame(points, ["lid", "pt"])
        r = spark.createDataFrame(intervals, ["rid", "s", "e"])
        if use_multires:
            out = interval_join_multires(
                l, r, F.col("pt"), F.col("s"), F.col("e"),
                base_width_us=width, max_span_us=max_span,
            )
        else:
            out = interval_join(
                l, r, F.col("pt"), F.col("s"), F.col("e"), bucket_width_us=width
            )
        got = sorted((row["lid"], row["rid"]) for row in out.collect())
        expected = sorted(
            (i, j) for i, p in points for j, s, e in intervals if s <= p < e
        )
        assert got == expected, (width, max_span, use_multires)


def test_star_contraction_matches_union_find(spark):
    """Large-star/small-star contraction must equal a reference
    union-find on seeded random graphs (same harness as the propagation
    property, different trials)."""
    from datalakeingestion_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(23)
    for trial in range(3):
        pairs = set()
        for _ in range(60):
            a, b = rng.randrange(50), rng.randrange(50)
            if a != b:
                pairs.add((a, b))
        chain_base = 200 + trial * 30
        pairs.update((chain_base + i, chain_base + i + 1) for i in range(9))
        df = spark.createDataFrame(sorted(pairs), ["doc_id_a", "doc_id_b"])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components_star(df, max_iterations=30).collect()
        }

        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in pairs:
            union(a, b)
        want = {x: find(x) for x in parent}
        assert got == want


def test_prefix_filter_lossless_on_random_corpora(spark):
    """AllPairs prefix filtering must equal the brute shingle join on
    seeded random corpora across thresholds — including skewed vocab
    (stopword-heavy docs), tiny docs, and identical docs."""
    from datalakeingestion_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    rng = random.Random(11)
    rows = []
    for i in range(80):
        if i % 10 == 0 and i:
            rows.append((i, rows[i - 1][1]))  # exact copy of predecessor
            continue
        n = rng.choice([3, 5, 12, 30])
        toks = [
            f"s{rng.randrange(4)}" if rng.random() < 0.4 else
            f"r{rng.randrange(500)}"
            for _ in range(n)
        ]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.3, 0.5, 0.8):
        brute = sorted(
            (r.doc_id_a, r.doc_id_b, r.jaccard)
            for r in ngram_jaccard_pairs(df, threshold=t, n=1).collect()
        )
        pref = sorted(
            (r.doc_id_a, r.doc_id_b, r.jaccard)
            for r in jaccard_prefix_join(df, threshold=t, n=1).collect()
        )
        assert pref == brute, f"threshold {t}"
    assert brute, "corpus should contain qualifying pairs"


def test_containment_prefix_lossless_on_random_corpora(spark):
    """The one-sided prefix filter must equal brute-force containment on
    seeded random corpora across thresholds (skewed vocab, tiny docs,
    planted excerpts)."""
    from datalakeingestion_spark.operators.dedup import (
        _shingle_table,
        containment_join,
    )
    from pyspark.sql import functions as F

    rng = random.Random(31)
    rows = []
    for i in range(60):
        n = rng.choice([4, 8, 20, 40])
        toks = [
            f"s{rng.randrange(5)}" if rng.random() < 0.3 else
            f"r{rng.randrange(300)}"
            for _ in range(n)
        ]
        rows.append((i, " ".join(toks)))
    # planted excerpts: doc 100+j = prefix of doc j
    for j in range(5):
        rows.append((100 + j, " ".join(rows[j][1].split()[:6])))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    sh = _shingle_table(df, "text", "doc_id", 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("ida"),
                 F.col("b.doc_id").alias("idb"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("ida"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("idb"), F.col("sz").alias("szb"))
    brute_all = (
        inter.join(sa, "ida").join(sb, "idb")
        .filter((F.col("sza") < F.col("szb"))
                | ((F.col("sza") == F.col("szb"))
                   & (F.col("ida") < F.col("idb"))))
        .select("ida", "idb",
                F.round(F.col("i") / F.col("sza"), 6).alias("c"))
        .collect()
    )
    for t in (0.6, 0.8, 1.0):
        brute = sorted((r.ida, r.idb, r.c) for r in brute_all if r.c >= t)
        got = sorted(
            (r.doc_id_small, r.doc_id_large, r.containment)
            for r in containment_join(df, threshold=t, n=3).collect()
        )
        assert got == brute, f"threshold {t}"
    assert brute, "planted excerpts must qualify at containment 1.0"


def test_mad_histogram_form_equals_sort_reference(spark):
    # one vectorized job over many random groups: the histogram-median
    # MAD must equal the brute-force sorted-python computation exactly
    from decimal import Decimal

    from datalakeingestion_spark.operators.profiling import mad_outliers

    rng = random.Random(11)
    rows = []
    for g in range(12):
        n = rng.randint(1, 40)
        for _ in range(n):
            # 2-dp values incl. heavy ties and planted spikes
            v = rng.choice(
                [rng.randint(0, 500) / 100.0] * 3 + [rng.randint(0, 10_000)]
            )
            rows.append((f"g{g}", float(v)))
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in mad_outliers(df, ["g"], "v").collect()}

    by_g: dict[str, list] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(Decimal(f"{v:.2f}"))
    for g, vs in by_g.items():
        s = sorted(vs)
        n = len(s)
        med = s[(n + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[(n + 1) // 2 - 1]
        out = sum(1 for v in vs if abs(v - med) > 3 * mad)
        r = got[g]
        assert r["n"] == n, g
        assert Decimal(r["median"]) == med, g
        assert Decimal(r["mad"]) == mad, g
        assert r["n_outliers"] == out, g


def test_compaction_plan_prefix_invariants(spark):
    # every closed merge group's total is >= target (pack-with-overflow)
    # and group ids are contiguous from 0 in sort order
    from datalakeingestion_spark.operators.layout import compaction_plan

    rng = random.Random(5)
    files = [(f"f{i:04d}", rng.randint(1, 400)) for i in range(200)]
    target = 1000
    plan = sorted(
        (
            (r["path"], r["bytes"], r["merge_group"])
            for r in compaction_plan(
                spark.createDataFrame(files, "path string, bytes long"),
                ["path"], "bytes", target, "path",
            ).collect()
        )
    )
    # groups follow sort order and are contiguous
    groups = [g for _, _, g in plan]
    assert groups == sorted(groups)
    assert sorted(set(groups)) == list(range(max(groups) + 1))
    # pack-with-overflow invariant: by the time group g closes, the
    # CUMULATIVE bytes through it have crossed (g+1)·target (a single
    # group's own total may be smaller when the previous group's last
    # file overflowed past the boundary)
    totals: dict[int, int] = {}
    for _, b, g in plan:
        totals[g] = totals.get(g, 0) + b
    cum = 0
    for g in range(max(groups) + 1):
        cum += totals[g]
        if g < max(groups):
            assert cum >= (g + 1) * target, (g, cum)


# ---------------------------------------------------------------------------
# xlsx codec round-trip (pure driver-side — no Spark job per example)
# ---------------------------------------------------------------------------

_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        # control chars (incl. \x00 and \r) round-trip via OOXML
        # _xHHHH_ escaping; only unpaired surrogates are unwritable
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=40,
    ),
)


@given(
    header=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    rows=st.lists(st.lists(_cell, min_size=1, max_size=8), max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_xlsx_roundtrip_property(tmp_path_factory, header, rows):
    """write_xlsx -> read_xlsx is the identity on (header, rows) up to
    the documented type model: bools stay bool, ints stay int,
    integral floats collapse to int (Excel number cells have no
    int/float distinction), other floats repr-roundtrip, strings stay
    verbatim, None cells stay None; rows are padded/truncated to header
    width."""
    import os

    from datalakeingestion_spark.config.xlsx import read_xlsx, write_xlsx

    width = len(header)
    norm_rows = [r[:width] + [None] * (width - len(r)) for r in rows]
    d = tmp_path_factory.mktemp("xlsx")
    p = os.path.join(str(d), "t.xlsx")
    write_xlsx(p, header, norm_rows)
    got_header, got_rows = read_xlsx(p)
    assert got_header == header
    assert len(got_rows) == len(norm_rows)

    def expected(v):
        if isinstance(v, bool) or v is None or isinstance(v, str):
            return v
        if isinstance(v, int):
            return v
        if isinstance(v, float) and v.is_integer():
            return int(v)
        return v

    for got, want in zip(got_rows, norm_rows):
        assert got == [expected(v) for v in want], (got, want)


# ---------------------------------------------------------------------------
# image codec round-trip (pure numpy — no Spark job per example)
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    top_down=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_image_codec_roundtrip_property(w, h, seed, top_down):
    """encode_ppm -> decode_image is the identity on any (H, W, 3)
    uint8 array, and the BMP24 parser recovers exact pixels for both
    bottom-up and top-down row orders at every width (stride padding
    0-3 bytes)."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fmt, gw, gh, got = decode_image(encode_ppm(px))
    assert (fmt, gw, gh) == ("ppm", w, h)
    assert np.array_equal(got, px)

    # hand-assemble a BMP24 with the chosen row order
    stride = (w * 3 + 3) // 4 * 4
    rows_iter = px if top_down else px[::-1]
    raster = bytearray()
    for row in rows_iter:
        line = bytearray(row[:, ::-1].tobytes())
        line += b"\x00" * (stride - len(line))
        raster += line
    data_off = 54
    hdr = (
        b"BM"
        + (data_off + len(raster)).to_bytes(4, "little")
        + b"\x00" * 4
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    fmt, gw, gh, got = decode_image(bytes(hdr) + bytes(raster))
    assert (fmt, gw, gh) == ("bmp", w, h)
    assert np.array_equal(got, px)


@given(data=st.binary(max_size=200), prefix=st.sampled_from(
    [b"", b"P6", b"P5", b"P6\n", b"BM", b"P6 # ", b"P6\n999999 999999\n255\n"]
))
@settings(max_examples=200, deadline=None)
def test_decode_image_total_on_garbage(data, prefix):
    """decode_image is TOTAL over arbitrary bytes: it either decodes or
    raises exactly ValueError (recognized-but-corrupt) /
    NotImplementedError (needs a codec) — never IndexError,
    ZeroDivision, struct errors, or numpy reshape crashes. This is the
    quarantine contract image_stats relies on to survive a corrupt
    corpus."""
    from datalakeingestion_spark.operators.multimodal import decode_image

    blob = prefix + data
    try:
        out = decode_image(blob)
    except (ValueError, NotImplementedError):
        return
    # decoded: the tuple contract must hold
    fmt, w, h, px = out
    assert fmt in ("ppm", "pgm", "bmp")
    assert w >= 1 and h >= 1
    assert px.shape == (h, w, 3)


def test_keyed_prefix_sum_fuzz_matches_serial(spark):
    """Hypothesis fuzz of keyed_prefix_sum against a serial Python
    reference: ONE vectorized Spark job over a hypothesis-generated
    batch of (key, ord, weight) rows — nullable keys, negative and zero
    weights, duplicate keys across range-bucket boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datalakeingestion_spark.operators.packing import keyed_prefix_sum

    rows_strategy = st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"])),
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=-(10**3), max_value=10**3),
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: (t[0], t[1]),  # (key, ord) total order
    )

    @given(rows_strategy)
    @settings(max_examples=12, deadline=None)
    def check(rows):
        df = spark.createDataFrame(rows, "k string, ord long, w long")
        got = {
            (r.k, r.ord): r.cum
            for r in keyed_prefix_sum(
                df, ["k"], ["ord"], "w", num_partitions=5
            ).collect()
        }
        want = {}
        running = {}
        for k, o, w in sorted(
            rows, key=lambda t: (t[0] is not None, t[0] or "", t[1])
        ):
            running[k] = running.get(k, 0) + w
            want[(k, o)] = running[k]
        assert got == want

    check()


@given(
    data=st.binary(max_size=300),
    mutations=st.lists(
        st.tuples(st.integers(min_value=0, max_value=500),
                  st.integers(min_value=0, max_value=255)),
        max_size=6,
    ),
)
@settings(max_examples=200, deadline=None)
def test_decode_video_total_on_garbage_and_mutations(data, mutations):
    """decode_video is TOTAL over arbitrary bytes AND over random byte
    mutations of a VALID AVI: it either decodes (tuple contract holds)
    or raises exactly ValueError / NotImplementedError — never
    IndexError, OverflowError, numpy reshape crashes, or an infinite
    chunk-walk. This is the quarantine contract video_stats relies on."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        decode_video,
        encode_avi_rgb24,
    )

    base = encode_avi_rgb24(
        [np.zeros((2, 3, 3), dtype=np.uint8)] * 2, 40_000
    )
    mutated = bytearray(base)
    for pos, val in mutations:
        mutated[pos % len(mutated)] = val

    for blob in (data, b"RIFF" + data, bytes(mutated)):
        try:
            out = decode_video(blob)
        except (ValueError, NotImplementedError):
            continue
        fmt, w, h, micros, frames = out
        assert fmt == "avi" and w >= 1 and h >= 1 and frames
        assert all(f.shape == (h, w, 3) for f in frames)


def test_floor_div_raises_past_double_exact_bound(spark):
    """floor_div's exactness proof relies on IEEE-double division below
    2^53; a 60-bit hash fed through it must raise loudly, never return
    a silently-off bucket."""
    import pytest as _pytest

    from datalakeingestion_spark.functions.buckets import floor_div

    df = spark.createDataFrame([((1 << 60) - 2,)], "v long")
    with _pytest.raises(Exception, match="floor_div"):
        df.select(floor_div("v", 3).alias("b")).collect()
    # just inside the bound still works
    ok = spark.createDataFrame([((1 << 53) - 7,)], "v long")
    assert ok.select(floor_div("v", 7).alias("b")).first()["b"] == (
        ((1 << 53) - 7) // 7
    )
