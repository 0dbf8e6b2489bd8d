"""Z-order layout and data-skipping stats (operators/layout.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.layout import (
    file_minmax_stats,
    morton_code,
    morton_code_sql,
    pruning_stats,
)


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i + 1)
        out |= ((y >> i) & 1) << (2 * i)
    return out


@pytest.mark.smoke
def test_morton_matches_python_and_sql(spark):
    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", morton_code(F.col("x"), F.col("y"), 6)
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pts)
    sql = {
        (x, y): z
        for x, y, z in con.execute(
            f"SELECT x, y, {morton_code_sql('x', 'y', 6)} FROM t"
        ).fetchall()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y, 6) == sql[(x, y)]


def test_morton_is_a_bijection_on_the_grid(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    n = (
        df.select(morton_code(F.col("x"), F.col("y"), 4).alias("z"))
        .distinct()
        .count()
    )
    assert n == 256


def test_zorder_beats_linear_on_2d_box(spark):
    # grid swept in y-major order = "natural" layout; z-order should cut
    # the files scanned for a box selective in BOTH dims
    rows = [(x * 1000 + y, x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "uid long, x long, y long").withColumn(
        "z", morton_code(F.col("x"), F.col("y"), 6)
    )
    box = {"x": (8, 11), "y": (40, 43)}
    lin = file_minmax_stats(df, "uid", ["y", "uid"], ["x", "y"], 128)
    zf = file_minmax_stats(df, "uid", ["z", "uid"], ["x", "y"], 128)
    lin_row = pruning_stats(lin, box, "linear").collect()[0]
    z_row = pruning_stats(zf, box, "zorder").collect()[0]
    assert lin_row["n_files"] == z_row["n_files"] == 32
    assert z_row["files_scanned"] < lin_row["files_scanned"]
    # every matching row must be inside the scanned files in both layouts
    n_match = df.filter(
        (F.col("x").between(8, 11)) & (F.col("y").between(40, 43))
    ).count()
    assert z_row["rows_in_scanned"] >= n_match
    assert lin_row["rows_in_scanned"] >= n_match


def test_file_sizes_are_exact(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(1000)], "uid long, v long")
    stats = file_minmax_stats(df, "uid", ["uid"], ["v"], 300).collect()
    sizes = sorted(r["n_rows"] for r in stats)
    assert sizes == [100, 300, 300, 300]


def test_bad_args_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "uid long, v long")
    with pytest.raises(ValueError):
        file_minmax_stats(df, "uid", ["uid"], ["v"], 0)
    with pytest.raises(ValueError):
        morton_code(F.col("v"), F.col("v"), 0)


def test_compaction_plan_groups_and_clustering(spark):
    from datalakeingestion_spark.operators.layout import compaction_plan

    files = [(f"f{i:03d}", 40) for i in range(25)]  # 1000 bytes total
    df = spark.createDataFrame(files, "path string, bytes long")
    plan = compaction_plan(
        df, order_cols=["path"], bytes_col="bytes",
        target_bytes=200, id_col="path",
    ).collect()
    groups = {}
    for r in plan:
        groups.setdefault(r["merge_group"], []).append(r["path"])
    # 25 * 40 / 200 -> exactly 5 full groups of 5 files
    assert len(groups) == 5
    assert all(len(v) == 5 for v in groups.values())
    # range clustering: group membership follows the sort order
    for g, paths in groups.items():
        assert paths == sorted(paths)
        assert all(
            p < q
            for p in paths
            for h, qs in groups.items() if h > g
            for q in qs
        )


def test_empty_frame_yields_empty_stats(spark):
    df = spark.createDataFrame([], "uid long, v long")
    assert file_minmax_stats(df, "uid", ["uid"], ["v"], 100).count() == 0
