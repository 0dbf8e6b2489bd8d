from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    from datalakeingestion_spark.session import get_spark

    # Point the session warehouse (saveAsTable targets) and Derby's
    # system home at a per-session tmp dir: no test may depend on — or
    # leave behind — checkout state (a stale spark-warehouse/ from an
    # earlier run previously broke bucketed-table rebuilds with
    # LOCATION_ALREADY_EXISTS). Static confs, so they must be set
    # before the first session is built.
    scratch = tmp_path_factory.mktemp("spark-scratch")
    return get_spark(
        app_name="dli-tests",
        cpus=8,
        extra_conf={
            "spark.sql.warehouse.dir": str(scratch / "warehouse"),
            "spark.driver.extraJavaOptions": (
                f"-Dderby.system.home={scratch / 'derby'}"
                f" -Dderby.stream.error.file={scratch / 'derby' / 'derby.log'}"
            ),
        },
    )


def make_duck(sf_dir: str):
    """DuckDB connection with the fixture tables registered as views —
    mirrors the driver's oracle setup."""
    import duckdb

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, type-normalized, row-sorted frame for exact
    comparison (stricter than the driver's value hash: exact equality)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            arr = s.astype("float64").to_numpy(copy=True)
            # The external driver hashes the FORMATTED value, where
            # -0.0 != 0.0 even though they compare == equal. Displace
            # negative zero to the nearest representable negative so the
            # local gate is exactly as strict (both-sides -0.0 still
            # matches; a -0.0 vs +0.0 split fails as it would there).
            arr[np.signbit(arr) & (arr == 0.0)] = -5e-324
            df[c] = arr
        else:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="session")
def registry_frames(spark):
    """Every registered query built ONCE at sf0.001 (r13, suite wall
    time): ``fn()`` assembly — where connected-components loops, IVF
    training and graph sweeps eagerly execute — is the expensive half
    of a registry sweep (~4 min serial), and both the cartesian-product
    net (test_plans) and the array/map schema net (test_parity) only
    need the built DataFrame, so they share one build instead of paying
    two.

    Built with 8 DRIVER THREADS (~160 s serial -> the jobs overlap; the
    Spark scheduler is thread-safe and every fn() is self-contained:
    per-call tempdirs, no catalog tables, the one temp view registers
    identical content). Any per-query failure is retried SERIALLY so a
    hypothetical thread-interaction flake can never fail the suite —
    only a real, reproducible build error surfaces.
    """
    from concurrent.futures import ThreadPoolExecutor

    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    names = list(REGISTRY)

    def build(name: str):
        return REGISTRY[name].fn(spark, SF_SMALL)

    frames = {}
    with ThreadPoolExecutor(max_workers=8) as ex:
        futures = {name: ex.submit(build, name) for name in names}
        retry = []
        for name, fut in futures.items():
            try:
                frames[name] = fut.result()
            except Exception:
                retry.append(name)
    for name in retry:  # serial retry — a real error reproduces here
        frames[name] = build(name)
    return frames


def assert_matches_oracle(spark_df, duck_con, oracle: str, name: str = "?"):
    # run the DuckDB oracle CONCURRENTLY with the Spark action (r13 suite
    # wall): duckdb releases the GIL while executing, and nothing else
    # touches the connection until fut.result(), so the two engines'
    # single-threaded-per-test costs overlap instead of adding
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(lambda: duck_con.execute(oracle).df())
        actual = canonicalize(spark_df.toPandas())
        expected = canonicalize(fut.result())
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    pd.testing.assert_frame_equal(actual, expected, check_exact=True, obj=name)
