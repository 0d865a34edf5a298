"""Mimic the driver's correctness gate: run each __spark_entry__ query on
Spark and its oracle SQL on DuckDB over the same parquet, compare row count,
schema-ish, and order-insensitive values (exact after column-name sort)."""

from __future__ import annotations

import math

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

# default sf0.001 keeps the suite fast; the driver gates at sf0.01 —
# override with ORACLE_SF_DIR to validate at that scale
SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
# data-dependent oracles (trained IVF centroids, PNG expected rows) derive
# their literals from the parquet at this path — pin them to the same scale
# the Spark side queries
os.environ["ORACLE_SF_DIR"] = SF_DIR
TABLES = [
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
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    spark_df = q(spark, SF_DIR).toPandas()
    duck_df = duck.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(spark_df) == len(duck_df), f"{name}: row count mismatch"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), f"{name}: columns"
    a, b = _norm(spark_df), _norm(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
