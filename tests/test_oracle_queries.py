"""Runs the full queries()/oracle_sql() battery against DuckDB at sf0.001 —
the same comparison the driver performs at sf0.01 (tests/oracle_check.py)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    from tests.oracle_check import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _registry():
    from german_newspaper_crawler_spark.plans.queries import REGISTRY

    return REGISTRY


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_query_matches_oracle(spark, duck, name):
    from tests.oracle_check import compare

    spec = _registry()[name]
    df = spec.spark(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check
        return
    duck_pdf = duck.sql(spec.oracle).df()
    assert compare(name, df, duck_pdf), f"{name} diverged from DuckDB oracle"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"source", "lang", "n_docs", "avg_quality", "avg_tokens"}
