"""Driver-contract guard: exercise __spark_entry__ the way the grading
driver does — a VANILLA SparkSession (none of the engine's session
defaults: ANSI mode on, default timezone, no nanosAsLong preset) — so any
query that silently depends on engine session tuning fails here first.

Only spark.sql.shuffle.partitions is lowered (pure speed knob for the
200-partition default; it cannot mask a correctness dependency).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vanilla_spark():
    # NOT conftest's engine session: no UTC pin, no Arrow, no nanosAsLong
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("entry-contract")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_entry_returns_rows(vanilla_spark):
    df = entrymod.entry(vanilla_spark)
    assert len(df.collect()) > 0


def test_oracle_keys_subset_of_queries(vanilla_spark):
    qs, sql = entrymod.queries(), entrymod.oracle_sql()
    assert set(sql) <= set(qs)
    assert len(qs) >= 50


def test_every_query_runs_on_vanilla_session(vanilla_spark):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(vanilla_spark, SF)
            assert df.count() >= 0
            assert df.columns  # stable, named schema
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__} {str(e)[:120]}")
    assert not failures, "\n".join(failures)
