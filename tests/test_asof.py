"""Unit tests for the as-of and range join operators on fixtures with
hand-computed answers (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.operators.asof import (
    asof_join_backward,
    range_join_bands,
)


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 0, minute)


@pytest.mark.slow
def test_asof_backward_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(20)), (1, _ts(2)), (2, _ts(10))],
        ["key", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(3), "a"), (1, _ts(10), "b"), (3, _ts(0), "z")],
        ["key", "rts", "tag"],
    )
    out = {
        (r["key"], r["ts"].minute): r["tag"]
        for r in asof_join_backward(
            left, right, "key", "ts", "rts", ["tag"]
        ).collect()
    }
    assert out[(1, 5)] == "a"  # latest right at/before :05 is :03
    assert out[(1, 20)] == "b"  # :10 supersedes :03
    assert out[(1, 2)] is None  # nothing at/before :02
    assert out[(2, 10)] is None  # key has no right rows at all


def test_asof_backward_inclusive_tie(spark):
    left = spark.createDataFrame([(1, _ts(10))], ["key", "ts"])
    right = spark.createDataFrame([(1, _ts(10), "x")], ["key", "rts", "tag"])
    rows = asof_join_backward(left, right, "key", "ts", "rts", ["tag"]).collect()
    assert rows[0]["tag"] == "x"  # equal timestamps match (ts >= rts)


def test_range_join_bands(spark):
    fact = spark.createDataFrame(
        [(1, 50.0), (2, 150.0), (3, 100.0), (4, 999.0)], ["id", "v"]
    )
    bands = spark.createDataFrame(
        [("low", 0, 100), ("high", 100, 200)], ["band", "lo", "hi"]
    )
    out = {
        r["id"]: r["band"]
        for r in range_join_bands(fact, "v", bands).collect()
    }
    assert out == {1: "low", 2: "high", 3: "high"}  # 4 unmatched; hi exclusive
