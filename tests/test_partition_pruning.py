"""Partition pruning: a filter on the partition key must prune directories
at planning time (PartitionFilters + PartitionCount), not scan-and-discard.
This is the data-skipping lever the silver layer's country=/state= layout
exists for (SURVEY.md §1.1, §4.2) — at 100 TB it is the difference between
reading one partition and reading the lake."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.layers import write_layer


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "events_by_type")
    from inbev_data_engineering_case_spark.sources.readers import read_events

    write_layer(
        read_events(spark, "/root/testdata/sf0.001"),
        path,
        partition_keys=["event_type"],
    )
    return path


def test_partition_filter_prunes_directories(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    n_types = df.select("event_type").distinct().count()
    assert n_types > 1  # layout actually fans out

    q = df.filter(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # attribute names carry expression ids in the plan string (event_type#14)
    assert re.search(r"PartitionFilters: \[.*event_type#\d+ = click\)", plan), plan
    # proof of pruning: execute, then read the scan's numFiles metric —
    # exactly one of the N partition directories' files was opened
    # (DataFrame.inputFiles() would NOT show this: it ignores the filter)
    assert len(q.collect()) > 0
    scan = q._jdf.queryExecution().executedPlan().collectLeaves().head()
    n_read = scan.metrics().apply("numFiles").value()
    assert n_read == 1, n_read
    assert len(df.inputFiles()) > 1  # while the table has several files


def test_non_partition_filter_pushes_to_scan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    q = df.filter(F.col("user_id") == 3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # data filter reaches the parquet reader (row-group min/max skipping)
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,3)]" in plan, plan
