"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``inbev_data_engineering_case_spark.queries.CATALOG`` —
every implemented operator from SURVEY.md §2 (plus the §7 / training-data
extensions) registers there with its Spark callable and DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from inbev_data_engineering_case_spark.queries import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's gold aggregation, OP-17, applied to
    the star schema) on sf0.001; driver checks rows > 0."""
    return CATALOG["q_gold_agg"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; each callable is
    ``(spark, sf_dir) -> DataFrame`` with aliases matching ``oracle_sql``."""
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; queries whose semantics are not
    SQL-expressible (oracle=None in the catalog) are omitted → the driver
    records its weaker rows-only check for those."""
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
