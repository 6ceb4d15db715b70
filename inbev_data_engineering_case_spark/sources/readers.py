"""Typed readers (OP-03/04/05) over the lake and the synthetic star schema.

Always explicit-schema: at the 100 TB design point schema inference is an
extra full pass and a type-drift hazard (SURVEY.md §4.3-3). CSV reads use
PERMISSIVE mode with a corrupt-record column so bad rows are quarantined,
not dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

STAR_TABLES = [
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


def read_bronze_csv(
    spark: SparkSession, path_glob: str, schema: T.StructType
) -> DataFrame:
    """OP-04 with the engine upgrade: explicit schema + quarantine column
    (the reference reads header-only, all-string —
    reference data_transformations_bronze_to_silver.py:84)."""
    schema_with_corrupt = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return spark.read.csv(
        path_glob,
        header=True,
        schema=schema_with_corrupt,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """OP-05: parquet scan of one synthetic table (Hive partition discovery
    applies automatically when the path is a partitioned tree)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its nanosecond timestamp surfaced as a proper
    (microsecond) TimestampType column.

    Parquet TIMESTAMP(NANOS) is not readable by Spark's vectorized reader;
    ``spark.sql.legacy.parquet.nanosAsLong`` (runtime conf, set here so the
    driver's session works too) surfaces it as int64 nanos, which we floor
    to micros. Oracles must compare via ``CAST(ts AS TIMESTAMP)`` (micros)
    or bucket-truncated values.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin UTC so NTZ<->TZ conversions are identity even on a session the
    # driver built without engine defaults in a non-UTC environment
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Integer `div`, NOT float division: int64 nanos exceed double's 53-bit
    # mantissa, so `/ 1000` would round the low microseconds.
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines scan with explicit schema (no sampling pass) and corrupt-
    record quarantine — the landing format for most document/event feeds.
    Unlike parquet, JSON scans can't prune columns at the parser level, so
    at scale JSONL is a bronze-only format: convert to parquet in silver."""
    schema_with_corrupt = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return spark.read.json(
        path,
        schema=schema_with_corrupt,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet (vectorized read, predicate
    pushdown, column pruning all apply); supported so ORC-resident lakes
    can be consumed without conversion."""
    return spark.read.orc(path)


def star_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All synthetic tables as DataFrames keyed by name (TESTDATA.md)."""
    return {t: read_parquet_table(spark, sf_dir, t) for t in STAR_TABLES}
