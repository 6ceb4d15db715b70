"""SparkSession factory with scale-aware defaults.

The reference builds bare sessions with no tuning at all
(``SparkSession.builder.appName(...).getOrCreate()`` —
reference dags/data_transformations_bronze_to_silver.py:76,
dags/gold_data_aggregation.py:44) and pays a JVM cold start per pipeline
stage (SURVEY.md §4.3-5). Here a single shared session is built once per
pipeline run with the configuration that matters at the 100 TB design point:

- **AQE on** (runtime re-plan: shuffle coalescing, skew-join splitting,
  broadcast demotion/promotion from real statistics).
- **Shuffle partitions** sized to the environment, not the 200 default —
  on a real cluster this should be ~2-3× total executor cores; AQE then
  coalesces small post-shuffle partitions so overshooting is cheap.
- **Arrow enabled** so any Pandas-UDF path transfers columns in batches.
- **Dynamic partition overwrite** so ``mode("overwrite")`` on a partitioned
  table replaces only the partitions being written — the reference is safe
  only because every run writes a fresh snapshot folder (SURVEY.md §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[N] test harness; on a cluster these are overridden by
# spark-submit conf. Kept here as the single place that states intent.
_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.session.timeZone": "UTC",
    # events.parquet has carried TIMESTAMP(NANOS) in some fixture rounds,
    # which Spark's vectorized reader rejects; this conf surfaces it as
    # int64 nanos (no-op for MICROS fixtures) and the readers adapt either
    # way (sources.readers.read_events / streaming read_events_stream).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "inbev-data-engineering-case-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the shared SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    tests and bench share one code path; on a cluster pass ``master=None``
    after spark-submit has set it, or an explicit URL.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
