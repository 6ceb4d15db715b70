"""Time-series regularization: resample irregular event streams onto a
fixed grid with forward fill — the step that turns raw events into a
joinable, chartable, model-feedable series (the reference stops at raw
ingestion; this extends the events family of SURVEY.md §2.6).

Scale shape:
- The per-key grid is generated with ``sequence()`` from the key's own
  [min, max] bucket range — an explode whose width is span/step rows per
  key, never a cartesian against a global calendar table.
- The "last observation per bucket" reduction and the forward-fill
  window are both keyed on the series key, so the whole operator is one
  exchange on the key (the grid explode and the as-of fill share it).
- Forward fill is ``last(value, ignorenulls=True)`` over an
  unbounded-preceding ROWS window per key — a single ordered pass per
  key partition, no self-join against earlier rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


RESAMPLE_UNITS = {"minute": 60, "hour": 3600, "day": 86400}


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """``(key_col, bucket_ts, value, is_observed)`` — one row per key per
    ``unit`` bucket between the key's first and last event; ``value`` is
    the bucket's LAST observation (latest ``ts_col``, ties broken by
    ``id_col`` so the choice is deterministic), forward-filled across
    empty buckets; ``is_observed`` marks real vs filled rows. Buckets
    come from ``date_trunc`` (calendar-exact, identical in any engine);
    values are carried, never recomputed — no float arithmetic to
    diverge."""
    if unit not in RESAMPLE_UNITS:
        raise ValueError(f"unit must be one of {sorted(RESAMPLE_UNITS)}")
    step_seconds = RESAMPLE_UNITS[unit]
    bucketed = events.withColumn(
        "bucket_ts", F.date_trunc(unit, F.col(ts_col))
    )
    w_pick = Window.partitionBy(key_col, "bucket_ts").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    observed = (
        bucketed.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket_ts", F.col(value_col).alias("_obs"))
    )
    grid = (
        bucketed.groupBy(key_col)
        .agg(
            F.min("bucket_ts").alias("_lo"),
            F.max("bucket_ts").alias("_hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_lo"),
                    F.col("_hi"),
                    F.expr(f"INTERVAL {step_seconds} SECOND"),
                )
            ).alias("bucket_ts"),
        )
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, [key_col, "bucket_ts"], "left")
        .withColumn(
            "value", F.last("_obs", ignorenulls=True).over(w_fill)
        )
        .withColumn("is_observed", F.col("_obs").isNotNull())
        .select(key_col, "bucket_ts", "value", "is_observed")
    )
