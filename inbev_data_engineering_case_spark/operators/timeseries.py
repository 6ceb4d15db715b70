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


def rolling_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 24,
    z_threshold: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection over a trailing ROWS
    window — the metrics-monitoring primitive (flag readings more than
    ``z_threshold`` sample standard deviations from their own trailing
    mean) the raw-events family needs once the series is regular.

    Engine-stable by construction — no float accumulation anywhere:

    - values are scaled to integer milli-units (``round(value*scale)``)
      so the window's ``sum`` and ``sum of squares`` are EXACT integers
      accumulated order-independently — in DECIMAL(38,0) (HUGEINT in the
      oracle), so neither the sums nor the ``n*ssq`` / ``s*s`` products
      downstream can wrap int64;
    - ``z_e4`` (the score in 1e-4 units) is derived by a fixed chain of
      IEEE-exact ops on those integers — two casts, one subtraction,
      multiply, divide, ``sqrt`` — each correctly rounded and identical
      on any IEEE engine, then truncated with ``floor`` (exact);
    - ``is_anomaly`` never touches a float: the sample-variance
      inequality ``(n*v - s)^2 * (n-1) > z^2 * n * (n*ssq - s^2)`` is
      evaluated in 38-digit integer arithmetic (DECIMAL(38,0) here,
      HUGEINT in the DuckDB oracle), so the boundary cannot flip on a
      rounding ulp.

    Scale shape: one exchange on ``key_col`` (the window partition);
    the window is a single ordered pass per key partition with O(window)
    state; everything is codegen'd Column arithmetic — no Python, no
    self-join against earlier rows. Only full windows are scored
    (``n == window_rows``), so warm-up rows never emit spurious flags.

    Output: ``(key_col, ts, event id, value, z_e4, is_anomaly)`` for
    full-window rows only.
    """
    # the current row is part of its own baseline (the standard rolling
    # z-score), which caps |z| at (n-1)/sqrt(n) — a spike can never be
    # more than that many sigmas from a window containing itself. The
    # threshold must be reachable or the detector is silently useless.
    z_cap = (window_rows - 1) / window_rows**0.5
    if z_cap <= z_threshold:
        raise ValueError(
            f"window_rows={window_rows} caps |z| at {z_cap:.2f} <= "
            f"threshold {z_threshold}; use a window of at least "
            f"{int(z_threshold**2) + 3} rows"
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(window_rows - 1), 0)
    )
    v = F.round(F.col(value_col) * scale).cast("bigint")
    wide = "decimal(38,0)"
    # _n counts NON-NULL values (count(_v), not count(*)): a window
    # containing a NULL reading must not be scored — count(*) would let
    # it through with sums that silently excluded the null, skewing
    # every statistic in that window.
    #
    # _s and _ssq accumulate in DECIMAL(38,0) (HUGEINT in the oracle),
    # not int64: the downstream products n*ssq and s*s would otherwise
    # overflow int64 long before the cast-for-comparison could save them
    # (window 24 wraps at |value| ~1.26e5 milli-scale). With 38-digit
    # sums the binding constraint is s*s staying within 38 digits:
    # |sum| < 1e19, i.e. |value| < 1e19/(window*scale) — ~1.5e14 for
    # window 64 at milli-scale, far past any physical metric.
    df = (
        events.withColumn("_v", v)
        .withColumn("_n", F.count("_v").over(w))
        .withColumn("_s", F.sum(F.col("_v").cast(wide)).over(w))
        .withColumn(
            "_ssq",
            F.sum(F.col("_v").cast(wide) * F.col("_v").cast(wide)).over(w),
        )
        .filter(F.col("_v").isNotNull() & (F.col("_n") == window_rows))
    )
    n = F.col("_n").cast(wide)
    # var_num = n*ssq - s^2 = n*(n-1)*sample_variance, every term already
    # 38-digit so the products cannot wrap
    var_num = n * F.col("_ssq") - F.col("_s") * F.col("_s")
    dev = n * F.col("_v").cast(wide) - F.col("_s")  # n*(v - mean), exact
    z = (
        dev.cast("double")
        / (
            F.sqrt(
                (var_num.cast("double")) / (window_rows * (window_rows - 1))
            )
            * window_rows
        )
    )
    anomaly = (
        dev * dev * F.lit(window_rows - 1).cast(wide)
        > F.lit(z_threshold * z_threshold).cast(wide)
        * F.lit(window_rows).cast(wide)
        * var_num
    )
    return df.select(
        key_col,
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(value_col).alias("value"),
        F.when(var_num > 0, F.floor(z * 10000).cast("bigint")).alias("z_e4"),
        F.when(var_num > 0, anomaly).otherwise(F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def heartbeat_gaps(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_s: int = 21_600,
) -> DataFrame:
    """Per-key silence detection: every inter-event gap longer than
    ``max_gap_s`` seconds — the missing-heartbeat monitor for device
    fleets, upstream feeds, and per-source crawl health (a source that
    goes quiet shows up here the day it happens, not when its volume
    drop finally moves an aggregate).

    Scale shape: ONE exchange on ``key_col``; the gap is a single
    ``lag`` window pass per key partition (ordered by ``ts_col`` with
    ``id_col`` tie-break, so equal timestamps are deterministic), then a
    codegen'd filter — no self-join, no grid materialization. Output is
    alarm-sized (only the gaps), not series-sized.

    Returns ``(key_col, gap_start, gap_end, gap_s)``; a key's first
    event has no predecessor and never emits. The gap is computed in
    exact integer MICROseconds (``unix_micros`` here, ``epoch_us`` in
    the oracle) and floored to seconds — no float epoch arithmetic whose
    truncation could differ across engines at a boundary.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    return (
        events.select(
            key_col,
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            gap_us.alias("_gap_us"),
        )
        .filter(F.col("_gap_us") > max_gap_s * 1_000_000)
        .select(
            key_col,
            "gap_start",
            "gap_end",
            F.expr("_gap_us div 1000000").cast("bigint").alias("gap_s"),
        )
    )


def cusum_changepoints(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    slack_milli: int = 500,
    threshold_milli: int = 10_000,
    scale: int = 1000,
    target_milli: int | None = None,
) -> DataFrame:
    """Per-key CUSUM drift detection — the changepoint primitive that
    catches SMALL PERSISTENT level shifts the rolling z-score is blind
    to (a +0.5σ drift never crosses a 3σ spike gate, but its cumulative
    sum grows without bound).

    Declarative CUSUM: the textbook recursion
    ``S_k = max(0, S_{k-1} + (v_k - target - slack))`` looks inherently
    sequential, but it has an exact closed form over prefix sums —
    ``S_k = P_k - min(P_0..P_k)`` where ``P`` is the running sum of the
    drift terms (the recursion resets exactly where the prefix sum sets
    a new minimum). That identity turns the stateful loop into two
    stacked window functions (a running sum, then a running min of it)
    over ONE exchange on ``key_col`` — no UDF, no iteration, no state
    store. The downward detector mirrors with negated drift terms.

    Everything is exact integer arithmetic with NO division anywhere in
    the decision path: values scale to milli-units, and instead of
    comparing against the key's mean ``S/n`` (whose rounding differs
    across engines), every drift term is multiplied through by the
    key's count — ``d_k = n*v_k - S - n*slack`` — so target-centering is
    a pure integer subtraction and the alarm compares the count-scaled
    cumulative sum against ``threshold*n``. Sums accumulate in
    DECIMAL(38,0) (HUGEINT in the oracle) like ``rolling_zscore``; the
    reported milli-unit scores divide the (always nonnegative) scaled
    sums by ``n`` with truncating integer division, which equals floor
    on nonnegative values in both engines.

    ``slack_milli`` is the classic k allowance (drift below it never
    accumulates); an alarm fires while either cumulative sum exceeds
    ``threshold_milli`` (h).

    ``target_milli`` chooses the reference level. ``None`` (default)
    self-estimates it as the key's own whole-series mean — right for
    exploratory "did this series shift anywhere" scans, with the caveat
    that a mid-series shift makes BOTH halves drift relative to the
    blended mean (the early half alarms the opposite detector — that is
    correct CUSUM behavior, not a bug). Production monitoring against a
    known baseline (yesterday's level, an SLO) should pass the explicit
    target; drifts are then measured against it alone. Internally the
    explicit-target mode is the count-scaled form with n=1.

    Returns ``(key_col, ts, event_id, value, cusum_up_milli,
    cusum_down_milli, is_change)`` for every non-NULL reading.
    """
    wide = "decimal(38,0)"
    v = F.round(F.col(value_col) * scale).cast("bigint")
    w_all = Window.partitionBy(key_col)
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.withColumn("_v", v).filter(F.col("_v").isNotNull())
    if target_milli is None:
        df = df.withColumn(
            "_n", F.count("_v").over(w_all).cast(wide)
        ).withColumn("_s", F.sum(F.col("_v").cast(wide)).over(w_all))
    else:
        df = df.withColumn("_n", F.lit(1).cast(wide)).withColumn(
            "_s", F.lit(int(target_milli)).cast(wide)
        )
    n, s = F.col("_n"), F.col("_s")
    slack = F.lit(slack_milli).cast(wide)
    up = n * F.col("_v").cast(wide) - s - n * slack
    down = s - n * F.col("_v").cast(wide) - n * slack
    df = df.withColumn("_pu", F.sum(up).over(w_run)).withColumn(
        "_pd", F.sum(down).over(w_run)
    )
    # S_k = P_k - min(P_0..P_k, 0): the implicit S_0 = 0 start means the
    # running min must include an initial zero prefix
    zero = F.lit(0).cast(wide)
    su = F.col("_pu") - F.least(F.min("_pu").over(w_run), zero)
    sd = F.col("_pd") - F.least(F.min("_pd").over(w_run), zero)
    h = F.lit(threshold_milli).cast(wide) * n
    return (
        df.withColumn("_su", su)
        .withColumn("_sd", sd)
        .withColumn("_alarm", (su > h) | (sd > h))
        .select(
            key_col,
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("event_id"),
            F.col(value_col).alias("value"),
            # su/sd are nonnegative, so truncating integral division is
            # floor division on every engine
            F.expr("_su div _n").cast("bigint").alias("cusum_up_milli"),
            F.expr("_sd div _n").cast("bigint").alias("cusum_down_milli"),
            F.col("_alarm").alias("is_change"),
        )
    )
