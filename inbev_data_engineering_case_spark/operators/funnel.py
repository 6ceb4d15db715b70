"""Ordered event-funnel analysis: how many users progress through a
required event sequence (view → click → purchase) with each step inside a
conversion window of the previous one.

The reference's event handling stops at ingestion (SURVEY.md §2); this is
the standard product-analytics operator layered on the ``events`` table,
built as a chain of conditional first-occurrence joins — the shape that
survives 100 TB:

- Each step is ``filter(type) → groupBy(user).min(ts)``: a partial
  aggregate, so the user-keyed exchange carries one row per user, not one
  per event.
- Step i joins step i-1 ON USER ONLY (equi-join, hash-partitioned by
  user_id); the time-ordering constraint is a post-join predicate. Every
  stage is keyed the same way, so AQE aligns/reuses the exchanges, and
  the step tables shrink monotonically down the funnel.
- No window over a per-user event sort and no ``collect_list`` — a
  hot user with millions of events costs an aggregate, not a sort buffer.

Conversion is reported in exact ppm (int64 ``div``), so the report is
bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STEPS = ("view", "click", "purchase")


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_seconds: int = 86_400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> list[DataFrame]:
    """One DataFrame per funnel step: ``(user_col, reached_ts)`` — the
    user's FIRST qualifying occurrence (first event of step i that is
    strictly after their step-(i-1) time and within ``max_gap_seconds``
    of it)."""
    gap = F.expr(f"INTERVAL {max_gap_seconds} SECOND")
    out: list[DataFrame] = []
    cur: DataFrame | None = None
    for step in steps:
        ev = events.filter(F.col(type_col) == step).select(user_col, ts_col)
        if cur is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("reached_ts"))
        else:
            cur = (
                ev.join(cur, user_col)
                .filter(
                    (F.col(ts_col) > F.col("reached_ts"))
                    & (F.col(ts_col) <= F.col("reached_ts") + gap)
                )
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("reached_ts"))
            )
        out.append(cur)
    return out


def funnel_report(
    events: DataFrame,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_seconds: int = 86_400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel summary: ``(step, step_name, users, conv_ppm)`` — one row
    per step, ``conv_ppm = users_i * 1e6 div users_1`` (exact int64;
    1_000_000 for the first step). The per-step counts are single-row
    aggregates unioned together; the conversion window runs over the
    tiny report, never over event data."""
    stages = funnel_steps(
        events, steps, max_gap_seconds, user_col, type_col, ts_col
    )
    counted = [
        stage.agg(F.count("*").alias("users")).select(
            F.lit(i + 1).cast("bigint").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("users"),
        )
        for i, (name, stage) in enumerate(zip(steps, stages))
    ]
    report = counted[0]
    for c in counted[1:]:
        report = report.unionByName(c)
    first_cnt = stages[0].agg(F.count("*").alias("_first"))
    return (
        report.join(F.broadcast(first_cnt))
        .withColumn(
            "conv_ppm", F.expr("(users * 1000000) div nullif(_first, 0)")
        )
        .select("step", "step_name", "users", "conv_ppm")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "week",
) -> DataFrame:
    """Cohort retention matrix — the other canonical product-analytics
    operator: users grouped by first-seen period (their cohort), tracked
    across subsequent activity periods. Returns ``(cohort, period_offset,
    users, retention_ppm)`` where ``retention_ppm`` is exact int64 ppm of
    the cohort's period-0 size.

    Scale shape: one aggregate for first-seen (partial, user-keyed), one
    distinct over (user, period) — the exchange carries one row per user
    per active period, not per event — then a user-keyed join and a
    small-cardinality (cohort, offset) aggregate. The denominator table
    (one row per cohort) broadcasts. ``date_trunc`` periods and day-count
    division keep every derived value integer-exact across engines."""
    days = {"week": 7, "day": 1}[unit]
    # DATE-typed periods (DuckDB's date_trunc('week') yields DATE while
    # Spark's yields TIMESTAMP — the cast aligns the engines' types)
    bucket = F.date_trunc(unit, F.col(ts_col)).cast("date")
    firsts = events.groupBy(user_col).agg(F.min(bucket).alias("cohort"))
    active = events.select(user_col, bucket.alias("period")).distinct()
    counts = (
        active.join(firsts, user_col)
        .withColumn(
            "period_offset",
            F.expr(f"datediff(period, cohort) div {days}"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct(user_col).alias("users"))
    )
    base = counts.filter(F.col("period_offset") == 0).select(
        "cohort", F.col("users").alias("_base")
    )
    return (
        counts.join(F.broadcast(base), "cohort")
        .withColumn(
            "retention_ppm", F.expr("(users * 1000000) div _base")
        )
        .select("cohort", "period_offset", "users", "retention_ppm")
    )


def attribution_touches(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    window_seconds: int = 86_400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per conversion event: its first- and last-touch marketing channel.

    For every ``conversion_type`` event, consider the same user's
    ``touch_types`` events in the ``window_seconds`` before it (strictly
    earlier; ties between touches break on the id column). Output one
    row per conversion: ``(user_col, conversion_id, conversion_ts,
    first_touch, last_touch)`` — ``'(none)'`` when no touch qualifies,
    so unattributed conversions stay visible instead of vanishing.

    Scale shape: conversions and touches are two narrow filtered
    projections of the same scan, equi-joined ON USER ONLY (the time
    band is a post-join predicate — same discipline as funnel_steps);
    first/last are ``min/max(struct(ts, id, type))`` partial aggregates
    keyed by conversion id, so the exchange carries one row per
    (conversion, qualifying touch) and no per-user sort or
    ``collect_list`` ever materializes a hot user's history.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_tu"),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("_tid"),
        F.col(type_col).alias("_ttype"),
    )
    gap = F.expr(f"INTERVAL {window_seconds} SECOND")
    joined = conv.join(
        touch,
        (F.col("_u") == F.col("_tu"))
        & (F.col("_tts") < F.col("conversion_ts"))
        & (F.col("_tts") >= F.col("conversion_ts") - gap),
        "left",
    )
    picked = joined.groupBy("_u", "conversion_id", "conversion_ts").agg(
        F.min(F.struct("_tts", "_tid", "_ttype")).alias("_first"),
        F.max(F.struct("_tts", "_tid", "_ttype")).alias("_last"),
    )
    return picked.select(
        F.col("_u").alias(user_col),
        "conversion_id",
        "conversion_ts",
        F.coalesce(F.col("_first._ttype"), F.lit("(none)")).alias(
            "first_touch"
        ),
        F.coalesce(F.col("_last._ttype"), F.lit("(none)")).alias(
            "last_touch"
        ),
    )


def attribution_report(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    window_seconds: int = 86_400,
    **kwargs,
) -> DataFrame:
    """Channel credit under the first-touch and last-touch models:
    ``(model, channel, conversions, share_ppm)`` — exact int64 ppm of
    all conversions, bit-identical on any engine (the same ppm
    discipline as funnel_report). The two models are one unpivot of the
    per-conversion table; the denominator is a broadcast 1-row count."""
    touches = attribution_touches(
        events, touch_types, conversion_type, window_seconds, **kwargs
    )
    total = touches.agg(F.count("*").alias("_total"))
    unpivoted = touches.selectExpr(
        "stack(2, 'first_touch', first_touch, 'last_touch', last_touch) "
        "AS (model, channel)"
    )
    return (
        unpivoted.groupBy("model", "channel")
        .agg(F.count("*").alias("conversions"))
        .crossJoin(F.broadcast(total))
        .select(
            "model",
            "channel",
            "conversions",
            F.expr("conversions * 1000000 DIV _total").alias("share_ppm"),
        )
        .orderBy("model", "channel")
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered pair of consecutive events by the same
    user, count the (previous type → current type) transition and its
    probability within the source state — the "what do users do next"
    model behind next-action prediction, funnel design, and anomalous-
    flow detection (a transition whose ppm shifts day-over-day feeds the
    same drift alarms as everything else).

    Scale shape: ONE exchange on the user key; the predecessor is a
    single ``lag`` window pass per user partition (ordered by ts with
    the id tie-break, like ``heartbeat_gaps``), then the transition
    count is a partial-aggregated groupBy over (prev, curr) — state-
    pair-sized, never event-sized, on the second exchange. Per-source
    probabilities come from a window sum over the transition matrix
    itself (state-count-sized). Probabilities are exact integer ppm
    (floor division), so no float summation order can disagree.

    Returns ``(prev_type, event_type, n_transitions, prob_ppm)``; each
    user's first event has no predecessor and feeds no transition.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    matrix = (
        events.select(
            F.lag(F.col(type_col)).over(w).alias("prev_type"),
            F.col(type_col),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", type_col)
        .agg(F.count("*").alias("n_transitions"))
    )
    # n * 1e6 stays in int64 to ~9.2e12 transitions per pair — beyond
    # even a 100 TB event log's per-pair counts
    return matrix.withColumn(
        "prob_ppm",
        F.expr(
            "n_transitions * 1000000 div "
            "sum(n_transitions) OVER (PARTITION BY prev_type)"
        ).cast("bigint"),
    ).select("prev_type", type_col, "n_transitions", "prob_ppm")
