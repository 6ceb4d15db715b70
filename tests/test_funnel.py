"""Known-answer tests for the ordered event-funnel operator: ordering is
required (a click before the first view does not count), the conversion
window cuts off late steps, and each step uses the FIRST qualifying
occurrence (not any occurrence)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.operators.funnel import (
    funnel_report,
    funnel_steps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, h, m)) for u, t, (h, m) in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_requires_order_and_window(spark):
    events = _ev(
        spark,
        [
            # u1: clean view -> click -> purchase inside the window
            (1, "view", (9, 0)),
            (1, "click", (9, 30)),
            (1, "purchase", (10, 0)),
            # u2: click BEFORE the first view -> never reaches step 2
            (2, "click", (8, 0)),
            (2, "view", (9, 0)),
            (2, "purchase", (10, 0)),
            # u3: click too late (outside 1h gap)
            (3, "view", (9, 0)),
            (3, "click", (11, 30)),
            # u4: view only
            (4, "view", (9, 0)),
        ],
    )
    rows = {
        r["step_name"]: r
        for r in funnel_report(events, max_gap_seconds=3600).collect()
    }
    assert rows["view"]["users"] == 4
    assert rows["click"]["users"] == 1  # only u1
    assert rows["purchase"]["users"] == 1
    assert rows["view"]["conv_ppm"] == 1_000_000
    assert rows["click"]["conv_ppm"] == 250_000


def test_funnel_uses_first_qualifying_occurrence(spark):
    # u1 has two clicks after the view; step-2 time must be the FIRST one,
    # which puts the purchase (35 min after click #1) inside the window
    # even though it is outside the window of click #2.
    events = _ev(
        spark,
        [
            (1, "view", (9, 0)),
            (1, "click", (9, 10)),
            (1, "click", (9, 50)),
            (1, "purchase", (9, 45)),
        ],
    )
    steps = funnel_steps(events, max_gap_seconds=3600)
    s2 = steps[1].collect()
    assert s2[0]["reached_ts"] == datetime(2024, 1, 1, 9, 10)
    s3 = steps[2].collect()
    assert len(s3) == 1 and s3[0]["reached_ts"] == datetime(2024, 1, 1, 9, 45)


def test_cohort_retention_known_answer(spark):
    """Two weekly cohorts with churn: week-0 rows are 100%, retained
    fractions are exact ppm, a user's cohort is their FIRST week even
    with later activity, and a week gap yields no row (no zero-fill)."""
    from datetime import datetime as dt

    from inbev_data_engineering_case_spark.operators.funnel import (
        cohort_retention,
    )

    # weeks: 2024-01-01 (Mon), 2024-01-08, 2024-01-15
    rows = [
        # cohort A (w0): users 1,2,3; week1 keeps 1,2; week2 keeps 1 only
        (1, dt(2024, 1, 2)), (2, dt(2024, 1, 3)), (3, dt(2024, 1, 4)),
        (1, dt(2024, 1, 9)), (2, dt(2024, 1, 10)),
        (1, dt(2024, 1, 16)),
        # cohort B (w1): users 4,5; user 4 skips week 2 entirely
        (4, dt(2024, 1, 8)), (5, dt(2024, 1, 11)),
        (5, dt(2024, 1, 17)),
    ]
    events = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        (r["cohort"].isoformat(), r["period_offset"]): (
            r["users"], r["retention_ppm"]
        )
        for r in cohort_retention(events, unit="week").collect()
    }
    assert out[("2024-01-01", 0)] == (3, 1_000_000)
    assert out[("2024-01-01", 1)] == (2, 666_666)
    assert out[("2024-01-01", 2)] == (1, 333_333)
    assert out[("2024-01-08", 0)] == (2, 1_000_000)
    assert out[("2024-01-08", 1)] == (1, 500_000)
    assert len(out) == 5


def test_funnel_empty_step_reports_zero(spark):
    events = _ev(spark, [(1, "view", (9, 0))])
    rows = {r["step_name"]: r for r in funnel_report(events).collect()}
    assert rows["click"]["users"] == 0 and rows["click"]["conv_ppm"] == 0


def _ev_id(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, t, datetime(2024, 1, 1, h, m))
            for i, (u, t, (h, m)) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def test_attribution_first_and_last_touch(spark):
    from inbev_data_engineering_case_spark.operators.funnel import (
        attribution_touches,
    )

    events = _ev_id(
        spark,
        [
            # u1: view -> click -> purchase: first=view, last=click
            (1, "view", (9, 0)),
            (1, "click", (9, 30)),
            (1, "purchase", (10, 0)),
            # u2: touch AFTER the conversion never counts
            (2, "purchase", (9, 0)),
            (2, "click", (9, 30)),
            # u3: only touch is outside the window (2h before)
            (3, "view", (0, 0)),
            (3, "purchase", (2, 0)),
        ],
    )
    # 1h window: u1's 9:00 view sits exactly on the inclusive boundary,
    # u3's 2h-old view falls outside
    out = {
        r["conversion_id"]: r
        for r in attribution_touches(events, window_seconds=3600).collect()
    }
    assert out[2]["first_touch"] == "view"
    assert out[2]["last_touch"] == "click"
    assert out[3]["first_touch"] == "(none)"  # post-conversion touch
    assert out[3]["last_touch"] == "(none)"
    assert out[6]["first_touch"] == "(none)"  # out-of-window touch
    assert len(out) == 3  # one row per conversion, always


def test_attribution_report_exact_ppm(spark):
    from inbev_data_engineering_case_spark.operators.funnel import (
        attribution_report,
    )

    events = _ev_id(
        spark,
        [
            (1, "view", (9, 0)),
            (1, "click", (9, 30)),
            (1, "purchase", (10, 0)),
            (2, "view", (9, 0)),
            (2, "purchase", (9, 30)),
        ],
    )
    rows = {
        (r["model"], r["channel"]): r
        for r in attribution_report(events).collect()
    }
    # first-touch: both conversions credit 'view'
    assert rows[("first_touch", "view")]["conversions"] == 2
    assert rows[("first_touch", "view")]["share_ppm"] == 1_000_000
    # last-touch: one click, one view -> 500000 ppm each (exact div)
    assert rows[("last_touch", "click")]["share_ppm"] == 500_000
    assert rows[("last_touch", "view")]["share_ppm"] == 500_000


def test_markov_transitions_known_matrix(spark):
    """Known per-user sequences produce exact transition counts and
    integer-ppm probabilities; each user's first event feeds nothing."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.funnel import (
        markov_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)

    def seq(uid, types, base):
        return [
            (base + i, t0 + dt.timedelta(minutes=i), uid, t)
            for i, t in enumerate(types)
        ]

    rows = (
        seq(1, ["view", "click", "view", "click", "purchase"], 0)
        + seq(2, ["view", "view", "click"], 100)
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["prev_type"], r["event_type"]): r
        for r in markov_transitions(df).collect()
    }
    # transitions: u1 v->c, c->v, v->c, c->p ; u2 v->v, v->c
    assert out[("view", "click")]["n_transitions"] == 3
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("click", "view")]["n_transitions"] == 1
    assert out[("click", "purchase")]["n_transitions"] == 1
    # from 'view': 4 transitions total -> 3/4 and 1/4 in exact ppm
    assert out[("view", "click")]["prob_ppm"] == 750_000
    assert out[("view", "view")]["prob_ppm"] == 250_000
    assert out[("click", "view")]["prob_ppm"] == 500_000
    assert sum(r["n_transitions"] for r in out.values()) == 6
