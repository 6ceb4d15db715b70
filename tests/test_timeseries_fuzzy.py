"""Known-answer tests for time-series resample+ffill and blocked fuzzy
matching."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.operators.fuzzy import fuzzy_name_pairs
from inbev_data_engineering_case_spark.operators.timeseries import (
    resample_ffill,
)


def test_resample_ffill_fills_gaps_and_picks_last_observation(spark):
    events = spark.createDataFrame(
        [
            # u1: obs at 09:10 (v=1.0) and 09:40 (v=2.0) -> hour 09 keeps
            # the LAST (2.0); nothing in 10..11 -> filled; 12:05 v=5.0
            (1, 1, datetime(2024, 1, 1, 9, 10), 1.0),
            (2, 1, datetime(2024, 1, 1, 9, 40), 2.0),
            (3, 1, datetime(2024, 1, 1, 12, 5), 5.0),
            # u2: single event -> single-row grid
            (4, 2, datetime(2024, 1, 2, 0, 0), 7.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    rows = {
        (r["user_id"], r["bucket_ts"]): r
        for r in resample_ffill(events).collect()
    }
    u1 = [rows[(1, datetime(2024, 1, 1, 9 + h))] for h in range(4)]
    assert [r["value"] for r in u1] == [2.0, 2.0, 2.0, 5.0]
    assert [r["is_observed"] for r in u1] == [True, False, False, True]
    assert len(rows) == 4 + 1
    assert rows[(2, datetime(2024, 1, 2, 0))]["value"] == 7.0


def test_resample_ffill_tie_breaks_on_event_id(spark):
    # two observations at the SAME timestamp: the higher event_id wins
    events = spark.createDataFrame(
        [
            (1, 1, datetime(2024, 1, 1, 9, 0), 10.0),
            (2, 1, datetime(2024, 1, 1, 9, 0), 20.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    [r] = resample_ffill(events).collect()
    assert r["value"] == 20.0


def test_fuzzy_match_finds_typos_within_block(spark):
    df = spark.createDataFrame(
        [(s,) for s in
         ["acme corp", "acme corp", "acme corp", "acme club",  # dist 3
          "acme c0rp",  # dist 1 from acme corp
          "zenith ltd", "zenith ltd", "zenith lid"]],  # dist 1
        "name string",
    )
    pairs = {
        (r["name_a"], r["name_b"]): r
        for r in fuzzy_name_pairs(df, "name", max_distance=2).collect()
    }
    assert ("acme c0rp", "acme corp") in pairs
    p = pairs[("acme c0rp", "acme corp")]
    assert p["dist"] == 1 and p["cnt_b"] == 3  # distinct-domain counts
    assert ("zenith lid", "zenith ltd") in pairs
    # dist 3 pair excluded
    assert ("acme club", "acme corp") not in pairs
    # blocking trade: a first-char typo is invisible by design
    df2 = spark.createDataFrame(
        [("acme corp",), ("bcme corp",)], "name string"
    )
    assert fuzzy_name_pairs(df2, "name", max_distance=2).count() == 0


# ---------------------------------------------------------------------------
# heartbeat gaps + CUSUM changepoints (round 6)
# ---------------------------------------------------------------------------


def test_heartbeat_gaps_known_answer(spark):
    """Gaps beyond the threshold emit (start, end, whole seconds);
    at-threshold gaps don't (strict >); a key's first event never emits;
    output is alarm-sized."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.timeseries import (
        heartbeat_gaps,
    )

    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t, 1), (2, t + h, 1), (3, t + 9 * h, 1),       # 8h gap
        (4, t + 9 * h + dt.timedelta(hours=6), 1),         # exactly 6h
        (10, t, 2), (11, t + dt.timedelta(days=2), 2),     # 48h gap
        (20, t + 5 * h, 3),                                 # lone event
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    gaps = {
        (r["user_id"], r["gap_s"]): r
        for r in heartbeat_gaps(df, max_gap_s=6 * 3600).collect()
    }
    assert set(gaps) == {(1, 8 * 3600), (2, 48 * 3600)}
    g = gaps[(1, 8 * 3600)]
    assert g["gap_start"] == t + h and g["gap_end"] == t + 9 * h


def test_cusum_flags_persistent_shift_not_single_spike(spark):
    """The CUSUM/z-score complementarity claim, both directions: a small
    persistent level shift (far below any 3-sigma spike gate) alarms
    once its cumulative drift crosses h, while a single equal-magnitude
    excursion decays back and never does."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.timeseries import (
        cusum_changepoints,
    )

    t0 = dt.datetime(2024, 1, 1)

    def series(uid, values, base_id):
        return [
            (base_id + i, t0 + dt.timedelta(minutes=i), uid, float(v))
            for i, v in enumerate(values)
        ]

    # user 1: 60 at 10.0, then 60 at 11.0 (persistent +1 shift)
    shift = series(1, [10.0] * 60 + [11.0] * 60, 0)
    # user 2: stable with ONE +1.0 spike of the same magnitude
    spike = series(2, [10.0] * 60 + [11.0] + [10.0] * 59, 1000)
    df = spark.createDataFrame(
        shift + spike, "event_id long, ts timestamp, user_id long, value double"
    )
    # explicit known baseline (classic mu0): drifts measured against it
    out = cusum_changepoints(
        df, slack_milli=100, threshold_milli=5_000, target_milli=10_000
    ).collect()
    by_user = {1: [], 2: []}
    for r in out:
        by_user[r["user_id"]].append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r["ts"])

    shifted = by_user[1]
    assert any(r["is_change"] for r in shifted)
    first = next(i for i, r in enumerate(shifted) if r["is_change"])
    assert first > 60  # alarms only after the shift accumulates
    assert all(not r["is_change"] for r in shifted[:60])
    assert all(not r["is_change"] for r in by_user[2])  # spike never alarms

    # self-estimated target on the same data: the blended mean makes the
    # early half drift DOWN — the documented both-halves behavior
    auto = sorted(
        (
            r
            for r in cusum_changepoints(
                df, slack_milli=100, threshold_milli=5_000
            ).collect()
            if r["user_id"] == 1
        ),
        key=lambda r: r["ts"],
    )
    assert any(r["is_change"] and r["cusum_down_milli"] > 0 for r in auto[:60])
    assert any(r["is_change"] and r["cusum_up_milli"] > 0 for r in auto[60:])


def test_cusum_prefix_sum_identity_matches_recursion(spark):
    """The declarative form S_k = P_k - min(0, P_0..P_k) must equal the
    textbook recursion S_k = max(0, S_{k-1} + d_k) exactly — including
    the count-scaled integer drift terms — on an adversarial random
    series."""
    import datetime as dt
    import random

    from inbev_data_engineering_case_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rng = random.Random(99)
    values = [round(rng.uniform(0, 20), 3) for _ in range(200)]
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 7, v) for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    slack, scale = 700, 1000
    out = sorted(
        cusum_changepoints(
            df, slack_milli=slack, threshold_milli=3_000, scale=scale
        ).collect(),
        key=lambda r: r["ts"],
    )

    v = [round(x * scale) for x in values]
    n, s = len(v), sum(v)
    su = sd = 0
    for i, r in enumerate(out):
        du = n * v[i] - s - n * slack
        dd = s - n * v[i] - n * slack
        su = max(0, su + du)
        sd = max(0, sd + dd)
        assert r["cusum_up_milli"] == su // n, i
        assert r["cusum_down_milli"] == sd // n, i
        assert r["is_change"] == (su > 3_000 * n or sd > 3_000 * n), i
