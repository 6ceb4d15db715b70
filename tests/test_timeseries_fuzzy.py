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
