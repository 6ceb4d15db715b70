"""Known-answer and property tests for the late-round-5 operator
families: mergeable HLL sketch rollups, rolling z-score anomaly
detection, HTML text extraction, URL canonicalization, SCD Type-2."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------


def test_sketch_rollup_merges_overlapping_days(spark):
    from inbev_data_engineering_case_spark.operators.sketches import (
        sketch_rollup_report,
    )

    # day 1: users 0..99; day 2: users 50..149 -> exact distinct 150;
    # a broken merge (e.g. summing estimates) would read ~200
    rows = [
        ("a", datetime.datetime(2024, 1, 1, 10, 0), u) for u in range(100)
    ] + [
        ("a", datetime.datetime(2024, 1, 2, 10, 0), u)
        for u in range(50, 150)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, user_id long")
    out = sketch_rollup_report(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_keys"] == 150
    assert r["merged_within_tol"]
    assert r["merge_lossless"]


def test_sketch_partials_are_per_bucket(spark):
    from inbev_data_engineering_case_spark.operators.sketches import (
        rollup_estimate,
        sketch_partials,
    )

    rows = [
        ("a", datetime.datetime(2024, 1, d, 12, 0), u)
        for d in (1, 2, 3)
        for u in range(10 * d)  # day d has users 0..10d-1 (nested sets)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, user_id long")
    partials = sketch_partials(df)
    assert partials.count() == 3  # one sketch row per day
    # range query: merge only days 1-2 -> distinct = 20 (nested sets)
    sub = partials.filter(
        F.col("bucket_ts") <= datetime.datetime(2024, 1, 2)
    )
    est = rollup_estimate(sub).collect()[0]["merged_estimate"]
    assert abs(est - 20) <= 1  # lg_k=12 is exact at this cardinality


# ---------------------------------------------------------------------------
# rolling z-score
# ---------------------------------------------------------------------------


def _zscore_frame(spark, values, window_rows=12):
    from inbev_data_engineering_case_spark.operators.timeseries import (
        rolling_zscore,
    )

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, i), i, float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    return rolling_zscore(df, window_rows=window_rows).orderBy("ts").collect()


def test_zscore_flags_only_the_spike(spark):
    # calm alternating series with one large spike; window 12 so the
    # spike's self-inclusion cap (n-1)/sqrt(n) ~ 3.18 still clears z=3
    values = [10.0, 11.0] * 8 + [100.0] + [10.0, 11.0] * 2
    out = _zscore_frame(spark, values)
    assert len(out) == len(values) - 11  # warm-up rows not scored
    spiked = [r for r in out if r["value"] == 100.0]
    assert len(spiked) == 1 and spiked[0]["is_anomaly"]
    assert spiked[0]["z_e4"] > 30000  # z above the 3-sigma line
    # the spike pollutes the NEXT windows' baseline (std inflates), so
    # later calm rows must not flag either
    assert sum(r["is_anomaly"] for r in out) == 1


def test_zscore_constant_window_is_not_anomalous(spark):
    out = _zscore_frame(spark, [5.0] * 14)
    assert all(not r["is_anomaly"] for r in out)
    assert all(r["z_e4"] is None for r in out)  # zero variance -> no score


def test_zscore_survives_values_past_the_int64_product_envelope(spark):
    """Values around 3e5 make the window products n*ssq and s*s exceed
    int64 (12 * 12*(3e8)^2 ~ 1.3e19 > 9.2e18); the 38-digit sums must
    keep the flag exact instead of silently wrapping under non-ANSI
    Spark. Same calm-series-plus-spike shape as the small-value test —
    the detector's verdicts must not change with the offset."""
    base = 300_000.0
    values = [base, base + 10.0] * 8 + [base + 100_000.0] + [base] * 4
    out = _zscore_frame(spark, values)
    spiked = [r for r in out if r["value"] == base + 100_000.0]
    assert len(spiked) == 1 and spiked[0]["is_anomaly"]
    assert spiked[0]["z_e4"] > 30000
    assert sum(r["is_anomaly"] for r in out) == 1


def test_zscore_unreachable_threshold_rejected(spark):
    import pytest

    from inbev_data_engineering_case_spark.operators.timeseries import (
        rolling_zscore,
    )

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, 1.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    with pytest.raises(ValueError, match="caps"):
        rolling_zscore(df, window_rows=4)  # cap 1.5 < threshold 3


# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------


def test_html_to_text_known_answer(spark):
    from inbev_data_engineering_case_spark.operators.textops import (
        html_to_text,
    )

    html = (
        '<html><head><style>p{x}</style><script>if(1<2){y="<b>z</b>"}'
        "</script></head><!-- <nav> --><body><p>Hello &amp; "
        "welcome&nbsp;to the <b>site</b></p><ul><li>One</li>"
        "<li>&lt;Two&gt;</li></ul>&quot;q&quot; &#39;s</body></html>"
    )
    df = spark.createDataFrame([(html,)], "text string")
    got = df.select(html_to_text("text").alias("t")).first()["t"]
    assert got == 'Hello & welcome to the site One <Two> "q" \'s'


def test_html_to_text_plain_text_unharmed(spark):
    from inbev_data_engineering_case_spark.operators.textops import (
        html_to_text,
    )

    df = spark.createDataFrame([("just words, no markup",)], "text string")
    assert (
        df.select(html_to_text("text").alias("t")).first()["t"]
        == "just words, no markup"
    )


def test_html_to_text_sql_twin_matches(spark):
    import duckdb

    from inbev_data_engineering_case_spark.operators.textops import (
        html_to_text,
        html_to_text_sql,
    )

    samples = [
        "<p>a</p><p>b</p>",
        "<script>while(i<n){}</script>done",
        "A &amp;&amp; B",
        "no tags",
        "<div class='x'>nested <span>deep</span></div>",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r["t"] for r in df.select(html_to_text("text").alias("t")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {html_to_text_sql('text')} FROM t"
        ).fetchall()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


def test_canonical_url_collapses_variants(spark):
    from inbev_data_engineering_case_spark.operators.weburl import (
        canonical_url,
    )

    variants = [
        "HTTP://Example.COM:80/Path/?b=2&utm_source=x&a=1#frag",
        "http://example.com/Path?a=1&b=2",
        "http://example.com/Path/?fbclid=zz&b=2&a=1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    got = {
        r["c"] for r in df.select(canonical_url("url").alias("c")).collect()
    }
    assert got == {"http://example.com/Path?a=1&b=2"}


def test_canonical_url_idempotent_and_preserves_non_urls(spark):
    from inbev_data_engineering_case_spark.operators.weburl import (
        canonical_url,
    )

    inputs = [
        "https://Site.org:443/a/b/?z=1&y=2#x",
        "ftp://Host.Net:21/file",
        "not a url at all",
        "http://example.com",
    ]
    df = spark.createDataFrame([(u,) for u in inputs], "url string")
    once = df.select(canonical_url("url").alias("url"))
    twice = once.select(canonical_url("url").alias("url"))
    assert [r["url"] for r in once.collect()] == [
        r["url"] for r in twice.collect()
    ]
    assert (
        once.filter(F.col("url") == "not a url at all").count() == 1
    )  # non-URL passthrough


# ---------------------------------------------------------------------------
# SCD Type-2
# ---------------------------------------------------------------------------


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, ts date, id long"
    )


def test_scd2_from_log_collapses_and_versions(spark):
    from inbev_data_engineering_case_spark.operators.scd import scd2_from_log

    d = datetime.date
    log = _log(
        spark,
        [
            (1, "A", d(2024, 1, 1), 1),
            (1, "A", d(2024, 1, 5), 2),  # duplicate observation: no version
            (1, "B", d(2024, 2, 1), 3),  # change
            (2, "X", d(2024, 1, 3), 4),
        ],
    )
    out = {
        (r["k"], r["attr"]): r
        for r in scd2_from_log(log, "k", ["attr"], "ts", "id").collect()
    }
    assert len(out) == 3
    a = out[(1, "A")]
    assert a["effective_from"] == d(2024, 1, 1)
    assert a["effective_to"] == d(2024, 2, 1) and not a["is_current"]
    b = out[(1, "B")]
    assert b["effective_from"] == d(2024, 2, 1)
    assert b["effective_to"] is None and b["is_current"]
    assert out[(2, "X")]["is_current"]


def test_scd2_merge_matches_full_rebuild(spark):
    from inbev_data_engineering_case_spark.operators.scd import (
        scd2_from_log,
        scd2_merge,
    )

    d = datetime.date
    day1 = [
        (1, "A", d(2024, 1, 1), 1),
        (2, "X", d(2024, 1, 1), 2),
        (3, "P", d(2024, 1, 1), 3),
    ]
    day2 = [
        (1, "B", d(2024, 2, 1), 4),  # changed
        (2, "X", d(2024, 2, 1), 5),  # unchanged -> no new version
        (4, "N", d(2024, 2, 1), 6),  # new key
    ]
    history = scd2_from_log(_log(spark, day1), "k", ["attr"], "ts", "id")
    batch = spark.createDataFrame(
        [(k, a, t) for k, a, t, _ in day2], "k long, attr string, ts date"
    )
    merged = scd2_merge(history, batch, "k", ["attr"], "ts")

    # rebuild from the concatenated log; the unchanged observation (2, X)
    # collapses there exactly as the merge skips it
    rebuilt = scd2_from_log(_log(spark, day1 + day2), "k", ["attr"], "ts", "id")
    key = ["k", "attr", "effective_from", "effective_to", "is_current"]
    got = sorted(map(tuple, merged.select(*key).collect()))
    want = sorted(map(tuple, rebuilt.select(*key).collect()))
    assert got == want
    # spot-check semantics: key 1 closed at the change date, key 4 open
    rows = {(r["k"], r["attr"]): r for r in merged.collect()}
    assert rows[(1, "A")]["effective_to"] == d(2024, 2, 1)
    assert rows[(1, "B")]["is_current"]
    assert rows[(4, "N")]["is_current"]
    assert rows[(2, "X")]["effective_from"] == d(2024, 1, 1)


def test_html_escaped_entities_single_decode(spark):
    """A page DISPLAYING escaped markup ('&amp;lt;b&amp;gt;') must
    render to the literal text '&lt;b&gt;', not double-decode to
    '<b>' — &amp; decodes last."""
    from inbev_data_engineering_case_spark.operators.textops import (
        html_to_text,
    )

    df = spark.createDataFrame(
        [("<p>Use &amp;lt;b&amp;gt; to bold &amp;amp; more</p>",)],
        "text string",
    )
    got = df.select(html_to_text("text").alias("t")).first()["t"]
    assert got == "Use &lt;b&gt; to bold &amp; more"


def test_scd2_merge_rejects_late_batch(spark):
    """A batch observation dated at/before its key's open version would
    invert the validity interval — the merge must raise (rebuild via
    scd2_from_log is the late-data path); replaying an UNCHANGED batch
    at the same ts stays a harmless no-op."""
    import pytest

    from inbev_data_engineering_case_spark.operators.scd import (
        scd2_from_log,
        scd2_merge,
    )

    d = datetime.date
    history = scd2_from_log(
        _log(spark, [(1, "A", d(2024, 2, 1), 1)]), "k", ["attr"], "ts", "id"
    )
    late = spark.createDataFrame(
        [(1, "B", d(2024, 1, 15))], "k long, attr string, ts date"
    )
    with pytest.raises(ValueError, match="strictly after"):
        scd2_merge(history, late, "k", ["attr"], "ts").collect()
    # unchanged same-ts replay: no-op, no raise
    replay = spark.createDataFrame(
        [(1, "A", d(2024, 2, 1))], "k long, attr string, ts date"
    )
    out = scd2_merge(history, replay, "k", ["attr"], "ts")
    assert out.count() == 1 and out.first()["is_current"]


def test_html_vertical_tab_collapses_identically(spark):
    """Java's \\s includes \\x0B, RE2's does not — the rule table uses an
    explicit class so both engines collapse it."""
    import duckdb

    from inbev_data_engineering_case_spark.operators.textops import (
        html_to_text,
        html_to_text_sql,
    )

    s = "a\x0bb  c"
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(html_to_text("text").alias("t")).first()["t"]
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {html_to_text_sql('?')}", [s]
    ).fetchone()[0]
    assert got == want == "a b c"


def test_zscore_null_values_excluded_from_windows(spark):
    """A NULL reading must not be scored, and windows containing it must
    not be scored either (count(*) would score them with sums that
    silently excluded the null)."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.timeseries import (
        rolling_zscore,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, i), i,
         None if i == 13 else float(10 + (i % 2)))
        for i in range(26)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = rolling_zscore(df, window_rows=12).collect()
    scored_ids = {r["event_id"] for r in out}
    assert 13 not in scored_ids  # the null row itself
    # every window overlapping the null (ids 14..24) is unscored too
    assert scored_ids == set(range(11, 13)) | {25}


def test_pit_join_picks_the_version_valid_at_the_fact_ts(spark):
    """Leakage safety: a fact timestamped inside a CLOSED interval gets
    that old version, never the current one; a fact before the key's
    first version (or with an unknown key) is dropped."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.scd import (
        point_in_time_join,
        scd2_from_log,
    )

    d = lambda day: dt.datetime(2024, 1, day)  # noqa: E731
    log = spark.createDataFrame(
        [(1, "bronze", d(10), 100), (1, "gold", d(20), 101)],
        "cust long, tier string, obs_ts timestamp, obs_id long",
    )
    hist = scd2_from_log(log, "cust", ["tier"], "obs_ts", "obs_id")
    facts = spark.createDataFrame(
        [
            (1, d(15), "mid"),      # inside the closed bronze interval
            (1, d(20), "boundary"), # [from, to): lands in gold
            (1, d(25), "open"),     # open gold interval
            (1, d(5), "early"),     # before first version -> dropped
            (2, d(15), "unknown"),  # unknown key -> dropped
        ],
        "cust long, ts timestamp, tag string",
    )
    out = {
        r["tag"]: (r["tier"], r["effective_from"])
        for r in point_in_time_join(facts, hist, "cust", "ts").collect()
    }
    assert out == {
        "mid": ("bronze", d(10)),
        "boundary": ("gold", d(20)),
        "open": ("gold", d(20)),
    }


def test_pit_join_broadcast_parity_and_shared_lineage(spark):
    """broadcast_history returns identical rows, and facts deriving
    from the SAME source as the history (the rebuilt-dimension case)
    join without tripping the ambiguous-self-join analyzer."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.scd import (
        point_in_time_join,
        scd2_from_log,
    )

    log = spark.createDataFrame(
        [
            (1, "a", dt.datetime(2024, 1, 1), 1),
            (1, "b", dt.datetime(2024, 1, 5), 2),
            (2, "a", dt.datetime(2024, 1, 3), 3),
        ],
        "cust long, tier string, obs_ts timestamp, obs_id long",
    )
    hist = scd2_from_log(log, "cust", ["tier"], "obs_ts", "obs_id")
    facts = log.select("cust", "obs_ts", "obs_id")  # same lineage
    plain = point_in_time_join(facts, hist, "cust", "obs_ts")
    bcast = point_in_time_join(
        facts, hist, "cust", "obs_ts", broadcast_history=True
    )
    key = lambda r: (r["cust"], r["obs_id"], r["tier"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, bcast.collect())
    )
    assert len(plain.collect()) == 3  # every observation matches itself


def test_cms_one_sided_and_partials_merge_losslessly(spark):
    """Count-min guarantees: est >= true for every sketched item; and
    summing per-day partials equals a direct single-build (counter-wise
    SUM is associative) so stored daily rows answer any range."""
    import datetime as dt

    from inbev_data_engineering_case_spark.operators.sketches import (
        cms_estimate,
        cms_partials,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 3)), i % 7, "e", 1.0)
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    daily = cms_partials(ev, item_col="user_id", unit="day")
    # partials table is bounded by buckets x depth x width
    assert daily.count() <= 3 * 4 * 256
    items = ev.select("user_id").distinct()
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(daily, items, item_col="user_id").collect()
    }
    true = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    assert all(est[u] >= true[u] for u in true)
    # merging across days == building over the whole stream directly
    whole = cms_partials(ev, item_col="user_id", unit="year")
    est_whole = {
        r["item"]: r["est_count"]
        for r in cms_estimate(whole, items, item_col="user_id").collect()
    }
    assert est == est_whole


def test_cms_estimate_rejects_wrong_geometry(spark):
    """Probing a stored sketch with different depth/width would hash to
    absent cells and return 0 — inverting the one-sided guarantee — so
    the build dimensions ride with the partials and a mismatch fails
    loudly."""
    import datetime as dt

    import pytest

    from inbev_data_engineering_case_spark.operators.sketches import (
        cms_estimate,
        cms_partials,
    )

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7, "e", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    partials = cms_partials(ev, item_col="user_id", depth=4, width=256)
    items = ev.select("user_id").distinct()
    with pytest.raises(Exception, match="built with"):
        cms_estimate(partials, items, item_col="user_id", depth=8).collect()
    with pytest.raises(ValueError):
        cms_partials(ev, item_col="user_id", width=0)
