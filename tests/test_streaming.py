"""Structured Streaming operator tests: file source → transform → memory
sink, with batch-vs-stream result parity for the tumbling windows and a
known-session fixture for the stateful sessionizer."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.streaming.events import (
    stream_sessionize,
    stream_tumbling_counts,
)


def wait_done(query, timeout=60):
    query.processAllAvailable()
    query.stop()

def stage_batches(spark, src, batches, ddl):
    """Stage each batch as one parquet file with strictly increasing
    mtimes (the file source processes in mtime order) and return a
    readStream with maxFilesPerTrigger=1, so each staged file forms its
    own micro-batch."""
    import os

    src.mkdir(exist_ok=True)
    for bi, rows in enumerate(batches):
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
            str(src / f"b{bi}")
        )
        (f,) = (src / f"b{bi}").glob("*.parquet")
        dst = src / f"file_{bi}.parquet"
        os.rename(f, dst)
        os.utime(dst, (1_000_000 + bi * 1000, 1_000_000 + bi * 1000))
    schema = spark.createDataFrame([], ddl).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


@pytest.fixture()
def event_dir(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (gap 45 min between event 2 and 3)
    for i, mins in enumerate([0, 10, 55, 60]):
        rows.append((i, t0 + timedelta(minutes=mins), 1, "click", 1.0))
    # user 2: one session
    for i, mins in enumerate([5, 15]):
        rows.append((10 + i, t0 + timedelta(minutes=mins), 2, "view", 2.0))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    path = str(tmp_path / "events_in")
    df.coalesce(1).write.parquet(path)
    return path


def test_stream_tumbling_matches_batch(spark, event_dir, tmp_path):
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    out = stream_tumbling_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .start()
    )
    wait_done(q)
    got = {
        (r["window_start"].isoformat(), r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in spark.sql("select * from tumbling_test").collect()
    }
    # batch twin over the same files
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    want = {
        (r["ws"].isoformat(), r["event_type"]): (r["n"], float(r["v"]))
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 3  # (h0 click), (h1 click), (h0 view)


def test_stream_sessionize_closes_on_gap(spark, event_dir):
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    out = stream_sessionize(stream)
    # Poll-then-stop (not processAllAvailable / availableNow): with
    # ProcessingTimeTimeout the stream keeps firing timeout-check
    # micro-batches forever, so a drain-style wait never settles.
    q = (
        out.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("append")
        .start()
    )
    deadline = time.time() + 120
    while (
        time.time() < deadline
        and spark.sql("select count(*) from session_test").first()[0] < 1
    ):
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)
    rows = spark.sql("select * from session_test").collect()
    # Only CLOSED sessions are emitted: user 1's first session (2 events,
    # closed by the 45-min gap). Open sessions live in the state store.
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 2
    assert r["session_start"] == datetime(2024, 1, 1, 0, 0)
    assert r["session_end"] == datetime(2024, 1, 1, 0, 10)


MIN_US = 60 * 1_000_000


def test_advance_session_pure_logic():
    from inbev_data_engineering_case_spark.streaming.events import (
        advance_session,
    )

    # in-order: 45-min gap closes the first session
    closed, state = advance_session(
        0, 0, 0, [0, 10 * MIN_US, 55 * MIN_US, 60 * MIN_US]
    )
    assert closed == [(0, 10 * MIN_US, 2)]
    assert state == (55 * MIN_US, 60 * MIN_US, 2)


def test_advance_session_out_of_order_never_regresses():
    from inbev_data_engineering_case_spark.streaming.events import (
        advance_session,
    )

    # batch 1 leaves an open session ending at t=20min
    closed, state = advance_session(0, 0, 0, [0, 20 * MIN_US])
    assert closed == []
    # batch 2 delivers a LATE event at t=5min: it must fold into the open
    # session without moving last_us backwards...
    closed, state = advance_session(*state, [5 * MIN_US])
    assert closed == []
    assert state == (0, 20 * MIN_US, 3)
    # ...so a later event 25 min after the true session end still closes
    # the session at 20min (with the regression bug, last_us=5min would
    # misread the 45-min gap and also corrupt session_end)
    closed, state = advance_session(*state, [51 * MIN_US])
    assert closed == [(0, 20 * MIN_US, 3)]
    assert state == (51 * MIN_US, 51 * MIN_US, 1)


def test_advance_session_late_event_extends_start():
    from inbev_data_engineering_case_spark.streaming.events import (
        advance_session,
    )

    closed, state = advance_session(
        10 * MIN_US, 12 * MIN_US, 2, [3 * MIN_US]
    )
    assert closed == []
    assert state == (3 * MIN_US, 12 * MIN_US, 3)


def test_advance_session_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inbev_data_engineering_case_spark.streaming.events import (
        advance_session,
    )

    GAP = 30 * 60 * 1_000_000

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=10**12), min_size=0,
                max_size=8,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def run(batches):
        state = (0, 0, 0)
        all_closed = []
        total = 0
        prev_last = None
        for batch in batches:
            ts = sorted(batch)  # each micro-batch arrives sorted
            total += len(ts)
            closed, state = advance_session(*state, ts)
            all_closed.extend(closed)
            # last_us never regresses across batches once a session is open
            if prev_last is not None and state[2] > 0:
                assert state[1] >= prev_last
            if state[2] > 0:
                prev_last = state[1]
        # event conservation: every event is in a closed or the open session
        assert sum(n for _, _, n in all_closed) + state[2] == total
        for start, end, n in all_closed:
            assert start <= end and n >= 1
        # NOTE: consecutive closed sessions are NOT guaranteed >GAP apart
        # across micro-batches — a late event may fold into the open
        # session and pull its start before an earlier close (by design;
        # the upstream watermark bounds how late such events can be).

    run()


def test_foreachbatch_parquet_sink_is_replay_safe(spark, event_dir, tmp_path):
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_parquet_idempotent,
    )

    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    # append-shaped stream (cleansed event landing) — the recipe's use case
    out = stream.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    run_stream_to_parquet_idempotent(out, sink, ckpt)
    first = sorted(
        tuple(r)
        for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(event_dir)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    assert first == batch_rows and len(first) == 4

    # drain again with the same checkpoint: offsets are committed, so no
    # new batch runs and nothing is duplicated
    stream2 = spark.readStream.schema(schema).parquet(event_dir)
    out2 = stream2.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    run_stream_to_parquet_idempotent(out2, sink, ckpt)
    again = sorted(
        tuple(r)
        for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    assert again == first

    # simulate the crash window (batch written, checkpoint offset NOT
    # committed -> the batch replays): re-writing the same batch id
    # overwrites its directory instead of appending duplicates
    batch0 = spark.read.parquet(f"{sink}/batch_id=0")
    rows, schema0 = batch0.collect(), batch0.schema  # materialize first:
    # can't lazily read and overwrite the same directory
    spark.createDataFrame(rows, schema0).write.mode("overwrite").parquet(
        f"{sink}/batch_id=0"
    )
    after_replay = sorted(
        tuple(r)
        for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    assert after_replay == first


def test_stream_dedup_crash_recovery_exactly_once(spark, tmp_path):
    """Crash-recovery, not just batch replay: the dedup query FAILS after
    its sink write but before the checkpoint commit (the real crash
    window), is restarted from the same checkpoint, and then processes a
    second feed containing cross-restart duplicates. Exactly-once means
    the replayed batch rewrites instead of appending AND the restored
    state store still drops ids first seen before the crash — output must
    hash-match the batch-distinct oracle over everything ever fed."""
    import glob as g
    import shutil

    from pyspark.errors import StreamingQueryException

    from inbev_data_engineering_case_spark.streaming.events import (
        stream_dedup_events,
    )

    t0 = datetime(2024, 1, 1)
    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    marker = tmp_path / "crashed_once"

    def mk(ids):
        return spark.createDataFrame(
            [
                (i, t0 + timedelta(minutes=int(i) % 70), 1, "click", 1.0)
                for i in ids
            ],
            ["event_id", "ts", "user_id", "event_type", "value"],
        )

    def feed(ids, name):
        stage = tmp_path / f"stage_{name}"
        mk(ids).coalesce(1).write.parquet(str(stage))
        src = g.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(src, str(landing / f"{name}.parquet"))

    schema = mk([0]).schema

    def start():
        stream = spark.readStream.schema(schema).parquet(str(landing))
        out = stream_dedup_events(stream).select("event_id")

        def write_batch(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )
            if not marker.exists():
                marker.write_text("crashed")
                raise RuntimeError(
                    "injected crash: sink written, offset not committed"
                )

        return (
            out.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # feed 1 carries in-batch duplicates (at-least-once source) and the
    # first run dies mid-feed, after writing but before committing
    feed([*range(10), 3, 7], "p1")
    with pytest.raises(StreamingQueryException):
        start().awaitTermination(120)
    assert marker.exists()

    # feed 2 arrives while the query is down: duplicates of pre-crash ids
    # (3, 7, 9) plus new ones — only state recovery can drop the former
    feed([3, 7, 9, *range(10, 15)], "p2")
    q = start()
    assert q.awaitTermination(120)

    got = sorted(
        r["event_id"] for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        r["event_id"]
        for r in spark.read.parquet(str(landing))
        .select("event_id")
        .distinct()
        .collect()
    )
    assert got == want  # equal as MULTISETS: no duplicate survived


def test_stream_sessionize_crash_recovery(spark, tmp_path):
    """Crash-recovery for the applyInPandasWithState sessionizer — the
    user-managed state store, the riskier recovery path. The query dies
    in the sink-written/offset-uncommitted window, restarts from the
    checkpoint, and a post-crash feed closes a session whose START lives
    only in pre-crash state: the emitted sessions must match the batch
    lag-window sessionization of everything ever fed (open sessions
    excluded), which is only possible if the open-session state survived
    the crash."""
    import glob as g
    import shutil

    from pyspark.errors import StreamingQueryException
    from pyspark.sql import Window

    t0 = datetime(2024, 1, 1)
    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    marker = tmp_path / "crashed_once"

    def feed(rows, name):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(
            [(u, t0 + timedelta(minutes=m)) for u, m in rows],
            ["user_id", "ts"],
        ).coalesce(1).write.parquet(str(stage))
        shutil.copy(
            g.glob(str(stage / "part-*.parquet"))[0],
            str(landing / f"{name}.parquet"),
        )

    def start():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(str(landing))
        )
        out = stream_sessionize(stream, flush_timeout=False)

        def write_batch(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )
            if not marker.exists():
                marker.write_text("crashed")
                raise RuntimeError(
                    "injected crash: sink written, offset not committed"
                )

        return (
            out.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # feed 1: u1 closes one session in-batch ([0,5] by the 55-min gap to
    # 60) and leaves one open at 60; u2 leaves one open at 0
    feed([(1, 0), (1, 5), (1, 60), (2, 0)], "p1")
    with pytest.raises(StreamingQueryException):
        start().awaitTermination(120)
    assert marker.exists()

    # feed 2 arrives while the query is down: u1's 65 folds into the open
    # session and 120 closes [60,65] — a session whose start exists ONLY
    # in recovered state; u2's 45 closes [0,0] the same way
    feed([(1, 65), (1, 120), (2, 45)], "p2")
    q = start()
    assert q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    )

    # batch oracle: lag-window sessionization over everything fed, minus
    # each user's final (still-open) session
    ev = spark.read.parquet(str(landing))
    w = Window.partitionBy("user_id").orderBy("ts")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        ev.select(
            "user_id",
            "ts",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros("ts")
                    - F.unix_micros(F.lag("ts").over(w))
                    > 1_800_000_000
                ),
                1,
            )
            .otherwise(0)
            .alias("new_session"),
        )
        .withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    last = sessions.groupBy("user_id").agg(
        F.max("session_id").alias("session_id")
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions.join(
            last, on=["user_id", "session_id"], how="left_anti"
        ).collect()
    )
    assert got == want
    assert len(got) == 3  # [0,5]@u1 pre-crash, [60,65]@u1, [0,0]@u2


def test_stream_static_enrichment_join(spark, event_dir, tmp_path):
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
        stream_enrich,
    )

    # static dimension: user attributes (user 2 missing -> left join nulls)
    dim = spark.createDataFrame(
        [(1, "pro"), (3, "free")], ["user_id", "tier"]
    )
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    out = stream_enrich(
        stream.select("event_id", "user_id", "value"), dim, on="user_id"
    )
    run_stream_to_table(out, "enrich_test", "append")
    rows = {r["event_id"]: r for r in spark.table("enrich_test").collect()}
    assert len(rows) == 6  # left join keeps every event
    assert rows[0]["tier"] == "pro"  # user 1 enriched
    assert rows[10]["tier"] is None  # user 2 has no dim row


def test_stream_enrich_broadcast_gate(spark):
    """broadcast=True forces the hint, broadcast=False guarantees no
    broadcast even for a tiny dim, None defers to the planner. Plan shape is
    checked on the batch form — stream_enrich is a plain join, identical in
    each micro-batch."""
    from inbev_data_engineering_case_spark.streaming.events import (
        stream_enrich,
    )

    facts = spark.range(1000).withColumnRenamed("id", "user_id")
    dim = spark.createDataFrame([(1, "pro")], ["user_id", "tier"])

    forced = stream_enrich(facts, dim, on="user_id", broadcast=True)
    assert "BroadcastHashJoin" in forced._jdf.queryExecution().executedPlan().toString()

    never = stream_enrich(facts, dim, on="user_id", broadcast=False)
    assert "BroadcastHashJoin" not in never._jdf.queryExecution().executedPlan().toString()


def test_merge_upsert_snapshot_replaces_keys_and_replays_idempotently(
    spark, tmp_path
):
    """Keyed MERGE steps: batch 2 updates key 1 and inserts key 3;
    replaying batch 2 (crash between sink write and checkpoint commit)
    rebuilds the identical snapshot — merge(merge(S,B),B) == merge(S,B).
    Within a batch the highest order_col wins per key."""
    from inbev_data_engineering_case_spark.layers import latest_snapshot
    from inbev_data_engineering_case_spark.streaming.events import (
        merge_upsert_snapshot,
    )

    base = str(tmp_path / "profiles")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b"), (1, 12, "a2")],  # key 1 twice: 12 wins
        "user_id long, seq long, v string",
    )
    merge_upsert_snapshot(spark, b1, 0, base, ["user_id"], "seq")
    s1 = {
        r["user_id"]: (r["seq"], r["v"])
        for r in spark.read.parquet(
            latest_snapshot(base, prefix="merge=")
        ).collect()
    }
    assert s1 == {1: (12, "a2"), 2: (11, "b")}

    b2 = spark.createDataFrame(
        [(1, 20, "a3"), (3, 21, "c")], "user_id long, seq long, v string"
    )
    merge_upsert_snapshot(spark, b2, 1, base, ["user_id"], "seq")
    want = {1: (20, "a3"), 2: (11, "b"), 3: (21, "c")}
    got = lambda: {  # noqa: E731
        r["user_id"]: (r["seq"], r["v"])
        for r in spark.read.parquet(
            latest_snapshot(base, prefix="merge=")
        ).collect()
    }
    assert got() == want
    # replay batch 1 (same id): rewrites merge=...1 from the same
    # predecessor (merge=...0 still present) -> state unchanged
    merge_upsert_snapshot(spark, b2, 1, base, ["user_id"], "seq")
    assert got() == want


def test_run_stream_upsert_parquet_end_to_end(spark, tmp_path):
    """The streaming MERGE sink drains a duplicated events stream into a
    keyed snapshot holding exactly one (latest) row per event_id."""
    from inbev_data_engineering_case_spark.layers import latest_snapshot
    from inbev_data_engineering_case_spark.streaming.events import (
        read_events_stream,
        run_stream_upsert_parquet,
    )

    src = read_events_stream(spark, "/root/testdata/sf0.001")
    doubled = src.unionByName(src)
    base = str(tmp_path / "events_upsert")
    run_stream_upsert_parquet(
        doubled.select("event_id", "ts", "event_type", "value"),
        base,
        str(tmp_path / "ckpt"),
        key_cols=["event_id"],
        order_col="ts",
    )
    snap = spark.read.parquet(latest_snapshot(base, prefix="merge="))
    n_events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    assert snap.count() == n_events
    assert snap.select("event_id").distinct().count() == n_events


def test_stream_sketch_partials_append_emits_closed_buckets(spark, tmp_path):
    """Append-mode sketch maintenance: only watermark-closed day buckets
    land in the partial table (bounded state), and each landed sketch is
    BIT-IDENTICAL to the batch-built partial for that bucket — so the
    streamed table composes with rollup_estimate exactly like a batch
    rebuild."""
    from inbev_data_engineering_case_spark.operators.sketches import (
        sketch_partials,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        stream_sketch_partials,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    # day 1: users 1..5 / day 2: users 4..9 / day 3 (open): users 100..101
    for i, u in enumerate(range(1, 6)):
        rows.append((i, t0 + timedelta(hours=6), u, "click", 1.0))
    for i, u in enumerate(range(4, 10)):
        rows.append((10 + i, t0 + timedelta(days=1, hours=6), u, "click", 1.0))
    # 03:00 puts the watermark (max_ts - 2h) past day-2's close but
    # before day-3's own close, so exactly two buckets emit
    for i, u in enumerate(range(100, 102)):
        rows.append((20 + i, t0 + timedelta(days=2, hours=3), u, "click", 1.0))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    src = str(tmp_path / "sketch_events")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_sketch_partials(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sketch_append_test")
        .outputMode("append")
        .start()
    )
    wait_done(q)
    got = {
        (r["bucket_ts"].isoformat(), r["event_type"]): bytes(r["sketch"])
        for r in spark.sql("select * from sketch_append_test").collect()
    }
    # the final-day bucket stays open (watermark = max_ts - 2h < day-3
    # close), so exactly days 1 and 2 emit
    assert len(got) == 2

    batch = {
        (r["bucket_ts"].isoformat(), r["event_type"]): bytes(r["sketch"])
        for r in sketch_partials(df).collect()
    }
    for key, sketch in got.items():
        assert sketch == batch[key]  # bit-identical partials


def test_stream_cms_partials_bit_identical_and_replay_safe(spark, tmp_path):
    """Append-mode CMS maintenance: only watermark-closed buckets emit
    (bounded state), every landed (bucket, r, c, cnt) row is IDENTICAL
    to the batch-built partial — exact counts over deterministic
    hashes, so the identity is bitwise, not statistical — estimates
    from streamed partials match estimates from batch partials, and a
    REPLAYED drain through the idempotent parquet sink leaves the
    partial table unchanged."""
    from inbev_data_engineering_case_spark.operators.sketches import (
        cms_estimate,
        cms_partials,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_parquet_idempotent,
        stream_cms_partials,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    # day 1: users 1..5 (user 1 three times) / day 2: users 4..9 /
    # day 3 (open): users 100..101
    for i, u in enumerate([1, 1, 1, 2, 3, 4, 5]):
        rows.append((i, t0 + timedelta(hours=6), u, "click", 1.0))
    for i, u in enumerate(range(4, 10)):
        rows.append((10 + i, t0 + timedelta(days=1, hours=6), u, "click", 1.0))
    for i, u in enumerate(range(100, 102)):
        rows.append((20 + i, t0 + timedelta(days=2, hours=3), u, "click", 1.0))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    src = str(tmp_path / "cms_events")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_cms_partials(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("cms_append_test")
        .outputMode("append")
        .start()
    )
    wait_done(q)
    streamed = spark.sql("select * from cms_append_test")
    got = {
        (r["bucket_ts"].isoformat(), r["r"], r["c"]): r["cnt"]
        for r in streamed.collect()
    }
    # the day-3 bucket stays open, so only days 1 and 2 emitted
    assert len({k[0] for k in got}) == 2
    batch = {
        (r["bucket_ts"].isoformat(), r["r"], r["c"]): r["cnt"]
        for r in cms_partials(df).collect()
        if not r["bucket_ts"].isoformat().startswith("2024-01-03")
    }
    assert got == batch  # bit-identical closed-bucket partials
    # estimates compose unchanged across the boundary (user 1 counted
    # 3x on day 1; day-3 users absent from the closed buckets)
    items = df.filter("user_id < 20").select("user_id").distinct()
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(streamed, items).collect()
    }
    assert est[1] >= 3  # one-sided guarantee holds through the stream
    assert est[4] >= 2  # present in both closed days

    # replay safety: drain through the idempotent parquet sink twice
    # (second start reuses the checkpoint -> no new batches, same rows)
    sink = str(tmp_path / "cms_sink")
    ckpt = str(tmp_path / "cms_ckpt")
    out2 = stream_cms_partials(
        spark.readStream.schema(df.schema).parquet(src),
        watermark="2 hours",
    )
    run_stream_to_parquet_idempotent(out2, sink, ckpt)
    first = sorted(map(tuple, spark.read.parquet(sink).collect()))
    run_stream_to_parquet_idempotent(out2, sink, ckpt)
    assert sorted(map(tuple, spark.read.parquet(sink).collect())) == first


@pytest.mark.slow
def test_stream_index_update_keeps_serving_index_current(spark, tmp_path):
    """The serving text index maintained FROM THE DOCUMENT STREAM: two
    micro-batches of new/changed docs apply through update_text_index
    (each publishing an atomic committed generation), the drained index
    equals a full rebuild of the final corpus, and RE-APPLYING the last
    batch (the crash-between-commit-and-checkpoint replay) changes
    nothing — the keyed merge makes replay idempotent without a
    marker."""
    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        build_text_index,
        update_text_index,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_index_update,
    )

    idx = str(tmp_path / "serving_index")
    day0 = spark.createDataFrame(
        [(0, "spark shuffles data"), (1, "zebra crossing ahead")],
        "doc_id long, text string",
    )
    build_text_index(day0, idx)

    src = str(tmp_path / "doc_feed")
    batch1 = spark.createDataFrame(
        [(2, "spark tuning guide")], "doc_id long, text string"
    )
    batch2 = spark.createDataFrame(
        # doc 1 CHANGES content; doc 3 is new; doc 3 re-delivered in
        # the same batch (at-least-once source) collapses via the
        # keyed dedup; doc 9's NULL text must DROP, not poison the
        # stream into a permanently replaying failed batch
        [(1, "updated zebra text"), (3, "cluster spark facts"),
         (3, "cluster spark facts"), (9, None)],
        "doc_id long, text string",
    )
    batch1.coalesce(1).write.parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # keep_snapshots=None (the serving setting): one generation per
    # micro-batch must RETAIN — the default of 2 would prune a resolved
    # snapshot out from under a serving reader after just two batches,
    # so the passthrough is part of the operator's contract
    metrics = run_stream_index_update(
        stream, idx, str(tmp_path / "ckpt"), keep_snapshots=None
    )
    assert metrics["input_rows"] == 5  # incl. the dropped NULL-text doc
    import os as _os

    gens = [d for d in _os.listdir(idx) if d.startswith("textindex_")]
    assert len(gens) == 3  # initial build + one per micro-batch, unpruned

    final = spark.createDataFrame(
        [
            (0, "spark shuffles data"),
            (1, "updated zebra text"),
            (2, "spark tuning guide"),
            (3, "cluster spark facts"),
        ],
        "doc_id long, text string",
    )
    rebuild = str(tmp_path / "rebuild")
    build_text_index(final, rebuild)
    key = lambda r: tuple(r)  # noqa: E731
    want = sorted(
        map(
            key,
            bm25_from_index(
                spark, rebuild, ["spark", "zebra"], k=10
            ).collect(),
        )
    )
    got = sorted(
        map(
            key,
            bm25_from_index(spark, idx, ["spark", "zebra"], k=10).collect(),
        )
    )
    assert got == want
    # replay the final batch by hand (as apply_batch would see it:
    # NULL-text filtered, keyed-deduped): same final answers
    update_text_index(
        spark,
        idx,
        batch2.filter("text is not null").dropDuplicates(["doc_id"]),
    )
    replayed = sorted(
        map(
            key,
            bm25_from_index(spark, idx, ["spark", "zebra"], k=10).collect(),
        )
    )
    assert replayed == want


def test_lateness_metrics_report_watermark_drops(spark, tmp_path):
    """Deliberately-late fixture through the dedup operator: batch 0
    advances the watermark past the late rows in batches 1 and 2. The
    runner's metrics must report the watermark drops — without this
    counter a too-tight watermark looks like missing data, not dropped
    data. Pins the measured engine semantics the query_metrics docstring
    documents: the late filter engages one batch after the watermark-
    advancing commit (batch 1's late rows slip through; batch 2's are
    dropped and counted), and the counter exactly accounts for the rows
    missing from the output."""
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
        stream_dedup_events,
    )

    t0 = datetime(2024, 1, 1, 12, 0)
    batches = [
        # batch 0: on-time, advances the watermark to max_ts - 1h
        [(i, t0 + timedelta(minutes=i), 1, "click", 1.0) for i in range(20)],
        # batches 1-2: a day older than the watermark (all unique ids, so
        # any row missing from the output was watermark-dropped, not
        # deduped)
        [(100 + i, t0 - timedelta(days=1), 2, "view", 1.0) for i in range(5)],
        [(200 + i, t0 - timedelta(days=1), 3, "view", 1.0) for i in range(3)],
    ]
    # file-source processes in modification-time order: stage_batches
    # forces the on-time file to form micro-batch 0 and set the watermark
    stream = stage_batches(
        spark, tmp_path / "late_events", batches,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    out = stream_dedup_events(stream, watermark="1 hour")
    metrics = run_stream_to_table(
        out, "lateness_metrics_test", "append", timeout=120
    )
    emitted = spark.sql(
        "select count(*) c from lateness_metrics_test"
    ).first()["c"]
    assert metrics["batches"] == 3
    assert metrics["input_rows"] == 28
    # one-batch propagation lag: batch 1's 5 late rows slip through;
    # batch 2's 3 late rows are dropped AND counted
    assert metrics["dropped_rows_by_watermark"] == 3
    # the counter exactly explains the missing rows
    assert metrics["input_rows"] - emitted == (
        metrics["dropped_rows_by_watermark"]
    )
    assert metrics["peak_state_rows"] >= 20


def test_stream_heartbeat_gaps_matches_batch_and_spans_batches(spark, tmp_path):
    """The streaming gap detector's drained output equals the batch
    operator's on the same data, INCLUDING a gap whose two sides arrive
    in different micro-batches (the 8-byte cursor carries across), and
    state never moves backwards on a late duplicate."""
    from inbev_data_engineering_case_spark.operators.timeseries import (
        heartbeat_gaps,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
        stream_heartbeat_gaps,
    )

    t0 = datetime(2024, 1, 1)
    batch1 = [(1, t0, 1), (2, t0 + timedelta(hours=1), 1),
              (10, t0, 2)]
    # batch 2 starts 9h after user 1's last event -> the gap spans the
    # batch boundary; user 2 stays quiet 30h
    batch2 = [(3, t0 + timedelta(hours=10), 1),
              (11, t0 + timedelta(hours=30), 2),
              (4, t0 + timedelta(hours=10), 1)]  # same-ts duplicate
    src = tmp_path / "gap_stream"
    stream = stage_batches(
        spark, src, [batch1, batch2],
        "event_id long, ts timestamp, user_id long",
    )
    metrics = run_stream_to_table(
        stream_heartbeat_gaps(stream, max_gap_s=6 * 3600),
        "stream_gaps_sink",
        "append",
        timeout=120,
    )
    assert metrics["batches"] >= 2
    got = {
        (r["user_id"], r["gap_s"])
        for r in spark.sql("select * from stream_gaps_sink").collect()
    }
    batch_df = spark.read.parquet(*[str(src / f"file_{i}.parquet")
                                    for i in range(2)])
    want = {
        (r["user_id"], r["gap_s"])
        for r in heartbeat_gaps(batch_df, max_gap_s=6 * 3600).collect()
    }
    assert got == want == {(1, 9 * 3600), (2, 30 * 3600)}


def test_stream_detectors_tolerate_null_timestamps(spark, tmp_path):
    """A NULL ts would astype to the int64 NaT sentinel and poison the
    gap cursor / CUSUM ordering (the emit would then overflow
    pd.Timestamp and fail the whole drain); both detectors must drop
    such rows like the batch twins' NULL arithmetic does."""
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
        stream_cusum,
        stream_heartbeat_gaps,
    )

    t0 = datetime(2024, 1, 1)
    src = tmp_path / "nat_stream"
    spark.createDataFrame(
        [
            (1, t0, 1, 12.0),
            (2, None, 1, 12.0),  # NULL ts
            (3, t0 + timedelta(hours=30), 1, 12.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    ).write.parquet(str(src))
    schema = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    ).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    run_stream_to_table(
        stream_heartbeat_gaps(stream, max_gap_s=6 * 3600),
        "nat_gaps_sink",
        "append",
        timeout=120,
    )
    gaps = spark.sql("select * from nat_gaps_sink").collect()
    assert [(r["user_id"], r["gap_s"]) for r in gaps] == [(1, 30 * 3600)]

    stream2 = spark.readStream.schema(schema).parquet(str(src))
    run_stream_to_table(
        stream_cusum(stream2, target_milli=10_000, slack_milli=100,
                     threshold_milli=15_000),
        "nat_cusum_sink",
        "append",
        timeout=120,
    )
    scored = spark.sql("select * from nat_cusum_sink").collect()
    assert sorted(r["event_id"] for r in scored) == [1, 3]


def test_stream_cusum_matches_batch_and_carries_state(spark, tmp_path):
    """The streaming CUSUM equals the batch explicit-target operator on
    the same data, including sums that accumulate ACROSS micro-batches
    (the 16-byte state carries), and the alarm fires mid-stream the
    moment the threshold is crossed."""
    from inbev_data_engineering_case_spark.operators.timeseries import (
        cusum_changepoints,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
        stream_cusum,
    )

    t0 = datetime(2024, 1, 1)
    # a persistent +2 drift over target 10.0 accumulates 1.9 units/event
    # after slack 0.1; threshold 15 units crosses at the 8th drifted event
    batch1 = [(i, t0 + timedelta(minutes=i), 1, 12.0) for i in range(5)]
    batch2 = [(10 + i, t0 + timedelta(minutes=10 + i), 1, 12.0)
              for i in range(5)]
    src = tmp_path / "cusum_stream"
    stream = stage_batches(
        spark, src, [batch1, batch2],
        "event_id long, ts timestamp, user_id long, value double",
    )
    metrics = run_stream_to_table(
        stream_cusum(stream, target_milli=10_000, slack_milli=100,
                     threshold_milli=15_000),
        "stream_cusum_sink",
        "append",
        timeout=120,
    )
    assert metrics["batches"] >= 2
    got = sorted(
        (
            (r["event_id"], r["cusum_up_milli"], r["is_change"])
            for r in spark.sql("select * from stream_cusum_sink").collect()
        )
    )
    batch_df = spark.read.parquet(*[str(src / f"file_{i}.parquet")
                                    for i in range(2)])
    want = sorted(
        (r["event_id"], r["cusum_up_milli"], r["is_change"])
        for r in cusum_changepoints(
            batch_df, slack_milli=100, threshold_milli=15_000,
            target_milli=10_000,
        ).collect()
    )
    assert got == want
    # drift accumulates 1900 milli/event; the 8th event (id 12, in
    # BATCH 2 — state carried) is the first past 15000
    by_id = {e: (u, c) for e, u, c in got}
    assert by_id[11] == (13_300, False)
    assert by_id[12] == (15_200, True)
    assert all(c for e, (u, c) in by_id.items() if e >= 12)


def test_stream_pit_enrich_probes_closed_and_open_versions(spark, tmp_path):
    """Stream-static PIT enrichment: events arriving across micro-batches
    pick the SCD2 version valid at their own event time — a fact inside
    a CLOSED interval gets the old version even though a newer one is
    current, and a pre-history fact drops."""
    from inbev_data_engineering_case_spark.operators.scd import (
        point_in_time_join,
        scd2_from_log,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
    )

    d = lambda day: datetime(2024, 1, day)  # noqa: E731
    log = spark.createDataFrame(
        [(1, "bronze", d(10), 100), (1, "gold", d(20), 101)],
        "cust long, tier string, obs_ts timestamp, obs_id long",
    )
    hist = scd2_from_log(log, "cust", ["tier"], "obs_ts", "obs_id")
    batches = [
        [(1, d(15), 1)],            # closed bronze interval
        [(2, d(25), 1), (3, d(5), 1)],  # open gold; pre-history drops
    ]
    stream = stage_batches(
        spark, tmp_path / "pit_stream", batches,
        "event_id long, ts timestamp, cust long",
    )
    metrics = run_stream_to_table(
        point_in_time_join(stream, hist, "cust", "ts"),
        "stream_pit_sink",
        "append",
        timeout=120,
    )
    assert metrics["batches"] >= 2
    got = {
        r["event_id"]: r["tier"]
        for r in spark.sql("select * from stream_pit_sink").collect()
    }
    assert got == {1: "bronze", 2: "gold"}  # 3 dropped (pre-history)


def test_stream_drift_partials_merge_equals_batch(spark, tmp_path):
    """The streamed ECDF partials are IDENTICAL to batch-computed
    counts over the same rows (indicator counts are exact sums), so
    drift_from_partials over the drained windows reproduces batch
    distribution_drift row-for-row; a partial probed against different
    boundaries (wrong n_cuts) raises in-plan at merge rather than
    fabricating a CDF."""
    from inbev_data_engineering_case_spark.operators.quality import (
        distribution_drift,
        drift_bound_values,
        drift_from_partials,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_to_table,
        stream_drift_partials,
    )

    t0 = datetime(2024, 1, 1, 12, 0)
    ref = spark.createDataFrame(
        [(float(i % 17),) for i in range(200)], "value double"
    )
    cur_rows = [
        (i, t0 + timedelta(hours=6 * i), float((i * 7) % 23))
        for i in range(80)
    ]
    cur = spark.createDataFrame(
        cur_rows, "event_id long, ts timestamp, value double"
    )
    src = str(tmp_path / "drift_feed")
    cur.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(cur.schema).parquet(src)

    n_cuts = 7
    bounds = drift_bound_values(ref, "value", n_cuts=n_cuts)
    out = stream_drift_partials(
        stream.select("value", "ts"), bounds, window="1 day"
    )
    run_stream_to_table(out, "drift_partial_sink", "complete")
    partials = spark.table("drift_partial_sink")
    # windows partition the feed: totals must reconcile exactly
    agg = partials.agg(F.sum("n").alias("n")).collect()[0]
    assert agg["n"] == 80

    streamed = sorted(
        map(
            tuple,
            drift_from_partials(
                ref, partials, "value", n_cuts=n_cuts
            ).collect(),
        )
    )
    batch = sorted(
        map(
            tuple,
            distribution_drift(
                ref, cur.select("value"), "value", n_cuts=n_cuts
            ).collect(),
        )
    )
    assert streamed == batch  # lossless merge, not approximately equal

    # wrong-geometry partial: in-plan raise, the CMS guard discipline
    bad = partials.withColumn("n_cuts", F.lit(n_cuts + 1))
    with pytest.raises(Exception, match="n_cuts"):
        drift_from_partials(ref, bad, "value", n_cuts=n_cuts).collect()


@pytest.mark.slow
def test_stream_artifact_update_maintains_dedup_state(spark, tmp_path):
    """The dedup state (minhash signature + fingerprint tables)
    maintained FROM THE DOCUMENT STREAM: two micro-batches advance the
    pair through advance_corpus_artifacts, BOTH tables publish under
    one atomic snapshot per batch, the drained state equals the batch
    operator applied sequentially, and replaying the whole feed from a
    fresh checkpoint (the crash-between-commit-and-checkpoint case)
    changes nothing."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.curate import (
        advance_corpus_artifacts,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        read_corpus_artifacts,
        run_stream_artifact_update,
    )

    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    batch1 = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "an entirely different second document about rivers")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        # doc 3 new; doc 3 re-delivered same text (at-least-once)
        # collapses; doc 9 NULL text drops, not poisons
        [(3, "a third document that arrives on day two with news"),
         (3, "a third document that arrives on day two with news"),
         (9, None)],
        "doc_id long, text string",
    )
    batch1.coalesce(1).write.parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    metrics = run_stream_artifact_update(
        stream, state, str(tmp_path / "ckpt")
    )
    assert metrics["input_rows"] == 5
    sigs, fps = read_corpus_artifacts(spark, state)

    # batch twin: the same two advances applied sequentially from empty
    empty_sigs = spark.createDataFrame([], "id long, sig array<bigint>")
    empty_fps = spark.createDataFrame([], "fp long, keep_id long")
    s1, f1 = advance_corpus_artifacts(batch1, empty_sigs, empty_fps)
    clean2 = batch2.filter(F.col("text").isNotNull()).dropDuplicates(
        ["doc_id"]
    )
    s2, f2 = advance_corpus_artifacts(clean2, s1, f1)
    key = lambda r: tuple(  # noqa: E731
        tuple(v) if isinstance(v, list) else v for v in r
    )
    want_sigs = sorted(map(key, s2.collect()))
    want_fps = sorted(map(key, f2.collect()))
    assert sorted(map(key, sigs.collect())) == want_sigs
    assert sorted(map(key, fps.collect())) == want_fps

    # both tables live in ONE snapshot generation per batch (a crash
    # can't leave sigs and fps at different generations)
    import os as _os

    gens = sorted(
        d for d in _os.listdir(state) if d.startswith("corpusart_")
    )
    assert len(gens) == 2
    for g in gens:
        assert _os.path.isdir(_os.path.join(state, g, "sigs"))
        assert _os.path.isdir(_os.path.join(state, g, "fps"))

    # full replay from a fresh checkpoint: every batch re-applies to
    # the same final contents (no dup signature rows, no dup fps)
    stream2 = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_artifact_update(stream2, state, str(tmp_path / "ckpt2"))
    sigs_r, fps_r = read_corpus_artifacts(spark, state)
    assert sorted(map(key, sigs_r.collect())) == want_sigs
    assert sorted(map(key, fps_r.collect())) == want_fps

    # the loop closes: the STREAM-maintained pair feeds the batch
    # daily-crawl pipeline directly — a day-3 crawl whose first doc
    # exactly duplicates streamed doc 0 and whose second is new must
    # curate to exactly the new doc, identically to feeding the
    # hand-built batch artifacts
    from inbev_data_engineering_case_spark.operators.curate import (
        curate_incremental,
    )

    day2 = batch1.unionByName(clean2)
    day3 = day2.unionByName(
        spark.createDataFrame(
            [(7, "the quick brown fox jumps over the lazy dog today"),
             (8, "a genuinely new fourth document closing the loop")],
            "doc_id long, text string",
        )
    )

    def kept_ids(sig_df, fp_df):
        return sorted(
            r["doc_id"]
            for r in curate_incremental(
                day2, day3, sig_df, fp_df, min_quality=0.0
            ).collect()
        )

    streamed = kept_ids(sigs_r, fps_r)
    assert streamed == kept_ids(s2, f2) == [8]  # 7 is an exact dup of 0


@pytest.mark.slow
def test_stream_artifact_update_maintains_gram_table(spark, tmp_path):
    """gram_n= extends the streamed dedup state with the containment
    gram table, in the SAME atomic snapshot as sigs/fps: the drained
    table equals build_gram_table over every streamed doc, a replay
    from a fresh checkpoint changes nothing, and the streamed state
    feeds incremental_containment_pairs directly — a day-3 fragment
    of a streamed doc surfaces as contained without re-tokenizing
    history."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.dedup import (
        build_gram_table,
        containment_pairs,
        incremental_containment_pairs,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        read_corpus_artifacts,
        run_stream_artifact_update,
    )

    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
        .localCheckpoint(eager=True)
    )
    b1 = docs.filter(F.col("doc_id") < 20)
    b2 = docs.filter(F.col("doc_id") >= 20)
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run_stream_artifact_update(
        stream(), state, str(tmp_path / "ckpt"), gram_n=4
    )
    _sigs, _fps, grams = read_corpus_artifacts(
        spark, state, with_grams=True
    )
    key = lambda r: tuple(r)  # noqa: E731
    want = sorted(map(key, build_gram_table(docs, n=4).collect()))
    assert sorted(map(key, grams.collect())) == want

    # replay from a fresh checkpoint: identical final table
    run_stream_artifact_update(
        stream(), state, str(tmp_path / "ckpt2"), gram_n=4
    )
    _s, _f, grams_r = read_corpus_artifacts(spark, state, with_grams=True)
    assert sorted(map(key, grams_r.collect())) == want

    # the streamed gram state feeds the containment delta directly:
    # a new crawl carrying a 40%-prefix fragment of doc 0 must surface
    # as contained, matching the full-batch run filtered to new pairs
    from inbev_data_engineering_case_spark.functions import tokens

    frag = docs.filter(F.col("doc_id") == 0).select(
        F.lit(900000).alias("doc_id"),
        F.array_join(
            F.slice(
                tokens(F.col("text")),
                1,
                20,
            ),
            " ",
        ).alias("text"),
    )
    kw = dict(n=4, threshold_ppm=800_000, max_gram_df=100)
    got = sorted(map(key, incremental_containment_pairs(
        grams, frag, **kw).collect()))
    full = containment_pairs(docs.unionByName(frag), **kw)
    want_pairs = sorted(map(key, full.filter(
        (F.col("contained_id") == 900000)
        | (F.col("container_id") == 900000)
    ).collect()))
    assert got == want_pairs and got


def test_stream_artifact_update_gram_upgrade_requires_backfill(
    spark, tmp_path
):
    """Enabling gram_n on a stream whose existing snapshots lack a
    grams table must raise with backfill guidance, not quietly seed
    the gram table from the current batch onward — that state would
    permanently omit historical docs' grams while read_corpus_
    artifacts(with_grams=True) succeeded as if complete, silently
    missing containment pairs with pre-upgrade documents."""
    import pytest
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.streaming.events import (
        run_stream_artifact_update,
    )

    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 20)
        .localCheckpoint(eager=True)
    )
    docs.coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # generation 1: no gram maintenance — snapshot has sigs/fps only
    run_stream_artifact_update(stream(), state, str(tmp_path / "ckpt"))
    # flipping gram_n on against that state must refuse loudly,
    # naming the backfill utility
    with pytest.raises(Exception, match="backfill_gram_table"):
        run_stream_artifact_update(
            stream(), state, str(tmp_path / "ckpt2"), gram_n=4
        )


def test_backfill_gram_table_closes_the_upgrade_path(spark, tmp_path):
    """backfill_gram_table: the one-time upgrade the gram trap points
    to — grams over the FULL stored corpus commit atomically alongside
    the parent's sigs/fps as a new generation; a partial corpus raises
    (the silent-missing-pairs hazard the trap exists for); an
    already-grammed lineage raises; and the stream then resumes WITH
    gram_n, advancing the backfilled table incrementally."""
    import pytest
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.dedup import (
        build_gram_table,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        backfill_gram_table,
        read_corpus_artifacts,
        run_stream_artifact_update,
    )

    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 20)
        .localCheckpoint(eager=True)
    )
    docs.coalesce(1).write.parquet(src)

    def stream(path=src):
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    # gram-less lineage
    run_stream_artifact_update(stream(), state, str(tmp_path / "ckpt"))

    # partial corpus: refuse — a partial gram table would silently
    # drop containment pairs against the missing docs
    with pytest.raises(ValueError, match="missing"):
        backfill_gram_table(docs.filter(F.col("doc_id") < 5), state,
                            gram_n=4)

    snap = backfill_gram_table(docs, state, gram_n=4)
    assert "corpusart" in snap
    sigs, fps, grams = read_corpus_artifacts(spark, state, with_grams=True)
    want = sorted(
        map(tuple, build_gram_table(docs, 4, "doc_id", "text").collect())
    )
    assert sorted(map(tuple, grams.collect())) == want

    # idempotence guard: a second backfill has nothing to do
    with pytest.raises(ValueError, match="already"):
        backfill_gram_table(docs, state, gram_n=4)

    # resuming with DIFFERENT gram geometry is refused before commit —
    # a silent mismatch would leave historical docs unmatched in every
    # future containment join
    more = docs.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.concat("text", F.lit(" anew")).alias("text"),
    ).localCheckpoint(eager=True)
    src2 = str(tmp_path / "doc_feed2")
    more.coalesce(1).write.parquet(src2)
    with pytest.raises(Exception, match="geometry"):
        run_stream_artifact_update(
            stream(src2), state, str(tmp_path / "ckpt_badgeom"), gram_n=5
        )
    with pytest.raises(Exception, match="geometry"):
        run_stream_artifact_update(
            stream(src2), state, str(tmp_path / "ckpt_badgeom2"),
            gram_n=4, gram_portable=False,
        )

    # the stream now resumes WITH gram_n and advances the grams
    run_stream_artifact_update(
        stream(src2), state, str(tmp_path / "ckpt3"), gram_n=4
    )
    _, _, grams2 = read_corpus_artifacts(spark, state, with_grams=True)
    want2 = sorted(
        map(
            tuple,
            build_gram_table(
                docs.unionByName(more), 4, "doc_id", "text"
            ).collect(),
        )
    )
    assert sorted(map(tuple, grams2.collect())) == want2


@pytest.mark.slow
def test_stream_embedding_update_maintains_normalized_state(
    spark, tmp_path
):
    """Streaming maintenance of the embedding dedup state: a two-batch
    drain equals build_embedding_sig_tables_normalized over every
    streamed vector, published atomically as one (vectors, buckets)
    snapshot generation; a replay from a fresh checkpoint changes
    nothing; the streamed state feeds
    incremental_embedding_near_dup_normalized directly (matching the
    full recompute filtered to new-involving pairs); and resuming with
    different geometry raises before anything commits."""
    import pytest
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_tables_normalized,
        embedding_near_dup_pairs,
        incremental_embedding_near_dup_normalized,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        read_embedding_artifacts,
        run_stream_embedding_update,
    )

    state = str(tmp_path / "embart")
    src = str(tmp_path / "vec_feed")
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        .filter(F.col("vec_id") < 60)
        .localCheckpoint(eager=True)
    )
    b1 = emb.filter(F.col("vec_id") < 30)
    b2 = emb.filter(F.col("vec_id") >= 30)
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    kw = dict(num_planes=6, n_probes=2)
    run_stream_embedding_update(
        stream(), state, str(tmp_path / "ckpt"), **kw
    )
    vectors, buckets = read_embedding_artifacts(spark, state)
    want_v, want_b = build_embedding_sig_tables_normalized(emb, **kw)
    key = lambda r: tuple(  # noqa: E731 — arrays → tuples for sorting
        tuple(x) if isinstance(x, list) else x for x in r
    )
    assert sorted(map(key, vectors.collect())) == sorted(
        map(key, want_v.collect())
    )
    assert sorted(map(key, buckets.collect())) == sorted(
        map(key, want_b.collect())
    )

    # replay from a fresh checkpoint: identical final state
    run_stream_embedding_update(
        stream(), state, str(tmp_path / "ckpt2"), **kw
    )
    v2, b2_ = read_embedding_artifacts(spark, state)
    assert v2.count() == vectors.count()
    assert b2_.count() == buckets.count()

    # the streamed state feeds the normalized-native delta directly
    new = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1) + F.lit(0.001) * ((i % 3) - 1)),
        ).alias("embedding"),
    )
    got = sorted(map(tuple, incremental_embedding_near_dup_normalized(
        v2, b2_, new, threshold=0.9, **kw).collect()))
    full = embedding_near_dup_pairs(
        emb.unionByName(new), threshold=0.9, **kw
    )
    want_pairs = sorted(map(tuple, full.filter(
        (F.col("id_a") >= 500000) | (F.col("id_b") >= 500000)
    ).collect()))
    assert got == want_pairs and got

    # geometry mismatch on resume refuses before committing
    with pytest.raises(Exception, match="num_planes"):
        run_stream_embedding_update(
            stream(), state, str(tmp_path / "ckpt3"),
            num_planes=8, n_probes=2,
        )


@pytest.mark.slow
def test_stream_classifier_counts_maintenance(spark, tmp_path):
    """Streaming maintenance of the classifier's additive count
    statistics: a two-batch drain equals train_bow_counts over every
    streamed doc (counts are additive — merge parity is exact), the
    derived weights equal the batch-trained model byte for byte, a
    FRESH checkpoint against existing state raises (batch ids restart
    at 0 — the replay guard would silently skip new batches), and a
    mismatched n_buckets raises before anything commits."""
    import pytest
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.classify import (
        bow_weights_from_counts,
        train_bow_classifier,
        train_bow_counts,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        read_classifier_counts,
        run_stream_classifier_update,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", (F.col("lang") == "en").alias("label"))
        .filter(F.col("doc_id") < 120)
        .localCheckpoint(eager=True)
    )
    d1 = docs.filter(F.col("doc_id") < 60)
    d2 = docs.filter(F.col("doc_id") >= 60)
    state = str(tmp_path / "clf_state")
    src = str(tmp_path / "clf_feed")
    ckpt = str(tmp_path / "clf_ckpt")
    d1.coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run_stream_classifier_update(
        stream(), state, ckpt, n_buckets=1 << 12
    )
    got1 = sorted(
        map(tuple, read_classifier_counts(spark, state).collect())
    )
    want1 = sorted(
        map(tuple, train_bow_counts(d1, n_buckets=1 << 12).collect())
    )
    assert got1 == want1

    # second batch through the SAME checkpoint: counts over the union
    d2.coalesce(1).write.mode("append").parquet(src)
    run_stream_classifier_update(
        stream(), state, ckpt, n_buckets=1 << 12
    )
    got2 = sorted(
        map(tuple, read_classifier_counts(spark, state).collect())
    )
    want2 = sorted(
        map(tuple, train_bow_counts(docs, n_buckets=1 << 12).collect())
    )
    assert got2 == want2

    # weights from streamed counts == the batch-trained model
    inc_model = sorted(
        map(
            tuple,
            bow_weights_from_counts(
                read_classifier_counts(spark, state)
            ).collect(),
        )
    )
    batch_model = sorted(
        map(
            tuple,
            train_bow_classifier(docs, n_buckets=1 << 12).collect(),
        )
    )
    assert inc_model == batch_model

    # fresh checkpoint against existing state: loud refusal, not a
    # silent skip of new batches
    with pytest.raises(Exception, match="checkpoint"):
        run_stream_classifier_update(
            stream(), state, str(tmp_path / "clf_ckpt_fresh"),
            n_buckets=1 << 12,
        )

    # geometry mismatch on resume: loud refusal before commit
    d1.limit(5).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text", "label"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="n_buckets"):
        run_stream_classifier_update(
            stream(), state, ckpt, n_buckets=1 << 13
        )

    # geometry mismatch must surface even when every batch is a
    # REPLAY (checkpoint committed offsets, state already folded): the
    # check runs before the batch-id skip, so the misconfiguration
    # raises on restart rather than lying dormant until new data
    import os
    import time

    def wait_queries_drained():
        # a query that terminated WITH an exception releases its
        # checkpoint lock asynchronously; starting the next run over
        # the same checkpoint too early trips Spark's concurrent-use
        # guard
        for _ in range(100):
            if not spark.streams.active:
                return
            time.sleep(0.1)

    wait_queries_drained()
    run_stream_classifier_update(  # drain the pending batch cleanly
        stream(), state, ckpt, n_buckets=1 << 12
    )
    commits = sorted(
        f
        for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    # force a replay: remove the newest commit marker AND its checksum
    # sidecar (an orphaned .crc makes Spark's checksum filesystem treat
    # the next commit write as a concurrent query)
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(Exception, match="n_buckets"):
        run_stream_classifier_update(
            stream(), state, ckpt, n_buckets=1 << 13
        )
    # and a correct-geometry run over the same replay is a no-op skip
    wait_queries_drained()
    before = sorted(
        map(tuple, read_classifier_counts(spark, state).collect())
    )
    run_stream_classifier_update(
        stream(), state, ckpt, n_buckets=1 << 12
    )
    after = sorted(
        map(tuple, read_classifier_counts(spark, state).collect())
    )
    assert after == before


@pytest.mark.slow
def test_stream_multiclass_counts_maintenance(spark, tmp_path):
    """Streaming maintenance of the MULTI-CLASS count statistics
    (shares the binary twin's guard chain — _run_stream_counts_update
    is defined once, so the replay-deletion machinery is pinned by the
    binary test): a two-batch drain equals multiclass_bow_counts over
    every streamed doc, the derived model equals train_bow_multiclass
    byte for byte, a class UNSEEN in batch one simply appears as new
    (class, bucket) rows in the fold (K is data, not geometry), a
    fresh checkpoint against existing state raises, and a mismatched
    n_buckets raises before anything commits."""
    import pytest
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.classify import (
        multiclass_bow_counts,
        multiclass_bow_weights_from_counts,
        train_bow_multiclass,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        read_multiclass_counts,
        run_stream_multiclass_update,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", F.col("lang").alias("label"))
        .filter(F.col("doc_id") < 120)
        .localCheckpoint(eager=True)
    )
    # batch 1 sees only two classes; the rest debut in batch 2
    langs = sorted(
        r["label"] for r in docs.select("label").distinct().collect()
    )
    assert len(langs) >= 3, "fixture needs 3+ classes"
    first_two = langs[:2]
    d1 = docs.filter(
        (F.col("doc_id") < 60) & F.col("label").isin(*first_two)
    )
    d2 = docs.join(d1.select("doc_id"), "doc_id", "left_anti")
    state = str(tmp_path / "mclf_state")
    src = str(tmp_path / "mclf_feed")
    ckpt = str(tmp_path / "mclf_ckpt")
    d1.coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # META rows carry a NULL class — sort None-safely
    def key(t):
        return (t[0] is None, t[0] or "") + tuple(t[1:])

    run_stream_multiclass_update(stream(), state, ckpt, n_buckets=1 << 12)
    got1 = sorted(
        map(tuple, read_multiclass_counts(spark, state).collect()), key=key
    )
    want1 = sorted(
        map(tuple, multiclass_bow_counts(d1, n_buckets=1 << 12).collect()),
        key=key,
    )
    assert got1 == want1

    # second batch through the SAME checkpoint: counts over the union,
    # the new classes' rows folded in additively
    d2.coalesce(1).write.mode("append").parquet(src)
    run_stream_multiclass_update(stream(), state, ckpt, n_buckets=1 << 12)
    stored = read_multiclass_counts(spark, state)
    got2 = sorted(map(tuple, stored.collect()), key=key)
    want2 = sorted(
        map(
            tuple, multiclass_bow_counts(docs, n_buckets=1 << 12).collect()
        ),
        key=key,
    )
    assert got2 == want2
    streamed_classes = {
        r["class"]
        for r in stored.filter(F.col("class").isNotNull())
        .select("class")
        .distinct()
        .collect()
    }
    assert streamed_classes == set(langs)  # late classes present

    # model from streamed counts == full retrain, byte for byte
    inc_model = sorted(
        map(
            tuple,
            multiclass_bow_weights_from_counts(stored).collect(),
        ),
        key=key,
    )
    batch_model = sorted(
        map(tuple, train_bow_multiclass(docs, n_buckets=1 << 12).collect()),
        key=key,
    )
    assert inc_model == batch_model

    # maintained-counts TAGGER == full-retrain tagger, composed
    # through the class router (q_daily_tagger's drained-stream twin,
    # r15): identical argmax tags/scores, identical routed mixture
    from inbev_data_engineering_case_spark.operators.classify import (
        mixture_sample_by_class,
        score_bow_multiclass,
    )

    inc_m = multiclass_bow_weights_from_counts(stored)
    full_m = train_bow_multiclass(docs, n_buckets=1 << 12)
    corpus = docs.select("doc_id", "text")

    def tags(model):
        return {
            (r["doc_id"], r["pred_class"], r["score_micro"])
            for r in score_bow_multiclass(corpus, model).collect()
        }

    assert tags(inc_m) == tags(full_m)
    ppm = {c: 1_000_000 // len(langs) for c in langs}

    def routed(model):
        return {
            (r["doc_id"], r["pred_class"])
            for r in mixture_sample_by_class(
                corpus, model, ppm, salt=5
            ).collect()
        }

    routed_inc = routed(inc_m)
    assert routed_inc and routed_inc == routed(full_m)

    # fresh checkpoint against existing state: loud refusal
    with pytest.raises(Exception, match="checkpoint"):
        run_stream_multiclass_update(
            stream(), state, str(tmp_path / "mclf_ckpt_fresh"),
            n_buckets=1 << 12,
        )

    # geometry mismatch on resume: loud refusal before commit (the
    # multiclass META row records n_buckets in its c column)
    import time

    for _ in range(100):
        if not spark.streams.active:
            break
        time.sleep(0.1)
    d1.limit(5).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text", "label"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="n_buckets"):
        run_stream_multiclass_update(
            stream(), state, ckpt, n_buckets=1 << 13
        )


@pytest.mark.slow
def test_stream_artifact_update_maintains_components_labels(
    spark, tmp_path
):
    """components=True: the connected-components label table advances
    from the document stream in the SAME atomic snapshot as sigs/fps —
    two micro-batches (the second near-duping the first's doc), the
    drained labels equal the converged batch closure over the union
    pair graph, and a full replay from a fresh checkpoint changes
    nothing (the contraction of already-reflected edges is a no-op)."""
    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components,
        minhash_dedup_pairs,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        read_corpus_artifacts,
        run_stream_artifact_update,
    )

    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    t1 = (
        "the quick brown fox jumps over the lazy dog near the barn "
        "while the farmer watches from the porch in the evening"
    )
    batch1 = spark.createDataFrame(
        [(1, t1),
         (3, "an entirely different second document about rivers and "
             "the bridges that the engineers built across the valley")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        # 11 near-dups 1 (cross-batch pair edge); 13 fresh
        [(11, t1 + " tonight"),
         (13, "a third unrelated page on the orchards and the apples "
              "that the children gather in the baskets every autumn")],
        "doc_id long, text string",
    )
    batch1.coalesce(1).write.parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run_stream_artifact_update(
        stream(), state, str(tmp_path / "ckpt"), components=True
    )
    sigs, fps, comps = read_corpus_artifacts(
        spark, state, with_components=True
    )
    got = {(r["node"], r["comp"]) for r in comps.collect()}
    want = {
        (r["node"], r["comp"])
        for r in dedup_components(
            minhash_dedup_pairs(batch1.unionByName(batch2)),
            require_convergence=True,
        ).collect()
    }
    assert got == want
    assert (1, 1) in got and (11, 1) in got  # the cross-batch cluster

    # every generation carries the labels beside sigs/fps
    import os as _os

    gens = sorted(
        d for d in _os.listdir(state) if d.startswith("corpusart_")
    )
    assert len(gens) == 2
    for g in gens:
        assert _os.path.isdir(_os.path.join(state, g, "comps"))

    # full replay: idempotent (re-applied pairs relabel nothing)
    run_stream_artifact_update(
        stream(), state, str(tmp_path / "ckpt2"), components=True
    )
    _, _, comps_r = read_corpus_artifacts(
        spark, state, with_components=True
    )
    assert {(r["node"], r["comp"]) for r in comps_r.collect()} == want


@pytest.mark.slow
def test_stream_components_upgrade_requires_backfill_and_closes(
    spark, tmp_path
):
    """Enabling components=True on an existing label-less lineage must
    raise naming backfill_components_table; the backfill commits the
    converged full-corpus closure beside the parent's sigs/fps (a
    partial corpus raises; an already-labeled lineage raises); and the
    stream then resumes WITH components=True, advancing the
    backfilled labels incrementally."""
    import pytest

    from inbev_data_engineering_case_spark.operators.dedup import (
        dedup_components,
        minhash_dedup_pairs,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        backfill_components_table,
        read_corpus_artifacts,
        run_stream_artifact_update,
    )

    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    t1 = (
        "the quick brown fox jumps over the lazy dog near the barn "
        "while the farmer watches from the porch in the evening"
    )
    batch1 = spark.createDataFrame(
        [(1, t1), (2, t1 + " quietly")],
        "doc_id long, text string",
    )
    batch1.coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # generation 1: labels off
    run_stream_artifact_update(stream(), state, str(tmp_path / "c1"))
    with pytest.raises(Exception, match="backfill_components_table"):
        run_stream_artifact_update(
            stream(), state, str(tmp_path / "c2"), components=True
        )

    # reader refuses too
    with pytest.raises(FileNotFoundError, match="comps"):
        read_corpus_artifacts(spark, state, with_components=True)

    # partial corpus raises; the full one commits
    with pytest.raises(ValueError, match="FULL stored corpus"):
        backfill_components_table(batch1.filter("doc_id = 1"), state)
    backfill_components_table(batch1, state)
    with pytest.raises(ValueError, match="already carries"):
        backfill_components_table(batch1, state)
    _, _, comps0 = read_corpus_artifacts(
        spark, state, with_components=True
    )
    assert {(r["node"], r["comp"]) for r in comps0.collect()} == {
        (1, 1), (2, 1),
    }

    # resume with components=True: a new batch near-duping doc 1 joins
    # cluster 1 through the backfilled labels
    batch2 = spark.createDataFrame(
        [(9, t1 + " again")], "doc_id long, text string"
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_stream_artifact_update(
        stream(), state, str(tmp_path / "c3"), components=True
    )
    _, _, comps1 = read_corpus_artifacts(
        spark, state, with_components=True
    )
    got = {(r["node"], r["comp"]) for r in comps1.collect()}
    want = {
        (r["node"], r["comp"])
        for r in dedup_components(
            minhash_dedup_pairs(batch1.unionByName(batch2)),
            require_convergence=True,
        ).collect()
    }
    assert got == want and (9, 1) in got


@pytest.mark.slow
def test_stream_artifact_update_maintains_halo_state(spark, tmp_path):
    """halo_benchmark=: the contamination-halo state pair advances
    from the document stream in the SAME atomic snapshot as
    sigs/fps/comps, from the SAME pair delta the label contraction
    consumes — two micro-batches (a flagged doc + its near-dup, then
    a 2-hop paraphrase and a fresh re-quote), the drained state
    equals the from-scratch pair graph + BFS over the union corpus,
    a geometry mismatch on resume raises, enabling halo on an
    existing lineage demands backfill_halo_tables, and the backfilled
    lineage advances change-sized from there."""
    import pytest

    from inbev_data_engineering_case_spark.operators.decontaminate import (
        contamination_report,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from inbev_data_engineering_case_spark.operators.graph import (
        multi_source_bfs,
    )
    from inbev_data_engineering_case_spark.streaming.events import (
        backfill_halo_tables,
        read_corpus_artifacts,
        run_stream_artifact_update,
    )

    bench_text = (
        "this exact benchmark passage with its very specific wording "
        "must never appear inside any document of the training corpus"
    )
    bench = spark.createDataFrame([(900, bench_text)],
                                  "doc_id long, text string")
    batch1 = spark.createDataFrame(
        [(1, bench_text),
         (2, bench_text + " with a small harmless tail added"),
         (3, "an entirely different second document about rivers and "
             "the bridges that the engineers built across the valley")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        # 11 near-dups 2 (2-hop chain via the flagged near-dup);
        # 13 fresh and clean
        [(11, bench_text + " with a small harmless tail added twice"),
         (13, "a third unrelated page on the orchards and the apples "
              "that the children gather in the baskets every autumn")],
        "doc_id long, text string",
    )
    union = batch1.unionByName(batch2)

    def want_state():
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(union).collect()
        }
        dist = {
            (r["node"], r["dist"])
            for r in multi_source_bfs(
                minhash_dedup_pairs(union).select("id_a", "id_b"),
                contamination_report(union, bench).select("doc_id"),
                max_hops=2,
                src_col="id_a",
                dst_col="id_b",
            ).collect()
        }
        return pairs, dist

    # ---- fresh lineage: halo + components from generation one, the
    # shared-pair-delta path
    state = str(tmp_path / "artifacts")
    src = str(tmp_path / "doc_feed")
    batch1.coalesce(1).write.parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run_stream_artifact_update(
        stream(), state, str(tmp_path / "ckpt"),
        components=True, halo_benchmark=bench,
    )
    _, _, comps, hpairs, hdist, hmeta = read_corpus_artifacts(
        spark, state, with_components=True, with_halo=True
    )
    hrow = hmeta.first()
    assert hrow["max_hops"] == 2
    # the full banding geometry rides the meta row — num_hashes too
    # (the stream ran at the operators' default)
    assert hrow["num_hashes"] == 8
    want_pairs, want_dist = want_state()
    assert {
        (r["id_a"], r["id_b"]) for r in hpairs.collect()
    } == want_pairs
    got_dist = {(r["node"], r["dist"]) for r in hdist.collect()}
    assert got_dist == want_dist
    # the 2-hop chain reached 11 through the flagged near-dup; clean
    # docs stay out
    nodes = {n for n, _ in got_dist}
    assert {1, 2, 11} <= nodes and 3 not in nodes and 13 not in nodes

    # geometry mismatch on resume: loud refusal before commit
    batch2.limit(1).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="max_hops"):
        run_stream_artifact_update(
            stream(), state, str(tmp_path / "ckpt"),
            components=True, halo_benchmark=bench, halo_hops=3,
        )

    # DISABLING a maintained artifact is refused as loudly as
    # enabling one mid-lineage: the lineage carries hdist, so a
    # restart without halo_benchmark must raise, not silently shed
    import time as _t

    for _ in range(100):
        if not spark.streams.active:
            break
        _t.sleep(0.1)
    with pytest.raises(Exception, match="silently shed"):
        run_stream_artifact_update(
            stream(), state, str(tmp_path / "ckpt_shed"),
            components=True,
        )

    # a banding-hash-count change refuses too — the stored sig rows
    # carry their geometry as size(sig), and a resume at a different
    # num_hashes would append signatures that band a different pair
    # graph (the sig-geometry guard, independent of the hmeta row)
    with pytest.raises(Exception, match="num_hashes=16"):
        run_stream_artifact_update(
            stream(), state, str(tmp_path / "ckpt_nh"),
            components=True, halo_benchmark=bench, num_hashes=16,
        )

    # ---- existing halo-less lineage: enabling demands the backfill
    import time

    for _ in range(100):
        if not spark.streams.active:
            break
        time.sleep(0.1)
    state2 = str(tmp_path / "artifacts2")
    src2 = str(tmp_path / "doc_feed2")
    batch1.coalesce(1).write.parquet(src2)

    def stream2():
        return (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src2)
        )

    run_stream_artifact_update(stream2(), state2, str(tmp_path / "c2"))
    # a fresh checkpoint replays batch1 — the upgrade guard must fire
    # on the very first (replayed) batch, before anything commits
    with pytest.raises(Exception, match="backfill_halo_tables"):
        run_stream_artifact_update(
            stream2(), state2, str(tmp_path / "c2_fresh"),
            halo_benchmark=bench,
        )
    # partial corpus refused; full corpus commits beside sigs/fps
    with pytest.raises(ValueError, match="FULL stored corpus"):
        backfill_halo_tables(batch1.limit(1), state2, bench)
    backfill_halo_tables(batch1, state2, bench)
    with pytest.raises(ValueError, match="already carries halo"):
        backfill_halo_tables(batch1, state2, bench)
    # the stream resumes with halo on, advancing change-sized
    batch2.coalesce(1).write.mode("append").parquet(src2)
    run_stream_artifact_update(
        stream2(), state2, str(tmp_path / "c2"), halo_benchmark=bench
    )
    _, _, hpairs2, hdist2, _ = read_corpus_artifacts(
        spark, state2, with_halo=True
    )
    assert {
        (r["id_a"], r["id_b"]) for r in hpairs2.collect()
    } == want_pairs
    assert {
        (r["node"], r["dist"]) for r in hdist2.collect()
    } == want_dist
