"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the noop sink (no collect — rows are computed
and discarded executor-side, so timing measures the plan, not driver
materialization). Every query gets ONE untimed warm-up run (its first
execution pays Catalyst analysis + whole-stage codegen compile — measured
~2.2s vs ~1.0s steady-state for q_join_orders — and that compile cost is
per-plan-shape, amortized to zero on any real corpus), then the reported
number is the MEDIAN of ``RUNS_PER_QUERY`` timed runs — a single sample on
a busy machine can read 20%+ off and makes round-over-round deltas
meaningless. (Round-4's apparent q_join_orders 2.6s "regression" was
exactly this: a contended driver machine + the cold compile run landing in
a 3-run median; 9 steady-state runs on the same fixtures median 1.00s,
matching round 3.)

``stream_sink_drain`` times the events stream drained through the
idempotent foreachBatch parquet sink (streaming/events.py), so sink +
checkpoint overhead is visible alongside the in-memory-harness streaming
queries; each run uses a fresh checkpoint so every run re-processes the
full source.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inbev_data_engineering_case_spark.queries import CATALOG  # noqa: E402
from inbev_data_engineering_case_spark.session import get_spark  # noqa: E402

RUNS_PER_QUERY = 5


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = CATALOG[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_stream_sink(spark, sf_dir: str) -> float:
    """One full drain of the events stream (append-shaped projection) into
    the replay-idempotent batch_id-partitioned parquet sink."""
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.streaming.events import (
        read_events_stream,
        run_stream_to_parquet_idempotent,
    )

    out = tempfile.mkdtemp(prefix="bench_stream_sink_")
    try:
        t0 = time.perf_counter()
        cleansed = read_events_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "ts", F.col("value")
        )
        run_stream_to_parquet_idempotent(
            cleansed, f"{out}/data", f"{out}/ckpt"
        )
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def median_and_min(runs: int, fn, *args) -> tuple[float, float]:
    samples = [fn(*args) for _ in range(runs)]
    return round(statistics.median(samples), 3), round(min(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")

    headline = [n for n, spec in CATALOG.items() if spec.headline]

    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    # The indexed-retrieval entries (q_*_indexed) price the PROBE of a
    # committed snapshot — build-once/probe-many is their contract, so
    # the one-time build runs inside the untimed warm-up. Record what
    # that warm-up actually paid as a separate field so a probe line
    # can never be mistaken for (or compared against) a build-inclusive
    # one. The figure is build + one probe + codegen compile; the
    # per-side split is tools/ann_index_probe.py's job.
    index_build_costs: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        run_query(spark, name, sf_dir)  # untimed warm-up: codegen compile
        # _incremental headline entries persist their stored-state
        # table (gram table etc.) in the warm-up the same way the
        # _indexed ones build their index: one-time cost, recorded here
        if name.endswith(("_indexed", "_incremental")):
            index_build_costs[name] = round(time.perf_counter() - t0, 3)
        timings[name], mins[name] = median_and_min(
            RUNS_PER_QUERY, run_query, spark, name, sf_dir
        )
    run_stream_sink(spark, sf_dir)  # untimed warm-up
    timings["stream_sink_drain"], mins["stream_sink_drain"] = median_and_min(
        RUNS_PER_QUERY, run_stream_sink, spark, sf_dir
    )
    total = round(sum(timings.values()), 3)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # per-query minimum of the timed runs: the machine-drift
                # discriminator (a real code regression moves the MIN; a
                # contended/hot machine moves the median while the min
                # holds — the r4 q_join_orders / r5 q_curate_corpus
                # lesson, made diagnosable from the recorded JSON alone)
                "query_mins": mins,
                # one-time index build seconds paid in the UNTIMED
                # warm-up of each q_*_indexed entry (build + first
                # probe + codegen): the headline number for those
                # queries prices the probe of the committed snapshot,
                # and this field keeps the build cost visible in the
                # same artifact
                "index_build_costs": index_build_costs,
                "sf": sf,
                "runs_per_query": RUNS_PER_QUERY,
            }
        )
    )


if __name__ == "__main__":
    main()
