"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the noop sink (no collect — rows are computed
and discarded executor-side, so timing measures the plan, not driver
materialization). A warm-up run of the flagship query amortizes session/JIT
startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inbev_data_engineering_case_spark.queries import CATALOG  # noqa: E402
from inbev_data_engineering_case_spark.session import get_spark  # noqa: E402


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = CATALOG[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")

    headline = [n for n, spec in CATALOG.items() if spec.headline]
    run_query(spark, headline[0], sf_dir)  # warm-up: JVM/JIT/codegen caches

    timings: dict[str, float] = {}
    for name in headline:
        timings[name] = round(run_query(spark, name, sf_dir), 3)
    total = round(sum(timings.values()), 3)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
