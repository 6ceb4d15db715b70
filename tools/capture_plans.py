"""Capture ``explain("formatted")`` for catalog queries to files.

The optimization rounds' evidence trail: before/after physical plans for
every query touched, committed under plans/r<N>/. Usage:

    python tools/capture_plans.py <out_dir> <suffix> [query ...]

With no query names, captures every bench-headline entry. ``suffix`` is
appended to each file name (e.g. ``before`` -> ``q_gold_agg_before.txt``).
Plans are captured at the bench scale factor ($SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1) so scan stats match what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from inbev_data_engineering_case_spark.queries import CATALOG
    from inbev_data_engineering_case_spark.session import get_spark

    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or [
        n for n, spec in CATALOG.items() if spec.headline
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
