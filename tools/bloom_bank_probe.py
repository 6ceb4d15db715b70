"""Probe: banked vs single-row Bloom build at a LARGE geometry — the
measurement behind joins.py's 2^23-bit banking threshold.

The single-row form densifies every 64-bit word into ONE collect_list
aggregation task; at 2^30 bits that is 16.8M structs sorted and
assembled in a single task (and a 128 MB row broadcast at probe time).
The banked form groups words into bank-keyed rows, so the same densify
fans out across the shuffle's full parallelism and no row exceeds
bank_bits/8 bytes. This probe times both builds at the same num_bits
(forcing the single-row path via bank_bits=num_bits), asserts the bit
contents are IDENTICAL (bank-concatenation == the one big array), and
prints the wall ratio.

Usage: python tools/bloom_bank_probe.py [log2_bits (default 30)]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from inbev_data_engineering_case_spark.operators.joins import (  # noqa: E402
    bloom_filter_build,
)


def main() -> None:
    log2_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    num_bits = 1 << log2_bits
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("bloom-bank-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    keys = spark.range(1_000_000).select(F.col("id").alias("k"))

    def run(bank_bits, label):
        df = bloom_filter_build(keys, "k", num_bits, 5, bank_bits)
        df.count()  # untimed warm-up: codegen compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = bloom_filter_build(keys, "k", num_bits, 5, bank_bits)
            n = df.count()
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        print(f"{label}: median {dt:.2f}s  ({n} bank rows)")
        return dt, df

    banked_t, banked = run(None, f"banked build @2^{log2_bits}")
    single_t, single = run(num_bits, f"single-row build @2^{log2_bits}")

    # identity: concatenating the banks in bank order must reproduce
    # the single row's word array exactly
    one = single.collect()[0]["bf"]
    parts = sorted(banked.collect(), key=lambda r: r["bank"])
    concat = [w for r in parts for w in r["bf"]]
    assert concat == list(one), "banked bits != single-row bits"
    print(
        f"identical bits; single-row/banked wall ratio: "
        f"{single_t / banked_t:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
