"""Probe: shuffle bytes of the normalized-NATIVE incremental embedding
path vs reassembling the denormalized shape first.

``incremental_embedding_near_dup_normalized`` forms candidates on
16-byte (id, bucket) rows and joins the (id, v) vector table only for
surviving pairs; the reassembled path (join_embedding_sig_tables + the
denormalized operator) carries every stored vector through every
per-seed bucket exchange. This probe runs both at sf0.1 / n_probes=3,
reads stage-level shuffle-write bytes from the UI REST API (the public
metrics surface; deltas bracketed per run), asserts the pair sets are
identical, and prints one comparison line — the number quoted in the
operator's docstring.

Run: python tools/embedding_norm_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages"
    stages = json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_table,
        build_embedding_sig_tables_normalized,
        incremental_embedding_near_dup,
        incremental_embedding_near_dup_normalized,
        join_embedding_sig_tables,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        .localCheckpoint(eager=True)
    )
    n = emb.count()
    new = (
        emb.filter(F.col("vec_id") % 20 == 0)
        .select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x * (F.lit(1) + F.lit(0.001) * ((i % 3) - 1)),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    kw = dict(threshold=0.9, num_planes=8, n_probes=3)

    denorm = build_embedding_sig_table(
        emb, num_planes=8, n_probes=3
    ).localCheckpoint(eager=True)
    vectors, buckets = build_embedding_sig_tables_normalized(
        emb, num_planes=8, n_probes=3
    )
    vectors = vectors.localCheckpoint(eager=True)
    buckets = buckets.localCheckpoint(eager=True)

    runs = {}
    for label, frame in (
        (
            "reassembled_denorm",
            lambda: incremental_embedding_near_dup(
                join_embedding_sig_tables(vectors, buckets), new, **kw
            ),
        ),
        (
            "normalized_native",
            lambda: incremental_embedding_near_dup_normalized(
                vectors, buckets, new, **kw
            ),
        ),
    ):
        frame().write.format("noop").mode("overwrite").save()  # warm-up
        b0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        frame().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        runs[label] = (shuffle_write_bytes(spark) - b0, dt)
        # the sanity collect is outside the measured bracket
    want = sorted(
        map(
            tuple,
            incremental_embedding_near_dup(denorm, new, **kw).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            incremental_embedding_near_dup_normalized(
                vectors, buckets, new, **kw
            ).collect(),
        )
    )
    assert got == want and got, "parity broke"

    (db, dt), (nb, nt) = runs["reassembled_denorm"], runs["normalized_native"]
    print(
        f"embedding-norm-probe {os.path.basename(sf_dir)}: vectors={n} "
        f"new={new.count()} pairs={len(got)} n_probes=3 | shuffle-write "
        f"reassembled_denorm={db / 1e6:.1f}MB ({dt:.2f}s) vs "
        f"normalized_native={nb / 1e6:.1f}MB ({nt:.2f}s) — "
        f"{db / max(nb, 1):.1f}x less shuffled; the vector payload only "
        f"crosses an exchange for actual candidates"
    )


if __name__ == "__main__":
    main()
