"""Deterministic 10× inflation of the sf0.1 fixture for core-scaling
probes (r16, VERDICT item 5: sf0.1 is orchestration-bound — prove §2
effects at a size where cores matter).

Writes <out_dir>/{documents,embeddings,events,...}.parquet where the text
and embedding tables are 10 deterministic variants of every sf0.1 row
(ids offset by i*10_000_000; text gets a per-variant token prefix so the
near-dup structure stays variant-local instead of collapsing into 10-way
exact-dup clusters; embeddings get a per-variant, per-position ±0.01%
scaling). The star-schema tables are copied as-is (the scaling probe
targets the text/embedding-heavy lines). Pure derivation from the
committed fixture at generation time — nothing is cached across runs.

Usage: python tools/make_scale_fixture.py [src_sf_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scale10"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    inflated = None
    for i in range(copies):
        v = docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.lit(f"variant{i} marker{i} "), "text").alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        inflated = v if inflated is None else inflated.unionByName(v)
    inflated.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    def perturb(i: int):
        # closure factory — a default-arg lambda changes the arity
        # PySpark infers for transform() (the repo-wide lesson)
        return lambda x, p: x.cast("double") * (
            F.lit(1.0) + F.lit(0.0001 * (i + 1)) * ((p % 5) - 2)
        )

    inflated_e = None
    for i in range(copies):
        v = emb.select(
            (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
            F.transform("embedding", perturb(i)).alias("embedding"),
        )
        inflated_e = v if inflated_e is None else inflated_e.unionByName(v)
    inflated_e.repartition(16).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    for name in os.listdir(src):
        if name in ("documents.parquet", "embeddings.parquet"):
            continue
        dst = os.path.join(out, name)
        if os.path.exists(dst):
            shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
        s = os.path.join(src, name)
        (shutil.copytree if os.path.isdir(s) else shutil.copy2)(s, dst)

    print(
        f"wrote {out}: documents x{copies} ="
        f" {spark.read.parquet(f'{out}/documents.parquet').count()} rows,"
        f" embeddings x{copies} ="
        f" {spark.read.parquet(f'{out}/embeddings.parquet').count()} rows"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
