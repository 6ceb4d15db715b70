"""Probe: every r8 incremental dedup twin pays for the DELTA, not the
corpus.

The three stored-state delta forms added in r8 —
``incremental_containment_pairs``, ``incremental_simhash_near_pairs``,
``incremental_embedding_near_dup`` — claim the same contract
``curate_incremental`` established: a daily crawl joins precomputed
state tables (gram / simhash / sign-LSH), the historical corpus is
never re-tokenized or re-hashed, and the result is EXACTLY the full
recompute's new-involving rows (parity is pinned by pytest; this probe
prices the claim).

For each family, at sf0.1 (or $SPARK_GRAFT_SF_DIR): time the FULL
recompute over corpus+delta versus the INCREMENTAL run of the delta
against the prebuilt state (state build time reported separately — it
is the amortized once-per-corpus cost, not the daily cost). Wall-clock
wins at this toy scale are bounded by per-job fixed overhead; what
must hold and is asserted is row parity, and what the numbers show is
the daily cost tracking the delta fraction, not the corpus.

Usage: python tools/delta_family_probe.py [delta_fraction_percent]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    from pyspark.sql import functions as F

    from inbev_data_engineering_case_spark.operators.dedup import (
        build_embedding_sig_table,
        build_gram_table,
        build_simhash_table,
        containment_pairs,
        embedding_near_dup_pairs,
        incremental_containment_pairs,
        incremental_embedding_near_dup,
        incremental_simhash_near_pairs,
        simhash_near_pairs,
    )
    from inbev_data_engineering_case_spark.session import get_spark

    pct = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("delta_family_probe")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    delta_docs = docs.filter(F.col("doc_id") % (100 // pct) == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat("text", F.lit(" fresh crawl suffix")).alias("text"),
    )
    n_delta = delta_docs.count()
    print(
        f"corpus {n_docs} docs, delta {n_delta} (~{pct}%), sf_dir={sf_dir}"
    )

    def involves_new(df, a, b, cutoff):
        return df.filter((F.col(a) >= cutoff) | (F.col(b) >= cutoff))

    # --- containment -----------------------------------------------------
    state, t_state = _timed(
        lambda: build_gram_table(docs, n=5).localCheckpoint(eager=True)
    )
    full, t_full = _timed(
        lambda: involves_new(
            containment_pairs(
                docs.unionByName(delta_docs), n=5, threshold_ppm=500_000
            ),
            "contained_id", "container_id", 500000,
        ).count()
    )
    inc, t_inc = _timed(
        lambda: incremental_containment_pairs(
            state, delta_docs, n=5, threshold_ppm=500_000
        ).count()
    )
    assert inc == full, (inc, full)
    print(
        f"containment: full {t_full}s vs delta {t_inc}s "
        f"(state build {t_state}s, {full} pairs, parity ok)"
    )

    # --- simhash ---------------------------------------------------------
    state, t_state = _timed(
        lambda: build_simhash_table(docs).localCheckpoint(eager=True)
    )
    full, t_full = _timed(
        lambda: involves_new(
            simhash_near_pairs(
                docs.unionByName(delta_docs), max_hamming=6
            ),
            "id_a", "id_b", 500000,
        ).count()
    )
    inc, t_inc = _timed(
        lambda: incremental_simhash_near_pairs(
            state, delta_docs, max_hamming=6
        ).count()
    )
    assert inc == full, (inc, full)
    print(
        f"simhash:     full {t_full}s vs delta {t_inc}s "
        f"(state build {t_state}s, {full} pairs, parity ok)"
    )

    # --- embedding -------------------------------------------------------
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    delta_emb = emb.filter(F.col("vec_id") % (100 // pct) == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1) + F.lit(0.001) * ((i % 3) - 1)),
        ).alias("embedding"),
    )
    state, t_state = _timed(
        lambda: build_embedding_sig_table(emb).localCheckpoint(eager=True)
    )
    full, t_full = _timed(
        lambda: involves_new(
            embedding_near_dup_pairs(
                emb.unionByName(delta_emb), threshold=0.9
            ),
            "id_a", "id_b", 500000,
        ).count()
    )
    inc, t_inc = _timed(
        lambda: incremental_embedding_near_dup(
            state, delta_emb, threshold=0.9
        ).count()
    )
    assert inc == full, (inc, full)
    print(
        f"embedding:   full {t_full}s vs delta {t_inc}s "
        f"(state build {t_state}s, {full} pairs, parity ok)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
