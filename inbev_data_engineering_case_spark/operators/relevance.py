"""Corpus relevance weighting: TF-IDF scoring and per-document keyword
extraction.

The reference has no analogue (its text handling stops at normalization,
SURVEY.md §2.2); this extends the training-data text-analysis family
(§7.2) with the classic corpus-statistics operator: term frequency ×
inverse document frequency, then the top-k highest-weighted terms per
document — the standard building block for keyword tagging, corpus
search, and quality/topicality features.

Scale shape (the only viable one at 100 TB):
- Tokenize → explode → ``groupBy(doc, term).count()`` builds term
  frequencies with a map-side partial aggregate, so the first exchange
  carries (doc_id, term_hashable, partial count) — not raw tokens.
- Document frequency is a second aggregate OVER THE TF TABLE (already
  distinct per (doc, term)), so the term-keyed exchange carries one row
  per (doc, term), never one per token occurrence.
- The corpus document count joins in as a broadcast single-row aggregate
  (a scalar subquery), NOT a driver-side ``.count()`` — no action at plan
  time, no literal embedded in the plan.
- TF and DF join on ``term``; both sides arrive hash-partitioned on a
  term-derived key so AQE can reuse/align the exchanges. The final
  per-document top-k is one ranking window partitioned by doc_id.

Cross-engine determinism: ranking ties are decided on the ROUNDED score
(6 decimals) with the term string as tie-break, so a last-ulp ``ln``
difference between engines cannot flip neighbor ranks — the same
discipline as the ANN score rounding in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.functions import tokens


def term_frequencies(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, term, tf)`` — occurrences of each lowercased whitespace
    token per document. One explode + one partial-aggregated exchange."""
    return (
        documents.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def bigram_lm_scores(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model quality scoring (the CCNet/KenLM-shaped
    perplexity filter, here with an add-one-smoothed bigram model trained
    on the corpus itself): ``(id_col, n_bigrams, sum_lp_micro,
    avg_logprob)`` where each bigram contributes
    ``ln((C(w1,w2) + 1) / (C(w1) + V))`` — higher average = more typical
    of the corpus; gibberish scores low, and thresholding avg_logprob is
    the perplexity filter. Documents with < 2 tokens have no bigram and
    no row.

    Scale shape: the model IS a table, never a broadcast — bigram counts
    partial-aggregate (one row per distinct bigram crosses the
    exchange); scoring joins the document's bigram stream against it on
    the bigram key, re-aggregating per document. Unigram counts and the
    vocabulary size ride along as a second aggregate and a broadcast
    1-row join. One tokenize pass feeds both training and scoring.
    Numeric determinism: each bigram's logprob is carried as a MICRO-UNIT
    int64 (``round(ln(ratio) * 1e6)`` of an exact int-ratio double), so
    the per-document sum is order-independent across any partial-
    aggregation tree, and the final mean is one IEEE division of exact
    integers — bit-identical on any engine (the same discipline as the
    PQ ADC distances)."""
    arr = documents.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_toks")
    )
    # bigrams formed IN-ROW from the token array (lambda over the tail
    # slice, predecessor by index — no posexplode self-join, no
    # occurrence-sized shuffle; same shape as pmi_collocations)
    bigrams = arr.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(_toks, 2, greatest(size(_toks) - 1, 0)), "
                "(w, i) -> struct(_toks[i] AS w1, w AS w2))"
            )
        ).alias("pr"),
    ).select(id_col, "pr.w1", "pr.w2")
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_counts = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = arr.select(
        F.explode(F.col("_toks")).alias("w")
    ).agg(F.countDistinct("w").alias("_v"))
    scored = (
        bigrams.join(big_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        .join(F.broadcast(vocab))
        .withColumn(
            "lp_micro",
            F.round(
                F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.col("_v"))
                )
                * 1_000_000
            ).cast("bigint"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp_micro").alias("sum_lp_micro"),
    ).withColumn(
        "avg_logprob",
        F.col("sum_lp_micro")
        / (F.col("n_bigrams") * F.lit(1_000_000)),
    )


def tfidf_topk(
    documents: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document:
    ``(id_col, term, tf, df, score, rnk)``.

    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` — the smoothed
    ("+1") formulation, never negative and never divides by zero, rounded
    to 6 decimals. ``rnk`` ranks within the document by (score DESC,
    term ASC); ties between equally-weighted terms are deterministic.

    The term-frequency table has two consumers (the scoring join and
    the document-frequency aggregation); it is deliberately NOT
    materialized (r15 optimization round): the duplicated subtree is a
    split-only tokenize→count (no per-gram hashing), and the A/B
    measured the materialization barrier a net LOSS on the tfidf bench
    line (1.03s → 1.25s) — the barrier costs more than the light
    re-evaluation it saves. Same verdict for the scan-parallelism
    guard, whose repartition pins the whole chain at full task count.
    """
    tf = term_frequencies(documents, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("score").desc(), F.col("term").asc())
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "score", "rnk")
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 full-text retrieval: the top-``k`` documents for a bag
    of ``query_terms`` — the ranking function behind Lucene/Elasticsearch
    relevance, and the retrieval primitive corpus curation itself uses
    (finding benchmark-adjacent or topic-adjacent documents by keyword).

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))``
    with the Lucene idf ``ln(1 + (N−df+0.5)/(df+0.5))`` (never negative).

    Scale shape — the inverted-index discipline without materializing
    one: the token stream is FILTERED TO THE QUERY TERMS before any
    aggregation, so the tf exchange carries only rows for documents
    that match at least one term (query-result-sized, not corpus-sized);
    per-term document frequencies are a ≤|q|-row broadcast; document
    lengths are computed IN-ROW (``size`` of the token array — no
    explode, no aggregation, one scan) and join the (already
    query-sized) tf side on the doc key. N and avgdl ride in as a
    broadcast 1-row aggregate, not a driver collect. The final top-k is
    one TakeOrderedAndProject.

    Numeric determinism: each (doc, term) partial score rounds to an
    int64 MICRO-unit before the per-document sum, so summation order
    can't flip a rank and a last-ulp ``ln`` difference between engines
    is absorbed by the rounding (the bigram-LM / ANN discipline). Ranks
    tie-break on ``id_col``.

    Returns ``(id_col, n_terms_matched, score_micro, rnk)``.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms is empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = documents.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    # dl in-row: size(tokens) equals the explode count exactly (empty
    # text tokenizes to [''] -> size 1; NULL text -> NULL dl, excluded
    # from avg the same way explode excluded the row)
    doc_len = documents.select(
        F.col(id_col),
        F.size(tokens(F.lower(F.col(text_col)))).alias("dl"),
    )
    stats = documents.agg(F.count("*").alias("_n")).join(
        doc_len.agg(F.avg("dl").alias("_avgdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    return _bm25_rank(tf, doc_len, stats, id_col, k, k1, b)


def _bm25_rank(
    tf: DataFrame,
    doc_len: DataFrame,
    stats: DataFrame,
    id_col: str,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 scoring/ranking tail of ``bm25_topk`` and
    ``bm25_from_index`` — one copy, so the idf formulation, micro-unit
    rounding, and tie-breaks can never drift between the scan path and
    the index path. Inputs: the query-filtered ``tf`` relation, the
    per-doc ``doc_len`` (``dl``), and a 1-row ``stats`` frame carrying
    ``_n`` and ``_avgdl``."""
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doc_len, id_col)
        .join(F.broadcast(stats))
        .withColumn(
            "score_micro",
            F.round(idf * tfn * 1_000_000).cast("bigint"),
        )
    )
    ranked = scored.groupBy(id_col).agg(
        F.count("*").alias("n_terms_matched"),
        F.sum("score_micro").alias("score_micro"),
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    # k rows to the driver-side merge — never a global single-partition
    # sort); the rank number is then assigned over just those k rows
    topk = ranked.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        id_col, "n_terms_matched", "score_micro", "rnk"
    )


def pmi_collocations(
    documents: DataFrame,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` collocations (adjacent token pairs) by pointwise mutual
    information — the corpus-statistics operator behind multi-word
    vocabulary induction ("new york", "machine learning") and tokenizer
    merge candidates: ``pmi(w1,w2) = ln(N·c12 / (c1·c2))`` over adjacent
    pairs, where high PMI means the pair co-occurs far more than its
    unigrams predict.

    ``min_count`` floors the pair count — rare pairs have wildly
    overdispersed PMI (a hapax pair of two hapax words scores ln(N)) and
    every practical collocation extractor filters them.

    Scale shape: adjacent pairs are formed in-row from the token array
    (a ``transform`` lambda over the tail slice — no posexplode
    self-join, no occurrence-sized shuffle), then one tokenize pass
    feeds pair counts and LEFT-unigram / RIGHT-unigram counts (three
    partial-aggregated exchanges over (pair)/(w1)/(w2) keys — exchange
    rows are distinct grams, never occurrences); N joins as a broadcast
    1-row aggregate; the top-k plans as TakeOrderedAndProject. PMI is
    carried as int64 MICRO-units (exact integer ratio into one ln, then
    rounded) so ranking ties are engine-stable with the (w1, w2)
    tie-break.

    Returns ``(w1, w2, pair_count, pmi_micro, rnk)``.
    """
    # adjacent pairs are formed IN-ROW from the token array (lambda over
    # the tail slice, predecessor by index) — zero shuffle; the only
    # exchanges in the whole operator are the gram-keyed aggregations
    pairs = (
        documents.select(
            tokens(F.lower(F.col(text_col))).alias("_toks")
        )
        .select(
            F.explode(
                F.expr(
                    "transform("
                    "slice(_toks, 2, greatest(size(_toks) - 1, 0)), "
                    "(w, i) -> struct(_toks[i] AS w1, w AS w2))"
                )
            ).alias("pr")
        )
        .select("pr.w1", "pr.w2")
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    left_counts = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    right_counts = pairs.groupBy("w2").agg(F.count("*").alias("c2"))
    n_pairs = pairs.agg(F.count("*").alias("_n"))
    scored = (
        pair_counts.join(left_counts, "w1")
        .join(right_counts, "w2")
        .join(F.broadcast(n_pairs))
        .withColumn(
            "pmi_micro",
            F.round(
                F.log(
                    (F.col("_n").cast("double") * F.col("c12"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                )
                * 1_000_000
            ).cast("bigint"),
        )
    )
    topk = scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "w1", "w2", F.col("c12").alias("pair_count"), "pmi_micro", "rnk"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of several retrieval rankings — the
    hybrid-search combiner (Cormack et al. 2009; what Elasticsearch /
    OpenSearch ship as `rrf`): a lexical BM25 list and an embedding
    top-k list fused into one ranking, ``score(d) = Σ_lists
    1e6 div (k + rank_l(d))``, rewarding documents several retrievers
    agree on without any score normalization across incomparable
    scales.

    Scale shape: each input is already top-k-sized (the HEAVY work —
    BM25 scan, ANN search — happened upstream in the retrievers), so
    the union + id-keyed sum here touches only ``Σ len(lists)`` rows;
    the final top-k plans as TakeOrderedAndProject and the rank window
    runs over just ``topk`` rows. Scores are exact int64 micro-units
    (floor division), so fusion order can't flip a rank; ties break on
    ``id_col``.

    Returns ``(id_col, n_lists, rrf_micro, rnk)``.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings is empty")
    if k < 1:
        raise ValueError("rrf_fuse: k must be >= 1")
    # NULL ranks (outer-joined retriever output) are dropped BEFORE the
    # union so a document is either scored by a list or not in it —
    # never counted in n_lists with no score contribution; a rank < 1
    # is a caller bug and fails loudly (it would corrupt or zero the
    # reciprocal term)
    rnk = F.col(rank_col).cast("bigint")
    guarded = F.when(
        rnk < 1,
        F.raise_error(
            F.concat(
                F.lit("rrf_fuse: ranks must be >= 1, got "),
                rnk.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(rnk)
    # each list contributes AT MOST ONE membership per document: a
    # caller passing an undeduplicated ranking (e.g. one row per
    # matched term) would otherwise inflate n_lists past len(rankings)
    # and hand the doc several reciprocal terms from one retriever —
    # collapse to the best (minimum) rank per doc before the union;
    # the inputs are top-k-sized, so the extra aggregate is free
    parts = [
        r.filter(rnk.isNotNull())
        .select(
            F.col(id_col),
            guarded.alias("_rnk"),
        )
        .groupBy(id_col)
        .agg(F.min("_rnk").alias("_rnk"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.count("*").alias("n_lists"),
        F.sum(F.expr(f"1000000 div ({k} + _rnk)")).alias("rrf_micro"),
    )
    topk_df = fused.orderBy(
        F.col("rrf_micro").desc(), F.col(id_col).asc()
    ).limit(topk)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("rrf_micro").desc(), F.col(id_col).asc())
    return topk_df.withColumn("rnk", F.row_number().over(w)).select(
        id_col, "n_lists", "rrf_micro", "rnk"
    )


TEXT_INDEX_PREFIX = "textindex"


def resolve_text_index(index_dir: str) -> str:
    """Path of the newest COMMITTED index snapshot under ``index_dir``
    (the ``textindex_<run>`` directory holding ``tf/``, ``doclen/``,
    ``stats/``). Readers always come through here, so a crashed or
    in-flight rebuild — which exists only as a hidden staging dir until
    its single atomic rename — can never hand them a mixed-generation
    index."""
    from inbev_data_engineering_case_spark.layers import latest_snapshot

    return latest_snapshot(index_dir, prefix=TEXT_INDEX_PREFIX)


def build_text_index(
    documents: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_snapshots: int | None = 2,
    cluster_by_term: int | None = None,
) -> dict[str, int]:
    """Materialize the inverted-index tables BM25 needs, once, so
    repeated queries never re-tokenize the corpus: ``tf/`` (one row per
    (doc, term) — this IS the inverted index, bucketable by term),
    ``doclen/`` (one row per doc), and ``stats/`` (1 row: N, avgdl).
    The DEPLOYMENT note's "materialize the tf table once and reuse it
    across queries" made concrete.

    One tokenize scan feeds everything: ``tf`` is the only job that
    reads document text; ``doclen`` derives from the WRITTEN tf
    (``dl = sum(tf)`` per doc — exact, because empty text tokenizes to
    ``['']`` so every non-NULL doc has tf rows; NULL-text docs have no
    rows on either derivation and are excluded from avgdl the same
    way); ``stats``' N is a column-pruned count over documents. The
    audit counts are parquet-footer-metadata reads, not scans.
    Term-partitionable: at 100 TB write ``tf`` bucketed by ``term`` so
    a query's per-term lookups touch only matching buckets.

    Publication is ATOMIC: all three tables stage under one hidden
    directory and one ``layers.commit_snapshot`` rename publishes them
    together (flock + expected-parent check), so a crash mid-build or
    a rebuild racing a serving reader can never expose tf from one
    generation with doclen/stats from another — the reader
    (``bm25_from_index``) resolves the newest COMMITTED snapshot. A
    lost commit race (another writer published first) retries against
    the new parent; the build itself is parent-independent, so no
    recompute is needed. ``keep_snapshots`` bounds disk growth across
    repeated rebuilds (None keeps all — required if readers pin old
    snapshots via ``layers.snapshot_as_of``).

    ``cluster_by_term=N`` writes ``tf`` as N term-range-sorted files
    (``repartitionByRange`` + in-partition sort), so each part file's
    parquet min/max term stats cover a DISJOINT term range and a
    query's ``term IN (...)`` pushed filter skips whole files — the
    "bucket the index by term at scale" claim made physical (the
    ``zorder_compact`` discipline applied to the inverted index; the
    file-stats test proves the disjoint spans). Delta files appended
    later by ``update_text_index`` carry their own (wider) stats;
    re-cluster on periodic rebuild.
    """
    from inbev_data_engineering_case_spark.layers import (
        commit_snapshot_with_retry,
    )

    toks = documents.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    spark = documents.sparkSession

    def write_fn(staging: str) -> None:
        out_tf = (
            tf.repartitionByRange(cluster_by_term, "term")
            .sortWithinPartitions("term")
            if cluster_by_term
            else tf
        )
        out_tf.write.parquet(f"{staging}/tf")
        doclen = (
            spark.read.parquet(f"{staging}/tf")
            .groupBy(id_col)
            .agg(F.sum("tf").alias("dl"))
        )
        doclen.write.parquet(f"{staging}/doclen")
        # N = indexed documents (one doclen row per doc) — the same
        # definition update_text_index maintains from partials. A
        # NULL-text doc would produce NO tf/doclen rows and silently
        # shift every idf away from the scan path and the oracle
        # (which count ALL docs), so indexability is ENFORCED, not
        # assumed: any unindexable document fails the build loudly
        # inside the stats job (staging never publishes) — drop
        # NULL-text docs before indexing.
        n_docs = documents.agg(
            F.count("*").alias("_nrows"),
            F.countDistinct(id_col).alias("_nd"),
        )
        stats = (
            spark.read.parquet(f"{staging}/doclen")
            .agg(F.count("*").alias("_n"), F.avg("dl").alias("_avgdl"))
            .join(F.broadcast(n_docs))
            .select(
                F.when(
                    F.col("_nrows") != F.col("_nd"),
                    F.raise_error(
                        F.concat(
                            F.lit("build_text_index: "),
                            (F.col("_nrows") - F.col("_nd")).cast("string"),
                            F.lit(
                                " duplicate doc id row(s) in the input "
                                "— their term counts would merge into "
                                "one corrupted tf entry; dedupe per "
                                "id before indexing"
                            ),
                        )
                    ).cast("bigint"),
                )
                .when(
                    F.col("_n") != F.col("_nd"),
                    F.raise_error(
                        F.concat(
                            F.lit("build_text_index: "),
                            (F.col("_nd") - F.col("_n")).cast("string"),
                            F.lit(
                                " document(s) produced no index rows "
                                "(NULL text) — N would diverge from "
                                "the corpus count and every idf with "
                                "it; filter them out before indexing"
                            ),
                        )
                    ).cast("bigint"),
                )
                .otherwise(F.col("_n"))
                .alias("_n"),
                "_avgdl",
            )
        )
        stats.write.parquet(f"{staging}/stats")

    snap = commit_snapshot_with_retry(
        index_dir, TEXT_INDEX_PREFIX, write_fn,
        keep_snapshots=keep_snapshots,
    )
    return {
        "tf_rows": spark.read.parquet(f"{snap}/tf").count(),
        "doclen_rows": spark.read.parquet(f"{snap}/doclen").count(),
        "stats_rows": 1,
    }


def bm25_from_index(
    spark,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval over a ``build_text_index`` output — per-query
    cost decoupled from the corpus: the tf scan filters to the query
    terms (term-pruned at the parquet level when the index is bucketed
    or sorted by term; ``PushedFilters`` carries ``term IN (...)``),
    df is a ≤|q|-row aggregate of the already-filtered rows, N/avgdl
    read from the 1-row stats table. Result-identical to ``bm25_topk``
    on the same corpus BY CONSTRUCTION: both paths feed the shared
    ``_bm25_rank`` scoring/ranking tail (plus the identity unit test).
    """
    if not query_terms:
        raise ValueError("bm25_from_index: query_terms is empty")
    terms = sorted({t.lower() for t in query_terms})
    # resolve ONE committed snapshot and read all three tables from it:
    # a concurrent rebuild publishes atomically elsewhere, so tf,
    # doclen, and stats here are always the same generation
    snap = resolve_text_index(index_dir)
    tf = spark.read.parquet(f"{snap}/tf").filter(
        F.col("term").isin(terms)
    )
    doc_len = spark.read.parquet(f"{snap}/doclen")
    stats = spark.read.parquet(f"{snap}/stats")
    return _bm25_rank(tf, doc_len, stats, id_col, k, k1, b)


def update_text_index(
    spark,
    index_dir: str,
    changed_docs: DataFrame,
    deleted_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_snapshots: int | None = 2,
) -> dict[str, int | str]:
    """Delta maintenance for ``build_text_index`` output — the
    daily-crawl composition the curation loop uses
    (``curate.curate_incremental`` decides WHAT changed; this applies
    it to the serving index): only ``changed_docs`` re-tokenize, the
    stored tf/doclen partials merge, and stats recompute from the
    merged doclen partials — never from raw text. Published through
    the same ``commit_snapshot`` protocol as the full build, with
    ``expected_parent`` pinned to the snapshot the delta was computed
    against, so a concurrent refresh cannot silently lose this delta
    (the loser raises ``SnapshotConflictError``; recompute against the
    new latest and retry).

    Two physical paths, chosen by what the delta touches:

    - **append** (new docs only — the common crawl case): the previous
      generation's tf/doclen part files HARD-LINK into the staged
      snapshot (zero bytes copied, audit-visible via inode identity)
      and the delta writes alongside them as extra part files — total
      work is delta-sized plus a doclen-sized stats aggregate;
    - **merge** (changed or deleted docs): stale rows for the touched
      ids anti-join out of the stored tables and the delta unions in —
      a copy-through rewrite with NO re-tokenization of history; at
      100 TB keep tf term-bucketed so the rewrite is bucket-local.

    Returns audit metadata incl. which path ran (``mode``) and the
    published snapshot path.
    """
    from inbev_data_engineering_case_spark.layers import (
        commit_snapshot,
        link_parquet_files,
        next_run_after,
        prune_snapshots,
        run_id_of,
    )

    parent_snap = resolve_text_index(index_dir)
    # expected_parent derives from the PATH WE READ, never a second
    # directory walk: a commit landing between the two would otherwise
    # pass the expected-parent check against a generation this delta
    # was NOT computed from — silently dropping the interleaved delta,
    # the exact failure the protocol exists to prevent
    parent = run_id_of(parent_snap, TEXT_INDEX_PREFIX)
    run_id = next_run_after(parent)

    toks = changed_docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    delta_tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    delta_doclen = delta_tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))

    touched = changed_docs.select(id_col)
    if deleted_ids is not None:
        touched = touched.unionByName(deleted_ids.select(id_col))
    prev_doclen = spark.read.parquet(f"{parent_snap}/doclen")
    # one doc-id-column pass over the doc-sized doclen table decides the
    # physical path; pure-new deltas (overlap 0, no deletes) take the
    # link+append path and never touch stored bytes
    overlap = (
        prev_doclen.join(touched, id_col, "left_semi").limit(1).count()
    )
    append_only = overlap == 0 and deleted_ids is None

    def write_fn(staging: str) -> None:
        if append_only:
            link_parquet_files(f"{parent_snap}/tf", f"{staging}/tf")
            link_parquet_files(
                f"{parent_snap}/doclen", f"{staging}/doclen"
            )
            delta_tf.write.mode("append").parquet(f"{staging}/tf")
            delta_doclen.write.mode("append").parquet(
                f"{staging}/doclen"
            )
        else:
            prev_tf = spark.read.parquet(f"{parent_snap}/tf")
            merged_tf = prev_tf.join(
                touched, id_col, "left_anti"
            ).unionByName(delta_tf)
            merged_tf.write.parquet(f"{staging}/tf")
            merged_doclen = prev_doclen.join(
                touched, id_col, "left_anti"
            ).unionByName(delta_doclen)
            merged_doclen.write.parquet(f"{staging}/doclen")
        # stats recompute from the MERGED doclen partials (doc-sized),
        # never from raw text: N is the doclen row count and avgdl its
        # mean — the same definition build_text_index writes, so delta
        # maintenance and full rebuild agree exactly. The delta's own
        # indexability is enforced like the full build's (history was
        # validated when ITS generation published):
        d_docs = changed_docs.agg(
            F.count("*").alias("_ndrows"),
            F.countDistinct(id_col).alias("_ndd"),
        )
        d_idx = delta_doclen.agg(F.count("*").alias("_ndi"))
        stats = (
            spark.read.parquet(f"{staging}/doclen")
            .agg(F.count("*").alias("_n"), F.avg("dl").alias("_avgdl"))
            .join(F.broadcast(d_docs))
            .join(F.broadcast(d_idx))
            .select(
                F.when(
                    F.col("_ndrows") != F.col("_ndd"),
                    F.raise_error(
                        F.concat(
                            F.lit("update_text_index: "),
                            (F.col("_ndrows") - F.col("_ndd")).cast(
                                "string"
                            ),
                            F.lit(
                                " duplicate doc id row(s) in the "
                                "delta — dedupe per id before "
                                "updating"
                            ),
                        )
                    ).cast("bigint"),
                )
                .when(
                    F.col("_ndd") != F.col("_ndi"),
                    F.raise_error(
                        F.concat(
                            F.lit("update_text_index: "),
                            (F.col("_ndd") - F.col("_ndi")).cast("string"),
                            F.lit(
                                " changed document(s) produced no "
                                "index rows (NULL text) — filter "
                                "them out before updating"
                            ),
                        )
                    ).cast("bigint"),
                )
                .otherwise(F.col("_n"))
                .alias("_n"),
                "_avgdl",
            )
        )
        stats.write.parquet(f"{staging}/stats")

    snap = commit_snapshot(
        index_dir,
        run_id,
        write_fn,
        expected_parent=parent,
        prefix=TEXT_INDEX_PREFIX,
    )
    if keep_snapshots:
        prune_snapshots(index_dir, TEXT_INDEX_PREFIX, keep_snapshots)
    return {
        "mode": "append" if append_only else "merge",
        "snapshot": snap,
        "tf_rows": spark.read.parquet(f"{snap}/tf").count(),
        "doclen_rows": spark.read.parquet(f"{snap}/doclen").count(),
        "stats_rows": 1,
    }


def compact_text_index(
    spark,
    index_dir: str,
    cluster_by_term: int = 8,
    keep_snapshots: int | None = 2,
) -> dict[str, int | str]:
    """Periodic re-clustering of a delta-maintained index — the
    maintenance step the daily loop schedules weekly: days of
    ``update_text_index`` appends leave ``tf`` as the original
    clustered files PLUS small wide-span delta files whose min/max
    stats prune nothing. This rewrites ``tf`` as ``cluster_by_term``
    term-range-sorted files (disjoint spans again) WITHOUT
    re-tokenizing anything — it reads the stored tf rows, never
    document text — and carries doclen/stats through as hard links
    (their content is term-order-independent). Published as a new
    committed snapshot through the same atomic protocol; query results
    are identical before and after by construction (same rows, new
    file layout).
    """
    from inbev_data_engineering_case_spark.layers import (
        commit_snapshot,
        link_parquet_files,
        next_run_after,
        prune_snapshots,
        run_id_of,
    )

    if cluster_by_term < 1:
        raise ValueError("compact_text_index: cluster_by_term must be >= 1")
    parent_snap = resolve_text_index(index_dir)
    parent = run_id_of(parent_snap, TEXT_INDEX_PREFIX)
    run_id = next_run_after(parent)
    tf = spark.read.parquet(f"{parent_snap}/tf")

    def write_fn(staging: str) -> None:
        (
            tf.repartitionByRange(cluster_by_term, "term")
            .sortWithinPartitions("term")
            .write.parquet(f"{staging}/tf")
        )
        link_parquet_files(f"{parent_snap}/doclen", f"{staging}/doclen")
        link_parquet_files(f"{parent_snap}/stats", f"{staging}/stats")

    snap = commit_snapshot(
        index_dir,
        run_id,
        write_fn,
        expected_parent=parent,
        prefix=TEXT_INDEX_PREFIX,
    )
    if keep_snapshots:
        prune_snapshots(index_dir, TEXT_INDEX_PREFIX, keep_snapshots)
    return {
        "snapshot": snap,
        "tf_rows": spark.read.parquet(f"{snap}/tf").count(),
    }
