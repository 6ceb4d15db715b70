"""Deduplication operators for the training-data pipeline: exact,
MinHash+LSH, SimHash, and n-gram Jaccard (SURVEY.md §7.2-7; north-star ops).

Scale design (the point of each implementation):

- **Exact** (``exact_dedup``): groupBy on a 64-bit content fingerprint, not
  the full text — the shuffle carries 8 bytes + the surviving key per row
  instead of whole documents. Partial aggregation dedups map-side first.
- **MinHash+LSH** (``minhash_signatures`` → ``lsh_candidate_pairs``): the
  classic shingle → K minhashes → band → bucket-join pipeline. All-pairs
  comparison is O(n²) and impossible at 100 TB; LSH banding reduces it to
  pairs that share a band bucket, i.e. expected-similar pairs only. The
  band join is a shuffle on (band_index, band_hash) — well-distributed
  because hash values are uniform; the final signature comparison happens
  only on candidates. Shingles are *word* n-grams: on corpora with a
  shared vocabulary, character shingles make unrelated documents collide
  (huge LSH buckets → the join degenerates toward all-pairs), while word
  shingles keep the random-pair Jaccard near zero. One md5 per shingle,
  then k affine mixes, instead of k md5 passes over every shingle.
- **SimHash** (``simhash``): one 60-bit signature per document via bitwise
  majority vote over token hashes; near-dup test is popcount(XOR) ≤ d.
  Pure per-row compute, no shuffle; candidate pairing buckets on the high
  bits so the self-join never goes all-pairs. 60 bits (not 64) because the
  portable hash family is 15 hex nibbles — the widest value that parses as
  a signed BIGINT in every oracle engine — so bits 60-63 of any token hash
  are always zero and could never vote; 60 is the full usable width, and
  keeping signatures below 2^60 also keeps every shift/sum sign-free in
  both engines (DuckDB raises on ``1::BIGINT << 63``).
- **n-gram Jaccard** (``jaccard_similarity``): exact set similarity used to
  *verify* LSH candidates (cheap, because candidates are few).

All hashes are the portable md5-based ``portable_hash64`` so each operator
has an exact DuckDB oracle; for engine-internal-only runs ``F.xxhash64``
would be ~3× faster and is a one-line swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.functions import (
    MH_PRIME,
    MH_RANGE,
    WS_RE,
    char_ngrams,
    minhash_mixers,
    portable_hash64,
    sql_str as _sql_str_dedup,
    word_ngrams,
)
from inbev_data_engineering_case_spark.operators.textops import (
    fingerprint,
    normalize_for_fingerprint,
)

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2
DEFAULT_SHINGLE = 5
DEFAULT_SHINGLE_WORDS = 3
# Hot-bucket cap for the banded self-joins. Boilerplate-heavy corpora
# (identical headers/templates/license blocks) can put millions of
# documents into ONE band key or SimHash bucket, making the bucket-local
# join quadratic in that bucket — the one way LSH degenerates back toward
# all-pairs at 100 TB. Buckets above the cap switch to star-linking (see
# ``_split_hot_buckets``). 10k² /2 = 5e7 comparisons is the most any
# single bucket may cost before the fallback engages.
DEFAULT_MAX_BUCKET_SIZE = 10_000


def _parse_materialize_mode(mode: str) -> tuple[str, str | None]:
    """Split a materialize-mode string into (kind, path).

    Accepted: ``"local"``, ``"checkpoint"``, ``"table:<dir>"``. One string
    so deployments can carry it in a single config value."""
    if mode in ("local", "checkpoint"):
        return mode, None
    if mode.startswith("table:") and len(mode) > len("table:"):
        return "table", mode[len("table:"):]
    raise ValueError(
        f"materialize_mode must be 'local', 'checkpoint', or "
        f"'table:<dir>'; got {mode!r}"
    )


def _materialize(df: DataFrame, mode: str = "local") -> DataFrame:
    """Compute an intermediate (signature table, scored corpus) once and
    share it across every downstream consumer. Without this, e.g. the a/b
    branches of a self-join each re-evaluate the whole shingle+hash
    subtree — doubling the dominant cost.

    This is the REPO-WIDE sharing helper: ``curate`` and ``quality``
    import it too (the underscore marks it internal to the package,
    not to this module), so the cluster-safety trade stays one config
    value everywhere.

    ``mode`` selects the cluster-safety/speed trade as CONFIG, not a code
    edit:

    - ``"local"`` (default): lazy ``localCheckpoint`` — executor-block
      storage, fastest, but blocks are lost with their executor, so a
      cluster job fails on executor loss. The single-node/test fast path.
    - ``"checkpoint"``: eager fault-tolerant ``checkpoint()`` to the
      session's checkpoint dir (requires ``sc.setCheckpointDir``; put it
      on HDFS/object store on a cluster — survives executor loss).
    - ``"table:<dir>"``: write parquet under ``<dir>`` and read it back —
      fault-tolerant, spillable, survives the session, and the rescan
      gets a fresh file-source plan (size stats for AQE/broadcast
      decisions). The 100 TB production setting; point it at the job's
      scratch prefix (swap for Delta by writing a table instead).

    Cleanup contract for ``table:`` mode: scratch tables are CALLER-owned.
    Each call writes a fresh uuid-named directory under ``<dir>`` and
    nothing deletes it automatically (a composed pipeline may still be
    reading an earlier scratch when a later one is written, so no safe
    auto-TTL exists inside this helper). Every created path is recorded in
    ``scratch_table_paths(spark)``; call ``cleanup_scratch_tables(spark)``
    after the job's terminal action, or point ``<dir>`` at a job-scoped
    prefix your orchestrator deletes — the reference's Airflow pattern —
    and skip per-path bookkeeping entirely."""
    kind, path = _parse_materialize_mode(mode)
    if kind == "local":
        return df.localCheckpoint(eager=False)
    if kind == "checkpoint":
        return df.checkpoint(eager=True)
    import uuid

    target = f"{path.rstrip('/')}/mat_{uuid.uuid4().hex}"
    df.write.parquet(target)
    spark = df.sparkSession
    scratch_table_paths(spark).append(target)
    return spark.read.parquet(target)


def scratch_table_paths(spark) -> list[str]:
    """The session-lived registry of ``table:`` scratch directories written
    by ``_materialize`` (oldest first). Mutating it is allowed — cleanup
    removes entries it deletes."""
    if not hasattr(spark, "_graft_scratch_tables"):
        spark._graft_scratch_tables = []
    return spark._graft_scratch_tables


def cleanup_scratch_tables(spark) -> list[str]:
    """Delete every registered ``table:`` scratch directory and return the
    paths removed. Uses the Hadoop FileSystem API so it works on whatever
    store the scratch prefix lives on (local, HDFS, s3a, ...). Call only
    after the job's terminal action — scratch tables back live plans."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    registry = scratch_table_paths(spark)
    removed = []
    for target in list(registry):
        p = jvm.org.apache.hadoop.fs.Path(target)
        p.getFileSystem(hconf).delete(p, True)
        registry.remove(target)
        removed.append(target)
    return removed


def _estimate_scan_splits(df: DataFrame) -> int | None:
    """Estimate how many partitions the file scan will produce, using the
    same arithmetic as Spark's ``FilePartition.maxSplitBytes`` (file sizes
    + open cost vs maxPartitionBytes). Driver-side metadata only — no
    plan-to-RDD conversion, no job. Returns None when the input isn't a
    plain file scan (leave such plans alone)."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file source / streaming
        return None
    if not files:
        return None
    # every file yields >= 1 split, so a file count at/above the target
    # parallelism already answers the question — without this, a 100 TB
    # table (~1e5-1e6 files) would trigger that many driver-side
    # getFileStatus calls; the stat loop below only ever runs on fewer
    # files than cores
    if len(files) >= spark.sparkContext.defaultParallelism:
        return len(files)
    try:
        jvm = spark._jvm
        java_utils = jvm.org.apache.spark.network.util.JavaUtils
        max_part = java_utils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
        open_cost = java_utils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4MB")
        )
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(hconf)
            total += fs.getFileStatus(path).getLen()
    except Exception:  # noqa: BLE001 — FS quirk: skip the optimization
        return None
    parallelism = spark.sparkContext.defaultParallelism
    padded = total + len(files) * open_cost
    max_split = min(max_part, max(open_cost, padded // parallelism or 1))
    return max(1, -(-padded // max_split))


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the session's core count when the scan would
    produce fewer splits. Signature computation is compute-bound per row; a
    small input file (1-2 parquet splits) would otherwise pin the whole
    stage to 1-2 cores. On a real cluster reading 100 TB the scan already
    yields thousands of splits and this is a no-op — and because the split
    count comes from file metadata (not ``df.rdd``), deciding costs no
    plan-to-RDD conversion there either."""
    target = df.sparkSession.sparkContext.defaultParallelism
    splits = _estimate_scan_splits(df)
    if splits is None:
        # Non-file source (in-memory relation, localCheckpoint, ...): fall
        # back to the plan's actual partition count. ``df.rdd`` costs a
        # driver-side plan-to-RDD conversion, which is exactly what the
        # metadata path avoids for 100 TB file scans — but non-file inputs
        # are small/local by nature, and without this a single-partition
        # createDataFrame corpus would pin the compute-bound signature
        # stage to one core.
        try:
            splits = df.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001 — e.g. streaming plans
            return df
    if splits < target:
        return df.repartition(target)
    return df


def _split_hot_buckets(
    rows: DataFrame,
    keys: list[str],
    max_bucket_size: int,
    materialize_mode: str = "local",
) -> tuple[DataFrame, DataFrame | None]:
    """Split bucketed rows into (cold, hot) by per-bucket row count;
    ``hot`` is None on the (common) empty fast path so callers keep the
    exact unguarded plan.

    The count is a groupBy with map-side partial aggregation (the exchange
    carries one row per distinct bucket per map task, never the data), and
    only buckets ABOVE the cap survive the filter — by construction at most
    ``total_rows / max_bucket_size`` of them, so the key table is tiny and
    AQE broadcasts the flagging join: the data rows themselves are never
    shuffled to be classified.

    Hot-bucket handling downstream is **star-linking**: every member pairs
    with the bucket's min-id representative only (n-1 pairs instead of
    n(n-1)/2), then passes the same exact similarity verification as a
    cold pair. This is the published-practice fallback for template-heavy
    corpora: connectivity is preserved (every member reachable through the
    representative, so connected-components grouping is unchanged for
    buckets of true duplicates — which is what hot buckets overwhelmingly
    are), while the pair count per bucket drops from quadratic to linear.
    The recall trade: a pair similar to each other but NOT to the
    representative inside a hot bucket is missed in that bucket (it can
    still surface from any other band/bucket it shares)."""
    # The common case is ZERO hot buckets, and the guard must cost almost
    # nothing there: probe the (normally empty) hot-keys aggregate with
    # isEmpty — ONE extra job running just the count aggregate, map-side
    # partial so the exchange carries one row per distinct bucket per
    # task, take(1)-bounded on the read side, and NO materialization (in
    # table:<dir> mode an unconditional _materialize would write a
    # scratch parquet table per banded join just to discover it is
    # empty). When empty, return the rows untouched so the downstream
    # self-join keeps the exact unguarded plan (no flag join on either
    # side, no empty star branch). Only corpora that actually have
    # oversized buckets materialize: the counts once (recomputing the
    # cheap aggregate the probe already ran, rather than persisting on
    # the off chance), then the flagged table once so its 4 consumers
    # (both join sides, hot, reps) share one evaluation.
    counts = (
        rows.groupBy(*keys)
        .agg(F.count("*").alias("_bucket_n"))
        .filter(F.col("_bucket_n") > max_bucket_size)
    )
    if counts.isEmpty():
        return rows, None
    counts = _materialize(counts, materialize_mode)
    flagged = _materialize(
        rows.join(counts, keys, "left"), materialize_mode
    )
    cold = flagged.filter(F.col("_bucket_n").isNull()).drop("_bucket_n")
    hot = flagged.filter(F.col("_bucket_n").isNotNull()).drop("_bucket_n")
    return cold, hot


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact near-free dedup: fingerprint → groupBy → keep min id.
    Returns (fingerprint, keep_id, n_copies). min() makes the survivor
    deterministic (the reference's dropDuplicates keeps an arbitrary row —
    unacceptable when results must be reproducible across retries/AQE)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_set(text: Column | str, n: int = DEFAULT_SHINGLE) -> Column:
    """Distinct character n-gram shingles of the normalized text."""
    return F.array_distinct(char_ngrams(normalize_for_fingerprint(text), n))


def word_shingle_set(
    text: Column | str, n: int = DEFAULT_SHINGLE_WORDS
) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    return F.array_distinct(word_ngrams(normalize_for_fingerprint(text), n))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — sig[k] = min over shingles of
    g_k(base_hash(shingle)). Per-row compute only; no shuffle.

    One md5 per shingle (the expensive part), then ``num_hashes`` cheap
    affine mixes g_k(x) = (a_k*x + b_k) mod p over the base hash — k× less
    hashing than hashing every shingle k times, same minhash estimator
    (universal-hash family). The base-hash array is a materialized inner
    projection so the shingling itself also runs once, not per k.

    Both projections are built as SQL text and parsed with one
    ``selectExpr`` each (r16 optimization round, the ``signlsh``/
    ``simhash`` discipline): the Column-API form paid ~0.3s of py4j tree
    construction per plan build — every run of every minhash consumer —
    for the identical parsed tree (same CASE/transform shingle shape,
    same conv/md5 hash chain, same int literals; value parity pinned by
    ``test_minhash_signatures_expr_parity`` and the oracle sweep)."""
    from inbev_data_engineering_case_spark.functions import (
        portable_hash64_spark_sql,
        sql_ident,
        word_ngrams_spark_sql,
    )

    norm = (
        f"regexp_replace(lower(trim({sql_ident(text_col)})),"
        f" {_sql_str_dedup(WS_RE)}, ' ')"
    )
    shingles = (
        f"array_distinct({word_ngrams_spark_sql(norm, shingle_words)})"
    )
    base = (
        f"transform({shingles},"
        f" s -> {portable_hash64_spark_sql('s')} % {MH_RANGE})"
    )
    hashed = df.selectExpr(f"{sql_ident(id_col)} AS id", f"{base} AS h")
    sig = "array(" + ", ".join(
        f"array_min(transform(h, x -> ({a} * x + {b}) % {MH_PRIME}))"
        for a, b in minhash_mixers(num_hashes)
    ) + ")"
    return hashed.selectExpr("id", f"{sig} AS sig")


def _band_keys(sig_col: str, band_size: int) -> Column:
    """array<string> of band keys: each is the ':'-joined slots of one
    ``band_size``-wide slice of the signature. One ``F.expr`` parse of
    the identical tree (r16 — the minhash_signatures discipline;
    ``sig_col`` is an unqualified column name by the string-fast-path
    contract)."""
    from inbev_data_engineering_case_spark.functions import sql_ident

    sig = sql_ident(sig_col)
    return F.expr(
        f"transform(sequence(0, CAST(floor(size({sig}) / {band_size})"
        f" AS INT) - 1), b -> concat_ws(':',"
        f" CAST(slice({sig}, b * {band_size} + 1, {band_size})"
        " AS ARRAY<STRING>)))"
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    band_size: int = DEFAULT_BAND_SIZE,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Band the signatures and self-join on (band_index, band_key):
    (id_a, id_b) candidate pairs with id_a < id_b, deduplicated.

    The band key is the concatenation of the band's signature slots; the
    join shuffles on it (uniform-hash-distributed — skew only arises from
    genuinely identical band slices, which ``max_bucket_size`` guards: see
    ``_split_hot_buckets``). Pairs sharing ≥1 band survive — the standard
    LSH recall/precision dial via band_size."""
    bands = signatures.select(
        "id",
        F.posexplode(_band_keys("sig", band_size)).alias(
            "band_idx", "band_key"
        ),
    )
    if max_bucket_size is not None:
        cold, hot = _split_hot_buckets(
            bands, ["band_idx", "band_key"], max_bucket_size
        )
    else:
        cold, hot = bands, None
    a = cold.alias("a")
    b = cold.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    if hot is not None:
        reps = hot.groupBy("band_idx", "band_key").agg(
            F.min("id").alias("rep_id")
        )
        star = (
            hot.join(reps, ["band_idx", "band_key"])
            .filter(F.col("id") != F.col("rep_id"))
            .select(
                F.col("rep_id").alias("id_a"), F.col("id").alias("id_b")
            )
        )
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def signature_similarity(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of equal minhash slots, joined back onto
    candidate pairs. Two broadcast-able joins when the signature table of
    the candidate ids is small; otherwise shuffle joins on id."""
    sig_a = signatures.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    sig_b = signatures.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            # raw IEEE division (k / num_hashes): bit-identical across
            # engines; round() tie rules are not
            (matches / F.size("sig_a")).alias("est_jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
    threshold: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    materialize_mode: str = "local",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    signature-similarity filter ≥ threshold.

    The signature array rides along through the band explode and the
    self-join, so the (expensive) shingle+hash subtree is evaluated exactly
    once and the similarity needs no join back onto the signature table —
    the naive compose (``lsh_candidate_pairs`` + ``signature_similarity``)
    evaluates signatures three times. The shuffle key is still the band
    key; each row just carries ``num_hashes`` extra longs (~64 bytes).

    Similarity is computed and thresholded BEFORE the pair-dedup
    ``distinct``: the estimate is a pure function of the pair, so the
    result is identical, but the distinct's exchange then carries 24-byte
    (id_a, id_b, est) rows instead of two full signature arrays, and
    sub-threshold candidates never enter that shuffle at all — at 100 TB
    the band join's output is the biggest intermediate in the pipeline.

    ``max_bucket_size`` is the hot-bucket guard (see ``_split_hot_buckets``):
    band buckets above the cap star-link to their min-id representative
    instead of all-pairs joining, bounding any single bucket's cost to
    linear. Star pairs pass the SAME signature-similarity threshold. None
    disables the guard (exact parity with the unguarded pipeline).

    ``materialize_mode`` picks how the signature table is shared between
    the self-join's sides (see ``_materialize``): 'local' | 'checkpoint' |
    'table:<dir>' — the cluster-safe swap is a config value."""
    sigs = _materialize(
        minhash_signatures(
            _ensure_parallelism(df), text_col, id_col, num_hashes, shingle_words
        ),
        materialize_mode,
    )
    bands = sigs.select(
        "id",
        "sig",
        F.posexplode(_band_keys("sig", band_size)).alias(
            "band_idx", "band_key"
        ),
    )

    def est(sig_a: str, sig_b: str) -> Column:
        # raw IEEE division: bit-identical across engines. One F.expr
        # parse of the identical zip_with/filter tree (r16); the names
        # are the local join aliases, so qualified refs parse exactly
        # as the F.col forms resolved.
        return F.expr(
            f"size(filter(zip_with({sig_a}, {sig_b}, (x, y) -> x = y),"
            f" eq -> eq)) / size({sig_a})"
        )

    if max_bucket_size is not None:
        cold, hot = _split_hot_buckets(
            bands, ["band_idx", "band_key"], max_bucket_size,
            materialize_mode,
        )
    else:
        cold, hot = bands, None
    a, b = cold.alias("a"), cold.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        est("a.sig", "b.sig").alias("est_jaccard"),
    )
    if hot is not None:
        # one (rep_id, rep_sig) row per hot bucket: partial min/min_by
        # aggregation map-side, so the skewed bucket never concentrates on
        # one reducer; the tiny rep table then AQE-broadcasts back onto the
        # hot rows — the hot data itself is never reshuffled
        reps = hot.groupBy("band_idx", "band_key").agg(
            F.min("id").alias("rep_id"),
            F.min_by("sig", "id").alias("rep_sig"),
        )
        star = (
            hot.join(reps, ["band_idx", "band_key"])
            .filter(F.col("id") != F.col("rep_id"))
            .select(
                F.col("rep_id").alias("id_a"),
                F.col("id").alias("id_b"),
                est("rep_sig", "sig").alias("est_jaccard"),
            )
        )
        pairs = pairs.unionByName(star)
    return pairs.filter(F.col("est_jaccard") >= threshold).distinct()


def jaccard_similarity(
    pairs: DataFrame, docs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate verification:
    |A ∩ B| / |A ∪ B| over distinct shingle sets. Shingling is the
    compute-heavy part — parallelism-guarded like the signature stages."""
    sh = _ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), shingle_set(text_col, shingle).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
    )


def token_hashes(text: Column | str) -> Column:
    """array<long> of per-token portable hashes over the lowercased text —
    the (md5-bearing, expensive) half of SimHash, split out so callers can
    project it ONCE before computing the signature. Folding it into the
    signature expression would embed the md5 transform in every per-bit
    vote and hash each token ``bits`` times."""
    from inbev_data_engineering_case_spark.functions import tokens

    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return F.transform(toks, lambda t: portable_hash64(t))


def simhash_from_hashes(hashes: Column | str, bits: int = 60) -> Column:
    """SimHash signature from a token-hash array column: bit b of the
    output is the sign of the majority vote of bit b over all hashes.
    One array aggregate with an array<long> vote accumulator — a single
    pass over the tokens regardless of ``bits``.

    Default 60 bits = the full width of ``portable_hash64`` (see module
    docstring): at billions of documents a 32-bit signature
    under-discriminates (birthday collisions at ~2^16 docs), while wider
    than 60 is impossible for this hash family — those hash bits are
    never set, so their majority vote is constant.

    With a string column name the expression is built as ONE ``F.expr``
    parse (r15 wave 3): the Column-API form cost 0.89s of py4j
    round-trips per plan build (60 mask literals + a 60-term sum chain,
    each term re-referencing the votes subtree), while the SQL form
    parses in milliseconds and references the votes array exactly once
    (bit-for-bit identical: integer votes, same per-bit majority rule,
    NULL token arrays still hash to 0 via the explicit coalesce —
    parity-tested against the Column path). The string form treats the
    name as one UNQUALIFIED top-level column — it is backtick-quoted as
    a single identifier, so a dotted name is NOT resolved as a struct
    field or alias-qualified path the way ``F.col`` would (r15 ADVICE);
    pass a Column for nested references."""
    if isinstance(hashes, str):
        h = "`" + hashes.replace("`", "``") + "`"
        masks_sql = ",".join(f"{1 << b}L" for b in range(bits))
        votes_sql = (
            f"aggregate({h}, array_repeat(CAST(0 AS BIGINT), {bits}),"
            f" (acc, hh) -> zip_with(acc, transform(array({masks_sql}),"
            " m -> CASE WHEN (hh & m) != 0 THEN CAST(1 AS BIGINT)"
            " ELSE CAST(-1 AS BIGINT) END), (a, v) -> a + v))"
        )
        return F.expr(
            f"coalesce(aggregate(zip_with({votes_sql},"
            f" sequence(0, {bits - 1}),"
            " (v, b) -> CASE WHEN v > 0 THEN"
            " shiftleft(CAST(1 AS BIGINT), b)"
            " ELSE CAST(0 AS BIGINT) END),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x),"
            " CAST(0 AS BIGINT))"
        )
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(
                    h.bitwiseAND(m) != 0, F.lit(1).cast("long")
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda a, v: a + v,
        ),
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(
            F.element_at(votes, b + 1) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash(text: Column | str, bits: int = 60) -> Column:
    """SimHash signature of a text column (see ``simhash_from_hashes``).
    Prefer the two-step form (project ``token_hashes`` first) in pipelines —
    as a single inline expression the `votes` subtree references the token
    hashing once, so this is safe, but the two-step form keeps the md5 work
    visible and shareable."""
    return simhash_from_hashes(token_hashes(text), bits)


def _truncate_lineage(
    df: DataFrame, reliable: bool, eager: bool = True
) -> DataFrame:
    """Cut the plan between iterations so it doesn't grow per round.
    ``reliable=True`` → fault-tolerant ``checkpoint()`` to the session's
    checkpoint dir (HDFS/object store on a cluster — survives executor
    loss); ``False`` → ``localCheckpoint`` (executor-block storage: fast,
    no filesystem, but recomputes-from-nothing on executor failure — the
    local/test fast path). EAGER by default: an r15 A/B tried a lazy cut
    for an intermediate whose first consumer references it TWICE in one
    plan (the jump join) and measured a 2× loss — under AQE each
    reference of a not-yet-materialized lazy checkpoint recomputes the
    subtree instead of sharing blocks. ``eager=False`` is correct ONLY
    when a single-reference action (e.g. the convergence aggregate)
    runs immediately after and materializes the blocks for every later
    consumer — that fuses the materialization barrier into an action
    the loop pays anyway (r15 wave 3)."""
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


# Per-round label tables at/below this row count take an explicit
# broadcast hint in the components loop (r16, guide §3.1 — "pick the
# join strategy deliberately"): a localCheckpoint-backed relation has no
# size statistics, so the planner sort-merge-joins a 5k-row label table
# against the edge list EVERY round; the loop, uniquely, KNOWS the exact
# node count from its own convergence aggregate, so below the limit the
# hop and jump joins broadcast the label side (the edge list — the big
# side at scale — is never shuffled per round) and above it the plan is
# byte-identical to before. 2M (node, comp) rows ≈ 32 MB framed — half
# the session's 64 MB autoBroadcastJoinThreshold.
COMPONENTS_BROADCAST_NODE_LIMIT = 2_000_000


def dedup_components_with_stats(
    pairs: DataFrame,
    max_iter: int = 25,
    reliable_checkpoint: bool | None = None,
    require_convergence: bool = False,
    broadcast_node_limit: int = COMPONENTS_BROADCAST_NODE_LIMIT,
) -> tuple[DataFrame, int]:
    """Connected components of the near-dup pair graph → ((node, comp),
    rounds_run) with comp = min node id reachable.

    Iterative min-label propagation WITH pointer jumping: each round every
    node takes the min of its own and its neighbors' labels (one hop),
    then jumps to its label's label (comp ← comp(comp) — path
    compression). The jump doubles the distance already-propagated labels
    cover, so convergence is **O(log diameter)** rounds, not O(diameter):
    a 64-node chain converges in 7 rounds where pure propagation needs 63
    — and would silently exceed ``max_iter`` and return non-minimal labels
    (the 100 TB failure mode: organic near-dup chains through shared
    boilerplate can be arbitrarily long; with jumping, 25 iterations cover
    diameter ~2^25). Each round is two shuffle joins + one groupBy, with
    lineage truncated per round.

    ``reliable_checkpoint``: None → auto (reliable iff the SparkContext has
    a checkpoint dir configured); True forces ``checkpoint()`` (cluster
    mode, requires ``sc.setCheckpointDir``); False forces
    ``localCheckpoint`` (single-node fast path).

    This is the canonical iterative-algorithm shape Spark SQL cannot express
    in one query; the DuckDB oracle uses a recursive CTE instead.
    """
    if reliable_checkpoint is None:
        sc = pairs.sparkSession.sparkContext
        reliable_checkpoint = sc.getCheckpointDir() is not None
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    # NOTE (r15 A/B): pre-partitioning this checkpoint on the hop-join
    # key (`.repartition("src")`, to spare the per-round edge shuffle)
    # measured a 1.5× LOSS on the curate lines — the fixed-width
    # repartition defeats AQE's size-adaptive coalescing and every
    # round then runs at full task width over a small table. The
    # distinct()'s own partitioning + AQE sizing is the faster shape.
    #
    # r16 restructure — ONE action per round instead of two, with every
    # cut LAZY and materialized by the convergence aggregate the loop
    # already pays (the r15 ``_truncate_lineage(eager=)`` contract,
    # applied everywhere by making every intermediate single-reference
    # at materialization time):
    #
    # - SELF-LOOPS are unioned into the (symmetrized, deduped) edge
    #   list. The hop then reads ``min(src-label) grouped by dst`` in
    #   one join — the old ``... unionByName(labels)`` self-term, which
    #   referenced the lazily-cut labels TWICE in one plan (the exact
    #   shape the r15 A/B measured as a 2× recompute loss under AQE),
    #   becomes the self-loop rows instead: same row volume into the
    #   aggregate, labels referenced ONCE.
    # - The convergence sum runs on the HOP output (neighbor_min), not
    #   the jumped labels, and the jump is SKIPPED on the no-change
    #   round: at a hop fixed point every edge (u,v) has comp(u) ==
    #   comp(v) (min over self ∪ neighbors can lower either side
    #   otherwise), so labels are uniform per component; each
    #   component contains its own minimum node m whose label can never
    #   rise above m and never names a node outside the component, so
    #   the uniform value IS m — the jump (comp ← comp(comp)) maps
    #   m → m and is the identity. Returning neighbor_min at
    #   convergence is therefore row-identical to returning the old
    #   jumped frame, and the sum-equality test fires on exactly the
    #   same round (sum(jump(x)) == sum(x) iff hop was already fixed,
    #   by the same monotonicity argument).
    # - Each round's single sum action materializes that round's lazy
    #   blocks; the lazy jumped cut from round r is computed exactly
    #   once inside round r+1's sum (single reference), after which its
    #   blocks back the jump join's two references in round r+1's plan.
    edges = _truncate_lineage(
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .unionByName(
            edges.select("src", F.col("src").alias("dst")).unionByName(
                edges.select(F.col("dst").alias("src"), "dst")
            )
        )
        .distinct(),
        reliable_checkpoint,
        eager=False,
    )
    # Fused first propagation (r15 optimization round): under identity
    # labels, round 1's neighbor-min is a pure function of the edge list
    # — nm1(v) = min(v, min neighbors(v)) — one join-free aggregate
    # instead of a full first round. With self-loops in the edge list
    # the self-term (v, v) is already present, so the aggregate reads
    # the edge table ONCE. Labels stay node ids of the component (min
    # only selects among them) and the monotone convergence argument is
    # unchanged. Lazy cut: the init label-sum right below is the
    # materializing action (single reference).
    labels = _truncate_lineage(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("comp"))
        .groupBy("node")
        .agg(F.min("comp").alias("comp")),
        reliable_checkpoint,
        eager=False,
    )

    def label_sum(lbls: DataFrame):
        # Convergence check WITHOUT a join: per-node labels are
        # monotonically non-increasing (min-propagation + jumping can
        # only lower them), so a round changed something iff the total
        # label sum strictly dropped. One narrow aggregate over the
        # cached table replaces the old jumped-vs-labels join — which at
        # scale reshuffled both full label tables every round just to
        # answer yes/no. decimal(38,0): 1e9 nodes x 1e18-max ids can
        # overflow a bigint sum, and ANSI mode makes that an error.
        # The same action also counts the nodes — the size fact the
        # broadcast gate below needs, at zero extra jobs (the count is
        # constant across rounds: hop and jump preserve the node set).
        row = lbls.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).first()
        return row["s"], row["n"]

    prev_sum, n_nodes = label_sum(labels)
    # Deliberate join strategy (guide §3.1): below the limit the label
    # side of the hop and jump joins is broadcast — the checkpointed
    # relation carries no stats, so the planner would otherwise
    # sort-merge-join it against the edge list every round. The node
    # count is EXACT (measured by the init aggregate), so the gate is
    # data-adaptive: a billion-node production graph keeps the shuffle
    # joins untouched.
    small = n_nodes is not None and n_nodes <= broadcast_node_limit

    def maybe_broadcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    rounds = 0
    # convergence is OBSERVED, not inferred: the loop must execute one
    # no-change round to know labels are minimal. require_convergence
    # turns an exhausted max_iter into a loud error instead of quietly
    # returning possibly-non-minimal labels (one cluster, several
    # representatives — the silent failure leakage_safe_split must not
    # inherit); a graph whose labels go minimal exactly on the last
    # allowed round also raises, conservatively, since the confirming
    # round never ran.
    converged = False
    for _ in range(max_iter):
        rounds += 1
        # hop: min label over self ∪ neighbors, as ONE join + aggregate
        # (self-loops supply the self term). Lazy cut, materialized by
        # this round's sum — the only action the round pays.
        lab = maybe_broadcast(labels)
        neighbor_min = _truncate_lineage(
            edges.join(lab, edges["src"] == lab["node"])
            .select(F.col("dst").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("comp")),
            reliable_checkpoint,
            eager=False,
        )
        cur_sum, _ = label_sum(neighbor_min)
        if cur_sum == prev_sum:
            # hop fixed point: the jump is the identity (see the r16
            # restructure note above) — neighbor_min IS the converged
            # minimal labeling, already materialized by the sum.
            labels = neighbor_min
            converged = True
            break
        # pointer jumping: comp <- comp(comp). Every label IS a node of the
        # graph (it started as one and min() only selects among them), so
        # the self-join always resolves; coalesce guards the root labels
        # (comp(x) == x rows are present, so it's belt-and-braces only).
        # Both references read neighbor_min's just-materialized blocks;
        # the jumped cut itself stays lazy and is computed exactly once
        # by the NEXT round's sum (where the hop references it once).
        jump_to = maybe_broadcast(
            neighbor_min.select(
                F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
            )
        )
        jumped = _truncate_lineage(
            neighbor_min.join(
                jump_to, neighbor_min["comp"] == jump_to["jnode"], "left"
            ).select(
                "node",
                F.coalesce("jcomp", "comp").alias("comp"),
            ),
            reliable_checkpoint,
            eager=False,
        )
        labels = jumped
        prev_sum = cur_sum
    if require_convergence and not converged:
        raise ValueError(
            "dedup_components: label propagation exhausted max_iter=%d"
            " without a no-change round — labels may be non-minimal"
            " (one cluster, several representatives). Raise max_iter:"
            " with pointer jumping %d rounds cover diameter ~2^%d, so"
            " hitting this means an extraordinarily deep pair graph or"
            " a too-small cap." % (max_iter, max_iter, max_iter)
        )
    return labels, rounds


def dedup_components(
    pairs: DataFrame,
    max_iter: int = 25,
    reliable_checkpoint: bool | None = None,
    require_convergence: bool = False,
) -> DataFrame:
    """See ``dedup_components_with_stats`` — this is the DataFrame-only
    convenience wrapper."""
    labels, _ = dedup_components_with_stats(
        pairs, max_iter, reliable_checkpoint, require_convergence
    )
    return labels


def dedup_components_incremental(
    stored_labels: DataFrame,
    new_pairs: DataFrame,
    max_iter: int = 25,
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """Delta maintenance of a ``dedup_components`` labeling → the full
    updated ``(node, comp)`` table, row-identical to re-running the
    batch closure over the union graph (parity-tested on random
    graphs).

    The delta-crawl hole this closes: the signature/gram/split/halo
    state all advance delta-sized, but a new crawl's pair edges can
    MERGE existing near-dup clusters, and recomputing components from
    scratch walks the FULL pair graph (the one 100 TB-sized closure in
    the pipeline). Instead, contract every stored component to its
    label and run the closure on the CONTRACTED delta graph alone:

    - map each new edge's endpoints through the stored labels
      (identity for nodes the store has never seen — a new node's
      "label" is its own id);
    - run the batch components (with observed convergence — this
      meta-graph is delta-sized, so the strict setting is cheap) on
      those mapped edges: its labels say which STORED components and
      new nodes merge, and into which minimum;
    - relabel: stored rows join the (delta-sized, broadcastable)
      meta mapping on their comp; unmapped rows keep their label.
      New nodes take their meta label directly (every new node
      appears in the meta graph — its edges put it there).

    Correct because a stored label IS the minimum node id of its
    component (the ``dedup_components`` contract — which is why
    ``stored_labels`` MUST come from a CONVERGED run;
    ``require_convergence=True`` is the provider's setting): the
    minimum over a merged super-component equals the minimum over its
    members' stored minima and the new node ids, which is exactly
    what the meta closure computes. Nodes the delta never touches
    keep their labels untouched.

    Scale shape: one label join on the delta edges, one closure over
    a delta-sized graph, one broadcast relabel join against the
    node-sized store — no full-graph work anywhere. Same output
    contract as ``dedup_components``: one row per node that appears
    in (stored ∪ delta)."""
    if reliable_checkpoint is None:
        sc = new_pairs.sparkSession.sparkContext
        reliable_checkpoint = sc.getCheckpointDir() is not None
    lab_a = stored_labels.select(
        F.col("node").alias("_na"), F.col("comp").alias("_ca")
    )
    lab_b = stored_labels.select(
        F.col("node").alias("_nb"), F.col("comp").alias("_cb")
    )
    # the delta edges feed four plan sites (two label joins, both
    # new-node projections): truncate once so a caller handing raw
    # pair-generation lineage (an LSH band self-join) never re-runs it
    e = _truncate_lineage(
        new_pairs.select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        ),
        reliable_checkpoint,
    )
    mapped = (
        e.join(lab_a, e["id_a"] == lab_a["_na"], "left")
        .join(lab_b, e["id_b"] == lab_b["_nb"], "left")
        .select(
            F.coalesce("_ca", "id_a").alias("id_a"),
            F.coalesce("_cb", "id_b").alias("id_b"),
        )
    )
    # the meta closure is delta-sized: strict convergence costs
    # nothing. Its result is already materialized (every components
    # round ends in _truncate_lineage, honoring reliable_checkpoint),
    # so both consumers below read it without extra pinning.
    meta = dedup_components(
        mapped,
        max_iter=max_iter,
        reliable_checkpoint=reliable_checkpoint,
        require_convergence=True,
    )
    remap = F.broadcast(
        meta.select(F.col("node").alias("_mn"), F.col("comp").alias("_mc"))
    )
    updated_old = (
        stored_labels.join(
            remap, stored_labels["comp"] == F.col("_mn"), "left"
        ).select("node", F.coalesce("_mc", "comp").alias("comp"))
    )
    new_nodes = (
        e.select(F.col("id_a").alias("node"))
        .unionByName(e.select(F.col("id_b").alias("node")))
        .distinct()
        .join(stored_labels.select("node"), on="node", how="left_anti")
    )
    new_labeled = new_nodes.join(remap, new_nodes["node"] == F.col("_mn")).select(
        "node", F.col("_mc").alias("comp")
    )
    return updated_old.unionByName(new_labeled)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    materialize_mode: str = "local",
) -> DataFrame:
    """Embedding-cosine near-dup: (id_a, id_b, sim) for same-sign-LSH-bucket
    pairs with cosine ≥ threshold. The bucket equi-join keeps the pair space
    bucket-local (the all-pairs O(n²) is impossible at 100 TB); near-dups
    almost always share a bucket because near-parallel vectors fall on the
    same side of most hyperplanes.

    ``n_probes > 1`` raises recall at proportional cost: the corpus is
    re-bucketed under additional independent hyperplane seeds, candidate
    pairs are unioned and deduplicated — a pair missed by one bucketing
    (a near-zero hyperplane dot flips a bit) is almost surely caught by
    another.

    ``max_bucket_size`` is the hot-bucket guard (``_split_hot_buckets``):
    embedding collapse (many identical vectors — e.g. an encoder's output
    for empty/boilerplate inputs) concentrates one bucket; above the cap
    the bucket star-links to its min-id representative with the same
    cosine ≥ threshold verify."""
    from inbev_data_engineering_case_spark.functions import cosine
    from inbev_data_engineering_case_spark.operators.similarity import (
        _vec_dim,
        signlsh_bucket,
    )

    base = _ensure_parallelism(emb)
    # literal plane weights via a 1-row dim probe (r15): bit-identical
    # buckets, per-row cost drops from planes·d md5 hashes to plain
    # multiplications
    dim = _vec_dim(emb, vec_col)
    per_probe = []
    for seed in range(n_probes):
        sigs = _materialize(
            base.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                signlsh_bucket(
                    vec_col, num_planes, seed=seed, dim=dim
                ).alias("bucket"),
            ),
            materialize_mode,
        )
        if max_bucket_size is not None:
            cold, hot = _split_hot_buckets(
                sigs, ["bucket"], max_bucket_size, materialize_mode
            )
        else:
            cold, hot = sigs, None
        a, b = cold.alias("a"), cold.alias("b")
        sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
        probe = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("sim"),
        )
        if hot is not None:
            reps = hot.groupBy("bucket").agg(
                F.min("id").alias("rep_id"),
                F.min_by("v", "id").alias("rep_v"),
            )
            star_sim = F.round(cosine(F.col("rep_v"), F.col("v")), 6)
            star = (
                hot.join(reps, ["bucket"])
                .filter(F.col("id") != F.col("rep_id"))
                .select(
                    F.col("rep_id").alias("id_a"),
                    F.col("id").alias("id_b"),
                    star_sim.alias("sim"),
                )
            )
            probe = probe.unionByName(star)
        per_probe.append(probe)
    pairs = per_probe[0]
    for p in per_probe[1:]:
        pairs = pairs.unionByName(p)
    if n_probes > 1:
        pairs = pairs.distinct()  # sim is identical across probes
    return pairs.filter(F.col("sim") >= threshold)


def _geometry_guarded(df, expected: dict[str, int], carrier: str, op: str):
    """The guarded carrier column for a stored-state table: raises
    IN-PLAN (folded into the consumed ``carrier`` — a projected-then-
    dropped guard would be pruned by Catalyst) when any geometry
    column disagrees with ``expected``. A table that predates the
    geometry columns (or isn't a state table at all) fails FAST at
    plan time with an actionable message instead of an unresolved-
    column error."""
    missing = [c for c in expected if c not in df.columns]
    if missing:
        raise ValueError(
            f"{op}: stored state table lacks geometry column(s) "
            f"{missing} — rebuild it with the current builder (build "
            "geometry rides the state so a mismatched call can raise "
            "in-plan instead of silently corrupting results)"
        )
    cond = None
    for c, v in expected.items():
        k = F.col(c) != v
        cond = k if cond is None else cond | k
    stored_desc = F.concat_ws(
        ", ", *[F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
                for c in expected]
    )
    call_desc = ", ".join(f"{c}={v}" for c, v in expected.items())
    return (
        F.when(
            cond,
            F.raise_error(
                F.concat(
                    F.lit(f"{op}: stored state table was built with ("),
                    stored_desc,
                    F.lit(f"), this call uses ({call_desc}) — a "
                          "geometry mismatch silently corrupts results"
                          " (mis-bucketed rows / mixed gram spaces); "
                          "pass the build's values or rebuild"),
                )
            ).cast(df.schema[carrier].dataType.simpleString()),
        )
        .otherwise(F.col(carrier))
        .alias(carrier)
    )


def _delta_star_links(hot, value_col: str, new_ids, measure, out_name: str):
    """Star links of COMBINED-population hot buckets that touch a new
    row — the shared hot-bucket tail of the incremental simhash and
    embedding twins. The representative is the combined min id (so a
    bucket that goes hot only with the delta splits exactly as the
    full recompute would), and "touches new" is an OR over two ids —
    expressed as two equi left-joins against a marker frame, never an
    OR-condition join (which would plan as a nested loop).
    ``measure(rep_val, val)`` produces the emitted similarity/distance
    column named ``out_name``."""
    reps = hot.groupBy("bucket").agg(
        F.min("id").alias("rep_id"),
        F.min_by(value_col, "id").alias("_rep_val"),
    )
    marks = new_ids.withColumn("_new", F.lit(True))
    hot_m = hot.join(marks, "id", "left").withColumnRenamed(
        "_new", "_member_new"
    )
    reps_m = reps.join(
        marks.withColumnRenamed("id", "rep_id"), "rep_id", "left"
    ).withColumnRenamed("_new", "_rep_new")
    return (
        hot_m.join(reps_m, ["bucket"])
        .filter(F.col("id") != F.col("rep_id"))
        .filter(
            F.col("_member_new").isNotNull()
            | F.col("_rep_new").isNotNull()
        )
        .select(
            F.col("rep_id").alias("id_a"),
            F.col("id").alias("id_b"),
            measure(F.col("_rep_val"), F.col(value_col)).alias(out_name),
        )
    )


def build_embedding_sig_table(
    emb: DataFrame,
    num_planes: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(seed, id, v, bucket, num_planes, n_probes)`` — the sign-LSH state
    ``embedding_near_dup_pairs`` buckets on, one row per (probe seed,
    vector), with the vector carried so the delta path can run the
    cosine verify without re-reading the corpus embedding table
    (``build_gram_table``'s stored-state contract applied to vectors).
    Persist bucketed by ``(seed, bucket)`` at scale so the daily delta
    join is bucket-local.

    State size: the vector rides EVERY probe row, so the table is
    ~``n_probes`` × the embedding bytes. At multi-probe production
    scale use ``build_embedding_sig_tables_normalized`` (persists
    ``(id, v)`` once + per-seed ``(seed, id, bucket, …)`` rows) with
    ``incremental_embedding_near_dup_normalized``, which consumes the
    pair NATIVELY — candidates form id-only and the vector payload
    joins only for survivors (parity-tested at ``n_probes>1``;
    measured 2.7× smaller state and ~120× less candidate-stage
    shuffle at n_probes=3 — see the normalized builder's and native
    operator's docstrings). ``join_embedding_sig_tables`` remains for
    reassembling this denormalized shape when needed."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        _vec_dim,
        signlsh_bucket,
    )

    dim = _vec_dim(emb, vec_col)  # literal plane weights (r15)
    per = [
        emb.select(
            F.lit(seed).alias("seed"),
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            signlsh_bucket(
                vec_col, num_planes, seed=seed, dim=dim
            ).alias("bucket"),
            # build geometry rides the state (the CMS wrong-geometry
            # discipline): the incremental path raises in-plan on a
            # mismatch instead of silently losing recall
            F.lit(num_planes).alias("num_planes"),
            F.lit(n_probes).alias("n_probes"),
        )
        for seed in range(n_probes)
    ]
    out = per[0]
    for p in per[1:]:
        out = out.unionByName(p)
    return out


def build_embedding_sig_tables_normalized(
    emb: DataFrame,
    num_planes: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The multi-probe storage split ``build_embedding_sig_table``'s
    docstring promises: ``(vectors, buckets)`` where ``vectors`` is
    ``(id, v)`` — each embedding stored ONCE — and ``buckets`` is the
    per-seed ``(seed, id, bucket, num_planes, n_probes)`` rows (8-byte
    bucket + geometry per probe). ``join_embedding_sig_tables`` joins
    them back into the exact denormalized shape
    ``incremental_embedding_near_dup`` consumes (parity-tested), so
    normalization is a storage choice, not an API change.

    Why: in the denormalized table the vector rides EVERY probe row,
    so state grows ~linearly in ``n_probes``. Measured on the sf0.01
    embeddings fixture (500 × 64-float vectors, snappy parquet,
    n_probes=3): denormalized 0.40 MB vs 0.15 MB normalized (0.13 MB
    vectors + 0.02 MB buckets) — 2.7× smaller, converging to
    ~``n_probes``× as probes grow. Persist BOTH tables bucketed by
    ``id`` so the join-back is bucket-local (no shuffle); the
    downstream candidate join then exchanges by (seed, bucket) exactly
    as the denormalized path does."""
    from inbev_data_engineering_case_spark.operators.similarity import (
        _vec_dim,
        signlsh_bucket,
    )

    vectors = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    dim = _vec_dim(emb, vec_col)  # literal plane weights (r15)
    per = [
        emb.select(
            F.lit(seed).alias("seed"),
            F.col(id_col).alias("id"),
            signlsh_bucket(
                vec_col, num_planes, seed=seed, dim=dim
            ).alias("bucket"),
            F.lit(num_planes).alias("num_planes"),
            F.lit(n_probes).alias("n_probes"),
        )
        for seed in range(n_probes)
    ]
    buckets = per[0]
    for p in per[1:]:
        buckets = buckets.unionByName(p)
    return vectors, buckets


def join_embedding_sig_tables(
    vectors: DataFrame, buckets: DataFrame
) -> DataFrame:
    """Reassemble the normalized ``(vectors, buckets)`` pair into the
    denormalized ``(seed, id, v, bucket, num_planes, n_probes)`` shape
    the incremental path consumes. One equi join on ``id`` — bucket
    both tables by ``id`` at write time and it is co-located."""
    return buckets.join(vectors, "id").select(
        "seed", "id", "v", "bucket", "num_planes", "n_probes"
    )


def incremental_embedding_near_dup(
    stored_sigs: DataFrame,
    new_emb: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    materialize_mode: str = "local",
) -> DataFrame:
    """Daily-crawl embedding near-dup — the delta form of
    ``embedding_near_dup_pairs``: only the NEW vectors hash; the
    historical corpus participates through its stored sign-LSH table
    (``build_embedding_sig_table`` output), and candidates form as
    (new-side sigs) × (bucket-mates) — the stored×stored quadratic
    never forms.

    Returns exactly the ``embedding_near_dup_pairs(stored ∪ new)``
    rows in which at least one side is new (full-batch parity,
    identity-tested): the hot-bucket guard is evaluated over the
    COMBINED bucket population, and a hot bucket's star links use the
    combined min-id representative — precisely as the full recompute
    would (stale-hot star links not involving a new vector are the
    full batch's new-free rows and are excluded by definition).

    Ids must be disjoint between stored and new (a re-embedded doc is
    delete + insert, ``curate_incremental``'s contract). A stored
    table built with different ``num_planes``/``n_probes`` raises
    IN-PLAN (the geometry columns ride the state): the seeds are
    deterministic, so a silent mismatch would mis-bucket every stored
    row and lose recall without any error.
    """
    from inbev_data_engineering_case_spark.functions import cosine

    new_sigs = _materialize(
        build_embedding_sig_table(
            new_emb, num_planes, n_probes, id_col, vec_col
        ).select("seed", "id", "v", "bucket"),
        materialize_mode,
    )
    new_ids = new_emb.select(F.col(id_col).alias("id"))
    stored_guarded = stored_sigs.select(
        "seed",
        "id",
        "v",
        _geometry_guarded(
            stored_sigs,
            {"num_planes": num_planes, "n_probes": n_probes},
            "bucket",
            "incremental_embedding_near_dup",
        ),
    )
    per_probe = []
    for seed in range(n_probes):
        sigs = _materialize(
            stored_guarded.filter(F.col("seed") == seed)
            .select("id", "v", "bucket")
            .unionByName(
                new_sigs.filter(F.col("seed") == seed).select(
                    "id", "v", "bucket"
                )
            ),
            materialize_mode,
        )
        if max_bucket_size is not None:
            cold, hot = _split_hot_buckets(
                sigs, ["bucket"], max_bucket_size, materialize_mode
            )
        else:
            cold, hot = sigs, None
        new_cold = cold.join(new_ids, "id", "left_semi")
        stored_cold = cold.join(new_ids, "id", "left_anti")
        sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
        # a new (covers new-new and new<stored), then stored<new —
        # the containment-incremental direction split, so no pair
        # double-counts and no stored-stored candidate ever forms
        pair_cols = [
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("sim"),
        ]
        p1 = new_cold.alias("a").join(
            cold.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(*pair_cols)
        p2 = stored_cold.alias("a").join(
            new_cold.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(*pair_cols)
        probe = p1.unionByName(p2)
        if hot is not None:
            star = _delta_star_links(
                hot,
                "v",
                new_ids,
                lambda rv, v: F.round(cosine(rv, v), 6),
                "sim",
            )
            probe = probe.unionByName(star)
        per_probe.append(probe)
    pairs = per_probe[0]
    for p in per_probe[1:]:
        pairs = pairs.unionByName(p)
    if n_probes > 1:
        pairs = pairs.distinct()  # sim is identical across probes
    return pairs.filter(F.col("sim") >= threshold)


def incremental_embedding_near_dup_normalized(
    stored_vectors: DataFrame,
    stored_buckets: DataFrame,
    new_emb: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    materialize_mode: str = "local",
) -> DataFrame:
    """``incremental_embedding_near_dup`` consuming the NORMALIZED
    ``(vectors, buckets)`` state pair natively — no reassembly join,
    and the vector payload joins ONLY for actual candidates.

    Same rows as the denormalized path (parity-tested at
    ``n_probes>1``), different shuffle profile: the denormalized form
    (or ``join_embedding_sig_tables`` + the denormalized operator)
    carries every stored vector through every per-seed bucket
    exchange — ``n_probes`` corpus-sized shuffles of the fattest
    column before a single candidate exists. Here candidates form on
    16-byte ``(id, bucket)`` rows per probe, dedup across probes
    id-only, and the ``(id, v)`` table joins in exactly twice (side a,
    side b) for the surviving pairs. Measured on the sf0.1 embeddings
    fixture at n_probes=3 (tools/embedding_norm_probe.py, UI REST
    stage metrics): 5.1 MB shuffle-written by the
    reassembled-denormalized plan vs ~0.04 MB here (~120× less) — the
    vector bytes (3 probes × corpus × 64 doubles) vanish from the
    bucket exchanges, and at this candidate count the deferred
    id-keyed vector joins broadcast instead of shuffling at all; at
    cluster scale they are two exchanges whose pair side is
    candidate-sized.

    Hot buckets, combined-population counting, min-id star
    representatives, the touches-new two-left-join discipline, and
    the in-plan geometry raise all match the denormalized twin —
    the geometry columns ride ``stored_buckets``.
    """
    from inbev_data_engineering_case_spark.functions import cosine
    from inbev_data_engineering_case_spark.operators.similarity import (
        _vec_dim,
        signlsh_bucket,
    )

    new_ids = new_emb.select(F.col(id_col).alias("id"))
    dim = _vec_dim(new_emb, vec_col)  # literal plane weights (r15)
    new_b = [
        new_emb.select(
            F.lit(seed).alias("seed"),
            F.col(id_col).alias("id"),
            signlsh_bucket(
                vec_col, num_planes, seed=seed, dim=dim
            ).alias("bucket"),
        )
        for seed in range(n_probes)
    ]
    stored_guarded = stored_buckets.select(
        "seed",
        "id",
        _geometry_guarded(
            stored_buckets,
            {"num_planes": num_planes, "n_probes": n_probes},
            "bucket",
            "incremental_embedding_near_dup_normalized",
        ),
    )
    per_probe = []
    for seed in range(n_probes):
        rows = _materialize(
            stored_guarded.filter(F.col("seed") == seed)
            .select("id", "bucket")
            .unionByName(new_b[seed].select("id", "bucket")),
            materialize_mode,
        )
        if max_bucket_size is not None:
            cold, hot = _split_hot_buckets(
                rows, ["bucket"], max_bucket_size, materialize_mode
            )
        else:
            cold, hot = rows, None
        new_cold = cold.join(new_ids, "id", "left_semi")
        stored_cold = cold.join(new_ids, "id", "left_anti")
        pair_cols = [
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        ]
        p1 = new_cold.alias("a").join(
            cold.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(*pair_cols)
        p2 = stored_cold.alias("a").join(
            new_cold.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(*pair_cols)
        probe = p1.unionByName(p2)
        if hot is not None:
            # id-only star links: same reps (combined min id), same
            # touches-new two-left-join shape as _delta_star_links,
            # with the similarity deferred to the shared vector join
            reps = hot.groupBy("bucket").agg(F.min("id").alias("rep_id"))
            marks = new_ids.withColumn("_new", F.lit(True))
            hot_m = hot.join(marks, "id", "left").withColumnRenamed(
                "_new", "_member_new"
            )
            reps_m = reps.join(
                marks.withColumnRenamed("id", "rep_id"), "rep_id", "left"
            ).withColumnRenamed("_new", "_rep_new")
            star = (
                hot_m.join(reps_m, ["bucket"])
                .filter(F.col("id") != F.col("rep_id"))
                .filter(
                    F.col("_member_new").isNotNull()
                    | F.col("_rep_new").isNotNull()
                )
                .select(
                    F.col("rep_id").alias("id_a"),
                    F.col("id").alias("id_b"),
                )
            )
            probe = probe.unionByName(star)
        per_probe.append(probe)
    pairs = per_probe[0]
    for p in per_probe[1:]:
        pairs = pairs.unionByName(p)
    if n_probes > 1:
        # id-only dedup: sim is deterministic per pair, so deduping
        # before the vector join is exactly the denormalized path's
        # post-sim distinct — minus candidate-count × vector bytes
        pairs = pairs.distinct()
    all_vecs = stored_vectors.unionByName(
        new_emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    sim = F.round(cosine(F.col("_va"), F.col("_vb")), 6)
    return (
        pairs.join(
            all_vecs.select(
                F.col("id").alias("id_a"), F.col("v").alias("_va")
            ),
            "id_a",
        )
        .join(
            all_vecs.select(
                F.col("id").alias("id_b"), F.col("v").alias("_vb")
            ),
            "id_b",
        )
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 60,
    bucket_bits: int = 8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    materialize_mode: str = "local",
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on the top ``bucket_bits`` bits
    (signature bits ``bits-bucket_bits``..``bits-1``, so the self-join is
    per-bucket, not all-pairs), then filter popcount(XOR) ≤ max_hamming.
    Note the bucket prefilter trades recall for scale exactly like LSH
    banding: 8 bucket bits → 256-way candidate split at any ``bits``.

    ``max_bucket_size`` is the hot-bucket guard (``_split_hot_buckets``):
    identical templates concentrate in ONE SimHash bucket (their top bits
    are equal by construction); above the cap the bucket star-links to its
    min-id representative, with the same popcount ≤ max_hamming verify."""
    hashed = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), token_hashes(text_col).alias("th")
    )
    sigs = _materialize(
        hashed.select("id", simhash_from_hashes("th", bits).alias("sh"))
        .withColumn("bucket", F.shiftright("sh", bits - bucket_bits)),
        materialize_mode,
    )
    if max_bucket_size is not None:
        cold, hot = _split_hot_buckets(
            sigs, ["bucket"], max_bucket_size, materialize_mode
        )
    else:
        cold, hot = sigs, None
    a, b = cold.alias("a"), cold.alias("b")
    hamming = F.bit_count(
        F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
    )
    if hot is not None:
        reps = hot.groupBy("bucket").agg(
            F.min("id").alias("rep_id"),
            F.min_by("sh", "id").alias("rep_sh"),
        )
        star_hamming = F.bit_count(
            F.col("rep_sh").bitwiseXOR(F.col("sh"))
        )
        star = (
            hot.join(reps, ["bucket"])
            .filter(F.col("id") != F.col("rep_id"))
            .filter(star_hamming <= max_hamming)
            .select(
                F.col("rep_id").alias("id_a"),
                F.col("id").alias("id_b"),
                star_hamming.alias("hamming"),
            )
        )
        pairs = pairs.unionByName(star)
    return pairs


def build_simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bucket_bits: int = 8,
) -> DataFrame:
    """``(id, sh, bucket, bits, bucket_bits)`` — the SimHash state ``simhash_near_pairs``
    self-joins on, persisted so a daily crawl never re-hashes the
    historical corpus (``build_gram_table``'s stored-state contract,
    SimHash flavor). Bucket by ``bucket`` at scale."""
    hashed = df.select(
        F.col(id_col).alias("id"), token_hashes(text_col).alias("th")
    )
    return (
        hashed.select("id", simhash_from_hashes("th", bits).alias("sh"))
        .withColumn("bucket", F.shiftright("sh", bits - bucket_bits))
        # build geometry rides the state (the CMS wrong-geometry
        # discipline): the incremental path raises in-plan on a
        # mismatch instead of silently shifting every bucket
        .withColumn("bits", F.lit(bits))
        .withColumn("bucket_bits", F.lit(bucket_bits))
    )


def incremental_simhash_near_pairs(
    stored_sigs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 60,
    bucket_bits: int = 8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    materialize_mode: str = "local",
) -> DataFrame:
    """Daily-crawl SimHash near-dup — the delta form of
    ``simhash_near_pairs``: only the NEW crawl tokenizes and hashes;
    the historical corpus participates through its stored signature
    table (``build_simhash_table`` output), candidates form as
    (new-side sigs) × (bucket-mates), and the stored×stored quadratic
    never forms.

    Returns exactly the ``simhash_near_pairs(stored ∪ new)`` rows in
    which at least one side is new (full-batch parity,
    identity-tested): the hot-bucket guard and min-id star
    representative evaluate over the COMBINED bucket population, so a
    bucket that goes hot only once the crawl lands splits precisely
    as the full recompute would. Ids must be disjoint between stored
    and new (delete + insert for re-crawls). A stored table built
    with different ``bits``/``bucket_bits`` raises IN-PLAN (the
    geometry columns ride the state): a silent mismatch would shift
    every stored bucket and lose recall without any error.
    """
    new_sigs = _materialize(
        build_simhash_table(
            new_docs, text_col, id_col, bits, bucket_bits
        ).select("id", "sh", "bucket"),
        materialize_mode,
    )
    stored_guarded = stored_sigs.select(
        "id",
        _geometry_guarded(
            stored_sigs,
            {"bits": bits, "bucket_bits": bucket_bits},
            "sh",
            "incremental_simhash_near_pairs",
        ),
        "bucket",
    )
    sigs = _materialize(
        stored_guarded.select("id", "sh", "bucket").unionByName(new_sigs),
        materialize_mode,
    )
    new_ids = new_docs.select(F.col(id_col).alias("id"))
    if max_bucket_size is not None:
        cold, hot = _split_hot_buckets(
            sigs, ["bucket"], max_bucket_size, materialize_mode
        )
    else:
        cold, hot = sigs, None
    new_cold = cold.join(new_ids, "id", "left_semi")
    stored_cold = cold.join(new_ids, "id", "left_anti")
    hamming = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    pair_cols = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        hamming.alias("hamming"),
    ]
    cond = lambda: (  # noqa: E731
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id"))
    )
    # a new (covers new-new and new<stored), then stored<new — the
    # incremental direction split: no pair double-counts, no
    # stored-stored candidate ever forms
    p1 = (
        new_cold.alias("a")
        .join(cold.alias("b"), cond())
        .filter(hamming <= max_hamming)
        .select(*pair_cols)
    )
    p2 = (
        stored_cold.alias("a")
        .join(new_cold.alias("b"), cond())
        .filter(hamming <= max_hamming)
        .select(*pair_cols)
    )
    pairs = p1.unionByName(p2)
    if hot is not None:
        star = _delta_star_links(
            hot,
            "sh",
            new_ids,
            lambda r, s: F.bit_count(r.bitwiseXOR(s)),
            "hamming",
        ).filter(F.col("hamming") <= max_hamming)
        pairs = pairs.unionByName(star)
    return pairs


def dedup_spans(
    documents: DataFrame,
    span_tokens: int = 16,
    max_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_hot: bool = True,
) -> DataFrame:
    """Span-level exact dedup WITH document reconstruction (the
    C4/Dolma cleaning step the gram profiler only reports on): slice
    each document into non-overlapping ``span_tokens``-token spans,
    drop every span whose case-folded fingerprint appears in more than
    ``max_docs`` distinct documents (boilerplate headers, license
    blocks, navigation chrome — shared verbatim across a corpus), and
    reassemble what remains in order. Case is preserved in the output;
    matching is case-folded. Output text is token-normalized (single
    spaces) — the span boundary set, not original whitespace, is the
    unit this operator guarantees.

    Returns ``(id_col, text_clean, n_spans, n_dropped)`` — one row per
    document with at least one span (NULL-text docs have none);
    ``text_clean`` is ``''`` when every span was boilerplate.

    Scale shape: spans are formed IN-ROW (``transform`` over a span
    index sequence + ``slice`` — no posexplode self-join); the only
    exchanges are the span-fingerprint aggregation (rows = distinct
    spans, 8-byte keys) and the per-doc regroup. The hot-span anti-join
    stays fp-keyed either way; ``broadcast_hot`` only picks the
    physical strategy. Default True fits the common case (the hot set
    is corpus-boilerplate-sized); at 100 TB the set SCALES WITH CORPUS
    boilerplate and can exceed any broadcast limit — set False there
    and the anti-join degrades gracefully to a shuffle on the same
    8-byte key instead of failing the job (``boilerplate_report``'s
    toggle, applied here). Documents never shuffle by content in
    either mode. Composable before the minhash banded join (drop
    boilerplate spans first, then near-dedup whole documents).
    """
    from inbev_data_engineering_case_spark.functions import (
        portable_hash64,
        tokens,
    )

    if span_tokens < 1:
        raise ValueError("dedup_spans: span_tokens must be >= 1")
    if max_docs < 1:
        raise ValueError("dedup_spans: max_docs must be >= 1")
    k = span_tokens
    arr = documents.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    # size(_toks) >= 1 always holds today (split(trim(x)) yields at
    # least ['']), but sequence(0, -1) would auto-step DOWNWARD and
    # fabricate phantom spans if a 0-length array ever arrived — guard
    # explicitly (char_ngrams' discipline) so the expression cannot
    # step negative; the empty-array arm explodes to zero rows, which
    # is exactly the oracle twin's range(0) behavior
    segs = arr.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"case when size(_toks) >= 1 then "
                f"transform(sequence(0, cast(ceil(size(_toks) / {k}.0) as int) - 1), "
                f"i -> struct(i AS seg_no, "
                f"array_join(slice(_toks, i * {k} + 1, {k}), ' ') AS seg)) "
                f"else array() end"
            )
        ).alias("s"),
    ).select(
        id_col,
        F.col("s.seg_no").alias("seg_no"),
        F.col("s.seg").alias("seg"),
        portable_hash64(F.lower(F.col("s.seg"))).alias("fp"),
    )
    hot = (
        segs.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > max_docs)
        .select("fp")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    kept = segs.join(hot, "fp", "left_anti")
    totals = segs.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seg_no", "seg"))
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            "n_spans",
            (
                F.col("n_spans") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).alias("n_dropped"),
        )
    )


def build_gram_table(
    documents: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = True,
    parallelism_guard: bool = True,
) -> DataFrame:
    """``(id_col, gram_h, n, portable)`` — each document's DISTINCT
    word-n-gram 8-byte fingerprints, the gram stream
    ``containment_pairs`` joins on and the STORED state the incremental
    containment path joins a new crawl against
    (``curate_incremental``'s stored-signature shape applied to grams:
    persist this once, then a daily crawl never re-tokenizes the
    historical corpus). Bucket by ``gram_h`` at scale so the delta
    join is bucket-local.

    ``portable=True`` (default) hashes with the md5-based
    ``portable_hash64`` so results replay in DuckDB (the oracle
    contract); pass ``portable=False`` in production for ``xxhash64``
    — the decontaminate family's measured ~1.1-1.7× cheaper hash with
    identical pair semantics (any 60-bit fingerprint space works; the
    choice rides the state as a geometry column so a delta built with
    the other hash raises in-plan instead of silently matching
    nothing)."""
    from inbev_data_engineering_case_spark.functions import (
        portable_hash64,
        word_ngrams,
    )

    gram = F.col("gram")
    # the gram pass is compute-bound per row (tokenize → windows → md5
    # per gram) — inherit the signature stages' parallelism guard so a
    # 1-2-split input file doesn't pin it to 1-2 cores (no-op at
    # cluster scan sizes; r15 optimization round, guide §2).
    # ``parallelism_guard=False`` is for DELTA callers
    # (incremental_containment_pairs): a daily-crawl fragment filtered
    # out of a big table looks like the full scan to the file-metadata
    # estimator, and force-spreading a tiny delta across every core
    # pins all downstream stages at full task count — measured 1.1s →
    # 2.6s on the incremental containment line before the opt-out.
    if parallelism_guard:
        documents = _ensure_parallelism(documents)
    return documents.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(F.lower(F.col(text_col)), n))
        ).alias("gram"),
    ).select(
        id_col,
        (portable_hash64(gram) if portable else F.xxhash64(gram)).alias(
            "gram_h"
        ),
        # build geometry rides the state (the CMS wrong-geometry
        # discipline): the incremental path raises in-plan on a
        # mismatched n (mixed gram spaces) or a mismatched hash kind
        # (a delta hashed differently would match NOTHING, silently)
        F.lit(n).alias("n"),
        F.lit(int(portable)).alias("portable"),
    )


def incremental_containment_pairs(
    stored_grams: DataFrame,
    new_documents: DataFrame,
    n: int = 5,
    threshold_ppm: int = 800_000,
    max_gram_df: int | None = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_mode: str = "local",
    broadcast_hot: bool = True,
    portable: bool = True,
) -> DataFrame:
    """Daily-crawl containment — the delta form of
    ``containment_pairs`` a pipeline actually runs each ingest: only
    the NEW documents tokenize; the historical corpus participates
    through its stored gram table (``build_gram_table`` output), and
    the candidate join is (new-side grams) × (all informative grams)
    on the 8-byte gram key — the stored×stored quadratic never forms.

    Returns exactly the ``containment_pairs(stored ∪ new)`` rows in
    which at least one side is a new document (full-batch parity,
    identity-tested): the hot-gram cap is evaluated over the COMBINED
    document frequency (stored df + delta df), so a gram that crosses
    ``max_gram_df`` only once the crawl lands is excluded — from
    numerator AND denominator of every pair, stored-side denominators
    included — precisely as the full recompute would.

    Ids must be disjoint between stored and new (a re-crawled doc is
    delete + insert, ``curate_incremental``'s contract). A stored
    table built with a different ``n`` raises IN-PLAN (the geometry
    column rides the state): mixing n-gram spaces would produce wrong
    containment values, not just missed pairs.

    Scale shape: one linear aggregation over the stored gram table for
    the combined df and denominators (table scans, no re-tokenization),
    then gram-keyed joins whose per-gram fan-out is capped at the
    combined df bound. ``broadcast_hot`` as in ``containment_pairs``.
    """
    if n < 1:
        raise ValueError("incremental_containment_pairs: n must be >= 1")
    if not 0 < threshold_ppm <= 1_000_000:
        raise ValueError(
            "incremental_containment_pairs: threshold_ppm must be in "
            "(0, 1e6]"
        )
    # parallelism_guard=False: the delta is small BY CONTRACT relative
    # to the stored state (and often a filter over a big table, which
    # the file-metadata estimator cannot distinguish from the full
    # scan) — force-spreading it across every core pins the whole
    # incremental join chain at full task count for no compute win
    new_grams = _materialize(
        build_gram_table(
            new_documents, n, id_col, text_col, portable,
            parallelism_guard=False,
        ).select(id_col, "gram_h"),
        materialize_mode,
    )
    stored_guarded = stored_grams.select(
        id_col,
        _geometry_guarded(
            stored_grams, {"n": n, "portable": int(portable)}, "gram_h",
            "incremental_containment_pairs",
        ),
    )
    all_grams = stored_guarded.unionByName(new_grams)
    if max_gram_df is not None:
        all_grams = _informative_grams(
            all_grams, max_gram_df, broadcast_hot
        )
    # three consumers (sizes, both join sides) — share one evaluation
    informative = _materialize(all_grams, materialize_mode)
    new_ids = new_documents.select(F.col(id_col))
    new_inf = informative.join(new_ids, id_col, "left_semi")
    sizes = informative.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    # direction 1: a NEW doc as the contained side, vs everything
    p1 = new_inf.select(
        F.col(id_col).alias("contained_id"), "gram_h"
    ).join(
        informative.select(F.col(id_col).alias("container_id"), "gram_h"),
        "gram_h",
    )
    # direction 2: a STORED doc contained in a new one (stored-only on
    # the contained side so new-new pairs aren't double-counted — p1
    # already emits both directions among new docs)
    p2 = informative.join(new_ids, id_col, "left_anti").select(
        F.col(id_col).alias("contained_id"), "gram_h"
    ).join(
        new_inf.select(F.col(id_col).alias("container_id"), "gram_h"),
        "gram_h",
    )
    shared = (
        p1.unionByName(p2)
        .filter(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(
            sizes.withColumnRenamed(id_col, "contained_id"),
            "contained_id",
        )
        .select(
            "contained_id",
            "container_id",
            "n_shared",
            "n_grams",
            F.expr("(n_shared * 1000000) div n_grams").alias(
                "containment_ppm"
            ),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )


def _informative_grams(
    grams: DataFrame, max_gram_df: int, broadcast_hot: bool
) -> DataFrame:
    """The hot-gram removal stage of the containment family: drop every
    gram whose document frequency exceeds ``max_gram_df`` via a
    gram-keyed LEFT ANTI join (broadcast under ``broadcast_hot``,
    shuffle on the same 8-byte key otherwise — never a cartesian).
    Factored out so the plan-lock tests can assert the join shape on
    the frame ``containment_pairs`` materializes."""
    hot = (
        grams.groupBy("gram_h")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_gram_df)
        .select("gram_h")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    return grams.join(hot, "gram_h", "left_anti")


def containment_pairs(
    documents: DataFrame,
    n: int = 5,
    threshold_ppm: int = 800_000,
    max_gram_df: int | None = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_mode: str = "local",
    broadcast_hot: bool = True,
    portable: bool = True,
) -> DataFrame:
    """ASYMMETRIC near-dup detection — directed n-gram containment
    ``|grams(A) ∩ grams(B)| / |grams(A)|``: the quote-inclusion case
    symmetric Jaccard (minhash/simhash) structurally misses. A short
    document wholly quoted inside a long one has Jaccard ≈ |A|/|B| (tiny)
    but containment ≈ 1 — exactly the "this page is just a excerpt of
    that page" signal corpus curation drops or down-weights
    (the Lee et al. 2021 deduplication taxonomy's substring case, done
    at gram granularity).

    Returns one DIRECTED row per qualifying ordered pair:
    ``(contained_id, container_id, n_shared, n_grams,
    containment_ppm)`` with ``containment_ppm = n_shared · 1e6 div
    n_grams(contained)`` exact int64; mutual (near-identical) pairs
    appear in both directions. Documents with < n words have no grams
    and never pair.

    Scale shape: distinct grams per doc hash to 8-byte keys BEFORE the
    exchange (the boilerplate/decontaminate discipline); the candidate
    join is gram-keyed, and ``max_gram_df`` caps each gram's pair
    fan-out at df² by EXCLUDING corpus-hot grams (df > cap) from both
    the numerator and the denominator — consistently, so the measure
    stays well-defined as "containment over informative grams"
    (boilerplate grams are profiled by ``boilerplate_report`` and
    removed by ``dedup_spans``; carrying them here would both blow up
    the join and inflate containment between unrelated templated
    pages). ``max_gram_df=None`` is the exact-all-grams form for small
    corpora. The gram stream has three consumers (hot counts, sizes,
    the join), so it materializes once via ``materialize_mode``.
    ``portable=False`` swaps the oracle-replayable md5 gram hash for
    xxhash64 (identical pairs, ~1.1-1.7× cheaper hashing — the
    decontaminate family's production setting).

    ``broadcast_hot`` picks the PHYSICAL strategy of the hot-gram
    removal only (the anti-join is gram-keyed either way): True for
    the common case where df > ``max_gram_df`` grams are
    boilerplate-sized; False at 100 TB, where the hot-gram set scales
    with corpus vocabulary (plausibly 1e9+ rows) past any broadcast
    limit — the anti-join then shuffles on the same 8-byte key and
    degrades gracefully instead of failing the job
    (``boilerplate_report``'s toggle, applied here).
    """
    if n < 1:
        raise ValueError("containment_pairs: n must be >= 1")
    if not 0 < threshold_ppm <= 1_000_000:
        raise ValueError(
            "containment_pairs: threshold_ppm must be in (0, 1e6]"
        )
    grams = _materialize(
        build_gram_table(documents, n, id_col, text_col, portable).select(
            id_col, "gram_h"
        ),
        materialize_mode,
    )
    if max_gram_df is not None:
        # the FILTERED gram table has three consumers (sizes, both join
        # sides) — materialize it once so the hot-gram aggregation and
        # the anti-join run a single time instead of once per consumer
        # (measured 3 duplicate hot-count+anti subtrees in the executed
        # plan before this; r15 optimization round). The anti-join
        # shape itself lives in _informative_grams so the plan locks
        # can still assert it (materialization replaces the subtree
        # with an RDD scan in the final plan).
        grams = _materialize(
            _informative_grams(grams, max_gram_df, broadcast_hot),
            materialize_mode,
        )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    a = grams.select(
        F.col(id_col).alias("contained_id"), "gram_h"
    )
    b = grams.select(
        F.col(id_col).alias("container_id"), "gram_h"
    )
    shared = (
        a.join(b, "gram_h")
        .filter(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(
            sizes.withColumnRenamed(id_col, "contained_id"),
            "contained_id",
        )
        .select(
            "contained_id",
            "container_id",
            "n_shared",
            "n_grams",
            F.expr("(n_shared * 1000000) div n_grams").alias(
                "containment_ppm"
            ),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )
