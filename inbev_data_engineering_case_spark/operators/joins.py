"""Join operators over the star schema.

The reference contains no joins at all — its README defers the star schema
and denormalizes instead (reference README.md:46; SURVEY.md §2.6) — but any
realistic gold view needs them, and they are where 100 TB plans live or die:

- **Dimension joins broadcast.** region/nation/customer-sized sides are sent
  to every executor; the fact table never shuffles. ``broadcast_dims``
  applies the hint explicitly rather than trusting the size estimate, so the
  plan survives statistics going stale.
- **Fact-fact joins shuffle on the join key** (sort-merge under Catalyst);
  AQE's skew-join splitting handles hot keys at runtime. For repeated
  fact-fact joins on the same key, pre-bucketing both sides on that key
  removes the shuffle entirely (see ``layers.write_layer``'s repartition
  hook); at 100 TB that is the single biggest cost lever.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dims(fact: DataFrame, dims: list[tuple[DataFrame, str]]) -> DataFrame:
    """Join ``fact`` against each (dim, key) with an explicit broadcast hint —
    zero shuffles on the fact side."""
    return reduce(
        lambda acc, dim_key: acc.join(F.broadcast(dim_key[0]), on=dim_key[1]),
        dims,
        fact,
    )


def star_denormalize(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """customer enriched with nation/region names — the denormalized view the
    reference's gold layer implies. Both dims broadcast."""
    return (
        customer.join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .drop("n_nationkey", "n_regionkey", "r_regionkey")
    )


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """EXISTS-style filter; Catalyst plans broadcast-hash-semi when the right
    side is small, never materializing right columns."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """NOT EXISTS-style filter."""
    return left.join(right, on=on, how="left_anti")


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Distributed Bloom filter over a key set, as ONE row:
    ``(bf: array<bigint>, num_bits, num_hashes)``.

    The shape Spark's own InjectRuntimeFilter builds planner-side,
    made an explicit, tunable operator: each key sets ``num_hashes``
    bits (seeded xxhash64 positions) in a ``num_bits``-wide bitmap;
    the bits aggregate per 64-bit word (``bit_or`` over ``num_bits/64``
    word rows — a KB-scale exchange regardless of key count), then
    densify into one array row. At 1M bits the row is 128 KB — small
    enough to broadcast when the raw key set is NOT (the regime where
    this matters: a 1e9-row keep-list is ~8 GB raw but its Bloom at
    1% fp is ~1.2 GB/10⁹ keys... pick num_bits ≈ 10·|keys| for ~1% fp
    with 5 hashes, still orders of magnitude under the raw set).

    Entirely JVM-side: no driver collect, no Python; ``bloom_might_
    contain`` probes it with pure Column expressions. False negatives
    are impossible by construction (property-tested), so an EXACT
    join downstream loses nothing.
    """
    if num_bits < 64 or num_bits % 64:
        raise ValueError(
            "bloom_filter_build: num_bits must be a positive multiple of 64"
        )
    if num_hashes < 1:
        raise ValueError("bloom_filter_build: num_hashes must be >= 1")
    spark = keys.sparkSession
    n_words = num_bits // 64
    pos = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]
    words = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.explode(F.array(*pos)).alias("_pos"))
        .select(
            F.expr("_pos div 64").alias("_w"),
            # shiftleft's bit count must be a Column here, so the SQL
            # form (the Python API only takes a literal int)
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_bit"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_bit").alias("_bits"))
    )
    return (
        spark.range(n_words)
        .select(F.col("id").alias("_w"))
        .join(words, "_w", "left")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_w", "_bits"))),
                lambda x: F.coalesce(x["_bits"], F.lit(0).cast("bigint")),
            ).alias("bf")
        )
        .select(
            "bf",
            F.lit(num_bits).alias("num_bits"),
            F.lit(num_hashes).alias("num_hashes"),
        )
    )


def bloom_might_contain(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Rows of ``fact`` whose key MIGHT be in the Bloom — a superset of
    the true matches (false positives at the configured rate, false
    negatives never). The bloom row broadcasts; the probe is a pure
    Column conjunction over ``num_hashes`` word lookups, so the filter
    rides the fact scan inside codegen. A bloom built with different
    geometry than the caller claims raises in-plan (the CMS
    wrong-geometry discipline — probing the wrong bit positions would
    silently drop true matches)."""
    # underscore-prefix the bloom row's columns before the cross join
    # so a fact column named bf/num_bits/num_hashes can't collide
    # (ambiguous-reference or silent overwrite); the staging columns
    # below share the prefix, so reserve it loudly rather than let
    # withColumn silently overwrite a user's _bloom_* column
    reserved = [c for c in fact.columns if c.startswith("_bloom_")]
    if reserved:
        raise ValueError(
            f"bloom_might_contain: fact columns {reserved} use the "
            "reserved _bloom_ prefix (internal staging names) — "
            "rename them before probing"
        )
    bloom = bloom.select(
        F.col("bf").alias("_bloom_bf"),
        F.col("num_bits").alias("_bloom_nb"),
        F.col("num_hashes").alias("_bloom_nh"),
    )
    guard = F.when(
        (F.col("_bloom_nb") != num_bits)
        | (F.col("_bloom_nh") != num_hashes),
        F.raise_error(
            F.lit(
                "bloom_might_contain: filter geometry "
                "(num_bits/num_hashes) differs from the probe's — bit "
                "positions would not line up and true matches would "
                "silently drop"
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    joined = fact.join(F.broadcast(bloom))
    checks = []
    for i in range(num_hashes):
        # stage the position once per hash, then SQL-form shifts (the
        # Python shiftleft API only takes a literal bit count)
        joined = joined.withColumn(
            f"_bloom_p{i}",
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits)),
        )
        checks.append(
            F.expr(
                f"element_at(_bloom_bf, cast(_bloom_p{i} div 64 as int)"
                f" + 1) & shiftleft(1L, cast(_bloom_p{i} % 64 as int))"
            )
            != 0
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return joined.filter(guard & cond).drop(
        "_bloom_bf", "_bloom_nb", "_bloom_nh",
        *[f"_bloom_p{i}" for i in range(num_hashes)],
    )


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT left-semi join with a Bloom pre-filter on the fact side —
    result identical to ``fact.join(dim_keys, key, "left_semi")``
    (identity-tested): false positives are eliminated by the real
    join, false negatives cannot exist.

    Why at 100 TB: the curation keep-joins (exact-dedup keep list, LM
    keep list, cap winners) semi-join a fact-scale corpus against a
    key set too big to broadcast raw — so the corpus shuffles by key.
    With the pre-filter, the shuffle carries only (true matches +
    fp_rate · non-matches): at 1% fp and a 10%-selective keep list,
    ~89% of the shuffle bytes disappear for the cost of one KB-scale
    bitmap exchange + one broadcast row. Spark's runtime filter does
    this only when its thresholds/statistics allow; the operator form
    is deterministic and composable with the curation pipeline.
    """
    bloom = bloom_filter_build(
        dim_keys.select(key_col), key_col, num_bits, num_hashes
    )
    pruned = bloom_might_contain(
        fact, bloom, key_col, num_bits, num_hashes
    )
    # left-semi semantics already ignore duplicate matches — a
    # .distinct() here would add a keep-list-sized exchange+aggregate
    # to exactly the path the prefilter exists to slim down
    return pruned.join(
        dim_keys.select(key_col), on=key_col, how="left_semi"
    )
