"""Blocked fuzzy string matching: near-duplicate NAMES (typos, variant
spellings) via edit distance — the entity-resolution primitive the
near-dup operators in ``dedup.py`` don't cover (MinHash/SimHash work on
token sets; two 11-char strings one typo apart share almost no shingles).

Scale design — the two rules that make edit distance viable at 100 TB:

1. **Match the vocabulary, not the rows.** Names repeat enormously in
   real fact data; the DISTINCT name domain is orders of magnitude
   smaller than the table. The operator first reduces to (name, count),
   pairs distinct names, and lets callers map matches back by name —
   a row-level self-join would pay the quadratic cost once per
   duplicate-pair occurrence.
2. **Block before comparing.** Levenshtein over all distinct pairs is
   still quadratic, so candidates are restricted to equal blocking keys
   (first character + length band — distance ≤ d implies length
   difference ≤ d, so a band of width ≥ d+1 only misses pairs whose
   first char differs; swap in phonetic keys per domain). The self-join
   is block-local with canonical ``name_a < name_b`` ordering.

``levenshtein`` is an integer metric computed identically by Spark and
DuckDB — results are exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
    length_band: int = 3,
) -> DataFrame:
    """``(name_a, name_b, dist, cnt_a, cnt_b)`` — distinct-value pairs
    within edit distance ``max_distance``, blocked on (first char,
    ``length div length_band``); ``cnt_*`` carry each name's row count
    so callers can weigh merges. ``length_band`` must be > ``max_
    distance`` for the band to cover all same-first-char matches."""
    names = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("_blk", F.substring("name", 1, 1))
        .withColumn("_lb", F.expr(f"length(name) div {length_band}"))
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        "_blk",
        "_lb",
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        "_blk",
        "_lb",
    )
    return (
        a.join(b, ["_blk", "_lb"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_distance)
        .select("name_a", "name_b", "dist", "cnt_a", "cnt_b")
    )
