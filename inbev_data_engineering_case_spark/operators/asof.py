"""As-of and range joins — operators Spark's join syntax lacks, built as
compositions of DataFrame primitives (SURVEY.md §2.6 "joins: absent in
reference" → engine extensions; the shapes come from time-series/feature
-store workloads, e.g. events enriched with the latest prior order).

Scale design:

- **As-of join** (``asof_join_backward``): the naive formulation — equi-join
  on key, filter right_ts <= left_ts, window rank to keep the latest —
  explodes to |L_k|×|R_k| intermediate rows per key before pruning, which is
  fatal when a key has millions of rows on both sides. This implementation
  is the *union-merge* form: tag and union both inputs, then one
  ``last(payload, ignorenulls=True)`` running window per key over the
  time-ordered union. Cost is a single shuffle on the key (the window
  exchange) and a per-partition sort — the same price as one sort-merge
  join, with zero row explosion at any scale. Hot keys land in one
  partition each; if a key is truly massive, pre-split it by time range and
  as-of join each split with a seeded boundary row.
- **Range join** (``range_join_bands``): value-in-[lo,hi) banding against a
  small band dimension. Broadcast + nested-loop is the *right* physical
  plan when the band table is tiny (every executor scans its fact split
  once against an in-memory band list); an equi-join alternative for huge
  band tables is to discretize the value to a bucket key and equi-join on
  the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Backward (most-recent-prior) as-of left join.

    For every left row, attach ``payload`` from the right row with the same
    key and the greatest ``right_ts`` <= ``left_ts`` (inclusive); nulls when
    no right row precedes. Equivalent to DuckDB's
    ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

    If several right rows share (key, right_ts), which one wins is
    unspecified — deduplicate the right side first for determinism.
    """
    lkey, rkey = (key, key) if isinstance(key, str) else key
    lfields = left.schema.fields
    pay_t = T.StructType([right.schema[c] for c in payload])
    # Tag sides and align schemas for the union: right rows carry the
    # payload struct, left rows carry their own columns.
    l = left.select(
        F.col(lkey).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_t).alias("__pay"),
        *[F.col(f.name) for f in lfields],
    )
    r = right.select(
        F.col(rkey).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*payload).alias("__pay"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in lfields],
    )
    # __side orders right rows before left at equal timestamps → inclusive
    # (left_ts >= right_ts) match, same tie rule as DuckDB ASOF.
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "__match", F.last("__pay", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("__side") == 1).select(
        *[f.name for f in lfields],
        *[F.col(f"__match.{c}").alias(c) for c in payload],
    )


def range_join_bands(
    fact: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Inner range join: fact rows matched to the band with
    lo <= value < hi. The band table broadcasts (it is definitionally
    small); the fact side never shuffles."""
    return fact.join(
        F.broadcast(bands),
        (fact[value_col] >= bands[lo]) & (fact[value_col] < bands[hi]),
    )
