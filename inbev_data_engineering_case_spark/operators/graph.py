"""Iterative graph algorithms over DataFrame edge lists.

PageRank is the page-importance signal web-corpus curation pipelines
attach to crawled documents (rank the crawl frontier, weight quality
scores by link authority) — and the canonical iterative algorithm that
stresses an engine's loop discipline: each iteration is two exchanges
(edge-partitioned contribution join, node-keyed aggregation) over a
rank table that stays node-sized while the edge list can be 100 TB.

Spark-first shape (vs the reference's single-process Python DAGs,
`/root/reference/dags/*.py`, which have no graph surface at all):

- the edge list is normalized ONCE (parallel edges summed, per-source
  weight shares precomputed in integer ppm) so the loop body touches
  only ``(src, dst, wppm)`` — one narrow table, re-used every
  iteration;
- ranks never leave the cluster: N rides as a broadcast 1-row
  aggregate and every per-iteration scalar is a Column expression, so
  there is NO driver-side ``collect``/``count`` anywhere;
- all arithmetic is exact int64 ppm with explicit floor steps
  (``div``), so sums are order-free and a DuckDB replay matches
  hash-for-hash: ``r·wppm ≤ 1e12`` and ``d·Σcontrib ≤ 8.5e11`` both
  sit far inside int64 — no float summation anywhere;
- lineage is bounded: with ``checkpoint_every`` set, the node-sized
  rank table is materialized every k iterations (``localCheckpoint``),
  the standard guard against O(iterations) plan growth on long runs.

Dangling nodes (no out-edges) lose their mass — ranks then sum to less
than 1e6 ppm; this is the common large-graph simplification (a full
teleport redistribution adds one more broadcast scalar per iteration
and is deliberately omitted to keep the oracle replay exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    damping_ppm: int = 850_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list, exact integer-ppm.

    ``r₀(v) = 1e6 div N``; each iteration::

        contrib(v) = Σ_{(u,v)∈E} (r(u) · wppm(u,v)) div 1e6
        r'(v)      = (1e6 − d) div N  +  (d · contrib(v)) div 1e6

    with ``wppm(u,v) = (w(u,v) · 1e6) div Σ_x w(u,x)`` precomputed once
    and ``d = damping_ppm``. Every division is an explicit int64 floor
    (non-negative operands, so Spark's truncating ``div`` and DuckDB's
    flooring ``//`` agree), which makes ``n_iter`` iterations bit-
    reproducible across engines and partitionings.

    ``weight_col=None`` treats every edge as weight 1 (parallel edges
    still sum). Returns ``(node, rank_ppm)``.
    """
    if n_iter < 0:
        raise ValueError("pagerank: n_iter must be >= 0")
    if not 0 <= damping_ppm <= 1_000_000:
        raise ValueError("pagerank: damping_ppm must be in [0, 1e6]")
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    # declarative input validation (no driver-side action): the exact-
    # replay contract relies on truncating `div` == flooring `//`, which
    # only holds for non-negative operands, and a NULL/zero/negative
    # weight would otherwise silently skew or NULL the ppm shares
    w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit("pagerank: edge weights must be positive, got "),
                w.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(w)
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    wout = e.groupBy("src").agg(F.sum("w").alias("wout"))
    # per-source weight share in ppm, precomputed once; wppm <= 1e6 so
    # the loop's r*wppm product is bounded by 1e12
    wppm = (
        e.join(wout, "src")
        .select("src", "dst", F.expr("(w * 1000000) div wout").alias("wppm"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if n_iter >= 2:
        # materialize the loop-invariant side once (independent of the
        # rank-lineage knob): every iteration references wppm and nodes,
        # and without this each action re-derives them from the raw
        # edges (a groupBy + join + distinct per iteration per
        # reference) — measured 61s/48s/29s for plain / rank-only
        # checkpoint / full materialization at 16 iterations on the
        # probe graph (tools/graph_scale_probe.py)
        wppm = wppm.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    n_agg = nodes.agg(F.count("*").alias("_n"))
    ranks = nodes.join(F.broadcast(n_agg)).select(
        "node", F.expr("1000000 div _n").alias("r")
    )
    base = F.expr(f"(1000000 - {damping_ppm}) div _n")
    for i in range(n_iter):
        contrib = (
            wppm.join(ranks, wppm["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * wppm) div 1000000").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(n_agg))
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({damping_ppm} * coalesce(c, 0)) div 1000000"
                    )
                ).alias("r"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_ppm"))
