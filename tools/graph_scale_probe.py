"""Probe: PageRank iterations stay edge-linear and lineage-bounded.

The pagerank design (operators/graph.py) claims (a) per-iteration cost
is two exchanges over the edge table with a node-sized rank table, so
wall time scales ~linearly in edges, and (b) without lineage control an
N-iteration loop pays O(N)-deep plans, which `checkpoint_every` bounds.
This probe quantifies both on a synthetic hash-wired graph (no RNG —
node i points at 8 hash-derived targets, so the graph is identical on
every run and every engine):

- scale: run 8 iterations at 1x and 4x edges; report the wall-time
  ratio (expect ~linear, i.e. well under the 16x of a quadratic shape);
- lineage: run 16 iterations with and without `checkpoint_every=4`;
  report both wall times (the unchecked plan's analysis/codegen cost
  grows with depth, the checkpointed one stays flat).

The ranks themselves are also asserted identical between the
checkpointed and plain runs — the lineage bound must not change a
single ppm.

Usage: python tools/graph_scale_probe.py [n_nodes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _edges(spark, n_nodes: int):
    from pyspark.sql import functions as F

    # deterministic 8-regular-out graph: targets via xxhash64 of (i, j)
    return (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda j: F.pmod(
                        F.xxhash64(F.col("id"), j), F.lit(n_nodes)
                    ),
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def main() -> None:
    from inbev_data_engineering_case_spark.operators.graph import pagerank
    from inbev_data_engineering_case_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    # the engine's own session defaults carry no driver-memory setting
    # (the catalog never needs one); this probe caches a 6.4M-edge graph
    # across 32 local threads, so size the heap explicitly
    spark = get_spark(
        "graph-scale-probe", extra_conf={"spark.driver.memory": "12g"}
    )

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s", flush=True)
        return out, dt

    # --- edge-scale: 8 iterations at 1x and 4x ---------------------------
    e1 = _edges(spark, n).cache()
    e4 = _edges(spark, 4 * n).cache()
    print(f"edges 1x: {e1.count():,}   edges 4x: {e4.count():,}")
    _, t1 = timed(
        f"pagerank 8 iter @ {n:,} nodes",
        lambda: pagerank(e1, n_iter=8).count(),
    )
    _, t4 = timed(
        f"pagerank 8 iter @ {4 * n:,} nodes",
        lambda: pagerank(e4, n_iter=8).count(),
    )
    print(f"4x-edges wall ratio: {t4 / t1:.1f}x (linear ~4x, quadratic 16x)")

    # --- lineage bound: 16 iterations, plain vs checkpointed -------------
    plain, tp = timed(
        "16 iter, no checkpoint",
        lambda: sorted(
            (r["node"], r["rank_ppm"])
            for r in pagerank(e1, n_iter=16).collect()
        ),
    )
    ckpt, tc = timed(
        "16 iter, checkpoint_every=4",
        lambda: sorted(
            (r["node"], r["rank_ppm"])
            for r in pagerank(e1, n_iter=16, checkpoint_every=4).collect()
        ),
    )
    assert plain == ckpt, "checkpointing changed ranks"
    print(
        f"ranks identical ({len(plain):,} nodes); "
        f"plain {tp:.2f}s vs checkpointed {tc:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
