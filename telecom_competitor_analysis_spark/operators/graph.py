"""Graph analytics over pair graphs (the near-dup graph, reference-style
entity links): fixed-iteration PageRank with integer-micro arithmetic.

Why integer micros: PageRank's per-node inbound sum is a floating-point
reduction, and distributed double sums are ordering-dependent in the
last ulps — unacceptable for an oracle-checked operator. Every
contribution is rounded to integer 1e-6 units BEFORE the sum (the
repo-wide integer-cents rule), so each iteration is an exact integer
fixpoint both engines reproduce bit-for-bit. The damping and init terms
round the same way. Rounding changes absolute scores by ≤ a few micros
per iteration — irrelevant for the ranking use (centrality ordering),
decisive for determinism.

Scale shape per iteration: one join edges⋈scores on src (the edge
list's own key), a partial-aggregable inbound sum on dst, and a left
join back to the node list — O(|E|) per iteration with no whole-graph
window; the node/edge partitioning is reusable across iterations.
Fixed ``iters`` keeps the plan finite (3 unrolled CTE rounds in the
DuckDB oracle); power-iteration convergence is not the goal here —
ranking stability is, and 3 rounds separate hubs from leaves on the
near-dup graphs this engine builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_micro(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a DIRECTED edge list (src, dst) — feed each
    undirected pair in both directions for the symmetric case. Nodes =
    endpoints of edges (degree ≥ 1, so no dangling-mass term). Returns
    (id, pr_micro BIGINT) after ``iters`` rounds from the uniform
    init round(1e6/N)."""
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    stats = F.broadcast(
        nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    p = nodes.crossJoin(stats).select(
        "id",
        F.round(F.lit(1_000_000.0) / F.col("n"), 0)
        .cast("bigint")
        .alias("p"),
    )
    base = F.round(
        F.lit((1.0 - damping) * 1_000_000.0) / F.col("n"), 0
    ).cast("bigint")
    for _ in range(iters):
        contrib = (
            edges.join(p.withColumnRenamed("id", "src"), on="src")
            .join(deg, on="src")
            .select(
                F.col("dst").alias("id"),
                F.round(
                    F.col("p").cast("double") / F.col("deg").cast("double"),
                    0,
                )
                .cast("bigint")
                .alias("c"),
            )
        )
        insum = contrib.groupBy("id").agg(F.sum("c").alias("insum"))
        p = (
            nodes.crossJoin(stats)
            .join(insum, on="id", how="left")
            .select(
                "id",
                (
                    base
                    + F.round(
                        F.lit(damping)
                        * F.coalesce(F.col("insum"), F.lit(0)).cast(
                            "double"
                        ),
                        0,
                    ).cast("bigint")
                ).alias("p"),
            )
        )
    return p.select("id", F.col("p").alias("pr_micro"))
