"""Graph analytics: PageRank by distributed power iteration.

Each iteration is two joins + one aggregation, all keyed by vertex —
the canonical iterative-Spark shape (same discipline as
``cluster.connected_components``): ``localCheckpoint`` per round to
truncate lineage, convergence measured by max rank delta.

Dangling-node mass (vertices with no out-edges) is folded back
uniformly each round, so ranks always sum to 1 — the original
Brin/Page formulation. The per-round dangling mass is a single
scalar aggregate collected to the driver (one double per iteration;
this is how GraphX/Pregel implementations do it too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, max_iterations: int = 30,
             tol: float = 1e-7) -> DataFrame:
    """PageRank over a directed edge list; returns (id, rank) with
    ranks summing to 1. Undirected graphs: pass each edge in both
    directions. Deterministic up to float summation order."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
             .distinct().localCheckpoint()
    verts = (e.select(F.col("s").alias("id"))
              .unionByName(e.select(F.col("d").alias("id")))
              .distinct().localCheckpoint())
    n = verts.count()
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))

    for _ in range(max_iterations):
        with_deg = ranks.join(out_deg, ranks.id == out_deg.s, "left")
        dangling = (with_deg.filter(F.col("deg").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .first()[0])
        contribs = (e.join(ranks, e.s == ranks.id)
                     .join(out_deg, "s")
                     .select(F.col("d").alias("id"),
                             (F.col("rank") / F.col("deg"))
                             .alias("contrib")))
        inflow = contribs.groupBy("id").agg(
            F.sum("contrib").alias("inflow"))
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (verts.join(inflow, "id", "left")
                     .select("id",
                             (F.lit(base) + damping
                              * F.coalesce(F.col("inflow"), F.lit(0.0)))
                             .alias("rank"))
                     .localCheckpoint())
        delta = (new_ranks.alias("n")
                 .join(ranks.alias("o"), "id")
                 .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))))
                 .first()[0])
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("id", "rank")
