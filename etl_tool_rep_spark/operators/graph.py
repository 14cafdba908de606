"""Graph analytics: PageRank by distributed power iteration.

Each iteration is two joins + one aggregation, all keyed by vertex —
the canonical iterative-Spark shape (same discipline as
``cluster.connected_components``): ``localCheckpoint`` per round to
truncate lineage, convergence measured by max rank delta.

Dangling-node mass (vertices with no out-edges) is folded back
uniformly each round, so ranks always sum to 1 — the original
Brin/Page formulation. Because mass is conserved, the dangling mass
equals 1 - sum(inflow), so it stays IN-PLAN as a broadcast 1-row
aggregate instead of a per-round driver collect; the convergence
delta is checked every ``check_every`` rounds. One Spark job per
iteration (the checkpoint), not three.
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
    check_every = 5
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
             .distinct().localCheckpoint()
    verts = (e.select(F.col("s").alias("id"))
              .unionByName(e.select(F.col("d").alias("id")))
              .distinct().localCheckpoint())
    n = verts.count()
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))

    for i in range(max_iterations):
        contribs = (e.join(ranks, e.s == ranks.id)
                     .join(out_deg, "s")
                     .select(F.col("d").alias("id"),
                             (F.col("rank") / F.col("deg"))
                             .alias("contrib")))
        inflow = contribs.groupBy("id").agg(
            F.sum("contrib").alias("inflow"))
        # mass conservation: sum(inflow) == 1 - dangling mass, so the
        # dangling redistribution stays in-plan (broadcast scalar)
        tot = inflow.agg(
            F.coalesce(F.sum("inflow"), F.lit(0.0)).alias("_tot"))
        new_rank = (F.lit((1.0 - damping) / n)
                    + F.lit(damping / n) * (F.lit(1.0) - F.col("_tot"))
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0)))
        new_ranks = (verts.join(inflow, "id", "left")
                     .crossJoin(F.broadcast(tot))
                     .select("id", new_rank.alias("rank"))
                     .localCheckpoint())
        if (i + 1) % check_every == 0 or i == max_iterations - 1:
            prev = ranks
            delta = (new_ranks.alias("n")
                     .join(prev.alias("o"), "id")
                     .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))))
                     .first()[0])
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("id", "rank")
