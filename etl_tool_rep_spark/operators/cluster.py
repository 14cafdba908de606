"""Connected components over candidate-duplicate pairs — turns
pairwise near-dup evidence (MinHash/SimHash/Jaccard output) into
dedup clusters with a canonical representative per cluster.

Algorithm: iterative min-label propagation (a distributed union-find
approximation):

    label(v) <- min(label(v), min over neighbors(label(n)))

repeated until no label changes. Each iteration is one join + one
aggregation (shuffle by vertex); convergence takes O(diameter)
iterations — near-dup clusters are tiny and star-shaped, so 2-4
rounds in practice. ``localCheckpoint`` truncates the growing lineage
each round (without it, iteration k re-executes all k-1 prior joins
and the driver eventually OOMs planning the plan tree — the classic
iterative-Spark failure at scale).

This is one of the declared non-SQL-expressible operators (rows-only
oracle): the fixpoint loop has no single-query SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame,
                         src: str = "id_1", dst: str = "id_2",
                         max_iterations: int = 20,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """Cluster ids from an undirected edge list.

    Returns (id, cluster_id) where cluster_id is the minimum vertex id
    reachable from ``id``; isolated vertices are not emitted (callers
    left-join and coalesce to self). Deterministic for any input.

    ``checkpoint_dir``: when set, per-round lineage truncation uses
    reliable ``checkpoint()`` into that directory — on a real cluster
    an executor loss then recovers from storage instead of killing the
    loop's lineage (same durability flag as operators/graph.pagerank);
    when None, executor-local ``localCheckpoint`` (local mode)."""
    spark_ = pairs.sparkSession
    if checkpoint_dir is not None:
        spark_.sparkContext.setCheckpointDir(checkpoint_dir)

    def cp(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint()
        return df.localCheckpoint()

    edges = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .unionByName(
                 pairs.select(F.col(dst).alias("a"),
                              F.col(src).alias("b")))
             .distinct())
    edges = cp(edges)
    # candidate-pair graphs are usually far smaller than the corpus:
    # right-size the iteration's shuffle width so per-round fixed cost
    # doesn't dominate (AQE coalesces stage-by-stage, but the loop's
    # repeated tiny shuffles still pay scheduling overhead at full
    # width). Large edge sets keep the session's configured width.
    n_edges = edges.count()
    spark = pairs.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    small_width = max(2, min(width, n_edges // 50_000 + 2))
    if small_width < width:
        edges = edges.repartition(small_width, "a")

    # initial label: min neighbor vs self
    labels = (edges.groupBy("a")
              .agg(F.least(F.min("b"), F.first("a")).alias("label"))
              .select(F.col("a").alias("id"), "label"))

    for _ in range(max_iterations):
        # propagate: my new label = min(my label, labels of neighbors)
        neighbor_labels = (edges
                           .join(labels, edges.b == labels.id)
                           .select(F.col("a").alias("id"),
                                   F.col("label")))
        new_labels = (labels.unionByName(neighbor_labels)
                      .groupBy("id")
                      .agg(F.min("label").alias("label")))
        new_labels = cp(new_labels)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame,
                   id_col: str = "doc_id",
                   src: str = "id_1", dst: str = "id_2") -> DataFrame:
    """Full dedup decision table: every id mapped to its cluster
    representative (itself when no near-dup evidence), plus a
    keep/drop verdict (keep = the representative)."""
    cc = connected_components(pairs, src, dst)
    out = (all_ids.select(F.col(id_col))
           .join(cc, all_ids[id_col] == cc.id, "left")
           .select(F.col(id_col),
                   F.coalesce(F.col("cluster_id"), F.col(id_col))
                    .alias("cluster_id")))
    return out.withColumn("keep", F.col(id_col) == F.col("cluster_id"))
