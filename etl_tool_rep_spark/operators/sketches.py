"""Frequency sketches: two-pass distributed heavy hitters.

Pass 1 runs the Space-Saving algorithm (Metwally/Agrawal/El Abbadi,
ICDT 2005) independently per partition via ``mapInPandas`` — k
counters per partition, so the candidate set is at most
``k * n_partitions`` rows regardless of input size. Any item with
global count >= N/k is guaranteed to surface in at least one
partition's candidates (if count(x) >= N/k then some partition has
count_p(x) >= n_p/k, which Space-Saving never evicts below).

Pass 2 exactly counts ONLY the candidate items (broadcast semi join —
the second scan aggregates a set bounded by k*partitions, not the
full key space) and applies the real threshold. Result: *exact*
heavy hitters with two scans and no full-key-space shuffle — the
standard trick when the key cardinality itself is too large to
groupBy (e.g. all 5-grams of a 100 TB corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _space_saving_partition(col: str, k: int):
    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    victim = min(counters, key=lambda x: (counters[x], x))
                    counters[v] = counters.pop(victim) + 1
        yield pd.DataFrame({col: list(counters.keys())})
    return run


def heavy_hitters(df: DataFrame, col: str, min_count: int | None = None,
                  k: int = 1000,
                  min_share_denom: int | None = None) -> DataFrame:
    """Exact counts of items whose frequency >= the threshold, via
    Space-Saving candidates + exact recount.

    Threshold forms: ``min_count`` (absolute, must be >= N/k for the
    Space-Saving guarantee — caller responsibility) or
    ``min_share_denom=d`` for the relative form ``cnt * d >= N``
    (i.e. share >= 1/d). The relative form keeps N IN-PLAN as a
    broadcast 1-row aggregate instead of a driver-side .count()
    pre-job — one Spark job total, exact integer arithmetic."""
    cands = (df.select(col).mapInPandas(
                 _space_saving_partition(col, k), f"{col} string")
               .distinct())
    counted = (df.join(F.broadcast(cands), col, "left_semi")
                 .groupBy(col)
                 .agg(F.count(F.lit(1)).alias("cnt")))
    if min_count is not None:
        return counted.filter(F.col("cnt") >= min_count)
    if min_share_denom is None:
        raise ValueError("need min_count or min_share_denom")
    tot = df.agg(F.count(F.lit(1)).alias("_n"))
    return (counted.crossJoin(F.broadcast(tot))
            .filter(F.col("cnt") * min_share_denom >= F.col("_n"))
            .drop("_n"))


# ---------------------------------------------------------------------------
# count-min sketch (Cormode/Muthukrishnan, J. Algorithms 2005)
# ---------------------------------------------------------------------------

def cms_build(df: DataFrame, col: str, depth: int = 4,
              width: int = 2048) -> DataFrame:
    """Build a count-min sketch of ``col`` as a (row, bucket, cnt)
    DataFrame — depth*width counters total, independent of key
    cardinality. Entirely JVM-side: each value fans out to ``depth``
    (row, xxhash64(value, row) mod width) cells via one explode, then
    a map-side-combinable groupBy counts each cell.

    The sketch is MERGEABLE (cells are additive — see ``cms_merge``),
    so per-partition / per-day sketches roll up without rescanning:
    the 100 TB pattern is sketch-per-partition, merge at read time.
    """
    cells = F.array(*[
        F.struct(F.lit(d).alias("row"),
                 F.pmod(F.xxhash64(F.col(col), F.lit(d)),
                        F.lit(width)).cast("int").alias("bucket"))
        for d in range(depth)])
    return (df.select(F.explode(cells).alias("c"))
              .select("c.row", "c.bucket")
              .groupBy("row", "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with identical (depth, width):
    cell-wise sum — the estimate of the merge equals the estimate of
    the concatenated input (counters are linear)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str,
                 depth: int = 4, width: int = 2048) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: probe the
    depth cells and take the MIN (CM guarantees est >= true count,
    and est <= true + eps*N with prob 1-delta for eps=e/width,
    delta=e^-depth). The sketch side is tiny (depth*width rows) so
    the probe join broadcasts."""
    cells = F.array(*[
        F.struct(F.lit(d).alias("row"),
                 F.pmod(F.xxhash64(F.col(col), F.lit(d)),
                        F.lit(width)).cast("int").alias("bucket"))
        for d in range(depth)])
    probes = (keys.select(col, F.explode(cells).alias("c"))
                  .select(col, "c.row", "c.bucket"))
    return (probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
                  .groupBy(col)
                  .agg(F.min(F.coalesce("cnt", F.lit(0)))
                        .alias("cms_est")))
