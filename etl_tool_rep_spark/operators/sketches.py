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


def heavy_hitters(df: DataFrame, col: str, min_count: int,
                  k: int = 1000) -> DataFrame:
    """Exact counts of items whose frequency >= ``min_count``,
    via Space-Saving candidates + exact recount. ``min_count`` must
    be >= N/k for the guarantee to hold (caller responsibility)."""
    cands = (df.select(col).mapInPandas(
                 _space_saving_partition(col, k), f"{col} string")
               .distinct())
    return (df.join(F.broadcast(cands), col, "left_semi")
              .groupBy(col)
              .agg(F.count(F.lit(1)).alias("cnt"))
              .filter(F.col("cnt") >= min_count))
