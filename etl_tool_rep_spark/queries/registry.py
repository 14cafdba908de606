"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the
DuckDB oracle SQL used by the driver's correctness gate.

Contract notes (BASELINE.md, __spark_entry__.py):
* every computed column is aliased IDENTICALLY in the Spark query and
  the oracle SQL — the driver sorts columns by name before hashing;
* floating aggregates go through decimal so Spark's parallel
  summation and DuckDB's serial summation produce the exact same
  value (SURVEY.md §7 watch-list item 4);
* sorts always carry explicit NULLS FIRST/LAST (Spark default differs
  from DuckDB's).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle=None`` => rows-only check
    (op not SQL-expressible or nondeterministic)."""
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco
