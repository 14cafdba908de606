"""As-of join (latest build row at-or-before each probe row).

Spark has no native ASOF JOIN (DuckDB does). The scale-correct
composition is the union-marker pattern:

    1. dedup the build side to one row per (key, t) — multiple build
       rows at the same instant make "the" as-of row ambiguous;
    2. union build and probe rows on a shared (key, t) axis with a
       marker (build=0, probe=1 — so at equal t the build row sorts
       first, making the join at-or-before inclusive);
    3. one window pass per key ordered by (t, marker):
       ``last(payload, ignoreNulls=True)`` carries the most recent
       build payload forward onto every probe row;
    4. keep probe rows.

Cost: ONE shuffle of build+probe by key, then a linear scan — versus
the naive range-join + row_number which explodes to O(probe x build)
pairs per key before pruning. At 100 TB the naive plan is quadratic
blowup on hot keys; this one is sort-merge-shaped and AQE-skew-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MARK = "_asof_is_probe"
_T = "_asof_t"
_PAYLOAD = "_asof_payload"
_CARRIED = "_asof_carried"


def asof_join(probe: DataFrame, build: DataFrame,
              probe_key: str | list[str], build_key: str | list[str],
              probe_ts: str, build_ts: str,
              payload: list[str],
              direction: str = "backward") -> DataFrame:
    """Left as-of join: probe rows keep all their columns and gain
    ``payload`` columns from the latest build row with
    ``build_ts <= probe_ts`` (direction='backward'; 'forward' gives the
    earliest build row with ``build_ts >= probe_ts``).

    When several build rows share the same (key, t), the one with the
    greatest payload struct wins (deterministic; pre-aggregate the
    build side for different tie-breaking). Probe rows with no
    qualifying build row get NULL payloads (DuckDB ASOF LEFT JOIN
    semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}")
    pkeys = [probe_key] if isinstance(probe_key, str) else list(probe_key)
    bkeys = [build_key] if isinstance(build_key, str) else list(build_key)
    if len(pkeys) != len(bkeys):
        raise ValueError("probe_key and build_key arity mismatch")
    kcols = [f"_asof_k{i}" for i in range(len(pkeys))]

    # (1) deterministic build side: one row per (key, t)
    b = (build.select(
            *[F.col(k).alias(a) for k, a in zip(bkeys, kcols)],
            F.col(build_ts).alias(_T),
            F.struct(*[F.col(c) for c in payload]).alias(_PAYLOAD))
         .groupBy(*kcols, _T)
         .agg(F.max(_PAYLOAD).alias(_PAYLOAD)))
    payload_type = b.schema[_PAYLOAD].dataType

    # (2) shared axis: probe columns ride along; build rows fill NULLs
    p_side = probe.select(
        *probe.columns,
        *[F.col(k).alias(a) for k, a in zip(pkeys, kcols)],
        F.col(probe_ts).alias(_T),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        F.lit(1).alias(_MARK))
    b_side = b.select(
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns],
        *kcols, _T, _PAYLOAD, F.lit(0).alias(_MARK))
    unioned = b_side.unionByName(p_side.select(*b_side.columns))

    # (3) single window pass per key
    t_order = F.col(_T).asc() if direction == "backward" \
        else F.col(_T).desc()
    w = (Window.partitionBy(*kcols)
         .orderBy(t_order, F.col(_MARK).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    # (4) keep probes, unpack carried payload
    return (unioned
            .withColumn(_CARRIED, F.last(_PAYLOAD, ignorenulls=True).over(w))
            .filter(F.col(_MARK) == 1)
            .select(*probe.columns,
                    *[F.col(_CARRIED).getField(c).alias(c)
                      for c in payload]))
