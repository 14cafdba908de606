#!/usr/bin/env python
"""Local re-implementation of the driver's t2 correctness gate.

Runs every declared query on Spark AND its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive value comparison. Use while iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etl_tool_rep_spark.catalog import TABLES  # noqa: E402
from etl_tool_rep_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    # env-gated resource fences for big-sf oracle runs: without a
    # memory_limit DuckDB grows to 80% of RAM and the kernel OOM-kills
    # the whole check; with one it spills to the temp dir instead.
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    tmp_cap = os.environ.get("SPARK_GRAFT_DUCK_TMP_MAX")
    if tmp_cap:
        con.execute(f"SET max_temp_directory_size='{tmp_cap}'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return bool(v)
    return v


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(normalize_cell(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("check_oracle")
    from etl_tool_rep_spark.queries import ORACLES, QUERIES

    con = duck_connection(args.sf)
    names = args.names or sorted(QUERIES)
    n_pass = n_fail = 0
    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"{name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.sql(ORACLES[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            _, ns = normalize_rows(scols, srows)
            _, nd = normalize_rows(dcols, drows)
            if ns != nd:
                ok = False
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        if ok:
            print(f"{name}: OK ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"{name}: FAIL  {' | '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
