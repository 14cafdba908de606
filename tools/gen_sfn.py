#!/usr/bin/env python
"""Scale-rehearsal data generator: tile /root/testdata/sf0.1 K times
(default 10 -> "sf1") with disjoint key offsets, so every operator can
be benchmarked one decade above the driver's largest fixture.

    python tools/gen_sfn.py [--tiles 10] [--out /root/repo/.scratch/sf1]

Design notes (what makes the scaling measurement honest):

* Relational tables tile with DENSE key strides (stride = per-tile
  cardinality), so sf1 looks like a genuinely bigger TPC-H-ish world:
  10x customers/suppliers/parts/orders, same dims (region/nation),
  same value distributions. Blocking keys (p_brand) keep their 25
  values — blocks get 10x bigger, exactly the stress a 10x corpus
  applies.
* ``part.p_name``: tile k > 0 appends a 6-char per-tile marker
  (``' ' || repeat(letter_k, 6)``). The fixture has only 64 distinct
  names, so without the remap every name occurs 10x more often and
  any (brand, name)-keyed similarity output fans out 100x — the
  measurement would read quadratic for fixture reasons. The marker is
  injective per tile (within-tile edit distances shift by the shared
  suffix, preserving match structure) and any cross-tile name pair
  differs in >= 6 trailing chars, beyond the tau=3 threshold — so the
  similarity universe grows linearly like a real 10x catalog.
* ``documents``: tile k > 0 suffixes every word with ``x<k>``. An
  injective word map preserves within-tile shingle/Jaccard structure
  EXACTLY while cross-tile shingle overlap drops to ~zero — without
  this, 10 identical copies of each doc would add C(10,2) artificial
  near-dup pairs per doc and any dedup query would scale
  quadratically for fixture reasons, not algorithmic ones.
* ``embeddings``: tile k flips the sign of a k-keyed subset of
  dimensions. A fixed sign flip is an isometry — within-tile cosines
  are bit-identical to sf0.1 — while cross-tile cosines decorrelate,
  so ANN/near-dup pair counts grow ~linearly like a real corpus.

Deterministic: pure arithmetic + a fixed per-tile dimension hash; no
RNG state. Output lands under /root/repo/.scratch (gitignored) —
/root/testdata is read-only.
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# per-tile key strides == per-tile cardinality (dense keys)
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_000_000},
}


def tile_relational(con, table: str, tiles: int, out_dir: str) -> None:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    strides = STRIDES.get(table, {})
    def col_expr(c: str) -> str:
        if c in strides:
            return f"{c} + t.k * {strides[c]} AS {c}"
        if table == "part" and c == "p_name":
            # injective per-tile rename: keeps distinct-name count
            # growing with the corpus (see module docstring)
            return ("CASE WHEN t.k = 0 THEN p_name ELSE p_name || ' ' "
                    "|| repeat(chr(CAST(97 + (t.k % 26) AS INTEGER)), 6) "
                    "END AS p_name")
        return c
    proj = ", ".join(col_expr(c) for c in cols)
    con.execute(f"""
        COPY (SELECT {proj}
              FROM '{SRC}/{table}.parquet',
                   (SELECT UNNEST(range({tiles})) AS k) t)
        TO '{out_dir}/{table}.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")


def tile_documents(con, tiles: int, out_dir: str) -> None:
    con.execute(f"""
        COPY (
          WITH t AS (SELECT UNNEST(range({tiles})) AS k)
          SELECT doc_id + t.k * 5000 AS doc_id,
                 CASE WHEN t.k = 0 THEN text
                      ELSE array_to_string(
                             list_transform(string_split(text, ' '),
                                            w -> w || 'x' || t.k),
                             ' ')
                 END AS text,
                 lang, source,
                 CASE WHEN t.k = 0 THEN n_chars
                      ELSE CAST(length(array_to_string(
                             list_transform(string_split(text, ' '),
                                            w -> w || 'x' || t.k),
                             ' ')) AS BIGINT)
                 END AS n_chars
          FROM '{SRC}/documents.parquet', t)
        TO '{out_dir}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 5000)""")
    # ROW_GROUP_SIZE: a single 50k-row row group is unsplittable for
    # Spark (one task owns the whole scan — regex-heavy text maps
    # then read as ~15x/decade when the work is perfectly linear);
    # a real 10x corpus arrives as 10x files. 5000-row groups give
    # the scan honest parallelism without changing any value.


def tile_embeddings(tiles: int, out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    dim = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for k in range(tiles):
        flips = np.array(
            [1.0 if int(hashlib.sha1(f"{k}:{d}".encode())
                        .hexdigest(), 16) % 2 == 0 else -1.0
             for d in range(dim)], dtype=np.float32)
        out_ids.append(ids + k * 2000)
        out_vecs.append(vecs * flips)  # isometry per tile
        out_labels.append(labels)
    import numpy as _np
    all_vecs = _np.concatenate(out_vecs)
    out = pa.table({
        "vec_id": pa.array(_np.concatenate(out_ids), pa.int64()),
        "embedding": pa.array(list(all_vecs),
                              pa.list_(pa.float32())),
        "label": pa.array(_np.concatenate(out_labels), pa.int32()),
    })
    pq.write_table(out, f"{out_dir}/embeddings.parquet",
                   row_group_size=2000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all) — e.g. "
                         "'lineitem,documents' for a graph-family-only "
                         "sf10 that skips the 100x embeddings tile")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    def want(t: str) -> bool:
        return only is None or t in only

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for table in ("region", "nation"):  # dims copy through unchanged
        if want(table):
            con.execute(f"""
                COPY (SELECT * FROM '{SRC}/{table}.parquet')
                TO '{args.out}/{table}.parquet' (FORMAT PARQUET)""")
    for table in STRIDES:
        if want(table):
            tile_relational(con, table, args.tiles, args.out)
            print("tiled", table)
    if want("documents"):
        tile_documents(con, args.tiles, args.out)
        print("tiled documents")
    if want("embeddings"):
        tile_embeddings(args.tiles, args.out)
        print("tiled embeddings")


if __name__ == "__main__":
    main()
