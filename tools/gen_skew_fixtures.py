#!/usr/bin/env python
"""Skew-adversarial fixtures for the round-10 span/ANN keys
(round-11 verdict ask #4). Two shapes the uniform sfN fixtures never
exercise:

* ``hotgram`` — one 25-char gram (exactly ``tier42._SS_L`` chars, so
  it is ONE census key) injected at the front of 50% of documents: a
  boilerplate header in half the crawl. The exact-substring census
  then has a single (hash, gram) key carrying |docs|/2 positions —
  the worst shuffle key the family can meet.

* ``hotcell`` — 50% of embedding vectors pulled into IVF cell 0
  (every odd vec_id blended 95% toward centroid vec 0, ids 0..15
  kept verbatim as centroids/codebook): one probe cell holding half
  the index, the worst candidate fan-in an IVF probe can meet.

Row groups are kept small (6000 docs / 2000 vectors) to match the
uniform fixtures' split granularity: a DuckDB-default 122880-row
group makes ONE scan task read everything and fakes a dominant
task that is file layout, not key skew (measured round 11).

Both are derived from an existing fixture dir so sizes match the
uniform rehearsal decades; the oracle SQL runs unchanged on them
(the skew is in the DATA, not the contract).

    python tools/gen_skew_fixtures.py hotgram --src .scratch/sf1 \
        --out .scratch/hotgram_sf1
    python tools/gen_skew_fixtures.py hotcell --src .scratch/sf1 \
        --out .scratch/hotcell_sf1
"""

from __future__ import annotations

import argparse
import os

import duckdb

# exactly _SS_L (=25) chars -> exactly one hot census key
_SENTINEL = "XHOTGRAMBOILERPLATEHEADRX"
assert len(_SENTINEL) == 25


def gen_hotgram(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    dst = os.path.join(out, "documents.parquet")
    duckdb.sql(f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0
                      THEN '{_SENTINEL}' || ' ' || text
                      ELSE text END AS text,
                 lang, source,
                 CASE WHEN doc_id % 2 = 0 THEN n_chars + 26
                      ELSE n_chars END AS n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 6000)
    """)
    n, h = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN text LIKE '{_SENTINEL}%' "
        f"THEN 1 ELSE 0 END) FROM read_parquet('{dst}')").fetchone()
    print(f"{dst}: {n} docs, {h} carry the hot 25-gram")


def gen_hotcell(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    dst = os.path.join(out, "embeddings.parquet")
    # odd ids blend 95% toward vec 0's embedding: after the 1e3
    # quantization they argmin to centroid 0 (cells are unit-scale
    # apart; the 5% residual keeps vectors distinct so ADC ranks
    # stay total). ids 0..15 stay verbatim (centroids + codebook).
    duckdb.sql(f"""
        COPY (
          WITH e0 AS (
            SELECT embedding AS v0
            FROM read_parquet('{src}/embeddings.parquet')
            WHERE vec_id = 0
          )
          SELECT e.vec_id,
                 CASE WHEN e.vec_id >= 16 AND e.vec_id % 2 = 1
                      THEN list_transform(
                             list_zip(e.embedding, e0.v0),
                             p -> CAST(0.05 * p[1] + 0.95 * p[2]
                                       AS FLOAT))
                      ELSE e.embedding END AS embedding,
                 e.label
          FROM read_parquet('{src}/embeddings.parquet') e, e0
        ) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 2000)
    """)
    n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')"
                   ).fetchone()[0]
    print(f"{dst}: {n} vectors, ~50% blended into cell 0")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["hotgram", "hotcell"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    (gen_hotgram if args.kind == "hotgram" else gen_hotcell)(
        args.src, args.out)


if __name__ == "__main__":
    main()
