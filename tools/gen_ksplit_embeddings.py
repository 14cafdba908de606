#!/usr/bin/env python
"""Production-shaped embeddings fixture for the semantic_dedup scale
rehearsal (round-10 verdict item #1).

The stock sfN embeddings keep the sf0.1 label DOMAIN (10 labels), so
every 10x data decade grows each cluster 10x and the blocked all-pairs
work grows ~N^2/k = quadratically — a fixture artifact: SemDeDup's
contract (Abbas et al., arXiv:2303.09540) picks k so the EXPECTED
CLUSTER SIZE stays bounded as the corpus grows (their 134M-point run
used k = 11k clusters ~ constant |c|). This tool re-labels a tiled
embeddings table to that shape: tile t (vec_id stride 2000, see
gen_sfn.py) gets its own label space ``label + 10 * t``, so k grows
linearly with N and |c| stays at the sf0.1 block size. Because
gen_sfn's per-tile sign flip is an isometry, every block is exactly
the sf0.1 block geometry — the rehearsal then measures the OPERATOR's
scaling, not the fixture's cluster inflation.

    python tools/gen_ksplit_embeddings.py --src .scratch/sf1 \
        --out .scratch/ksplit_sf1
"""

from __future__ import annotations

import argparse
import os

import duckdb

_TILE_STRIDE = 2000  # gen_sfn.tile_embeddings vec_id stride


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    dst = os.path.join(args.out, "embeddings.parquet")
    duckdb.sql(f"""
        COPY (
          SELECT vec_id, embedding,
                 CAST(label + 10 * (vec_id // {_TILE_STRIDE})
                      AS INT) AS label
          FROM read_parquet('{args.src}/embeddings.parquet')
        ) TO '{dst}' (FORMAT PARQUET)
    """)
    n, k, mx = duckdb.sql(
        f"SELECT SUM(c), COUNT(*), MAX(c) FROM ("
        f"SELECT label, COUNT(*) AS c FROM read_parquet('{dst}') "
        f"GROUP BY label)").fetchone()
    print(f"{dst}: {n} vectors, {k} labels, max block {mx}")


if __name__ == "__main__":
    main()
