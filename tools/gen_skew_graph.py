#!/usr/bin/env python
"""Skewed-degree graph fixture for the iterative/graph family.

The tiled sfN fixtures scale the co-supplier graph by adding disjoint
communities — which is where super-linearity does NOT hide. The place
it does is DEGREE SKEW: a power-law graph whose hottest vertex
co-occurs with a large fraction of the universe (hub rows, hot shuffle
keys, wedge blow-up around hubs). This generator emits a minimal
two-column ``lineitem.parquet`` (l_orderkey, l_suppkey) whose supplier
draw is Zipf-distributed, so pagerank / bfs / triangle / jaccard can
be rehearsed against a hub-dominated degree distribution:

    python tools/gen_skew_graph.py [--orders 2000000] [--suppliers 20000]
        [--zipf 1.2] [--out /root/repo/.scratch/skewgraph]

Deterministic (fixed PCG64 seed). With the defaults the top vertex
lands in ~18% of all draws (its co-occurrence degree approaches the
whole universe), the top-3 hold ~30%, and ~85% of the universe draws
fewer than 20 times — a realistic web/social hub shape.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", type=int, default=2_000_000)
    ap.add_argument("--suppliers", type=int, default=20_000)
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--out", default="/root/repo/.scratch/skewgraph")
    args = ap.parse_args()

    rng = np.random.default_rng(20260814)
    # basket sizes 1..4 (matches the real fixture's small baskets)
    sizes = rng.integers(1, 5, size=args.orders)
    n_rows = int(sizes.sum())
    orderkeys = np.repeat(np.arange(args.orders, dtype=np.int64), sizes)
    # Zipf draw clipped into the supplier universe; rejection-free:
    # values beyond the universe fold into the tail uniformly
    z = rng.zipf(args.zipf, size=n_rows).astype(np.int64)
    over = z > args.suppliers
    z[over] = rng.integers(1, args.suppliers + 1, size=int(over.sum()))
    supp = z - 1

    # part keys for the supplier-part co-occurrence family
    # (neighbor_jaccard): same Zipf shape, drawn AFTER the supplier
    # stream so adding this column leaves l_orderkey/l_suppkey
    # bit-identical to earlier fixtures (same seed, same draw order)
    zp = rng.zipf(args.zipf, size=n_rows).astype(np.int64)
    overp = zp > args.suppliers
    zp[overp] = rng.integers(1, args.suppliers + 1, size=int(overp.sum()))
    part = zp - 1

    os.makedirs(args.out, exist_ok=True)
    tbl = pa.table({
        "l_orderkey": pa.array(orderkeys, pa.int64()),
        "l_suppkey": pa.array(supp, pa.int64()),
        "l_partkey": pa.array(part, pa.int64()),
    })
    pq.write_table(tbl, os.path.join(args.out, "lineitem.parquet"),
                   row_group_size=262_144)

    # quick degree profile so the fixture's skew is on record
    import collections
    top = collections.Counter(supp[:2_000_000].tolist()).most_common(5)
    print("rows:", n_rows, "suppliers:", args.suppliers)
    print("top-5 draw share (first 2M rows):",
          [(k, round(v / min(n_rows, 2_000_000), 4)) for k, v in top])


if __name__ == "__main__":
    main()
