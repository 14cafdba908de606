"""Recall-curve floors: the monotonicity and floor properties the
RECALL.md sizing table stands on, asserted at the small test fixture
so a kernel regression fails CI rather than silently invalidating the
committed curves (round-4 verdict item #6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.operators.knn import (brute_force_topk,
                                              ivf_assign, ivf_topk,
                                              lsh_near_dup_pairs)

K = 10


@pytest.fixture(scope="module")
def em(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def truth(em):
    queries = em.filter(F.col("vec_id") < 8)
    rows = brute_force_topk(queries, em, "vec_id", "vec_id",
                            "embedding", "embedding", k=K).collect()
    t: dict = {}
    for qid, cid, _, _ in rows:
        t.setdefault(qid, set()).add(cid)
    return t


def _recall(truth, rows):
    got: dict = {}
    for qid, cid, *_ in rows:
        got.setdefault(qid, set()).add(cid)
    rs = [len(truth[q] & got.get(q, set())) / K for q in truth]
    return sum(rs) / len(rs)


def test_ivf_recall_monotone_in_nprobe_with_floors(spark, em, truth):
    cents = (em.filter(F.col("vec_id") % 23 == 0)
               .select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("centroid_vec")))
    nlist = cents.count()
    assigned = ivf_assign(em, cents, "vec_id", "embedding") \
        .localCheckpoint(eager=True)
    queries = em.filter(F.col("vec_id") < 8)
    recalls = []
    for nprobe in (1, 4, nlist):
        rows = [tuple(r) for r in ivf_topk(
            queries, assigned, cents, "vec_id", "embedding",
            "vec_id", "embedding", k=K, nprobe=nprobe).collect()]
        recalls.append(_recall(truth, rows))
    # more probes may never lose recall, and full probe == exhaustive
    assert recalls[0] <= recalls[1] + 1e-9 <= recalls[2] + 2e-9
    assert recalls[2] == pytest.approx(1.0)
    assert recalls[1] >= 0.25          # floor for the committed curve


def test_lsh_pair_recall_floor_and_bit_knob(spark, em):
    """Fewer bits per band => higher pair recall (bigger buckets);
    never a false positive at any setting."""
    sub = em.select("vec_id", "embedding")
    X = sub.collect()
    ids = np.array([r[0] for r in X])
    V = np.array([r[1] for r in X], dtype=np.float64)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = U @ U.T
    iu = np.triu_indices(len(ids), k=1)
    hit = S[iu] >= 0.4
    true_pairs = {(int(min(a, b)), int(max(a, b)))
                  for a, b in zip(ids[iu[0]][hit], ids[iu[1]][hit])}
    if not true_pairs:
        pytest.skip("fixture has no pairs at tau=0.4")

    def run(bands, n_bits):
        got = {(int(min(r[0], r[1])), int(max(r[0], r[1])))
               for r in lsh_near_dup_pairs(
                   sub, "vec_id", "embedding", dim=64, threshold=0.4,
                   n_bits=n_bits, bands=bands).collect()}
        assert got <= true_pairs        # exact verify: no false pos
        return len(got) / len(true_pairs)

    loose = run(4, 8)                   # 2 bits/band
    tight = run(4, 16)                  # 4 bits/band
    assert loose >= tight - 1e-9        # precision knob direction
    assert loose >= 0.5                 # floor for the committed curve
    assert tight >= 0.25


def test_ivf_literal_fallback_matches_literal_path(spark, em, monkeypatch):
    """Force the broadcast-table fallback (plan-size ceiling = 0) and
    assert assignments are identical to the literal-plan path."""
    from etl_tool_rep_spark.operators import knn
    cents = (em.filter(F.col("vec_id") % 23 == 0)
               .select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("centroid_vec")))
    lit = sorted(tuple(r) for r in ivf_assign(
        em, cents, "vec_id", "embedding")
        .select("vec_id", "centroid_id").collect())
    monkeypatch.setattr(knn, "_LITERAL_PLAN_CEILING_CHARS", 0)
    fb = sorted(tuple(r) for r in knn.ivf_assign(
        em, cents, "vec_id", "embedding")
        .select("vec_id", "centroid_id").collect())
    assert lit == fb
    # the fallback's helper column must not collide with (or drop) a
    # user column that happens to be named _cents
    em2 = em.withColumn("_cents", F.lit(7))
    fb2 = knn.ivf_assign(em2, cents, "vec_id", "embedding")
    assert "_cents" in fb2.columns
    got2 = sorted(tuple(r) for r in
                  fb2.select("vec_id", "centroid_id").collect())
    assert got2 == lit
    assert fb2.select("_cents").distinct().collect()[0][0] == 7
