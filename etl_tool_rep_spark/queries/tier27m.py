"""Tier-27 multimodal member: perceptual-hash image near-dedup over
REAL PNG payloads, behind the exact oracle gate.

Extends the tier-24 program (operators/png.py codec certified by an
encoder-blind oracle) from decode/resize/stats to the operation a
training pipeline actually wants images deduplicated by: a 64-bit
average-hash (aHash) fingerprint with banded Hamming matching.

Fixture: documents are grouped four-per-base (base = doc_id // 4);
every member encodes the base image with row m = doc_id % 4 shifted
by 7*m (mod 256) — a small, localized perturbation, so group members
are near-duplicates (Hamming distance 0-3 on the aHash) while
different bases are unrelated (random 64-bit distance ~32). The
Spark side round-trips through REAL PNG encode -> decode before
hashing; the DuckDB oracle recomputes the hash straight from the
perturbed pixel rule and never sees a PNG — a match certifies codec
+ resize + hash + banding + verify end to end.

The 4x16-bit banding is EXACT for the Hamming <= 3 threshold by
pigeonhole (3 flipped bits cannot touch all 4 bands), so the banded
candidate set provably equals the all-pairs answer — the same
band-count-vs-threshold reasoning that sizes any LSH deploy.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..operators import multimodal as M
from ..operators import png
from .registry import query

# perturbed pixel rule: v(base, y, x) with row m shifted by 7*m.
# sy/sx below are the 8x8 nearest-neighbor source indices, so the
# perturbation is visible in the hash iff the resize samples row m.
_V0 = M.pixel_rule_sql("base", "sy", "sx")

_HASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("hash_hi", T.LongType()),
    T.StructField("hash_lo", T.LongType()),
    T.StructField("b0", T.LongType()),
    T.StructField("b1", T.LongType()),
    T.StructField("b2", T.LongType()),
    T.StructField("b3", T.LongType()),
])


def _phash_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> (64-bit aHash as two 32-bit words, four 16-bit
    bands), via real PNG encode -> decode -> 8x8 nearest resize."""
    import numpy as np
    import pandas as pd

    docs = M.fan_out_ids(
        load(spark, sf_dir, "documents").select("doc_id"))

    def stage(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                base, m = doc_id // 4, doc_id % 4
                pixels, w, h = M.synth_pixels(base)
                v = (np.frombuffer(pixels, dtype=np.uint8)
                     .reshape(h, w).astype(np.int64))
                v[m, :] = (v[m, :] + 7 * m) % 256
                payload = png.encode_png(
                    v.astype(np.uint8).tobytes(), w, h, 1,
                    filter_choice=lambda y, d=doc_id: (d + y) % 5)
                dec, dw, dh, _ = png.decode_png(payload)
                g = (np.frombuffer(dec, dtype=np.uint8)
                     .reshape(dh, dw).astype(np.int64))
                ys = (np.arange(8, dtype=np.int64) * dh) // 8
                xs = (np.arange(8, dtype=np.int64) * dw) // 8
                cell = g[np.ix_(ys, xs)]
                s = int(cell.sum())
                bits = (64 * cell > s).flatten()  # p = y*8 + x
                words = [0, 0, 0, 0, 0, 0]  # hi, lo, b0..b3
                for p in range(64):
                    if not bits[p]:
                        continue
                    if p >= 32:
                        words[0] |= 1 << (p - 32)
                    else:
                        words[1] |= 1 << p
                    words[2 + p // 16] |= 1 << (p % 16)
                rows.append((doc_id, *words))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _HASH_SCHEMA])

    return docs.mapInPandas(stage, schema=_HASH_SCHEMA)


@query(
    "image_phash_dedup",
    oracle=f"""
    WITH ids AS (
      SELECT doc_id, doc_id // 4 AS base, doc_id % 4 AS m
      FROM documents),
    dims AS (
      SELECT doc_id, base, m,
             8 + base % 5 AS h, 12 + base % 7 AS w
      FROM ids),
    gy AS (SELECT *, unnest(range(0, 8)) AS y FROM dims),
    gg AS (SELECT *, unnest(range(0, 8)) AS x FROM gy),
    src AS (
      SELECT doc_id, m, y, x,
             (y * h) // 8 AS sy, (x * w) // 8 AS sx
      FROM gg),
    pxv AS (
      SELECT doc_id, y, x, y * 8 + x AS p,
             CASE WHEN sy = m THEN ({_V0} + 7 * m) % 256
                  ELSE {_V0} END AS v
      FROM (SELECT s.doc_id, s.m, s.y, s.x, s.sy, s.sx,
                   i.base
            FROM src s JOIN ids i USING (doc_id))),
    tot AS (
      SELECT doc_id, CAST(SUM(v) AS BIGINT) AS s
      FROM pxv GROUP BY 1),
    bits AS (
      SELECT pxv.doc_id, p,
             CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS bit
      FROM pxv JOIN tot ON tot.doc_id = pxv.doc_id),
    hashes AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN p >= 32 AND bit = 1
                  THEN (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END)
                  AS BIGINT) AS hash_hi,
             CAST(SUM(CASE WHEN p < 32 AND bit = 1
                  THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
                  AS BIGINT) AS hash_lo,
             CAST(SUM(CASE WHEN p // 16 = 0 AND bit = 1
                  THEN (CAST(1 AS BIGINT) << (p % 16)) ELSE 0 END)
                  AS BIGINT) AS b0,
             CAST(SUM(CASE WHEN p // 16 = 1 AND bit = 1
                  THEN (CAST(1 AS BIGINT) << (p % 16)) ELSE 0 END)
                  AS BIGINT) AS b1,
             CAST(SUM(CASE WHEN p // 16 = 2 AND bit = 1
                  THEN (CAST(1 AS BIGINT) << (p % 16)) ELSE 0 END)
                  AS BIGINT) AS b2,
             CAST(SUM(CASE WHEN p // 16 = 3 AND bit = 1
                  THEN (CAST(1 AS BIGINT) << (p % 16)) ELSE 0 END)
                  AS BIGINT) AS b3
      FROM bits GROUP BY doc_id),
    bands AS (
      SELECT doc_id, hash_hi, hash_lo, 0 AS bj, b0 AS bk FROM hashes
      UNION ALL
      SELECT doc_id, hash_hi, hash_lo, 1, b1 FROM hashes
      UNION ALL
      SELECT doc_id, hash_hi, hash_lo, 2, b2 FROM hashes
      UNION ALL
      SELECT doc_id, hash_hi, hash_lo, 3, b3 FROM hashes),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.hash_hi AS hi_a, a.hash_lo AS lo_a,
             b.hash_hi AS hi_b, b.hash_lo AS lo_b
      FROM bands a JOIN bands b
        ON a.bj = b.bj AND a.bk = b.bk AND a.doc_id < b.doc_id)
    SELECT a_id, b_id,
           CAST(bit_count(xor(hi_a, hi_b))
                + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(hi_a, hi_b))
          + bit_count(xor(lo_a, lo_b)) <= 3
    """,
)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All image pairs whose 64-bit average-hash differs by <= 3 bits,
    found via 4x16-bit LSH banding (exact for this threshold by
    pigeonhole) — perceptual near-duplicate detection over real PNG
    payloads, the image-side sibling of `near_dedup_minhash`.

    Scale: the decode+hash stage is one Arrow-batched Python crossing
    per image (cost tracks payload bytes, embarrassingly parallel);
    matching is 4 equi-joins on 16-bit band keys over a |docs|x4 row
    fingerprint table — never an all-pairs stage. At a 100-TB image
    corpus the band tables are ~10^4x smaller than the payload bytes;
    hot bands (monochrome images hash to all-zeros) are the one skew
    risk and salt-split exactly like any hot join key.
    """
    hashes = _phash_frames(spark, sf_dir)
    bands = hashes.selectExpr(
        "doc_id", "hash_hi", "hash_lo",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (bj, bk)")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.bj") == F.col("b.bj"))
                   & (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("a_id"),
                    F.col("b.doc_id").alias("b_id"),
                    F.col("a.hash_hi").alias("hi_a"),
                    F.col("a.hash_lo").alias("lo_a"),
                    F.col("b.hash_hi").alias("hi_b"),
                    F.col("b.hash_lo").alias("lo_b"))
            .distinct())
    ham = (F.bit_count(F.expr("hi_a ^ hi_b"))
           + F.bit_count(F.expr("lo_a ^ lo_b"))).cast("bigint")
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= 3)
            .select("a_id", "b_id", "hamming"))
