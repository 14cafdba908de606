"""Batch 4: storage-layout, graph, and language-model-scoring
queries — the "would this survive 100 TB" demonstrators.

* ``zorder_layout`` — Morton (Z-order) interleaving as pure bigint
  bit math; the layout trick behind multi-dimensional data skipping
  (Delta/Iceberg OPTIMIZE ZORDER): sort by z, and min/max stats per
  file prune BOTH join keys.
* ``triangle_count`` — the canonical multi-way self-join graph
  workload (co-supplier graph); edge list built once, triangles
  counted with two hash joins over the (a<b)-oriented edges.
* ``unigram_logprob`` — corpus-level unigram LM perplexity proxy
  (CCNet-style quality signal): global word frequencies broadcast,
  per-doc average negative log-likelihood.
* ``url_extract`` / ``posexplode_op`` — remaining string/array
  surface (``parse_url``, position-aware explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

_BITS = 10


def _z_sql(x: str, y: str) -> str:
    """Morton interleave as portable SQL (same text for both engines:
    only >>, &, *, + on BIGINT)."""
    terms = []
    for b in range(_BITS):
        terms.append(f"((({x} >> {b}) & 1) * {1 << (2 * b)})")
        terms.append(f"((({y} >> {b}) & 1) * {1 << (2 * b + 1)})")
    return "(" + " + ".join(terms) + ")"


@query(
    "zorder_layout",
    oracle=f"""
    WITH keyed AS (
      SELECT {_z_sql('(l_partkey % 1024)', '(l_suppkey % 1024)')} AS z,
             l_partkey % 1024 AS px, l_suppkey % 1024 AS sx
      FROM lineitem)
    SELECT CAST(z >> 14 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(px) AS BIGINT) AS min_part,
           CAST(MAX(px) AS BIGINT) AS max_part,
           CAST(MIN(sx) AS BIGINT) AS min_supp,
           CAST(MAX(sx) AS BIGINT) AS max_supp
    FROM keyed GROUP BY z >> 14
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: Morton-interleave two join keys, bucket
    by z-prefix, report per-bucket key ranges.

    Scale: this is how you lay out a 100 TB fact table so parquet
    min/max stats prune on *either* key — write with
    ``repartitionByRange(z).sortWithinPartitions(z)`` and every
    bucket covers a tight (part, supp) rectangle (visible here as
    narrow min/max spans). The z computation itself is pure bigint
    bit math in codegen; no UDF, no shuffle beyond the audit agg.
    """
    li = load(spark, sf_dir, "lineitem")
    z = F.expr(_z_sql("(l_partkey % 1024)", "(l_suppkey % 1024)"))
    return (li.select(z.alias("z"),
                      (F.col("l_partkey") % 1024).alias("px"),
                      (F.col("l_suppkey") % 1024).alias("sx"))
              .groupBy(F.shiftright("z", 14).cast("bigint")
                        .alias("zbucket"))
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.min("px").cast("bigint").alias("min_part"),
                   F.max("px").cast("bigint").alias("max_part"),
                   F.min("sx").cast("bigint").alias("min_supp"),
                   F.max("sx").cast("bigint").alias("max_supp")))


@query(
    "triangle_count",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
      FROM lineitem l1
      JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                      AND l1.l_suppkey < l2.l_suppkey),
    tri AS (
      SELECT COUNT(*) AS nt FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT CAST((SELECT nt FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT a) FROM
                 (SELECT a FROM edges UNION ALL SELECT b FROM edges) u(a))
                AS BIGINT) AS n_nodes
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the co-supplier graph (suppliers sharing an
    order) over oriented (a < b) edges: triangle (a<b<c) exists iff
    edge (a,b) and c in N+(a) ∩ N+(b), so n_triangles = sum over
    edges of |N+(a) ∩ N+(b)|. Each triangle counted exactly once.

    Round 3 (was 32s as a two-hash-join wedge plan): this graph is
    DENSE — ~1000 supplier nodes, 450k edges (90% of complete) — so
    wedge materialization (sum of deg^2 ~ 2x10^8 rows at sf0.1) and
    per-edge adjacency-ARRAY joins (450k edges x 3.6 KB arrays
    shipped twice) drown the query.

    Round 4 (interval bitset): the dense bit row (span/64
    words per node) was quadratic on community-structured graphs —
    a graph of T dense blocks has node span T*b but each row only
    touches ~b/64 words, so per-edge AND cost grew with the GLOBAL
    span even though rows were mostly zero words. The signature is
    now an INTERVAL bitset: each row stores its populated word range
    ``[lo, hi]`` (words = 64-bit blocks of neighbor ids) plus the
    dense word array for just that range; the per-edge intersection
    slices the two rows to their range OVERLAP and zips
    ``bit_count(x & y)`` over it — O(overlap words), independent of
    global node span. A truly dense graph degenerates to exactly the
    old dense-bitset cost (every row spans everything); a
    blocked/community graph pays only its block width; rows in
    disjoint regions short-circuit to 0 on the range test. With no
    fixed global row width there is no span cap, so the old driver
    min/max strategy probe AND the array_intersect fallback are both
    gone — zero driver actions, one strategy. Adjacency
    sides flow through plain equi-joins: Catalyst/AQE broadcasts
    them while they fit (local fixtures) and falls back to shuffle
    joins at cluster scale. Edge construction is a per-order pair
    expansion on the orderkey shuffle (baskets <= 7 suppliers),
    localCheckpointed once for the three consuming branches (prefer
    persist/reliable checkpoint on a multi-executor cluster).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # per-order pair expansion (one shuffle on orderkey, map-side
    # combinable collect_set; baskets are <=7 suppliers) instead of a
    # row-level self-join — same distinct oriented edge set
    pairs_expr = F.expr("""
        flatten(transform(_s, x ->
            filter(transform(_s, y ->
                       if(x < y, struct(x AS a, y AS b), null)),
                   p -> p IS NOT NULL)))""")
    edges = (li.groupBy("l_orderkey")
               .agg(F.collect_set("l_suppkey").alias("_s"))
               .select(F.explode(pairs_expr).alias("_p"))
               .select("_p.a", "_p.b").distinct())
    edges = edges.localCheckpoint(eager=True)

    adj = edges.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    # interval bitset: row = (lo word, words[lo..hi]) covering only
    # the populated word range. Round 5: built in ONE vectorized
    # Arrow stage and checkpointed — the round-4 JVM HOF build
    # (filter+aggregate per word) was O(deg * row_words) interpreted
    # lambda evals per row AND ran twice (once per join side), which
    # was the dominant sf0.1 cost (~2.4 s of the 4.7 s sweep time,
    # the regression flagged in the r4 verdict). numpy's
    # bitwise_or.at builds each row in O(deg), and the tiny
    # signature table (n_nodes rows) is reused for both sides.
    import numpy as np
    import pandas as pd

    def sig_batches(batches):
        one = np.uint64(1)
        for pdf in batches:
            out_a, out_lo, out_w = [], [], []
            for a, nbrs in zip(pdf["a"], pdf["nbrs"]):
                nb = np.asarray(nbrs, dtype=np.int64)
                wi = nb >> 6
                lo = int(wi.min())
                words = np.zeros(int(wi.max()) - lo + 1, dtype=np.uint64)
                np.bitwise_or.at(
                    words, wi - lo, one << (nb & 63).astype(np.uint64))
                out_a.append(a)
                out_lo.append(lo)
                out_w.append(words.view(np.int64))
            yield pd.DataFrame({"a": out_a, "_lo": out_lo, "_w": out_w})

    sigs = adj.mapInPandas(sig_batches, "a long, _lo int, _w array<long>")
    sigs = sigs.localCheckpoint(eager=True)
    sa = sigs.select("a", F.col("_lo").alias("_la"),
                     F.col("_w").alias("_wa"))
    sb = sigs.select(F.col("a").alias("b"), F.col("_lo").alias("_lb"),
                     F.col("_w").alias("_wb"))

    # per-edge AND+popcount, vectorized per ARROW BATCH: rows sharing
    # a word-range pattern (lo_a, lo_b, widths) stack into two 2D
    # int64 matrices, one numpy bitwise_and over the range overlap,
    # one unpackbits popcount — a community-blocked graph has a
    # handful of patterns per batch, a dense one exactly one. The
    # bitset rows ride as FLAT columns (int + array<long>), not
    # structs: Arrow moves list<int64> to pandas at C speed while
    # struct rows become 450k python dicts. (The previous JVM
    # higher-order `aggregate(sequence(...), bit_count(...))` form
    # was interpreted per word per edge — 450k dense edges x 16 words
    # = ~7M lambda evals, ~8 s at sf0.1; this kernel is <1 s. Same
    # dense-kernel-to-pandas-UDF decision as operators/pq.py.)

    def tri_batches(batches):
        for pdf in batches:
            sub = pdf[pdf["_lb"].notna()]
            if not len(sub):
                yield pd.DataFrame({"k": [0]})
                continue
            la = sub["_la"].to_numpy(dtype=np.int64)
            lb = sub["_lb"].to_numpy(dtype=np.int64)
            na = sub["_wa"].map(len).to_numpy(dtype=np.int64)
            nb = sub["_wb"].map(len).to_numpy(dtype=np.int64)
            total = 0
            for (pla, plb, pna, pnb), grp in sub.groupby(
                    [la, lb, na, nb], sort=False):
                s, e = max(pla, plb), min(pla + pna, plb + pnb)
                if s >= e:
                    continue
                A = np.array(grp["_wa"].tolist(), dtype=np.int64)
                B = np.array(grp["_wb"].tolist(), dtype=np.int64)
                andd = (A[:, s - pla:e - pla] & B[:, s - plb:e - plb])
                total += int(np.unpackbits(andd.view(np.uint8)).sum())
            yield pd.DataFrame({"k": [int(total)]})

    # every edge's a has outgoing edges (inner join safe); b may not
    tri = (edges.join(sa, "a")
           .join(sb, "b", "left")
           .select("_la", "_wa", "_lb", "_wb")
           .mapInPandas(tri_batches, "k long")
           .agg(F.sum("k").cast("bigint").alias("n_triangles")))
    nodes = (edges.select(F.col("a").alias("n"))
             .unionAll(edges.select(F.col("b").alias("n")))
             .agg(F.countDistinct("n").alias("n_nodes")))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (tri.crossJoin(F.broadcast(n_edges))
               .crossJoin(F.broadcast(nodes))
               .select("n_triangles", "n_edges", "n_nodes"))


@query(
    "unigram_logprob",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, UNNEST(str_split_regex(text, '\s+')) AS wd
      FROM documents),
    freq AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY wd),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq)
    SELECT w.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(CAST(round(-ln(CAST(f.cnt AS DOUBLE) / t.total), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS avg_neg_logprob
    FROM words w JOIN freq f ON w.wd = f.wd, tot t
    GROUP BY w.doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal: average negative log-prob of
    each document's words under the corpus unigram LM (CCNet uses a
    KenLM 5-gram the same way; the plumbing is identical).

    Scale: the vocabulary (freq table) is many orders smaller than
    the corpus — broadcast it and the scoring pass is map-side; the
    only corpus-sized shuffle is the doc_id agg. Per-word logs are
    rounded then decimal-summed so the cross-engine sum is exact
    regardless of accumulation order.
    """
    docs = load(spark, sf_dir, "documents")
    # r13: pin — words feeds the census and the scoring join, freq
    # the corpus scalar and the same join (tokenize ran 3x unpinned)
    words = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("wd")) \
        .localCheckpoint(eager=False)
    freq = (words.groupBy("wd").agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=False))
    tot = freq.agg(F.sum("cnt").alias("total"))
    neglog = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("total")), 6) \
        .cast("decimal(18,6)")
    return (words.join(F.broadcast(freq), "wd")
                 .crossJoin(F.broadcast(tot))
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_words"),
                      (F.sum(neglog).cast("double")
                       / F.count(F.lit(1))).alias("avg_neg_logprob")))


@query(
    "url_extract",
    oracle="""
    SELECT doc_id,
           source || '.example.org' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param
    FROM documents
    """,
)
def url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structure extraction via ``parse_url`` (host / path /
    query parameter) over synthesized per-doc URLs — the oracle
    recomputes the expected parts from the raw columns, so this
    checks Spark's parser against ground truth.

    Scale: parse_url is a codegen JVM expression — per-row string
    work with no shuffle; the common web-pipeline step of grouping
    by registered domain follows as an ordinary groupBy.
    """
    docs = load(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/docs/"), F.col("doc_id"),
                   F.lit("?lang="), F.col("lang"))
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang"))
         .alias("lang_param"))


@query(
    "posexplode_op",
    oracle=r"""
    WITH tok AS (SELECT doc_id, str_split_regex(text, '\s+') AS w
                 FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS word
    FROM tok, UNNEST(range(1, len(w) + 1)) AS t(i)
    """,
)
def posexplode_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-aware explode (LATERAL VIEW POSEXPLODE): token with
    its 0-based offset — the primitive under token-window chunking
    and positional n-gram features."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (docs.select(
        "doc_id",
        F.posexplode(F.split("text", r"\s+")).alias("pos", "word")))
