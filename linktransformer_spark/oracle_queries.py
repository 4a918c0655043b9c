"""Driver-contract query definitions.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
the equivalent DuckDB SQL (tables pre-registered as views). This module
is the single source of truth consumed by /root/repo/__spark_entry__.py.

Conventions (driver compare = row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column is aliased identically on both sides;
- float score columns are rounded to 6 decimals on both sides *after*
  all comparisons/window ordering (the unrounded doubles are
  bit-identical across engines — verified in tests/test_parity.py —
  so rounding is only belt-and-braces for the hash step);
- similarity kernels come in matched pairs from functions/similarity.py
  (Spark) and functions/oracle.py (DuckDB SQL text).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import linktransformer_spark as lt
from .functions.oracle import sql_lev_sim

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco



def _idx_tag(sf_dir: str) -> str:
    """Tag for the /tmp index directories the index-backed queries
    (re)build per call: sf-dir-keyed for readability, PID-suffixed so
    two concurrent drivers (a pytest session + a drive script, two
    pytest sessions) never write the same index directory — a meta/
    json overwrite colliding with a concurrent reader dies with an
    opaque Py4J error otherwise. Nothing reuses these across
    processes; each query rebuilds its index every call by design."""
    import hashlib
    import os

    return f"{hashlib.sha1(sf_dir.encode()).hexdigest()[:12]}_{os.getpid()}"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .sources.tables import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Relational substrate: the flagship pricing-summary aggregation.
# ---------------------------------------------------------------------------

@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# merge family (SURVEY §2.2 ops 1-5) with the levenshtein scorer —
# exact cross-engine parity (ASCII keys).
# ---------------------------------------------------------------------------

_MERGE_1NN_SQL = f"""
    SELECT c_custkey, c_name, s_suppkey, s_name,
           round(score, 6) AS score
    FROM (
      SELECT c.c_custkey, c.c_name, s.s_suppkey, s.s_name,
             {sql_lev_sim('c.c_name', 's.s_name')} AS score,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY {sql_lev_sim('c.c_name', 's.s_name')} DESC, s.s_suppkey ASC
             ) AS rn
      FROM customer c CROSS JOIN supplier s
    ) WHERE rn = 1
"""


@_q("merge_1nn", _MERGE_1NN_SQL)
def merge_1nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    out = lt.merge(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    return out.select(
        "c_custkey", "c_name", "s_suppkey", "s_name", F.round("score", 6).alias("score")
    )


_MERGE_KNN_SQL = f"""
    SELECT c_custkey, s_suppkey, round(score, 6) AS score
    FROM (
      SELECT c.c_custkey, s.s_suppkey,
             {sql_lev_sim('c.c_name', 's.s_name')} AS score,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY {sql_lev_sim('c.c_name', 's.s_name')} DESC, s.s_suppkey ASC
             ) AS rn
      FROM customer c CROSS JOIN supplier s
    ) WHERE rn <= 3 AND score >= 0.4
"""


@_q("merge_knn_k3", _MERGE_KNN_SQL)
def merge_knn_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    out = lt.merge_knn(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        k=3, drop_sim_threshold=0.4,
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    return out.select("c_custkey", "s_suppkey", F.round("score", 6).alias("score"))


_MERGE_RANGE_SQL = f"""
    WITH matched AS (
      SELECT c.c_custkey, s.s_suppkey,
             {sql_lev_sim('c.c_name', 's.s_name')} AS score
      FROM customer c CROSS JOIN supplier s
      WHERE {sql_lev_sim('c.c_name', 's.s_name')} >= 0.55
    )
    SELECT c_custkey, s_suppkey, round(score, 6) AS score FROM matched
    UNION ALL
    SELECT c.c_custkey, NULL AS s_suppkey, NULL AS score
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT c_custkey FROM matched)
"""


@_q("merge_range_t55", _MERGE_RANGE_SQL)
def merge_range_t55(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    out = lt.merge_range(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        sim_threshold=0.55,
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    return out.select("c_custkey", "s_suppkey", F.round("score", 6).alias("score"))


_MERGE_BLOCKING_SQL = f"""
    WITH matched AS (
      SELECT c.c_custkey, s.s_suppkey, round({sql_lev_sim('c.c_name', 's.s_name')}, 6) AS score,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY {sql_lev_sim('c.c_name', 's.s_name')} DESC, s.s_suppkey ASC
             ) AS rn
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    )
    SELECT c_custkey, s_suppkey, score FROM matched WHERE rn = 1
    UNION ALL
    SELECT c.c_custkey, NULL, NULL FROM customer c
    WHERE c.c_nationkey NOT IN (SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT NULL, s.s_suppkey, NULL FROM supplier s
    WHERE s.s_nationkey NOT IN (SELECT DISTINCT c_nationkey FROM customer)
"""


@_q("merge_blocking_nation", _MERGE_BLOCKING_SQL)
def merge_blocking_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blocking_vars must share a name on both sides (reference contract);
    # rename the supplier's nation key to match.
    cust = _t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nationkey")
    supp = _t(spark, sf_dir, "supplier").withColumnRenamed("s_nationkey", "nationkey")
    out = lt.merge_blocking(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        blocking_vars=["nationkey"],
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    return out.select("c_custkey", "s_suppkey", F.round("score", 6).alias("score"))


_AGG_ROWS_SQL = f"""
    SELECT p_partkey, p_type, ref_type, round(score, 6) AS score
    FROM (
      SELECT p.p_partkey, p.p_type, r.ref_type,
             {sql_lev_sim('p.p_type', 'r.ref_type')} AS score,
             row_number() OVER (
               PARTITION BY p.p_partkey
               ORDER BY {sql_lev_sim('p.p_type', 'r.ref_type')} DESC, r.ref_type ASC
             ) AS rn
      FROM part p CROSS JOIN (SELECT DISTINCT p_brand AS ref_type FROM part) r
    ) WHERE rn = 1
"""


@_q("aggregate_rows_ptype", _AGG_ROWS_SQL)
def aggregate_rows_ptype(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    ref = part.select(F.col("p_brand").alias("ref_type")).distinct()
    out = lt.aggregate_rows(
        part.select("p_partkey", "p_type"), ref,
        left_on="p_type", right_on="ref_type", model="levenshtein",
        left_id_col="p_partkey",
    )
    # ref has no numeric id -> engine used deterministic content ids for
    # the right side; tie-break is (score DESC, right_id ASC) where
    # right_id orders by ref_type content, matching ORDER BY ref_type.
    return out.select("p_partkey", "p_type", "ref_type", F.round("score", 6).alias("score"))


_EVAL_PAIRS_SQL = f"""
    SELECT p_partkey, round({sql_lev_sim('p_name', 'p_type')}, 6) AS score
    FROM part
"""


@_q("evaluate_pairs_part", _EVAL_PAIRS_SQL)
def evaluate_pairs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    out = lt.evaluate_pairs(part, left_on="p_name", right_on="p_type", model="levenshtein")
    return out.select("p_partkey", F.round("score", 6).alias("score"))


# all-pairs over ONE table (the reference's contract: a single frame,
# two key column sets, n x n row combinations — infer.py:490-560). The
# right key is multi-column to exercise serialize_columns in an oracle
# query: '</s>'-joined, nulls -> '' (utils.py:116-176 semantics).
_ALL_PAIRS_SQL = """
    SELECT l.s_name AS s_name,
           r.k AS "s_name-s_nationkey",
           round(1.0 - CAST(levenshtein(l.s_name, r.k) AS DOUBLE) /
                 CAST(greatest(length(l.s_name), length(r.k), 1) AS DOUBLE), 6) AS score
    FROM (SELECT s_name FROM supplier) l
    CROSS JOIN (
      SELECT concat_ws('</s>', coalesce(CAST(s_name AS VARCHAR), ''),
                               coalesce(CAST(s_nationkey AS VARCHAR), '')) AS k
      FROM supplier
    ) r
"""


@_q("all_pair_combos_supplier", _ALL_PAIRS_SQL)
def all_pair_combos_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    out = lt.all_pair_combos_evaluate(
        supp, left_on="s_name", right_on=["s_name", "s_nationkey"], model="levenshtein"
    )
    return out.select("s_name", "s_name-s_nationkey", F.round("score", 6).alias("score"))



# ---------------------------------------------------------------------------
# cluster_rows / dedup_rows (SURVEY §2.2 ops 8-9) — SLINK(eps=0.3) over
# normalized-levenshtein similarity of part names. The DuckDB oracle
# computes the same ε-graph and labels components by min-reachable id
# with a recursive CTE; noise (isolated rows) = -1.
# ---------------------------------------------------------------------------

_CLUSTER_SQL = f"""
    WITH RECURSIVE
    edges AS (
      SELECT a.p_partkey AS i, b.p_partkey AS j
      FROM part a, part b
      WHERE a.p_partkey <> b.p_partkey
        AND {sql_lev_sim('a.p_name', 'b.p_name')} >= 0.7
    ),
    reach(a, b) AS (
      SELECT p_partkey, p_partkey FROM part
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a)
    SELECT p.p_partkey, p.p_name,
           CASE WHEN p.p_partkey IN (SELECT i FROM edges)
                THEN c.lbl ELSE -1 END AS cluster
    FROM part p JOIN comp c ON p.p_partkey = c.id
"""


@_q("cluster_rows_slink", _CLUSTER_SQL)
def cluster_rows_slink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.cluster import cluster_rows

    part = _t(spark, sf_dir, "part")
    out = cluster_rows(
        part, model="levenshtein", on="p_name",
        cluster_type="SLINK", cluster_params={"threshold": 0.3},
        id_col="p_partkey",
    )
    return out.select("p_partkey", "p_name", "cluster")


# agglomerative(single, cosine): single-linkage at distance threshold
# eps IS the connected components of the STRICT (d < eps) similarity
# graph, so the numpy Lance-Williams kernel (operators/cluster.py
# _numpy_agglomerative, per-block applyInPandas) gets a full SQL
# oracle. No noise label: singletons keep their own id. eps=0.6 ->
# cos > 0.4, min |cos - 0.4| over the sf0.01 pairs = 1.3e-4, far above
# numpy-vs-fold summation noise (~1e-16).
def _agglo_sql() -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH RECURSIVE
    vn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings),
    edges AS (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM vn a, vn b
      WHERE a.vec_id <> b.vec_id AND (1.0 - {sql_dot('a.v', 'b.v')}) < 0.6
    ),
    reach(a, b) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a)
    SELECT e.vec_id, c.lbl AS cluster
    FROM embeddings e JOIN comp c ON e.vec_id = c.id
"""


@_q("cluster_rows_agglo_single", _agglo_sql())
def cluster_rows_agglo_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.encoders.precomputed import PrecomputedEncoder
    from linktransformer_spark.operators.cluster import cluster_rows
    from linktransformer_spark.operators.knn_join import CosineScorer

    emb = _t(spark, sf_dir, "embeddings")
    out = cluster_rows(
        emb,
        model=CosineScorer(PrecomputedEncoder("embedding")),
        on="vec_id",
        cluster_type="agglomerative",
        cluster_params={
            "threshold": 0.6, "clustering linkage": "single", "metric": "cosine",
        },
        id_col="vec_id",
    )
    return out.select("vec_id", "cluster")


_DEDUP_SQL = f"""
    WITH RECURSIVE
    firsts AS (SELECT min(p_partkey) AS id FROM part GROUP BY p_name),
    fpart AS (SELECT p.* FROM part p JOIN firsts f ON p.p_partkey = f.id),
    edges AS (
      SELECT a.p_partkey AS i, b.p_partkey AS j
      FROM fpart a, fpart b
      WHERE a.p_partkey <> b.p_partkey
        AND {sql_lev_sim('a.p_name', 'b.p_name')} >= 0.7
    ),
    reach(a, b) AS (
      SELECT p_partkey, p_partkey FROM fpart
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a)
    SELECT p.p_partkey, p.p_name
    FROM fpart p JOIN comp c ON p.p_partkey = c.id
    WHERE c.lbl = p.p_partkey
"""


@_q("dedup_rows_slink", _DEDUP_SQL)
def dedup_rows_slink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.cluster import dedup_rows

    part = _t(spark, sf_dir, "part")
    out = dedup_rows(
        part, model="levenshtein", on="p_name",
        cluster_type="SLINK", cluster_params={"threshold": 0.3},
        id_col="p_partkey",
    )
    return out.select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# LLM operators with deterministic mock clients (SURVEY §2.2 ops 10-12).
# The mock judge scores the serialized payloads with the same normalized
# levenshtein the oracle computes; classify/transform mocks are pure
# string functions — so all three are exactly SQL-expressible.
# ---------------------------------------------------------------------------

_JUDGE_SQL = f"""
    SELECT c_custkey, s_suppkey,
           round(score, 6) AS score,
           CASE WHEN sim >= 0.5 THEN 1 ELSE 0 END AS llm_is_match,
           round(sim, 6) AS llm_confidence
    FROM (
      SELECT c.c_custkey, s.s_suppkey,
             {sql_lev_sim('c.c_name', 's.s_name')} AS score,
             {sql_lev_sim('c.c_name', 's.s_name')} AS sim,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY {sql_lev_sim('c.c_name', 's.s_name')} DESC, s.s_suppkey ASC
             ) AS rn
      FROM customer c CROSS JOIN supplier s
    ) WHERE rn <= 2 AND sim >= 0.3
"""


@_q("merge_k_judge_mock", _JUDGE_SQL)
def merge_k_judge_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    out = lt.merge_k_judge(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        k=2, judge=lt.MockJudgeSpec(threshold=0.5), confidence_threshold=0.3,
        left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    return out.select(
        "c_custkey", "s_suppkey",
        F.round("score", 6).alias("score"),
        "llm_is_match",
        F.round("llm_confidence", 6).alias("llm_confidence"),
    )


_CLASSIFY_SQL = """
    SELECT p_partkey,
           CASE WHEN contains(lower(p_name), 'widget') THEN 1 ELSE 0 END
             AS "clf_preds_p_name"
    FROM part
"""


@_q("classify_rows_mock", _CLASSIFY_SQL)
def classify_rows_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    out = lt.classify_rows(
        part, on="p_name", classifier=lt.MockTopicSpec(topic="widget"),
        openai_topic="widget",
    )
    return out.select("p_partkey", "clf_preds_p_name")


_TRANSFORM_SQL = """
    SELECT p_partkey, p_name, upper(p_name) AS transformed_p_name
    FROM part WHERE p_name IS NOT NULL
"""


@_q("transform_rows_mock", _TRANSFORM_SQL)
def transform_rows_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    out = lt.transform_rows(part, on="p_name", transformer=lt.MockTransformSpec("upper"))
    return out.select("p_partkey", "p_name", "transformed_p_name")


# ---------------------------------------------------------------------------
# training-data pipeline: dedup suite / ANN / text analysis
# (north-star extensions; BASELINE.json). Near-dups are constructed
# deterministically inside the query (documents + mutated copies) so
# the pipelines have real work at every scale factor.
# ---------------------------------------------------------------------------

from .functions.oracle import (  # noqa: E402
    sql_dot,
    sql_fingerprint,
    sql_l2_normalize,
    sql_lang_id,
    sql_minhash_signature_from_hashes,
    sql_poly_hash,
    sql_quality_score,
    sql_shingle_hashes64,
    sql_simhash_from_hashes,
    sql_subword_count,
    sql_token_count,
    sql_word_shingles,
)

_DEDUP_EXACT_SQL = """
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
"""


@_q("dedup_exact_events", _DEDUP_EXACT_SQL)
def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import dedup_exact

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return dedup_exact(ev, on=["user_id", "event_type"], id_col="event_id")


def _augmented_docs(spark: SparkSession, sf_dir: str, limit_id: int) -> DataFrame:
    """documents (doc_id < limit) + near-dup copies (doc_id+1000000,
    text || ' extra suffix words') — deterministic, mirrored in SQL."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < limit_id)
    dup = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(dup)


_AUG_SQL = """
    aug AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {L}
      UNION ALL
      SELECT doc_id + 1000000, text || ' extra suffix words'
      FROM documents WHERE doc_id < {L}
    )
"""

_MINHASH_PAIRS_SQL = (
    "WITH " + _AUG_SQL.format(L=300) + f""",
    sh AS (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM aug),
    hs AS (SELECT id, sh, list_transform(sh, g -> {sql_poly_hash('g')}) AS hs FROM sh),
    sig AS (SELECT id, sh, {sql_minhash_signature_from_hashes('hs', 24)} AS sig FROM hs),
    bands AS (
      SELECT id, b, (sig)[b*3+1:b*3+3] AS bsig
      FROM sig CROSS JOIN range(0, 8) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.id AS src, r.id AS dst
      FROM bands l JOIN bands r ON l.b = r.b AND l.bsig = r.bsig AND l.id < r.id
    )
    SELECT c.src, c.dst,
           round(CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
                 / greatest(len(a.sh) + len(b2.sh) - len(list_intersect(a.sh, b2.sh)), 1), 6)
             AS jaccard
    FROM cand c JOIN sh a ON a.id = c.src JOIN sh b2 ON b2.id = c.dst
    WHERE CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
          / greatest(len(a.sh) + len(b2.sh) - len(list_intersect(a.sh, b2.sh)), 1) >= 0.6
"""
)


@_q("dedup_minhash_pairs", _MINHASH_PAIRS_SQL)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import near_dup_pairs_minhash

    aug = _augmented_docs(spark, sf_dir, 300)
    out = near_dup_pairs_minhash(
        aug, on="text", id_col="doc_id", threshold=0.6,
        num_hashes=24, bands=8, shingle=3, word=True,
    )
    return out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))


# Incremental (new-batch vs seen-corpus) MinHash near-dup: the ingest
# shape. new = suffix-mutated copies of seen docs 0-149 (guaranteed
# cross matches) + fresh docs 300-399 (mostly clean).
def _minhash_against_sql(seen_pred: str = "doc_id < 250") -> str:
    """``seen_pred`` narrows the seen corpus — the SQL mirror of a
    minhash-index tombstone (delete_from_minhash_index): the new batch
    is unchanged, deleted seen docs stop producing candidates."""
    return f"""
    WITH seen AS (SELECT doc_id, text FROM documents WHERE {seen_pred}),
    nw AS (
      SELECT doc_id + 1000000 AS doc_id, text || ' extra suffix words' AS text
      FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id >= 300 AND doc_id < 400
    ),
    shn AS (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM nw),
    hsn AS (SELECT id, sh, list_transform(sh, g -> {sql_poly_hash('g')}) AS hs FROM shn),
    sgn AS (SELECT id, sh, {sql_minhash_signature_from_hashes('hs', 24)} AS sig FROM hsn),
    bn AS (
      SELECT id, b, (sig)[b*3+1:b*3+3] AS bsig
      FROM sgn CROSS JOIN range(0, 8) AS t(b)
    ),
    shs AS (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM seen),
    hss AS (SELECT id, sh, list_transform(sh, g -> {sql_poly_hash('g')}) AS hs FROM shs),
    sgs AS (SELECT id, sh, {sql_minhash_signature_from_hashes('hs', 24)} AS sig FROM hss),
    bs AS (
      SELECT id, b, (sig)[b*3+1:b*3+3] AS bsig
      FROM sgs CROSS JOIN range(0, 8) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.id AS src, r.id AS dst
      FROM bn l JOIN bs r ON l.b = r.b AND l.bsig = r.bsig
    )
    SELECT c.src, c.dst,
           round(CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
                 / greatest(len(a.sh) + len(b2.sh) - len(list_intersect(a.sh, b2.sh)), 1), 6)
             AS jaccard
    FROM cand c JOIN shn a ON a.id = c.src JOIN shs b2 ON b2.id = c.dst
    WHERE CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
          / greatest(len(a.sh) + len(b2.sh) - len(list_intersect(a.sh, b2.sh)), 1) >= 0.6
"""


_MINHASH_AGAINST_SQL = _minhash_against_sql()


@_q("dedup_minhash_against", _MINHASH_AGAINST_SQL)
def dedup_minhash_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import near_dup_pairs_minhash_against

    d = _t(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") < 250).select("doc_id", "text")
    nw = (
        d.filter(F.col("doc_id") < 150)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
        )
        .unionByName(
            d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", "text")
        )
    )
    out = near_dup_pairs_minhash_against(
        nw, seen, on="text", id_col="doc_id", threshold=0.6,
        num_hashes=24, bands=8, shingle=3, word=True,
    )
    return out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))


_SIMHASH_PAIRS_SQL = (
    "WITH " + _AUG_SQL.format(L=200) + f""",
    sh AS (SELECT doc_id AS id, {sql_word_shingles('text', 1)} AS sh FROM aug),
    hs AS (SELECT id, {sql_shingle_hashes64('sh')} AS hs FROM sh),
    sim AS (SELECT id, {sql_simhash_from_hashes('hs')} AS sim FROM hs),
    blocks AS (
      SELECT id, sim, b, (sim >> (b * 16)) & 65535 AS bval
      FROM sim CROSS JOIN range(0, 4) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.id AS src, r.id AS dst, l.sim AS sim_l, r.sim AS sim_r
      FROM blocks l JOIN blocks r ON l.b = r.b AND l.bval = r.bval AND l.id < r.id
    )
    SELECT src, dst, bit_count(xor(sim_l, sim_r)) AS hamming
    FROM cand WHERE bit_count(xor(sim_l, sim_r)) <= 3
"""
)


@_q("dedup_simhash_pairs", _SIMHASH_PAIRS_SQL)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import near_dup_pairs_simhash

    aug = _augmented_docs(spark, sf_dir, 200)
    out = near_dup_pairs_simhash(
        aug, on="text", id_col="doc_id", hamming_threshold=3, word=True
    )
    return out.select("src", "dst", F.col("hamming").cast("long").alias("hamming"))


_JACCARD_PAIRS_SQL = (
    "WITH " + _AUG_SQL.format(L=200) + f""",
    sh AS (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM aug),
    tok AS (SELECT id, unnest(sh) AS g FROM sh),
    inter AS (
      SELECT l.id AS src, r.id AS dst, count(*) AS i
      FROM tok l JOIN tok r ON l.g = r.g AND l.id < r.id
      GROUP BY l.id, r.id
    )
    SELECT src, dst,
           round(CAST(i AS DOUBLE) / greatest(a.n + b.n - i, 1), 6) AS jaccard
    FROM inter
    JOIN (SELECT id, len(sh) AS n FROM sh) a ON a.id = src
    JOIN (SELECT id, len(sh) AS n FROM sh) b ON b.id = dst
    WHERE CAST(i AS DOUBLE) / greatest(a.n + b.n - i, 1) >= 0.6
"""
)


@_q("dedup_jaccard_pairs", _JACCARD_PAIRS_SQL)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import near_dup_pairs_jaccard

    aug = _augmented_docs(spark, sf_dir, 200)
    out = near_dup_pairs_jaccard(
        aug, on="text", id_col="doc_id", threshold=0.6, shingle=3, word=True
    )
    return out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))


# Quality-aware survivor policy (dedup_by_pairs keep_by): instead of
# the reference's keep-first/min-id rule, keep the LONGEST member of
# each near-dup component (min-id tie-break) — what corpus pipelines
# actually want when duplicates differ in completeness. Same exact
# jaccard pair graph as dedup_jaccard_pairs; CC by recursive CTE;
# survivor = row_number over (len DESC, id ASC) per component.
_DEDUP_KEEP_LONGEST_SQL = (
    "WITH RECURSIVE " + _AUG_SQL.format(L=200) + f""",
    sh AS (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM aug),
    inter AS (
      SELECT l.id AS src, r.id AS dst, count(*) AS i
      FROM (SELECT id, unnest(sh) AS g FROM sh) l
      JOIN (SELECT id, unnest(sh) AS g FROM sh) r ON l.g = r.g AND l.id < r.id
      GROUP BY l.id, r.id
    ),
    p AS (
      SELECT src, dst FROM inter
      JOIN (SELECT id, len(sh) AS n FROM sh) a ON a.id = src
      JOIN (SELECT id, len(sh) AS n FROM sh) b ON b.id = dst
      WHERE CAST(i AS DOUBLE) / greatest(a.n + b.n - i, 1) >= 0.6
    ),
    edges AS (SELECT src AS i, dst AS j FROM p
              UNION ALL SELECT dst, src FROM p),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM aug
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a),
    scored AS (
      SELECT c.id,
             row_number() OVER (
               PARTITION BY c.lbl ORDER BY len(g.text) DESC, c.id ASC
             ) AS rn
      FROM comp c JOIN aug g ON g.doc_id = c.id
    )
    SELECT id AS doc_id FROM scored WHERE rn = 1
"""
)


@_q("docs_dedup_keep_longest", _DEDUP_KEEP_LONGEST_SQL)
def docs_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import (
        dedup_by_pairs,
        near_dup_pairs_jaccard,
    )

    aug = _augmented_docs(spark, sf_dir, 200)
    pairs = near_dup_pairs_jaccard(
        aug, on="text", id_col="doc_id", threshold=0.6, shingle=3, word=True
    )
    out = dedup_by_pairs(aug, pairs, id_col="doc_id", keep_by=F.length("text"))
    return out.select("doc_id")


# normalize ONCE per row in a CTE, then plain dot per pair — exactly
# the Spark plan's float-op order (normalize-then-dot), so scores are
# bit-identical before rounding.
_EMB_PAIRS_SQL = f"""
    WITH sub AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id < 600
    )
    SELECT a.vec_id AS src, b.vec_id AS dst,
           round({sql_dot('a.v', 'b.v')}, 6) AS cosine
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE {sql_dot('a.v', 'b.v')} >= 0.4
"""


@_q("dedup_embedding_pairs", _EMB_PAIRS_SQL)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import near_dup_pairs_embedding

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 600)
    out = near_dup_pairs_embedding(emb, "embedding", "vec_id", threshold=0.4)
    return out.select("src", "dst", F.round("cosine", 6).alias("cosine"))


# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): IVF-cell-blocked
# embedding dedup. Seeded centroids (16 smallest-id vectors) + the same
# single-probe fold assignment as ann_topk_ivf_seeded make the blocking
# SQL-expressible; within-cell cosine>=t pairs -> connected components
# (recursive CTE) -> keep min-id per duplicate group. The Spark side's
# candidate stage is a cell equi-join (sum(|cell|^2), never global n^2).
def _semdedup_sql(n_cells: int = 16, t: float = 0.3) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH RECURSIVE
    cn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    asg AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cn c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    edges AS (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
      WHERE {sql_dot('a.v', 'b.v')} >= {t}
    ),
    reach(a, b) AS (
      SELECT vec_id, vec_id FROM cn
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a)
    SELECT e.vec_id FROM embeddings e JOIN comp c ON e.vec_id = c.id
    WHERE c.lbl = e.vec_id
"""


@_q("semdedup_embeddings", _semdedup_sql())
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, "embedding", "vec_id", threshold=0.3, n_cells=16)
    return out.select("vec_id")


_ANN_SQL = f"""
    WITH qn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id < 50
    ),
    cn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings)
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
             ) AS rank
      FROM qn q CROSS JOIN cn c
    ) WHERE rank <= 5
"""


@_q("ann_topk_bruteforce", _ANN_SQL)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.ann import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ann_topk(q, emb, vector_col="embedding", k=5, mode="exact_cross")
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# LSH ANN with a FULL SQL oracle: the hyperplane bucket id is pure
# deterministic arithmetic (sign bits of sequential-fold dot products
# against exact-double coefficient lists), so the approximate path is
# hash-checkable end-to-end — unlike IVF, whose k-means centroids
# aren't SQL-expressible. n_planes=6 -> 64 buckets over the 500-row
# sf0.01 corpus keeps candidate lists non-trivial.
def _ann_lsh_sql() -> str:
    from .functions.oracle import sql_hyperplane_bucket

    return f"""
    WITH qn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id < 50
    ),
    cn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings),
    qb AS (SELECT vec_id, v, {sql_hyperplane_bucket('v', 64, 6)} AS bkt FROM qn),
    cb AS (SELECT vec_id, v, {sql_hyperplane_bucket('v', 64, 6)} AS bkt FROM cn)
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
             ) AS rank
      FROM qb q JOIN cb c ON q.bkt = c.bkt
    ) WHERE rank <= 5
"""


@_q("ann_topk_lsh", _ann_lsh_sql())
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.ann import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ann_topk(
        q, emb, vector_col="embedding", k=5,
        mode="lsh_hyperplane", n_planes=6, dim=64,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


_TEXTPIPE_SQL = f"""
    SELECT doc_id,
           {sql_lang_id('text')} AS lang_id,
           round({sql_quality_score('text')}, 6) AS quality,
           CAST({sql_token_count('text')} AS BIGINT) AS n_tokens,
           {sql_subword_count('text')} AS n_subwords,
           {sql_fingerprint('text')} AS fingerprint
    FROM documents
"""


# Deterministic content-hash sampling (operators/sampling.py): the
# membership rule is pure arithmetic over the text, so the oracle
# reproduces the exact sample — impossible for RNG df.sample().
def _hash_sample_sql() -> str:
    from .functions.oracle import sql_poly_hash

    ph = sql_poly_hash("coalesce(text, '')")
    return f"""
    SELECT doc_id FROM documents
    WHERE {ph} % 1000000 < 300000
"""


# Deterministic train/val/test split: cumulative hash-bucket intervals
# (70/15/15), stable under incremental reprocessing by construction.
def _hash_split_sql() -> str:
    from .functions.oracle import sql_poly_hash

    ph = sql_poly_hash("coalesce(text, '')")
    return f"""
    SELECT split, count(*) AS n_docs FROM (
      SELECT CASE WHEN {ph} % 1000000 < 700000 THEN 'train'
                  WHEN {ph} % 1000000 < 850000 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split
"""


@_q("docs_hash_split", _hash_split_sql())
def docs_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    out = hash_split(
        docs, "text", {"train": 0.7, "val": 0.15, "test": 0.15}
    )
    return out.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


@_q("docs_hash_sample", _hash_sample_sql())
def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "text", fraction=0.3).select("doc_id")


def _sample_per_lang_sql() -> str:
    from .functions.oracle import sql_poly_hash

    ph = sql_poly_hash("coalesce(text, '')")
    return f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {ph} ASC, coalesce(text, '') ASC
             ) AS rn
      FROM documents
    ) WHERE rn <= 3
"""


@_q("docs_sample_per_lang", _sample_per_lang_sql())
def docs_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import sample_per_group

    docs = _t(spark, sf_dir, "documents")
    out = sample_per_group(docs, by="lang", n=3, key_cols="text")
    return out.select("doc_id", "lang")


# C4/Gopher-style quality gate over the textpipe signals; drop_reason
# is the first failing rule in a fixed order (the curation dashboard).
_QFILTER_SQL = f"""
    SELECT doc_id,
           CASE WHEN length(text) < 50 THEN 'too_short'
                WHEN length(text) > 20000 THEN 'too_long'
                WHEN {sql_token_count('text')} < 10 THEN 'too_few_tokens'
                WHEN {sql_quality_score('text')} < 0.5 THEN 'low_quality'
                WHEN {sql_lang_id('text')} NOT IN ('en', 'de') THEN 'lang'
                ELSE NULL END AS drop_reason,
           (CASE WHEN length(text) < 50 THEN 'too_short'
                WHEN length(text) > 20000 THEN 'too_long'
                WHEN {sql_token_count('text')} < 10 THEN 'too_few_tokens'
                WHEN {sql_quality_score('text')} < 0.5 THEN 'low_quality'
                WHEN {sql_lang_id('text')} NOT IN ('en', 'de') THEN 'lang'
                ELSE NULL END) IS NULL AS keep
    FROM documents
"""


@_q("docs_quality_filter", _QFILTER_SQL)
def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import annotate_quality_filter

    docs = _t(spark, sf_dir, "documents")
    out = annotate_quality_filter(docs, langs=("en", "de"))
    return out.select("doc_id", "drop_reason", "keep")


# CCNet-style unigram-LM quality signal (Wenzek et al. 2019): per-doc
# cross-entropy under the corpus's own add-1-smoothed unigram model.
# NLL folds per-token contributions in token sort order on BOTH
# engines (UTF-8 binary order matches) — a plain double SUM would be
# partial-aggregation-order dependent; n_tokens is an integer sum.
def _lm_ppl_sql() -> str:
    from .functions.oracle import sql_word_tokens

    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({sql_word_tokens('text')}) AS tok FROM documents
    ),
    dtc AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok),
    vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT sum(cnt) AS t, count(*) AS v FROM vocab),
    lp AS (
      SELECT d.doc_id, d.tok, d.n,
             CAST(d.n AS DOUBLE) * -ln(
               (CAST(coalesce(vb.cnt, 0) AS DOUBLE) + 1.0)
               / (CAST(tt.t AS DOUBLE) + 1.0 * CAST(tt.v AS DOUBLE))
             ) AS lp
      FROM dtc d LEFT JOIN vocab vb ON d.tok = vb.tok CROSS JOIN tot tt
    ),
    agg AS (
      SELECT doc_id, sum(n) AS n_tokens,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(lp ORDER BY tok)),
               (acc, x) -> acc + x
             ) AS nll
      FROM lp GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(nll / n_tokens, 6) AS avg_neg_logprob,
           round(exp(nll / n_tokens), 6) AS perplexity
    FROM agg
"""


@_q("docs_lm_perplexity", _lm_ppl_sql())
def docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import unigram_lm_score

    docs = _t(spark, sf_dir, "documents")
    out = unigram_lm_score(docs, text_col="text", id_col="doc_id")
    return out.select(
        "doc_id", "n_tokens",
        F.round("avg_neg_logprob", 6).alias("avg_neg_logprob"),
        F.round("perplexity", 6).alias("perplexity"),
    )


@_q("stream_quality_filter", _QFILTER_SQL)
def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming map: the C4/Gopher quality gate applied at
    INGEST time (the shape a production corpus pipeline runs — gate
    documents as they arrive, before anything is persisted). Identical
    plan to the batch docs_quality_filter, just under a streaming
    source; append mode, no state, no shuffle."""
    from .operators.textpipe import annotate_quality_filter
    from .streaming import read_stream_table, run_available_now

    docs = read_stream_table(spark, sf_dir, "documents")
    out = annotate_quality_filter(docs, langs=("en", "de")).select(
        "doc_id", "drop_reason", "keep"
    )
    return run_available_now(out, output_mode="append")


# Quantile binning of documents.n_chars into quartiles + per-bucket
# rollup. Boundaries: exact linearly-interpolated percentile (Spark
# `percentile` == DuckDB `quantile_cont`); assignment is a broadcast
# boundary array + counting filter — no ntile()/global sort.
_QUANTILE_SQL = """
    WITH b AS (
      SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS bnds
      FROM documents
    ),
    asg AS (
      SELECT d.doc_id, d.n_chars,
             CAST(len(list_filter(b.bnds,
                                  x -> CAST(d.n_chars AS DOUBLE) > x)) + 1
                  AS INT) AS bucket
      FROM documents d CROSS JOIN b
    )
    SELECT bucket, count(*) AS n, min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM asg GROUP BY bucket
"""


@_q("docs_quantile_buckets", _QUANTILE_SQL)
def docs_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import quantile_buckets

    docs = _t(spark, sf_dir, "documents")
    out = quantile_buckets(docs, "n_chars", n_buckets=4)
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# One-pass profiler: the oracle mirrors column-by-column as a UNION ALL
# (timestamps as epoch micros; exact decimal-summed means — see
# operators/profile.py for why the one double division is portable).
def _profile_sql() -> str:
    def num(c, dtype, expr=None):
        e = expr or c
        return f"""
    SELECT '{c}' AS "column", '{dtype}' AS dtype, count(*) AS n_rows,
           count(CASE WHEN {e} IS NULL THEN 1 END) AS n_null,
           count(DISTINCT {e}) AS n_distinct,
           CAST(min({e}) AS DOUBLE) AS min_num,
           CAST(max({e}) AS DOUBLE) AS max_num,
           CAST(sum(CAST({e} AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(count({e}) AS DOUBLE) AS mean,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders"""

    def txt(c, dtype):
        return f"""
    SELECT '{c}' AS "column", '{dtype}' AS dtype, count(*) AS n_rows,
           count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           CAST(NULL AS DOUBLE) AS mean,
           min(CAST({c} AS VARCHAR)) AS min_str,
           max(CAST({c} AS VARCHAR)) AS max_str
    FROM orders"""

    return " UNION ALL ".join([
        num("o_orderkey", "bigint"),
        num("o_custkey", "bigint"),
        txt("o_orderstatus", "string"),
        num("o_totalprice", "double"),
        num("o_orderdate", "timestamp_ntz", "epoch_us(o_orderdate)"),
    ])


@_q("profile_orders", _profile_sql())
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import profile_table

    orders = _t(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
        exact=True,
    )


@_q("text_analyze_documents", _TEXTPIPE_SQL)
def text_analyze_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.textpipe import analyze_documents

    docs = _t(spark, sf_dir, "documents")
    out = analyze_documents(docs)
    return out.select(
        "doc_id", "lang_id", F.round("quality", 6).alias("quality"),
        "n_tokens", "n_subwords", "fingerprint",
    )


# ---------------------------------------------------------------------------
# events substrate: sessionization + time-bucketed aggregation (the
# batch forms; streaming variants live in linktransformer_spark/streaming
# and are pytest-verified via the memory sink). Timestamps are compared
# as epoch MICROSECONDS (integer) to dodge tz-representation drift.
# ---------------------------------------------------------------------------

_SESSIONIZE_SQL = """
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    )
    SELECT user_id, event_id,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
"""


# As-of join: each purchase event picks up the latest view by the same
# user at-or-before it. The Spark side is the union+window single-
# shuffle plan (operators/asof.py); the oracle is an INDEPENDENT
# formulation (theta left join + qualify top-1) so the two cannot share
# a carry-forward bug. Timestamps compared as epoch micros; tie-break
# (r.ts DESC, r.event_id DESC) == the operator's "last in (ts ASC,
# rid ASC) order".
_ASOF_SQL = """
    WITH l AS (
      SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'view'
    )
    SELECT event_id, user_id, ts_us, value, view_event_id, view_ts_us, view_value
    FROM (
      SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             round(l.value, 6) AS value,
             r.event_id AS view_event_id, epoch_us(r.ts) AS view_ts_us,
             round(r.value, 6) AS view_value,
             row_number() OVER (
               PARTITION BY l.event_id
               ORDER BY r.ts DESC NULLS LAST, r.event_id DESC NULLS LAST
             ) AS rn
      FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
    ) WHERE rn = 1
"""


@_q("events_asof_purchase_view", _ASOF_SQL)
def events_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import merge_asof

    ev = _t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    r = ev.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id", "value"
    )
    out = merge_asof(
        l, r, on="ts", by="user_id", right_id_col="event_id",
        direction="backward",
    )
    return out.select(
        F.col("event_id_x").alias("event_id"), "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value_x", 6).alias("value"),
        F.col("event_id_y").alias("view_event_id"),
        F.unix_micros("ts_y").alias("view_ts_us"),
        F.round("value_y", 6).alias("view_value"),
    )


# direction="nearest": smallest |gap| wins, gap ties go backward
# (pandas rule), same-side ts ties go to the larger event id — exactly
# the two-carry pick in operators/asof.py. The oracle ranks the full
# theta join by (|gap| ASC as exact integer micros, backward-first,
# id DESC) — again an independent formulation.
_ASOF_NEAREST_SQL = """
    WITH l AS (
      SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'view'
    )
    SELECT event_id, user_id, ts_us, value, view_event_id, view_ts_us, view_value
    FROM (
      SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             round(l.value, 6) AS value,
             r.event_id AS view_event_id, epoch_us(r.ts) AS view_ts_us,
             round(r.value, 6) AS view_value,
             row_number() OVER (
               PARTITION BY l.event_id
               ORDER BY abs(epoch_us(l.ts) - epoch_us(r.ts)) ASC NULLS LAST,
                        CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END ASC NULLS LAST,
                        r.event_id DESC NULLS LAST
             ) AS rn
      FROM l LEFT JOIN r ON l.user_id = r.user_id
    ) WHERE rn = 1
"""


@_q("events_asof_nearest", _ASOF_NEAREST_SQL)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import merge_asof

    ev = _t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    r = ev.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id", "value"
    )
    out = merge_asof(
        l, r, on="ts", by="user_id", right_id_col="event_id",
        direction="nearest",
    )
    return out.select(
        F.col("event_id_x").alias("event_id"), "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value_x", 6).alias("value"),
        F.col("event_id_y").alias("view_event_id"),
        F.unix_micros("ts_y").alias("view_ts_us"),
        F.round("value_y", 6).alias("view_value"),
    )


@_q("events_sessionize", _SESSIONIZE_SQL)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1000000
    out = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev_ts") > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return out.select("user_id", "event_id", "session_id")


_WINDOW_AGG_SQL = """
    SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@_q("events_hourly_agg", _WINDOW_AGG_SQL)
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start"), "event_type", "n", "sum_value")
    )


# Semi-structured metadata extraction: events.props is a JSON string
# (the shape JSONL corpora carry per-doc metadata in). get_json_object
# stays JVM-side (Jackson, whole-stage codegen) — no Python workers —
# and the filter on the extracted field still prunes before the agg.
_PROPS_ROLLUP_SQL = """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props->>'k' AS BIGINT)) AS min_k,
           max(CAST(props->>'k' AS BIGINT)) AS max_k
    FROM events
    WHERE CAST(props->>'k' AS BIGINT) >= 10
    GROUP BY event_type
"""


@_q("events_props_rollup", _PROPS_ROLLUP_SQL)
def events_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("_k"))
        .filter(F.col("_k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
    )


_TOPK_REVENUE_SQL = """
    SELECT o_custkey, revenue, rnk FROM (
      SELECT o.o_custkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             row_number() OVER (
               ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                          DESC,
                        o.o_custkey ASC
             ) AS rnk
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    ) WHERE rnk <= 10
"""


@_q("topk_revenue_customers", _TOPK_REVENUE_SQL)
def topk_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            # rank on the ROUNDED revenue: the raw double sum is
            # partial-aggregation-order dependent, and at the rank-10
            # boundary that flips membership across engines/layouts
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_custkey").asc()).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "o_custkey", "revenue", "rnk"
    )


# ---------------------------------------------------------------------------
# IR + binary-classification evaluators (SURVEY §2.7) — the reference's
# evaluation.py:294-405 / :444-498 re-expressed as window+agg pipelines
# (operators/ir_eval.py). Setup: queries=customers, corpus=suppliers,
# results = lev-sim top-10, relevant = shared nation key.
# ---------------------------------------------------------------------------

from .functions.oracle import sql_lev_sim as _lev  # noqa: E402

_IR_METRICS_SQL = f"""
    WITH ranked AS (
      SELECT qid, cid, rank FROM (
        SELECT c.c_custkey AS qid, s.s_suppkey AS cid,
               row_number() OVER (
                 PARTITION BY c.c_custkey
                 ORDER BY {_lev('c.c_name', 's.s_name')} DESC, s.s_suppkey ASC
               ) AS rank
        FROM customer c CROSS JOIN supplier s
      ) WHERE rank <= 10
    ),
    rel AS (
      SELECT c.c_custkey AS qid, s.s_suppkey AS cid
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    ),
    n_rel AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
    hits AS (
      SELECT r.qid, r.rank,
             CASE WHEN rel.cid IS NOT NULL THEN 1 ELSE 0 END AS is_rel,
             sum(CASE WHEN rel.cid IS NOT NULL THEN 1 ELSE 0 END) OVER (
               PARTITION BY r.qid ORDER BY r.rank ROWS UNBOUNDED PRECEDING
             ) AS cum_correct
      FROM ranked r LEFT JOIN rel ON r.qid = rel.qid AND r.cid = rel.cid
    ),
    ks AS (SELECT unnest([1, 3, 5, 10]) AS k),
    per_qk_raw AS (
      SELECT h.qid, ks.k,
             max(is_rel) AS hit,
             sum(is_rel) AS num_correct,
             min(CASE WHEN is_rel = 1 THEN rank END) AS first_rel_rank,
             sum(CASE WHEN is_rel = 1 THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg,
             sum(CASE WHEN is_rel = 1 THEN cum_correct * 1.0 / rank ELSE 0 END) AS sum_prec
      FROM hits h CROSS JOIN ks WHERE h.rank <= ks.k
      GROUP BY h.qid, ks.k
    ),
    per_qk AS (
      SELECT n.qid, ks.k, n.n_rel,
             coalesce(hit, 0) AS hit,
             coalesce(num_correct, 0) AS num_correct,
             first_rel_rank,
             coalesce(dcg, 0) AS dcg,
             coalesce(sum_prec, 0) AS sum_prec,
             list_sum([1.0 / log2(x + 1) for x in range(1, least(ks.k, n.n_rel) + 1)]) AS idcg
      FROM n_rel n CROSS JOIN ks
      LEFT JOIN per_qk_raw p ON p.qid = n.qid AND p.k = ks.k
    )
    SELECT k,
           round(avg(hit), 6) AS accuracy,
           round(avg(num_correct * 1.0 / k), 6) AS precision,
           round(avg(num_correct * 1.0 / n_rel), 6) AS recall,
           round(avg(coalesce(1.0 / first_rel_rank, 0)), 6) AS mrr,
           round(avg(dcg / idcg), 6) AS ndcg,
           round(avg(sum_prec / least(k, n_rel)), 6) AS map
    FROM per_qk GROUP BY k
"""


@_q("ir_metrics_eval", _IR_METRICS_SQL)
def ir_metrics_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ir_eval import ir_metrics

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    results = lt.merge_knn(
        cust, supp, left_on="c_name", right_on="s_name", model="levenshtein",
        k=10, left_id_col="c_custkey", right_id_col="s_suppkey",
    ).select(
        F.col("c_custkey").alias("qid"),
        F.col("s_suppkey").alias("cid"),
        "score",
    )
    relevant = (
        cust.join(supp, cust["c_nationkey"] == supp["s_nationkey"])
        .select(F.col("c_custkey").alias("qid"), F.col("s_suppkey").alias("cid"))
    )
    m = ir_metrics(results, relevant, ks=(1, 3, 5, 10))
    return m.select(
        "k",
        *[F.round(c, 6).alias(c) for c in
          ("accuracy", "precision", "recall", "mrr", "ndcg", "map")],
    )


_BINARY_EVAL_SQL = f"""
    WITH pairs AS (
      SELECT {_lev('c.c_name', 's.s_name')} AS score,
             CASE WHEN c.c_nationkey = s.s_nationkey THEN 1 ELSE 0 END AS label
      FROM customer c JOIN supplier s ON s.s_suppkey = (c.c_custkey % 100) + 1
    ),
    totals AS (
      SELECT sum(label) AS P, sum(1 - label) AS N FROM pairs
    ),
    levels AS (
      SELECT score AS s, sum(label) AS pos, sum(1 - label) AS neg
      FROM pairs GROUP BY score
    ),
    sweep AS (
      SELECT s,
             sum(pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS tp,
             sum(neg) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS fp,
             (s + lead(s) OVER (ORDER BY s DESC)) / 2.0 AS threshold
      FROM levels
    ),
    scored AS (
      SELECT threshold,
             (tp + (t.N - fp)) * 1.0 / (t.P + t.N) AS acc,
             tp * 1.0 / (tp + fp) AS prec,
             CASE WHEN t.P > 0 THEN tp * 1.0 / t.P ELSE 0.0 END AS rec,
             CASE WHEN tp > 0 AND t.P > 0
                  THEN 2.0 * (tp * 1.0 / (tp + fp)) * (tp * 1.0 / t.P)
                       / (tp * 1.0 / (tp + fp) + tp * 1.0 / t.P)
                  ELSE 0.0 END AS f1
      FROM sweep, totals t WHERE threshold IS NOT NULL
    ),
    best_acc AS (
      SELECT acc, threshold FROM scored ORDER BY acc DESC, threshold DESC LIMIT 1
    ),
    best_f1 AS (
      SELECT f1, threshold, prec, rec FROM scored ORDER BY f1 DESC, threshold DESC LIMIT 1
    ),
    ap_calc AS (
      SELECT sum((r - r_prev) * p) AS ap FROM (
        SELECT CASE WHEN t.P > 0 THEN tp * 1.0 / t.P ELSE 0.0 END AS r,
               coalesce(lag(CASE WHEN t.P > 0 THEN tp * 1.0 / t.P ELSE 0.0 END)
                        OVER (ORDER BY s DESC), 0.0) AS r_prev,
               tp * 1.0 / (tp + fp) AS p
        FROM sweep, totals t
      )
    )
    SELECT round(a.acc, 6) AS accuracy,
           round(a.threshold, 6) AS accuracy_threshold,
           round(f.f1, 6) AS f1,
           round(f.threshold, 6) AS f1_threshold,
           round(f.prec, 6) AS precision,
           round(f.rec, 6) AS recall,
           round(ap.ap, 6) AS ap
    FROM best_acc a, best_f1 f, ap_calc ap
"""


@_q("binary_eval_name_match", _BINARY_EVAL_SQL)
def binary_eval_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import lev_sim
    from .operators.ir_eval import binary_eval

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    pairs = (
        cust.join(supp, supp["s_suppkey"] == (cust["c_custkey"] % 100) + 1)
        .select(
            lev_sim(F.col("c_name"), F.col("s_name")).alias("score"),
            F.when(F.col("c_nationkey") == F.col("s_nationkey"), 1)
            .otherwise(0).alias("label"),
        )
    )
    out = binary_eval(pairs)
    return out.select(
        *[F.round(c, 6).alias(c) for c in
          ("accuracy", "accuracy_threshold", "f1", "f1_threshold",
           "precision", "recall", "ap")],
    )


# ---------------------------------------------------------------------------
# preprocessing operators (SURVEY §2.6; linktransformer_spark/preprocess.py).
# Data: supplier joined to its nation — left = s_name (ids s_suppkey),
# right = n_name (ids s_nationkey). Components are nation-stars.
# ---------------------------------------------------------------------------

from .functions.oracle import sql_poly_hash as _ph  # noqa: E402


def _prep_base_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"]).select(
        "s_suppkey", "s_name", "s_nationkey", "n_name"
    )


_PREP_IDS_SQL = """
    WITH base AS (
      SELECT s_suppkey, s_name, s_nationkey, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ),
    ids AS (
      SELECT s_name AS left_text, n_name AS right_text,
             (dense_rank() OVER (ORDER BY s_suppkey) - 1) AS gl,
             (dense_rank() OVER (ORDER BY s_nationkey) - 1) AS gr
      FROM base
    )
"""


@_q(
    "prep_check_ids",
    _PREP_IDS_SQL
    + """
    SELECT left_text, right_text,
           CAST(gl AS VARCHAR) || '_l' AS left_id,
           CAST(gr AS VARCHAR) || '_r' AS right_id
    FROM ids
""",
)
def prep_check_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .preprocess import check_and_prep_data

    data = check_and_prep_data(
        _prep_base_spark(spark, sf_dir),
        left_col_names="s_name", right_col_names="n_name",
        left_id_name="s_suppkey", right_id_name="s_nationkey",
    )
    return data.select("left_text", "right_text", "left_id", "right_id")


_PREP_CC_SQL = _PREP_IDS_SQL.replace("WITH base", "WITH RECURSIVE base") + """
    ,
    enc AS (SELECT left_text, right_text, gl * 2 AS node_l, gr * 2 + 1 AS node_r FROM ids),
    edges AS (
      SELECT node_l AS i, node_r AS j FROM enc
      UNION
      SELECT node_r, node_l FROM enc
    ),
    nodes AS (SELECT DISTINCT i AS n FROM edges),
    reach(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a),
    clustered AS (
      SELECT enc.left_text, enc.right_text, c.lbl AS cluster_assignment
      FROM enc JOIN comp c ON enc.node_l = c.id
    )
"""


@_q(
    "prep_linkage_train_clusters",
    _PREP_CC_SQL
    + f"""
    , train AS (
      SELECT * FROM clustered
      WHERE {_ph("CAST(cluster_assignment AS VARCHAR)", 7)} % 1000 < 800
    )
    SELECT DISTINCT cluster_assignment, text FROM (
      SELECT cluster_assignment, left_text AS text FROM train
      UNION ALL
      SELECT cluster_assignment, right_text AS text FROM train
    )
""",
)
def prep_linkage_train_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .preprocess import prep_linkage_data

    out = prep_linkage_data(
        _prep_base_spark(spark, sf_dir),
        left_col_names="s_name", right_col_names="n_name",
        left_id_name="s_suppkey", right_id_name="s_nationkey",
        val_perc=0.2, large_val=False, test_at_end=True,
    )
    return out["train_clusters"].select("cluster_assignment", "text")


_PREP_FULL_SQL = """
    WITH RECURSIVE base AS (
      SELECT s_suppkey, s_name, s_nationkey, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ),
    ids AS (
      SELECT s_name AS left_text, n_name AS right_text,
             (dense_rank() OVER (ORDER BY s_suppkey) - 1) AS gl,
             (dense_rank() OVER (ORDER BY s_nationkey) - 1) AS gr
      FROM base
    ),
    enc AS (
      SELECT left_text, right_text,
             gl * 2 AS node_l, gr * 2 + 1 AS node_r,
             CAST(gl AS VARCHAR) || '_l' AS left_id,
             CAST(gr AS VARCHAR) || '_r' AS right_id
      FROM ids
    ),
    edges AS (
      SELECT node_l AS i, node_r AS j FROM enc
      UNION
      SELECT node_r, node_l FROM enc
    ),
    nodes AS (SELECT DISTINCT i AS n FROM edges),
    reach(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a),
    clustered AS (
      SELECT enc.*, c.lbl AS cluster_assignment
      FROM enc JOIN comp c ON enc.node_l = c.id
    )
"""


@_q(
    "prep_linkage_val_relevant",
    _PREP_FULL_SQL
    + f"""
    SELECT DISTINCT left_id AS qid, right_id AS cid
    FROM clustered
    WHERE {_ph("CAST(cluster_assignment AS VARCHAR)", 7)} % 1000 >= 800
      AND {_ph("CAST(cluster_assignment AS VARCHAR)", 7)} % 1000 < 900
""",
)
def prep_linkage_val_relevant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .preprocess import prep_linkage_data

    out = prep_linkage_data(
        _prep_base_spark(spark, sf_dir),
        left_col_names="s_name", right_col_names="n_name",
        left_id_name="s_suppkey", right_id_name="s_nationkey",
        val_perc=0.2, large_val=False, test_at_end=True,
    )
    return out["val_relevant"].select("qid", "cid")


@_q(
    "prep_paired_val_pairs",
    _PREP_IDS_SQL
    + f"""
    , keyed AS (
      SELECT left_text, right_text,
             CAST(gl AS VARCHAR) || '_l' AS left_id,
             CAST(gr AS VARCHAR) || '_r' AS right_id,
             label
      FROM ids JOIN (
        SELECT s_name, s_suppkey % 2 AS label FROM supplier
      ) lab ON lab.s_name = ids.left_text
    )
    SELECT left_text, right_text, label
    FROM keyed
    WHERE {_ph("left_id || '|' || right_id", 7)} % 1000 >= 800
      AND {_ph("left_id || '|' || right_id", 7)} % 1000 < 900
""",
)
def prep_paired_val_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .preprocess import prep_paired_label_data

    base = _prep_base_spark(spark, sf_dir).withColumn(
        "label", F.col("s_suppkey") % 2
    )
    out = prep_paired_label_data(
        base,
        left_col_names="s_name", right_col_names="n_name",
        left_id_name="s_suppkey", right_id_name="s_nationkey",
        label_col_name="label", val_perc=0.2, test_at_end=True,
    )
    return out["val_pairs"].select("left_text", "right_text", "label")


# ---------------------------------------------------------------------------
# Structured Streaming variants (streaming/ops.py): each query runs the
# streaming plan to completion with trigger(availableNow=True) into a
# memory sink, so the result is a batch table the SQL oracle can check.
# session_window boundary: a gap of EXACTLY 30min starts a new session
# (window end exclusive) -> oracle uses >=, unlike batch events_sessionize.
# ---------------------------------------------------------------------------


@_q(
    "stream_hourly_agg",
    """
    SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
""",
)
def stream_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import read_stream_table, run_available_now, streaming_hourly_agg

    ev = read_stream_table(spark, sf_dir, "events")
    return run_available_now(streaming_hourly_agg(ev), output_mode="complete")


@_q(
    "stream_dedup_user_type",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import read_stream_table, run_available_now, streaming_dedup

    ev = read_stream_table(spark, sf_dir, "events")
    return run_available_now(
        streaming_dedup(ev, ["user_id", "event_type"]), output_mode="append"
    )


@_q(
    "stream_sessionize",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
""",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import read_stream_table, run_available_now, streaming_sessionize

    ev = read_stream_table(spark, sf_dir, "events")
    return run_available_now(
        streaming_sessionize(ev, gap="30 minutes"), output_mode="complete"
    )


# Leave-one-out kNN label evaluation over the embeddings table — the
# embedding-quality scorecard (per-label k=5 majority-vote accuracy).
# Self excluded in the candidate join; neighbor tie-break (score DESC,
# id ASC); vote tie-break min label.
def _knn_eval_sql(k: int = 5) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH cn AS (
      SELECT vec_id, label, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    nn AS (
      SELECT q, tl, nl FROM (
        SELECT a.vec_id AS q, a.label AS tl, b.label AS nl,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {sql_dot('a.v', 'b.v')} DESC, b.vec_id ASC
               ) AS rn
        FROM cn a JOIN cn b ON a.vec_id <> b.vec_id
      ) WHERE rn <= {k}
    ),
    votes AS (SELECT q, tl, nl, count(*) AS n FROM nn GROUP BY q, tl, nl),
    pred AS (
      SELECT q, tl, nl AS predicted FROM (
        SELECT q, tl, nl,
               row_number() OVER (
                 PARTITION BY q ORDER BY n DESC, nl ASC
               ) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT CAST(tl AS BIGINT) AS label, count(*) AS n,
           CAST(sum(CASE WHEN predicted = tl THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN predicted = tl THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred GROUP BY tl
"""


@_q("knn_label_eval", _knn_eval_sql())
def knn_label_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import knn_label_eval

    emb = _t(spark, sf_dir, "embeddings")
    out = knn_label_eval(emb, "embedding", "vec_id", "label", k=5)
    return out.select(
        "label", "n", "n_correct", F.round("accuracy", 6).alias("accuracy")
    )


# NOT registered in QUERIES: the k-means centroids are not
# SQL-expressible, so the driver could only record a no-oracle row for
# it. Its IVF topology is fully hash-checked through the registered
# `ann_topk_ivf_seeded` twin (same build/assign/probe/re-rank plan,
# seeded centroids), and the k-means quality path is recall-gated in
# tests/test_dedup_ann.py::test_ivf_recall + benched as ann_ivf_topk.
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ivf_topk(q, emb, vector_col="embedding", k=5, n_cells=16, n_probe=8)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# Seeded IVF with a FULL SQL oracle: centroids are the n_cells
# smallest-id corpus vectors (no Lloyd rounds), assignment is the same
# sequential-fold dot + (dot DESC, cell ASC) tie-break on both engines,
# so the entire approximate index — build, assign, probe, re-rank — is
# hash-checkable. Complements ann_topk_ivf (k-means quality path,
# rows-only + pytest recall gate).
def _ann_ivf_seeded_sql(n_cells: int = 16, n_probe: int = 4, k: int = 5,
                        cand_pred: str | None = None,
                        query_pred: str = "vec_id < 50") -> str:
    """``cand_pred`` filters the CANDIDATE corpus rows (by ``c.vec_id``)
    BEFORE the top-k window — the SQL mirror of an index tombstone
    (delete_from_ivf_index): centroids/cells still derive from the full
    build-time corpus, only serving skips the deleted rows."""
    from .functions.oracle import sql_dot, sql_l2_normalize

    cw = f"WHERE {cand_pred}" if cand_pred else ""
    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    qn AS (SELECT vec_id, v FROM cn WHERE {query_pred}),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    cassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cn c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    qassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT q.vec_id, ct.cell, q.v,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM qn q CROSS JOIN cent ct
      ) WHERE rn <= {n_probe}
    )
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
             ) AS rank
      FROM qassign q JOIN cassign c ON q.cell = c.cell
      {cw}
    ) WHERE rank <= {k}
"""


# IVF-PQ with a FULL SQL oracle: seeded IVF restricts candidates to
# probed cells, seeded product quantization compresses corpus vectors
# to m codes, ADC scoring sums per-subspace lookups folded in subspace
# order (plain SUM of doubles is partial-aggregation-order dependent).
def _ann_ivfpq_sql(
    n_cells: int = 16, n_probe: int = 4, k: int = 5, m: int = 8,
    n_codes: int = 16, dim: int = 64, cand_pred: str | None = None,
    query_pred: str = "vec_id < 50",
) -> str:
    """``cand_pred`` filters the candidate corpus rows (``cc.vec_id``)
    BEFORE the ADC shortlist window — the SQL mirror of a PQ-index
    tombstone: the frozen centroids/codebook still derive from the
    full seed window, only serving skips the deleted rows.
    ``query_pred`` selects the query rows (default keeps the
    registered queries' byte-stable SQL)."""
    from .functions.oracle import sql_dot, sql_l2_normalize

    cw = f"WHERE {cand_pred}" if cand_pred else ""
    ds = dim // m
    qsub = f"q.v[b.sub*{ds}+1 : b.sub*{ds}+{ds}]"
    csub = f"a.v[b.sub*{ds}+1 : b.sub*{ds}+{ds}]"
    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    qn AS (SELECT vec_id, v FROM cn WHERE {query_pred}),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_codes})
    ),
    book AS (
      SELECT CAST(t.j AS INT) AS sub, code,
             v[t.j*{ds}+1 : t.j*{ds}+{ds}] AS cv
      FROM seeds CROSS JOIN range(0, {m}) t(j)
    ),
    cassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cn c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    ccodes AS (
      SELECT vec_id, cell, sub, code FROM (
        SELECT a.vec_id, a.cell, b.sub, b.code,
               row_number() OVER (
                 PARTITION BY a.vec_id, b.sub
                 ORDER BY {sql_dot(csub, 'b.cv')} DESC, b.code ASC
               ) AS rn
        FROM cassign a CROSS JOIN book b
      ) WHERE rn = 1
    ),
    qassign AS (
      SELECT vec_id, cell FROM (
        SELECT q.vec_id, ct.cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM qn q CROSS JOIN cent ct
      ) WHERE rn <= {n_probe}
    ),
    lut AS (
      SELECT q.vec_id, b.sub, b.code, {sql_dot(qsub, 'b.cv')} AS lut
      FROM qn q CROSS JOIN book b
    ),
    folded AS (
      SELECT p.qid, p.rid,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(l.lut ORDER BY l.sub)),
               (acc, x) -> acc + x
             ) AS score
      FROM (
        SELECT qa.vec_id AS qid, cc.vec_id AS rid, cc.sub, cc.code
        FROM qassign qa JOIN ccodes cc ON qa.cell = cc.cell
        {cw}
      ) p
      JOIN lut l ON l.vec_id = p.qid AND l.sub = p.sub AND l.code = p.code
      GROUP BY p.qid, p.rid
    )
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT qid AS query_id, rid AS neighbor_id, score,
             row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, rid ASC
             ) AS rank
      FROM folded
    ) WHERE rank <= {k}
"""


@_q("ann_topk_ivfpq", _ann_ivfpq_sql())
def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ivf_pq_topk(
        q, emb, vector_col="embedding", k=5, n_cells=16, n_probe=4,
        m=8, n_codes=16, dim=64,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# retrieve-wide + exact re-rank: ADC picks 40 candidates, the true
# vectors re-score only those, final rank on exact cosine.
def _ann_ivfpq_rerank_sql(k: int = 5, retrieve_k: int = 40,
                          query_pred: str = "vec_id < 50",
                          **ivfpq_kw) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    inner = _ann_ivfpq_sql(k=retrieve_k, query_pred=query_pred, **ivfpq_kw)
    return f"""
    WITH cand AS ({inner}),
    cn2 AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    qn2 AS (SELECT vec_id, v FROM cn2 WHERE {query_pred})
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT b.query_id, b.neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY b.query_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, b.neighbor_id ASC
             ) AS rank
      FROM cand b
      JOIN qn2 q ON q.vec_id = b.query_id
      JOIN cn2 c ON c.vec_id = b.neighbor_id
    ) WHERE rank <= {k}
"""


@_q("ann_topk_ivfpq_rerank", _ann_ivfpq_rerank_sql())
def ann_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import ivf_pq_rerank_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ivf_pq_rerank_topk(
        q, emb, vector_col="embedding", k=5, retrieve_k=40,
        n_cells=16, n_probe=4, m=8, n_codes=16, dim=64,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


@_q(
    "ann_serve_r90",
    _ann_ivfpq_rerank_sql(
        k=5, retrieve_k=40, n_cells=4, n_probe=3, m=16, n_codes=64
    ),
)
def ann_serve_r90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE serving default (operators/serving.py module doc): the r90
    IVF-PQ scan-wide + exact-re-rank recipe, here with every knob
    PINNED so the SQL mirror is byte-stable — production callers use
    the 'auto' resolution (resolve_serving_params), whose measured
    operating points are recall@10 0.99 at sf0.1 / 0.91 at sf1.

    The oracle is the SAME SQL as ann_topk_ivfpq_rerank with these
    parameters: the fast Arrow-batched serving path is bit-equal to
    the declarative ivf_pq_rerank_topk plan by construction (the
    left-assoc numpy fold contract), and this query is the standing
    proof."""
    from .operators.serving import ann_serving_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ann_serving_topk(
        q, emb, vector_col="embedding", k=5, n_cells=4, n_probe=3,
        m=16, n_codes=64, retrieve_k=40,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


@_q("ann_topk_ivf_seeded", _ann_ivf_seeded_sql())
def ann_topk_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import ivf_topk_seeded

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ivf_topk_seeded(
        q, emb, vector_col="embedding", k=5, n_cells=16, n_probe=4
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (operators/multimodal.py): binary payloads carry an
# 8-byte poly-hash header; the Spark side decodes REAL bytes in
# mapInPandas, the oracle reproduces every metric from the hash formula
# without touching bytes — end-to-end value check of the binary pipeline.
# ---------------------------------------------------------------------------

_MM_H = _ph("CAST(doc_id AS VARCHAR)")

_MM_DECODE_SQL = f"""
    WITH h AS (SELECT doc_id, {_MM_H} AS hv FROM documents),
    dims AS (
      SELECT doc_id,
             CAST(16 + hv % 240 AS INT) AS width,
             CAST(16 + (hv // 240) % 240 AS INT) AS height
      FROM h
    )
    SELECT doc_id, width, height,
           CAST(width AS DOUBLE) / height AS aspect,
           CAST(least(128.0 / greatest(width, height), 1.0) * width AS DOUBLE) AS sw,
           greatest(CAST(round(least(128.0 / greatest(width, height), 1.0) * width, 0) AS INT), 1) AS out_width,
           greatest(CAST(round(least(128.0 / greatest(width, height), 1.0) * height, 0) AS INT), 1) AS out_height
    FROM dims
"""


@_q(
    "multimodal_decode_resize",
    f"""
    SELECT doc_id, width, height, aspect, out_width, out_height
    FROM ({_MM_DECODE_SQL})
""",
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import attach_fake_media, decode_image, resize_image

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = attach_fake_media(docs, "doc_id", media_type="image")
    decoded = decode_image(media)
    resized = resize_image(decoded, target=128)
    return resized.select("doc_id", "width", "height", "aspect", "out_width", "out_height")


@_q(
    "multimodal_extract_features",
    f"""
    WITH h AS (SELECT doc_id, {_MM_H} AS hv FROM documents)
    SELECT doc_id,
           list_transform(range(0, 8), i ->
             round(CAST((hv * (2*i + 1) + 7919*i) % 104729 AS DOUBLE)
                   / 104729.0 - 0.5, 9)
           ) AS features
    FROM h
""",
)
def multimodal_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction (the CLIP/wav2vec slot): payload header
    hash -> exact-integer-derived feature vector via Arrow mapInPandas;
    the output column is embedding-family-compatible (ann_topk /
    semantic_dedup / knn_classify consume it directly)."""
    from .operators.multimodal import attach_fake_media, extract_features

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = attach_fake_media(docs, "doc_id", media_type="image")
    out = extract_features(media, dim=8)
    return out.select(
        "doc_id",
        F.transform(F.col("features"), lambda x: F.round(x, 9)).alias("features"),
    )


@_q(
    "stream_multimodal_decode",
    f"""
    SELECT doc_id, width, height, aspect, out_width, out_height
    FROM ({_MM_DECODE_SQL})
""",
)
def stream_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming map: the multimodal decode/resize plumbing
    applied at INGEST (the shape a media pipeline runs — binary columns
    decoded as files arrive). Identical Arrow-batched mapInPandas plan
    under a streaming source; append mode, no state, no shuffle."""
    from .operators.multimodal import attach_fake_media, decode_image, resize_image
    from .streaming import read_stream_table, run_available_now

    docs = read_stream_table(spark, sf_dir, "documents").select("doc_id")
    media = attach_fake_media(docs, "doc_id", media_type="image")
    resized = resize_image(decode_image(media), target=128)
    out = resized.select(
        "doc_id", "width", "height", "aspect", "out_width", "out_height"
    )
    return run_available_now(out, output_mode="append")


@_q(
    "multimodal_frame_sample",
    f"""
    WITH h AS (SELECT doc_id, {_MM_H} AS hv FROM documents),
    dur AS (SELECT doc_id, 1000 + hv % 60000 AS duration_ms FROM h)
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST((i * duration_ms) // 4 AS BIGINT) AS frame_ts_ms
    FROM dur, range(0, 4) t(i)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import attach_fake_media, frame_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = attach_fake_media(docs, "doc_id", media_type="video")
    return frame_sample(media, ["doc_id"], n_frames=4)


# ---------------------------------------------------------------------------
# training wrappers (train.py): the Spark data-prep side is fully
# relational -> oracle-checked. transform_column runs a deterministic
# batch fn through the mapInPandas chunk contract; the oracle applies
# the same pure function in SQL.
# ---------------------------------------------------------------------------


@_q(
    "clf_prep_train_split",
    f"""
    WITH lm AS (
      SELECT label, dense_rank() OVER (ORDER BY label) - 1 AS label_id
      FROM (SELECT DISTINCT lang AS label FROM documents)
    ),
    keyed AS (
      SELECT d.text AS _text, lm.label_id
      FROM documents d JOIN lm ON d.lang = lm.label
      WHERE d.lang IS NOT NULL
    )
    SELECT _text, label_id FROM keyed
    WHERE {_ph('_text', 7)} % 1000 < 700
""",
)
def clf_prep_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .train import train_clf_model

    docs = _t(spark, sf_dir, "documents")
    out = train_clf_model(
        docs, on="text", label_col_name="lang", prepare_only=True
    )
    return out["tables"]["train"]


@_q(
    "transform_column_fold",
    """
    SELECT doc_id, upper(strip_accents(CAST(text AS VARCHAR))) AS text_transformed
    FROM documents
""",
)
def transform_column_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .train import transform_column

    def fold(batch, kw):
        import unicodedata

        return [
            "".join(
                c for c in unicodedata.normalize("NFD", s) if not unicodedata.combining(c)
            ).upper()
            for s in batch
        ]

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = transform_column(docs, "text", fold, chunk_size=50)
    return out.select("doc_id", "text_transformed")


# ---------------------------------------------------------------------------
# prep_clus_data (preprocess.py reference :654-845): per-cluster
# query/corpus split with positional ids. Data: documents with lang as
# the cluster id -> cluster_assignment = dense_rank(lang)-1 + "_g";
# within-cluster order = text ASC (engine determinism rule).
# ---------------------------------------------------------------------------

_CLUS_BASE_SQL = """
    WITH base AS (
      SELECT text,
             CAST(dense_rank() OVER (ORDER BY lang, source) - 1 AS VARCHAR) || '_g'
               AS cluster_assignment
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
    ),
    parts AS (
      SELECT *,
             row_number() OVER (PARTITION BY cluster_assignment ORDER BY text) - 1 AS rn,
             count(*) OVER (PARTITION BY cluster_assignment) AS n
      FROM base
      WHERE {split_cond}
    ),
    cut AS (SELECT *, CAST(floor(n * 0.5) AS BIGINT) AS qcut FROM parts)
"""


def _clus_split_cond(lo: int, hi: int) -> str:
    h = _ph("cluster_assignment", 7)
    return f"{h} % 1000 >= {lo} AND {h} % 1000 < {hi}"


@_q(
    "clus_prep_val_queries",
    _CLUS_BASE_SQL.format(split_cond=_clus_split_cond(800, 900))
    + """
    SELECT cluster_assignment || CAST(rn AS VARCHAR) AS qid, text
    FROM cut WHERE rn < qcut
""",
)
def clus_prep_val_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .preprocess import prep_clus_data

    docs = _t(spark, sf_dir, "documents")
    out = prep_clus_data(
        docs, "text", ["lang", "source"], val_perc=0.2, val_query_prop=0.5,
        large_val=False, test_at_end=True,
    )
    return out["val_queries"].select("qid", "text")


@_q(
    "clus_prep_test_relevant",
    _CLUS_BASE_SQL.format(split_cond=_clus_split_cond(900, 1000))
    + """
    SELECT q.cluster_assignment || CAST(q.rn AS VARCHAR) AS qid,
           c.cluster_assignment || CAST(c.rn - c.qcut AS VARCHAR) || 'c' AS cid
    FROM (SELECT * FROM cut WHERE rn < qcut) q
    JOIN (SELECT * FROM cut WHERE rn >= qcut) c
      ON q.cluster_assignment = c.cluster_assignment
""",
)
def clus_prep_test_relevant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .preprocess import prep_clus_data

    docs = _t(spark, sf_dir, "documents")
    out = prep_clus_data(
        docs, "text", ["lang", "source"], val_perc=0.2, val_query_prop=0.5,
        large_val=False, test_at_end=True,
    )
    return out["test_relevant"].select("qid", "cid")


# Streaming incremental near-dup: the SAME pair semantics as the batch
# dedup_minhash_against (same oracle SQL), produced statelessly from a
# document stream band-joined against a static index — per-row
# signature expressions, first-matching-band row-local dedup, append
# mode with no state store.
@_q("stream_dedup_against", _MINHASH_AGAINST_SQL)
def stream_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import read_stream_table, run_available_now
    from .streaming.ops import streaming_dedup_against

    d = _t(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") < 250).select("doc_id", "text")

    s = read_stream_table(spark, sf_dir, "documents")
    nw = (
        s.filter(F.col("doc_id") < 150)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
        )
        .unionByName(
            s.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", "text")
        )
    )
    out = streaming_dedup_against(
        nw, seen, on="text", id_col="doc_id", threshold=0.6,
        num_hashes=24, bands=8, shingle=3, word=True,
    )
    out = out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))
    return run_available_now(out, output_mode="append")


# Streaming incremental SEMANTIC near-dup: new embedding rows checked
# against a static corpus SemDeDup-style. Stateless — the stream side's
# cell assignment is a pure expression over the collected (bounded,
# n_cells-row) centroid table; first-max argmax == the batch window's
# (dot DESC, cell ASC) tie-break, so the whole thing is SQL-mirrored.
def _stream_semdedup_sql(n_cells: int = 16, t: float = 0.3) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    corpus AS (SELECT vec_id, v FROM cn WHERE vec_id < 400),
    newv AS (SELECT vec_id, v FROM cn WHERE vec_id >= 400),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT {n_cells})
    ),
    cassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM corpus c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    nassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT q.vec_id, ct.cell, q.v,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM newv q CROSS JOIN cent ct
      ) WHERE rn = 1
    )
    SELECT n.vec_id AS src, c.vec_id AS dst, CAST(n.cell AS INT) AS cell,
           round({sql_dot('n.v', 'c.v')}, 6) AS cosine
    FROM nassign n JOIN cassign c ON n.cell = c.cell
    WHERE {sql_dot('n.v', 'c.v')} >= {t}
"""


@_q("stream_semdedup_against", _stream_semdedup_sql())
def stream_semdedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import read_stream_table, run_available_now
    from .streaming.ops import streaming_semdedup_against

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") < 400)
    s = read_stream_table(spark, sf_dir, "embeddings")
    nw = s.filter(F.col("vec_id") >= 400)
    out = streaming_semdedup_against(
        nw, corpus, vector_col="embedding", id_col="vec_id",
        threshold=0.3, n_cells=16,
    )
    out = out.select("src", "dst", "cell", F.round("cosine", 6).alias("cosine"))
    return run_available_now(out, output_mode="append")


@_q("stream_text_analyze", _TEXTPIPE_SQL)
def stream_text_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming map: the full text-analysis pass (lang id,
    quality, token counts, fingerprint) applied to a document STREAM —
    identical plan to the batch text_analyze_documents, just under a
    streaming source; append mode, no state."""
    from .operators.textpipe import analyze_documents
    from .streaming import read_stream_table, run_available_now

    docs = read_stream_table(spark, sf_dir, "documents")
    out = analyze_documents(docs).select(
        "doc_id", "lang_id", F.round("quality", 6).alias("quality"),
        "n_tokens", "n_subwords", "fingerprint",
    )
    return run_available_now(out, output_mode="append")


@_q(
    "stream_user_stats",
    """
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           max(epoch_us(ts)) AS last_seen_us
    FROM events GROUP BY user_id
""",
)
def stream_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator (applyInPandasWithState):
    per-user running totals in the executor state stores; the drained
    sink's last emission per user equals the batch GROUP BY — which is
    exactly what the oracle checks. Cross-batch state carry-over is
    exercised separately in tests/test_streaming.py (multi-file source,
    maxFilesPerTrigger=1)."""
    from .streaming import (
        final_user_stats, read_stream_table, run_available_now,
        streaming_user_stats,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    drained = run_available_now(streaming_user_stats(ev), output_mode="update")
    return final_user_stats(drained).select(
        "user_id", "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        "last_seen_us",
    )


# ---------------------------------------------------------------------------
# relational substrate widening: multi-join aggregations in the Q3/Q5
# shapes (join ordering, partial aggregation, broadcast of dims — all
# Catalyst-native; the engine's value is that semantic operators compose
# with this substrate in one plan).
# ---------------------------------------------------------------------------


@_q(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           epoch_us(o.o_orderdate) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate"))
    )


@_q(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@_q(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    reaches the parquet scan (PushedFilters), no join, no shuffle past
    the single partial/final aggregation pair."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "q10_returned_items",
    """
    SELECT c_custkey, revenue, n_name, rnk FROM (
      SELECT c.c_custkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             n.n_name,
             row_number() OVER (
               ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                          DESC,
                        c.c_custkey ASC
             ) AS rnk
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
        AND o.o_orderdate < TIMESTAMP '1996-01-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, n.n_name
    ) WHERE rnk <= 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join + broadcast dims + top-20 by
    aggregate. The rank key is the ROUNDED revenue (2dp, custkey
    tie-break) — an unrounded double sum is partial-aggregation-order
    dependent, and at a rank boundary that flips MEMBERSHIP, not just a
    cent. The global top-20 is orderBy+limit (TakeOrderedAndProject —
    per-partition heaps over the aggregated relation, no
    single-partition exchange); rnk is a window over the 20 survivors
    only."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    agg = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    top = agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "c_custkey", "revenue", "n_name", "rnk"
    )


@_q(
    "q18_large_volume_customers",
    """
    SELECT o.o_custkey, o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
           round(o.o_totalprice, 2) AS o_totalprice,
           CAST(q.sum_qty AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) q ON o.o_orderkey = q.l_orderkey
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-semijoin — the big fact
    aggregates FIRST (map-side partial sums; quantities are
    integer-valued doubles, so the sum commutes exactly) and only the
    qualifying order keys join back."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    q = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(q, o["o_orderkey"] == q["l_orderkey"])
        .select(
            "o_custkey", "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-curation ops (operators/corpus.py): C4-style line dedup, PII
# redaction, benchmark-contamination detection.
# ---------------------------------------------------------------------------

_PAGE_HEADER = "corpus exporter v1 all rights reserved"
_PAGE_FOOTER = "end of page boilerplate"

_DEDUP_LINES_SQL = f"""
    WITH pages AS (
      SELECT doc_id % 50 AS page_id,
             '{_PAGE_HEADER}' || chr(10) ||
             string_agg(text, chr(10) ORDER BY doc_id) || chr(10) ||
             '{_PAGE_FOOTER}' AS text
      FROM documents GROUP BY doc_id % 50
    ),
    l AS (
      SELECT page_id,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      FROM pages
    ),
    keep AS (
      SELECT page_id, pos, line FROM (
        SELECT page_id, pos, line,
               CASE WHEN trim(line) = '' THEN 1
                    ELSE row_number() OVER (
                      PARTITION BY trim(line) ORDER BY page_id, pos)
               END AS rn
        FROM l
      ) WHERE rn = 1
    )
    SELECT p.page_id, coalesce(k.text, '') AS text
    FROM pages p LEFT JOIN (
      SELECT page_id, string_agg(line, chr(10) ORDER BY pos) AS text
      FROM keep GROUP BY page_id
    ) k ON p.page_id = k.page_id
"""


@_q("docs_dedup_lines", _DEDUP_LINES_SQL)
def docs_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global duplicate-line removal on a paged corpus: pages of
    ~10 docs wrapped in boilerplate header/footer lines; dedup keeps the
    boilerplate only on the first page (the C4/RefinedWeb rule)."""
    docs = _t(spark, sf_dir, "documents")
    pages = (
        docs.groupBy((F.col("doc_id") % 50).alias("page_id"))
        .agg(
            F.concat_ws(
                "\n",
                F.lit(_PAGE_HEADER),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                        lambda s: s["text"],
                    ),
                    "\n",
                ),
                F.lit(_PAGE_FOOTER),
            ).alias("text")
        )
    )
    return lt.dedup_lines(pages, text_col="text", id_col="page_id")


_REDACT_SQL = r"""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name || ' <user' || CAST(c_custkey AS VARCHAR)
                    || '@corp-' || CAST(c_custkey % 97 AS VARCHAR)
                    || '.example.com> ip 10.0.'
                    || CAST(c_custkey % 256 AS VARCHAR) || '.'
                    || CAST(c_nationkey % 200 AS VARCHAR)
                    || ' tel +1 555-01' || CAST(c_custkey % 90 + 10 AS VARCHAR)
                    || ' end',
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d()\- ]{6,}\d', '<PHONE>', 'g') AS text
    FROM customer
"""


@_q("docs_redact_pii", _REDACT_SQL)
def docs_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over synthetic contact strings built from the
    customer table (the raw corpus carries no PII-shaped spans, so the
    query constructs the realistic input it redacts)."""
    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    with_pii = cust.select(
        "c_custkey",
        F.concat(
            F.col("c_name"), F.lit(" <user"), k.cast("string"),
            F.lit("@corp-"), (k % 97).cast("string"),
            F.lit(".example.com> ip 10.0."), (k % 256).cast("string"),
            F.lit("."), (F.col("c_nationkey") % 200).cast("string"),
            F.lit(" tel +1 555-01"), (k % 90 + 10).cast("string"),
            F.lit(" end"),
        ).alias("text"),
    )
    return lt.redact_pii(with_pii, text_col="text")


_CONTAMINATION_SQL = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(toks) - 3),
                                   i -> array_to_string(toks[i:i+4], ' '))) AS gram
      FROM t
    )
    SELECT tr.doc_id AS train_id, be.doc_id AS bench_id,
           count(*) AS shared_ngrams
    FROM g tr JOIN g be ON tr.gram = be.gram
    WHERE tr.doc_id % 10 <> 0 AND be.doc_id % 10 = 0
    GROUP BY tr.doc_id, be.doc_id
"""


@_q("docs_contamination", _CONTAMINATION_SQL)
def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: every 10th document is the held
    -out benchmark; report train docs sharing exact 5-gram spans."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return lt.contamination_pairs(train, bench, on="text", n=5)


_PACK_SQL = None  # assembled below (needs sql_token_count)


def _pack_sql() -> str:
    from .functions.oracle import sql_token_count

    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST({sql_token_count('text')} AS BIGINT) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(floor(off / 512.0) AS BIGINT) AS chunk_id,
           CAST(off % 512 AS BIGINT) AS chunk_pos,
           CAST(floor((off + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT)
             AS end_chunk_id
    FROM o
    """


@_q("docs_pack_sequences", _pack_sql())
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of the corpus onto 512-token training
    chunks; bucket_width=100 forces the two-phase distributed prefix
    sum (5 parallel bucket windows at sf0.01) against the oracle's
    single global window."""
    from .operators.textpipe import token_count_expr

    docs = _t(spark, sf_dir, "documents")
    work = docs.select(
        "doc_id", token_count_expr(F.col("text")).cast("long").alias("n_tokens")
    )
    out = lt.pack_sequences(work, id_col="doc_id", budget=512, bucket_width=100)
    return out.select("doc_id", "n_tokens", "chunk_id", "chunk_pos", "end_chunk_id")


@_q("stream_contamination", _CONTAMINATION_SQL)
def stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-time contamination guard: candidate training
    docs arrive as a STREAM and are n-gram-checked against the static
    benchmark corpus (every 10th doc). Stateless stream-static plan;
    oracle = the batch contamination SQL on the same split."""
    from .streaming import (
        read_stream_table, run_available_now, streaming_contamination,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    stream = read_stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    out = streaming_contamination(stream, bench, on="text", n=5)
    return run_available_now(out, output_mode="append")


def _curation_sql() -> str:
    """The flagship composed pipeline: one SQL statement mirroring the
    whole curation plan (quality gate -> redact -> jaccard near-dup CC
    dedup keep-min-id -> token counts -> concat-and-chunk packing).
    kept/sh are MATERIALIZED (values unchanged, evaluation hint only —
    the er_resolve_lsh precedent): inlined, the 3-regex redact +
    quality-score scan re-runs once per consumer (sh alone is
    referenced four times) — measured 16-17 s at sf0.001 vs ~2 s
    materialized."""
    from .functions.oracle import (
        sql_lang_id, sql_quality_score, sql_token_count, sql_word_shingles,
    )

    drop = f"""CASE WHEN length(text) < 50 THEN 'too_short'
                WHEN length(text) > 20000 THEN 'too_long'
                WHEN {sql_token_count('text')} < 10 THEN 'too_few_tokens'
                WHEN {sql_quality_score('text')} < 0.5 THEN 'low_quality'
                WHEN {sql_lang_id('text')} NOT IN ('en', 'de') THEN 'lang'
                ELSE NULL END"""
    return f"""
    WITH RECURSIVE
    kept AS MATERIALIZED (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b(\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b', '<IP>', 'g'),
               '\\+?\\d[\\d()\\- ]{{6,}}\\d', '<PHONE>', 'g') AS text
      FROM documents
      WHERE ({drop}) IS NULL
    ),
    sh AS MATERIALIZED (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM kept),
    tok AS (SELECT id, unnest(sh) AS g FROM sh),
    inter AS (
      SELECT l.id AS src, r.id AS dst, count(*) AS i
      FROM tok l JOIN tok r ON l.g = r.g AND l.id < r.id
      GROUP BY l.id, r.id
    ),
    pair AS (
      SELECT src, dst FROM inter
      JOIN (SELECT id, len(sh) AS n FROM sh) a ON a.id = src
      JOIN (SELECT id, len(sh) AS n FROM sh) b ON b.id = dst
      WHERE CAST(i AS DOUBLE) / greatest(a.n + b.n - i, 1) >= 0.6
    ),
    edges AS (
      SELECT src AS i, dst AS j FROM pair
      UNION ALL SELECT dst, src FROM pair
    ),
    reach(a, b) AS (
      SELECT id, id FROM sh
      UNION
      SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i
    ),
    comp AS (SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a),
    toks AS (
      SELECT k.doc_id,
             CAST({sql_token_count('k.text')} AS BIGINT) AS n_tokens
      FROM kept k JOIN comp c ON k.doc_id = c.id
      WHERE c.lbl = k.doc_id
    ),
    o AS (
      SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(floor(off / 512.0) AS BIGINT) AS chunk_id,
           CAST(off % 512 AS BIGINT) AS chunk_pos
    FROM o
    """


@_q("docs_curation_pipeline", _curation_sql())
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE Catalyst plan — the pipeline a
    training-data team actually ships: quality gate (C4/Gopher rules)
    -> PII redaction -> exact-jaccard near-dup removal (shingle
    equi-join + connected components, keep min id) -> token counts ->
    concat-and-chunk packing onto 512-token chunks. Every stage is one
    of this engine's operators composed lazily: Catalyst sees a single
    DAG (the documents scan is shared, filters push down through the
    redaction projection) and the oracle mirrors the whole thing as
    one recursive-CTE SQL statement."""
    from .operators.components import connected_components
    from .operators.textpipe import annotate_quality_filter, token_count_expr

    docs = _t(spark, sf_dir, "documents")
    kept = (
        annotate_quality_filter(docs, langs=("en", "de"))
        .filter(F.col("keep"))
        .select("doc_id", "text")
    )
    # the gated+redacted relation feeds three consumers (shingle build,
    # survivor anti-join, token counts) — cut lineage so the quality
    # expressions evaluate once, not once per consumer
    red = lt.redact_pii(kept).localCheckpoint(eager=False)
    pairs = lt.near_dup_pairs_jaccard(
        red, on="text", id_col="doc_id", threshold=0.6, shingle=3, word=True
    )
    dupped = (
        connected_components(pairs.select("src", "dst"))
        .filter(F.col("component") != F.col("node"))
        .select(F.col("node").alias("doc_id"))
    )
    survivors = red.join(dupped, "doc_id", "left_anti")
    toks = survivors.select(
        "doc_id", token_count_expr(F.col("text")).cast("long").alias("n_tokens")
    )
    out = lt.pack_sequences(toks, id_col="doc_id", budget=512, bucket_width=100)
    return out.select("doc_id", "n_tokens", "chunk_id", "chunk_pos")


def _repetition_sql() -> str:
    from .functions.oracle import sql_word_tokens

    toks = sql_word_tokens("text")
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    u AS (SELECT doc_id, count(*) AS nt, count(DISTINCT g) AS nd
          FROM (SELECT doc_id, unnest(toks) AS g FROM t) GROUP BY doc_id),
    g2 AS (SELECT doc_id, max(c) AS mc FROM (
            SELECT doc_id, g, count(*) AS c FROM (
              SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                     i -> array_to_string(toks[i:i+1], ' '))) AS g
              FROM t WHERE len(toks) >= 2) GROUP BY doc_id, g)
           GROUP BY doc_id),
    g3 AS (SELECT doc_id,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dp,
                  sum(c) AS np FROM (
            SELECT doc_id, g, count(*) AS c FROM (
              SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                     i -> array_to_string(toks[i:i+2], ' '))) AS g
              FROM t WHERE len(toks) >= 3) GROUP BY doc_id, g)
           GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(u.nt, 0) AS BIGINT) AS n_tokens,
           round(CASE WHEN coalesce(u.nt, 0) > 0
                 THEN 1.0 - CAST(u.nd AS DOUBLE) / CAST(u.nt AS DOUBLE)
                 ELSE 0.0 END, 6) AS dup_token_frac,
           round(coalesce(CAST(g2.mc * 2 AS DOUBLE) / CAST(u.nt AS DOUBLE),
                 0.0), 6) AS top_ngram_frac,
           round(coalesce(CAST(g3.dp AS DOUBLE) / CAST(g3.np AS DOUBLE),
                 0.0), 6) AS dup_ngram_frac
    FROM documents d
    LEFT JOIN u ON d.doc_id = u.doc_id
    LEFT JOIN g2 ON d.doc_id = g2.doc_id
    LEFT JOIN g3 ON d.doc_id = g3.doc_id
    """


@_q("docs_repetition_signals", _repetition_sql())
def docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals over the raw
    corpus (top_n=2, dup_n=3 defaults)."""
    from .operators.textpipe import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    out = repetition_stats(docs)
    return out.select(
        "doc_id", "n_tokens",
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
        F.round("top_ngram_frac", 6).alias("top_ngram_frac"),
        F.round("dup_ngram_frac", 6).alias("dup_ngram_frac"),
    )


_DEDUP_SPANS_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
      FROM t
    ),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_transform(toks, x -> lower(x))[i:i+9], ' ') AS g
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8)) AS i
            FROM t WHERE len(toks) >= 10)
    ),
    rn AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS r
      FROM occ
    ),
    cov AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_id, unnest(range(pos, pos + 10)) AS pos FROM rn WHERE r > 1
      )
    ),
    kept AS (
      SELECT k.doc_id, k.pos, k.tok
      FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.pos
      WHERE c.doc_id IS NULL
    )
    SELECT d.doc_id, coalesce(a.text, '') AS text
    FROM documents d LEFT JOIN (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
      FROM kept GROUP BY doc_id
    ) a ON d.doc_id = a.doc_id
"""


@_q("docs_dedup_spans", _DEDUP_SPANS_SQL)
def docs_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span dedup over the raw corpus at span width 10 —
    near-dup documents share long runs, so non-first copies of every
    duplicated 10-token span are cut out of the surviving text."""
    docs = _t(spark, sf_dir, "documents")
    return lt.dedup_spans(docs.select("doc_id", "text"), n=10)


def _sample_mixture_sql() -> str:
    from .functions.oracle import sql_poly_hash

    ph = sql_poly_hash("coalesce(text, '')")
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE {ph} % 1000000 <
          CASE lang WHEN 'de' THEN 1000000
                    WHEN 'en' THEN 400000
                    WHEN 'zh' THEN 0
                    ELSE 150000 END
"""


@_q("docs_sample_mixture", _sample_mixture_sql())
def docs_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified data-mix sampling: keep all German, 40% of English,
    drop Chinese, 15% of everything else — content-hash deterministic,
    so the oracle reproduces the exact mixture."""
    from .operators.sampling import sample_mixture

    docs = _t(spark, sf_dir, "documents")
    out = sample_mixture(
        docs, "lang", {"de": 1.0, "en": 0.4, "zh": 0.0},
        key_cols="text", default_fraction=0.15,
    )
    return out.select("doc_id", "lang")


_MATERIALIZE_CHUNKS_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    o AS (
      SELECT doc_id, toks,
             coalesce(sum(len(toks)) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM t
    ),
    tok AS (
      SELECT off + i AS gpos, tok FROM (
        SELECT off, unnest(toks) AS tok, unnest(range(0, len(toks))) AS i
        FROM o)
    )
    SELECT CAST(floor(gpos / 512.0) AS BIGINT) AS chunk_id,
           count(*) AS n_tokens,
           string_agg(tok, ' ' ORDER BY gpos) AS text
    FROM tok GROUP BY 1
"""


@_q("docs_materialize_chunks", _MATERIALIZE_CHUNKS_SQL)
def docs_materialize_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit the packed 512-token training chunks for the whole corpus
    (the step after docs_pack_sequences assigns chunk ids); two-phase
    prefix sum against the oracle's global window."""
    from .operators.corpus import materialize_chunks

    docs = _t(spark, sf_dir, "documents")
    return materialize_chunks(
        docs, text_col="text", id_col="doc_id", budget=512, bucket_width=100
    )


# Corpus dashboard rollup: docs/chars/token totals per (source, lang)
# with ROLLUP subtotals and grand total — one pass, GROUPING SETS are
# planned as a single Expand + hash aggregate (no self-union of
# per-level scans). grouping() flags disambiguate subtotal rows from
# genuine NULL group values.
def _source_rollup_sql() -> str:
    from .functions.oracle import sql_token_count

    return f"""
    SELECT coalesce(source, '<all>') AS source,
           coalesce(lang, '<all>') AS lang,
           CAST(grouping(source) AS INT) AS is_source_total,
           CAST(grouping(lang) AS INT) AS is_lang_total,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum({sql_token_count('text')}) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY ROLLUP (source, lang)
"""


@_q("docs_source_rollup", _source_rollup_sql())
def docs_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import token_count_expr

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            # grouping() flags are aggregate-scope expressions — they
            # must be computed IN the agg, not a downstream select
            F.grouping("source").cast("int").alias("is_source_total"),
            F.grouping("lang").cast("int").alias("is_lang_total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(token_count_expr(F.col("text")).cast("long")).alias(
                "total_tokens"
            ),
        )
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "is_source_total", "is_lang_total",
            "n_docs", "total_chars", "total_tokens",
        )
    )


# DSIR data selection (Xie et al. 2023, arXiv:2302.03169): hashed
# unigram+bigram importance weights of every raw doc against the
# English subset as the target distribution. Gram building mirrors
# _shingle_rows occurrence semantics (short-doc fallbacks included);
# bucket = portable poly_hash % K; per-doc fold ordered by bucket.
def _dsir_sql(k_buckets: int = 1024) -> str:
    from .functions.oracle import sql_poly_hash, sql_word_tokens

    kd = f"{float(k_buckets)!r}"
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, {sql_word_tokens("coalesce(text, '')")} AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, unnest(
        list_concat(
          CASE WHEN len(tk) = 0 THEN [''] ELSE tk END,
          CASE WHEN len(tk) >= 2
               THEN list_transform(range(0, len(tk) - 1),
                                   i -> tk[i+1] || ' ' || tk[i+2])
               ELSE [array_to_string(tk, ' ')] END
        )
      ) AS g FROM toks
    ),
    gb AS (SELECT doc_id, lang, {sql_poly_hash('g')} % {k_buckets} AS b FROM grams),
    rawdist AS (SELECT b, count(*) AS cr FROM gb GROUP BY b),
    tgtdist AS (SELECT b, count(*) AS ct FROM gb WHERE lang = 'en' GROUP BY b),
    rtot AS (SELECT sum(cr) AS tr FROM rawdist),
    ttot AS (SELECT sum(ct) AS tt FROM tgtdist),
    ratio AS (
      SELECT coalesce(r.b, t.b) AS b,
             ln((CAST(coalesce(t.ct, 0) AS DOUBLE) + 1.0)
                / (CAST(tto.tt AS DOUBLE) + 1.0 * {kd}))
           - ln((CAST(coalesce(r.cr, 0) AS DOUBLE) + 1.0)
                / (CAST(rto.tr AS DOUBLE) + 1.0 * {kd})) AS lr
      FROM rawdist r FULL OUTER JOIN tgtdist t ON r.b = t.b
      CROSS JOIN rtot rto CROSS JOIN ttot tto
    ),
    docb AS (SELECT doc_id, b, count(*) AS n FROM gb GROUP BY doc_id, b),
    agg AS (
      SELECT d.doc_id, sum(d.n) AS ng,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(CAST(d.n AS DOUBLE) * r.lr ORDER BY d.b)),
               (acc, x) -> acc + x
             ) AS lw
      FROM docb d JOIN ratio r ON d.b = r.b GROUP BY d.doc_id
    )
    SELECT doc_id, CAST(ng AS BIGINT) AS n_grams, round(lw, 6) AS log_weight
    FROM agg
"""


@_q("docs_dsir_weights", _dsir_sql())
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.corpus import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    out = dsir_log_weights(
        docs, target, text_col="text", id_col="doc_id", n_buckets=1024
    )
    return out.select(
        "doc_id", "n_grams", F.round("log_weight", 6).alias("log_weight")
    )


# ---------------------------------------------------------------------------
# BM25 keyword search (Robertson & Zaragoza 2009) — inverted-index
# equi-joins, order-pinned score fold (see operators/search.py).
# Queries are derived deterministically from the corpus itself: every
# 50th document's first 8 tokens.
# ---------------------------------------------------------------------------
def _bm25_sql(k: int = 5, corpus_pred: str | None = None,
              cand_pred: str | None = None) -> str:
    """``corpus_pred`` filters the corpus the stats derive from — the
    mirror of a PURGED index (compaction re-bakes N/avgdl/df over the
    survivors, identical to a filtered rebuild). ``cand_pred`` filters
    only the scored candidates (``dtc.d``) while stats stay full-corpus
    — the mirror of a TOMBSTONED index (frozen reference frame, deleted
    docs masked before ranking)."""
    from .functions.oracle import sql_word_tokens

    toks = sql_word_tokens("text")
    corp = f"WHERE {corpus_pred}" if corpus_pred else ""
    cand = f"WHERE {cand_pred}" if cand_pred else ""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({toks}) AS tok FROM documents {corp}
    ),
    dtc AS (SELECT doc_id AS d, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    dl AS (SELECT d, sum(tf) AS dl FROM dtc GROUP BY d),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM dtc GROUP BY tok),
    idf AS (
      SELECT tok,
             ln(1.0 + (CAST(s.n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf,
             s.avgdl
      FROM dfreq CROSS JOIN stats s
    ),
    qt AS (
      SELECT DISTINCT q, tok FROM (
        SELECT doc_id AS q, unnest(({toks})[1:8]) AS tok
        FROM documents WHERE doc_id % 50 = 0
      )
    ),
    contrib AS (
      SELECT qt.q, dtc.d, dtc.tok,
             i.idf * (CAST(dtc.tf AS DOUBLE) * (1.2 + 1.0))
             / (CAST(dtc.tf AS DOUBLE)
                + 1.2 * ((1.0 - 0.75)
                         + 0.75 * (CAST(dl.dl AS DOUBLE) / i.avgdl))) AS c
      FROM qt JOIN dtc ON qt.tok = dtc.tok
              JOIN idf i ON dtc.tok = i.tok
              JOIN dl ON dtc.d = dl.d
      {cand}
    ),
    scored AS (
      SELECT q, d, CAST(count(*) AS BIGINT) AS n_terms,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY tok)),
               (acc, x) -> acc + x
             ) AS score
      FROM contrib GROUP BY q, d
    )
    SELECT q AS q_id, d AS doc_id, CAST(r AS INT) AS rank,
           round(score, 6) AS score, n_terms
    FROM (
      SELECT q, d, n_terms, score,
             row_number() OVER (PARTITION BY q ORDER BY score DESC, d ASC) AS r
      FROM scored
    ) WHERE r <= {k}
"""


@_q("search_bm25_documents", _bm25_sql())
def search_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import similarity as S
    from .operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    out = bm25_topk(docs, queries, k=5)
    return out.select(
        "q_id", "doc_id", "rank", F.round("score", 6).alias("score"), "n_terms"
    )


@_q("search_bm25_indexed", _bm25_sql())
def search_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistable-index serving path: build + save the
    impact-scored inverted index (operators/search.py
    save_bm25_index — postings partitioned by term-hash bucket), then
    retrieve through bm25_topk_indexed, whose scan reads only the
    buckets the query batch touches. Same oracle as the one-shot form:
    the stored impact IS the per-posting BM25 contribution, so results
    are bit-identical."""
    import tempfile

    from .functions import similarity as S
    from .operators.search import bm25_topk_indexed, save_bm25_index

    docs = _t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_bm25_idx_{tag}"
    save_bm25_index(docs, path)
    out = bm25_topk_indexed(spark, path, queries, k=5)
    return out.select(
        "q_id", "doc_id", "rank", F.round("score", 6).alias("score"), "n_terms"
    )


# ---------------------------------------------------------------------------
# Gopher/MassiveText quality rules (Rae et al. 2021, Appendix A1.1) —
# map-only signal pass, see operators/textpipe.gopher_quality_signals.
# ---------------------------------------------------------------------------
def _gopher_sql() -> str:
    from .functions.oracle import sql_word_tokens
    from .operators.textpipe import GOPHER_STOPWORDS

    toks = sql_word_tokens("text")
    stoplist = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"
    return f"""
    WITH sig AS (
      SELECT doc_id,
             CAST(len({toks}) AS BIGINT) AS nw,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform({toks}, t -> length(t))),
               (a, x) -> a + x
             ) AS cs,
             length(coalesce(text, ''))
               - length(replace(coalesce(text, ''), '#', '')) AS nhash,
             (length(coalesce(text, ''))
               - length(replace(coalesce(text, ''), '...', ''))) / 3 AS nell,
             list_filter(
               list_transform(string_split(coalesce(text, ''), chr(10)),
                              l -> trim(l)),
               l -> l <> ''
             ) AS lines,
             CAST(len(list_filter({toks},
                 t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS nalpha,
             CAST(len(list_intersect({toks}, {stoplist})) AS BIGINT) AS nstop
      FROM documents
    ),
    r AS (
      SELECT doc_id, nw,
             CASE WHEN nw > 0 THEN CAST(cs AS DOUBLE) / CAST(nw AS DOUBLE)
                  ELSE 0.0 END AS mwl,
             CASE WHEN nw > 0 THEN (nhash + nell) / CAST(nw AS DOUBLE)
                  ELSE 0.0 END AS symr,
             CASE WHEN len(lines) > 0 THEN
               CAST(len(list_filter(lines, l -> starts_with(l, '•')
                 OR starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
               / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS bulr,
             CASE WHEN len(lines) > 0 THEN
               CAST(len(list_filter(lines, l -> ends_with(l, '...')
                 OR ends_with(l, '…'))) AS DOUBLE)
               / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS ellr,
             CASE WHEN nw > 0 THEN CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE)
                  ELSE 0.0 END AS alphar,
             nstop
      FROM sig
    )
    SELECT doc_id, nw AS n_words,
           round(mwl, 6) AS mean_word_len,
           round(symr, 6) AS symbol_ratio,
           round(bulr, 6) AS bullet_ratio,
           round(ellr, 6) AS ellipsis_ratio,
           round(alphar, 6) AS alpha_word_ratio,
           nstop AS n_stop_hits,
           (nw >= 50 AND nw <= 100000
            AND mwl >= 3.0 AND mwl <= 10.0
            AND symr <= 0.1
            AND bulr < 0.9
            AND ellr < 0.3
            AND alphar >= 0.8
            AND nstop >= 2) AS keep
    FROM r
"""


@_q("docs_gopher_rules", _gopher_sql())
def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import gopher_quality_signals

    docs = _t(spark, sf_dir, "documents")
    out = gopher_quality_signals(docs)
    return out.select(
        "doc_id", "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("symbol_ratio", 6).alias("symbol_ratio"),
        F.round("bullet_ratio", 6).alias("bullet_ratio"),
        F.round("ellipsis_ratio", 6).alias("ellipsis_ratio"),
        F.round("alpha_word_ratio", 6).alias("alpha_word_ratio"),
        "n_stop_hits", "keep",
    )


# ---------------------------------------------------------------------------
# Event-pipeline: ordered conversion funnel + cohort retention
# (operators/eventpipe.py). The oracle is the INDEPENDENT textbook
# formulation — a chain of min-join CTEs — while the Spark side is the
# one-shuffle sorted-fold plan, so a value match checks the semantics,
# not the implementation.
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]
_FUNNEL_WITHIN_S = 259200  # 72 h from step 1


def _funnel_ctes() -> str:
    ctes = [
        """s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        )"""
    ]
    for i, step in enumerate(_FUNNEL_STEPS[1:], start=2):
        ctes.append(f"""s{i} AS (
          SELECT e.user_id, min(e.ts) AS t{i}
          FROM events e
          JOIN s{i - 1} p ON e.user_id = p.user_id
          JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = '{step}'
            AND e.ts >= p.t{i - 1}
            AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WITHIN_S} SECOND
          GROUP BY e.user_id
        )""")
    return ",\n    ".join(ctes)


def _funnel_summary_sql() -> str:
    names = ", ".join(
        f"(SELECT count(*) FROM s{i + 1}) AS n{i + 1}"
        for i in range(len(_FUNNEL_STEPS))
    )
    rows = []
    for i, step in enumerate(_FUNNEL_STEPS, start=1):
        prev = f"n{i - 1}" if i > 1 else "n1"
        rows.append(
            f"SELECT {i} AS step, '{step}' AS step_name, "
            f"n{i} AS n_users, n1 AS _n1, {prev} AS _nprev FROM c"
        )
    body = "\n      UNION ALL ".join(rows)
    return f"""
    WITH {_funnel_ctes()},
    c AS (SELECT {names})
    SELECT step, step_name, n_users,
           CASE WHEN _n1 > 0
                THEN round(CAST(n_users AS DOUBLE) / _n1, 6)
                ELSE 0.0 END AS frac_first,
           CASE WHEN _nprev > 0
                THEN round(CAST(n_users AS DOUBLE) / _nprev, 6)
                ELSE 0.0 END AS frac_prev
    FROM ({body})
    """


def _funnel_users_sql() -> str:
    joins = "\n    ".join(
        f"LEFT JOIN s{i} ON s1.user_id = s{i}.user_id"
        for i in range(2, len(_FUNNEL_STEPS) + 1)
    )
    cols = ", ".join(f"t{i} AS t_{i}" for i in range(1, len(_FUNNEL_STEPS) + 1))
    return f"""
    WITH {_funnel_ctes()}
    SELECT s1.user_id, {cols}
    FROM s1
    {joins}
    """


@_q("events_funnel_summary", _funnel_summary_sql())
def events_funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.eventpipe import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN_S)


@_q("events_funnel_users", _funnel_users_sql())
def events_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.eventpipe import funnel_user_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_user_steps(ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN_S)


_RETENTION_SQL = """
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS p
      FROM events
    ),
    firstp AS (
      SELECT user_id, min(p) AS cohort FROM act GROUP BY user_id
    ),
    j AS (
      SELECT f.cohort,
             CAST(datediff('day', f.cohort, a.p) AS INTEGER) AS period_offset
      FROM act a JOIN firstp f ON a.user_id = f.user_id
      WHERE datediff('day', f.cohort, a.p) <= 14
    ),
    sizes AS (
      SELECT cohort, count(*) AS n_cohort FROM firstp GROUP BY cohort
    )
    SELECT j.cohort, j.period_offset, count(*) AS n_active, s.n_cohort,
           round(CAST(count(*) AS DOUBLE) / s.n_cohort, 6) AS retention
    FROM j JOIN sizes s ON j.cohort = s.cohort
    GROUP BY j.cohort, j.period_offset, s.n_cohort
"""


@_q("events_retention_daily", _RETENTION_SQL)
def events_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.eventpipe import retention

    ev = _t(spark, sf_dir, "events")
    return retention(ev, period="day", max_offset=14)


@_q("stream_funnel_users", _funnel_users_sql())
def stream_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel (applyInPandasWithState: O(k) fire-time state
    per user, Python fold mirroring the batch JVM fold on integer
    micros) drained and finalized — same oracle as the batch
    events_funnel_users."""
    from .streaming import (
        final_funnel_users, read_stream_table, run_available_now,
        streaming_funnel_steps,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    sdf = streaming_funnel_steps(ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN_S)
    drained = run_available_now(sdf, output_mode="update")
    return final_funnel_users(drained, _FUNNEL_STEPS)


@_q("stream_funnel_summary", _funnel_summary_sql())
def stream_funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-count/conversion summary over the drained streaming funnel
    — the batch summarize tail, same oracle as events_funnel_summary."""
    from .streaming import (
        final_funnel_summary, read_stream_table, run_available_now,
        streaming_funnel_steps,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    sdf = streaming_funnel_steps(ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN_S)
    drained = run_available_now(sdf, output_mode="update")
    return final_funnel_summary(drained, _FUNNEL_STEPS)


@_q("stream_retention", _RETENTION_SQL)
def stream_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cohort retention: first-seen (user, period) upsert in
    the state store (append-mode dedup), rolled into the cohort table
    at drain — same oracle as the batch events_retention_daily."""
    from .streaming import (
        final_retention, read_stream_table, run_available_now,
        streaming_retention_activity,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    sdf = streaming_retention_activity(ev, period="day")
    drained = run_available_now(sdf, output_mode="append")
    return final_retention(drained, period="day", max_offset=14)


# ---------------------------------------------------------------------------
# Vocabulary statistics (operators/vocab.py): tokenizer-prep frequency/
# coverage table + PMI collocations. Tokenizer = the engine-wide
# word_tokens twin pair.
# ---------------------------------------------------------------------------

def _top_vocab_sql(k: int = 500) -> str:
    from .functions.oracle import sql_word_tokens

    toks = sql_word_tokens("text")
    return f"""
    WITH toks AS (
      SELECT unnest({toks}) AS token FROM documents
    ),
    cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
    top AS (SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT {k})
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank,
           round(CAST(n AS DOUBLE) / total, 6) AS frac,
           round(CAST(sum(n) OVER (ORDER BY n DESC, token
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / total, 6) AS cum_frac
    FROM top, tot
    """


@_q("docs_top_vocab", _top_vocab_sql(500))
def docs_top_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.vocab import top_vocab

    docs = _t(spark, sf_dir, "documents")
    return top_vocab(docs, vocab_size=500)


def _collocations_sql(min_count: int = 10, top_k: int = 200) -> str:
    from .functions.oracle import sql_word_tokens

    toks = sql_word_tokens("text")
    return f"""
    WITH base AS (SELECT {toks} AS t FROM documents),
    toks AS (SELECT unnest(t) AS token FROM base),
    pos AS (
      SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM base WHERE len(t) >= 2
    ),
    bi AS (
      SELECT w1, w2, count(*) AS n_pair FROM pos GROUP BY w1, w2
      HAVING count(*) >= {min_count}
    ),
    uni AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    tot AS (
      SELECT CAST((SELECT count(*) FROM toks) AS BIGINT) AS n_tok,
             CAST((SELECT count(*) FROM pos) AS BIGINT) AS n_bi
    )
    SELECT w1, w2, n_pair, pmi FROM (
      SELECT bi.w1, bi.w2, bi.n_pair,
             round(ln((CAST(bi.n_pair AS DOUBLE) / tot.n_bi)
                      / ((CAST(u1.c AS DOUBLE) / tot.n_tok)
                         * (CAST(u2.c AS DOUBLE) / tot.n_tok))), 6) AS pmi
      FROM bi
      JOIN uni u1 ON bi.w1 = u1.token
      JOIN uni u2 ON bi.w2 = u2.token
      CROSS JOIN tot
    )
    ORDER BY pmi DESC, w1, w2 LIMIT {top_k}
    """


@_q("docs_collocations_pmi", _collocations_sql(10, 200))
def docs_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.vocab import collocations

    docs = _t(spark, sf_dir, "documents")
    return collocations(docs, min_count=10, top_k=200)


# ---------------------------------------------------------------------------
# int8-quantized exact ANN (operators/ann.py mode="exact_int8"): the
# quantization is pure arithmetic (max-abs scale, round-half-up) and
# the integer dot is order-independent, so the whole compressed path
# is hash-checkable — the rare case where a bandwidth optimization
# costs no oracle coverage.
# ---------------------------------------------------------------------------

def _ann_int8_sql() -> str:
    from .functions.oracle import sql_l2_normalize

    def quant(src: str, id_filter: str) -> str:
        return f"""(
          SELECT vec_id, s,
                 list_transform(v, x -> CAST(floor(x / s + 0.5) AS BIGINT)) AS c
          FROM (
            SELECT vec_id, v,
                   greatest(list_max(list_transform(v, x -> abs(x))), 1e-12)
                     / 127.0 AS s
            FROM (
              SELECT vec_id, {sql_l2_normalize('embedding')} AS v
              FROM embeddings {id_filter}
            )
          )
        )"""

    int_dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, len(q.c) + 1), "
        "i -> q.c[i] * c.c[i])), (acc, x) -> acc + x)"
    )
    score = f"CAST({int_dot} AS DOUBLE) * q.s * c.s"
    return f"""
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {score} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {score} DESC, c.vec_id ASC
             ) AS rank
      FROM {quant('embeddings', 'WHERE vec_id < 50')} q
      CROSS JOIN {quant('embeddings', '')} c
    ) WHERE rank <= 5
    """


@_q("ann_topk_int8", _ann_int8_sql())
def ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.ann import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ann_topk(q, emb, vector_col="embedding", k=5, mode="exact_int8")
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# Exact incremental dedup (operators/dedup.py dedup_exact_against):
# Spark side anti-joins on a 64-bit digest PAIR of the key (the
# bandwidth-optimized path); the oracle anti-joins on the raw text —
# a value match certifies the hashed plan loses nothing.
# ---------------------------------------------------------------------------

_DEDUP_EXACT_AGAINST_SQL = """
    WITH seen AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 250
    ),
    nw AS (
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id >= 300 AND doc_id < 400
    )
    SELECT n.doc_id, n.text FROM nw n
    WHERE NOT EXISTS (
      SELECT 1 FROM seen s
      WHERE coalesce(s.text, '') = coalesce(n.text, '')
    )
"""


@_q("docs_dedup_exact_against", _DEDUP_EXACT_AGAINST_SQL)
def docs_dedup_exact_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linktransformer_spark.operators.dedup import dedup_exact_against

    d = _t(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") < 250).select("doc_id", "text")
    nw = (
        d.filter(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionByName(
            d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", "text")
        )
    )
    return dedup_exact_against(nw, seen, on="text")


# ---------------------------------------------------------------------------
# Entity resolution (operators/entity.py): blocked scoring + bipartite
# CC + canonical labeling as ONE plan. Oracle = independent recursive-
# CTE transitive closure over the same match graph.
# ---------------------------------------------------------------------------

_ER_EDGES_SQL = f"""
    l AS (SELECT c_custkey AS id, coalesce(CAST(c_name AS VARCHAR), '') AS key,
                 c_nationkey AS blk FROM customer),
    r AS (SELECT s_suppkey AS id, coalesce(CAST(s_name AS VARCHAR), '') AS key,
                 s_nationkey AS blk FROM supplier),
    e0 AS (
      SELECT l.id AS lid, r.id AS rid,
             {sql_lev_sim('l.key', 'r.key')} AS score
      FROM l JOIN r ON l.blk = r.blk
      WHERE {sql_lev_sim('l.key', 'r.key')} >= 0.62
    )
"""

_ER_PAIRS_SQL = (
    "WITH " + _ER_EDGES_SQL
    + """
    SELECT lid AS left_id, rid AS right_id, round(score, 6) AS score FROM e0
"""
)


@_q("er_match_pairs", _ER_PAIRS_SQL)
def er_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.entity import match_pairs

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    out = match_pairs(
        cust, supp, left_on="c_name", right_on="s_name",
        left_id_col="c_custkey", right_id_col="s_suppkey",
        sim_threshold=0.62, blocking_vars=[("c_nationkey", "s_nationkey")],
    )
    return out.select("left_id", "right_id", F.round("score", 6).alias("score"))


_ER_RESOLVE_SQL = (
    "WITH RECURSIVE " + _ER_EDGES_SQL
    + """,
    nodes AS (
      SELECT 2 * id AS node, 'L' AS side, id AS record_id, key FROM l
      UNION ALL
      SELECT 2 * id + 1, 'R', id, key FROM r
    ),
    ed AS (
      SELECT 2 * lid AS a, 2 * rid + 1 AS b FROM e0
      UNION
      SELECT 2 * rid + 1, 2 * lid FROM e0
    ),
    reach(x, y) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.x, ed.b FROM reach JOIN ed ON reach.y = ed.a
    ),
    comp AS (SELECT x AS node, min(y) AS entity_id FROM reach GROUP BY x),
    lab AS (
      SELECT c.entity_id, n.side, n.record_id, n.key
      FROM nodes n JOIN comp c ON n.node = c.node
    ),
    agg AS (
      SELECT entity_id, min(key) AS canonical,
             CAST(count(*) AS BIGINT) AS n_members
      FROM lab GROUP BY entity_id
    )
    SELECT lab.entity_id, lab.side, lab.record_id, lab.key,
           agg.canonical, agg.n_members
    FROM lab JOIN agg USING (entity_id)
"""
)


@_q("er_resolve_entities", _ER_RESOLVE_SQL)
def er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.entity import resolve_entities

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return resolve_entities(
        cust, supp, left_on="c_name", right_on="s_name",
        left_id_col="c_custkey", right_id_col="s_suppkey",
        sim_threshold=0.62, blocking_vars=[("c_nationkey", "s_nationkey")],
    )


def _er_lsh_sql(threshold: float = 0.8, dim: int = 64, n_planes: int = 9) -> str:
    from .functions.oracle import (
        sql_dot,
        sql_hash_ngram_counts,
        sql_hyperplane_bucket,
        sql_l2_normalize,
    )

    return f"""
    WITH RECURSIVE
    l AS (SELECT c_custkey AS id,
                 coalesce(CAST(c_name AS VARCHAR), '') AS key FROM customer),
    r AS (SELECT s_suppkey AS id,
                 coalesce(CAST(s_name AS VARCHAR), '') AS key FROM supplier),
    lv0 AS MATERIALIZED (
      SELECT id, key, {sql_hash_ngram_counts('key', dim)} AS cv FROM l),
    rv0 AS MATERIALIZED (
      SELECT id, key, {sql_hash_ngram_counts('key', dim)} AS cv FROM r),
    lv AS MATERIALIZED (
      SELECT id, key, {sql_l2_normalize('cv')} AS v FROM lv0),
    rv AS MATERIALIZED (
      SELECT id, key, {sql_l2_normalize('cv')} AS v FROM rv0),
    lb AS MATERIALIZED (
      SELECT id, key, v,
             {sql_hyperplane_bucket('v', dim, n_planes)} AS b FROM lv),
    rb AS MATERIALIZED (
      SELECT id, key, v,
             {sql_hyperplane_bucket('v', dim, n_planes)} AS b FROM rv),
    e0 AS (
      SELECT lid, rid FROM (
        SELECT lb.id AS lid, rb.id AS rid,
               {sql_dot('lb.v', 'rb.v')} AS score
        FROM lb JOIN rb ON lb.b = rb.b
      ) WHERE score >= {threshold!r}
    ),
    nodes AS (
      SELECT 2 * id AS node, 'L' AS side, id AS record_id, key FROM l
      UNION ALL
      SELECT 2 * id + 1, 'R', id, key FROM r
    ),
    ed AS (
      SELECT 2 * lid AS a, 2 * rid + 1 AS b FROM e0
      UNION
      SELECT 2 * rid + 1, 2 * lid FROM e0
    ),
    reach(x, y) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.x, ed.b FROM reach JOIN ed ON reach.y = ed.a
    ),
    comp AS (SELECT x AS node, min(y) AS entity_id FROM reach GROUP BY x),
    lab AS (
      SELECT c.entity_id, n.side, n.record_id, n.key
      FROM nodes n JOIN comp c ON n.node = c.node
    ),
    agg AS (
      SELECT entity_id, min(key) AS canonical,
             CAST(count(*) AS BIGINT) AS n_members
      FROM lab GROUP BY entity_id
    )
    SELECT lab.entity_id, lab.side, lab.record_id, lab.key,
           agg.canonical, agg.n_members
    FROM lab JOIN agg USING (entity_id)
"""


@_q("er_resolve_lsh", _er_lsh_sql())
def er_resolve_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ER on SIMILARITY blocking: candidates are pairs in
    the same random-hyperplane sign bucket of the deterministic
    hash-n-gram embedding (no hand-picked blocking key — the 100 TB
    generalization of the reference's merge_blocking,
    /root/reference/src/linktransformer/infer.py:169-274), scored by
    embedding cosine, grouped by connected components. The oracle
    mirrors the embedding, buckets, and dot bit-for-bit (exact-integer
    count vectors; order-pinned folds) and closes the same match graph
    with a recursive CTE."""
    from .operators.entity import resolve_entities

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return resolve_entities(
        cust, supp, left_on="c_name", right_on="s_name",
        left_id_col="c_custkey", right_id_col="s_suppkey",
        sim_threshold=0.8, blocking="lsh", model="hash-ngram",
        n_planes=9, lsh_dim=64,
    )


# ---------------------------------------------------------------------------
# Event path analysis (operators/eventpipe.py transition_matrix /
# trending) — round-6 additions: first-order Markov transitions and
# windowed trending top-k with window-over-window lift.
# ---------------------------------------------------------------------------
_TRANSITIONS_SQL = """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n, p FROM (
      SELECT from_type, to_type, n,
             round(CAST(n AS DOUBLE)
                   / sum(n) OVER (PARTITION BY from_type), 6) AS p
      FROM c
    ) WHERE n >= 2
"""


@_q("events_transitions", _TRANSITIONS_SQL)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event table: per-user lead window (one
    shuffle), pair hash agg, conditional p over the tiny aggregated
    relation. min_count prunes noise AFTER the conditional total, so p
    still conditions on all outgoing transitions."""
    from .operators.eventpipe import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(
        ev, tiebreak_col="event_id", min_count=2
    )


@_q("stream_transitions", _TRANSITIONS_SQL)
def stream_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Markov transitions: O(1) last-event state per user,
    one (from, to) pair row per consecutive event — drained sink +
    finalizer equals the batch lead-window table; same oracle as
    events_transitions."""
    from .streaming import (
        final_transitions, read_stream_table, run_available_now,
        streaming_transitions,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    drained = run_available_now(
        streaming_transitions(ev, tiebreak_col="event_id"),
        output_mode="append",
    )
    return final_transitions(drained, min_count=2)


_TRENDING_SQL = """
    WITH c AS (
      SELECT CAST(floor(epoch(ts) / 21600.0) AS BIGINT) AS w,
             event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    l AS (
      SELECT w, event_type, n,
             lag(w) OVER (PARTITION BY event_type ORDER BY w ASC) AS pw,
             lag(n) OVER (PARTITION BY event_type ORDER BY w ASC) AS pn
      FROM c
    ),
    r AS (
      SELECT w, event_type, n,
             CASE WHEN pw = w - 1
                  THEN round(CAST(n AS DOUBLE) / pn, 6) END AS lift,
             row_number() OVER (
               PARTITION BY w ORDER BY n DESC, event_type ASC) AS rk
      FROM l
    )
    SELECT make_timestamp(w * 21600 * 1000000) AS window_start,
           event_type, n, CAST(rk AS INT) AS rank, lift
    FROM r WHERE rk <= 3
"""


@_q("events_trending", _TRENDING_SQL)
def events_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed trending top-k with lift: 6-hour buckets, top 3 types
    per bucket. The only corpus-sized stage is the map-side-combined
    (window, type) aggregate; both window functions run over its tiny
    output. Bucketing by floor(epoch/W) is exact across engines:
    second-truncation (Spark unix_timestamp) never crosses a
    whole-second window boundary."""
    from .operators.eventpipe import trending

    ev = _t(spark, sf_dir, "events")
    return trending(ev, window_seconds=21600, k=3)


# ---------------------------------------------------------------------------
# Temperature-rebalanced mixture sampling (operators/sampling.py
# temperature_mixture) — XLM-R-style count^alpha rebalancing, exact-n,
# content-hash deterministic.
# ---------------------------------------------------------------------------
def _temperature_mixture_sql(budget: int = 250) -> str:
    from .functions.oracle import sql_poly_hash

    key = "coalesce(text, '')"
    ph = sql_poly_hash(key)
    return f"""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    z AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)),
               (acc, x) -> acc + x) AS z
      FROM c
    ),
    t AS (
      SELECT lang,
             least(n, CAST(floor(CAST({budget} AS DOUBLE)
                                 * sqrt(CAST(n AS DOUBLE)) / z.z)
                           AS BIGINT)) AS target
      FROM c, z
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY {ph} ASC, {key} ASC) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang FROM r JOIN t ON r.lang = t.lang
    WHERE r.rk <= t.target
"""


@_q("docs_temperature_mixture", _temperature_mixture_sql())
def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the skewed lang distribution to count^0.5 proportions
    in a 250-doc budget. alpha=0.5 routes through sqrt on both engines
    (correctly rounded -> bit-exact weights); the normalizer folds the
    per-group relation in group order (order-pinned float sum)."""
    from .operators.sampling import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    out = temperature_mixture(docs, "lang", budget=250, alpha=0.5, key_cols="text")
    return out.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# TF-IDF characteristic terms (operators/vocab.py tfidf_top_terms) —
# per-document keyword extraction for topic labeling / slice audit.
# ---------------------------------------------------------------------------
def _tfidf_sql(k: int = 3, min_df: int = 2) -> str:
    from .functions.oracle import sql_word_tokens

    toks = sql_word_tokens("text")
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    dtc AS (
      SELECT doc_id AS d, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    nd AS (SELECT count(DISTINCT d) AS N FROM dtc),
    dfreq AS (
      SELECT term, count(*) AS df FROM dtc GROUP BY term
      HAVING count(*) >= {min_df}
    ),
    idf AS (
      SELECT term,
             ln((1.0 + CAST(nd.N AS DOUBLE)) / (1.0 + CAST(df AS DOUBLE)))
             + 1.0 AS idf
      FROM dfreq, nd
    ),
    s AS (
      SELECT d, dtc.term, tf, CAST(tf AS DOUBLE) * idf AS s
      FROM dtc JOIN idf ON dtc.term = idf.term
    ),
    r AS (
      SELECT d, term, tf, s,
             row_number() OVER (
               PARTITION BY d ORDER BY s DESC, term ASC) AS rk
      FROM s
    )
    SELECT d AS doc_id, term, tf, round(s, 6) AS tfidf, CAST(rk AS INT) AS rank
    FROM r WHERE rk <= {k}
"""


@_q("docs_tfidf_terms", _tfidf_sql())
def docs_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document (smooth-idf tf-idf,
    min_df=2): the BM25 index's (doc, term, tf) relation, a vocab-sized
    idf join, and a per-doc rank window (WindowGroupLimit)."""
    from .operators.vocab import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, k=3, min_df=2)
    return out.select(
        "doc_id", "term", "tf", F.round("tfidf", 6).alias("tfidf"), "rank"
    )


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (operators/ann.py mmr_rerank, Carbonell &
# Goldstein 1998) — the greedy loop unrolls into k-1 chained CTE
# blocks, so even the iterative operator is fully value-checkable.
# cand/sel{j} are MATERIALIZED (values unchanged — evaluation hint
# only, the er_resolve_lsh precedent): inlined, each pen{j} block
# re-expands the cross-join candidate CTE and sel{j-1} THREE times
# (join + NOT EXISTS + union), compounding ~3^k — measured 115 s at
# sf0.001 vs ~2 s materialized.
# ---------------------------------------------------------------------------
def _mmr_sql(k: int = 5, lam: float = 0.7, nq: int = 50, ncand: int = 20) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    l, ml = repr(float(lam)), repr(1.0 - float(lam))
    parts = [f"""
    WITH qn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id < {nq}
    ),
    cn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings),
    cand AS MATERIALIZED (
      SELECT q, d, rel, v FROM (
        SELECT q.vec_id AS q, c.vec_id AS d,
               {sql_dot('q.v', 'c.v')} AS rel, c.v AS v,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
               ) AS rn
        FROM qn q CROSS JOIN cn c
      ) WHERE rn <= {ncand}
    ),
    sel1 AS (
      SELECT q, d, rel, v, 1 AS rank, {l} * rel AS mmr FROM (
        SELECT q, d, rel, v,
               row_number() OVER (PARTITION BY q ORDER BY rel DESC, d ASC) AS rn
        FROM cand
      ) WHERE rn = 1
    )"""]
    pen_dot = sql_dot("r.v", "s.v")
    for j in range(2, k + 1):
        parts.append(f""",
    pen{j} AS (
      SELECT r.q, r.d, r.rel, r.v, max({pen_dot}) AS pen
      FROM cand r JOIN sel{j - 1} s ON r.q = s.q
      WHERE NOT EXISTS (
        SELECT 1 FROM sel{j - 1} x WHERE x.q = r.q AND x.d = r.d)
      GROUP BY r.q, r.d, r.rel, r.v
    ),
    pick{j} AS (
      SELECT q, d, rel, v, {j} AS rank, mmr FROM (
        SELECT q, d, rel, v, {l} * rel - {ml} * pen AS mmr,
               row_number() OVER (
                 PARTITION BY q ORDER BY {l} * rel - {ml} * pen DESC, d ASC
               ) AS rn
        FROM pen{j}
      ) WHERE rn = 1
    ),
    sel{j} AS MATERIALIZED (
      SELECT * FROM sel{j - 1} UNION ALL SELECT * FROM pick{j})""")
    parts.append(f"""
    SELECT q AS query_id, d AS neighbor_id, CAST(rank AS INT) AS rank,
           round(rel, 6) AS score, round(mmr, 6) AS mmr
    FROM sel{k}""")
    return "".join(parts)


@_q("ann_mmr_rerank", _mmr_sql())
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity re-rank of the exact-cosine top-20 candidate lists:
    k=5 greedy MMR picks per query at lam=0.7. The Spark plan is the
    relational greedy chain (k-1 lineage-cut self-joins, max-penalty
    aggregation — order-free floats); the oracle unrolls the identical
    chain as CTEs."""
    from .operators.ann import ann_topk, mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    cand = ann_topk(q, emb, vector_col="embedding", k=20, mode="exact_cross")
    cand = cand.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    out = mmr_rerank(cand, k=5, lam=0.7)
    return out.select(
        "query_id", "neighbor_id", "rank",
        F.round("score", 6).alias("score"), F.round("mmr", 6).alias("mmr"),
    )


@_q("stream_trending", _TRENDING_SQL)
def stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_trending: watermarked tumbling-window
    counts in the state store (update mode), rank+lift as a drain-time
    finalizer — checked against the same SQL as the batch operator."""
    from .streaming import (
        final_trending, read_stream_table, run_available_now,
        streaming_trending,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    drained = run_available_now(
        streaming_trending(ev, window_seconds=21600), output_mode="update"
    )
    return final_trending(drained, window_seconds=21600, k=3)


# ---------------------------------------------------------------------------
# Signed-random-projection ANN (operators/ann.py srp_project) — the
# DIMENSION axis of embedding compression (int8 quantization is the
# precision axis). The +/-1 matrix is a build-time literal shared by
# both engines, so even the projected search is exact-value-checkable.
# ---------------------------------------------------------------------------
def _srp_sql(in_dim: int = 64, out_dim: int = 32, nq: int = 50,
             shortlist: int = 50, k: int = 5) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize
    from .operators.ann import srp_signs

    signs = srp_signs(in_dim, out_dim)
    comps = []
    for j in range(out_dim):
        terms = []
        for i, sg in enumerate(signs[j]):
            c = f"CAST(embedding[{i + 1}] AS DOUBLE)"
            if not terms:
                terms.append(f"-{c}" if sg < 0 else c)
            else:
                terms.append(f"{'-' if sg < 0 else '+'} {c}")
        comps.append("(" + " ".join(terms) + ")")
    plist = "list_value(" + ", ".join(comps) + ")"
    return f"""
    WITH pr AS (SELECT vec_id, {plist} AS p FROM embeddings),
    qp AS (SELECT vec_id, {sql_l2_normalize('p')} AS v FROM pr WHERE vec_id < {nq}),
    cp AS (SELECT vec_id, {sql_l2_normalize('p')} AS v FROM pr),
    short AS (
      SELECT q, d FROM (
        SELECT qp.vec_id AS q, cp.vec_id AS d,
               row_number() OVER (
                 PARTITION BY qp.vec_id
                 ORDER BY {sql_dot('qp.v', 'cp.v')} DESC, cp.vec_id ASC
               ) AS rn
        FROM qp CROSS JOIN cp
      ) WHERE rn <= {shortlist}
    ),
    fn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings)
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT s.q AS query_id, s.d AS neighbor_id,
             {sql_dot('fq.v', 'fc.v')} AS score,
             row_number() OVER (
               PARTITION BY s.q
               ORDER BY {sql_dot('fq.v', 'fc.v')} DESC, s.d ASC
             ) AS rank
      FROM short s JOIN fn fq ON s.q = fq.vec_id
                   JOIN fn fc ON s.d = fc.vec_id
    ) WHERE rank <= {k}
"""


@_q("ann_topk_srp_rerank", _srp_sql())
def ann_topk_srp_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SRP compression pattern end-to-end: 64->32-dim signed
    random projection generates a 50-candidate shortlist per query
    (2x smaller vectors through the scoring cross/shuffle; combine
    with int8 quantization for the precision axis), then the exact
    cosine on FULL vectors re-ranks the shortlist to top-5 — the
    standard coarse-then-exact ANN serving shape. Recall floor vs the
    uncompressed exact search is pinned in tests/test_dedup_ann.py."""
    from pyspark.sql import Window

    from .functions import similarity as S
    from .operators.ann import ann_topk, srp_project

    emb = _t(spark, sf_dir, "embeddings")
    # lineage-cut the projection: downstream l2_normalize + dot expand
    # their input expression tree per reference (no cross-Column CSE —
    # the hash_ngram embed-once finding), so an un-materialized
    # 2048-node projection would re-evaluate ~60x per scored pair
    # (measured 14s -> 3s at sf0.1 from this one cut)
    pr = srp_project(emb, in_dim=64, out_dim=32).localCheckpoint(eager=False)
    q = pr.filter(F.col("vec_id") < 50)
    short = ann_topk(q, pr, vector_col="projected", k=50,
                     mode="exact_cross").select("query_id", "neighbor_id")
    fn = emb.select(
        F.col("vec_id").alias("_id"),
        S.l2_normalize(F.col("embedding")).alias("_v"),
    )
    cand = (
        short.join(fn.select(F.col("_id").alias("query_id"),
                             F.col("_v").alias("_qv")), "query_id")
        .join(fn.select(F.col("_id").alias("neighbor_id"),
                        F.col("_v").alias("_nv")), "neighbor_id")
        .select("query_id", "neighbor_id",
                S.dot(F.col("_qv"), F.col("_nv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("int").alias("rank"),
                F.round("score", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# PageRank (operators/graph.py) — link-graph centrality for corpus
# curation; fixed iterations unroll into chained CTEs, so the
# iterative kernel is exact-value-checkable like mmr_rerank.
# Graph: undirected customer<->supplier co-purchase (2i / 2i+1 node
# encoding, edge weight = lineitem count).
# ---------------------------------------------------------------------------
def _pagerank_sql(iterations: int = 3, damping: float = 0.85) -> str:
    d = repr(float(damping))
    body = [f"""
    WITH ce AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    e AS (
      SELECT src AS _src, dst AS _dst, w FROM ce
      UNION ALL
      SELECT dst AS _src, src AS _dst, w FROM ce
    ),
    ow AS (
      SELECT _src,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(w ORDER BY _dst)),
                         (a, x) -> a + x) AS _ow
      FROM e GROUP BY _src
    ),
    e2 AS (SELECT e._src, e._dst, e.w, ow._ow FROM e JOIN ow USING (_src)),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT _src AS node FROM e UNION ALL SELECT _dst AS node FROM e)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn)"""]
    for j in range(1, iterations + 1):
        body.append(f""",
    r{j} AS (
      SELECT n.node,
             (1.0 - {d}) / nn.n
             + {d} * coalesce(s.m, CAST(0.0 AS DOUBLE)) AS r
      FROM nodes n CROSS JOIN nn LEFT JOIN (
        SELECT e2._dst AS node,
               list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list((p.r * e2.w) / e2._ow ORDER BY e2._src)),
                 (a, x) -> a + x) AS m
        FROM e2 JOIN r{j - 1} p ON e2._src = p.node
        GROUP BY e2._dst
      ) s ON n.node = s.node
    )""")
    body.append(f"""
    SELECT node, round(r, 9) AS rank FROM r{iterations}""")
    return "".join(body)


@_q("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the customer<->supplier co-purchase
    graph (edge weight = lineitem count, undirected via both-direction
    edges). Per-iteration plan: ranks join the lineage-cut edge
    relation on src, messages fold per dst in src order (pinned float
    sum), teleport applies in a node left-join. The oracle unrolls the
    same three rounds as CTEs."""
    from .operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ce = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    # both directions in ONE pass over the aggregated relation (a
    # union of two selects re-executes the reduce-side aggregate per
    # branch; explode emits the same multiset from a single subtree)
    e = ce.select(
        F.explode(
            F.array(
                F.struct("src", "dst", "w"),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("w"),
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst", "_e.w")
    out = pagerank(e, "src", "dst", weight_col="w", iterations=3)
    return out.select("node", F.round("rank", 9).alias("rank"))


def _pagerank_redistribute_sql(iterations: int = 2, damping: float = 0.85) -> str:
    d = repr(float(damping))
    body = [f"""
    WITH e AS (
      SELECT o_custkey * 2 AS _src, l_suppkey * 2 + 1 AS _dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    ow AS (
      SELECT _src,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(w ORDER BY _dst)),
                         (a, x) -> a + x) AS _ow
      FROM e GROUP BY _src
    ),
    e2 AS (SELECT e._src, e._dst, e.w, ow._ow FROM e JOIN ow USING (_src)),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT _src AS node FROM e UNION ALL SELECT _dst AS node FROM e)
    ),
    dang AS (
      SELECT node FROM nodes
      WHERE node NOT IN (SELECT DISTINCT _src FROM e)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn)"""]
    for j in range(1, iterations + 1):
        body.append(f""",
    dm{j - 1} AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(p.r ORDER BY p.node)),
                         (a, x) -> a + x) AS s
      FROM r{j - 1} p JOIN dang USING (node)
    ),
    r{j} AS (
      SELECT n.node,
             (1.0 - {d}) / nn.n
             + {d} * coalesce(s.m, CAST(0.0 AS DOUBLE))
             + ({d} * dm{j - 1}.s) / nn.n AS r
      FROM nodes n CROSS JOIN nn CROSS JOIN dm{j - 1} LEFT JOIN (
        SELECT e2._dst AS node,
               list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list((p.r * e2.w) / e2._ow ORDER BY e2._src)),
                 (a, x) -> a + x) AS m
        FROM e2 JOIN r{j - 1} p ON e2._src = p.node
        GROUP BY e2._dst
      ) s ON n.node = s.node
    )""")
    body.append(f"""
    SELECT node, round(r, 9) AS rank FROM r{iterations}""")
    return "".join(body)


@_q("graph_pagerank_redistribute", _pagerank_redistribute_sql())
def graph_pagerank_redistribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration PageRank with dangling-mass redistribution over the
    DIRECTED customer->supplier purchase graph — suppliers have no
    out-edges, so every iteration redistributes their rank mass
    uniformly (ranks sum to 1). The per-iteration dangling sum is the
    one-row order-pinned fold broadcast back; the oracle unrolls the
    same rounds with a dm CTE per iteration."""
    from .operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    out = pagerank(e, "src", "dst", weight_col="w", iterations=2,
                   redistribute_dangling=True)
    return out.select("node", F.round("rank", 9).alias("rank"))


# ---------------------------------------------------------------------------
# Session path mining + volume anomaly (operators/eventpipe.py
# session_paths / volume_anomaly) — round-6 event analytics.
# ---------------------------------------------------------------------------
_SESSION_PATHS_SQL = """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    seqs AS (
      SELECT user_id, sid, list(event_type ORDER BY ts, event_id) AS sq
      FROM sess GROUP BY user_id, sid
    ),
    p AS (
      SELECT array_to_string(sq[i:i+2], ' -> ') AS path FROM (
        SELECT sq, unnest(range(1, len(sq) - 1)) AS i
        FROM seqs WHERE len(sq) >= 3
      )
    ),
    c AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM p GROUP BY path
    )
    SELECT path, n_occurrences, CAST(rk AS INT) AS rank FROM (
      SELECT path, n_occurrences,
             row_number() OVER (ORDER BY n_occurrences DESC, path ASC) AS rk
      FROM c
    ) WHERE rk <= 20
"""


@_q("events_session_paths", _SESSION_PATHS_SQL)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 in-session event-type paths (30-minute gap
    sessions, the engine's standard sessionize boundary)."""
    from .operators.eventpipe import session_paths

    ev = _t(spark, sf_dir, "events")
    return session_paths(
        ev, tiebreak_col="event_id", gap_seconds=1800, n=3, k=20
    )


_VOLUME_ANOMALY_SQL = """
    WITH c AS (
      SELECT CAST(floor(epoch(ts) / 21600.0) AS BIGINT) AS w,
             event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    f AS (
      SELECT w, event_type, n,
             sum(n) OVER fr AS s1,
             sum(n * n) OVER fr AS s2,
             count(n) OVER fr AS cc
      FROM c
      WINDOW fr AS (PARTITION BY event_type ORDER BY w ASC
                    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
    ),
    v AS (
      SELECT w, event_type, n, cc,
             CASE WHEN cc >= 1
                  THEN CAST(s1 AS DOUBLE) / CAST(cc AS DOUBLE) END AS mean,
             CASE WHEN cc >= 1
                  THEN (CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                          / CAST(cc AS DOUBLE)) / CAST(cc AS DOUBLE)
             END AS var
      FROM f
    ),
    z AS (
      SELECT w, event_type, n, cc, mean, var,
             CASE WHEN cc >= 2 AND var > 0
                  THEN (CAST(n AS DOUBLE) - mean) / sqrt(var) END AS zval
      FROM v
    )
    SELECT make_timestamp(w * 21600 * 1000000) AS window_start,
           event_type, n,
           round(mean, 6) AS mean_n,
           round(zval, 6) AS z,
           coalesce(abs(round(zval, 6)) > 2.0, false)
           OR coalesce(cc >= 2 AND var = 0.0
                       AND CAST(n AS DOUBLE) <> mean, false) AS is_anomaly
    FROM z
"""


@_q("events_volume_anomaly", _VOLUME_ANOMALY_SQL)
def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-8-window z-score anomalies over 6-hour volume buckets.
    mean/std derive from integer frame sums, so the float expression
    is engine-portable with no order pinning."""
    from .operators.eventpipe import volume_anomaly

    ev = _t(spark, sf_dir, "events")
    return volume_anomaly(
        ev, window_seconds=21600, trailing=8, z_threshold=2.0
    )


@_q("stream_volume_anomaly", _VOLUME_ANOMALY_SQL)
def stream_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deployment of events_volume_anomaly: the watermarked
    counts live in the state store (streaming_trending), the z-score
    pass runs over the drained counts — same SQL oracle as the batch
    operator."""
    from .streaming import (
        final_volume_anomaly, read_stream_table, run_available_now,
        streaming_trending,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    drained = run_available_now(
        streaming_trending(ev, window_seconds=21600), output_mode="update"
    )
    return final_volume_anomaly(
        drained, window_seconds=21600, trailing=8, z_threshold=2.0
    )


# ---------------------------------------------------------------------------
# Asymmetric containment join (operators/dedup.py containment_pairs) —
# the quote/subset detector symmetric Jaccard misses. Same augmented
# corpus as the jaccard oracle; src = the (possibly) contained side.
# ---------------------------------------------------------------------------
_CONTAINMENT_PAIRS_SQL = (
    "WITH " + _AUG_SQL.format(L=200) + f""",
    sh AS (SELECT doc_id AS id, {sql_word_shingles('text', 3)} AS sh FROM aug),
    tok AS (SELECT id, unnest(sh) AS g FROM sh),
    inter AS (
      SELECT l.id AS a, r.id AS b, count(*) AS i
      FROM tok l JOIN tok r ON l.g = r.g AND l.id < r.id
      GROUP BY l.id, r.id
    ),
    sized AS (
      SELECT inter.a, inter.b, inter.i, sa.n AS na, sb.n AS nb
      FROM inter
      JOIN (SELECT id, len(sh) AS n FROM sh) sa ON sa.id = inter.a
      JOIN (SELECT id, len(sh) AS n FROM sh) sb ON sb.id = inter.b
    ),
    bidir AS (
      SELECT a AS src, b AS dst,
             CAST(i AS DOUBLE) / greatest(na, 1) AS containment
      FROM sized
      UNION ALL
      SELECT b AS src, a AS dst,
             CAST(i AS DOUBLE) / greatest(nb, 1) AS containment
      FROM sized
    )
    SELECT src, dst, round(containment, 6) AS containment
    FROM bidir WHERE containment >= 0.8
"""
)


@_q("dedup_containment_pairs", _CONTAINMENT_PAIRS_SQL)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import containment_pairs

    aug = _augmented_docs(spark, sf_dir, 200)
    out = containment_pairs(
        aug, on="text", id_col="doc_id", threshold=0.8, shingle=3, word=True
    )
    return out.select(
        "src", "dst", F.round("containment", 6).alias("containment")
    )


@_q("ann_ivf_indexed", _ann_ivf_seeded_sql())
def ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-IVF serving path: save_ivf_index (cells parquet
    partitioned by cell + centroids + meta), then probe through
    ann_topk_ivf_indexed whose scan reads only the probed cell
    partitions. Same oracle as ann_topk_ivf_seeded — identical
    centroids/assignment/probe => bit-identical results."""
    import tempfile

    from .operators.ann import ann_topk_ivf_indexed, save_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_idx_{tag}"
    save_ivf_index(emb, path, n_cells=16, mode="seeded")
    q = emb.filter(F.col("vec_id") < 50)
    out = ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# Relational substrate widening (round 6): the TPC-H q4/q14 shapes the
# driver schema supports — EXISTS semi-join aggregation and the
# conditional-revenue ratio. Both Catalyst-native.
# ---------------------------------------------------------------------------
_Q4_SQL = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
"""


@_q("q4_order_priority", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts over orders with at least one
    late-shipping lineitem. The EXISTS plans as a LeftSemi hash join —
    lineitem never duplicates order rows, the order-side filters reach
    the parquet scan, and the count is a tiny post-join aggregate."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    semi = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q14_SQL = """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-02-01'
"""


@_q("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month. The
    shipdate range prunes the lineitem scan; part joins broadcast-side
    (small dim); one conditional aggregate, 1-row output."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


@_q("stream_ann_ivf_indexed", _ann_ivf_seeded_sql())
def stream_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming semantic search against the persisted IVF index:
    stateless per-batch cell assignment (numpy with the declarative
    fold's exact float order) + stream-static cell join; drain-time
    top-k finalizer. Same SQL oracle as the batch seeded/indexed
    paths — all three are bit-identical."""
    import tempfile

    from .operators.ann import save_ivf_index
    from .streaming import (
        final_ann_topk, read_stream_table, run_available_now,
        streaming_ann_against_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_sidx_{tag}"
    save_ivf_index(emb, path, n_cells=16, mode="seeded")
    qs = read_stream_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 50
    )
    drained = run_available_now(
        # prune_topk == k: sink bounded at queries x 5 (the round-11
        # candidate prune; ranking bit-identical under the same oracle)
        streaming_ann_against_index(spark, qs, path, n_probe=4,
                                    prune_topk=5),
        output_mode="append",
    )
    out = final_ann_topk(drained, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("score", 6).alias("score")
    )


@_q("stream_search_bm25_indexed", _bm25_sql())
def stream_search_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyword search against the persisted BM25 impact
    index: a stream of query texts emits stateless per-(query, doc,
    term) impact contributions (stream-static join; per-row
    array_distinct replaces the batch path's global (q, term)
    distinct), the drain finalizer runs the identical order-pinned
    fold + rank. ``prune_topk=5`` exercises the production
    score-bounded drain (sink capped at queries x 5 docs; the prune's
    fold is the finalizer's exact float order, so the final top-5 is
    bit-identical to the unpruned drain). Same SQL oracle as
    search_bm25_documents and search_bm25_indexed — all three
    bit-identical."""
    import tempfile

    from .functions import similarity as S
    from .operators.search import save_bm25_index
    from .streaming import (
        final_bm25_topk, read_stream_table, run_available_now,
        streaming_bm25_against_index,
    )

    docs = _t(spark, sf_dir, "documents")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_bm25_sidx_{tag}"
    save_bm25_index(docs, path)
    qs = read_stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    drained = run_available_now(
        streaming_bm25_against_index(spark, qs, path, prune_topk=5),
        output_mode="append",
    )
    out = final_bm25_topk(drained, k=5)
    return out.select(
        "q_id", "doc_id", "rank", F.round("score", 6).alias("score"),
        "n_terms",
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH ANN (Lv et al. 2007; operators/ann.py
# hyperplane_probe_buckets) — flip the least-confident hyperplane bits
# to recover bucket-granularity recall without touching the corpus
# side. Fully SQL-mirrored: the dot folds are bit-identical and the
# confidence ranking is O(n_planes^2) integer counting.
# ---------------------------------------------------------------------------
def _ann_lsh_multiprobe_sql(
    dim: int = 64, n_planes: int = 6, n_extra: int = 2,
    nq: int = 50, k: int = 5,
) -> str:
    from .functions.oracle import (
        sql_dot, sql_hyperplane_bucket, sql_hyperplane_probes,
        sql_l2_normalize,
    )
    from .operators.ann import hyperplane_component

    dot_list = "[" + ", ".join(
        sql_dot(
            "v",
            "[" + ", ".join(
                repr(hyperplane_component(h, j)) for j in range(dim)
            ) + "]",
        )
        for h in range(n_planes)
    ) + "]"
    probes = sql_hyperplane_probes("dots", n_planes, n_extra)
    return f"""
    WITH qn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id < {nq}
    ),
    cn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings),
    qd AS (SELECT vec_id, v, {dot_list} AS dots FROM qn),
    qb AS (SELECT vec_id, v, unnest({probes}) AS bkt FROM qd),
    cb AS (
      SELECT vec_id, v, {sql_hyperplane_bucket('v', dim, n_planes)} AS bkt
      FROM cn
    )
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
             ) AS rank
      FROM qb q JOIN cb c ON q.bkt = c.bkt
    ) WHERE rank <= {k}
"""


@_q("ann_lsh_multiprobe", _ann_lsh_multiprobe_sql())
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane LSH: the exact bucket plus the 2
    least-confident bit flips per query (n_planes=6 -> 64 buckets).
    Compare ann_topk_lsh (single probe, same planes): higher recall at
    3x probe rows, corpus bucketing unchanged."""
    from .operators.ann import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    out = ann_topk(
        q, emb, vector_col="embedding", k=5, mode="lsh_hyperplane",
        dim=64, n_planes=6, multi_probe=2,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# RAG sliding-window chunking (operators/corpus.py chunk_documents) —
# per-doc overlapping chunks for embedding indexes, map-only.
# ---------------------------------------------------------------------------
_CHUNK_DOCS_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    e AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(floor((len(toks) - 1) / 96.0) AS BIGINT) + 1))
               AS chunk_idx
      FROM t WHERE len(toks) > 0
    ),
    c AS (
      SELECT doc_id, chunk_idx,
             toks[chunk_idx * 96 + 1 : chunk_idx * 96 + 128] AS chunk
      FROM e
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           array_to_string(chunk, ' ') AS text
    FROM c
"""


@_q("docs_chunk_sliding", _CHUNK_DOCS_SQL)
def docs_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-token chunks with 32-token overlap (step 96) per document —
    the RAG embedding-index prep; map-only, no shuffle."""
    from .operators.corpus import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_tokens=128, overlap=32)
    return out.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "n_tokens", "text",
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernández & Stolfo 1995;
# operators/entity.py sorted_neighborhood_pairs) — candidate pairs
# within a window of the global key sort, no equi-blocking key needed.
# ---------------------------------------------------------------------------
_SNM_SQL = """
    WITH u AS (
      SELECT 0 AS side, c_custkey AS rid,
             coalesce(CAST(c_name AS VARCHAR), '') AS key FROM customer
      UNION ALL
      SELECT 1, s_suppkey, coalesce(CAST(s_name AS VARCHAR), '') FROM supplier
    ),
    ranked AS (
      SELECT side, rid,
             row_number() OVER (ORDER BY key ASC, side ASC, rid ASC) AS rnk
      FROM u
    )
    SELECT l.rid AS left_id, r.rid AS right_id,
           CAST(abs(l.rnk - r.rnk) AS INT) AS rank_gap
    FROM ranked l JOIN ranked r
      ON l.side = 0 AND r.side = 1 AND abs(l.rnk - r.rnk) <= 5
"""


@_q("er_sorted_neighborhood", _SNM_SQL)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-5 sorted-neighborhood candidates over the combined
    customer/supplier name sort. The oracle ranks with ONE global
    window + a theta join (fine at oracle scale); the Spark plan is
    the scale shape — prefix-bucketed distributed ranking and a band
    equi-join."""
    from .operators.entity import sorted_neighborhood_pairs

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return sorted_neighborhood_pairs(
        cust, supp, left_on="c_name", right_on="s_name",
        left_id_col="c_custkey", right_id_col="s_suppkey",
        window=5, prefix_len=2,
    )


# ---------------------------------------------------------------------------
# Field-weighted record comparison (operators/entity.py
# match_pairs_weighted) — Fellegi-Sunter-shaped multi-field scoring:
# 0.7 * name lev + 0.2 * acctbal proximity + 0.1 * nation equality.
# ---------------------------------------------------------------------------
def _er_weighted_sql(threshold: float = 0.75) -> str:
    from .functions.oracle import sql_lev_sim

    name_sim = sql_lev_sim(
        "coalesce(CAST(c.c_name AS VARCHAR), '')",
        "coalesce(CAST(s.s_name AS VARCHAR), '')",
    )
    num_sim = (
        "(CASE WHEN c.c_acctbal IS NOT NULL AND s.s_acctbal IS NOT NULL "
        "THEN 1.0 - abs(CAST(c.c_acctbal AS DOUBLE) - CAST(s.s_acctbal AS DOUBLE)) "
        "/ greatest(abs(CAST(c.c_acctbal AS DOUBLE)), "
        "abs(CAST(s.s_acctbal AS DOUBLE)), 1.0) ELSE 0.0 END)"
    )
    eq_sim = (
        "(CASE WHEN c.c_nationkey IS NOT DISTINCT FROM s.s_nationkey "
        "THEN 1.0 ELSE 0.0 END)"
    )
    score = f"(0.7 * {name_sim} + 0.2 * {num_sim} + 0.1 * {eq_sim})"
    return f"""
    SELECT left_id, right_id, round(score, 6) AS score FROM (
      SELECT c.c_custkey AS left_id, s.s_suppkey AS right_id,
             {score} AS score
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    ) WHERE score >= {threshold}
"""


@_q("er_match_pairs_weighted", _er_weighted_sql())
def er_match_pairs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.entity import match_pairs_weighted

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    out = match_pairs_weighted(
        cust, supp,
        fields=[
            ("c_name", "s_name", 0.7, "lev"),
            ("c_acctbal", "s_acctbal", 0.2, "num"),
            ("c_nationkey", "s_nationkey", 0.1, "exact"),
        ],
        left_id_col="c_custkey", right_id_col="s_suppkey",
        sim_threshold=0.75,
        blocking_vars=[("c_nationkey", "s_nationkey")],
    )
    return out.select("left_id", "right_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# Winsorization (operators/profile.py winsorize) — quantile clamp for
# outlier-robust signal columns; exact percentile = quantile_cont.
# ---------------------------------------------------------------------------
_WINSORIZE_SQL = """
    WITH b AS (
      SELECT quantile_cont(CAST(value AS DOUBLE), 0.05) AS lo,
             quantile_cont(CAST(value AS DOUBLE), 0.95) AS hi
      FROM events
    )
    SELECT e.event_id,
           round(CASE WHEN e.value IS NOT NULL
                 THEN least(greatest(CAST(e.value AS DOUBLE), b.lo), b.hi)
                 END, 6) AS value_w
    FROM events e CROSS JOIN b
"""


@_q("events_winsorize_value", _WINSORIZE_SQL)
def events_winsorize_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamp event values to the [p5, p95] quantile range — one exact
    percentile aggregate broadcast back, map-only clamp."""
    from .operators.profile import winsorize

    ev = _t(spark, sf_dir, "events")
    out = winsorize(ev, "value", p_low=0.05, p_high=0.95, out_col="value_w")
    return out.select("event_id", F.round("value_w", 6).alias("value_w"))


# ---------------------------------------------------------------------------
# Time-decayed engagement (operators/eventpipe.py decayed_engagement)
# — recency-weighted per-user activity, order-pinned fold.
# ---------------------------------------------------------------------------
_DECAY_SQL = """
    WITH ev AS (
      SELECT user_id, value, ts, event_id,
             CAST(value AS DOUBLE) * pow(2.0,
               -(CAST(epoch_us(TIMESTAMP '2024-01-25 00:00:00')
                      - epoch_us(ts) AS DOUBLE) / 604800000000.0)) AS w
      FROM events WHERE ts <= TIMESTAMP '2024-01-25 00:00:00'
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
                          list(w ORDER BY epoch_us(ts), event_id)),
             (acc, x) -> acc + x), 4) AS score
    FROM ev GROUP BY user_id
"""


@_q("events_decayed_engagement", _DECAY_SQL)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day half-life decayed engagement as of 2024-01-25; the decay
    chain (epoch-micros diff -> double divide -> pow) mirrors the SQL
    twin operation for operation, and the per-user sum folds in
    (ts, event_id) order."""
    from .operators.eventpipe import decayed_engagement

    ev = _t(spark, sf_dir, "events")
    out = decayed_engagement(
        ev, as_of="2024-01-25 00:00:00", tiebreak_col="event_id",
        half_life_seconds=604800.0,
    )
    return out.select("user_id", "n_events", F.round("score", 4).alias("score"))


# ---------------------------------------------------------------------------
# Phonetic blocking (functions/similarity.py phonetic_key) — simplified-
# Soundex partitioner for record linkage; key pipeline mirrored text-
# for-text in DuckDB.
# ---------------------------------------------------------------------------
def _phonetic_sql(threshold: float = 0.75) -> str:
    from .functions.oracle import sql_lev_sim, sql_phonetic_key

    pk = sql_phonetic_key("p_name")
    lev = sql_lev_sim("l.p_name", "r.p_name")
    return f"""
    WITH p AS (SELECT p_partkey, p_name, {pk} AS pk FROM part)
    SELECT l.p_partkey AS left_id, r.p_partkey AS right_id,
           l.pk AS phonetic, round({lev}, 6) AS score
    FROM p l JOIN p r ON l.pk = r.pk AND l.p_partkey < r.p_partkey
    WHERE {lev} >= {threshold}
"""


@_q("er_phonetic_blocked", _phonetic_sql())
def er_phonetic_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sound-alike part-name pairs: block on the phonetic key (an
    equi-join — spelling variants share the key even when a prefix
    typo breaks prefix blocking), verify with normalized lev. The
    phonetic key is a regexp/translate expression chain mirrored
    text-for-text in the oracle."""
    from .functions.similarity import lev_sim, phonetic_key

    part = _t(spark, sf_dir, "part")
    p = part.select("p_partkey", "p_name").withColumn(
        "_pk", phonetic_key(F.col("p_name"))
    )
    l, r = p.alias("l"), p.alias("r")
    lev = lev_sim(F.col("l.p_name"), F.col("r.p_name"))
    return (
        l.join(
            r,
            (F.col("l._pk") == F.col("r._pk"))
            & (F.col("l.p_partkey") < F.col("r.p_partkey")),
        )
        .withColumn("score", lev)
        .filter(F.col("score") >= 0.75)
        .select(
            F.col("l.p_partkey").alias("left_id"),
            F.col("r.p_partkey").alias("right_id"),
            F.col("l._pk").alias("phonetic"),
            F.round("score", 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM (operators/textpipe.py bigram_lm_score) —
# Jelinek-Mercer lam*P_bi + (1-lam)*P_uni, add-alpha smoothed.
# ---------------------------------------------------------------------------
def _bigram_lm_sql(alpha: float = 1.0, lam: float = 0.7) -> str:
    from .functions.oracle import sql_word_tokens

    a, l, ml = repr(float(alpha)), repr(float(lam)), repr(1.0 - float(lam))
    toks = sql_word_tokens("text")
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
    bi AS (
      SELECT doc_id, tk[p] AS prev, tk[p + 1] AS cur FROM (
        SELECT doc_id, tk, unnest(range(1, len(tk))) AS p
        FROM t WHERE len(tk) >= 2
      )
    ),
    doc_bi AS (
      SELECT doc_id, prev, cur, count(*) AS m FROM bi GROUP BY 1, 2, 3
    ),
    bic AS (SELECT prev, cur, sum(m) AS cbi FROM doc_bi GROUP BY prev, cur),
    toks AS (SELECT doc_id, unnest({toks}) AS tok FROM documents),
    uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY tok),
    tot AS (SELECT sum(cu) AS t, count(*) AS v FROM uni),
    lp AS (
      SELECT d.doc_id, d.prev, d.cur, d.m,
             CAST(d.m AS DOUBLE) * -ln(
               {l} * ((CAST(coalesce(b.cbi, 0) AS DOUBLE) + {a})
                      / (CAST(coalesce(up.cu, 0) AS DOUBLE)
                         + {a} * CAST(tt.v AS DOUBLE)))
               + {ml} * ((CAST(coalesce(uc.cu, 0) AS DOUBLE) + {a})
                         / (CAST(tt.t AS DOUBLE)
                            + {a} * CAST(tt.v AS DOUBLE)))
             ) AS nll
      FROM doc_bi d
      LEFT JOIN bic b ON d.prev = b.prev AND d.cur = b.cur
      LEFT JOIN uni up ON d.prev = up.tok
      LEFT JOIN uni uc ON d.cur = uc.tok
      CROSS JOIN tot tt
    ),
    agg AS (
      SELECT doc_id, sum(m) AS nt,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(nll ORDER BY prev, cur)),
               (acc, x) -> acc + x
             ) AS h
      FROM lp GROUP BY doc_id
    )
    SELECT doc_id, CAST(nt AS BIGINT) AS n_transitions,
           round(h / nt, 6) AS avg_neg_logprob,
           round(exp(h / nt), 6) AS perplexity
    FROM agg
"""


@_q("docs_bigram_lm", _bigram_lm_sql())
def docs_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import bigram_lm_score

    docs = _t(spark, sf_dir, "documents")
    out = bigram_lm_score(docs, text_col="text", id_col="doc_id")
    return out.select(
        "doc_id", "n_transitions",
        F.round("avg_neg_logprob", 6).alias("avg_neg_logprob"),
        F.round("perplexity", 6).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# Hybrid search: Reciprocal Rank Fusion of the BM25 lexical arm and
# the exact-cosine semantic arm (Cormack et al. 2009;
# operators/search.py rrf_fuse). Query i = document i's first 8
# tokens (lexical) + embedding vector i (semantic), i % 50 == 0.
# ---------------------------------------------------------------------------
def _hybrid_rrf_sql(k_arm: int = 10, k_rrf: int = 60, k: int = 10) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize, sql_word_tokens

    toks = sql_word_tokens("text")
    return f"""
    WITH dtoks AS (
      SELECT doc_id, unnest({toks}) AS tok FROM documents
    ),
    dtc AS (SELECT doc_id AS d, tok, count(*) AS tf FROM dtoks GROUP BY 1, 2),
    dl AS (SELECT d, sum(tf) AS dl FROM dtc GROUP BY d),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM dtc GROUP BY tok),
    idf AS (
      SELECT tok,
             ln(1.0 + (CAST(s.n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf,
             s.avgdl
      FROM dfreq CROSS JOIN stats s
    ),
    qt AS (
      SELECT DISTINCT q, tok FROM (
        SELECT doc_id AS q, unnest(({toks})[1:8]) AS tok
        FROM documents WHERE doc_id % 50 = 0
      )
    ),
    contrib AS (
      SELECT qt.q, dtc.d, dtc.tok,
             i.idf * (CAST(dtc.tf AS DOUBLE) * (1.2 + 1.0))
             / (CAST(dtc.tf AS DOUBLE)
                + 1.2 * ((1.0 - 0.75)
                         + 0.75 * (CAST(dl.dl AS DOUBLE) / i.avgdl))) AS c
      FROM qt JOIN dtc ON qt.tok = dtc.tok
              JOIN idf i ON dtc.tok = i.tok
              JOIN dl ON dtc.d = dl.d
    ),
    bms AS (
      SELECT q, d,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY tok)),
               (acc, x) -> acc + x
             ) AS score
      FROM contrib GROUP BY q, d
    ),
    bmr AS (
      SELECT q, d, rnk FROM (
        SELECT q, d,
               row_number() OVER (PARTITION BY q ORDER BY score DESC, d ASC) AS rnk
        FROM bms
      ) WHERE rnk <= {k_arm}
    ),
    qn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    cn AS (SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings),
    anr AS (
      SELECT q, d, rnk FROM (
        SELECT qn.vec_id AS q, cn.vec_id AS d,
               row_number() OVER (
                 PARTITION BY qn.vec_id
                 ORDER BY {sql_dot('qn.v', 'cn.v')} DESC, cn.vec_id ASC
               ) AS rnk
        FROM qn CROSS JOIN cn
      ) WHERE rnk <= {k_arm}
    ),
    uni AS (
      SELECT q, d, 0 AS arm, rnk FROM bmr
      UNION ALL
      SELECT q, d, 1 AS arm, rnk FROM anr
    ),
    fused AS (
      SELECT q, d, CAST(count(*) AS BIGINT) AS nl,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(1.0 / ({k_rrf}.0 + CAST(rnk AS DOUBLE))
                                 ORDER BY arm)),
               (acc, x) -> acc + x
             ) AS s
      FROM uni GROUP BY q, d
    )
    SELECT q AS q_id, d AS doc_id, CAST(rk AS INT) AS rank,
           round(s, 6) AS rrf_score, nl AS n_lists
    FROM (
      SELECT q, d, nl, s,
             row_number() OVER (PARTITION BY q ORDER BY s DESC, d ASC) AS rk
      FROM fused
    ) WHERE rk <= {k}
"""


@_q("search_hybrid_rrf", _hybrid_rrf_sql())
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 + exact-cosine semantic
    top-10 fused by Reciprocal Rank Fusion (k_rrf=60) — rank-based, so
    no score calibration between arms; the fusion fold accumulates in
    arm order."""
    from .functions import similarity as S
    from .operators.ann import ann_topk
    from .operators.search import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    bm = bm25_topk(docs, queries, k=10).select("q_id", "doc_id", "rank")
    an = ann_topk(
        emb.filter(F.col("vec_id") % 50 == 0), emb,
        vector_col="embedding", k=10, mode="exact_cross",
    ).select(
        F.col("query_id").alias("q_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    out = rrf_fuse([bm, an], query_id="q_id", id_col="doc_id",
                   k_rrf=60, k=10)
    return out.select(
        "q_id", "doc_id", "rank",
        F.round("rrf_score", 6).alias("rrf_score"), "n_lists",
    )


# Hybrid over the STORED indexes (operators/serving.py
# hybrid_topk_indexed): the lexical arm serves from a persisted BM25
# impact index (serve == the from-scratch formula — the standing
# search_bm25_indexed proof), the semantic arm from a persisted IVF-PQ
# r90 index with pinned knobs (serve == the seeded recipe mirror — the
# standing ann_pq_lifecycle proof), fused by the same RRF fold.
def _hybrid_indexed_sql(k_arm: int = 10, k_rrf: int = 60,
                        k: int = 10) -> str:
    an_sub = _ann_ivfpq_rerank_sql(
        k=k_arm, retrieve_k=40, n_cells=4, n_probe=3, m=16, n_codes=64,
        query_pred="vec_id % 50 = 0",
    )
    return _hybrid_fused_sql(an_sub, k_arm=k_arm, k_rrf=k_rrf, k=k)


def _hybrid_fused_sql(an_sub: str, k_arm: int = 10, k_rrf: int = 60,
                      k: int = 10) -> str:
    """Shared skeleton: the from-scratch BM25 arm (the standing
    indexed-serve mirror) + a caller-supplied semantic-arm subquery
    (must emit query_id, neighbor_id, rank) + the RRF fold."""
    from .functions.oracle import sql_word_tokens

    toks = sql_word_tokens("text")
    return f"""
    WITH dtoks AS (
      SELECT doc_id, unnest({toks}) AS tok FROM documents
    ),
    dtc AS (SELECT doc_id AS d, tok, count(*) AS tf FROM dtoks GROUP BY 1, 2),
    dl AS (SELECT d, sum(tf) AS dl FROM dtc GROUP BY d),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM dtc GROUP BY tok),
    idf AS (
      SELECT tok,
             ln(1.0 + (CAST(s.n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf,
             s.avgdl
      FROM dfreq CROSS JOIN stats s
    ),
    qt AS (
      SELECT DISTINCT q, tok FROM (
        SELECT doc_id AS q, unnest(({toks})[1:8]) AS tok
        FROM documents WHERE doc_id % 50 = 0
      )
    ),
    contrib AS (
      SELECT qt.q, dtc.d, dtc.tok,
             i.idf * (CAST(dtc.tf AS DOUBLE) * (1.2 + 1.0))
             / (CAST(dtc.tf AS DOUBLE)
                + 1.2 * ((1.0 - 0.75)
                         + 0.75 * (CAST(dl.dl AS DOUBLE) / i.avgdl))) AS c
      FROM qt JOIN dtc ON qt.tok = dtc.tok
              JOIN idf i ON dtc.tok = i.tok
              JOIN dl ON dtc.d = dl.d
    ),
    bms AS (
      SELECT q, d,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY tok)),
               (acc, x) -> acc + x
             ) AS score
      FROM contrib GROUP BY q, d
    ),
    bmr AS (
      SELECT q, d, rnk FROM (
        SELECT q, d,
               row_number() OVER (PARTITION BY q ORDER BY score DESC, d ASC) AS rnk
        FROM bms
      ) WHERE rnk <= {k_arm}
    ),
    anr AS (
      SELECT query_id AS q, neighbor_id AS d, rnk FROM (
        SELECT query_id, neighbor_id,
               CAST(rank AS BIGINT) AS rnk
        FROM ({an_sub})
      )
    ),
    uni AS (
      SELECT q, d, 0 AS arm, rnk FROM bmr
      UNION ALL
      SELECT q, d, 1 AS arm, rnk FROM anr
    ),
    fused AS (
      SELECT q, d, CAST(count(*) AS BIGINT) AS nl,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(1.0 / ({k_rrf}.0 + CAST(rnk AS DOUBLE))
                                 ORDER BY arm)),
               (acc, x) -> acc + x
             ) AS s
      FROM uni GROUP BY q, d
    )
    SELECT q AS q_id, d AS doc_id, CAST(rk AS INT) AS rank,
           round(s, 6) AS rrf_score, nl AS n_lists
    FROM (
      SELECT q, d, nl, s,
             row_number() OVER (PARTITION BY q ORDER BY s DESC, d ASC) AS rk
      FROM fused
    ) WHERE rk <= {k}
"""


@_q("search_hybrid_indexed", _hybrid_indexed_sql())
def search_hybrid_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call hybrid serve over the two PERSISTED indexes: BM25
    impact index + IVF-PQ r90 index (pinned knobs: n_cells=4,
    n_probe=3, m=16, n_codes=64, retrieve_k=40), RRF-fused (k_rrf=60).
    The oracle composes the two standing serve mirrors — the
    from-scratch BM25 formula and the seeded IVF-PQ + exact-rerank
    recipe — through the identical RRF fold, so this query proves the
    stored-index hybrid equals the from-scratch hybrid end to end."""
    import tempfile

    from .functions import similarity as S
    from .operators.search import save_bm25_index
    from .operators.serving import hybrid_topk_indexed, save_pq_index

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    queries = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        )
        .join(
            emb.select(F.col("vec_id").alias("q_id"), "embedding"),
            "q_id",
        )
    )
    tag = _idx_tag(sf_dir)
    bm_path = f"{tempfile.gettempdir()}/lt_hyb_bm25_{tag}"
    pq_path = f"{tempfile.gettempdir()}/lt_hyb_pq_{tag}"
    save_bm25_index(docs, bm_path)
    save_pq_index(emb, pq_path, n_cells=4, m=16, n_codes=64)
    out = hybrid_topk_indexed(
        spark, bm_path, pq_path, queries,
        k=10, k_arm=10, k_rrf=60, n_probe=3, retrieve_k=40,
    )
    return out.select(
        "q_id", "doc_id", "rank",
        F.round("rrf_score", 6).alias("rrf_score"), "n_lists",
    )


def _hybrid_stream_sql(k_arm: int = 10, k_rrf: int = 60,
                       k: int = 10) -> str:
    an_sub = _ann_ivf_seeded_sql(
        n_cells=16, n_probe=4, k=k_arm, query_pred="vec_id % 50 = 0",
    )
    return _hybrid_fused_sql(an_sub, k_arm=k_arm, k_rrf=k_rrf, k=k)


@_q("stream_search_hybrid_indexed", _hybrid_stream_sql())
def stream_search_hybrid_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hybrid retrieval: BOTH arms stream statelessly
    against their persisted indexes (BM25 impact contributions; IVF
    cell candidates), only the drained sinks rank and fuse
    (final_hybrid_rrf — the streaming twin of hybrid_topk_indexed).
    Oracle: the shared hybrid skeleton with the seeded-IVF arm — the
    same standing mirrors as stream_search_bm25_indexed and
    stream_ann_ivf_indexed, composed through the RRF fold."""
    import tempfile

    from .functions import similarity as S
    from .operators.ann import save_ivf_index
    from .operators.search import save_bm25_index
    from .streaming import (
        final_hybrid_rrf, read_stream_table, run_available_now,
        streaming_ann_against_index, streaming_bm25_against_index,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    bm_path = f"{tempfile.gettempdir()}/lt_hyb_sbm_{tag}"
    ivf_path = f"{tempfile.gettempdir()}/lt_hyb_sivf_{tag}"
    save_bm25_index(docs, bm_path)
    save_ivf_index(emb, ivf_path, n_cells=16, mode="seeded")
    qt = read_stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    qv = read_stream_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 50 == 0
    )
    bm_drained = run_available_now(
        # prune_topk == k_arm: the lexical arm's sink is bounded at
        # queries x 10 docs, final rank bit-identical (the prune's
        # fold is the drain fold)
        streaming_bm25_against_index(spark, qt, bm_path, prune_topk=10),
        output_mode="append",
    )
    ann_drained = run_available_now(
        streaming_ann_against_index(spark, qv, ivf_path, n_probe=4,
                                    prune_topk=10),
        output_mode="append",
    )
    out = final_hybrid_rrf(bm_drained, ann_drained, k=10, k_arm=10)
    return out.select(
        "q_id", "doc_id", "rank",
        F.round("rrf_score", 6).alias("rrf_score"), "n_lists",
    )


@_q(
    "stream_ann_pq_indexed",
    _ann_ivfpq_rerank_sql(
        k=5, retrieve_k=40, n_cells=4, n_probe=3, m=16, n_codes=64
    ),
)
def stream_ann_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming semantic search against the r90 SERVING index: a
    stream of query vectors probed + ADC-scored statelessly
    (streaming_pq_against_index — the serve path's own left-assoc
    kernels per Arrow batch), drain-time shortlist + exact re-rank
    (final_pq_topk — the declarative _shortlist_and_rerank tail).
    Same SQL oracle and pinned knobs as ann_serve_r90 — stream, batch
    serve, and recipe mirror are all bit-identical."""
    import tempfile

    from .operators.serving import save_pq_index
    from .streaming import (
        final_pq_topk, read_stream_table, run_available_now,
        streaming_pq_against_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_pq_sidx_{tag}"
    save_pq_index(emb, path, n_cells=4, m=16, n_codes=64)
    qs = read_stream_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 50
    )
    drained = run_available_now(
        streaming_pq_against_index(spark, qs, path, n_probe=3, k=5,
                                   retrieve_k=40),
        output_mode="append",
    )
    q = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    out = final_pq_topk(spark, drained, path, q, k=5, retrieve_k=40)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# A/B readout (operators/eventpipe.py ab_test) — two-proportion z per
# event type; variant derived deterministically from the props key
# parity, success = value above the global median... no: success =
# value > 50 (fixed threshold — fully portable).
# ---------------------------------------------------------------------------
_AB_SQL = """
    WITH base AS (
      SELECT event_type,
             CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS flag
      FROM events WHERE props IS NOT NULL
    ),
    agg AS (
      SELECT event_type,
             sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_c,
             sum(CASE WHEN variant = 'A' THEN flag ELSE 0 END) AS conv_c,
             sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_t,
             sum(CASE WHEN variant = 'B' THEN flag ELSE 0 END) AS conv_t
      FROM base GROUP BY event_type
    ),
    m AS (
      SELECT *,
             CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS rc,
             CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS rt,
             CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE) AS pp
      FROM agg
    ),
    zc AS (
      SELECT *,
             pp * (1.0 - pp) * (1.0 / CAST(n_c AS DOUBLE)
                                + 1.0 / CAST(n_t AS DOUBLE)) AS var
      FROM m
    )
    SELECT event_type,
           CAST(n_c AS BIGINT) AS n_c, CAST(conv_c AS BIGINT) AS conv_c,
           CASE WHEN n_c > 0 THEN round(rc, 6) END AS rate_c,
           CAST(n_t AS BIGINT) AS n_t, CAST(conv_t AS BIGINT) AS conv_t,
           CASE WHEN n_t > 0 THEN round(rt, 6) END AS rate_t,
           CASE WHEN n_c > 0 AND n_t > 0 AND rc > 0
                THEN round(rt / rc - 1.0, 6) END AS lift,
           CASE WHEN n_c > 0 AND n_t > 0 AND var > 0
                THEN round((rt - rc) / sqrt(var), 6) END AS z,
           coalesce(abs(CASE WHEN n_c > 0 AND n_t > 0 AND var > 0
                             THEN round((rt - rc) / sqrt(var), 6) END)
                    > 1.959963984540054, false) AS significant
    FROM zc
"""


@_q("events_ab_test", _AB_SQL)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per event type; variant = parity of the
    props JSON's k field, success = value > 50. All floats derive from
    integer counts through a fixed expression."""
    from .operators.eventpipe import ab_test

    ev = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    base = ev.select(
        "event_type",
        F.when(
            F.get_json_object("props", "$.k").cast("long") % 2 == 0, "A"
        ).otherwise("B").alias("variant"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("flag"),
    )
    return ab_test(
        base, variant_col="variant", control="A", treatment="B",
        flag_col="flag", by="event_type",
    )


# ---------------------------------------------------------------------------
# Snapshot diff (operators/profile.py table_diff) — regression check
# between two corpus versions; diff output scales with change volume.
# ---------------------------------------------------------------------------
_TABLE_DIFF_SQL = """
    WITH old AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 <> 0
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]' ELSE text END AS text,
             lang
      FROM documents WHERE doc_id % 11 <> 0
    ),
    j AS (
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             o.doc_id IS NOT NULL AS in_old, n.doc_id IS NOT NULL AS in_new,
             CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                       AND o.text IS DISTINCT FROM n.text THEN 1 ELSE 0 END AS dt,
             CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                       AND o.lang IS DISTINCT FROM n.lang THEN 1 ELSE 0 END AS dl
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT doc_id,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                ELSE 'changed' END AS change_type,
           CASE WHEN NOT in_old OR NOT in_new THEN []
                ELSE list_filter(['text', 'lang'],
                                 c -> (c = 'text' AND dt = 1)
                                      OR (c = 'lang' AND dl = 1)) END
             AS changed_cols
    FROM j WHERE NOT in_old OR NOT in_new OR dt = 1 OR dl = 1
"""


@_q("docs_table_diff", _TABLE_DIFF_SQL)
def docs_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two synthetic corpus versions (drop different slivers,
    edit every 5th text): added/removed/changed with per-column
    change flags."""
    from .operators.profile import table_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    return table_diff(old, new, keys="doc_id", compare_cols=["text", "lang"])


@_q("stream_ab_test", _AB_SQL)
def stream_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A/B readout: per-(type, variant) counters live in the
    state store (streaming_ab_counts, update mode, unwindowed running
    totals), the z-test runs at drain — same SQL oracle as the batch
    events_ab_test."""
    from .streaming import (
        final_ab_test, read_stream_table, run_available_now,
        streaming_ab_counts,
    )

    ev = read_stream_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    )
    base = ev.select(
        "event_type",
        F.when(
            F.get_json_object("props", "$.k").cast("long") % 2 == 0, "A"
        ).otherwise("B").alias("variant"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("flag"),
    )
    drained = run_available_now(
        streaming_ab_counts(
            base, variant_col="variant", flag_col="flag", by="event_type"
        ),
        output_mode="update",
    )
    return final_ab_test(
        drained, variant_col="variant", control="A", treatment="B",
        by="event_type",
    )


# ---------------------------------------------------------------------------
# Round 7: label-quality / score-quality diagnostics + key-skew profiler.
# ---------------------------------------------------------------------------

def _kappa_sql() -> str:
    from .functions.oracle import sql_lang_id

    det = sql_lang_id("text")
    return f"""
    WITH base AS (
      SELECT CAST(lang AS VARCHAR) AS a, {det} AS b FROM documents
      WHERE lang IS NOT NULL AND text IS NOT NULL
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
      FROM base
    ),
    ma AS (SELECT a AS lbl, count(*) AS na FROM base GROUP BY a),
    mb AS (SELECT b AS lbl, count(*) AS nb FROM base GROUP BY b),
    prod AS (
      SELECT CAST(sum(coalesce(na, 0) * coalesce(nb, 0)) AS BIGINT) AS sp
      FROM ma FULL OUTER JOIN mb USING (lbl)
    )
    SELECT n,
           round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed,
           round(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
             AS p_expected,
           round(CASE WHEN CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
                 THEN (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                      / (1.0 - CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 END, 6) AS kappa
    FROM tot, prod
    """


@_q("docs_lang_kappa", _kappa_sql())
def docs_lang_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the DECLARED language column and the
    n-gram language detector — the labeling-QA primitive (two raters:
    metadata vs heuristic). Exact-integer marginals, one division."""
    from .operators.ir_eval import cohen_kappa
    from .operators.textpipe import lang_id_expr

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = docs.withColumn("_det", lang_id_expr(F.col("text")))
    return cohen_kappa(scored, "lang", "_det")


def _calibration_sql(n_bins: int = 10) -> str:
    from .functions.oracle import sql_quality_score

    q = sql_quality_score("text")
    return f"""
    WITH base AS (
      SELECT {q} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    binned AS (
      SELECT least(greatest(CAST(floor(s * {n_bins}) AS INTEGER), 0),
                   {n_bins - 1}) AS bin, s, y
      FROM base
    )
    SELECT bin,
           round(CAST(bin AS DOUBLE) / {n_bins}, 6) AS bin_lo,
           round(CAST(bin + 1 AS DOUBLE) / {n_bins}, 6) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(s AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_score,
           round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS frac_positive
    FROM binned GROUP BY bin
    """


@_q("docs_calibration", _calibration_sql())
def docs_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: quality score as the 'classifier confidence'
    for the is-English label — one hash agg on the bin id, per-bin
    means via the exact-decimal sum (order-free)."""
    from .operators.ir_eval import calibration_bins
    from .operators.textpipe import quality_score_expr

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    scored = docs.select(
        quality_score_expr(F.col("text")).alias("_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("_y"),
    )
    return calibration_bins(scored, "_s", "_y", n_bins=10)


_KEY_SKEW_SQL = """
    WITH counts AS (
      SELECT coalesce(CAST(user_id AS VARCHAR), '') AS key,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows
      FROM counts
    ),
    top AS (
      SELECT key, n FROM counts ORDER BY n DESC, key ASC LIMIT 20
    )
    SELECT CAST(row_number() OVER (ORDER BY n DESC, key ASC) AS INTEGER) AS rank,
           key, n,
           round(CAST(n AS DOUBLE) / n_rows, 6) AS frac,
           round(CAST(sum(n) OVER (ORDER BY n DESC, key ASC
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / n_rows, 6) AS cum_frac,
           n_keys, n_rows
    FROM top, tot
"""


@_q("events_key_skew", _KEY_SKEW_SQL)
def events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest event users with their table share — the
    pre-shuffle skew diagnostic (one hash agg + totals broadcast +
    TakeOrdered + window over <= k survivors)."""
    from .operators.profile import key_skew_topk

    ev = _t(spark, sf_dir, "events")
    return key_skew_topk(ev, "user_id", k=20)


_VALUE_HIST_SQL = """
    WITH base AS (
      SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL
    ),
    bounds AS (SELECT min(x) AS l, max(x) AS h FROM base),
    binned AS (
      SELECT CASE WHEN (h - l) / 20.0 > 0
                  THEN least(greatest(CAST(floor((x - l) / ((h - l) / 20.0))
                                           AS INTEGER), 0), 19)
                  ELSE 0 END AS bin,
             l, (h - l) / 20.0 AS w
      FROM base, bounds
    ),
    agg AS (
      SELECT bin, l, w, CAST(count(*) AS BIGINT) AS n
      FROM binned GROUP BY bin, l, w
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM agg)
    SELECT bin,
           round(l + bin * w, 6) AS bin_lo,
           round(l + (bin + 1) * w, 6) AS bin_hi,
           n,
           round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS frac
    FROM agg, tot
"""


@_q("events_value_histogram", _VALUE_HIST_SQL)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram over events.value (bounds = exact
    min/max, one hash agg on the bin id)."""
    from .operators.profile import histogram

    ev = _t(spark, sf_dir, "events")
    return histogram(ev, "value", n_bins=20)


_USER_LIFECYCLE_SQL = """
    SELECT user_id,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           CAST(datediff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                AS INTEGER) AS lifetime_days,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
           round(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 6)
             AS total_value
    FROM events GROUP BY user_id
"""


@_q("events_user_lifecycle", _USER_LIFECYCLE_SQL)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifecycle dimension — one hash agg; exact-decimal
    value total, engine-exact."""
    from .operators.eventpipe import user_lifecycle

    ev = _t(spark, sf_dir, "events")
    return user_lifecycle(ev)


def _funnel_times_sql() -> str:
    arms = []
    for i, step in enumerate(_FUNNEL_STEPS[1:], start=2):
        arms.append(f"""
      SELECT {i} AS step, '{step}' AS step_name,
             CAST(epoch_us(s{i}.t{i}) - epoch_us(s1.t1) AS DOUBLE) / 1000000.0
               AS dt
      FROM s{i} JOIN s1 USING (user_id)""")
    body = "\n      UNION ALL".join(arms)
    return f"""
    WITH {_funnel_ctes()},
    dts AS ({body})
    SELECT step, step_name,
           CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(dt, 0.5), 6) AS p50_seconds,
           round(quantile_cont(dt, 0.9), 6) AS p90_seconds,
           round(CAST(sum(CAST(dt AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_seconds
    FROM dts GROUP BY step, step_name
"""


@_q("events_funnel_times", _funnel_times_sql())
def events_funnel_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per funnel step (p50/p90 exact
    interpolated percentiles + exact-decimal mean) — how FAST users
    convert, not just how many."""
    from .operators.eventpipe import funnel_conversion_stats

    ev = _t(spark, sf_dir, "events")
    return funnel_conversion_stats(
        ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN_S)


_SCD2_SQL = """
    WITH hist AS (
      SELECT c_custkey AS k, c_name AS name,
             round(CAST(c_acctbal AS DOUBLE), 2) AS bal,
             TIMESTAMP '2020-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (
      SELECT c_custkey AS k, c_name AS name,
             round(CAST(c_acctbal AS DOUBLE), 2) + 100.0 AS bal,
             TIMESTAMP '2024-01-01' AS uts
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, c_name, round(CAST(c_acctbal AS DOUBLE), 2),
             TIMESTAMP '2024-02-01'
      FROM customer WHERE c_custkey % 11 = 0 AND c_custkey % 7 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, round(CAST(c_acctbal AS DOUBLE), 2),
             TIMESTAMP '2024-06-01'
      FROM customer WHERE c_custkey % 13 = 0
    ),
    j AS (
      SELECT h.*, u.name AS un, u.bal AS ub, u.uts,
             (h.name IS NOT DISTINCT FROM u.name
              AND h.bal IS NOT DISTINCT FROM u.bal) AS same
      FROM hist h LEFT JOIN upd u ON h.k = u.k
    )
    SELECT k, name, bal, valid_from, valid_to
    FROM j WHERE uts IS NULL OR same
    UNION ALL
    SELECT k, name, bal, valid_from, uts
    FROM j WHERE uts IS NOT NULL AND NOT same
    UNION ALL
    SELECT k, un, ub, uts, CAST(NULL AS TIMESTAMP)
    FROM j WHERE uts IS NOT NULL AND NOT same
    UNION ALL
    SELECT u.k, u.name, u.bal, u.uts, CAST(NULL AS TIMESTAMP)
    FROM upd u LEFT JOIN hist h ON u.k = h.k
    WHERE h.k IS NULL
"""


@_q("dim_scd2_apply", _SCD2_SQL)
def dim_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history upsert over a synthesized customer dimension:
    changed balances close-and-reopen at the update ts, identical
    updates pass through versionless, unseen keys insert as open
    versions. Oracle = the same four-arm union written directly."""
    from .operators.cdc import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal").cast("double"), 2)
    hist = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        bal.alias("bal"),
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .select(
            F.col("c_custkey").alias("k"), F.col("c_name").alias("name"),
            (bal + 100.0).alias("bal"),
            F.lit("2024-01-01").cast("timestamp").alias("ts"),
        )
        .unionByName(
            cust.filter((F.col("c_custkey") % 11 == 0)
                        & (F.col("c_custkey") % 7 != 0))
            .select(
                F.col("c_custkey").alias("k"), F.col("c_name").alias("name"),
                bal.alias("bal"),
                F.lit("2024-02-01").cast("timestamp").alias("ts"),
            )
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 13 == 0)
            .select(
                (F.col("c_custkey") + 1000000).alias("k"),
                F.col("c_name").alias("name"),
                bal.alias("bal"),
                F.lit("2024-06-01").cast("timestamp").alias("ts"),
            )
        )
    )
    return scd2_apply(hist, upd, "k")


def _attribution_sql(model: str, lookback_s: int | None) -> str:
    pick = "last_value" if model == "last_touch" else "first_value"
    inner = f"""
      SELECT user_id, ts, event_type, event_id,
             {pick}(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
               OVER w AS tt,
             {pick}(CASE WHEN event_type IN ('view', 'click')
                         THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS tts
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """
    credit = "tt"
    if lookback_s is not None:
        credit = (
            f"CASE WHEN epoch_us(ts) - tts <= {lookback_s * 1_000_000} "
            f"THEN tt END"
        )
    return f"""
    WITH carried AS ({inner}),
    conv AS (
      SELECT {credit} AS touch_type FROM carried
      WHERE event_type = 'purchase'
    ),
    rolled AS (
      SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conversions
      FROM conv GROUP BY touch_type
    ),
    tot AS (SELECT CAST(sum(n_conversions) AS BIGINT) AS t FROM rolled)
    SELECT touch_type, n_conversions,
           round(CAST(n_conversions AS DOUBLE) / CAST(t AS DOUBLE), 6) AS frac
    FROM rolled, tot
"""


@_q("events_attribution_last_touch", _attribution_sql("last_touch", 86400))
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution with a 24h lookback: purchases credit
    the most recent view/click strictly before them — one IGNORE NULLS
    window pass on the user key, bounded rollup."""
    from .operators.eventpipe import attribution

    ev = _t(spark, sf_dir, "events")
    return attribution(
        ev, conversion_type="purchase", touch_types=["view", "click"],
        model="last_touch", lookback_seconds=86400.0,
        tiebreak_col="event_id",
    )


@_q("events_attribution_first_touch", _attribution_sql("first_touch", None))
def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch (original-source) attribution: purchases credit the
    user's earliest view/click."""
    from .operators.eventpipe import attribution

    ev = _t(spark, sf_dir, "events")
    return attribution(
        ev, conversion_type="purchase", touch_types=["view", "click"],
        model="first_touch", tiebreak_col="event_id",
    )


def _weighted_sample_sql(k: int = 50) -> str:
    from .functions.oracle import sql_poly_hash
    from .functions.similarity import HASH_MOD

    key = "coalesce(CAST(doc_id AS VARCHAR), '')"
    u = f"(CAST({sql_poly_hash(key)} + 1 AS DOUBLE) / {float(HASH_MOD + 1)!r})"
    return f"""
    SELECT doc_id, text, lang, source, n_chars FROM (
      SELECT *, row_number() OVER (
        PARTITION BY lang
        ORDER BY ln({u}) / CAST(n_chars AS DOUBLE) DESC,
                 {key} ASC
      ) AS rn
      FROM documents
      WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
    ) WHERE rn <= {k}
"""


@_q("docs_weighted_sample", _weighted_sample_sql())
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis-Spirakis weighted sampling: 50 docs
    per language with inclusion probability proportional to length —
    content-hash u, ln(u)/w ranking, one group window."""
    from .operators.sampling import weighted_sample_per_group

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample_per_group(
        docs, "lang", "n_chars", k=50, key_cols="doc_id"
    )


@_q("stream_attribution", _attribution_sql("last_touch", 86400))
def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming last-touch attribution: O(1) (last, first) touch
    state per user; drained credited rows + rollup equal the batch
    report — same oracle as events_attribution_last_touch."""
    from .streaming import (
        final_attribution, read_stream_table, run_available_now,
        streaming_attribution,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    drained = run_available_now(
        streaming_attribution(
            ev, conversion_type="purchase", touch_types=["view", "click"],
            model="last_touch", lookback_seconds=86400.0,
        ),
        output_mode="append",
    )
    return final_attribution(drained)


# ---------------------------------------------------------------------------
# round 8: skew-cap observability ("no silent caps") + recall-preserving
# salted hot-bucket joins. The hot corpus replicates each of the first
# 60 documents 10x verbatim, so EVERY minhash band / simhash block has
# size-10 hot buckets — caps engage deterministically at every SF.
# ---------------------------------------------------------------------------

_HOT_COPIES = 10
_HOT_DOCS = 60

_HOT_SQL = f"""
    hot AS (
      SELECT doc_id + 1000000 * k AS doc_id, text
      FROM documents CROSS JOIN range(0, {_HOT_COPIES}) AS t(k)
      WHERE doc_id < {_HOT_DOCS}
    )
"""


def _hot_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _HOT_DOCS)
    ks = spark.range(_HOT_COPIES).select(F.col("id").alias("_k"))
    return d.crossJoin(ks).select(
        (F.col("doc_id") + F.col("_k") * 1000000).alias("doc_id"), "text"
    )


from .functions.oracle import sql_word_shingles as _sql_ws  # noqa: E402
from .functions.oracle import sql_poly_hash as _sql_ph  # noqa: E402
from .functions.oracle import (  # noqa: E402
    sql_minhash_signature_from_hashes as _sql_mh,
)

_MINHASH_CAP_STATS_SQL = (
    "WITH " + _HOT_SQL + f""",
    sh AS (SELECT doc_id AS id, {_sql_ws('text', 3)} AS sh FROM hot),
    hs AS (SELECT id, list_transform(sh, g -> {_sql_ph('g')}) AS hs FROM sh),
    sig AS (SELECT id, {_sql_mh('hs', 24)} AS sig FROM hs),
    bands AS (
      SELECT id, b, (sig)[b*3+1:b*3+3] AS bsig
      FROM sig CROSS JOIN range(0, 8) AS t(b)
    ),
    sizes AS (SELECT b, bsig, count(*) AS bn FROM bands GROUP BY b, bsig)
    SELECT count(*) AS buckets_total,
           CAST(sum(CASE WHEN bn > 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS buckets_dropped,
           CAST(sum(CASE WHEN bn > 4 THEN bn ELSE 0 END) AS BIGINT)
             AS rows_dropped,
           CAST(sum(CASE WHEN bn > 4 THEN (bn * (bn - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_dropped,
           CAST(sum(CASE WHEN bn > 4 THEN bn * ((bn + 4 - 1) // 4) - bn
                    ELSE 0 END) AS BIGINT) AS salt_extra_rows
    FROM sizes
"""
)


@_q("dedup_minhash_cap_stats", _MINHASH_CAP_STATS_SQL)
def dedup_minhash_cap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact drop observable for the minhash hot-bucket cap: one
    summary row of what max_bucket_size=4 would silently drop on the
    hot corpus (every band has 60 size-10 buckets). Same sizes frame
    the cap itself builds + a 1-row aggregate — the 'no silent caps'
    companion a 100 TB dedup run logs next to its output."""
    from .operators.dedup import minhash_cap_stats

    return minhash_cap_stats(
        _hot_docs(spark, sf_dir), "text", "doc_id", max_bucket_size=4
    )


_MINHASH_SALTED_SQL = (
    "WITH " + _HOT_SQL + f""",
    sh AS (SELECT doc_id AS id, {_sql_ws('text', 3)} AS sh FROM hot),
    hs AS (SELECT id, list_transform(sh, g -> {_sql_ph('g')}) AS hs FROM sh),
    sig AS (SELECT id, {_sql_mh('hs', 24)} AS sig FROM hs),
    bands AS (
      SELECT id, b, (sig)[b*3+1:b*3+3] AS bsig
      FROM sig CROSS JOIN range(0, 8) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.id AS src, r.id AS dst
      FROM bands l JOIN bands r ON l.b = r.b AND l.bsig = r.bsig AND l.id < r.id
    )
    SELECT c.src, c.dst,
           round(CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
                 / greatest(len(a.sh) + len(b2.sh) - len(list_intersect(a.sh, b2.sh)), 1), 6)
             AS jaccard
    FROM cand c JOIN sh a ON a.id = c.src JOIN sh b2 ON b2.id = c.dst
    WHERE CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
          / greatest(len(a.sh) + len(b2.sh) - len(list_intersect(a.sh, b2.sh)), 1) >= 0.9
"""
)


@_q("dedup_minhash_salted", _MINHASH_SALTED_SQL)
def dedup_minhash_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-preserving salted hot-bucket join: max_bucket_size=3
    forces EVERY bucket of the hot corpus through the triangle-salt
    path (k=4 sub-groups), yet the oracle is the plain UNCAPPED pairs
    SQL — the salted plan must reproduce it exactly. Per-task join
    work stays bounded at ~2*cap^2 per salt cell (the 100 TB answer
    to hot boilerplate buckets that 'drop' mode would silently
    sacrifice)."""
    from .operators.dedup import near_dup_pairs_minhash

    out = near_dup_pairs_minhash(
        _hot_docs(spark, sf_dir), on="text", id_col="doc_id",
        threshold=0.9, num_hashes=24, bands=8, shingle=3, word=True,
        max_bucket_size=3, hot_bucket="salt",
    )
    return out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))


_EVENT_CAP_STATS_SQL = """
    WITH per AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    SELECT count(*) AS users_total,
           CAST(sum(CASE WHEN n > 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS users_capped,
           CAST(sum(CASE WHEN n > 50 THEN n - 50 ELSE 0 END) AS BIGINT)
             AS events_dropped,
           max(n) AS max_user_events
    FROM per
"""


@_q("events_cap_stats", _EVENT_CAP_STATS_SQL)
def events_cap_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact observable for the event-family max_events_per_user caps:
    at cap=50 the synthetic events table has genuinely capped users at
    every SF, so the drop counts are non-trivial."""
    from .operators.eventpipe import event_cap_stats

    ev = _t(spark, sf_dir, "events")
    return event_cap_stats(ev, "user_id", max_events_per_user=50)


_DEGREE_PRUNE_STATS_SQL = """
    WITH ce AS (
      SELECT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS d,
             CAST(count(*) AS DOUBLE) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    e0 AS (SELECT s, d, w FROM ce UNION ALL SELECT d, s, w FROM ce),
    e AS (SELECT s, d, sum(w) AS w FROM e0 GROUP BY 1, 2),
    r1 AS (SELECT s, d, w,
                  row_number() OVER (PARTITION BY d ORDER BY w DESC, s ASC) AS rn
           FROM e),
    e1 AS (SELECT s, d, w FROM r1 WHERE rn <= 100),
    r2 AS (SELECT s, d, w,
                  row_number() OVER (PARTITION BY s ORDER BY w DESC, d ASC) AS rn
           FROM e1),
    e2 AS (SELECT s, d, w FROM r2 WHERE rn <= 120)
    SELECT (SELECT count(*) FROM e) AS edges_total,
           (SELECT count(*) FROM e1) AS edges_after_in_prune,
           (SELECT count(*) FROM e2) AS edges_after_out_prune,
           (SELECT count(*) FROM (SELECT d FROM e GROUP BY d HAVING count(*) > 100))
             AS in_nodes_pruned,
           (SELECT count(*) FROM (SELECT s FROM e1 GROUP BY s HAVING count(*) > 120))
             AS out_nodes_pruned,
           (SELECT max(n) FROM (SELECT count(*) AS n FROM e GROUP BY d))
             AS max_in_degree_seen,
           (SELECT max(n) FROM (SELECT count(*) AS n FROM e GROUP BY s))
             AS max_out_degree_seen
"""


@_q("graph_degree_prune_stats", _DEGREE_PRUNE_STATS_SQL)
def graph_degree_prune_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact observable for pagerank's degree prune on the co-purchase
    graph: caps (in=100, out=120) sit below the graph's hottest hubs
    at every SF, so the prune counts are non-trivial. Same ranking and
    in-then-out order as pagerank itself."""
    from .operators.graph import degree_prune_stats

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ce = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    e = ce.select("src", "dst", "w").unionByName(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return degree_prune_stats(
        e, "src", "dst", weight_col="w",
        max_in_degree=100, max_out_degree=120,
    )


@_q("search_bm25_compacted", _bm25_sql())
def search_bm25_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The segment-model round trip: build the index on 90% of the
    corpus, append the other 10% as a frozen-frame delta segment, then
    COMPACT — re-deriving N/avgdl/df and re-baking every impact from
    the stored postings alone (no corpus text touched). The oracle is
    the plain full-corpus BM25 SQL: compaction must erase the append
    drift bit-exactly (operators/search.compact_bm25_index)."""
    import tempfile

    from .functions import similarity as S
    from .operators.search import (
        append_to_bm25_index, bm25_topk_indexed, compact_bm25_index,
        save_bm25_index,
    )

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 7)
    delta = docs.filter(F.col("doc_id") % 10 == 7)
    tag = _idx_tag(sf_dir)
    tmp = tempfile.gettempdir()
    inc = f"{tmp}/lt_bm25_seg_{tag}"
    comp = f"{tmp}/lt_bm25_cmp_{tag}"
    save_bm25_index(base, inc)
    append_to_bm25_index(delta, inc)
    compact_bm25_index(spark, inc, comp)
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    out = bm25_topk_indexed(spark, comp, queries, k=5)
    return out.select(
        "q_id", "doc_id", "rank", F.round("score", 6).alias("score"), "n_terms"
    )


_JACCARD_CAP_STATS_SQL = (
    "WITH " + _HOT_SQL + f""",
    sh AS (SELECT doc_id AS id, {_sql_ws('text', 3)} AS sh FROM hot),
    tok AS (SELECT id, unnest(sh) AS g FROM sh),
    sizes AS (SELECT g, count(*) AS bn FROM tok GROUP BY g)
    SELECT count(*) AS buckets_total,
           CAST(sum(CASE WHEN bn > 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS buckets_dropped,
           CAST(sum(CASE WHEN bn > 8 THEN bn ELSE 0 END) AS BIGINT)
             AS rows_dropped,
           CAST(sum(CASE WHEN bn > 8 THEN (bn * (bn - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_dropped,
           CAST(sum(CASE WHEN bn > 8 THEN bn * ((bn + 8 - 1) // 8) - bn
                    ELSE 0 END) AS BIGINT) AS salt_extra_rows
    FROM sizes
"""
)


@_q("dedup_jaccard_cap_stats", _JACCARD_CAP_STATS_SQL)
def dedup_jaccard_cap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact observable for the jaccard join's max_shingle_freq
    stopword cap on the hot corpus (every shingle of a replicated doc
    has df >= 10, so cap=8 engages on all of them)."""
    from .operators.dedup import jaccard_cap_stats

    return jaccard_cap_stats(
        _hot_docs(spark, sf_dir), "text", "doc_id",
        shingle=3, word=True, max_shingle_freq=8,
    )


from .functions.oracle import sql_shingle_hashes64 as _sql_sh64  # noqa: E402
from .functions.oracle import sql_simhash_from_hashes as _sql_simh  # noqa: E402

_SIMHASH_CAP_STATS_SQL = (
    "WITH " + _HOT_SQL + f""",
    sh AS (SELECT doc_id AS id, {_sql_ws('text', 1)} AS sh FROM hot),
    hs AS (SELECT id, {_sql_sh64('sh')} AS hs FROM sh),
    sim AS (SELECT id, {_sql_simh('hs')} AS sim FROM hs),
    blocks AS (
      SELECT id, b, (sim >> (b * 16)) & 65535 AS bval
      FROM sim CROSS JOIN range(0, 4) AS t(b)
    ),
    sizes AS (SELECT b, bval, count(*) AS bn FROM blocks GROUP BY b, bval)
    SELECT count(*) AS buckets_total,
           CAST(sum(CASE WHEN bn > 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS buckets_dropped,
           CAST(sum(CASE WHEN bn > 8 THEN bn ELSE 0 END) AS BIGINT)
             AS rows_dropped,
           CAST(sum(CASE WHEN bn > 8 THEN (bn * (bn - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_dropped,
           CAST(sum(CASE WHEN bn > 8 THEN bn * ((bn + 8 - 1) // 8) - bn
                    ELSE 0 END) AS BIGINT) AS salt_extra_rows
    FROM sizes
"""
)


@_q("dedup_simhash_cap_stats", _SIMHASH_CAP_STATS_SQL)
def dedup_simhash_cap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact observable for the simhash pigeonhole-block cap on the
    hot corpus: every replicated doc shares all four 16-bit blocks
    with its 9 copies, so cap=8 engages deterministically."""
    from .operators.dedup import simhash_cap_stats

    return simhash_cap_stats(
        _hot_docs(spark, sf_dir), "text", "doc_id",
        hamming_threshold=3, word=True, max_bucket_size=8,
    )


from .functions.oracle import sql_quality_score as _sql_qs  # noqa: E402
from .functions.oracle import sql_token_count as _sql_tc  # noqa: E402

_T = "coalesce(text, '')"
_DATACARD_SQL = f"""
    WITH b AS (
      SELECT {_T} AS t,
             length({_T}) AS nc,
             CAST({_sql_tc(_T)} AS BIGINT) AS nt,
             CAST(round({_sql_qs(_T)}, 6) AS DECIMAL(27,6)) AS q,
             coalesce(lang, '') AS lang,
             coalesce(source, '') AS src
      FROM documents
    ),
    m AS (
      SELECT count(*) AS n, sum(nc) AS ncs, sum(nt) AS nts, sum(q) AS qs,
             quantile_cont(nc, 0.5) AS p50, quantile_cont(nc, 0.9) AS p90,
             count(DISTINCT t) AS ndist
      FROM b
    )
    SELECT 'n_docs' AS metric, '' AS key,
           round(CAST(n AS DOUBLE), 6) AS value FROM m
    UNION ALL SELECT 'n_chars_total', '', round(CAST(ncs AS DOUBLE), 6) FROM m
    UNION ALL SELECT 'n_tokens_total', '', round(CAST(nts AS DOUBLE), 6) FROM m
    UNION ALL SELECT 'chars_p50', '', round(CAST(p50 AS DOUBLE), 6) FROM m
    UNION ALL SELECT 'chars_p90', '', round(CAST(p90 AS DOUBLE), 6) FROM m
    UNION ALL SELECT 'chars_mean', '',
              round(CAST(ncs AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM m
    UNION ALL SELECT 'quality_mean', '',
              round(CAST(qs AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM m
    UNION ALL SELECT 'exact_dup_frac', '',
              round(CAST(n - ndist AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM m
    UNION ALL
    SELECT 'lang_frac', lang,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT CAST(count(*) AS DOUBLE) FROM b), 6)
    FROM b GROUP BY lang
    UNION ALL
    SELECT 'source_frac', src, round(CAST(sn AS DOUBLE) / tot, 6)
    FROM (
      SELECT src, count(*) AS sn,
             row_number() OVER (ORDER BY count(*) DESC, src ASC) AS r,
             (SELECT CAST(count(*) AS DOUBLE) FROM b) AS tot
      FROM b GROUP BY src
    ) WHERE r <= 10
"""


@_q("docs_datacard", _DATACARD_SQL)
def docs_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call corpus datacard (datasheet summary block): counts,
    exact length percentiles, DECIMAL-exact mean quality, exact-dup
    floor, lang mix, top-10 source mix — a few dozen rows from hash
    aggregates over one corpus scan's projections, any corpus size."""
    from .operators.profile import corpus_datacard

    docs = _t(spark, sf_dir, "documents")
    return corpus_datacard(
        docs, "text", lang_col="lang", source_col="source", top_sources=10
    )


# ---------------------------------------------------------------------------
# Index lifecycle: tombstone deletes + purge (operators/tombstones.py).
# Compliance deletion (right-to-be-forgotten, bad-shard retraction) is
# a standing load at 100 TB: the Lucene two-phase contract — ids-only
# tombstones masked at serve, physically applied at the next compact/
# purge. Each query drives the full lifecycle against a plain SQL
# filter; the reference has no stored indexes at all (it rebuilds FAISS
# per call, infer.py:144-151), so deletion there is "filter the
# DataFrame and re-embed" — these are the persistable-index analogue.
# ---------------------------------------------------------------------------

@_q(
    "search_bm25_deleted",
    _bm25_sql(cand_pred="dtc.d % 10 <> 3"),
)
def search_bm25_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstoned BM25 serving: build the impact index over the FULL
    corpus, delete_from_bm25_index every doc_id % 10 == 3, serve. The
    oracle keeps full-corpus stats (the frozen reference frame) and
    filters only the scored candidates — deleted docs vanish, survivors
    take the freed rank slots, surviving scores unchanged."""
    import tempfile

    from .functions import similarity as S
    from .operators.search import (
        bm25_topk_indexed, delete_from_bm25_index, save_bm25_index,
    )

    docs = _t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_bm25_delidx_{tag}"
    save_bm25_index(docs, path)
    delete_from_bm25_index(
        docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"), path
    )
    out = bm25_topk_indexed(spark, path, queries, k=5)
    return out.select(
        "q_id", "doc_id", "rank", F.round("score", 6).alias("score"), "n_terms"
    )


@_q(
    "search_bm25_purged",
    _bm25_sql(corpus_pred="doc_id % 10 <> 3"),
)
def search_bm25_purged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged BM25 serving: build over the full corpus, tombstone
    doc_id % 10 == 3, compact (which applies the tombstones physically
    and re-derives N/avgdl/df from the survivors), serve from the
    compacted index. The oracle runs the whole pipeline over the
    FILTERED corpus — the compaction-equals-filtered-rebuild guarantee,
    checked end to end without ever re-reading the corpus text."""
    import tempfile

    from .functions import similarity as S
    from .operators.search import (
        bm25_topk_indexed, compact_bm25_index, delete_from_bm25_index,
        save_bm25_index,
    )

    docs = _t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    tag = _idx_tag(sf_dir)
    src = f"{tempfile.gettempdir()}/lt_bm25_purgesrc_{tag}"
    dst = f"{tempfile.gettempdir()}/lt_bm25_purgeout_{tag}"
    save_bm25_index(docs, src)
    delete_from_bm25_index(
        docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"), src
    )
    compact_bm25_index(spark, src, dst)
    out = bm25_topk_indexed(spark, dst, queries, k=5)
    return out.select(
        "q_id", "doc_id", "rank", F.round("score", 6).alias("score"), "n_terms"
    )


@_q(
    "ann_ivf_deleted",
    _ann_ivf_seeded_sql(cand_pred="c.vec_id % 7 <> 2"),
)
def ann_ivf_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstoned IVF serving: build the cell index over the full
    corpus (seeded centroids), delete_from_ivf_index vec_id % 7 == 2,
    serve. Oracle: same seeded-IVF SQL with only the candidate rows
    filtered — centroids and cell assignment stay the build-time ones,
    which is exactly the per-row-state no-staleness contract."""
    import tempfile

    from .operators.ann import (
        ann_topk_ivf_indexed, delete_from_ivf_index, save_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_delidx_{tag}"
    save_ivf_index(emb, path, n_cells=16)
    delete_from_ivf_index(
        emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"), path
    )
    out = ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


@_q(
    "ann_pq_lifecycle",
    _ann_ivfpq_rerank_sql(
        k=5, retrieve_k=40, n_cells=4, n_probe=3, m=16, n_codes=64,
        cand_pred="cc.vec_id % 7 <> 2",
    ),
)
def ann_pq_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PQ-index lifecycle in one query: build the r90 serving
    index over the id-head (vec_id < 400 — the seed window, so the
    frozen model equals a full build's), append_to_pq_index the id
    tail, delete_from_pq_index vec_id % 7 == 2, serve with pinned
    knobs. Oracle: the one-shot IVF-PQ + exact-rerank SQL over the
    FULL corpus with only the candidates filtered before the ADC
    shortlist — proving build+append+delete together equal the
    filtered one-shot plan bit-for-bit."""
    import tempfile

    from .operators.serving import (
        ann_topk_pq_indexed, append_to_pq_index, delete_from_pq_index,
        save_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_pq_lcidx_{tag}"
    save_pq_index(
        emb.filter(F.col("vec_id") < 400), path,
        n_cells=4, m=16, n_codes=64,
    )
    append_to_pq_index(emb.filter(F.col("vec_id") >= 400), path)
    delete_from_pq_index(
        emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"), path
    )
    out = ann_topk_pq_indexed(
        spark, path, q, k=5, n_probe=3, retrieve_k=40
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


@_q(
    "dedup_minhash_index_deleted",
    _minhash_against_sql("doc_id < 250 AND doc_id % 5 <> 1"),
)
def dedup_minhash_index_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-MinHash-index ingest with tombstones: save_minhash_index
    over the seen corpus, delete_from_minhash_index doc_id % 5 == 1,
    run the new batch against the index. Oracle: the against-corpus
    SQL with the seen side filtered — deleted docs stop producing
    candidates (masked BEFORE any bucket accounting), everything else
    identical. Also the stored-index path's standing registration
    (build + load + family-meta validation ride this query)."""
    import tempfile

    from .operators.dedup import (
        delete_from_minhash_index, near_dup_pairs_minhash_against_index,
        save_minhash_index,
    )

    d = _t(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") < 250).select("doc_id", "text")
    nw = (
        d.filter(F.col("doc_id") < 150)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
        )
        .unionByName(
            d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", "text")
        )
    )
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_mh_delidx_{tag}"
    save_minhash_index(seen, path, on="text", id_col="doc_id")
    delete_from_minhash_index(
        seen.filter(F.col("doc_id") % 5 == 1).select("doc_id"), path,
        id_col="doc_id",
    )
    out = near_dup_pairs_minhash_against_index(
        nw, path, on="text", id_col="doc_id", threshold=0.6
    )
    return out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))


@_q(
    "stream_dedup_index_deleted",
    _minhash_against_sql("doc_id < 250 AND doc_id % 5 <> 1"),
)
def stream_dedup_index_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The long-running production ingest shape end to end: the seen
    corpus's MinHash index is PERSISTED (save_minhash_index), a
    compliance delete tombstones part of it, and a document STREAM
    dedups against the stored index — no per-start signature rebuild,
    stateless append mode, tombstones honored. Oracle: the batch
    against-corpus SQL with the seen side filtered — the streaming
    stored-index path emits exactly the filtered batch pair set."""
    import tempfile

    from .operators.dedup import delete_from_minhash_index, save_minhash_index
    from .streaming import read_stream_table, run_available_now
    from .streaming.ops import streaming_dedup_against_index

    d = _t(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") < 250).select("doc_id", "text")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_mh_sdelidx_{tag}"
    save_minhash_index(seen, path, on="text", id_col="doc_id")
    delete_from_minhash_index(
        seen.filter(F.col("doc_id") % 5 == 1).select("doc_id"), path,
        id_col="doc_id",
    )

    s = read_stream_table(spark, sf_dir, "documents")
    nw = (
        s.filter(F.col("doc_id") < 150)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
        )
        .unionByName(
            s.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", "text")
        )
    )
    out = streaming_dedup_against_index(
        nw, path, on="text", id_col="doc_id", threshold=0.6
    )
    out = out.select("src", "dst", F.round("jaccard", 6).alias("jaccard"))
    return run_available_now(out, output_mode="append")


@_q(
    "index_tombstone_stats",
    """
    WITH dels AS (
      SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 7 = 2
    )
    SELECT CAST((SELECT count(*) FROM dels) AS BIGINT) AS n_tombstones,
           CAST((SELECT count(*) FROM embeddings e
                 WHERE e.vec_id IN (SELECT vec_id FROM dels)) AS BIGINT)
             AS n_masked_rows,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT)
             AS n_stored_rows,
           CAST((SELECT count(*) FROM embeddings e
                 WHERE e.vec_id IN (SELECT vec_id FROM dels)) AS DOUBLE)
             / (SELECT count(*) FROM embeddings) AS masked_frac
""",
)
def index_tombstone_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The purge-cadence observable (the "no silent state" stance the
    skew-cap observables set): exact tombstone and masked-row counts
    for a stored index — what the serve-time anti-join is paying to
    skip, i.e. when to schedule the purge. Exercised on the IVF index
    (one cell row per vector, so n_masked_rows = |deleted ∩ stored|)."""
    import tempfile

    from .operators.ann import delete_from_ivf_index, save_ivf_index
    from .operators.tombstones import tombstone_stats

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_tsidx_{tag}"
    save_ivf_index(emb, path, n_cells=16)
    delete_from_ivf_index(
        emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"), path
    )
    return tombstone_stats(spark, path, "vec_id", "cells")


_ER_ATTACH_SQL = f"""
    WITH l AS (
      SELECT c_custkey AS id, coalesce(CAST(c_name AS VARCHAR), '') AS key,
             c_nationkey AS blk FROM customer
    ),
    reg AS (
      SELECT s_suppkey AS eid, coalesce(CAST(s_name AS VARCHAR), '') AS key,
             s_nationkey AS blk FROM supplier
    ),
    sc AS (
      SELECT l.id, reg.eid, reg.key AS mkey,
             {sql_lev_sim('l.key', 'reg.key')} AS score
      FROM l JOIN reg ON l.blk = reg.blk
      WHERE {sql_lev_sim('l.key', 'reg.key')} >= 0.62
    ),
    best AS (
      SELECT id, eid, mkey, score FROM (
        SELECT id, eid, mkey, score,
               row_number() OVER (
                 PARTITION BY id ORDER BY score DESC, eid ASC, mkey ASC
               ) AS rn
        FROM sc
      ) WHERE rn = 1
    )
    SELECT l.id AS record_id, l.key,
           b.eid AS entity_id, b.mkey AS matched_key,
           round(b.score, 6) AS score
    FROM l LEFT JOIN best b ON l.id = b.id
"""


@_q("er_attach_incremental", _ER_ATTACH_SQL)
def er_attach_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ER — attach a new record batch to an existing
    entity registry (operators/entity.py attach_to_entities): best
    blocked match at/above threshold adopts the entity, unmatched
    records come back NULL for a later batch resolve. Registry here =
    the supplier table as resolved entities (one per supplier); new
    batch = the customer table; nation blocking, levenshtein scorer —
    the same match surface as er_match_pairs, now in the stored-
    registry ingest shape."""
    from .operators.entity import attach_to_entities

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    registry = supp.select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("key"),
        "s_nationkey",
    )
    out = attach_to_entities(
        cust, registry, on="c_name", id_col="c_custkey",
        sim_threshold=0.62,
        blocking_vars=[("c_nationkey", "s_nationkey")],
    )
    return out.select(
        "record_id", "key", "entity_id", "matched_key",
        F.round("score", 6).alias("score"),
    )


@_q("stream_er_attach", _ER_ATTACH_SQL)
def stream_er_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental ER: the customer STREAM attaches to the
    supplier entity registry — stateless candidate emission
    (stream-static blocked join + row-local score filter), best-entity
    rank at drain (final_attach). Same oracle as the batch
    er_attach_incremental: the split changes the latency model, never
    the rows."""
    from .streaming import read_stream_table, run_available_now
    from .streaming.ops import final_attach, streaming_attach_candidates

    supp = _t(spark, sf_dir, "supplier")
    registry = supp.select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("key"),
        "s_nationkey",
    )
    cust_stream = read_stream_table(spark, sf_dir, "customer")
    # prune_topk=1 bounds the drained sink at one row per record (a
    # hot registry block otherwise inflates it linearly — measured,
    # tools/attach_fanout_sweep.py); the prune keeps each record's
    # best row under EXACTLY final_attach's selection order, so the
    # oracle is unchanged and checks the pruned path end to end
    cand = streaming_attach_candidates(
        cust_stream, registry, on="c_name", id_col="c_custkey",
        sim_threshold=0.62,
        blocking_vars=[("c_nationkey", "s_nationkey")],
        prune_topk=1,
    )
    drained = run_available_now(cand, output_mode="append")
    cust = _t(spark, sf_dir, "customer")
    out = final_attach(drained, cust, on="c_name", id_col="c_custkey")
    return out.select(
        "record_id", "key", "entity_id", "matched_key",
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# Round-10 additions: the cell-balance observable for the stored vector
# indexes (the monitor behind the documented "watch cell sizes and
# rebuild" IVF/PQ maintenance trade) and the one-call upsert lifecycle
# (operators/upsert.py — targeted partition rewrite + untombstone +
# frozen-model append, ≡ the documented delete→purge→append recipe).


def _cell_stats_sql(n_cells: int = 16) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    cassign AS (
      SELECT vec_id, cell FROM (
        SELECT c.vec_id, ct.cell,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cn c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    per AS (SELECT cell, count(*) AS n FROM cassign GROUP BY cell),
    s AS (
      SELECT count(*) AS ne, sum(n) AS nr, max(n) AS mx, min(n) AS mn
      FROM per
    ),
    top AS (SELECT cell FROM per ORDER BY n DESC, cell ASC LIMIT 1)
    SELECT CAST({n_cells} AS INT) AS n_cells,
           CAST(s.ne AS BIGINT) AS n_nonempty_cells,
           CAST(s.nr AS BIGINT) AS n_rows,
           CAST(s.mx AS BIGINT) AS max_cell_rows,
           CAST(s.mn AS BIGINT) AS min_cell_rows,
           CAST(s.nr AS DOUBLE) / {float(n_cells)} AS mean_cell_rows,
           CAST(s.mx * {n_cells} AS DOUBLE) / CAST(s.nr AS DOUBLE)
             AS max_over_mean,
           CAST(top.cell AS INT) AS top_cell
    FROM s, top
"""


@_q("index_cell_stats", _cell_stats_sql())
def index_cell_stats_obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-balance observable for a stored vector index
    (operators/ann.index_cell_stats): exact per-cell counts reduced to
    the one-row skew summary that schedules the rebuild ("monitor cell
    sizes", the documented IVF/PQ append-drift trade). The oracle
    mirrors the seeded assignment bit-for-bit and aggregates the same
    counts in SQL."""
    import tempfile

    from .operators.ann import index_cell_stats, save_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_csidx_{tag}"
    save_ivf_index(emb, path, n_cells=16)
    return index_cell_stats(spark, path)


def _ivf_upsert_sql(n_cells: int = 16, n_probe: int = 4, k: int = 5) -> str:
    """The upsert-lifecycle mirror: centroids stay FROZEN on the
    ORIGINAL corpus's seed window (the upsert never retrains), the
    candidate corpus is the MODIFIED one (changed vectors replace
    their ids in place, new ids append, the still-tombstoned id is
    masked), queries score against it. Mirrors, in one SQL plan,
    exactly what build → delete → upsert(changed+new) → serve leaves
    on disk."""
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    cmod AS (
      SELECT vec_id, {sql_l2_normalize('list_reverse(embedding)')} AS v
      FROM embeddings WHERE vec_id % 10 = 3
      UNION ALL
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id % 10 <> 3
      UNION ALL
      SELECT vec_id + 10000, {sql_l2_normalize('embedding')} AS v
      FROM embeddings WHERE vec_id % 10 = 7
    ),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    qn AS (SELECT vec_id, v FROM cn WHERE vec_id < 50),
    cassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cmod c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    qassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT q.vec_id, ct.cell, q.v,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM qn q CROSS JOIN cent ct
      ) WHERE rn <= {n_probe}
    )
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
             ) AS rank
      FROM qassign q JOIN cassign c ON q.cell = c.cell
      WHERE NOT (c.vec_id % 25 = 9)
    ) WHERE rank <= {k}
"""


@_q("ann_ivf_upsert", _ivf_upsert_sql())
def ann_ivf_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call upsert lifecycle on the stored IVF index
    (operators/upsert.upsert_ivf_index): build → tombstone two delete
    batches (one overlapping the coming upsert, one not) →
    upsert(changed vectors + brand-new ids) → serve. The upsert must
    (a) physically drop the old versions from ONLY their cells,
    (b) clear the batch ids' tombstones so the new versions serve
    (plain append would stay masked), (c) leave the non-batch
    tombstone masking intact, and (d) encode everything against the
    FROZEN build-time centroids. The oracle is the one-shot SQL plan
    over exactly that end state."""
    import tempfile

    from .operators.ann import (
        ann_topk_ivf_indexed, delete_from_ivf_index, save_ivf_index,
    )
    from .operators.upsert import upsert_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_upidx_{tag}"
    save_ivf_index(emb, path, n_cells=16)
    # two delete batches: %20==3 is re-ingested by the upsert below
    # (must serve again), %25==9 is not (must stay masked)
    delete_from_ivf_index(
        emb.filter((F.col("vec_id") % 20 == 3) | (F.col("vec_id") % 25 == 9))
        .select("vec_id"),
        path,
    )
    batch = (
        emb.filter(F.col("vec_id") % 10 == 3)
        .select("vec_id", F.reverse("embedding").alias("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 7).select(
                (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
            )
        )
    )
    upsert_ivf_index(batch, path)
    q = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    out = ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("score", 6).alias("score")
    )


@_q("stream_ann_ivf_upserted", _ivf_upsert_sql())
def stream_ann_ivf_upserted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style streaming index maintenance
    (streaming/ops.run_upsert_stream): the ann_ivf_upsert lifecycle
    with the upsert batch arriving as a MULTI-MICRO-BATCH stream —
    one upsert_ivf_index call per micro-batch via foreachBatch, each
    under the single-writer lock. The stream's ids are unique, so the
    final index state equals the one-call upsert over the union, and
    the SAME one-shot SQL oracle checks the post-drain serve."""
    import tempfile

    from .operators.ann import (
        ann_topk_ivf_indexed, delete_from_ivf_index, save_ivf_index,
    )
    from .streaming import run_upsert_stream

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_supidx_{tag}"
    save_ivf_index(emb, path, n_cells=16)
    delete_from_ivf_index(
        emb.filter((F.col("vec_id") % 20 == 3) | (F.col("vec_id") % 25 == 9))
        .select("vec_id"),
        path,
    )
    batch = (
        emb.filter(F.col("vec_id") % 10 == 3)
        .select("vec_id", F.reverse("embedding").alias("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 7).select(
                (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
            )
        )
    )
    src = f"{tempfile.gettempdir()}/lt_ivf_supbatch_{tag}"
    batch.repartition(3).write.mode("overwrite").parquet(src)
    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_upsert_stream(sdf, path, "ivf")
    q = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    out = ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("score", 6).alias("score")
    )


# The ACT half of the cell-balance loop (operators/ann.py
# rebalance_ivf_index): hot cells (count > ratio x mean, mean over the
# build-time n_cells) split into children seeded from their smallest-id
# stored vectors — child 0 keeps the cell id, child j>=1 gets
# n_cells + hot_rank*(split-1) + (j-1) — and the hot cells' rows
# reassign by first-max dot with ties to the smaller new cell id.
# Serving over the post-rebalance topology is fully SQL-expressible
# because every choice above is deterministic and id-seeded.
def _ivf_rebalance_sql(n_cells: int = 16, ratio: float = 1.2,
                       split: int = 2, n_probe: int = 4,
                       k: int = 5) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    qn AS (SELECT vec_id, v FROM cn WHERE vec_id < 50),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    cassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cn c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    counts AS (SELECT cell, count(*) AS c FROM cassign GROUP BY cell),
    meanv AS (
      SELECT CAST(sum(c) AS DOUBLE) / {n_cells} AS m FROM counts
    ),
    hot AS (
      SELECT cell FROM counts CROSS JOIN meanv
      WHERE c > {ratio} * m AND c >= {split}
    ),
    hotr AS (
      SELECT cell, row_number() OVER (ORDER BY cell) - 1 AS hi FROM hot
    ),
    childv AS (
      SELECT a.cell AS old_cell, a.v,
             row_number() OVER (
               PARTITION BY a.cell ORDER BY a.vec_id ASC
             ) - 1 AS child
      FROM cassign a JOIN hot h ON a.cell = h.cell
    ),
    children AS (
      SELECT c.old_cell, c.v,
             CASE WHEN c.child = 0 THEN c.old_cell
                  ELSE {n_cells} + hr.hi * ({split} - 1) + (c.child - 1)
             END AS new_cell
      FROM childv c JOIN hotr hr ON c.old_cell = hr.cell
      WHERE c.child < {split}
    ),
    reassign AS (
      SELECT vec_id, new_cell AS cell, v FROM (
        SELECT a.vec_id, ch.new_cell, a.v,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {sql_dot('a.v', 'ch.v')} DESC, ch.new_cell ASC
               ) AS rn
        FROM cassign a JOIN children ch ON a.cell = ch.old_cell
      ) WHERE rn = 1
    ),
    finala AS (
      SELECT vec_id, cell, v FROM cassign
      WHERE cell NOT IN (SELECT cell FROM hot)
      UNION ALL
      SELECT vec_id, cell, v FROM reassign
    ),
    newcent AS (
      SELECT cell, v FROM cent WHERE cell NOT IN (SELECT cell FROM hot)
      UNION ALL
      SELECT new_cell AS cell, v FROM children
    ),
    qassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT q.vec_id, nc.cell, q.v,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'nc.v')} DESC, nc.cell ASC
               ) AS rn
        FROM qn q CROSS JOIN newcent nc
      ) WHERE rn <= {n_probe}
    )
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, c.vec_id ASC
             ) AS rank
      FROM qassign q JOIN finala c ON q.cell = c.cell
    ) WHERE rank <= {k}
"""


# The PQ twin: identical rebalance semantics over the r90 serving
# index — frozen per-row codes ride along (they encode against the
# cell-independent codebook), the post-rebalance topology replaces
# cassign/cent in the ADC + exact-rerank recipe.
def _pq_rebalance_sql(n_cells: int = 16, ratio: float = 1.2,
                      split: int = 2, n_probe: int = 4, k: int = 5,
                      retrieve_k: int = 40, m: int = 8,
                      n_codes: int = 16, dim: int = 64) -> str:
    from .functions.oracle import sql_dot, sql_l2_normalize

    ds = dim // m
    qsub = f"q.v[b.sub*{ds}+1 : b.sub*{ds}+{ds}]"
    csub = f"a.v[b.sub*{ds}+1 : b.sub*{ds}+{ds}]"
    return f"""
    WITH cn AS (
      SELECT vec_id, {sql_l2_normalize('embedding')} AS v FROM embeddings
    ),
    qn AS (SELECT vec_id, v FROM cn WHERE vec_id < 50),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_cells})
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT vec_id, v FROM cn ORDER BY vec_id LIMIT {n_codes})
    ),
    book AS (
      SELECT CAST(t.j AS INT) AS sub, code,
             v[t.j*{ds}+1 : t.j*{ds}+{ds}] AS cv
      FROM seeds CROSS JOIN range(0, {m}) t(j)
    ),
    cassign AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, ct.cell, c.v,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sql_dot('c.v', 'ct.v')} DESC, ct.cell ASC
               ) AS rn
        FROM cn c CROSS JOIN cent ct
      ) WHERE rn = 1
    ),
    counts AS (SELECT cell, count(*) AS c FROM cassign GROUP BY cell),
    meanv AS (
      SELECT CAST(sum(c) AS DOUBLE) / {n_cells} AS m FROM counts
    ),
    hot AS (
      SELECT cell FROM counts CROSS JOIN meanv
      WHERE c > {ratio} * m AND c >= {split}
    ),
    hotr AS (
      SELECT cell, row_number() OVER (ORDER BY cell) - 1 AS hi FROM hot
    ),
    childv AS (
      SELECT a.cell AS old_cell, a.v,
             row_number() OVER (
               PARTITION BY a.cell ORDER BY a.vec_id ASC
             ) - 1 AS child
      FROM cassign a JOIN hot h ON a.cell = h.cell
    ),
    children AS (
      SELECT c.old_cell, c.v,
             CASE WHEN c.child = 0 THEN c.old_cell
                  ELSE {n_cells} + hr.hi * ({split} - 1) + (c.child - 1)
             END AS new_cell
      FROM childv c JOIN hotr hr ON c.old_cell = hr.cell
      WHERE c.child < {split}
    ),
    reassign AS (
      SELECT vec_id, new_cell AS cell, v FROM (
        SELECT a.vec_id, ch.new_cell, a.v,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {sql_dot('a.v', 'ch.v')} DESC, ch.new_cell ASC
               ) AS rn
        FROM cassign a JOIN children ch ON a.cell = ch.old_cell
      ) WHERE rn = 1
    ),
    finala AS (
      SELECT vec_id, cell, v FROM cassign
      WHERE cell NOT IN (SELECT cell FROM hot)
      UNION ALL
      SELECT vec_id, cell, v FROM reassign
    ),
    newcent AS (
      SELECT cell, v FROM cent WHERE cell NOT IN (SELECT cell FROM hot)
      UNION ALL
      SELECT new_cell AS cell, v FROM children
    ),
    ccodes AS (
      SELECT vec_id, cell, sub, code FROM (
        SELECT a.vec_id, a.cell, b.sub, b.code,
               row_number() OVER (
                 PARTITION BY a.vec_id, b.sub
                 ORDER BY {sql_dot(csub, 'b.cv')} DESC, b.code ASC
               ) AS rn
        FROM finala a CROSS JOIN book b
      ) WHERE rn = 1
    ),
    qassign AS (
      SELECT vec_id, cell FROM (
        SELECT q.vec_id, nc.cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_dot('q.v', 'nc.v')} DESC, nc.cell ASC
               ) AS rn
        FROM qn q CROSS JOIN newcent nc
      ) WHERE rn <= {n_probe}
    ),
    lut AS (
      SELECT q.vec_id, b.sub, b.code, {sql_dot(qsub, 'b.cv')} AS lut
      FROM qn q CROSS JOIN book b
    ),
    folded AS (
      SELECT p.qid, p.rid,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(l.lut ORDER BY l.sub)),
               (acc, x) -> acc + x
             ) AS score
      FROM (
        SELECT qa.vec_id AS qid, cc.vec_id AS rid, cc.sub, cc.code
        FROM qassign qa JOIN ccodes cc ON qa.cell = cc.cell
      ) p
      JOIN lut l ON l.vec_id = p.qid AND l.sub = p.sub AND l.code = p.code
      GROUP BY p.qid, p.rid
    ),
    shortlist AS (
      SELECT qid, rid FROM (
        SELECT qid, rid,
               row_number() OVER (
                 PARTITION BY qid ORDER BY score DESC, rid ASC
               ) AS rank
        FROM folded
      ) WHERE rank <= {retrieve_k}
    )
    SELECT query_id, neighbor_id, rank, round(score, 6) AS score
    FROM (
      SELECT b.qid AS query_id, b.rid AS neighbor_id,
             {sql_dot('q.v', 'c.v')} AS score,
             row_number() OVER (
               PARTITION BY b.qid
               ORDER BY {sql_dot('q.v', 'c.v')} DESC, b.rid ASC
             ) AS rank
      FROM shortlist b
      JOIN qn q ON q.vec_id = b.qid
      JOIN cn c ON c.vec_id = b.rid
    ) WHERE rank <= {k}
"""


@_q("ann_pq_rebalanced", _pq_rebalance_sql())
def ann_pq_rebalanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-balance lifecycle on the r90 SERVING index: build the
    seeded PQ index, split its hot cells with rebalance_pq_index (the
    frozen per-row codes ride along — the codebook is
    cell-independent), serve with pinned knobs. The oracle re-derives
    the rebalance AND the full ADC + exact-rerank recipe over the
    post-rebalance topology."""
    import tempfile

    from .operators.ann import rebalance_pq_index
    from .operators.serving import ann_topk_pq_indexed, save_pq_index

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_pq_rebidx_{tag}"
    save_pq_index(emb, path, n_cells=16, m=8, n_codes=16)
    rebalance_pq_index(spark, path, max_over_mean=1.2, split_factor=2)
    q = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    out = ann_topk_pq_indexed(
        spark, path, q, k=5, n_probe=4, retrieve_k=40
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


@_q("ann_ivf_rebalanced", _ivf_rebalance_sql())
def ann_ivf_rebalanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-balance lifecycle: build the seeded IVF index, split its
    hot cells with rebalance_ivf_index (ratio 1.2 so the near-uniform
    bench corpus still produces hot cells), serve over the
    post-rebalance topology. The oracle re-derives the ENTIRE
    rebalance in SQL — hot-cell detection, child seeding, the closed-
    form new-cell ids, the first-max reassignment — and serves with
    the same n_probe, proving the in-place partition surgery equals
    the declarative plan end to end."""
    import tempfile

    from .operators.ann import (
        ann_topk_ivf_indexed, rebalance_ivf_index, save_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tag = _idx_tag(sf_dir)
    path = f"{tempfile.gettempdir()}/lt_ivf_rebidx_{tag}"
    save_ivf_index(emb, path, n_cells=16)
    rebalance_ivf_index(spark, path, max_over_mean=1.2, split_factor=2)
    q = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    out = ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("score", 6).alias("score")
    )
