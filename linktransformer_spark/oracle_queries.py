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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
