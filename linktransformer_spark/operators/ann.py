"""Similarity search over an embedding column (north-star extension).

Three execution strategies behind one API:

- ``exact_cross``    : normalize -> cross join -> dot -> window top-k.
  Exact, declarative, oracle-checkable. Right plan when one side is
  small (Catalyst broadcasts it).
- ``broadcast_knn``  : corpus vectors broadcast once per executor,
  numpy matmul top-k per Arrow batch (exact scores, O(|Q|·k) output).
  The single-node-beating throughput path while the corpus fits in
  executor memory.
- ``lsh_hyperplane`` : deterministic random-hyperplane LSH (sign-bit
  bucket join) with exact re-rank inside buckets. Approximate recall,
  near-linear cost — the 100 TB path. Hyperplanes are derived by pure
  integer arithmetic (Knuth multiplicative hash), so the whole plan
  stays reproducible across runs and engines: no RNG state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from . import knn_join as KJ

KNUTH = 2654435761
MOD31 = 2147483648  # 2^31


def hyperplane_component(h: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5)."""
    return ((h * 64 + j + 1) * KNUTH % MOD31) / MOD31 - 0.5


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 12) -> Column:
    """Sign-bit bucket id of ``vec`` against n_planes fixed hyperplanes."""
    bucket = F.lit(0)
    for h in range(n_planes):
        coeffs = F.array(*[F.lit(hyperplane_component(h, j)) for j in range(dim)])
        dot = S.dot(vec, coeffs)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << h)).otherwise(F.lit(0))
    return bucket


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    mode: str = "exact_cross",
    n_planes: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Top-k nearest corpus rows per query row by cosine.

    Returns (query_id, neighbor_id, rank, score). Deterministic
    tie-break (score DESC, neighbor_id ASC) everywhere.
    """
    q = queries.select(
        F.col(query_id).cast("long").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    c = corpus.select(
        F.col(corpus_id).cast("long").alias(KJ.RIGHT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.RIGHT_EMB),
    )

    if mode == "broadcast_knn":
        scorer = _CosOnPrepared()
        cand = KJ._broadcast_knn(q, c, scorer, k=k)
        w = Window.partitionBy(KJ.LEFT_ID).orderBy(F.col("score").desc(), F.col(KJ.RIGHT_ID).asc())
        ranked = cand.withColumn("rank", F.row_number().over(w))
    elif mode == "lsh_hyperplane":
        if dim is None:
            raise ValueError("lsh_hyperplane mode needs dim=")
        qb = q.withColumn("_bkt", hyperplane_bucket(F.col(KJ.LEFT_EMB), dim, n_planes))
        cb = c.withColumn("_bkt", hyperplane_bucket(F.col(KJ.RIGHT_EMB), dim, n_planes))
        cand = qb.join(cb, "_bkt").withColumn(
            "score", S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))
        )
        ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    elif mode == "exact_cross":
        # broadcast-NLJ parallelism == query-side partitions
        q = KJ.ensure_parallelism(q)
        cand = q.crossJoin(c).withColumn(
            "score", S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))
        )
        ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return ranked.select(
        F.col(KJ.LEFT_ID).alias("query_id"),
        F.col(KJ.RIGHT_ID).alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").alias("score"),
    )


class _CosOnPrepared:
    needs_embeddings = True

    @staticmethod
    def score() -> Column:
        return S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))
