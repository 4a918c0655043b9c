"""Deterministic char-n-gram hashing encoder.

Embedding of a string = L2-normalized ``dim``-bucket count vector of its
character n-grams, bucketed by the portable polynomial hash
(functions/similarity.poly_hash). Deterministic and engine-portable —
the engine-grade version of the reference tests' monkeypatched
deterministic embeddings (/root/reference/tests/infer_test.py:204-233).

Execution shape (load-bearing): ``encode`` is RELATIONAL —
    distinct(key) -> explode(bucket ids) -> groupBy(key, bucket) count
    -> groupBy(key) map -> dense vector -> join back on key.
A single inline expression (``expr()``) looks tempting but Spark's
higher-order array functions are CodegenFallback (interpreted), and the
bucket-count formulation re-evaluates the n-gram hashing once PER
DIMENSION — measured >40x slower than the explode/agg plan at dim=64.
The relational plan hashes each n-gram once, scales out (one shuffle on
distinct keys — the embed-once CSE from SURVEY §4 built in), and stays
fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import char_ngrams, l2_normalize, poly_hash
from .base import Encoder


class HashNgramEncoder(Encoder):
    expression_based = True  # no Python workers anywhere in the plan

    def __init__(self, dim: int = 64, n: int = 3, salt: int = 0):
        self.dim = dim
        self.n = n
        self.salt = salt

    def buckets(self, s: Column) -> Column:
        """Bucket id per n-gram occurrence (with multiplicity)."""
        return F.transform(
            char_ngrams(s, self.n),
            lambda g: poly_hash(g, self.salt) % F.lit(self.dim),
        )

    def expr(self, s: Column) -> Column:
        """Single-expression form — ONLY for tiny inputs and for reading
        the algorithm; see module doc for why encode() doesn't use it."""
        buckets = self.buckets(s)
        counts = F.transform(
            F.sequence(F.lit(0), F.lit(self.dim - 1)),
            lambda j: F.size(F.filter(buckets, lambda b: b == j)).cast("double"),
        )
        return l2_normalize(counts)

    def encode(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        dim = self.dim
        keys = df.select(text_col).distinct()
        ex = keys.select(text_col, F.explode(self.buckets(F.col(text_col))).alias("_b"))
        cnt = ex.groupBy(text_col, "_b").agg(F.count(F.lit(1)).alias("_c"))
        m = cnt.groupBy(text_col).agg(
            F.map_from_arrays(F.collect_list("_b"), F.collect_list("_c")).alias("_m")
        )
        vec = m.withColumn(
            "_cnt",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.coalesce(F.element_at(F.col("_m"), j), F.lit(0)).cast("double"),
            ),
        ).select(text_col, l2_normalize(F.col("_cnt")).alias(out_col))
        zero = F.array(*([F.lit(0.0)] * dim))
        return df.join(vec, text_col, "left").withColumn(
            out_col, F.coalesce(F.col(out_col), zero)
        )

    def encode_distinct(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        # encode() already dedups keys internally
        return self.encode(df, text_col, out_col)
