"""Encoder over a pre-existing vector column (e.g. the testdata
``embeddings.embedding`` array<float>): just L2-normalize in place."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import l2_normalize
from .base import Encoder


class PrecomputedEncoder(Encoder):
    expression_based = True

    def __init__(self, vector_col: str, dim: int = 0):
        self.vector_col = vector_col
        self.dim = dim

    def encode(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        # text_col is ignored; vectors come from vector_col
        return df.withColumn(out_col, l2_normalize(F.col(self.vector_col)))

    def encode_distinct(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        return self.encode(df, text_col, out_col)
