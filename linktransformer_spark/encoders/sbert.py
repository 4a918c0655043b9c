"""sentence-transformers encoder — Arrow-batched pandas UDF.

Mirrors the reference's ``infer_embeddings`` SBERT path
(/root/reference/src/linktransformer/utils.py:200-211): encode with the
model, L2-normalize. The model is loaded once per Python worker via a
process-level singleton (NOT per batch, NOT on the driver) — on a
1000-executor cluster each worker pays one model load, then streams
Arrow batches through it.

The library is not installed in this container, so the import is gated;
the class raises a clear error at *use* time, and everything that needs
determinism uses HashNgramEncoder instead.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from .base import Encoder

_MODEL_CACHE: dict = {}


def _load_model(name: str):
    if name not in _MODEL_CACHE:
        from sentence_transformers import SentenceTransformer  # import-gated

        _MODEL_CACHE[name] = SentenceTransformer(name)
    return _MODEL_CACHE[name]


class SBertEncoder(Encoder):
    expression_based = False

    def __init__(self, model_name: str, batch_size: int = 128, dim: int = 0):
        # batch 128 = reference default (/root/reference/src/linktransformer/infer.py:33)
        self.model_name = model_name
        self.batch_size = batch_size
        self.dim = dim

    def encode(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without the lib
            raise ImportError(
                "SBertEncoder requires the 'sentence-transformers' package, "
                "which is not available in this environment. Use "
                "model='hash-ngram' (deterministic) or PrecomputedEncoder."
            ) from e

        name, batch = self.model_name, self.batch_size

        @F.pandas_udf(ArrayType(DoubleType()))
        def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            import numpy as np

            model = _load_model(name)  # per-worker singleton
            for series in it:
                vecs = model.encode(
                    series.fillna("").tolist(),
                    batch_size=batch,
                    normalize_embeddings=True,
                    show_progress_bar=False,
                )
                yield pd.Series([np.asarray(v, dtype="float64").tolist() for v in vecs])

        return df.withColumn(out_col, _embed(F.col(text_col)))

    def encode_batch(self, strings):
        """Local batch mirror for the key-shipping broadcast-kNN path:
        on the driver for the small collected side, and inside the
        scoring task (per-worker model singleton) for Arrow batches of
        the big side. Same model call as the UDF path."""
        import numpy as np

        model = _load_model(self.model_name)
        vecs = model.encode(
            ["" if s is None else str(s) for s in strings],
            batch_size=self.batch_size,
            normalize_embeddings=True,
            show_progress_bar=False,
        )
        return np.asarray(vecs, dtype="float64")
