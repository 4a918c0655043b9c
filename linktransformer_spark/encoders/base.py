"""Encoder interface + registry.

The reference embeds with sentence-transformers / OpenAI / Gemini
(/root/reference/src/linktransformer/utils.py:179-248). Our engine makes
the encoder a pluggable strategy so that:

- tests & the DuckDB oracle use :class:`HashNgramEncoder` (deterministic,
  pure Catalyst expressions — no Python workers in the plan);
- real deployments use :class:`SBertEncoder` / :class:`ApiEncoder`
  (pandas-UDF backed, gated behind import-try since the model libs are
  not in this container);
- tables that already carry vectors use :class:`PrecomputedEncoder`.

Embedding CSE: ``encode_distinct`` embeds each *distinct* key string
once and joins back — the generalization of the reference's embed-once
trick (/root/reference/src/linktransformer/modified_sbert/evaluation.py:448-450).
Catalyst cannot eliminate a common subexpression across a UDF boundary,
so the rewrite lives here at the operator-builder level. At 100 TB this
is usually a large win (key domains are much smaller than row counts);
it costs one extra shuffle on the key, which AQE sizes.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Encoder(ABC):
    """Turns a string column into an L2-normalized array<double> column."""

    #: embedding dimensionality
    dim: int = 0
    #: True when the embedding is a pure Catalyst expression (no Python
    #: worker) — such encoders need no distinct-CSE to be cheap, but it
    #: still helps when strings repeat.
    expression_based: bool = False

    @abstractmethod
    def encode(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        """Return ``df`` with ``out_col`` = normalized embedding of
        ``text_col``."""

    def encode_distinct(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        """Embed-once CSE: distinct(key) -> encode -> equi-join back."""
        keys = df.select(text_col).distinct()
        encoded = self.encode(keys, text_col, out_col)
        return df.join(encoded, on=text_col, how="left")


def resolve_encoder(model) -> "Encoder":
    """Resolve the reference's ``model=`` argument to an encoder.

    Strings accepted: ``"hash-ngram"`` (default deterministic backend),
    ``"hash-ngram:<dim>"``, anything else is treated as a
    sentence-transformers model name (requires the lib — import-gated).
    An Encoder instance passes through.
    """
    from .hash_ngram import HashNgramEncoder

    if model is None:
        return HashNgramEncoder()
    if isinstance(model, Encoder):
        return model
    if isinstance(model, str):
        if model == "hash-ngram":
            return HashNgramEncoder()
        if model.startswith("hash-ngram:"):
            return HashNgramEncoder(dim=int(model.split(":", 1)[1]))
        from .api import ApiEncoder, is_gemini_embedding_model, is_openai_embedding_model

        # provider routing predicates ported from the reference
        # (infer.py:924-928, utils.py:17-25)
        if is_openai_embedding_model(model) or is_gemini_embedding_model(model):
            return ApiEncoder(model)
        from .sbert import SBertEncoder

        return SBertEncoder(model)
    raise TypeError(f"cannot resolve encoder from {model!r}")
