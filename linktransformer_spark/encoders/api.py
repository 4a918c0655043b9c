"""API-provider embeddings (OpenAI / Gemini) — Arrow-batched pandas UDF.

Parity surface (/root/reference/src/linktransformer/utils.py:179-248,
infer.py:924-947):
- provider routing predicates: ``is_openai_embedding_model`` ("text-
  embedding" / "ada-002" substrings, infer.py:924-928),
  ``is_gemini_embedding_model`` ("gemini" / "text-embedding-004" /
  "embedding-001", utils.py:17-25), gemini name normalization to
  "models/..." (utils.py:28-31);
- auto model resolution by available keys (gemini first, then openai;
  infer.py:931-947);
- OpenAI char-budget batching: requests are split so each carries
  ~<=5000 chars — the split-index construction replicates the
  reference's loop exactly (utils.py:215-229), quirks included (the
  element that crosses the budget starts the next batch);
- Gemini embeds one string per request (utils.py:34-65).

Execution: scalar-iterator pandas UDF; the HTTP client is created once
per Python worker by an injectable ``client_factory`` — the seam the
tests use (the reference tests monkeypatch the same boundary,
tests/merge_knn_llm_test.py:259-293). Without a factory the real SDKs
are imported lazily and missing-key/missing-lib errors carry guidance.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from .base import Encoder

CHAR_BUDGET = 5000


def is_openai_embedding_model(model: Any) -> bool:
    if not isinstance(model, str):
        return False
    m = model.lower()
    return "text-embedding" in m or "ada-002" in m


def is_gemini_embedding_model(model: Any) -> bool:
    if not isinstance(model, str):
        return False
    m = model.lower()
    return "gemini" in m or "text-embedding-004" in m or "embedding-001" in m


def normalize_gemini_model_name(model: str) -> str:
    return model if model.startswith("models/") else f"models/{model}"


def resolve_knn_api_model(
    knn_api_model: str | None,
    openai_key: str | None = None,
    gemini_key: str | None = None,
) -> str:
    """'auto'/None -> pick by available keys, gemini first
    (infer.py:931-947)."""
    if knn_api_model is not None and knn_api_model != "auto":
        return knn_api_model
    if gemini_key or os.getenv("GEMINI_API_KEY"):
        return "gemini-embedding-001"
    if openai_key or os.getenv("OPENAI_API_KEY"):
        return "text-embedding-3-small"
    raise ValueError(
        "Could not resolve `knn_api_model`: provide `openai_key`/OPENAI_API_KEY "
        "or `gemini_key`/GEMINI_API_KEY, or pass an explicit `knn_api_model`."
    )


def char_budget_batches(strings: list[str], budget: int = CHAR_BUDGET) -> list[list[str]]:
    """Reference-exact request batching (utils.py:215-229)."""
    split_indices = [0]
    total = 0
    for i, s in enumerate(strings):
        total += len(s)
        if total > budget:
            split_indices.append(i)
            total = 0
    split_indices.append(len(strings))
    return [
        strings[split_indices[i] : split_indices[i + 1]]
        for i in range(len(split_indices) - 1)
        if strings[split_indices[i] : split_indices[i + 1]]
    ]


def parse_openai_embeddings_response(resp) -> list[list[float]]:
    """Extract vectors from an OpenAI ``POST /v1/embeddings`` response
    — the SDK's pydantic object or the raw JSON dict (shape per the
    public API reference: ``{"object": "list", "data": [{"object":
    "embedding", "index": i, "embedding": [...]}], "model", "usage"}``).
    Vectors return in ``index`` order: the API documents input-order
    responses, but ``index`` is the authoritative alignment, so a
    reordered ``data`` array still maps each vector to its input row.
    Exercised against recorded response fixtures in
    tests/test_provider_replay.py (no keys, no network)."""
    data = resp["data"] if isinstance(resp, dict) else resp.data
    def _idx(d):
        return d["index"] if isinstance(d, dict) else d.index
    def _vec(d):
        return d["embedding"] if isinstance(d, dict) else d.embedding
    return [_vec(d) for d in sorted(data, key=_idx)]


def parse_gemini_embed_content_response(r) -> list[float]:
    """Extract the vector from a Gemini ``embed_content`` response —
    the SDK returns ``{"embedding": [...]}`` (dict) in the
    google-generativeai package; object-shaped responses expose
    ``.embedding``. Replay-tested in tests/test_provider_replay.py."""
    return r["embedding"] if isinstance(r, dict) else r.embedding


class ApiEncoder(Encoder):
    """``client_factory() -> client`` where client has
    ``embed(batch: list[str], model: str) -> list[list[float]]``.
    Defaults to the real OpenAI / Gemini SDK (lazy import)."""

    expression_based = False

    def __init__(
        self,
        model: str,
        api_key: str | None = None,
        client_factory: Callable[[], Any] | None = None,
        char_budget: int = CHAR_BUDGET,
    ):
        self.model = model
        self.api_key = api_key
        self.client_factory = client_factory
        self.char_budget = char_budget
        if is_gemini_embedding_model(model):
            self.provider = "gemini"
        elif is_openai_embedding_model(model):
            self.provider = "openai"
        else:
            raise ValueError(
                f"{model!r} is not a recognized OpenAI/Gemini embedding model"
            )

    def _default_factory(self):
        provider, model, key = self.provider, self.model, self.api_key
        if provider == "openai":
            def make():
                try:
                    from openai import OpenAI  # import-gated
                except ImportError as e:  # pragma: no cover
                    raise ImportError(
                        "ApiEncoder(openai) needs the `openai` package; pass a "
                        "client_factory or use model='hash-ngram'."
                    ) from e
                cli = OpenAI(api_key=key or os.getenv("OPENAI_API_KEY"))

                class W:
                    def embed(self, batch, model):
                        resp = cli.embeddings.create(input=batch, model=model)
                        return parse_openai_embeddings_response(resp)

                return W()

            return make

        def make():  # pragma: no cover - needs the sdk + network
            try:
                import google.generativeai as genai
            except ImportError as e:
                raise ImportError(
                    "ApiEncoder(gemini) needs `google-generativeai`; pass a "
                    "client_factory or use model='hash-ngram'."
                ) from e
            genai.configure(api_key=key or os.getenv("GEMINI_API_KEY"))

            class W:
                def embed(self, batch, model):
                    out = []
                    for text in batch:  # one request per string (utils.py:49-59)
                        r = genai.embed_content(
                            model=normalize_gemini_model_name(model),
                            content=text, task_type="retrieval_document",
                        )
                        out.append(parse_gemini_embed_content_response(r))
                    return out

            return W()

        return make

    def encode(self, df: DataFrame, text_col: str, out_col: str) -> DataFrame:
        factory = self.client_factory or self._default_factory()
        model, provider, budget = self.model, self.provider, self.char_budget
        cache: dict = {}

        @F.pandas_udf(ArrayType(DoubleType()))
        def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            import numpy as np

            if "c" not in cache:  # per-worker client singleton
                cache["c"] = factory()
            client = cache["c"]
            for series in it:
                strings = series.fillna("").tolist()
                vecs: list[list[float]] = []
                batches = (
                    char_budget_batches(strings, budget)
                    if provider == "openai"
                    else [strings]
                )
                for b in batches:
                    vecs.extend(client.embed(b, model))
                arr = np.asarray(vecs, dtype="float64")
                norm = np.maximum(np.linalg.norm(arr, axis=1, keepdims=True), 1e-12)
                arr = arr / norm
                yield pd.Series([v.tolist() for v in arr])

        return df.withColumn(out_col, _embed(F.col(text_col)))


def infer_embeddings_with_gemini(
    strings: list, model: str, api_key: str, return_numpy: bool = True
):
    """Driver-side Gemini embedding of a string list (reference
    utils.py:34-65: one request per string, RETRIEVAL_DOCUMENT task).
    For DataFrames use ApiEncoder — the distributed Arrow-batched path.
    Requires `google-generativeai` (gated)."""
    try:
        import google.generativeai as genai
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "Gemini embeddings require `google-generativeai`. "
            "Install it with: pip install google-generativeai"
        ) from exc
    import numpy as np

    genai.configure(api_key=api_key)
    name = normalize_gemini_model_name(model)
    vectors = []
    for text in strings:
        r = genai.embed_content(
            model=name, content=text, task_type="RETRIEVAL_DOCUMENT"
        )
        vectors.append(r["embedding"])
    arr = np.asarray(vectors, dtype="float32")
    return arr if return_numpy else arr.tolist()
