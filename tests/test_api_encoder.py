"""API-provider encoder (encoders/api.py): routing predicates, request
batching, and the injectable-client UDF path (the reference's
monkeypatch seam, tests/api_provider_routing_test.py)."""

import pytest
from pyspark.sql import functions as F

from linktransformer_spark.encoders.api import (
    ApiEncoder,
    char_budget_batches,
    is_gemini_embedding_model,
    is_openai_embedding_model,
    normalize_gemini_model_name,
    resolve_knn_api_model,
)
from linktransformer_spark.encoders.base import resolve_encoder


def test_routing_predicates():
    assert is_openai_embedding_model("text-embedding-3-small")
    assert is_openai_embedding_model("ADA-002")
    assert not is_openai_embedding_model("all-mpnet-base-v2")
    assert is_gemini_embedding_model("gemini-embedding-001")
    assert is_gemini_embedding_model("text-embedding-004")
    assert not is_gemini_embedding_model("text-embedding-3-small")
    assert normalize_gemini_model_name("embedding-001") == "models/embedding-001"
    assert normalize_gemini_model_name("models/x") == "models/x"
    assert isinstance(resolve_encoder("text-embedding-3-small"), ApiEncoder)


def test_resolve_api_model_priority(monkeypatch):
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert resolve_knn_api_model("explicit-model") == "explicit-model"
    assert resolve_knn_api_model("auto", gemini_key="g") == "gemini-embedding-001"
    assert resolve_knn_api_model("auto", openai_key="o") == "text-embedding-3-small"
    with pytest.raises(ValueError, match="knn_api_model"):
        resolve_knn_api_model("auto")


def test_char_budget_batches_reference_semantics():
    # reference loop: a batch closes AT the element that crosses budget
    strings = ["a" * 3000, "b" * 3000, "c" * 100]
    batches = char_budget_batches(strings, budget=5000)
    assert batches == [["a" * 3000], ["b" * 3000, "c" * 100]]
    assert char_budget_batches([], budget=5000) == []
    # everything under budget -> single request
    assert char_budget_batches(["x", "y"], budget=5000) == [["x", "y"]]


class _FakeClient:
    """Deterministic 4-dim embedding: [len, first-byte, 1, 0]."""

    def embed(self, batch, model):
        return [[float(len(s)), float(ord(s[0]) if s else 0), 1.0, 0.0] for s in batch]


def _fake_factory():
    return _FakeClient()


def test_api_encoder_udf_with_injected_client(spark, sf_dir):
    enc = ApiEncoder("text-embedding-3-small", client_factory=_fake_factory)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").limit(10)
    out = enc.encode(docs, "text", "emb")
    rows = out.select("text", "emb").collect()
    assert len(rows) == 10
    for r in rows:
        v = r["emb"]
        assert len(v) == 4
        # normalized
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9
        # direction matches the fake embedding of this row's text
        raw = [float(len(r["text"])), float(ord(r["text"][0])), 1.0, 0.0]
        n = sum(x * x for x in raw) ** 0.5
        for a, b in zip(v, raw):
            assert abs(a - b / n) < 1e-9


def test_api_encoder_rejects_unknown_model():
    with pytest.raises(ValueError, match="not a recognized"):
        ApiEncoder("some-random-model")


def test_hash_ngram_encode_batch_bit_parity(spark):
    """The numpy mirror used by the key-shipping broadcast-kNN path must
    be BIT-identical to the relational encode (exact integer counts,
    same IEEE ops)."""
    import numpy as np
    from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder

    vals = ["", "a", "ab", "abc", "acme corp", "Customer#000000042",
            "x" * 23, "y" * 24, "z" * 25, "hello world, this is longer"]
    enc = HashNgramEncoder()
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    rel = {r.s: np.array(r.emb) for r in enc.encode(df, "s", "emb").collect()}
    loc = enc.encode_batch(vals)
    for i, v in enumerate(vals):
        assert (rel[v] == loc[i]).all(), v


def test_model_store_round_trip(spark, tmp_path):
    """save_model -> load_model rebuilds the identical encoder
    (reference model-dir store, modelling/LinkTransformer.py:79-136 +
    utils.py load_model): hash-ngram round-trips completely in any
    environment; an SBERT handle round-trips its lazy config where the
    torch stack is absent."""
    import linktransformer_spark as lt
    from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder
    from linktransformer_spark.encoders.sbert import SBertEncoder

    # hash-ngram: weightless, config IS the model
    p = str(tmp_path / "hash_model")
    lt.save_model(HashNgramEncoder(dim=32, n=2, salt=7), p)
    back = lt.load_model(p)
    assert isinstance(back, HashNgramEncoder)
    assert (back.dim, back.n, back.salt) == (32, 2, 7)
    df = spark.createDataFrame([("acme corp",), ("bolt ltd",)], ["s"])
    orig = {r.s: r.emb for r in
            HashNgramEncoder(dim=32, n=2, salt=7).encode(df, "s", "emb").collect()}
    got = {r.s: r.emb for r in back.encode(df, "s", "emb").collect()}
    assert got == orig

    # sbert: lazy handle config (weights torch-gated, absent here)
    p2 = str(tmp_path / "sbert_model")
    lt.save_model(lt.LinkTransformer("all-MiniLM-L6-v2", batch_size=64), p2)
    back2 = lt.load_model(p2)
    assert isinstance(back2, SBertEncoder)
    assert back2.model_name == "all-MiniLM-L6-v2"
    assert back2.batch_size == 64

    # plain names still resolve (no dir in the way)
    assert isinstance(lt.load_model("hash-ngram"), HashNgramEncoder)
