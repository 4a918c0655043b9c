"""Public-surface parity helpers added for round-2 coverage:
clusters_from_edges, cluster (vector-column dispatcher),
apply_in_chunks, openai_transform (contract, fake client),
cosine_similarity_corresponding_pairs, and the gated provider helpers'
error behavior."""

import json

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


def test_clusters_from_edges_min_label_sorted(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    rows = lt.clusters_from_edges(edges).orderBy("cluster").collect()
    # self-loop (20,20) is filtered by connected_components; cluster id
    # = min node id of the component (scale-safe deterministic label)
    assert [(r.cluster, r.nodes) for r in rows] == [(1, [1, 2, 3]), (10, [10, 11])]


def test_cluster_vector_dispatcher_matches_cluster_rows(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "id long, embedding array<double>",
    )
    out = lt.cluster(df, vector_col="embedding", id_col="id",
                     cluster_type="SLINK", cluster_params={"threshold": 0.1})
    got = {r.id: r.cluster for r in out.collect()}
    assert got[1] == got[2] != got[3]


def test_cluster_requires_vector_and_id(spark):
    df = spark.createDataFrame([(1, [1.0])], "id long, embedding array<double>")
    with pytest.raises(ValueError):
        lt.cluster(df, vector_col="nope", id_col="id")
    with pytest.raises(ValueError):
        lt.cluster(df, vector_col="embedding", id_col=None)


def test_apply_in_chunks_contract():
    calls = []

    def fn(batch, kw):
        calls.append(len(batch))
        return [s.upper() for s in batch]

    out = lt.apply_in_chunks([f"x{i}" for i in range(7)], fn, chunk_size=3)
    assert out == [f"X{i}" for i in range(7)]
    assert calls == [3, 3, 1]

    def bad(batch, kw):
        return batch[:-1]

    with pytest.raises(ValueError, match="wrong batch size"):
        lt.apply_in_chunks(["a", "b"], bad, chunk_size=2)


class _FakeCompletions:
    """Echo client: returns the JSON array uppercased; mirrors the seam
    the reference monkeypatches (tests/merge_knn_llm_test.py:259-293)."""

    class _Choices:
        def __init__(self, content):
            self.message = type("M", (), {"content": content})()

    def create(self, model, messages, **kw):
        texts = json.loads(messages[1]["content"])
        content = json.dumps([t.upper() for t in texts])
        return type("R", (), {"choices": [self._Choices(content)]})()


class _FakeClient:
    def __init__(self):
        self.chat = type("C", (), {"completions": _FakeCompletions()})()


def test_openai_transform_contract_with_fake_client():
    out = lt.openai_transform(
        ["a", "b"],
        {"client": _FakeClient(), "model": "m", "prompt": "upper-case these"},
    )
    assert out == ["A", "B"]


def test_cosine_alias(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 0.0], [2.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r[0] for r in df.select(
        F.round(lt.cosine_similarity_corresponding_pairs(F.col("a"), F.col("b")), 6)
    ).collect()]
    assert vals == [0.0, 1.0]


def test_gated_helpers_raise_informatively():
    with pytest.raises(ImportError, match="transformers"):
        lt.load_clf("/nonexistent")
    with pytest.raises(ImportError, match="transformers"):
        lt.tokenize_data_for_inference(["x"], "text", "some-model")
