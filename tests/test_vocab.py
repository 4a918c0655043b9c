"""Vocabulary/collocation semantics (operators/vocab.py)."""

import math

import pytest
from pyspark.sql import Row

from linktransformer_spark.operators.vocab import (
    collocations,
    token_counts,
    top_vocab,
)


def _docs(spark, texts):
    return spark.createDataFrame([Row(text=t) for t in texts])


def test_token_counts_lowercase_and_min_count(spark):
    df = _docs(spark, ["A a b", "a  B", ""])
    got = {r["token"]: r["n"] for r in token_counts(df).collect()}
    assert got == {"a": 3, "b": 2}
    got2 = {r["token"]: r["n"] for r in token_counts(df, min_count=3).collect()}
    assert got2 == {"a": 3}


def test_top_vocab_rank_and_coverage(spark):
    df = _docs(spark, ["a a a b b c"])
    rows = top_vocab(df, vocab_size=2).orderBy("rank").collect()
    assert [(r["token"], r["n"], r["rank"]) for r in rows] == [("a", 3, 1), ("b", 2, 2)]
    # frac uses ALL 6 occurrences, not just the kept ones
    assert rows[0]["frac"] == 0.5
    assert rows[1]["cum_frac"] == round(5 / 6, 6)
    with pytest.raises(ValueError):
        top_vocab(df, vocab_size=0)


def test_top_vocab_tie_break_by_token(spark):
    df = _docs(spark, ["b a b a"])
    rows = top_vocab(df, vocab_size=1).collect()
    assert rows[0]["token"] == "a"  # equal counts -> lexicographic


def test_collocations_pmi_value(spark):
    # "x y" always adjacent; compute PMI by hand
    df = _docs(spark, ["x y", "x y", "z w"])
    rows = collocations(df, min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n_pair"]) == ("x", "y", 2)
    # totals: 6 tokens, 3 bigram slots; p_xy=2/3, p_x=p_y=2/6
    expect = math.log((2 / 3) / ((2 / 6) * (2 / 6)))
    assert r["pmi"] == round(expect, 6)


def test_collocations_short_docs_ignored(spark):
    df = _docs(spark, ["solo", "", "a b"])
    rows = collocations(df, min_count=1).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("a", "b")}
    with pytest.raises(ValueError):
        collocations(df, min_count=0)


def test_collocations_top_k_orders_by_pmi(spark):
    # "q r" appears twice among rare tokens (high PMI); "a b" twice among
    # very common tokens (low PMI)
    df = _docs(spark, ["q r", "q r", "a b a b", "a a a a b b b b a b"])
    rows = collocations(df, min_count=2, top_k=1).collect()
    assert (rows[0]["w1"], rows[0]["w2"]) == ("q", "r")


def test_top_vocab_plan_is_takeordered(spark, sf_dir):
    """The global top-k must be a TakeOrdered heap, not a full sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = top_vocab(docs, vocab_size=100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# tfidf_top_terms (round 6)
# ---------------------------------------------------------------------------
from linktransformer_spark.operators.vocab import tfidf_top_terms  # noqa: E402


def test_tfidf_surfaces_characteristic_terms(spark):
    rows = [
        (1, "common common zebra zebra zebra"),
        (2, "common yak yak"),
        (3, "common filler filler"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["term"]
           for r in tfidf_top_terms(df, k=1).collect()}
    # the doc-specific rare term beats the corpus-wide 'common'
    assert out[1] == "zebra" and out[2] == "yak" and out[3] == "filler"


def test_tfidf_min_df_drops_hapax(spark):
    rows = [(1, "shared unique1"), (2, "shared unique2")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(df, k=5, min_df=2).collect()
    assert {r["term"] for r in out} == {"shared"}


def test_tfidf_rank_ties_break_lexicographically(spark):
    df = spark.createDataFrame([(1, "b a")], ["doc_id", "text"])
    out = sorted(tfidf_top_terms(df, k=2).collect(), key=lambda r: r["rank"])
    assert [r["term"] for r in out] == ["a", "b"]


def test_tfidf_validates(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tfidf_top_terms(df, k=0)
    with _pytest.raises(ValueError):
        tfidf_top_terms(df, min_df=0)
