"""Deterministic sampling invariants (operators/sampling.py)."""

import pytest

import linktransformer_spark as lt


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i} with some words", "en" if i % 3 else "de")
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_hash_sample_reproducible_and_sized(docs):
    a = ids(lt.hash_sample(docs, "text", 0.3))
    b = ids(lt.hash_sample(docs, "text", 0.3))
    assert a == b
    # binomial(200, .3): allow a generous band
    assert 30 <= len(a) <= 90


def test_hash_sample_nested_fractions(docs):
    """A smaller fraction is a SUBSET of a larger one (same salt) —
    the property that makes hash samples stable under resizing."""
    small = ids(lt.hash_sample(docs, "text", 0.1))
    big = ids(lt.hash_sample(docs, "text", 0.4))
    assert small <= big


def test_hash_sample_stable_under_new_rows(docs, spark):
    """Membership of old rows never changes when rows are added."""
    before = ids(lt.hash_sample(docs, "text", 0.3))
    more = docs.unionByName(spark.createDataFrame(
        [(999, "a brand new document appended later", "en")],
        "doc_id long, text string, lang string"))
    after = ids(lt.hash_sample(more, "text", 0.3))
    assert before == after - {999} or before == after


def test_hash_sample_salt_gives_different_sample(docs):
    a = ids(lt.hash_sample(docs, "text", 0.3, salt=0))
    b = ids(lt.hash_sample(docs, "text", 0.3, salt=1))
    assert a != b


def test_hash_sample_bad_fraction(docs):
    with pytest.raises(ValueError, match="fraction"):
        lt.hash_sample(docs, "text", 1.5)


def test_sample_per_group_counts_and_determinism(docs):
    out = lt.sample_per_group(docs, by="lang", n=5, key_cols="text")
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert per == {"en": 5, "de": 5}
    again = {(r["doc_id"], r["lang"])
             for r in lt.sample_per_group(docs, by="lang", n=5, key_cols="text").collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} == again


def test_sample_per_group_small_group(spark):
    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
                               "id long, t string, g string")
    out = lt.sample_per_group(df, by="g", n=5, key_cols="t")
    assert out.count() == 3  # groups smaller than n survive whole


def test_sample_per_group_bad_n(docs):
    with pytest.raises(ValueError, match="n must be"):
        lt.sample_per_group(docs, by="lang", n=0)
