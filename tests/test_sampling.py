"""Deterministic sampling invariants (operators/sampling.py)."""

import pytest

from pyspark.sql import functions as F

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


def test_sample_mixture_groups_and_stability(spark):
    import linktransformer_spark as lt
    from pyspark.sql import functions as F

    # varied keys: polynomial content hashes of shared-prefix serial
    # strings correlate (same caveat as any content hash); real corpus
    # text distributes fine
    import hashlib

    rows = [(i, ["web", "wiki", "code"][i % 3],
             hashlib.sha1(str(i).encode()).hexdigest()) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "source", "text"])
    out = lt.sample_mixture(
        df, "source", {"wiki": 1.0, "web": 0.3}, key_cols="text",
        default_fraction=0.0,
    )
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts.get("wiki") == 100          # fraction 1.0 keeps all
    assert "code" not in counts               # default 0.0 drops
    assert 10 < counts.get("web", 0) < 60     # ~30 of 100
    # incremental stability: adding rows never changes old membership
    more = df.unionByName(
        spark.createDataFrame([(1000 + i, "web", f"new {i}") for i in range(50)],
                              ["id", "source", "text"]))
    out2 = lt.sample_mixture(
        more, "source", {"wiki": 1.0, "web": 0.3}, key_cols="text",
        default_fraction=0.0,
    )
    old_ids = {r["id"] for r in out.collect()}
    new_ids = {r["id"] for r in out2.filter(F.col("id") < 1000).collect()}
    assert old_ids == new_ids


def test_sample_mixture_validation(spark):
    import linktransformer_spark as lt
    import pytest

    df = spark.createDataFrame([(1, "a", "t")], ["id", "g", "text"])
    with pytest.raises(ValueError, match="fraction for group"):
        lt.sample_mixture(df, "g", {"a": 1.5})
    with pytest.raises(ValueError, match="default_fraction"):
        lt.sample_mixture(df, "g", {"a": 0.5}, default_fraction=-0.1)


def test_hash_split_disjoint_stable_and_consistent_with_sample(spark, sf_dir):
    """Splits are disjoint+exhaustive for fractions summing to 1, every
    row keeps its split when new rows arrive (incremental stability),
    and the 'train' interval equals hash_sample at the same fraction."""
    import linktransformer_spark as lt
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {"train": 0.7, "val": 0.15, "test": 0.15}
    out = lt.hash_split(docs, "text", fr)
    rows = out.select("doc_id", "split").collect()
    assert all(r["split"] in fr for r in rows)

    # train interval == hash_sample(fraction=0.7) membership
    train_ids = {r["doc_id"] for r in rows if r["split"] == "train"}
    sample_ids = {r["doc_id"] for r in
                  lt.hash_sample(docs, "text", 0.7).select("doc_id").collect()}
    assert train_ids == sample_ids

    # incremental stability: adding rows never moves old rows
    more = docs.withColumn("doc_id", F.col("doc_id") + 500000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" suffix"))
    )
    again = {r["doc_id"]: r["split"]
             for r in lt.hash_split(docs.unionByName(more), "text", fr)
             .select("doc_id", "split").collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["split"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="sum"):
        lt.hash_split(docs, "text", {"a": 0.9, "b": 0.2})


# ---------------------------------------------------------------------------
# temperature_mixture (round 6)
# ---------------------------------------------------------------------------
def test_temperature_mixture_rebalances_toward_sqrt(spark):
    import math
    rows = ([("big", f"b{i}") for i in range(400)]
            + [("small", f"s{i}") for i in range(100)])
    df = spark.createDataFrame(rows, ["src", "text"])
    out = lt.temperature_mixture(df, "src", budget=100, alpha=0.5,
                                 key_cols="text")
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    z = math.sqrt(400) + math.sqrt(100)
    assert counts["big"] == math.floor(100 * math.sqrt(400) / z)   # 66
    assert counts["small"] == math.floor(100 * math.sqrt(100) / z)  # 33
    # natural proportions would be 80/20 — the tail got boosted
    assert counts["small"] > 20


def test_temperature_mixture_caps_at_group_size(spark):
    rows = ([("big", f"b{i}") for i in range(1000)]
            + [("tiny", "t0"), ("tiny", "t1")])
    df = spark.createDataFrame(rows, ["src", "text"])
    out = lt.temperature_mixture(df, "src", budget=900, alpha=0.5,
                                 key_cols="text")
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["tiny"] == 2  # cannot exceed the group, no replacement


def test_temperature_mixture_deterministic_and_stable(spark):
    rows = [(f"s{i % 3}", f"doc {i}") for i in range(300)]
    df = spark.createDataFrame(rows, ["src", "text"])
    a = {tuple(r) for r in lt.temperature_mixture(
        df, "src", budget=150, key_cols="text").collect()}
    b = {tuple(r) for r in lt.temperature_mixture(
        df.repartition(7), "src", budget=150, key_cols="text").collect()}
    assert a == b and len(a) > 0


def test_temperature_mixture_validates(spark):
    df = spark.createDataFrame([("a", "x")], ["src", "text"])
    with pytest.raises(ValueError):
        lt.temperature_mixture(df, "src", budget=0)
    with pytest.raises(ValueError):
        lt.temperature_mixture(df, "src", budget=10, alpha=0.0)
    with pytest.raises(ValueError):
        lt.temperature_mixture(df, "src", budget=10, alpha=1.5)


# ---------------------------------------------------------------------------
# weighted_sample_per_group (round 7)
# ---------------------------------------------------------------------------
def test_weighted_sample_deterministic_and_bounded(spark):
    rows = [(f"g{i % 2}", f"d{i}", float(1 + i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "k", "w"])
    a = sorted((r["g"], r["k"]) for r in
               lt.weighted_sample_per_group(df, "g", "w", k=5,
                                            key_cols="k").collect())
    b = sorted((r["g"], r["k"]) for r in
               lt.weighted_sample_per_group(df.repartition(7), "g", "w", k=5,
                                            key_cols="k").collect())
    assert a == b and len(a) == 10  # 5 per group, layout-independent


def test_weighted_sample_stable_under_appends(spark):
    rows = [("g", f"d{i}", 2.0) for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "k", "w"])
    before = {r["k"] for r in lt.weighted_sample_per_group(
        df, "g", "w", k=30, key_cols="k").collect()}
    # k >= group size keeps everything; scores of old rows are
    # content-only, so an appended row never changes an old row's score
    more = df.unionByName(
        spark.createDataFrame([("g", "zz", 2.0)], ["g", "k", "w"]))
    after_scores = {r["k"] for r in lt.weighted_sample_per_group(
        more, "g", "w", k=31, key_cols="k").collect()}
    assert before <= after_scores


def test_weighted_sample_weight_bias(spark):
    # one group, half the rows carry 50x the weight -> heavy rows must
    # dominate a small sample (deterministic, so assert the exact pull)
    rows = [("g", f"h{i}", 50.0) for i in range(50)] + \
           [("g", f"l{i}", 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "k", "w"])
    got = [r["k"] for r in lt.weighted_sample_per_group(
        df, "g", "w", k=10, key_cols="k").collect()]
    heavy = sum(1 for k in got if k.startswith("h"))
    assert heavy >= 8  # ~Pr[heavy] = 50/51 per draw


def test_weighted_sample_excludes_bad_weights_and_validates(spark):
    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", "b", 0.0), ("g", "c", -1.0),
         ("g", "d", None)],
        "g string, k string, w double",
    )
    out = {r["k"] for r in lt.weighted_sample_per_group(
        df, "g", "w", k=10, key_cols="k").collect()}
    assert out == {"a"}
    with pytest.raises(ValueError):
        lt.weighted_sample_per_group(df, "g", "w", k=0)
