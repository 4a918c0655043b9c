"""API-contract probes (reference parity on edge inputs): empty right
side yields 0 rows (both execution modes), null keys serialize to ''
(/root/reference/src/linktransformer/utils.py:174), reserved-column
collisions and bad parameters raise clean ValueErrors
(/root/reference/src/linktransformer/infer.py:95-98, :747-748)."""

import pytest

import linktransformer_spark as lt


@pytest.fixture(scope="module")
def small(spark):
    left = spark.createDataFrame([("a corp", 1), ("b inc", 2)], ["name", "lid"])
    right = spark.createDataFrame([("a corporation", 10)], ["name", "rid"])
    return left, right


def test_empty_right_side_yields_zero_rows(spark, small):
    left, right = small
    empty = right.filter("rid < 0")
    assert lt.merge(left, empty, on="name", model="hash-ngram").count() == 0
    assert (
        lt.merge(left, empty, on="name", model="hash-ngram", mode="broadcast_knn").count()
        == 0
    )


def test_null_keys_serialize_to_empty_string(spark, small):
    _, right = small
    nulls = spark.createDataFrame([(None, 1), ("x", 2)], ["name", "lid"])
    out = lt.merge(nulls, right, on="name", model="hash-ngram")
    # every left row retained, including the null-key one
    assert out.count() == 2


def test_reserved_column_collision_raises(small):
    left, right = small
    bad = left.withColumnRenamed("lid", "_lt_left_id")
    with pytest.raises(ValueError, match="reserved"):
        lt.merge(bad, right, on="name")


def test_bad_parameters_raise_value_errors(small):
    left, right = small
    with pytest.raises(ValueError, match="k must be >= 1"):
        lt.merge_knn(left, right, on="name", k=0)
    with pytest.raises(ValueError, match="sim_threshold"):
        lt.merge_range(left, right, on="name", sim_threshold=1.5)


def test_convert_to_text_ascii_fold(spark):
    df = spark.createDataFrame(
        [("café résumé",), ("naïve 北京 ok",), ("plain",), (None,)], ["s"]
    )
    from pyspark.sql import functions as F

    out = df.select(lt.convert_to_text("s").alias("t")).collect()
    got = [r["t"] for r in out]
    # mirrors s.encode('ascii','ignore').decode('ascii') (reference
    # preprocess.py:13-14)
    assert got == ["caf rsum", "nave  ok", "plain", None]


def test_operators_run_under_ansi_mode(spark, sf_dir):
    """The engine session sets ansi=false (reference's permissive pandas
    semantics), but operators must also behave when embedded in a
    caller's default Spark 4 session where ANSI is ON — no overflow,
    bad-cast, or division errors in any kernel."""
    from linktransformer_spark.oracle_queries import QUERIES

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for q in ("merge_1nn", "dedup_minhash_pairs", "dedup_simhash_pairs",
                  "text_analyze_documents", "ann_topk_lsh"):
            assert QUERIES[q](spark, sf_dir).count() > 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_merge_type_deprecation_parity(spark, small):
    """Reference API parity (infer.py:67-89): merge_type is accepted
    with a DeprecationWarning, invalid values raise."""
    import warnings

    import pytest as _pytest

    import linktransformer_spark as lt

    l, r = small
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lt.merge(l, r, left_on="name", right_on="name", model="levenshtein",
                 left_id_col="lid", right_id_col="rid", merge_type="1:1")
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    with _pytest.raises(ValueError, match="Invalid merge type"):
        lt.merge(l, r, left_on="name", right_on="name", model="levenshtein",
                 left_id_col="lid", right_id_col="rid", merge_type="nope")
