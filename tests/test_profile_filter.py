"""profile_table and the document quality gate."""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, None), (3, "a", 30.0)],
        "id long, s string, x double",
    )


def test_profile_exact(small):
    prof = {r["column"]: r.asDict() for r in lt.profile_table(small).collect()}
    assert set(prof) == {"id", "s", "x"}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 3.0
    assert prof["id"]["mean"] == pytest.approx(9 / 4)
    assert prof["id"]["min_str"] is None
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None
    # mean ignores nulls (3 non-null x values)
    assert prof["x"]["mean"] == pytest.approx(60 / 3)


def test_profile_approx_close(small):
    prof = {r["column"]: r.asDict()
            for r in lt.profile_table(small, exact=False).collect()}
    # HLL on 3 distinct values is exact in practice; allow slack anyway
    assert abs(prof["id"]["n_distinct"] - 3) <= 1
    assert prof["x"]["mean"] == pytest.approx(20.0)


def test_profile_unknown_column(small):
    with pytest.raises(ValueError, match="unknown columns"):
        lt.profile_table(small, ["nope"])


def test_profile_timestamp_as_epoch(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01"), (2, "2024-01-01 00:00:03")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [row] = lt.profile_table(df, ["ts"]).collect()
    assert row["min_num"] == 1704067201000000.0
    assert row["max_num"] == 1704067203000000.0


GOOD = ("the quick brown fox jumps over the lazy dog and it is a fine day "
        "for running in the field with all of that wind and sun")


def test_quality_gate_reason_order(spark):
    rows = [
        (1, GOOD),                          # keeps
        (2, "tiny"),                        # too_short fires first
        (3, "x" * 30000),                   # too_long
        (4, "aaaaaaaaaa bbbbbbbbbb cccccccccc ddddddddddd eeeeeeeeeee"),  # few toks? no: 5 toks -> too_few_tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lt.annotate_quality_filter(df).collect()}
    assert out[1]["keep"] is True and out[1]["drop_reason"] is None
    assert out[2]["drop_reason"] == "too_short"
    assert out[3]["drop_reason"] == "too_long"
    assert out[4]["drop_reason"] == "too_few_tokens"


def test_quality_gate_lang(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    out = lt.annotate_quality_filter(df, langs=("de",)).collect()[0]
    assert out["drop_reason"] == "lang" and out["keep"] is False


def test_filter_documents_drops_annotations(spark):
    df = spark.createDataFrame([(1, GOOD), (2, "nope")],
                               "doc_id long, text string")
    out = lt.filter_documents(df)
    assert out.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_repetition_stats_hand_computed(spark):
    import linktransformer_spark as lt
    from pyspark.sql import functions as F

    rows = [
        (1, "a b a b"),
        (2, "x y z x y z x y z"),
        (3, "unique words only here"),
        (4, ""),
        (5, "one"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lt.repetition_stats(df).collect()}
    assert len(out) == 5
    # "a b a b": 4 tokens / 2 distinct; "a b" twice of 3 bigrams; no
    # repeated trigram
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["dup_token_frac"] - 0.5) < 1e-12
    assert abs(out[1]["top_ngram_frac"] - 1.0) < 1e-12  # 2*2/4
    assert out[1]["dup_ngram_frac"] == 0.0
    # "x y z" x3: every trigram position repeated
    assert abs(out[2]["dup_token_frac"] - (1 - 3 / 9)) < 1e-12
    assert abs(out[2]["top_ngram_frac"] - (3 * 2 / 9)) < 1e-12
    assert out[2]["dup_ngram_frac"] == 1.0
    # all-distinct doc: only the trivial top bigram share
    assert out[3]["dup_token_frac"] == 0.0
    assert abs(out[3]["top_ngram_frac"] - 0.5) < 1e-12  # 1*2/4
    assert out[3]["dup_ngram_frac"] == 0.0
    # degenerate docs score 0 everywhere
    for i in (4, 5):
        assert out[i]["dup_token_frac"] == 0.0
        assert out[i]["top_ngram_frac"] == 0.0
        assert out[i]["dup_ngram_frac"] == 0.0
    assert out[4]["n_tokens"] == 0 and out[5]["n_tokens"] == 1


def test_unigram_lm_score_orders_typical_before_rare(spark):
    """A doc made of corpus-frequent words must score lower entropy
    than a doc of corpus-rare words; OOV scoring against a separate
    reference is penalized via smoothing, not a crash."""
    import linktransformer_spark as lt

    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "zyzzyva qwertyuiop xylophone"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lt.unigram_lm_score(df).collect()}
    assert out[0]["avg_neg_logprob"] < out[100]["avg_neg_logprob"]
    assert out[0]["perplexity"] < out[100]["perplexity"]
    assert out[0]["n_tokens"] == 6

    # separate reference: OOV-heavy doc ranks worse than in-vocab doc
    ref = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta")], ["doc_id", "text"]
    )
    probe = spark.createDataFrame(
        [(1, "alpha beta"), (2, "totally unseen words")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in
           lt.unigram_lm_score(probe, reference=ref).collect()}
    assert got[1]["avg_neg_logprob"] < got[2]["avg_neg_logprob"]


def test_unigram_lm_score_drops_empty_docs(spark):
    import linktransformer_spark as lt

    df = spark.createDataFrame(
        [(1, "some words here"), (2, "   "), (3, "")], ["doc_id", "text"]
    )
    ids = {r["doc_id"] for r in lt.unigram_lm_score(df).collect()}
    assert ids == {1}


def test_quantile_buckets_exact_and_approx(spark):
    import linktransformer_spark as lt

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(100, None)], ["id", "v"]
    )
    out = lt.quantile_buckets(df, "v", n_buckets=4)
    rows = {r["id"]: r["bucket"] for r in out.collect()}
    assert rows[100] is None              # null value -> null bucket
    assert rows[0] == 1 and rows[99] == 4
    from collections import Counter
    c = Counter(b for i, b in rows.items() if b is not None)
    assert set(c) == {1, 2, 3, 4}
    assert max(c.values()) - min(c.values()) <= 1  # balanced quartiles

    ap = lt.quantile_buckets(df, "v", n_buckets=4, approx=True)
    ca = Counter(r["bucket"] for r in ap.collect() if r["bucket"] is not None)
    assert set(ca) == {1, 2, 3, 4}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_buckets"):
        lt.quantile_buckets(df, "v", n_buckets=1)


# ---------------------------------------------------------------------------
# winsorize (round 6)
# ---------------------------------------------------------------------------
def test_winsorize_clamps_tails_only(spark):
    import linktransformer_spark as lt
    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               ["id", "v"])
    out = {r["id"]: r["v"] for r in
           lt.winsorize(df, "v", p_low=0.1, p_high=0.9).collect()}
    lo = min(out.values()); hi = max(out.values())
    # interpolated p10/p90 of 1..100
    assert abs(lo - 10.9) < 1e-9 and abs(hi - 90.1) < 1e-9
    # interior values untouched
    assert out[49] == 50.0


def test_winsorize_nulls_pass_and_validation(spark):
    import linktransformer_spark as lt
    import pytest as _pytest
    df = spark.createDataFrame([(1, 1.0), (2, None), (3, 100.0)],
                               "id long, v double")
    rows = {r["id"]: r["vw"] for r in
            lt.winsorize(df, "v", 0.25, 0.75, out_col="vw").collect()}
    assert rows[2] is None
    with _pytest.raises(ValueError):
        lt.winsorize(df, "v", 0.9, 0.1)


# ---------------------------------------------------------------------------
# bigram_lm_score (round 6)
# ---------------------------------------------------------------------------
def test_bigram_lm_prefers_seen_transitions(spark):
    from linktransformer_spark.operators.textpipe import bigram_lm_score
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(10)],
        ["doc_id", "text"])
    test = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "fox the jumps quick")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["perplexity"]
           for r in bigram_lm_score(test, reference=ref).collect()}
    # in-order transitions are all seen in the reference; shuffled
    # order hits unseen bigrams -> higher perplexity
    assert out[100] < out[101]


def test_bigram_lm_short_docs_dropped_and_validation(spark):
    from linktransformer_spark.operators.textpipe import bigram_lm_score
    import pytest as _pytest
    df = spark.createDataFrame(
        [(1, "single"), (2, "two tokens")], ["doc_id", "text"])
    rows = bigram_lm_score(df).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert rows[0]["n_transitions"] == 1
    with _pytest.raises(ValueError):
        bigram_lm_score(df, lam=1.5)
    with _pytest.raises(ValueError):
        bigram_lm_score(df, alpha=0.0)


def test_bigram_lm_interpolation_bounds(spark):
    """lam=0 reduces to the unigram model's transition scoring: the
    perplexity must then be independent of token ORDER."""
    from linktransformer_spark.operators.textpipe import bigram_lm_score
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d c b a")], ["doc_id", "text"])
    out = {r["doc_id"]: round(r["perplexity"], 9)
           for r in bigram_lm_score(df, lam=0.0).collect()}
    assert out[1] == out[2]


# ---------------------------------------------------------------------------
# table_diff (round 6)
# ---------------------------------------------------------------------------
def test_table_diff_classifies_changes(spark):
    import linktransformer_spark as lt

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "s", "v"])
    new = spark.createDataFrame(
        [(2, "b", 99), (3, "c", 30), (4, "d", 40)], ["id", "s", "v"])
    out = {r["id"]: (r["change_type"], sorted(r["changed_cols"]))
           for r in lt.table_diff(old, new, keys="id").collect()}
    assert out[1] == ("removed", [])
    assert out[2] == ("changed", ["v"])
    assert out[4] == ("added", [])
    assert 3 not in out  # unchanged rows omitted


def test_table_diff_null_safe_and_validates(spark):
    import linktransformer_spark as lt
    import pytest as _pytest

    old = spark.createDataFrame([(1, None)], "id long, s string")
    new = spark.createDataFrame([(1, None)], "id long, s string")
    assert lt.table_diff(old, new, keys="id").count() == 0  # null == null
    with _pytest.raises(ValueError, match="not in"):
        lt.table_diff(old, new, keys="id", compare_cols=["zz"])


def test_corpus_datacard_semantics(spark):
    from linktransformer_spark.operators.profile import corpus_datacard

    rows = [
        (0, "the quick brown fox jumps over the lazy dog today", "en", "a"),
        (1, "the quick brown fox jumps over the lazy dog today", "en", "a"),
        (2, "completely different text with many more tokens here", "en", "b"),
        (3, "der schnelle braune fuchs springt heute", "de", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {(r.metric, r.key): r.value for r in corpus_datacard(
        df, "text", lang_col="lang", source_col="source").collect()}
    assert out[("n_docs", "")] == 4.0
    # one exact duplicate of doc 0 -> (4 - 3) / 4
    assert abs(out[("exact_dup_frac", "")] - 0.25) < 1e-9
    assert abs(out[("lang_frac", "en")] - 0.75) < 1e-9
    assert abs(out[("lang_frac", "de")] - 0.25) < 1e-9
    assert abs(out[("source_frac", "a")] - 0.5) < 1e-9
    assert abs(out[("source_frac", "b")] - 0.5) < 1e-9
    assert out[("n_chars_total", "")] == float(sum(len(r[1]) for r in rows))
    assert out[("n_tokens_total", "")] == float(sum(len(r[1].split()) for r in rows))
    assert 0.0 <= out[("quality_mean", "")] <= 1.0

    # no lang/source columns -> only the core metrics
    core = corpus_datacard(df, "text").collect()
    assert {r.metric for r in core} == {
        "n_docs", "n_chars_total", "n_tokens_total", "chars_p50",
        "chars_p90", "chars_mean", "quality_mean", "exact_dup_frac",
    }


def test_corpus_datacard_null_and_empty_text(spark):
    from linktransformer_spark.operators.profile import corpus_datacard

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "real text content here")],
        "doc_id long, text string",
    )
    out = {(r.metric, r.key): r.value for r in corpus_datacard(df, "text").collect()}
    assert out[("n_docs", "")] == 3.0
    # null coalesces to '' -> equals the empty doc -> one dup
    assert abs(out[("exact_dup_frac", "")] - 1 / 3) < 1e-6  # rounded to 6dp
