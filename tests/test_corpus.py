"""Corpus-curation ops (operators/corpus.py): line dedup, PII
redaction, contamination pairs."""

import pytest

import linktransformer_spark as lt


def _txt(out, id_col="id"):
    return {r[id_col]: r["text"] for r in out.collect()}


def test_dedup_lines_keeps_first_occurrence(spark):
    rows = [
        (0, "boiler\nalpha\nboiler"),
        (1, "boiler\nbeta"),
        (2, "gamma\nboiler\ngamma"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = _txt(lt.dedup_lines(df, id_col="id"))
    # 'boiler' survives only at its global first occurrence (doc 0 pos 0);
    # within-doc repeats are duplicates too ('gamma' and doc 0's 2nd boiler)
    assert got[0] == "boiler\nalpha"
    assert got[1] == "beta"
    assert got[2] == "gamma"


def test_dedup_lines_blank_lines_and_trim(spark):
    rows = [
        (0, "a\n\n  \nb"),
        (1, "  a  \nc"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = _txt(lt.dedup_lines(df, id_col="id"))
    # blank/whitespace-only lines are structure, always kept; dedup key
    # is the trimmed line, but the kept line keeps its original spacing
    assert got[0] == "a\n\n  \nb"
    assert got[1] == "c"


def test_dedup_lines_fully_removed_doc_and_null(spark):
    rows = [(0, "x"), (1, "x"), (2, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = _txt(lt.dedup_lines(df, id_col="id"))
    assert got[0] == "x"
    assert got[1] == ""  # everything removed -> empty, doc retained
    assert got[2] == ""  # null text treated as empty


def test_dedup_lines_preserves_other_columns(spark):
    df = spark.createDataFrame([(0, "en", "l1\nl2"), (1, "de", "l1")],
                               ["id", "lang", "text"])
    out = lt.dedup_lines(df, id_col="id")
    assert set(out.columns) == {"id", "lang", "text"}
    assert {r["lang"] for r in out.collect()} == {"en", "de"}


def test_redact_pii_all_three_kinds(spark):
    df = spark.createDataFrame(
        [(0, "mail bob.smith+x@sub.example.org then 10.20.30.40 "
             "and call +1 (555) 123-4567 done")],
        ["id", "text"],
    )
    got = _txt(lt.redact_pii(df))
    assert got[0] == "mail <EMAIL> then <IP> and call <PHONE> done"


def test_redact_pii_email_digits_not_phone(spark):
    # the email is replaced first, so its digits never feed the phone rule
    df = spark.createDataFrame([(0, "a 12345678@example.com b")], ["id", "text"])
    assert _txt(lt.redact_pii(df))[0] == "a <EMAIL> b"


def test_redact_pii_plain_text_untouched(spark):
    df = spark.createDataFrame([(0, "no pii here, just words and 42")],
                               ["id", "text"])
    assert _txt(lt.redact_pii(df))[0] == "no pii here, just words and 42"


def test_redact_pii_out_col(spark):
    df = spark.createDataFrame([(0, "x@y.io")], ["id", "text"])
    out = lt.redact_pii(df, out_col="clean")
    r = out.collect()[0]
    assert r["text"] == "x@y.io" and r["clean"] == "<EMAIL>"


def test_contamination_pairs_basic(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words entirely here now")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over nothing else")],
        ["doc_id", "text"],
    )
    out = lt.contamination_pairs(train, bench, n=5).collect()
    got = {(r["train_id"], r["bench_id"]): r["shared_ngrams"] for r in out}
    # shared 5-gram: 'quick brown fox jumps over' only
    assert got == {(1, 100): 1}


def test_contamination_pairs_counts_distinct_grams(spark):
    train = spark.createDataFrame([(1, "a b c d a b c d")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "a b c d a b c d")], ["doc_id", "text"])
    out = lt.contamination_pairs(train, bench, n=4).collect()
    # grams of the repeated text: 'a b c d','b c d a','c d a b','d a b c',
    # 'a b c d' (dup) -> 4 distinct shared
    assert out[0]["shared_ngrams"] == 4


def test_contamination_pairs_short_docs_no_grams(spark):
    train = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "too short")], ["doc_id", "text"])
    assert lt.contamination_pairs(train, bench, n=5).count() == 0


def test_contamination_pairs_gram_freq_cap(spark):
    # 'x y z w v' appears in every doc -> capped out of the join
    train = spark.createDataFrame(
        [(i, "x y z w v") for i in range(1, 5)], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "x y z w v")], ["doc_id", "text"])
    assert lt.contamination_pairs(train, bench, n=5).count() == 4
    assert lt.contamination_pairs(train, bench, n=5,
                                  max_gram_doc_freq=3).count() == 0


def test_corpus_tokenization_case_and_punct(spark):
    train = spark.createDataFrame([(1, "The Quick, BROWN fox-jumps over!")],
                                  ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "the quick brown fox jumps")],
                                  ["doc_id", "text"])
    out = lt.contamination_pairs(train, bench, n=5).collect()
    assert len(out) == 1 and out[0]["shared_ngrams"] == 1


def test_pack_sequences_layout(spark):
    rows = [(1, 100), (2, 200), (3, 300), (4, 50), (5, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = {r["doc_id"]: r for r in
           lt.pack_sequences(df, budget=256, bucket_width=None).collect()}
    # tape offsets: 0, 100, 300, 600, 650
    assert (out[1]["chunk_id"], out[1]["chunk_pos"]) == (0, 0)
    assert (out[2]["chunk_id"], out[2]["chunk_pos"]) == (0, 100)
    assert out[2]["end_chunk_id"] == 1          # 100..299 straddles the cut
    assert (out[3]["chunk_id"], out[3]["chunk_pos"]) == (1, 44)
    assert out[3]["end_chunk_id"] == 2
    assert (out[4]["chunk_id"], out[4]["chunk_pos"]) == (2, 88)
    assert out[5]["end_chunk_id"] == out[5]["chunk_id"]  # empty doc: zero span


def test_pack_sequences_two_phase_equals_single_window(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 400)) for i in range(0, 937, 7)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    single = lt.pack_sequences(df, budget=128, bucket_width=None)
    two = lt.pack_sequences(df, budget=128, bucket_width=50)
    cols = ["doc_id", "n_tokens", "chunk_id", "chunk_pos", "end_chunk_id"]
    assert sorted(map(tuple, single.select(cols).collect())) == \
           sorted(map(tuple, two.select(cols).collect()))


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 10)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError, match="budget"):
        lt.pack_sequences(df, budget=0)


def test_dedup_spans_hand_computed(spark):
    rows = [
        (0, "a b c d e"),
        (1, "x a b c y"),
        (2, "p q r p q r p q r"),
        (3, "A B C z z"),
        (4, "one two"),
        (5, None),
        (6, "  spaced   out   tokens  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in lt.dedup_spans(df, n=3).collect()}
    assert got[0] == "a b c d e"        # global first occurrence survives
    assert got[1] == "x y"              # 'a b c' copy cut out
    assert got[2] == "p q r"            # within-doc repeats collapse
    assert got[3] == "z z"              # case-insensitive match, case kept
    assert got[4] == "one two"          # below span width: untouched
    assert got[5] == ""                 # null text -> ''
    assert got[6] == "spaced out tokens"  # whitespace normalized


def test_dedup_spans_overlapping_coverage_and_idempotence(spark):
    # two overlapping duplicated spans union their coverage; a second
    # pass changes nothing on this input
    rows = [(0, "m n o p q r s"), (1, "m n o p q r s t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lt.dedup_spans(df, n=4)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[0] == "m n o p q r s"
    assert got[1] == "t"                # positions 0..6 all covered
    again = {r["doc_id"]: r["text"] for r in lt.dedup_spans(out, n=4).collect()}
    assert again == got


def test_dedup_spans_rejects_bad_n(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must be"):
        lt.dedup_spans(df, n=1)


def test_materialize_chunks_layout(spark):
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["chunk_id"]: r for r in
           lt.materialize_chunks(df, budget=4, bucket_width=None).collect()}
    # tape: a b c d | e f g h
    assert out[0]["text"] == "a b c d" and out[0]["n_tokens"] == 4
    assert out[1]["text"] == "e f g h" and out[1]["n_tokens"] == 4
    assert len(out) == 2


def test_materialize_chunks_last_partial_and_consistency(spark):
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(7))) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = lt.materialize_chunks(df, budget=16, bucket_width=2).collect()
    total = sum(r["n_tokens"] for r in chunks)
    assert total == 35
    full = [r for r in sorted(chunks, key=lambda r: r["chunk_id"])]
    assert all(r["n_tokens"] == 16 for r in full[:-1])
    assert full[-1]["n_tokens"] == 35 - 16 * (len(full) - 1)
    # chunk boundaries agree with pack_sequences' assignment
    counts = df.select(
        "doc_id",
        __import__("pyspark.sql.functions", fromlist=["F"]).size(
            __import__("pyspark.sql.functions", fromlist=["F"]).split("text", r"\s+")
        ).cast("long").alias("n_tokens"),
    )
    packed = {r["doc_id"]: r for r in
              lt.pack_sequences(counts, budget=16, bucket_width=None).collect()}
    # doc 0 starts chunk 0 offset 0; doc 3 (offset 21) starts in chunk 1
    assert (packed[0]["chunk_id"], packed[0]["chunk_pos"]) == (0, 0)
    assert (packed[3]["chunk_id"], packed[3]["chunk_pos"]) == (1, 5)


def test_dsir_weights_rank_target_like_docs_higher(spark, sf_dir):
    """With the English subset as the DSIR target, English docs must
    score a higher mean importance weight than non-English ones, and
    dsir_select(k) must return exactly the k top-weight docs."""
    import linktransformer_spark as lt
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.filter(F.col("lang") == "en").select("text")  # no id col
    w = lt.dsir_log_weights(docs, target, n_buckets=512)
    j = docs.select("doc_id", "lang").join(w, "doc_id")
    rows = j.collect()
    en = [r["log_weight"] for r in rows if r["lang"] == "en"]
    other = [r["log_weight"] for r in rows if r["lang"] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)

    sel = lt.dsir_select(docs, target, k=10, n_buckets=512)
    got = {r["doc_id"] for r in sel.collect()}
    top = {r["doc_id"] for r in
           sorted(rows, key=lambda r: (-r["log_weight"], r["doc_id"]))[:10]}
    assert got == top and len(got) == 10


# ---------------------------------------------------------------------------
# chunk_documents (round 6)
# ---------------------------------------------------------------------------
def test_chunk_documents_overlap_and_coverage(spark):
    import linktransformer_spark as lt

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        lt.chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # step 2: starts 0,2,4,6,8 -> 5 chunks, last short
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4, 2]
    assert rows[0]["text"] == "t0 t1 t2 t3"
    assert rows[1]["text"] == "t2 t3 t4 t5"      # 2-token overlap
    assert rows[-1]["text"] == "t8 t9"
    # every token covered
    covered = set()
    for r in rows:
        covered |= set(r["text"].split())
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_documents_empty_doc_and_validation(spark):
    import linktransformer_spark as lt
    import pytest as _pytest

    df = spark.createDataFrame([(1, "   "), (2, "a b")], ["doc_id", "text"])
    rows = lt.chunk_documents(df, chunk_tokens=4, overlap=0).collect()
    assert {r["doc_id"] for r in rows} == {2}
    with _pytest.raises(ValueError):
        lt.chunk_documents(df, chunk_tokens=4, overlap=4)
    with _pytest.raises(ValueError):
        lt.chunk_documents(df, chunk_tokens=0)


def test_chunk_documents_no_shuffle(spark, sf_dir):
    import linktransformer_spark as lt

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = lt.chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
