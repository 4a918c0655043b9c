"""BM25 search (operators/search.py) + Gopher quality rules
(textpipe.gopher_quality_signals). Oracle parity runs in
test_oracle_queries (search_bm25_documents, docs_gopher_rules); these
pin the semantic properties on hand-built corpora.
"""

import pytest

import linktransformer_spark as lt


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "apple banana"),
        (3, "banana cherry date"),
        (4, "date egg fig grape"),
        (5, "unrelated words entirely different"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _q(spark, *pairs):
    return spark.createDataFrame(list(pairs), ["q_id", "q_text"])


def test_bm25_tf_ranks_repeated_term_higher(spark, corpus):
    out = lt.bm25_topk(corpus, _q(spark, (1, "apple")), k=5).collect()
    ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 1 has tf=2 and only slightly longer length -> outranks doc 2
    assert ids[0] == 1 and ids[1] == 2
    assert all(r["n_terms"] == 1 for r in out)
    # non-matching docs never appear
    assert set(ids) == {1, 2}


def test_bm25_idf_favors_rare_terms(spark, corpus):
    # "egg" appears in 1 doc, "banana" in 3: for a two-term query the
    # egg doc should beat a banana-only doc of equal length
    out = lt.bm25_topk(corpus, _q(spark, (1, "banana egg")), k=5).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["doc_id"] == 4  # the egg doc wins on idf


def test_bm25_k_and_rank_contract(spark, corpus):
    out = lt.bm25_topk(corpus, _q(spark, (1, "apple banana cherry date")), k=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == [1, 2]
    assert out.columns == ["q_id", "doc_id", "rank", "score", "n_terms"]
    with pytest.raises(ValueError, match="k must be"):
        lt.bm25_topk(corpus, _q(spark, (1, "apple")), k=0)


def test_bm25_no_match_query_yields_no_rows(spark, corpus):
    out = lt.bm25_topk(corpus, _q(spark, (7, "zzz qqq")), k=3)
    assert out.count() == 0


def test_bm25_query_terms_deduplicated(spark, corpus):
    once = lt.bm25_topk(corpus, _q(spark, (1, "apple")), k=5).collect()
    thrice = lt.bm25_topk(corpus, _q(spark, (1, "apple apple apple")), k=5).collect()
    key = lambda rs: sorted((r["doc_id"], r["rank"], round(r["score"], 9)) for r in rs)
    assert key(once) == key(thrice)


def test_gopher_rules_known_values(spark):
    good = " ".join(
        ["the quick brown fox jumps over the lazy dog with energy"] * 6
    )
    rows = [
        (1, good),                                # passes everything
        (2, "short text"),                        # too few words
        (3, "- a\n- b\n- c"),                     # all bullet lines
        (4, ("#" * 40) + " " + good),             # symbol ratio blown
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lt.gopher_quality_signals(df).collect()}
    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 66
    assert out[1]["n_stop_hits"] >= 2
    assert out[2]["keep"] is False and out[2]["n_words"] == 2
    assert out[3]["bullet_ratio"] == 1.0 and out[3]["keep"] is False
    assert out[4]["symbol_ratio"] > 0.1 and out[4]["keep"] is False


def test_gopher_rules_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lt.gopher_quality_signals(df).collect()}
    for r in got.values():
        assert r["keep"] is False
        assert r["n_words"] == 0
        assert r["mean_word_len"] == 0.0
        assert r["bullet_ratio"] == 0.0


def test_gopher_thresholds_are_tunable(spark):
    df = spark.createDataFrame(
        [(1, "three words here and the that be of with have")],
        ["doc_id", "text"],
    )
    strict = lt.gopher_quality_signals(df).collect()[0]
    loose = lt.gopher_quality_signals(df, min_words=5).collect()[0]
    assert strict["keep"] is False and loose["keep"] is True


def test_bm25_max_df_ratio_prunes_stopwords(spark):
    from pyspark.sql import Row
    bm25_topk = lt.bm25_topk
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"the common doc{i} word{i % 3}") for i in range(10)]
    )
    qs = spark.createDataFrame([Row(q_id=1, q_text="the word0")])
    full = bm25_topk(docs, qs, k=10).collect()
    pruned = bm25_topk(docs, qs, k=10, max_df_ratio=0.5).collect()
    # "the" appears in every doc -> pruned out; only word0 docs remain
    assert {r["doc_id"] for r in pruned} == {0, 3, 6, 9}
    assert all(r["n_terms"] == 1 for r in pruned)
    # unpruned keeps all 10 docs ("the" matches everything)
    assert len(full) == 10
    # scores of surviving docs only lose the stopword's contribution
    fmap = {r["doc_id"]: r["score"] for r in full}
    for r in pruned:
        assert r["score"] <= fmap[r["doc_id"]] + 1e-9
    import pytest as _pt
    with _pt.raises(ValueError):
        bm25_topk(docs, qs, max_df_ratio=0.0)


def test_bm25_index_round_trip_equals_direct(spark, corpus, tmp_path):
    """save_bm25_index + bm25_topk_indexed must return exactly what
    the one-shot bm25_topk returns — the stored impact IS the full
    per-posting contribution."""
    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=4)
    q = _q(spark, (1, "apple banana"), (2, "egg"), (3, "zzz"))
    direct = {
        (r["q_id"], r["doc_id"]): (r["rank"], r["score"], r["n_terms"])
        for r in lt.bm25_topk(corpus, q, k=5).collect()
    }
    indexed = {
        (r["q_id"], r["doc_id"]): (r["rank"], r["score"], r["n_terms"])
        for r in lt.bm25_topk_indexed(spark, path, q, k=5).collect()
    }
    assert direct == indexed and direct


def test_bm25_index_bucket_pruning_reads_subset(spark, corpus, tmp_path):
    """The indexed scan must carry a bucket partition filter — a
    single-term query touches exactly one of the n_buckets
    partitions."""
    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=16)
    q = _q(spark, (1, "apple"))
    out = lt.bm25_topk_indexed(spark, path, q, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan  # partition filter visible in the scan
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {1, 2}


def test_bm25_indexed_max_df_ratio_uses_stored_dfreq(spark, tmp_path):
    rows = [(i, "the common filler words " + ("rare" if i == 1 else "noise"))
            for i in range(1, 11)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=4)
    q = _q(spark, (1, "the rare"))
    pruned = lt.bm25_topk_indexed(
        spark, path, q, k=10, max_df_ratio=0.5).collect()
    # 'the' (df=10/10) pruned; only the 'rare' doc matches, n_terms=1
    assert [(r["doc_id"], r["n_terms"]) for r in pruned] == [(1, 1)]


# ---------------------------------------------------------------------------
# Index meta validation + append (round 7)
# ---------------------------------------------------------------------------
def test_bm25_index_meta_written_and_validated(spark, corpus, tmp_path):
    """save_bm25_index persists its build parameters; retrieval reads
    n_buckets/id_col from meta (never caller-supplied), and a missing
    or version-mismatched meta fails loudly."""
    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=7, k1=1.5, b=0.6)
    meta = spark.read.json(f"{path}/meta").collect()[0].asDict()
    assert meta["n_buckets"] == 7 and meta["id_col"] == "doc_id"
    assert meta["k1"] == 1.5 and meta["b"] == 0.6
    assert meta["n_docs"] == 5 and meta["avgdl"] > 0
    # retrieval works without the caller knowing the bucket count
    q = _q(spark, (1, "apple"))
    assert lt.bm25_topk_indexed(spark, path, q, k=5).count() == 2
    with pytest.raises(ValueError, match="no readable meta"):
        lt.bm25_topk_indexed(spark, str(tmp_path / "nothere"), q)


def test_bm25_append_preserves_base_and_scores_in_frozen_frame(
    spark, corpus, tmp_path
):
    """append_to_bm25_index: base postings byte-stable, appended docs
    scored against the FROZEN stats (n_docs/avgdl/df from build time),
    verified against a from-first-principles Python recompute."""
    import math

    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=4)
    q_base = _q(spark, (1, "apple banana"), (2, "egg"))
    before = {
        (r["q_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in lt.bm25_topk_indexed(spark, path, q_base, k=5).collect()
    }
    new = spark.createDataFrame(
        [(100, "apple kiwi kiwi"), (101, "zebra yak")], ["doc_id", "text"]
    )
    lt.append_to_bm25_index(new, path)
    # base-corpus-only retrieval unchanged for docs that still win:
    after = {
        (r["q_id"], r["doc_id"]): r["score"]
        for r in lt.bm25_topk_indexed(spark, path, q_base, k=10).collect()
    }
    for key, (_, score) in before.items():
        assert abs(after[key] - score) < 1e-12
    # appended doc retrievable; score equals the frozen-frame formula
    got = {
        r["doc_id"]: r["score"]
        for r in lt.bm25_topk_indexed(
            spark, path, _q(spark, (9, "kiwi")), k=5
        ).collect()
    }
    assert set(got) == {100}
    # frozen frame: N=5 base docs, avgdl = 17 tokens / 5 docs, kiwi df=0
    n_docs, avgdl, k1, b = 5, 17 / 5, 1.2, 0.75
    idf = math.log(1.0 + (n_docs - 0 + 0.5) / (0 + 0.5))
    tf, dl = 2, 3
    expected = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(got[100] - expected) < 1e-12


def test_bm25_append_tracks_full_rebuild_within_staleness(spark, tmp_path):
    """Documented staleness contract: build(A)+append(B) retrieval
    stays close to a full rebuild on A+B when |B| << |A| — the drift
    is bounded by the append fraction's effect on N/avgdl/df."""
    base_rows = [
        (i, f"alpha beta gamma doc{i} token{i % 7} filler text here")
        for i in range(40)
    ]
    delta_rows = [(100, "alpha beta gamma delta fresh document"),
                  (101, "token1 token2 fresh appended text")]
    base = spark.createDataFrame(base_rows, ["doc_id", "text"])
    delta = spark.createDataFrame(delta_rows, ["doc_id", "text"])
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    lt.save_bm25_index(base, inc_path, n_buckets=4)
    lt.append_to_bm25_index(delta, inc_path)
    lt.save_bm25_index(base.unionByName(delta), full_path, n_buckets=4)
    # base-vocabulary terms: drift comes only from the 5% shift in
    # N/avgdl/df, so every score tracks the rebuild tightly
    q = _q(spark, (1, "alpha token1"), (2, "gamma token2"))
    inc = {(r["q_id"], r["doc_id"]): r["score"]
           for r in lt.bm25_topk_indexed(spark, inc_path, q, k=60).collect()}
    full = {(r["q_id"], r["doc_id"]): r["score"]
            for r in lt.bm25_topk_indexed(spark, full_path, q, k=60).collect()}
    assert set(inc) == set(full) and inc
    for key, s_full in full.items():
        diff = abs(inc[key] - s_full)
        rel = diff / max(abs(s_full), 1e-9)
        # relative bound for normal terms; near-zero-idf terms (df≈N,
        # e.g. "alpha" in every doc) have idf hypersensitive to N but
        # absolutely negligible — bound those absolutely instead
        assert rel < 0.15 or diff < 0.05, (key, inc[key], s_full)
    # NEW-vocabulary terms ("fresh": df=0 in the frozen frame) are the
    # documented exception: over-weighted until compaction, never lost
    qf = _q(spark, (3, "fresh"))
    inc_f = {r["doc_id"]: r["score"]
             for r in lt.bm25_topk_indexed(spark, inc_path, qf, k=10).collect()}
    full_f = {r["doc_id"]: r["score"]
              for r in lt.bm25_topk_indexed(spark, full_path, qf, k=10).collect()}
    assert set(inc_f) == set(full_f) == {100, 101}
    for d in inc_f:
        assert inc_f[d] > full_f[d]  # frozen df=0 -> idf overshoot


# ---------------------------------------------------------------------------
# rrf_fuse (round 6)
# ---------------------------------------------------------------------------
def _ranked(spark, rows):
    return spark.createDataFrame(rows, ["q_id", "doc_id", "rank"])


def test_rrf_rewards_agreement_between_arms(spark):
    # doc 1 is rank 2 in BOTH arms; docs 2/3 are rank 1 in one arm only
    a = _ranked(spark, [(1, 2, 1), (1, 1, 2)])
    b = _ranked(spark, [(1, 3, 1), (1, 1, 2)])
    out = sorted(lt.rrf_fuse([a, b], k=3).collect(), key=lambda r: r["rank"])
    assert out[0]["doc_id"] == 1 and out[0]["n_lists"] == 2
    # 2/(60+2) > 1/(60+1): consensus beats a single first place
    assert abs(out[0]["rrf_score"] - 2 / 62) < 1e-12
    assert {out[1]["doc_id"], out[2]["doc_id"]} == {2, 3}


def test_rrf_single_list_preserves_order(spark):
    a = _ranked(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    out = sorted(lt.rrf_fuse([a], k=3).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in out] == [10, 11, 12]
    assert all(r["n_lists"] == 1 for r in out)


def test_rrf_validates(spark):
    with pytest.raises(ValueError):
        lt.rrf_fuse([])
    a = _ranked(spark, [(1, 10, 1)])
    with pytest.raises(ValueError):
        lt.rrf_fuse([a], k=0)


# ---------------------------------------------------------------------------
# Compaction: base+delta -> fresh index, bit-exact vs full rebuild
# ---------------------------------------------------------------------------


def _postings_key(spark, path):
    rows = spark.read.parquet(f"{path}/postings").collect()
    return sorted(
        (r["term"], r["doc_id"], r["impact"], r["tf"], r["dl"], r["bucket"])
        for r in rows
    )


def test_bm25_compaction_equals_rebuild(spark, tmp_path):
    """compact(build(A)+append(B)) == build(A+B) BIT-exactly: postings
    (term, id, impact, tf, dl, bucket), dfreq, meta stats, and
    retrieval scores — the append path's documented drift disappears
    at compaction."""
    base_rows = [
        (i, f"alpha beta gamma doc{i} token{i % 7} filler text here")
        for i in range(40)
    ]
    delta_rows = [(100, "alpha beta gamma delta fresh document"),
                  (101, "token1 token2 fresh appended text")]
    base = spark.createDataFrame(base_rows, ["doc_id", "text"])
    delta = spark.createDataFrame(delta_rows, ["doc_id", "text"])
    inc, full, comp = (str(tmp_path / d) for d in ("inc", "full", "comp"))
    lt.save_bm25_index(base, inc, n_buckets=4)
    lt.append_to_bm25_index(delta, inc)
    lt.save_bm25_index(base.unionByName(delta), full, n_buckets=4)

    # pre-compaction: the drift the segment model documents is REAL
    q = _q(spark, (1, "alpha token1"), (2, "gamma token2"))
    inc_scores = {(r["q_id"], r["doc_id"]): r["score"]
                  for r in lt.bm25_topk_indexed(spark, inc, q, k=60).collect()}
    full_scores = {(r["q_id"], r["doc_id"]): r["score"]
                   for r in lt.bm25_topk_indexed(spark, full, q, k=60).collect()}
    assert any(inc_scores[k] != full_scores[k] for k in full_scores)

    lt.compact_bm25_index(spark, inc, comp)
    # postings bit-identical to the rebuild
    assert _postings_key(spark, comp) == _postings_key(spark, full)
    # dfreq identical
    dc = sorted(map(tuple, spark.read.parquet(f"{comp}/dfreq").collect()))
    df_ = sorted(map(tuple, spark.read.parquet(f"{full}/dfreq").collect()))
    assert dc == df_
    # meta stats identical
    mc = spark.read.json(f"{comp}/meta").collect()[0]
    mf = spark.read.json(f"{full}/meta").collect()[0]
    assert (mc["n_docs"], mc["avgdl"]) == (mf["n_docs"], mf["avgdl"])
    # retrieval scores bit-identical (drift gone)
    comp_scores = {(r["q_id"], r["doc_id"]): r["score"]
                   for r in lt.bm25_topk_indexed(spark, comp, q, k=60).collect()}
    assert comp_scores == full_scores


def test_bm25_compaction_rebucket(spark, corpus, tmp_path):
    """n_buckets override re-buckets in the same pass; retrieval from
    the re-bucketed index matches the source exactly."""
    src, comp = str(tmp_path / "src"), str(tmp_path / "re")
    lt.save_bm25_index(corpus, src, n_buckets=2)
    lt.compact_bm25_index(spark, src, comp, n_buckets=8)
    meta = spark.read.json(f"{comp}/meta").collect()[0]
    assert meta["n_buckets"] == 8
    q = _q(spark, (1, "apple banana"), (2, "egg"))
    a = {(r["q_id"], r["doc_id"]): r["score"]
         for r in lt.bm25_topk_indexed(spark, src, q, k=5).collect()}
    b = {(r["q_id"], r["doc_id"]): r["score"]
         for r in lt.bm25_topk_indexed(spark, comp, q, k=5).collect()}
    assert a == b


def test_bm25_compaction_validates(spark, corpus, tmp_path):
    src = str(tmp_path / "v")
    lt.save_bm25_index(corpus, src, n_buckets=2)
    with pytest.raises(ValueError):
        lt.compact_bm25_index(spark, src, str(tmp_path / "o"), n_buckets=0)
    with pytest.raises(ValueError, match="no readable meta"):
        lt.compact_bm25_index(spark, str(tmp_path / "none"), str(tmp_path / "o2"))


def test_bm25_v2_index_serves_but_rejects_append_compact(
    spark, corpus, tmp_path
):
    """Read-only serving never touches the v3 tf/dl columns, so a v2
    index (pre-compaction format) must stay servable; append and
    compaction genuinely need raw tf/dl in every segment and must
    reject v2 loudly instead of poisoning the directory."""
    import glob
    import json
    import os

    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=4)
    v3 = lt.bm25_topk_indexed(spark, path, _q(spark, (1, "apple banana")), k=5)
    v3_rows = sorted(
        (r.q_id, r.doc_id, r.rank, round(r.score, 9)) for r in v3.collect()
    )
    # rewrite meta as version 2 (the v2 layout minus tf/dl, which
    # serving never reads)
    [meta_file] = glob.glob(f"{path}/meta/part-*.json")
    meta = json.loads(open(meta_file).read())
    meta["version"] = 2
    with open(meta_file, "w") as f:
        f.write(json.dumps(meta))
    for crc in glob.glob(f"{path}/meta/.*.crc"):
        os.remove(crc)
    v2 = lt.bm25_topk_indexed(spark, path, _q(spark, (1, "apple banana")), k=5)
    v2_rows = sorted(
        (r.q_id, r.doc_id, r.rank, round(r.score, 9)) for r in v2.collect()
    )
    assert v2_rows == v3_rows
    delta = spark.createDataFrame([(10, "apple date")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="version 2"):
        lt.append_to_bm25_index(delta, path)
    with pytest.raises(ValueError, match="version 2"):
        lt.compact_bm25_index(spark, path, str(tmp_path / "out"))
