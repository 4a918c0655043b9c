"""Semantic invariants ported from the reference's test suite
(/root/reference/tests/infer_test.py)."""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


@pytest.fixture(scope="module")
def cust(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


@pytest.fixture(scope="module")
def supp(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/supplier.parquet")


def _merge_kw(extra=None):
    kw = dict(left_on="c_name", right_on="s_name", model="levenshtein",
              left_id_col="c_custkey", right_id_col="s_suppkey")
    kw.update(extra or {})
    return kw


def test_merge_one_match_per_left_row(cust, supp):
    out = lt.merge(cust, supp, **_merge_kw())
    assert out.count() == cust.count()
    assert out.select("c_custkey").distinct().count() == cust.count()


def test_merge_equals_knn_k1(cust, supp):
    # reference invariant: merge ≡ merge_knn(k=1) (tests/infer_test.py:157-170)
    a = lt.merge(cust, supp, **_merge_kw()).select("c_custkey", "s_suppkey", "score")
    b = lt.merge_knn(cust, supp, k=1, **_merge_kw()).select("c_custkey", "s_suppkey", "score")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_knn_k2_doubles_rows(cust, supp):
    # reference invariant: len(knn k=2) == 2*len(k=1) (tests/infer_test.py:167)
    k1 = lt.merge_knn(cust, supp, k=1, **_merge_kw()).count()
    k2 = lt.merge_knn(cust, supp, k=2, **_merge_kw()).count()
    assert k2 == 2 * k1


def test_suffixes_on_overlapping_columns(spark, cust):
    # same frame on both sides -> every column overlaps -> _x/_y suffixes
    # (tests/infer_test.py:25-36 semantics)
    out = lt.merge(cust, cust, on="c_name", model="levenshtein",
                   left_id_col="c_custkey", right_id_col="c_custkey")
    assert "c_name_x" in out.columns and "c_name_y" in out.columns
    assert "score" in out.columns


def test_merge_hash_ngram_self_match(spark, cust):
    # identical strings embed identically, so self is always a candidate
    # with cosine 1 -> every top-1 score must be ~1. (A different row can
    # win only on an exact hash-collision tie, which is legitimate for a
    # lexical hashing encoder — so we assert on score, not id.)
    out = lt.merge(cust, cust, on="c_name", model="hash-ngram",
                   left_id_col="c_custkey", right_id_col="c_custkey")
    mn = out.agg(F.min("score")).first()[0]
    assert mn > 0.999999
    # and a row matched to itself always scores 1
    self_rows = out.filter(F.col("c_custkey_x") == F.col("c_custkey_y"))
    assert self_rows.agg(F.min("score")).first()[0] > 0.999999


def test_merge_range_threshold_and_unmatched_retention(cust, supp):
    # scores ≥ threshold for matched; unmatched left rows retained with
    # null score (tests/infer_test.py:204-251 semantics)
    out = lt.merge_range(cust, supp, sim_threshold=0.8, **_merge_kw())
    matched = out.filter(F.col("score").isNotNull())
    assert matched.filter(F.col("score") < 0.8).count() == 0
    lefts = out.select("c_custkey").distinct().count()
    assert lefts == cust.count()


def test_merge_range_validates_threshold(cust, supp):
    with pytest.raises(ValueError):
        lt.merge_range(cust, supp, sim_threshold=1.5, **_merge_kw())


def test_reserved_column_collision_raises(spark, cust, supp):
    bad = cust.withColumn("score", F.lit(1))
    with pytest.raises(ValueError):
        lt.merge(bad, supp, **_merge_kw())


def test_drop_sim_threshold_filters_after_topk(cust, supp):
    out = lt.merge_knn(cust, supp, k=3, drop_sim_threshold=0.99, **_merge_kw())
    assert out.count() == 0 or out.agg(F.min("score")).first()[0] >= 0.99


def test_blocking_passthrough(spark, cust, supp):
    c = cust.withColumnRenamed("c_nationkey", "nationkey")
    s = supp.withColumnRenamed("s_nationkey", "nationkey")
    out = lt.merge_blocking(c, s, left_on="c_name", right_on="s_name",
                            model="levenshtein", blocking_vars=["nationkey"],
                            left_id_col="c_custkey", right_id_col="s_suppkey")
    # every customer appears exactly once (matched in-block or passed through)
    assert out.filter(F.col("c_custkey").isNotNull()).count() == cust.count()
    # passthrough rows have null score
    supp_nations = {r[0] for r in s.select("nationkey").distinct().collect()}
    unmatched = out.filter(F.col("score").isNull() & F.col("c_custkey").isNotNull())
    for r in unmatched.select("nationkey_x").distinct().collect():
        assert r[0] not in supp_nations


def test_broadcast_knn_matches_exact_cross(cust, supp):
    # same top-1 pairs from the declarative and the broadcast-numpy paths
    kw = dict(left_on="c_name", right_on="s_name", model="hash-ngram",
              left_id_col="c_custkey", right_id_col="s_suppkey")
    a = lt.merge(cust, supp, mode="exact_cross", **kw).select("c_custkey", "s_suppkey")
    b = lt.merge(cust, supp, mode="broadcast_knn", **kw).select("c_custkey", "s_suppkey")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_aggregate_rows_maps_every_row(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    ref = part.select(F.col("p_brand").alias("ref")).distinct()
    out = lt.aggregate_rows(part, ref, left_on="p_type", right_on="ref",
                            model="levenshtein", left_id_col="p_partkey")
    assert out.count() == part.count()


def test_blocking_vars_rejected_in_broadcast_mode(spark, cust, supp):
    """broadcast_knn scores against the whole broadcast right side —
    silently ignoring blocks would return cross-block matches."""
    import pytest as _pytest

    import linktransformer_spark as lt

    with _pytest.raises(ValueError, match="blocking_vars"):
        lt.merge_knn(
            cust, supp, left_on="c_name", right_on="s_name",
            model="hash-ngram", mode="broadcast_knn",
            blocking_vars=["c_nationkey"],
            left_id_col="c_custkey", right_id_col="s_suppkey",
        )


def test_threshold_pushdown_equals_post_filter(spark):
    """drop_sim_threshold is pushed below the top-k (rank-filter
    pushdown): must equal rank-then-filter on data where some top-k
    rows fall below the threshold."""
    import linktransformer_spark as lt
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        [(1, "alpha beta"), (2, "zzz qq yy"), (3, "alpha")],
        "lid long, name string",
    )
    r = spark.createDataFrame(
        [(10, "alpha beta"), (11, "alpha bexa"), (12, "totally other"),
         (13, "unrelated words")],
        "rid long, name string",
    )
    kw = dict(left_on="name", right_on="name", model="levenshtein",
              left_id_col="lid", right_id_col="rid")
    got = {(x.lid, x.rid, round(x.score, 9))
           for x in lt.merge_knn(l, r, k=3, drop_sim_threshold=0.5, **kw).collect()}
    # reference order of operations: rank over ALL candidates, then filter
    allk = lt.merge_knn(l, r, k=3, **kw)
    want = {(x.lid, x.rid, round(x.score, 9))
            for x in allk.filter(F.col("score") >= 0.5).collect()}
    assert got == want
    # sanity: the threshold actually cut something out of some top-3
    assert len(want) < allk.count()


def test_auto_mode_counts_unknown_stats_relations(spark):
    """auto_embedding_mode must not treat an unknown-stats
    (python-RDD-backed) right side as broadcast-small: when Catalyst
    reports the size sentinel, the route falls back to a count-based
    estimate — a 10k-row RDD corpus above the conf threshold routes
    LSH instead of the O(|L|*|R|) nested loop (the measured 24-minute
    cartesian on a 20k x 10k frame, round 13)."""
    from pyspark.sql import Row

    from linktransformer_spark.operators.knn_join import (
        AUTO_LSH_CONF, AUTO_LSH_ROW_BYTES, BROADCAST_KNN_CONF,
        auto_embedding_mode, plan_size_bytes,
    )

    rdd = spark.sparkContext.parallelize(
        [Row(rid=i, rkey=f"row {i}") for i in range(50)]
    )
    df = spark.createDataFrame(rdd)
    assert plan_size_bytes(df) is None  # the sentinel shape under test
    est = 50 * AUTO_LSH_ROW_BYTES
    spark.conf.set(AUTO_LSH_CONF, str(est - 1))
    try:
        assert auto_embedding_mode(df) == "lsh"
        spark.conf.set(AUTO_LSH_CONF, str(est))
        assert auto_embedding_mode(df) == "exact_cross"
        # the ladder: past the nested-loop bound but inside the
        # broadcast bound, an allowed caller gets the EXACT numpy tier
        spark.conf.set(AUTO_LSH_CONF, str(est - 1))
        spark.conf.set(BROADCAST_KNN_CONF, str(est))
        assert auto_embedding_mode(df, allow_broadcast=True) \
            == "broadcast_knn"
        assert auto_embedding_mode(df) == "lsh"  # disallowed -> lsh
        spark.conf.set(BROADCAST_KNN_CONF, str(est - 1))
        assert auto_embedding_mode(df, allow_broadcast=True) == "lsh"
    finally:
        spark.conf.unset(AUTO_LSH_CONF)
        spark.conf.unset(BROADCAST_KNN_CONF)


def test_exact_cross_pair_budget_escalates_to_broadcast(spark, sf_dir):
    """Inside the exact band, the |L| x |R| PAIR budget (which bytes
    cannot see — the measured 24-minute interpreted fold at 360 KB of
    right bytes) escalates auto to the broadcast tier; callers without
    a left frame (merge_range) or without broadcast permission keep
    the declarative plan."""
    from linktransformer_spark.operators.knn_join import (
        EXACT_CROSS_MAX_PAIRS_CONF, auto_embedding_mode,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    assert auto_embedding_mode(
        supp, allow_broadcast=True, left_raw=cust) == "exact_cross"
    spark.conf.set(EXACT_CROSS_MAX_PAIRS_CONF, "1")
    try:
        assert auto_embedding_mode(
            supp, allow_broadcast=True, left_raw=cust) == "broadcast_knn"
        # no left frame / no broadcast permission -> declarative plan
        assert auto_embedding_mode(
            supp, allow_broadcast=True) == "exact_cross"
        assert auto_embedding_mode(
            supp, left_raw=cust) == "exact_cross"
    finally:
        spark.conf.unset(EXACT_CROSS_MAX_PAIRS_CONF)


def test_lsh_conf_knobs_change_bucketing(spark):
    """The session-conf recall knobs (LSH_PLANES_CONF / LSH_EXTRA_CONF)
    reach the lsh candidate stage. Contracts of a GENUINE lsh run
    (round 13 — the count-based stats fallback means these RDD-backed
    frames now actually route lsh; before it they silently took
    exact_cross and this test's old subset assertion was vacuous):
    every emitted pair carries the EXACT re-scored similarity, each
    left row emits at most k pairs, and more probes recover at least
    as many exact-top-k pairs."""
    import linktransformer_spark as lt
    from linktransformer_spark.operators.knn_join import (
        AUTO_LSH_CONF, BROADCAST_KNN_CONF, LSH_EXTRA_CONF, LSH_PLANES_CONF,
        LSH_TABLES_CONF,
    )

    left = spark.createDataFrame(
        [(i, f"item number {i} alpha beta") for i in range(60)],
        ["lid", "name"],
    )
    right = spark.createDataFrame(
        [(100 + i, f"item number {i} alpha beta gamma") for i in range(60)],
        ["rid", "rname"],
    )
    kw = dict(left_on="name", right_on="rname", model="hash-ngram",
              mode="auto", k=2, left_id_col="lid", right_id_col="rid")
    exact_kw = {k: v for k, v in kw.items() if k != "mode"}
    # full scored cross (k=60 keeps every pair) -> exact score of ANY
    # pair, and the exact top-2 pair set for the recall comparison
    all_scores = {(x.lid, x.rid): round(x.score, 9) for x in lt.merge_knn(
        left, right, mode="exact_cross", **{**exact_kw, "k": 60}
    ).collect()}
    exact2 = {(x.lid, x.rid) for x in lt.merge_knn(
        left, right, mode="exact_cross", **exact_kw
    ).select("lid", "rid").collect()}
    spark.conf.set(AUTO_LSH_CONF, "1")
    spark.conf.set(BROADCAST_KNN_CONF, "1")
    # pin ONE table: this test isolates the planes/probes knobs
    spark.conf.set(LSH_TABLES_CONF, "1")
    try:
        spark.conf.set(LSH_PLANES_CONF, "6")
        spark.conf.set(LSH_EXTRA_CONF, "0")
        low = {(x.lid, x.rid): round(x.score, 9) for x in lt.merge_knn(
            left, right, **kw).collect()}
        spark.conf.set(LSH_EXTRA_CONF, "5")
        high = {(x.lid, x.rid): round(x.score, 9) for x in lt.merge_knn(
            left, right, **kw).collect()}
    finally:
        spark.conf.unset(AUTO_LSH_CONF)
        spark.conf.unset(BROADCAST_KNN_CONF)
        spark.conf.unset(LSH_TABLES_CONF)
        spark.conf.unset(LSH_PLANES_CONF)
        spark.conf.unset(LSH_EXTRA_CONF)
    for res in (low, high):
        assert res  # the lsh route produced pairs
        # exact re-score: every emitted pair carries the true score
        for pair, score in res.items():
            assert score == all_scores[pair], pair
        # k-bound per left row
        from collections import Counter

        assert max(Counter(l for l, _ in res).values()) <= 2
    # more probes -> more candidates and no recall loss of exact pairs
    assert len(high) >= len(low)
    assert len(set(high) & exact2) >= len(set(low) & exact2)


def test_merge_lsh_tables_conf_recall_and_default(spark, sf_dir):
    """LSH_TABLES_CONF (the round-10 OR-construction on the merge
    route): tables=2 must recall at least as many exact top-k pairs as
    single-table on a fixed frame, and an unset conf must equal ONE of
    the two widths the round-13 occupancy-skew auto can derive
    (_auto_lsh_tables returns 1 or 2) — the conf pins it exactly."""
    from pyspark.sql import functions as F

    from linktransformer_spark.operators.knn_join import (
        AUTO_LSH_CONF, BROADCAST_KNN_CONF, LSH_TABLES_CONF,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") <= 300
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    kw = dict(left_on="c_name", right_on="s_name", model="hash-ngram",
              k=2, left_id_col="c_custkey", right_id_col="s_suppkey")
    exact = {
        (r.c_custkey, r.s_suppkey)
        for r in lt.merge_knn(cust, supp, mode="exact_cross", **kw)
        .select("c_custkey", "s_suppkey").collect()
    }

    def pairs(tables=None):
        spark.conf.set(AUTO_LSH_CONF, "1")
        spark.conf.set(BROADCAST_KNN_CONF, "1")
        if tables is not None:
            spark.conf.set(LSH_TABLES_CONF, str(tables))
        try:
            return {
                (r.c_custkey, r.s_suppkey)
                for r in lt.merge_knn(cust, supp, mode="auto", **kw)
                .select("c_custkey", "s_suppkey").collect()
            }
        finally:
            spark.conf.unset(AUTO_LSH_CONF)
            spark.conf.unset(BROADCAST_KNN_CONF)
            if tables is not None:
                spark.conf.unset(LSH_TABLES_CONF)

    p_default, p1, p2 = pairs(None), pairs(1), pairs(2)
    assert p_default in (p1, p2)
    assert len(p2 & exact) >= len(p1 & exact)


def test_auto_lsh_tables_skew_rule(spark):
    """_auto_lsh_tables: a corpus that collapses into one bucket (all
    rows share an embedding direction — probe coverage >= 1) keeps ONE
    table; a corpus spread across many buckets derives TWO."""
    import numpy as np
    from pyspark.sql import functions as F

    from linktransformer_spark.operators.knn_join import (
        RIGHT_EMB, _auto_lsh_tables,
    )

    dim, planes = 16, 6
    one = np.zeros(dim); one[0] = 1.0
    collapsed = spark.createDataFrame(
        [(i, [float(x) for x in one]) for i in range(64)],
        schema=f"id long, {RIGHT_EMB} array<double>",
    )
    assert _auto_lsh_tables(collapsed, dim, planes, n_extra=3) == 1

    rng = np.random.default_rng(7)
    vs = rng.normal(size=(256, dim))
    vs /= np.linalg.norm(vs, axis=1, keepdims=True)
    spread = spark.createDataFrame(
        [(i, [float(x) for x in vs[i]]) for i in range(len(vs))],
        schema=f"id long, {RIGHT_EMB} array<double>",
    )
    assert _auto_lsh_tables(spread, dim, planes, n_extra=3) == 2


def test_lev_broadcast_kernel_bit_equals_declarative(spark, sf_dir):
    """The string scorer's broadcast tier (_broadcast_lev_knn: in-kernel
    DuckDB/numpy levenshtein + top-k) must return BIT-identical rows to
    the declarative exact_cross plan — scores included — on the TPC-H
    shape, for k=1 and k=3+threshold, and on unicode keys that force
    the code-point DP fallback."""
    from linktransformer_spark.sources.tables import read_table

    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    for k, thr in ((1, None), (3, 0.4)):
        a = lt.merge_knn(cust, supp, left_on="c_name", right_on="s_name",
                         model="levenshtein", k=k, drop_sim_threshold=thr,
                         mode="exact_cross", left_id_col="c_custkey",
                         right_id_col="s_suppkey")
        b = lt.merge_knn(cust, supp, left_on="c_name", right_on="s_name",
                         model="levenshtein", k=k, drop_sim_threshold=thr,
                         mode="broadcast_knn", left_id_col="c_custkey",
                         right_id_col="s_suppkey")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # unicode (non-ASCII) keys: DuckDB's byte-counting levenshtein must
    # NOT be used — the code-point DP fallback keeps Spark parity
    rows_l = [(1, "héllo wörld"), (2, "日本語テキスト"), (3, ""),
              (4, "plain ascii"), (5, "a\U0001F600b")]
    rows_r = [(10, "hello world"), (11, "日本語テキスト!"), (12, "x"),
              (13, "a\U0001F600bc"), (14, None)]
    dl = spark.createDataFrame(rows_l, "lid long, name string")
    dr = spark.createDataFrame(rows_r, "rid long, rname string")
    a = lt.merge_knn(dl, dr, left_on="name", right_on="rname",
                     model="levenshtein", k=2, mode="exact_cross",
                     left_id_col="lid", right_id_col="rid")
    b = lt.merge_knn(dl, dr, left_on="name", right_on="rname",
                     model="levenshtein", k=2, mode="broadcast_knn",
                     left_id_col="lid", right_id_col="rid")
    assert sorted(map(tuple, a.collect()), key=str) == sorted(
        map(tuple, b.collect()), key=str)


def test_auto_lev_routes_kernel_past_pair_budget(spark, sf_dir):
    """mode='auto' with the string scorer keeps the declarative BNLJ
    plan below the pair budget and swaps to the in-kernel broadcast
    tier (MapInPandas, no BNLJ, no candidate window/aggregate) above
    it — same rows either way."""
    from linktransformer_spark.operators.knn_join import (
        LEV_BROADCAST_MIN_PAIRS_CONF,
    )
    from linktransformer_spark.sources.tables import read_table

    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    kw = dict(left_on="c_name", right_on="s_name", model="levenshtein",
              left_id_col="c_custkey", right_id_col="s_suppkey")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    small = lt.merge(cust, supp, mode="auto", **kw)
    assert "BroadcastNestedLoopJoin" in plan_of(small)
    spark.conf.set(LEV_BROADCAST_MIN_PAIRS_CONF, "1")
    try:
        big = lt.merge(cust, supp, mode="auto", **kw)
        plan = plan_of(big)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "MapInPandas" in plan
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, big.collect()))
    finally:
        spark.conf.unset(LEV_BROADCAST_MIN_PAIRS_CONF)


def test_lsh_dim_probe_and_arrow_gate(spark, monkeypatch):
    """Round-14 advisories: (1) an encoder declaring the placeholder
    dim=0 must have dim PROBED from the data, not run 0-dim
    hyperplanes (every row would land in one bucket); (2) an encoder
    with encode_batch but WITHOUT the bit-identical expression mirror
    (expression_based=False, e.g. SBert) must not take the keys-kernel
    route — it would re-encode per bucket occurrence and its batch
    float drift breaks the cross-table pair dedup."""
    from pyspark.sql import functions as F

    from linktransformer_spark.operators import ann
    from linktransformer_spark.operators import knn_join as KJ

    class _Enc:
        dim = 0  # the Encoder base-class placeholder
        expression_based = False

        def encode_batch(self, keys):  # pragma: no cover - must not run
            raise AssertionError("encode_batch route must not be taken")

    class _Scorer:
        needs_embeddings = True
        score_is_dot = True
        encoder = _Enc()

        @staticmethod
        def score():
            from linktransformer_spark.functions import similarity as S
            return S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))

    seen_dims = []
    orig_bucket = ann.hyperplane_bucket

    def spy_bucket(vec, dim, n_planes=12, plane_offset=0):
        seen_dims.append(dim)
        return orig_bucket(vec, dim, n_planes, plane_offset)

    monkeypatch.setattr(ann, "hyperplane_bucket", spy_bucket)
    monkeypatch.setattr(
        ann, "hyperplane_bucket_keys_arrow",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("keys-kernel route must be gated off")),
    )

    rows = [(i, f"k{i}", [float(i % 3), 1.0, float(i % 5), 0.5])
            for i in range(40)]
    left = spark.createDataFrame(rows, "id long, key string, v array<double>") \
        .select(F.col("id").alias(KJ.LEFT_ID), F.col("key").alias(KJ.LEFT_KEY),
                F.col("v").alias(KJ.LEFT_EMB))
    right = spark.createDataFrame(rows, "id long, key string, v array<double>") \
        .select(F.col("id").alias(KJ.RIGHT_ID), F.col("key").alias(KJ.RIGHT_KEY),
                F.col("v").alias(KJ.RIGHT_EMB))
    out = KJ._lsh_candidates(left, right, _Scorer(), k=1, n_planes=3)
    assert out.count() > 0
    # every bucketing call saw the PROBED vector dimension, never 0
    assert seen_dims and all(d == 4 for d in seen_dims), seen_dims


def test_refresh_index_path_expires_auto_tables_memo(spark, tmp_path):
    """Any index mutation (every writer calls refresh_index_path)
    must expire the in-process LSH table-width memo — its keys are
    plan identities, which an overwrite at the same path preserves."""
    from linktransformer_spark.operators import knn_join as KJ
    from linktransformer_spark.operators.tombstones import refresh_index_path

    KJ._AUTO_TABLES_MEMO[("sentinel",)] = 2
    refresh_index_path(spark, str(tmp_path))
    assert not KJ._AUTO_TABLES_MEMO
