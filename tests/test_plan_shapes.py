"""Physical-plan shape regression tests.

The scale properties this engine claims (pushdown, column pruning,
no candidate shuffle, rank-limit pushdown, map-only fusion) are plan
SHAPES — easy to regress silently with a refactor that still returns
correct rows. These tests pin them.

Plan text comes from the pre-execution physical plan (AQE re-plans at
runtime but only ever REMOVES work: coalesces partitions, converts to
broadcast). Assertions are substring-based and deliberately loose about
formatting.
"""

import re

import pytest
from pyspark.sql import functions as F

from linktransformer_spark.oracle_queries import QUERIES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_shuffles(plan: str) -> int:
    """Count real (non-broadcast) exchanges."""
    return len(re.findall(r"Exchange (?:hash|range|RoundRobin|Single)", plan))


def test_q1_filter_pushed_to_parquet(spark, sf_dir):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reaches the scan
    assert "PushedFilters" in plan
    # partial + final aggregation, one shuffle total
    assert plan.count("HashAggregate") == 2
    assert n_shuffles(plan) == 1


def test_merge_1nn_pruned_scan_no_window_no_candidate_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["merge_1nn"](spark, sf_dir))
    # column pruning: the scoring scan reads exactly (id, name)
    assert "struct<c_custkey:bigint,c_name:string>" in plan
    assert "struct<s_suppkey:bigint,s_name:string>" in plan
    # candidates come from a broadcast nested loop (right side broadcast)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # top-1 is an aggregation with a map-side partial — NOT a window
    assert "partial_max(struct" in plan
    assert "Window" not in plan
    # the aggregate's shuffle carries |L| rows: the only non-broadcast
    # exchanges are input fan-outs + that one ENSURE_REQUIREMENTS
    assert plan.count("Exchange hashpartitioning") == 1


def test_merge_knn_window_has_rank_limit_pushdown(spark, sf_dir):
    plan = plan_of(QUERIES["merge_knn_k3"](spark, sf_dir))
    # k>1 keeps the window, but the WindowGroupLimit bounds it
    assert "WindowGroupLimit" in plan
    assert "row_number()" in plan
    # pre-partitioned left satisfies the window's distribution: no
    # exchange may sit between the cross join and the window
    join_pos = plan.index("BroadcastNestedLoopJoin")
    win_pos = plan.index("WindowGroupLimit")
    assert win_pos < join_pos  # window is ABOVE the join in the tree
    between = plan[win_pos:join_pos]
    assert "Exchange" not in between


def test_text_analyze_is_map_only(spark, sf_dir):
    plan = plan_of(QUERIES["text_analyze_documents"](spark, sf_dir))
    assert n_shuffles(plan) == 0  # fuses into the scan
    assert "struct<doc_id:bigint,text:string>" in plan  # pruned read


def test_hash_ngram_encode_is_bounded_shuffles(spark):
    from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder

    df = spark.createDataFrame([(f"name {i}",) for i in range(100)], "s string")
    out = HashNgramEncoder(dim=16).encode(df, "s", "emb")
    plan = plan_of(out)
    # distinct(keys) + bucket-count aggregate + join-back: the embed
    # subplan is a fixed small number of shuffles regardless of |df|
    assert n_shuffles(plan) <= 4
    # densification is codegen conditional sums, not interpreted lambdas
    assert "HashAggregate" in plan


def test_minhash_band_join_is_hash_join_not_nested_loop(spark, sf_dir):
    from linktransformer_spark.operators.dedup import near_dup_pairs_minhash
    from linktransformer_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = near_dup_pairs_minhash(docs, on="text", id_col="doc_id", threshold=0.6)
    plan = plan_of(pairs)
    # candidate generation must be an equi-join on (band, signature) —
    # a nested loop here would be O(n^2) at scale
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_auto_mode_is_size_aware(spark, sf_dir):
    """mode='auto' with an expression-embedding scorer must not keep the
    O(|L|·|R|) BroadcastNestedLoopJoin once the right side outgrows the
    configured size estimate: above the threshold it routes to LSH
    candidates + exact re-rank (no BNLJ, no cartesian), below it the
    exact plan stays. Result gate: LSH output is a subset of the exact
    pairs' quality (same scorer re-ranks) with recall >= 0.8 here, where
    hash-ngram embeddings are non-negative (every pair within radius)."""
    import linktransformer_spark as lt
    from linktransformer_spark.operators.knn_join import (
        AUTO_LSH_CONF, BROADCAST_KNN_CONF,
    )
    from linktransformer_spark.sources.tables import read_table

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    kw = dict(left_on="c_name", right_on="s_name", model="hash-ngram",
              left_id_col="c_custkey", right_id_col="s_suppkey", k=3)

    # below threshold: auto keeps the exact nested-loop plan
    assert "BroadcastNestedLoopJoin" in plan_of(lt.merge_knn(cust, supp, mode="auto", **kw))

    exact = {(r["c_custkey"], r["s_suppkey"])
             for r in lt.merge_knn(cust, supp, mode="exact_cross", **kw).collect()}

    spark.conf.set(AUTO_LSH_CONF, "1")
    spark.conf.set(BROADCAST_KNN_CONF, "1")
    try:
        auto_big = lt.merge_knn(cust, supp, mode="auto", **kw)
        plan = plan_of(auto_big)
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        got = {(r["c_custkey"], r["s_suppkey"]) for r in auto_big.collect()}
        assert len(got & exact) / len(exact) >= 0.8

        # merge_range takes the same route (tight radius from threshold)
        rng = lt.merge_range(cust, supp, left_on="c_name", right_on="s_name",
                             model="hash-ngram", sim_threshold=0.55,
                             left_id_col="c_custkey", right_id_col="s_suppkey")
        rplan = plan_of(rng)
        assert "BroadcastNestedLoopJoin" not in rplan, rplan
    finally:
        spark.conf.unset(AUTO_LSH_CONF)
        spark.conf.unset(BROADCAST_KNN_CONF)


def test_events_scan_prunes_columns(spark, sf_dir):
    plan = plan_of(QUERIES["events_hourly_agg"](spark, sf_dir))
    # the hourly agg needs ts/event_type/value only; payload-ish columns
    # must not be read
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "event_id" not in cols and "user_id" not in cols


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on the partition column of a save_partitioned table
    turns into PartitionFilters — pruned at planning, zero data files
    of other partitions touched."""
    from linktransformer_spark.sources.tables import read_table, save_partitioned

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    save_partitioned(docs, path, "lang")
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = plan_of(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """A join on the bucket key of two co-bucketed tables plans with
    ZERO shuffles — the write-time bucketing satisfies the join's
    distribution requirement."""
    from linktransformer_spark.sources.tables import (
        read_bucketed, read_table, save_bucketed,
    )

    cust = read_table(spark, sf_dir, "customer")
    ordr = read_table(spark, sf_dir, "orders")
    save_bucketed(cust, "t_cust_bkt", "c_custkey", 8,
                  path=str(tmp_path / "c"))
    save_bucketed(ordr.withColumnRenamed("o_custkey", "c_custkey"),
                  "t_ord_bkt", "c_custkey", 8, path=str(tmp_path / "o"))
    joined = read_bucketed(spark, "t_cust_bkt").join(
        read_bucketed(spark, "t_ord_bkt"), "c_custkey"
    )
    plan = plan_of(joined)
    assert n_shuffles(plan) == 0, plan
    assert joined.count() > 0
    spark.sql("DROP TABLE t_cust_bkt")
    spark.sql("DROP TABLE t_ord_bkt")


def test_contamination_gram_join_is_hash_or_sortmerge(spark, sf_dir):
    plan = plan_of(QUERIES["docs_contamination"](spark, sf_dir))
    # candidates come from an equi-join on the gram, never a loop join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    # the gram build is explode + slice/array_join with NO higher-order
    # lambda (transform/filter lambdas are CodegenFallback — interpreted
    # per row; measured 3.5x slower at sf0.1). AQE hides codegen stars
    # pre-execution, so pin the absence of the interpreted form instead.
    gram_lines = [l for l in plan.splitlines() if "array_join" in l]
    assert gram_lines and not any("lambdafunction" in l for l in gram_lines)


def test_dedup_lines_no_global_window_no_loop_join(spark, sf_dir):
    plan = plan_of(QUERIES["docs_dedup_lines"](spark, sf_dir))
    assert "Window" not in plan          # first-occurrence is an aggregate
    assert "partial_min(struct" in plan  # with a map-side partial
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_two_phase_avoids_corpus_global_window(spark, sf_dir):
    plan = plan_of(QUERIES["docs_pack_sequences"](spark, sf_dir))
    # per-bucket windows are hash-partitioned; the only single-partition
    # exchange feeds the tiny #buckets-row totals relation, and the
    # bucket bases come back via broadcast
    assert "Exchange hashpartitioning(_lt_b" in plan
    assert "BroadcastExchange" in plan
    m = re.findall(r"Exchange SinglePartition", plan)
    assert len(m) <= 1


def test_semdedup_pairs_stage_is_cell_cogroup_never_nested_loop(
    spark, sf_dir
):
    """SemDeDup's within-cell pair stage runs as the Arrow self-cogroup
    kernel grouped on cell (bucket_dot_self_pairs — the round-10
    interpreted-fold fix), never a nested-loop pair scan; the only
    nested-loop / broadcast-cross allowed is the n_cells-row centroid
    table. The SALTED path (max_cell_size) keeps the equi-join: its
    triangle salt-cell pair rule is a per-pair predicate the
    group-local kernel cannot see — pinned separately below."""
    import linktransformer_spark as lt

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_of(lt.near_dup_pairs_semdedup(emb, "embedding", "vec_id",
                                              threshold=0.3, n_cells=16))
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan, (
        f"no cell cogroup stage found in:\n{plan[:4000]}"
    )
    # the cogroup's grouping shuffle is on the cell key
    assert "Exchange hashpartitioning(cell" in plan

    # salted form (round-11): the pair stage is the salt-cell cogroup
    # kernel — FlatMapGroupsInPandas grouped on (cell, _salt), never a
    # nested-loop; the triangle pair rule runs inside the kernel
    plan_s = plan_of(lt.near_dup_pairs_semdedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=16,
        max_cell_size=64, hot_cell="salt",
    ))
    assert "CartesianProduct" not in plan_s
    assert "FlatMapGroupsInPandas" in plan_s, (
        f"no salt-cell cogroup stage found in:\n{plan_s[:4000]}"
    )
    assert "Exchange hashpartitioning(cell" in plan_s
    assert "_salt" in plan_s


def test_q6_pushes_all_predicates_no_join(spark, sf_dir):
    plan = plan_of(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    # non-empty pushed-filter list (the full list is truncated in the
    # plan string, so pin its presence + the pruned scan schema instead
    # of individual predicate names)
    assert "PushedFilters: [IsNotNull" in plan
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp" in plan
    )
    assert "Join" not in plan
    assert plan.count("HashAggregate") == 2  # partial + final, one exchange


def test_q18_aggregates_fact_before_join(spark, sf_dir):
    """The lineitem aggregation must sit BELOW the join with orders —
    the shuffle carries one row per order, not one per lineitem."""
    plan = plan_of(QUERIES["q18_large_volume_customers"](spark, sf_dir))
    join_pos = plan.find("Join")
    agg_pos = plan.find("HashAggregate")
    assert join_pos != -1 and agg_pos != -1
    # physical plans print top-down: the aggregate appearing AFTER the
    # join line in the text means it executes BELOW (before) the join
    assert agg_pos > join_pos


def test_bm25_is_jvm_only_with_rank_limit(spark, sf_dir):
    """BM25: one doc-side explode (Generate), WindowGroupLimit bounds
    the top-k window, and nothing leaves the JVM (no Python workers in
    the hot path)."""
    plan = plan_of(QUERIES["search_bm25_documents"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan
    # the doc-side tokenize explode runs ONCE (dtc is lineage-cut and
    # reused for lengths, document frequencies, and the posting join);
    # the query-side slice needs no explode of the corpus
    assert plan.count("Generate") <= 2


def test_dedup_spans_shuffle_key_is_hash_pair(spark, sf_dir):
    """The ExactSubstr global-first groupBy must key on the two 64-bit
    span digests, never the materialized n-token string (~50x the corpus
    text volume through the exchange at default n=50)."""
    plan = plan_of(QUERIES["docs_dedup_spans"](spark, sf_dir))
    assert "_lt_g#" not in plan  # no string span key anywhere
    assert "hashpartitioning(_lt_h1" in plan
    # map-side partial min still defuses boilerplate-span skew
    assert "partial_min(struct(_lt_did" in plan


def test_curation_pipeline_gate_not_recomputed(spark, sf_dir):
    """The quality->PII gated relation is lineage-cut ONCE before its
    consumers: the final plan reads the checkpointed RDD and never
    re-scans documents.parquet (which would re-run the gate per
    consumer)."""
    plan = plan_of(QUERIES["docs_curation_pipeline"](spark, sf_dir))
    assert "documents.parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert n_shuffles(plan) <= 3


def test_dsir_raw_explode_executes_once(spark, sf_dir):
    """dsir_log_weights checkpoints the per-doc bucket counts, so the
    raw-side gram explode appears once even though the counts feed both
    the raw distribution and the per-doc fold. Without the cut the plan
    grows to 6 Generate nodes (raw side duplicated)."""
    plan = plan_of(QUERIES["docs_dsir_weights"](spark, sf_dir))
    # 2 target (unigram+bigram union) + 2 raw, each exactly once
    assert plan.count("Generate") <= 4


@pytest.mark.parametrize("name,max_shuffles", [
    ("semdedup_embeddings", 3),      # assign agg + pair join + CC/keep
    ("docs_lm_perplexity", 4),       # counts, vocab, totals, per-doc NLL
    # 7 hash exchanges (two corpora distributions + per-doc fold) plus
    # the round-13 Arrow gram stage's TWO scale-adaptive input spreads
    # (ensure_parallelism RoundRobin per corpus side — no-ops at scale,
    # where the scans already provide the partitions; the ceiling was
    # not bumped when 83c0f53 added them, an inherited red)
    ("docs_dsir_weights", 9),
    ("docs_quantile_buckets", 2),    # boundary agg + bucket rollup
    ("knn_label_eval", 2),           # top-k window + vote/accuracy aggs
    ("events_props_rollup", 1),
    ("q6_forecast_revenue", 1),
    ("events_asof_nearest", 1),      # ONE exchange, two in-partition sorts
    ("search_bm25_documents", 7),    # tf/dl/df aggs + posting join + topk
    ("docs_gopher_rules", 0),        # strictly map-only
])
def test_new_ops_shuffle_ceilings(spark, sf_dir, name, max_shuffles):
    """Shuffle-count ceilings for the round-4 operators at the fixed
    test SF (broadcasts keep small sides exchange-free; a refactor that
    adds an exchange should have to justify itself here)."""
    plan = plan_of(QUERIES[name](spark, sf_dir))
    got = n_shuffles(plan)
    assert got <= max_shuffles, f"{name}: {got} shuffles > {max_shuffles}"


def test_q4_semi_join_no_duplication(spark, sf_dir):
    """The EXISTS plans as a LeftSemi join (orders rows never
    duplicate), and the order-date filters reach the orders scan."""
    plan = plan_of(QUERIES["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan


def test_q14_broadcasts_part_and_prunes_shipdate(spark, sf_dir):
    """part rides a broadcast hash join; the shipdate range reaches
    the lineitem scan as pushed filters."""
    plan = plan_of(QUERIES["q14_promo_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split(
        "PushedFilters", 1)[1][:400]


def test_bench_merge_knn_auto_routes_non_cross(spark, sf_dir):
    """The bench's production-merge entry (merge_knn_auto) must
    actually exercise the size-routed LSH plan — a regression that
    silently falls back to the O(|L|*|R|) nested loop would make the
    tracked timing meaningless."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import bench_queries

    df = bench_queries(spark)["merge_knn_auto"](sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert df.count() > 0


def test_serving_rerank_joins_are_hash_joins(spark, sf_dir):
    """ann_serving_topk's shortlist re-rank must be id equi-joins
    (broadcast/hash), never a nested loop — full-precision work per
    query is O(retrieve_k) only if the shortlist is the join key."""
    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    df = lt.ann_serving_topk(q, emb, k=5, n_cells=4, n_probe=3, m=16,
                             n_codes=32, retrieve_k=30)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tombstone_antijoin_preserves_partition_pruning(spark, sf_dir, tmp_path):
    """The scale property of index deletes: masking tombstoned rows
    must not cost the pruned scan. The IVF serve with a deletes/
    relation still plans PartitionFilters on the probed cells (I/O
    stays n_probe/n_cells of the corpus), and the tombstone side joins
    as a broadcast/hash anti-join, never a BNLJ."""
    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    lt.delete_from_ivf_index(
        emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"), path
    )
    q = emb.filter(F.col("vec_id") < 50)
    out = lt.ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=2)
    plan = plan_of(out)
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in pf and "INSET" in pf for pf in pfs), plan
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti, plan
    # the tombstone mask must be a hash anti-join (broadcast while the
    # delete set is small, shuffled once it is not) — never a BNLJ
    assert all("HashJoin" in l or "MergeJoin" in l for l in anti), anti


def test_bm25_tombstone_keeps_bucket_pruning(spark, sf_dir, tmp_path):
    """Same property on the BM25 side: the deletes anti-join composes
    AFTER the bucket partition filter, so a tombstoned index still
    reads only the query batch's term buckets."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "bm25")
    lt.save_bm25_index(docs, path)
    lt.delete_from_bm25_index(
        docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"), path
    )
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    out = lt.bm25_topk_indexed(spark, path, queries, k=5)
    plan = plan_of(out)
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in pf and "INSET" in pf for pf in pfs), plan
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti, plan
    assert all("HashJoin" in l or "MergeJoin" in l for l in anti), anti


def test_hybrid_indexed_keeps_both_arms_partition_pruning(
    spark, sf_dir, tmp_path
):
    """The one-call hybrid serve must keep EACH arm's pruned scan in
    the fused plan: the BM25 postings scan planned with a bucket
    partition filter, the PQ cells scan with a probed-cell partition
    filter — and no nested-loop/cartesian anywhere (fusion is a hash
    aggregate over two bounded lists)."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    bm_path, pq_path = str(tmp_path / "bm"), str(tmp_path / "pq")
    lt.save_bm25_index(docs, bm_path)
    lt.save_pq_index(emb, pq_path, n_cells=8, m=8, n_codes=16)
    queries = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        )
        .join(emb.select(F.col("vec_id").alias("q_id"), "embedding"),
              "q_id")
    )
    out = lt.hybrid_topk_indexed(
        spark, bm_path, pq_path, queries, k=10, k_arm=10, n_probe=3,
        retrieve_k=40,
    )
    plan = plan_of(out)
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in pf and ("INSET" in pf or "IN " in pf or "=" in pf)
               for pf in pfs), plan
    assert any("cell" in pf and ("INSET" in pf or "IN " in pf or "=" in pf)
               for pf in pfs), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_quality_gate_filter_single_tokenization(spark, sf_dir):
    # the pushdown fence (textpipe._pushdown_fence) keeps a caller's
    # filter(keep) ABOVE the annotate projection: without it, predicate
    # pushdown substitutes the token-array aliases into the predicate
    # and the tokenizer evaluates once per rule subtree inside the scan
    # task (13 copies in the measured plan, 4.2x slower)
    from linktransformer_spark.operators.textpipe import (
        annotate_quality_filter,
    )
    from linktransformer_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    df = (
        annotate_quality_filter(docs, langs=("en", "de"))
        .filter(F.col("keep"))
        .select("doc_id", "text")
    )
    plan = plan_of(df)
    assert plan.count(r"^\s+|\s+$") <= 2, (
        "tokenizer duplicated in the gate plan — the pushdown fence "
        "is not holding"
    )


def test_spread_probe_estimates_without_rdd_and_memoizes(spark, sf_dir):
    # ensure_parallelism's sizing probe must not touch df.rdd for
    # file-scan inputs (measured: .rdd physically plans the subtree and
    # executes its broadcast builds — seconds of driver work per
    # construction). The leaf-byte estimate decides, and the decision
    # is memoized by analyzed-plan semanticHash.
    from linktransformer_spark.operators import knn_join as KJ
    from linktransformer_spark.sources.tables import read_table

    KJ.clear_spread_memo()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    est = KJ._est_scan_partitions(docs)
    assert est is not None and est >= 1  # file leaf -> estimable

    target = 64  # above any local split count -> must spread
    out = KJ.ensure_parallelism(docs, min_parts=target)
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "RoundRobinPartitioning(64" in plan
    assert (len(KJ._SPREAD_MEMO) == 1
            and next(iter(KJ._SPREAD_MEMO.values())) is True)

    # memo hit: the probe must NOT run again for an identical plan
    calls = []
    orig = KJ._needs_spread
    KJ._needs_spread = lambda df, t: calls.append(1) or orig(df, t)
    try:
        out2 = KJ.ensure_parallelism(
            read_table(spark, sf_dir, "documents").select("doc_id", "text"),
            min_parts=target,
        )
    finally:
        KJ._needs_spread = orig
    assert calls == []  # decision served from the memo
    assert "RoundRobinPartitioning(64" in (
        out2._jdf.queryExecution().sparkPlan().toString()
    )

    # unknown-stats input (checkpoint-backed) falls back to the exact
    # .rdd probe and still spreads a 1-partition frame
    KJ.clear_spread_memo()
    ck = docs.limit(5).coalesce(1).localCheckpoint(eager=True)
    assert KJ._est_scan_partitions(ck) is None
    spread = KJ.ensure_parallelism(ck, min_parts=8)
    assert spread.rdd.getNumPartitions() == 8


def test_refresh_index_path_expires_spread_memo(spark, tmp_path):
    # an index overwrite at the same path preserves plan identity but
    # may change the split count — the writer hook must expire the
    # spread-decision memo (same contract as the LSH width memo)
    from linktransformer_spark.operators import knn_join as KJ
    from linktransformer_spark.operators.tombstones import refresh_index_path

    KJ._SPREAD_MEMO[(0, 0)] = True
    refresh_index_path(spark, str(tmp_path))
    assert not KJ._SPREAD_MEMO
