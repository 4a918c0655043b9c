#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Headliners cover each engine subsystem at its scale-relevant shape:
relational agg/join/window, the semantic-join family (string scorer +
hash-ngram embedding via both declarative and broadcast-numpy paths),
the dedup pipelines, ANN, and the text-analysis pass.

Methodology: steady-state, best-of-N. Each query executes one untimed
warm run, then N timed runs of which the MINIMUM is reported — N=2 for
most queries, N=3 for the expensive set (the merge family, both judge
variants, dedup_minhash_docs, ann_lsh_topk, docs_curation_pipeline —
the `extra_runs` set below is authoritative), whose run-to-run
variance (co-tenant load spikes inflate a single run up to ~7x) would
otherwise dominate round-over-round comparisons. The warm run forks the Python worker pool,
JIT-compiles the JVM hot loops at real data volume (a 1/100-scale
warm-up provably under-compiles: the C2 tier needs full-volume
invocation counts), and fills the codegen class cache. A long-running
cluster is always in that state; a fresh local[32] JVM otherwise
charges one-time Janino+JIT work (~2x) to whichever query runs first —
session cost, not query cost. min-of-2 suppresses one-off interference
(GC pause, OS scheduling) — measured swings up to 2.5x on identical
plans. A driver-JVM System.gc() runs before each timed run so no query
is billed for the garbage of its predecessors. Every timed run
re-executes the whole plan with cold DATA caches: no df.cache()/
persist anywhere, every scan re-reads parquet, every shuffle/
broadcast/sort re-runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import linktransformer_spark as lt  # noqa: E402
from linktransformer_spark.oracle_queries import QUERIES  # noqa: E402
from linktransformer_spark.sources.tables import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def bench_queries(spark):
    """name -> callable(sf_dir) returning a DataFrame to be consumed."""

    def from_oracle(name):
        return lambda sf_dir: QUERIES[name](spark, sf_dir)

    def merge_hash_broadcast(sf_dir):
        cust = read_table(spark, sf_dir, "customer")
        supp = read_table(spark, sf_dir, "supplier")
        return lt.merge(
            cust, supp, left_on="c_name", right_on="s_name",
            model="hash-ngram", mode="broadcast_knn",
            left_id_col="c_custkey", right_id_col="s_suppkey",
        )

    def dedup_minhash_docs(sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        return lt.dedup_minhash(
            docs.select("doc_id", "text"), on="text", id_col="doc_id",
            threshold=0.6, num_hashes=24, bands=8, shingle=3,
        )

    def ann_broadcast(sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        return lt.ann_topk(emb, emb, k=10, mode="broadcast_knn")

    def ann_ivf(sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        return lt.ivf_topk(emb, emb, k=10, n_probe=4)

    def ann_lsh(sf_dir):
        # full corpus x corpus (the oracle variant restricts queries to
        # 50 rows — too small to measure the bucket join)
        emb = read_table(spark, sf_dir, "embeddings")
        return lt.ann_topk(emb, emb, k=10, mode="lsh_hyperplane",
                           n_planes=6, dim=64)

    def merge_k_judge_batched(sf_dir):
        # same retrieval + judge as merge_k_judge_mock but shipping 32
        # candidate pairs per LLM request (the judge_batch_size
        # contract): identical rows, 32x fewer judge calls. NOTE the
        # mock judge has zero network latency, so this bench can only
        # show the batching contract's own overhead (JSON array
        # build/parse), not the per-request latency it amortizes — with
        # a real provider each saved round-trip is 100ms-1s, which is
        # where the 32x call reduction pays.
        cust = read_table(spark, sf_dir, "customer")
        supp = read_table(spark, sf_dir, "supplier")
        return lt.merge_k_judge(
            cust, supp, left_on="c_name", right_on="s_name",
            model="levenshtein", k=2, judge=lt.MockJudgeSpec(threshold=0.5),
            confidence_threshold=0.3, judge_batch_size=32,
            left_id_col="c_custkey", right_id_col="s_suppkey",
        )

    _idx_path = {}

    def dedup_against_index(sf_dir):
        # the production ingest shape: the seen corpus's minhash index
        # is built ONCE (here at first call — setup cost, not query
        # cost; a real pipeline pays it at ingest) and each batch joins
        # against the files. Compare with dedup_against_incr, which
        # rebuilds the seen side's signatures from text every run.
        import tempfile

        docs = read_table(spark, sf_dir, "documents")
        seen = docs.filter(F.col("doc_id") < 3000).select("doc_id", "text")
        if sf_dir not in _idx_path:
            path = tempfile.mkdtemp(prefix="lt_bench_minhash_idx_")
            lt.save_minhash_index(seen, path, on="text", id_col="doc_id",
                                  num_hashes=24, bands=8, shingle=3)
            _idx_path[sf_dir] = path
        nw = docs.filter(F.col("doc_id") >= 3000).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text")
        return lt.near_dup_pairs_minhash_against_index(
            nw, _idx_path[sf_dir], on="text", id_col="doc_id", threshold=0.6)

    _bm25_idx_path = {}

    def search_bm25_indexed(sf_dir):
        # the serving shape: the impact-scored inverted index is built
        # ONCE (first call — ingest-time cost, same stance as
        # dedup_against_index) and each query batch joins against the
        # bucket-pruned parquet. Compare with search_bm25, which
        # rebuilds postings+idf from text every run.
        import tempfile

        from linktransformer_spark.functions import similarity as S

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _bm25_idx_path:
            path = tempfile.mkdtemp(prefix="lt_bench_bm25_idx_")
            lt.save_bm25_index(docs, path)
            _bm25_idx_path[sf_dir] = path
        queries = docs.filter(F.col("doc_id") % 50 == 0).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        )
        return lt.bm25_topk_indexed(spark, _bm25_idx_path[sf_dir], queries, k=5)

    def search_bm25_append(sf_dir):
        # the ingest shape of the segment model: score a fresh document
        # batch against the FROZEN stats of the stored index (meta +
        # dfreq join + impact bake). Uses the same built-once index as
        # search_bm25_indexed; returns the delta posting relation (the
        # parquet write is excluded — I/O-bound and engine-independent).
        docs = read_table(spark, sf_dir, "documents")
        search_bm25_indexed(sf_dir).count() if sf_dir not in _bm25_idx_path else None
        batch = docs.filter(F.col("doc_id") % 10 == 3).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        return lt.bm25_delta_postings(
            spark, _bm25_idx_path[sf_dir], batch)

    def dedup_minhash_salted_skew(sf_dir):
        # the hot-bucket worst case: the corpus plus 1500 verbatim
        # copies of one boilerplate doc — one size-1500 bucket in EVERY
        # band. hot_bucket='salt' keeps the full candidate set (the
        # 1500-copy clique included) while bounding per-cell join work
        # at ~2*cap^2; 'drop' mode would silently skip the one group a
        # dedup run exists to catch.
        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        boiler = docs.filter(F.col("doc_id") == 0).select("text")
        copies = (
            spark.range(1500)
            .select((F.col("id") + 5_000_000).alias("doc_id"))
            .crossJoin(F.broadcast(boiler))
        )
        return lt.near_dup_pairs_minhash(
            docs.unionByName(copies), on="text", id_col="doc_id",
            threshold=0.6, num_hashes=24, bands=8, shingle=3,
            max_bucket_size=128, hot_bucket="salt",
        )

    _bm25_seg_path = {}

    def search_bm25_compact(sf_dir):
        # the maintenance shape closing the segment model's staleness
        # loop: re-derive N/avgdl/df from the stored base+delta
        # postings and re-bake every impact — I/O scales with the
        # INDEX, never the corpus text. Setup (once): build on 90% of
        # docs + append the other 10% as a frozen-frame segment.
        import tempfile

        if sf_dir not in _bm25_seg_path:
            docs = read_table(spark, sf_dir, "documents")
            path = tempfile.mkdtemp(prefix="lt_bench_bm25_seg_")
            lt.save_bm25_index(docs.filter(F.col("doc_id") % 10 != 7), path)
            lt.append_to_bm25_index(
                docs.filter(F.col("doc_id") % 10 == 7), path)
            _bm25_seg_path[sf_dir] = path
        return lt.bm25_compacted_postings(spark, _bm25_seg_path[sf_dir])

    _ivf_idx_path = {}

    def ann_ivf_indexed(sf_dir):
        # build-once / probe-many, same stance as the other two index
        # benches: the cell-partitioned index is written at first call
        import tempfile

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _ivf_idx_path:
            path = tempfile.mkdtemp(prefix="lt_bench_ivf_idx_")
            lt.save_ivf_index(emb, path, n_cells=16, mode="seeded")
            _ivf_idx_path[sf_dir] = path
        q = emb.filter(F.col("vec_id") < 500)
        return lt.ann_topk_ivf_indexed(
            spark, _ivf_idx_path[sf_dir], q, k=10, n_probe=4)

    def merge_knn_auto(sf_dir):
        # the PRODUCTION merge plan: mode='auto' with an expression-
        # embedding scorer, size-routed to LSH candidates + exact
        # re-rank (threshold lowered so bench scale exercises the same
        # route a 100 TB right side takes). Tracks the auto-routing
        # and the LSH candidate volume round-over-round; the bench's
        # merge_knn_k3 entry remains the exact-cross oracle baseline.
        # Left side bounded to 2k rows: TPC-H names differ only in
        # digits, so every name shares all non-digit n-grams and the
        # hyperplane buckets barely discriminate — candidate volume per
        # left row here is a measured near-worst case (PLANS.md round
        # 9), and the route's health signal (plan shape + candidate
        # volume drift) is the same at 2k as at 15k.
        from linktransformer_spark.operators.knn_join import (
            AUTO_LSH_CONF, BROADCAST_KNN_CONF,
        )

        cust = read_table(spark, sf_dir, "customer").filter(
            F.col("c_custkey") <= 2000
        )
        supp = read_table(spark, sf_dir, "supplier")
        spark.conf.set(AUTO_LSH_CONF, "1")
        spark.conf.set(BROADCAST_KNN_CONF, "1")
        try:  # routing resolves at plan-build time, so restore is safe
            return lt.merge_knn(
                cust, supp, left_on="c_name", right_on="s_name",
                model="hash-ngram", mode="auto", k=3,
                left_id_col="c_custkey", right_id_col="s_suppkey",
            )
        finally:
            spark.conf.unset(AUTO_LSH_CONF)
            spark.conf.unset(BROADCAST_KNN_CONF)

    def merge_knn_auto_cold(sf_dir):
        # COLD-MEMO twin of merge_knn_auto (round-13 verdict item 9):
        # clears the in-process LSH table-width memo before building,
        # so every timed run INCLUDES the bucket-occupancy derivation
        # the warm entry's memo skips. The warm/cold delta is the
        # derivation's true per-query cost; the warm entry keeps its
        # rounds-9..13 meaning (repeated merges against one corpus).
        from linktransformer_spark.operators.knn_join import (
            clear_auto_tables_memo,
        )

        clear_auto_tables_memo()
        return merge_knn_auto(sf_dir)

    def ann_serve_r90(sf_dir):
        # THE serving default (operators/serving.py): IVF-PQ scan-wide
        # + exact re-rank at auto-resolved knobs — the measured
        # >=0.9-recall@10 operating point (0.99 at sf0.1, 0.91 at sf1)
        emb = read_table(spark, sf_dir, "embeddings")
        return lt.ann_serving_topk(emb, emb, k=10)

    _pq_idx_path = {}

    def ann_serve_r90_indexed(sf_dir):
        # build-once / probe-many form of the same recipe: the PQ
        # index is written at first call; serving reads probed cell
        # partitions (codes) + the re-rank shortlist only
        import tempfile

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _pq_idx_path:
            path = tempfile.mkdtemp(prefix="lt_bench_pq_idx_")
            lt.save_pq_index(emb, path)
            _pq_idx_path[sf_dir] = path
        return lt.ann_topk_pq_indexed(spark, _pq_idx_path[sf_dir], emb, k=10)

    def search_hybrid_indexed(sf_dir):
        # the one-call production hybrid: BM25 impact index (lexical
        # arm) + PQ r90 index (semantic arm) + RRF fusion — both
        # indexes built once (ingest-time cost, same stance as the
        # other *_indexed entries); the entry measures the fused serve
        from linktransformer_spark.functions import similarity as S

        docs = read_table(spark, sf_dir, "documents")
        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _bm25_idx_path:
            search_bm25_indexed(sf_dir).count()
        if sf_dir not in _pq_idx_path:
            ann_serve_r90_indexed(sf_dir).count()
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
        return lt.hybrid_topk_indexed(
            spark, _bm25_idx_path[sf_dir], _pq_idx_path[sf_dir],
            queries, k=10, k_arm=10,
        )

    def knn_label_eval_lsh(sf_dir):
        # the scale path of the embedding scorecard: candidates via the
        # hyperplane bucket equi-join instead of the exact O(n^2) cross
        emb = read_table(spark, sf_dir, "embeddings")
        return lt.knn_label_eval(emb, k=5, mode="lsh_hyperplane",
                                 dim=64, n_planes=6)

    def textpipe_docs(sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        return lt.analyze_documents(docs)

    return {
        "q1_pricing": from_oracle("q1_pricing_summary"),
        "topk_revenue": from_oracle("topk_revenue_customers"),
        "events_sessionize": from_oracle("events_sessionize"),
        "events_hourly_agg": from_oracle("events_hourly_agg"),
        "events_asof_join": from_oracle("events_asof_purchase_view"),
        "merge_1nn_lev": from_oracle("merge_1nn"),
        "merge_blocking": from_oracle("merge_blocking_nation"),
        "merge_knn_k3": from_oracle("merge_knn_k3"),
        "merge_hash_broadcast": merge_hash_broadcast,
        "dedup_minhash_docs": dedup_minhash_docs,
        "dedup_minhash_salted_skew": dedup_minhash_salted_skew,
        "dedup_simhash_pairs": from_oracle("dedup_simhash_pairs"),
        "ann_broadcast_topk": ann_broadcast,
        "ann_ivf_topk": ann_ivf,
        "ann_lsh_topk": ann_lsh,
        "text_analyze": textpipe_docs,
        "docs_quality_filter": from_oracle("docs_quality_filter"),
        "profile_orders": from_oracle("profile_orders"),
        "dedup_against_incr": from_oracle("dedup_minhash_against"),
        "dedup_against_index": dedup_against_index,
        "merge_k_judge_mock": from_oracle("merge_k_judge_mock"),
        "merge_k_judge_batched": merge_k_judge_batched,
        "docs_dedup_lines": from_oracle("docs_dedup_lines"),
        "docs_dedup_spans": from_oracle("docs_dedup_spans"),
        "docs_contamination": from_oracle("docs_contamination"),
        "semdedup_embeddings": from_oracle("semdedup_embeddings"),
        "docs_lm_perplexity": from_oracle("docs_lm_perplexity"),
        "docs_dsir_weights": from_oracle("docs_dsir_weights"),
        "docs_quantile_buckets": from_oracle("docs_quantile_buckets"),
        "events_props_rollup": from_oracle("events_props_rollup"),
        "q6_forecast_revenue": from_oracle("q6_forecast_revenue"),
        "knn_label_eval_lsh": knn_label_eval_lsh,
        "docs_source_rollup": from_oracle("docs_source_rollup"),
        "multimodal_extract_features": from_oracle("multimodal_extract_features"),
        "docs_curation_pipeline": from_oracle("docs_curation_pipeline"),
        "search_bm25": from_oracle("search_bm25_documents"),
        "search_bm25_indexed": search_bm25_indexed,
        "search_bm25_append": search_bm25_append,
        "search_bm25_compact": search_bm25_compact,
        "docs_gopher_rules": from_oracle("docs_gopher_rules"),
        "docs_datacard": from_oracle("docs_datacard"),
        "events_funnel": from_oracle("events_funnel_summary"),
        "events_retention": from_oracle("events_retention_daily"),
        "docs_top_vocab": from_oracle("docs_top_vocab"),
        "docs_collocations": from_oracle("docs_collocations_pmi"),
        "ann_int8_topk": from_oracle("ann_topk_int8"),
        "dedup_exact_against": from_oracle("docs_dedup_exact_against"),
        "er_resolve": from_oracle("er_resolve_entities"),
        "er_resolve_lsh": from_oracle("er_resolve_lsh"),
        "events_user_lifecycle": from_oracle("events_user_lifecycle"),
        "dim_scd2_apply": from_oracle("dim_scd2_apply"),
        "events_attribution": from_oracle("events_attribution_last_touch"),
        "events_transitions": from_oracle("events_transitions"),
        "docs_tfidf_terms": from_oracle("docs_tfidf_terms"),
        "ann_mmr_rerank": from_oracle("ann_mmr_rerank"),
        "ann_srp_rerank": from_oracle("ann_topk_srp_rerank"),
        "graph_pagerank": from_oracle("graph_pagerank"),
        "events_session_paths": from_oracle("events_session_paths"),
        "events_volume_anomaly": from_oracle("events_volume_anomaly"),
        "docs_temperature_mixture": from_oracle("docs_temperature_mixture"),
        "ann_ivf_indexed": ann_ivf_indexed,
        "merge_knn_auto": merge_knn_auto,
        "merge_knn_auto_cold": merge_knn_auto_cold,
        "ann_serve_r90": ann_serve_r90,
        "ann_serve_r90_indexed": ann_serve_r90_indexed,
        "search_hybrid_indexed": search_hybrid_indexed,
        "docs_bigram_lm": from_oracle("docs_bigram_lm"),
        "docs_chunk_sliding": from_oracle("docs_chunk_sliding"),
        "er_sorted_neighborhood": from_oracle("er_sorted_neighborhood"),
        "events_decayed_engagement": from_oracle("events_decayed_engagement"),
    }


def main() -> None:
    spark = lt.get_spark("lt-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_gc = spark.sparkContext._jvm.System.gc  # type: ignore[attr-defined]

    # min-of-3 for the heaviest queries: their absolute variance is the
    # biggest share of suite noise, so one extra run buys attributable
    # round-over-round deltas. The merge family is included after
    # observing co-tenant load spikes inflate a single timed run up to
    # 7x (25s vs a 3.5s steady state) — min-of-2 cannot reject a spike
    # that hits one of its two samples.
    extra_runs = {
        "dedup_minhash_docs", "ann_lsh_topk", "merge_knn_k3",
        "merge_1nn_lev", "merge_hash_broadcast", "merge_blocking",
        "merge_k_judge_mock", "merge_k_judge_batched",
        "docs_curation_pipeline", "semdedup_embeddings",
        "docs_dsir_weights", "ann_mmr_rerank", "graph_pagerank",
    }
    # min-of-5 for entries with a history of unexplained round-over-round
    # swings in UNTOUCHED code (r6: ann_lsh_topk +53%, text_analyze +62%,
    # profile_orders +45%, ann_broadcast_topk +35%, ann_ivf_topk +25%):
    # co-tenant noise on this box inflates single runs several-fold, and
    # min-of-2/3 cannot reliably reject a spike that hits most samples.
    five_runs = {
        "ann_lsh_topk", "text_analyze", "profile_orders",
        "ann_broadcast_topk", "ann_ivf_topk", "events_props_rollup",
    }

    queries = bench_queries(spark)
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        fn(SF_DIR).count()  # warm run: JIT + codegen + python workers
        warm_s = time.time() - t0
        runs = []
        n_runs = 5 if name in five_runs else 3 if name in extra_runs else 2
        for _ in range(n_runs):
            jvm_gc()  # don't bill this query for predecessors' garbage
            t0 = time.time()
            n = fn(SF_DIR).count()  # count forces every operator
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        print(
            f"# {name}: {timings[name]}s ({n} rows; warm {warm_s:.1f}s, "
            f"runs {', '.join(f'{r:.2f}' for r in runs)})",
            file=sys.stderr,
        )

    # quality tracking (untimed): recall@10 of the approximate ANN
    # entries vs the exact broadcast baseline — a centroid-quality or
    # bucket-tuning regression shows up here round-over-round even
    # when the wall-clock looks fine.
    recall: dict[str, float] = {}
    try:
        emb = read_table(spark, SF_DIR, "embeddings")
        exact = (
            lt.ann_topk(emb, emb, k=10, mode="broadcast_knn")
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )
        n_exact = exact.count()
        for nm, approx in (
            ("ann_ivf_topk", lt.ivf_topk(emb, emb, k=10, n_probe=4)),
            ("ann_lsh_topk", lt.ann_topk(emb, emb, k=10,
                                         mode="lsh_hyperplane",
                                         n_planes=6, dim=64)),
            # the recovery knobs, so a low base number is actionable:
            ("ann_lsh_multiprobe3", lt.ann_topk(emb, emb, k=10,
                                                mode="lsh_hyperplane",
                                                n_planes=6, dim=64,
                                                multi_probe=3)),
            ("ann_ivf_probe8", lt.ivf_topk(emb, emb, k=10, n_probe=8)),
            # the round-10 OR-construction: 3 independent plane sets
            ("ann_lsh_tables3", lt.ann_topk(emb, emb, k=10,
                                            mode="lsh_hyperplane",
                                            n_planes=6, dim=64,
                                            n_tables=3)),
            # THE serving default — the measured >=0.9 operating point
            ("ann_serve_r90", lt.ann_serving_topk(emb, emb, k=10)),
        ):
            hit = exact.join(
                approx.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            ).count()
            recall[nm] = round(hit / max(n_exact, 1), 4)
            print(f"# recall@10 {nm}: {recall[nm]}", file=sys.stderr)

        # merge-route recall (round-10 verdict item 3): pair overlap
        # of the production auto->LSH merge route vs the exact top-k
        # at the SAME operating point as the timed merge_knn_auto
        # entry — a plane-sizing or probe regression moves this number
        # even when the wall-clock looks fine. (The PLANS.md round-9
        # curve: 0.47-0.95 across planes/probes on these digit-only-
        # differing TPC-H names, a measured near-worst LSH case.)
        from linktransformer_spark.operators.knn_join import (
            AUTO_LSH_CONF, BROADCAST_KNN_CONF,
        )

        cust = read_table(spark, SF_DIR, "customer").filter(
            F.col("c_custkey") <= 2000
        )
        supp = read_table(spark, SF_DIR, "supplier")
        mkw = dict(
            left_on="c_name", right_on="s_name", model="hash-ngram",
            k=3, left_id_col="c_custkey", right_id_col="s_suppkey",
        )
        exact_m = (
            lt.merge_knn(cust, supp, mode="exact_cross", **mkw)
            .select("c_custkey", "s_suppkey")
            .localCheckpoint(eager=True)
        )
        n_ex = exact_m.count()
        spark.conf.set(AUTO_LSH_CONF, "1")
        spark.conf.set(BROADCAST_KNN_CONF, "1")
        try:
            lsh_m = lt.merge_knn(cust, supp, mode="auto", **mkw).select(
                "c_custkey", "s_suppkey"
            )
            hit_m = exact_m.join(
                lsh_m, ["c_custkey", "s_suppkey"]
            ).count()
        finally:
            spark.conf.unset(AUTO_LSH_CONF)
            spark.conf.unset(BROADCAST_KNN_CONF)
        recall["merge_auto_recall"] = round(hit_m / max(n_ex, 1), 4)
        print(
            f"# merge_auto_recall: {recall['merge_auto_recall']}",
            file=sys.stderr,
        )

        # merge-route recall on REALISTIC keys (round-11 verdict item
        # 3): the TPC-H digit-name shape above is a measured
        # near-worst-but-flattering LSH case (all non-digit n-grams
        # collide); this twin uses the Zipf syllable-vocab titles with
        # PERTURBED-left / original-right pairs (drop last token /
        # swap first for a stopword — each left row has exactly ONE
        # true near match), k=1, the matching-task readout. PLANS.md
        # round-10: 0.84 single-table, 0.96-0.99 at 2-3 LSH tables.
        from tools.gen_scale_data import gen_zipf_documents

        zpd = gen_zipf_documents(3000).to_pandas()
        zdocs = spark.createDataFrame(zpd).filter(
            F.col("doc_id") >= 2000
        ).localCheckpoint(eager=True)
        tw = F.split(F.col("title"), " ")
        zl = (
            zdocs.select(
                F.col("doc_id").alias("lid"),
                F.array_join(
                    F.slice(tw, 1, F.size(tw) - 1), " "
                ).alias("lkey"),
            )
            .unionByName(
                zdocs.select(
                    (F.col("doc_id") + 1000).alias("lid"),
                    F.concat(
                        F.lit("the "),
                        F.array_join(F.slice(tw, 2, 99), " "),
                    ).alias("lkey"),
                )
            )
            .localCheckpoint(eager=True)
        )
        zr = zdocs.select(
            F.col("doc_id").alias("rid"), F.col("title").alias("rkey")
        ).localCheckpoint(eager=True)
        zkw = dict(left_on="lkey", right_on="rkey", model="hash-ngram",
                   k=1, left_id_col="lid", right_id_col="rid")
        zex = (
            lt.merge_knn(zl, zr, mode="exact_cross", **zkw)
            .select("lid", "rid")
            .localCheckpoint(eager=True)
        )
        n_zex = zex.count()
        spark.conf.set(AUTO_LSH_CONF, "1")
        spark.conf.set(BROADCAST_KNN_CONF, "1")
        try:
            zlsh = lt.merge_knn(zl, zr, mode="auto", **zkw).select(
                "lid", "rid"
            )
            hit_z = zex.join(zlsh, ["lid", "rid"]).count()
        finally:
            spark.conf.unset(AUTO_LSH_CONF)
            spark.conf.unset(BROADCAST_KNN_CONF)
        recall["merge_zipf_recall"] = round(hit_z / max(n_zex, 1), 4)
        print(
            f"# merge_zipf_recall: {recall['merge_zipf_recall']}",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001 — recall is telemetry, not a gate
        print(f"# recall tracking failed: {e}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline query suite wall-clock (relational + semantic join + dedup + ann + textpipe)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "recall_at_10": recall,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "methodology": (
                    "per query: 1 warm + N timed runs, min reported "
                    "(N=5 for the historically noisy set ann_lsh/"
                    "text_analyze/profile_orders/ann_broadcast/ann_ivf, "
                    "N=3 for the merge family, dedup_minhash_docs, "
                    "curation/semdedup/dsir, else 2); co-tenant load "
                    "spikes on this box can inflate a single run "
                    "several-fold"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
