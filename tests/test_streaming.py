"""Structured Streaming operators (streaming/ops.py).

The oracle-parity of the three streaming queries is covered by
test_oracle_queries; here we exercise the production-only variants and
invariants that have no SQL twin.
"""

import os

import pytest
from pyspark.sql import functions as F

from linktransformer_spark.streaming import (
    read_stream_table,
    run_available_now,
    streaming_dedup,
    streaming_sessionize,
)


def test_dedup_within_watermark_runs_and_bounds_state(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    out = run_available_now(
        streaming_dedup(ev, ["user_id"], watermark="1 hour", within_watermark=True),
        output_mode="append",
    )
    n_users = out.select("user_id").distinct().count()
    total = out.count()
    # within-watermark dedup may re-emit a key after its state ages out,
    # but never emits consecutive duplicates within the watermark; the
    # distinct key set must equal the batch distinct.
    batch_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    assert n_users == batch_users
    assert total >= n_users


def test_sessionize_counts_cover_all_events(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    out = run_available_now(
        streaming_sessionize(ev, gap="30 minutes"), output_mode="complete"
    )
    total_events = out.agg(F.sum("n_events")).first()[0]
    batch_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total_events == batch_total


def test_user_stats_state_carries_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: split the events table into 4 files and
    process one file per trigger — per-user state must accumulate
    ACROSS micro-batches, and the last emission per user must equal the
    batch GROUP BY."""
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_user_stats, run_available_now, streaming_user_stats,
    )

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "ev_multi")
    ev.repartition(4).write.parquet(src)

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(streaming_user_stats(sdf), output_mode="update")
    # more emissions than users proves multiple micro-batches updated state
    assert drained.count() > drained.select("user_id").distinct().count()

    got = {
        r.user_id: (r.n_events, round(r.sum_value, 4), r.last_seen_us)
        for r in final_user_stats(drained).collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.sum_value, 4), r.last_seen_us)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("last_seen_us"),
        )
        .collect()
    }
    assert got == want


def test_streaming_merge_matches_batch_broadcast_path(spark, sf_dir):
    """Stream-static semantic join: draining the streamed left side
    through streaming_merge must reproduce the batch broadcast_knn
    result exactly (identical numpy scoring path)."""
    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        read_stream_table, run_available_now, streaming_merge,
    )

    supp = read_table(spark, sf_dir, "supplier")
    s_cust = read_stream_table(spark, sf_dir, "customer")
    out = run_available_now(
        streaming_merge(
            s_cust, supp, left_on="c_name", right_on="s_name",
            model="hash-ngram", left_id_col="c_custkey",
            right_id_col="s_suppkey",
        ),
        output_mode="append",
    )
    got = {(r.c_custkey, r.s_suppkey, round(r.score, 9)) for r in out.collect()}

    cust = read_table(spark, sf_dir, "customer")
    batch = lt.merge(
        cust, supp, left_on="c_name", right_on="s_name", model="hash-ngram",
        mode="broadcast_knn", left_id_col="c_custkey", right_id_col="s_suppkey",
    )
    want = {(r.c_custkey, r.s_suppkey, round(r.score, 9)) for r in batch.collect()}
    assert got == want and len(got) == cust.count()


def test_streaming_merge_guards(spark, sf_dir):
    import pytest as _pytest

    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import read_stream_table, streaming_merge
    import linktransformer_spark as lt

    supp = read_table(spark, sf_dir, "supplier")
    s_cust = read_stream_table(spark, sf_dir, "customer")
    # streaming right side is not allowed (the index is built from it)
    with _pytest.raises(ValueError, match="static"):
        lt.merge(supp, s_cust, left_on="s_name", right_on="c_name",
                 model="hash-ngram", left_id_col="s_suppkey")
    # string scorer has no broadcast index form
    with _pytest.raises(ValueError, match="embedding"):
        streaming_merge(s_cust, supp, left_on="c_name", right_on="s_name",
                        model="levenshtein", left_id_col="c_custkey")
    # stream must carry its own id
    with _pytest.raises(ValueError, match="id_col"):
        streaming_merge(s_cust, supp, left_on="c_name", right_on="s_name",
                        model="hash-ngram")


def test_streaming_dedup_against_equals_batch(spark, sf_dir):
    """The stateless stream band-join emits exactly the batch
    near_dup_pairs_minhash_against pairs — including the row-local
    first-matching-band dedup (no duplicate emissions when a pair
    collides in several bands)."""
    from pyspark.sql import functions as F

    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import read_stream_table, run_available_now
    from linktransformer_spark.streaming.ops import streaming_dedup_against

    d = read_table(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") < 100).select("doc_id", "text")

    def mutate(df):
        dup = df.filter(F.col("doc_id") < 60).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail words")).alias("text"),
        )
        fresh = df.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 260)).select(
            "doc_id", "text")
        return dup.unionByName(fresh)

    kw = dict(on="text", id_col="doc_id", threshold=0.6,
              num_hashes=24, bands=8, shingle=3)
    batch_pairs = {
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against(
            mutate(d), seen, **kw).collect()
    }

    s = read_stream_table(spark, sf_dir, "documents")
    out = streaming_dedup_against(mutate(s), seen, word=True, **kw)
    drained = run_available_now(out, output_mode="append")
    rows = drained.collect()
    stream_pairs = {(r.src, r.dst, round(r.jaccard, 9)) for r in rows}
    assert len(rows) == len(stream_pairs)  # no duplicate emissions
    assert stream_pairs == batch_pairs and len(stream_pairs) > 0


def test_streaming_dedup_against_char_mode_short_docs(spark, sf_dir):
    """Char-mode parity on the degenerate docs: empty texts and texts
    shorter than the shingle width hash the '' fallback shingle on the
    batch path — the stream side must produce the identical signature
    and verify arrays (regression: the stream side used to map empty
    shingle sets to the sentinel signature and miss these pairs)."""
    from pyspark.sql import functions as F

    import linktransformer_spark as lt
    from linktransformer_spark.streaming import read_stream_table, run_available_now
    from linktransformer_spark.streaming.ops import streaming_dedup_against
    from linktransformer_spark.sources.tables import read_table

    def degenerate(df):
        return df.select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, F.lit(""))
            .when(F.col("doc_id") % 3 == 1, F.lit("ab"))  # < shingle chars
            .otherwise(F.col("text"))
            .alias("text"),
        )

    d = read_table(spark, sf_dir, "documents")
    seen = degenerate(d.filter(F.col("doc_id") < 30))

    def new_batch(df):
        return degenerate(df.filter(F.col("doc_id") < 12)).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )

    kw = dict(on="text", id_col="doc_id", threshold=0.5,
              num_hashes=24, bands=8, shingle=3, word=False)
    batch_pairs = {
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against(new_batch(d), seen, **kw).collect()
    }
    # the degenerate docs must actually collide or the test checks nothing
    assert any(jac == 1.0 for _, _, jac in batch_pairs)

    s = read_stream_table(spark, sf_dir, "documents")
    out = streaming_dedup_against(new_batch(s), seen, **kw)
    rows = run_available_now(out, output_mode="append").collect()
    stream_pairs = {(r.src, r.dst, round(r.jaccard, 9)) for r in rows}
    assert len(rows) == len(stream_pairs)
    assert stream_pairs == batch_pairs


def test_streaming_contamination_equals_batch(spark, sf_dir):
    """The stateless stream-static n-gram join emits exactly the batch
    contamination_pairs rows — including the row-local
    first-shared-gram dedup (one emission per contaminated pair no
    matter how many grams collide)."""
    from pyspark.sql import functions as F

    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        read_stream_table, run_available_now, streaming_contamination,
    )

    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")

    batch = {
        (r.train_id, r.bench_id, r.shared_ngrams)
        for r in lt.contamination_pairs(train, bench, on="text", n=5).collect()
    }

    s = read_stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    drained = run_available_now(
        streaming_contamination(s, bench, on="text", n=5),
        output_mode="append",
    )
    rows = drained.collect()
    stream = {(r.train_id, r.bench_id, r.shared_ngrams) for r in rows}
    assert len(rows) == len(stream)  # no duplicate emissions
    assert stream == batch and len(stream) > 0


def test_streaming_contamination_short_and_empty_docs(spark):
    """Docs below n tokens (or empty) contribute nothing on either
    side — no crash, no rows; multi-gram pairs report the full distinct
    shared count once."""
    from linktransformer_spark.streaming.ops import streaming_contamination

    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta"), (10, "x"), (11, "")],
        ["doc_id", "text"],
    )
    stream = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta"), (2, "y z"), (3, None)],
        "doc_id long, text string",
    )
    # run the same plan in batch mode (the operator is mode-agnostic;
    # streaming execution parity is pinned by the test above)
    out = streaming_contamination(stream, bench, on="text", n=5).collect()
    got = {(r.train_id, r.bench_id): r.shared_ngrams for r in out}
    # shared 5-grams: 'alpha..epsilon' and 'beta..zeta' -> 2
    assert got == {(1, 9): 2}


def test_streaming_semdedup_matches_batch_cell_join(spark, sf_dir):
    """The stateless stream-side cell assignment (expression argmax over
    collected centroids) must agree row-for-row with the batch
    declarative assignment: same hits as a batch cell equi-join."""
    import linktransformer_spark as lt
    from linktransformer_spark.operators.ann import (
        _assign_cells_declarative, ivf_seed_centroids,
    )
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.streaming import (
        read_stream_table, run_available_now,
    )
    from linktransformer_spark.streaming.ops import streaming_semdedup_against

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") < 300)
    stream = read_stream_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") >= 300
    )
    got = run_available_now(
        streaming_semdedup_against(
            stream, corpus, threshold=0.3, n_cells=8
        ),
        output_mode="append",
    )
    got_rows = {(r["src"], r["dst"]) for r in got.collect()}

    # batch equivalent: both sides through the declarative assignment
    c = corpus.select(
        F.col("vec_id").cast("long").alias("_dst"),
        S.l2_normalize(F.col("embedding")).alias("_cv"),
    )
    cent = ivf_seed_centroids(c, "_dst", "_cv", 8)
    ca = _assign_cells_declarative(c, "_dst", "_cv", cent, 1)
    n = emb.filter(F.col("vec_id") >= 300).select(
        F.col("vec_id").cast("long").alias("_src"),
        S.l2_normalize(F.col("embedding")).alias("_nv"),
    )
    na = _assign_cells_declarative(n, "_src", "_nv", cent, 1)
    want_rows = {
        (r["_src"], r["_dst"])
        for r in na.join(ca, "cell")
        .withColumn("cos", S.dot(F.col("_nv"), F.col("_cv")))
        .filter(F.col("cos") >= 0.3)
        .collect()
    }
    assert got_rows == want_rows and got_rows


def test_run_available_now_releases_memory_sink(spark, sf_dir):
    """The drained result must survive while the memory-sink temp view
    is GONE — sinks pinned per-query accumulate until a small driver
    OOMs (the 1g mid-drive failure this guards against)."""
    from linktransformer_spark.streaming import (
        read_stream_table, run_available_now,
    )

    before = {t.name for t in spark.catalog.listTables()}
    ev = read_stream_table(spark, sf_dir, "events")
    out = run_available_now(
        ev.select("event_id", "user_id"), output_mode="append"
    )
    after = {t.name for t in spark.catalog.listTables()}
    assert not {n for n in after - before if n.startswith("_lt_stream_")}
    assert out.count() > 0  # data outlives the dropped sink


def test_streaming_trending_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """Counts accumulated across micro-batches + drain-time finalizer
    must equal the batch trending operator exactly."""
    from linktransformer_spark.operators.eventpipe import trending
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_trending, run_available_now, streaming_trending,
    )

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type")
    src = str(tmp_path / "ev_trend")
    ev.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # files arrive in random time order here, so the watermark must
    # exceed the full data span or genuinely-late rows drop (correct
    # production semantics, wrong for an equality check)
    drained = run_available_now(
        streaming_trending(sdf, window_seconds=21600, watermark="800 hours"),
        output_mode="update",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["rank"], r["lift"])
        for r in final_trending(drained, window_seconds=21600, k=3).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["rank"], r["lift"])
        for r in trending(ev, window_seconds=21600, k=3).collect()
    }
    assert got == want and got


def test_streaming_ann_against_index_equals_batch(spark, sf_dir, tmp_path):
    """Multi-micro-batch streaming probe of the persisted IVF index
    must equal the batch indexed search exactly (cell assignment uses
    the declarative fold's float order)."""
    import linktransformer_spark as lt
    from linktransformer_spark.streaming import (
        final_ann_topk, run_available_now, streaming_ann_against_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16, mode="seeded")
    q = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    src = str(tmp_path / "qstream")
    q.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_ann_against_index(spark, sdf, path, n_probe=4),
        output_mode="append",
    )
    got = {(r["query_id"], r["neighbor_id"], r["rank"], round(r["score"], 9))
           for r in final_ann_topk(drained, k=5).collect()}
    want = {(r["query_id"], r["neighbor_id"], r["rank"], round(r["score"], 9))
            for r in lt.ann_topk_ivf_indexed(spark, path, q, k=5,
                                             n_probe=4).collect()}
    assert got == want and got

    # pruned drain: sink bounded at queries x prune_topk, final top-k
    # bit-identical (same window order inside the prune)
    sdf2 = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pruned = run_available_now(
        streaming_ann_against_index(spark, sdf2, path, n_probe=4,
                                    prune_topk=5),
        output_mode="append",
    )
    assert pruned.count() <= q.count() * 5
    assert pruned.count() < drained.count()
    got_p = {(r["query_id"], r["neighbor_id"], r["rank"],
              round(r["score"], 9))
             for r in final_ann_topk(pruned, k=5).collect()}
    assert got_p == want


def test_streaming_ab_counts_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """Counter state accumulated across micro-batches + drain z-test
    must equal the batch ab_test exactly."""
    from linktransformer_spark.operators.eventpipe import ab_test
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_ab_test, run_available_now, streaming_ab_counts,
    )

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    ).select(
        "event_type",
        F.when(F.get_json_object("props", "$.k").cast("long") % 2 == 0, "A")
        .otherwise("B").alias("variant"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("flag"),
    )
    src = str(tmp_path / "ab_stream")
    ev.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_ab_counts(sdf, variant_col="variant", flag_col="flag",
                            by="event_type"),
        output_mode="update",
    )
    got = {tuple(r) for r in final_ab_test(
        drained, variant_col="variant", control="A", treatment="B",
        by="event_type").collect()}
    want = {tuple(r) for r in ab_test(
        ev, variant_col="variant", control="A", treatment="B",
        flag_col="flag", by="event_type").collect()}
    assert got == want and got


def test_streaming_funnel_state_carries_across_microbatches(spark, sf_dir, tmp_path):
    """The O(k)-state streaming funnel over time-ordered micro-batches
    must equal the batch funnel exactly: fire times accumulate across
    batches and never change once set."""
    from linktransformer_spark.operators.eventpipe import funnel_user_steps
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_funnel_users, run_available_now, streaming_funnel_steps,
    )
    from pyspark.sql import Window

    steps = ["signup", "view", "click", "purchase"]
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type")
    # the ordering contract: micro-batches arrive in event-time order —
    # write ts-quartile files sequentially (ascending mtime); files
    # that land in one batch sort in-batch anyway
    q = ev.withColumn("_q", F.ntile(4).over(Window.orderBy("ts")))
    src = str(tmp_path / "ev_funnel")
    for i in range(1, 5):
        q.filter(F.col("_q") == i).drop("_q").coalesce(1).write.mode(
            "append").parquet(src)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_funnel_steps(sdf, steps, within=259200.0),
        output_mode="update",
    )
    # more emissions than users proves multi-batch state updates
    assert drained.count() > drained.select("user_id").distinct().count()
    key = lambda r: tuple(r[f"t_{i}"] for i in range(1, 5))  # noqa: E731
    got = {r["user_id"]: key(r)
           for r in final_funnel_users(drained, steps).collect()}
    want = {r["user_id"]: key(r)
            for r in funnel_user_steps(ev, steps, within=259200.0).collect()}
    assert got == want and got


def test_streaming_retention_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """First-seen (user, period) streaming dedup + drain-time rollup
    must equal the batch retention table, regardless of arrival order
    (the dedup is order-free)."""
    from linktransformer_spark.operators.eventpipe import retention
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_retention, run_available_now, streaming_retention_activity,
    )

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "ev_ret")
    ev.repartition(3).write.parquet(src)  # random order across files
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_retention_activity(sdf, period="day"), output_mode="append")
    key = lambda r: (r["cohort"], r["period_offset"])  # noqa: E731
    val = lambda r: (r["n_active"], r["n_cohort"], r["retention"])  # noqa: E731
    got = {key(r): val(r)
           for r in final_retention(drained, max_offset=14).collect()}
    want = {key(r): val(r)
            for r in retention(ev, period="day", max_offset=14).collect()}
    assert got == want and got


def test_streaming_funnel_validates_and_prefilters(spark, sf_dir):
    """Bad steps fail like the batch operator; the stream plan filters
    to funnel event types before the state shuffle."""
    import pytest
    from linktransformer_spark.streaming import (
        read_stream_table, streaming_funnel_steps,
        streaming_retention_activity,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="at least 2"):
        streaming_funnel_steps(ev, ["signup"])
    with pytest.raises(ValueError, match="distinct"):
        streaming_funnel_steps(ev, ["a", "a"])
    with pytest.raises(ValueError, match="period"):
        streaming_retention_activity(ev, period="hour")
    with pytest.raises(ValueError, match="watermark"):
        streaming_retention_activity(ev, within_watermark=True)


def test_streaming_transitions_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """O(1) last-event state across time-ordered micro-batches: the
    drained pair sink + finalizer must equal the batch lead-window
    transition table exactly."""
    from linktransformer_spark.operators.eventpipe import transition_matrix
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_transitions, run_available_now, streaming_transitions,
    )
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id")
    q = ev.withColumn("_q", F.ntile(3).over(Window.orderBy("ts", "event_id")))
    src = str(tmp_path / "ev_trans")
    for i in range(1, 4):
        q.filter(F.col("_q") == i).drop("_q").coalesce(1).write.mode(
            "append").parquet(src)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_transitions(sdf, tiebreak_col="event_id"),
        output_mode="append",
    )
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in final_transitions(drained, min_count=2).collect()}
    want = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in transition_matrix(
                ev, tiebreak_col="event_id", min_count=2).collect()}
    assert got == want and got


def test_streaming_attribution_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """O(1) (last, first)-touch state across time-ordered micro-batches
    must reproduce the batch attribution report exactly — both models."""
    from linktransformer_spark.operators.eventpipe import attribution
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import (
        final_attribution, run_available_now, streaming_attribution,
    )
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id")
    q = ev.withColumn("_q", F.ntile(3).over(Window.orderBy("ts", "event_id")))
    src = str(tmp_path / "ev_attr")
    for i in range(1, 4):
        q.filter(F.col("_q") == i).drop("_q").coalesce(1).write.mode(
            "append").parquet(src)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    for model, lb in (("last_touch", 86400.0), ("first_touch", None)):
        drained = run_available_now(
            streaming_attribution(
                sdf, conversion_type="purchase",
                touch_types=["view", "click"], model=model,
                lookback_seconds=lb,
            ),
            output_mode="append",
        )
        got = {r["touch_type"]: (r["n_conversions"], r["frac"])
               for r in final_attribution(drained).collect()}
        want = {r["touch_type"]: (r["n_conversions"], r["frac"])
                for r in attribution(
                    ev, conversion_type="purchase",
                    touch_types=["view", "click"], model=model,
                    lookback_seconds=lb, tiebreak_col="event_id",
                ).collect()}
        assert got == want and got, model


def test_streaming_dedup_against_static_cap_matches_batch_drop(spark, sf_dir):
    """The static-side hot-bucket guard (drop mode) emits exactly the
    batch drop-mode pairs on a boilerplate-heavy static corpus.

    Stream-side buckets are kept UNDER the cap by construction (5
    boilerplate copies vs cap=8): batch mode caps both sides, the
    streaming guard only the static one (a micro-batch's bucket sizes
    are unknowable at plan time), so equality holds exactly when the
    stream side is under cap — which the operator docstring documents
    as the contract."""
    from pyspark.sql import functions as F

    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table
    from linktransformer_spark.streaming import read_stream_table, run_available_now
    from linktransformer_spark.streaming.ops import streaming_dedup_against

    d = read_table(spark, sf_dir, "documents")
    boiler = d.filter(F.col("doc_id") == 0).select("text")
    hot = (
        spark.range(30).select((F.col("id") + 900000).alias("doc_id"))
        .crossJoin(F.broadcast(boiler))
    )
    seen = d.filter(F.col("doc_id") < 50).select("doc_id", "text").unionByName(hot)

    def new_batch(df):
        return df.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail words")).alias("text"),
        ).unionByName(
            spark.range(5).select((F.col("id") + 2000000).alias("doc_id"))
            .crossJoin(F.broadcast(boiler)).select("doc_id", "text")
        )

    kw = dict(on="text", id_col="doc_id", threshold=0.6,
              num_hashes=24, bands=8, shingle=3)
    batch_drop = {
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against(
            new_batch(d), seen, max_bucket_size=8, **kw).collect()
    }
    uncapped = {
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against(
            new_batch(d), seen, **kw).collect()
    }
    assert len(batch_drop) < len(uncapped)  # the hot corpus engages the cap

    import tempfile

    src_dir = tempfile.mkdtemp(prefix="lt_stream_cap_")
    new_batch(d).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    )
    out = streaming_dedup_against(stream, seen, max_bucket_size=8, word=True, **kw)
    drained = run_available_now(out, output_mode="append")
    got = {(r.src, r.dst, round(r.jaccard, 9)) for r in drained.collect()}
    assert got == batch_drop


def test_streaming_bm25_against_index_equals_batch(spark, sf_dir, tmp_path):
    """Multi-micro-batch streaming keyword search against the
    persisted BM25 index must equal the batch indexed serve exactly
    (same order-pinned fold at drain, same tie-break), including
    tombstone masking."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.streaming import (
        final_bm25_topk, run_available_now, streaming_bm25_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm")
    lt.save_bm25_index(docs, path)
    lt.delete_from_bm25_index(
        docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"), path
    )
    q = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    src = str(tmp_path / "qstream")
    q.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_bm25_against_index(spark, sdf, path),
        output_mode="append",
    )
    got = {(r["q_id"], r["doc_id"], r["rank"], round(r["score"], 9),
            r["n_terms"])
           for r in final_bm25_topk(drained, k=5).collect()}
    want = {(r["q_id"], r["doc_id"], r["rank"], round(r["score"], 9),
             r["n_terms"])
            for r in lt.bm25_topk_indexed(spark, path, q, k=5).collect()}
    assert got == want and got
    assert not any(d % 10 == 3 for _, d, *_ in got)


def test_streaming_bm25_prune_topk_equals_batch(spark, sf_dir, tmp_path):
    """The score-bounded drain prune must (a) leave the final top-k
    BIT-IDENTICAL to the unpruned drain and the batch serve (the
    prune's fold is the finalizer's exact float order, ties included),
    and (b) actually bound the drained sink at queries x prune_topk
    docs."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.streaming import (
        final_bm25_topk, run_available_now, streaming_bm25_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm_pr")
    lt.save_bm25_index(docs, path)
    lt.delete_from_bm25_index(
        docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"), path
    )
    q = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    nq = q.count()
    src = str(tmp_path / "qstream_pr")
    q.repartition(3).write.parquet(src)

    def drain(**kw):
        sdf = (
            spark.readStream.schema(q.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_available_now(
            streaming_bm25_against_index(spark, sdf, path, **kw),
            output_mode="append",
        )

    raw = drain()
    pruned = drain(prune_topk=5)
    # (b) bounded sink: distinct (q, d) pairs <= queries x prune_topk
    n_docs_pruned = pruned.select("_q", "_d").distinct().count()
    assert n_docs_pruned <= nq * 5
    assert pruned.count() < raw.count()
    # (a) identical final ranking, full float precision
    got = sorted(map(tuple, final_bm25_topk(pruned, k=5).collect()))
    want_stream = sorted(map(tuple, final_bm25_topk(raw, k=5).collect()))
    want_batch = sorted(map(tuple, lt.bm25_topk_indexed(
        spark, path, q, k=5).collect()))
    assert got == want_stream == want_batch and got
    # prune_partitions (the residency lever — widens the pruner's
    # per-query exchange) must not change a single row
    wide = drain(prune_topk=5, prune_partitions=7)
    got_w = sorted(map(tuple, final_bm25_topk(wide, k=5).collect()))
    assert got_w == want_batch
    assert wide.select("_q", "_d").distinct().count() <= nq * 5
    # the round-13 'auto' width (df-stats derivation) and the legacy
    # None (session width) are both row-identical to the pinned width
    for pp in (None, "auto"):
        alt = drain(prune_topk=5, prune_partitions=pp)
        assert sorted(
            map(tuple, final_bm25_topk(alt, k=5).collect())
        ) == want_batch


def test_derive_bm25_prune_partitions(spark, sf_dir, tmp_path):
    """The auto width: monotone in the batch-size hint, never narrower
    than the session shuffle width, narrower (or equal) once
    max_df_ratio removes the df^2-dominating head terms, and rejects a
    bad string knob."""
    import pytest

    import linktransformer_spark as lt
    from linktransformer_spark.streaming import (
        derive_bm25_prune_partitions, streaming_bm25_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / f"bm25_dpp_{os.getpid()}")
    lt.save_bm25_index(docs, path, text_col="text", id_col="doc_id")

    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    small = derive_bm25_prune_partitions(
        spark, path, expected_batch_queries=1)
    assert small == session  # tiny estimate floors at the session width
    huge = derive_bm25_prune_partitions(
        spark, path, expected_batch_queries=50_000_000)
    assert huge >= small
    assert huge <= 8192  # the task-count cap
    capped = derive_bm25_prune_partitions(
        spark, path, expected_batch_queries=50_000_000, max_df_ratio=0.2)
    assert capped <= huge  # head terms dominate sum(df^2)
    with pytest.raises(ValueError):
        derive_bm25_prune_partitions(
            spark, path, expected_batch_queries=0)
    with pytest.raises(ValueError):
        streaming_bm25_against_index(
            spark, docs.limit(1), path, query_id="doc_id",
            query_col="text", prune_topk=3, prune_partitions="wide",
        )


def test_streaming_bm25_max_df_ratio_equals_batch(spark, sf_dir, tmp_path):
    """The stopword-impact pruning semi-join must behave identically
    stream-static."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.streaming import (
        final_bm25_topk, run_available_now, streaming_bm25_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm")
    lt.save_bm25_index(docs, path)
    q = docs.filter(F.col("doc_id") % 70 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    src = str(tmp_path / "qstream2")
    q.write.parquet(src)
    sdf = spark.readStream.schema(q.schema).parquet(src)
    drained = run_available_now(
        streaming_bm25_against_index(spark, sdf, path,
                                     max_df_ratio=0.82),
        output_mode="append",
    )
    got = sorted(map(tuple, final_bm25_topk(drained, k=5).collect()))
    want = sorted(map(tuple, lt.bm25_topk_indexed(
        spark, path, q, k=5, max_df_ratio=0.82).collect()))
    assert got == want and got


def test_final_hybrid_rrf_equals_batch_arm_fusion(spark, sf_dir, tmp_path):
    """The streaming hybrid (both arms drained statelessly, fused at
    drain) must equal fusing the two BATCH indexed serves."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.operators.search import rrf_fuse
    from linktransformer_spark.streaming import (
        final_hybrid_rrf, run_available_now,
        streaming_ann_against_index, streaming_bm25_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bm_path, ivf_path = str(tmp_path / "bm"), str(tmp_path / "ivf")
    lt.save_bm25_index(docs, bm_path)
    lt.save_ivf_index(emb, ivf_path, n_cells=16, mode="seeded")
    qt = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    qv = emb.filter(F.col("vec_id") % 50 == 0).select(
        "vec_id", "embedding"
    )
    for df, name in ((qt, "qt"), (qv, "qv")):
        df.repartition(2).write.parquet(str(tmp_path / name))
    sqt = spark.readStream.schema(qt.schema).option(
        "maxFilesPerTrigger", 1).parquet(str(tmp_path / "qt"))
    sqv = spark.readStream.schema(qv.schema).option(
        "maxFilesPerTrigger", 1).parquet(str(tmp_path / "qv"))
    bm_drained = run_available_now(
        streaming_bm25_against_index(spark, sqt, bm_path),
        output_mode="append",
    )
    ann_drained = run_available_now(
        streaming_ann_against_index(spark, sqv, ivf_path, n_probe=4),
        output_mode="append",
    )
    got = sorted(map(tuple, final_hybrid_rrf(
        bm_drained, ann_drained, k=10, k_arm=10).collect()))

    bm = lt.bm25_topk_indexed(spark, bm_path, qt, k=10).select(
        "q_id", "doc_id", "rank")
    an = lt.ann_topk_ivf_indexed(
        spark, ivf_path, qv, k=10, n_probe=4
    ).select(
        F.col("query_id").alias("q_id"),
        F.col("neighbor_id").alias("doc_id"), "rank",
    )
    want = sorted(map(tuple, rrf_fuse(
        [bm, an], query_id="q_id", id_col="doc_id", k=10).collect()))
    assert got == want and got


def test_streaming_pq_against_index_equals_batch(spark, sf_dir, tmp_path):
    """Multi-micro-batch streaming serve of the r90 PQ index must
    equal the batch indexed serve exactly (same probe kernels, same
    ADC fold order, same drain shortlist + exact re-rank), including
    tombstone masking."""
    import linktransformer_spark as lt
    from linktransformer_spark.streaming import (
        final_pq_topk, run_available_now, streaming_pq_against_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "pq")
    lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
    lt.delete_from_pq_index(
        emb.filter(F.col("vec_id") % 9 == 4).select("vec_id"), path
    )
    q = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    src = str(tmp_path / "qstream")
    q.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drained = run_available_now(
        streaming_pq_against_index(spark, sdf, path, n_probe=3, k=5,
                                   retrieve_k=40),
        output_mode="append",
    )
    got = {(r["query_id"], r["neighbor_id"], r["rank"], round(r["score"], 9))
           for r in final_pq_topk(spark, drained, path, q, k=5,
                                  retrieve_k=40).collect()}
    want = {(r["query_id"], r["neighbor_id"], r["rank"], round(r["score"], 9))
            for r in lt.ann_topk_pq_indexed(spark, path, q, k=5, n_probe=3,
                                            retrieve_k=40).collect()}
    assert got == want and got
    assert not any(n % 9 == 4 for _, n, *_ in got)


def test_run_upsert_stream_equals_one_call(spark, sf_dir, tmp_path):
    """CDC-style streaming maintenance: a multi-micro-batch stream of
    upsert rows (unique ids) through run_upsert_stream must leave the
    PQ index bit-identical in serve to the ONE-CALL upsert of the same
    batch (sequential per-epoch upserts under the writer lock)."""
    import linktransformer_spark as lt
    from linktransformer_spark.streaming import run_upsert_stream

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = (
        emb.filter(F.col("vec_id") % 10 == 3)
        .select("vec_id", F.reverse("embedding").alias("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 7).select(
                (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
            )
        )
    )
    paths = {}
    for mode in ("stream", "onecall"):
        path = str(tmp_path / f"pq_{mode}")
        lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
        lt.delete_from_pq_index(
            emb.filter(F.col("vec_id") % 20 == 3).select("vec_id"), path
        )
        paths[mode] = path
    src = str(tmp_path / "upstream")
    batch.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    n_batches = run_upsert_stream(sdf, paths["stream"], "pq")
    assert n_batches >= 2  # genuinely multi-micro-batch
    lt.upsert_pq_index(batch, paths["onecall"])
    q = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    got = {}
    for mode, path in paths.items():
        got[mode] = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"],
             round(r["score"], 9))
            for r in lt.ann_topk_pq_indexed(
                spark, path, q, k=5, n_probe=4, retrieve_k=40
            ).collect()
        )
    assert got["stream"] == got["onecall"] and got["stream"]

    with pytest.raises(ValueError, match="unknown index family"):
        run_upsert_stream(sdf, paths["stream"], "bogus")


def test_run_upsert_stream_bm25_and_minhash(spark, sf_dir, tmp_path):
    """The other two families through the streaming sink: each must
    equal its one-call upsert on serve (BM25 under the frozen-stats
    append contract; MinHash under the relation-wide rewrite)."""
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.streaming import run_upsert_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select("doc_id", F.upper("text").alias("text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + 90000).alias("doc_id"), "text"
            )
        )
    )
    src = str(tmp_path / "upstream_docs")
    batch.repartition(3).write.parquet(src)

    # BM25
    paths = {}
    for mode in ("stream", "onecall"):
        p = str(tmp_path / f"bm_{mode}")
        lt.save_bm25_index(docs, p)
        paths[mode] = p
    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    assert run_upsert_stream(sdf, paths["stream"], "bm25") >= 2
    lt.upsert_bm25_index(batch, paths["onecall"])
    q = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    got = {m: sorted(map(tuple, lt.bm25_topk_indexed(
        spark, p, q, k=5).collect())) for m, p in paths.items()}
    assert got["stream"] == got["onecall"] and got["stream"]

    # MinHash
    mpaths = {}
    for mode in ("stream", "onecall"):
        p = str(tmp_path / f"mh_{mode}")
        lt.save_minhash_index(docs, p, on="text", id_col="doc_id")
        mpaths[mode] = p
    sdf2 = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    assert run_upsert_stream(sdf2, mpaths["stream"], "minhash",
                             on="text", id_col="doc_id") >= 2
    lt.upsert_minhash_index(batch, mpaths["onecall"], on="text",
                            id_col="doc_id")
    probe = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    got = {m: sorted(
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against_index(
            probe, p, on="text", id_col="doc_id", threshold=0.4
        ).collect()
    ) for m, p in mpaths.items()}
    assert got["stream"] == got["onecall"] and got["stream"]


def test_streaming_serve_empty_query_stream(spark, sf_dir, tmp_path):
    """An EMPTY query stream must drain to zero rows and every
    finalizer must return an empty, correctly-shaped frame — not
    crash (the zero-batch mapInPandas / empty-window edge)."""
    import linktransformer_spark as lt
    from linktransformer_spark.streaming import (
        final_bm25_topk, final_hybrid_rrf, final_pq_topk,
        run_available_now, streaming_bm25_against_index,
        streaming_pq_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bm_path, pq_path = str(tmp_path / "bm"), str(tmp_path / "pq")
    lt.save_bm25_index(docs.limit(100), bm_path)
    lt.save_pq_index(emb.limit(200), pq_path, n_cells=4, m=8,
                     n_codes=16)

    qt = docs.filter(F.col("doc_id") < 0).select(
        F.col("doc_id").alias("q_id"), F.col("text").alias("q_text")
    )
    qv = emb.filter(F.col("vec_id") < 0).select("vec_id", "embedding")
    st, sv = str(tmp_path / "qt"), str(tmp_path / "qv")
    qt.write.parquet(st)
    qv.write.parquet(sv)
    sqt = spark.readStream.schema(qt.schema).parquet(st)
    sqv = spark.readStream.schema(qv.schema).parquet(sv)

    bm_drained = run_available_now(
        streaming_bm25_against_index(spark, sqt, bm_path, prune_topk=5),
        output_mode="append",
    )
    pq_drained = run_available_now(
        streaming_pq_against_index(spark, sqv, pq_path, n_probe=2),
        output_mode="append",
    )
    assert bm_drained.count() == 0 and pq_drained.count() == 0
    out_bm = final_bm25_topk(bm_drained, k=5)
    assert out_bm.count() == 0
    assert out_bm.columns == ["q_id", "doc_id", "rank", "score",
                              "n_terms"]
    out_pq = final_pq_topk(spark, pq_drained, pq_path, qv, k=5)
    assert out_pq.count() == 0
    assert out_pq.columns == ["query_id", "neighbor_id", "rank",
                              "score"]
    out_h = final_hybrid_rrf(bm_drained, pq_drained.select(
        F.col("_qid").alias("query_id"),
        F.col("_cid").alias("neighbor_id"),
        F.lit(1).alias("rank"),
        F.col("_adc").alias("score"),
    ), k=5)
    assert out_h.count() == 0


def test_streaming_pq_pruning_under_total_ties(spark, tmp_path):
    """Adversarial tie shape: every corpus vector IDENTICAL, so every
    ADC score ties and the per-scope top-retrieve_k pruning must
    resolve purely on the (score DESC, id ASC) tie-break at every
    boundary — stream must equal batch exactly (smallest ids win)."""
    import linktransformer_spark as lt
    from linktransformer_spark.streaming import (
        final_pq_topk, run_available_now, streaming_pq_against_index,
    )

    v = [float((j * 3) % 7 - 3) for j in range(16)]
    emb = spark.createDataFrame(
        [(i, v) for i in range(300)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "pq")
    lt.save_pq_index(emb, path, n_cells=4, m=4, n_codes=8)
    q = emb.filter(F.col("vec_id") < 10)
    src = str(tmp_path / "qs")
    q.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    drained = run_available_now(
        streaming_pq_against_index(spark, sdf, path, n_probe=2, k=5,
                                   retrieve_k=20),
        output_mode="append",
    )
    got = sorted(map(tuple, final_pq_topk(
        spark, drained, path, q, k=5, retrieve_k=20).collect()))
    want = sorted(map(tuple, lt.ann_topk_pq_indexed(
        spark, path, q, k=5, n_probe=2, retrieve_k=20).collect()))
    assert got == want and got
    # ties resolve to the smallest ids everywhere
    assert all(r[1] in range(5) for r in got)
