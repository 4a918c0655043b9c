#!/usr/bin/env python
"""Scale-evidence sweep for the STREAMING drains (PLANS.md batch 4b).

The round-8 sweep measured 18 batch families; the streaming paths had
state-size models but no 10x measurement. Same protocol: each entry
drains (trigger availableNow -> memory sink) at /root/testdata/sf0.1
and at the generated ~sf1 decade, 1 warm + N timed drains, min
reported, plus the drained row count (the state/result volume the sink
materializes).

Workloads scale WITH the data (proportional slices), except
stream_ann_ivf_indexed, which keeps a FIXED 2000-query stream against
a 10x index — the serving contract under which wall must track the
query stream, not the corpus.

Usage: python tools/stream_scale_sweep.py [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import linktransformer_spark as lt  # noqa: E402
from linktransformer_spark.sources.tables import read_table  # noqa: E402
from linktransformer_spark.streaming import (  # noqa: E402
    read_stream_table,
    run_available_now,
)

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("LT_SCALE_DIR", "/tmp/lt_scale/sf1")

FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def drains(spark):
    from linktransformer_spark.streaming.ops import (
        streaming_ann_against_index,
        streaming_dedup_against,
        streaming_funnel_steps,
        streaming_retention_activity,
        streaming_semdedup_against,
        streaming_transitions,
    )

    def stream_dedup_against(sf_dir):
        # static seen side and new stream BOTH scale with the data
        # (half the corpus each) — the ingest-time near-dup guard
        seen = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 2 == 0
        ).select("doc_id", "text")
        nw = read_stream_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 2 == 1
        ).select("doc_id", "text")
        out = streaming_dedup_against(
            nw, seen, on="text", id_col="doc_id", threshold=0.6,
            num_hashes=24, bands=8, shingle=3, word=True,
        )
        return run_available_now(out, output_mode="append")

    def stream_semdedup_against(sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(F.col("vec_id") % 2 == 0)
        nw = read_stream_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 2 == 1
        )
        out = streaming_semdedup_against(
            nw, corpus, vector_col="embedding", id_col="vec_id",
            threshold=0.3, n_cells="auto",
        )
        return run_available_now(out, output_mode="append")

    def stream_funnel(sf_dir):
        ev = read_stream_table(spark, sf_dir, "events")
        sdf = streaming_funnel_steps(ev, FUNNEL_STEPS, within=259200)
        return run_available_now(sdf, output_mode="update")

    _idx = {}

    def stream_ann_ivf_indexed(sf_dir):
        # FIXED 2000-query stream vs a 10x index (auto-sized cells at
        # build) — the serving contract; the r8 batch counterpart of
        # this entry (pinned n_cells=16) measured 7.1x
        import tempfile

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _idx:
            path = tempfile.mkdtemp(prefix="lt_ss_ivf_")
            lt.save_ivf_index(emb, path, n_cells="auto", mode="seeded")
            _idx[sf_dir] = path
        q = read_stream_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 2000
        )
        out = streaming_ann_against_index(
            spark, q, _idx[sf_dir], vector_col="embedding",
            query_id="vec_id", n_probe=4,
        )
        return run_available_now(out, output_mode="append")

    _bm_idx = {}

    def stream_bm25_indexed(sf_dir):
        # FIXED ~500-query stream vs a 10x impact index (built once
        # per sf) — the serving contract: wall must track the query
        # stream, not the corpus; postings re-read per micro-batch
        # (the documented stream-static trade)
        import tempfile

        from linktransformer_spark.functions import similarity as S
        from linktransformer_spark.streaming.ops import (
            streaming_bm25_against_index,
        )

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _bm_idx:
            path = tempfile.mkdtemp(prefix="lt_ss_bm_")
            lt.save_bm25_index(docs, path)
            _bm_idx[sf_dir] = path
        q = read_stream_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 500
        ).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        )
        out = streaming_bm25_against_index(spark, q, _bm_idx[sf_dir])
        return run_available_now(out, output_mode="append")

    def stream_bm25_pruned(sf_dir):
        # the round-11 production form: same fixed query stream, the
        # score-bounded drain — sink ~constant in the corpus
        import tempfile

        from linktransformer_spark.functions import similarity as S
        from linktransformer_spark.streaming.ops import (
            streaming_bm25_against_index,
        )

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _bm_idx:
            path = tempfile.mkdtemp(prefix="lt_ss_bm_")
            lt.save_bm25_index(docs, path)
            _bm_idx[sf_dir] = path
        q = read_stream_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 500
        ).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        )
        out = streaming_bm25_against_index(spark, q, _bm_idx[sf_dir],
                                           prune_topk=5)
        return run_available_now(out, output_mode="append")

    _pq_idx = {}

    def stream_pq_indexed(sf_dir):
        # FIXED 2000-query stream vs a 10x r90 serving index
        # (auto knobs at build)
        import tempfile

        from linktransformer_spark.streaming.ops import (
            streaming_pq_against_index,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _pq_idx:
            path = tempfile.mkdtemp(prefix="lt_ss_pq_")
            lt.save_pq_index(emb, path)
            _pq_idx[sf_dir] = path
        q = read_stream_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 2000
        )
        out = streaming_pq_against_index(spark, q, _pq_idx[sf_dir])
        return run_available_now(out, output_mode="append")

    def stream_contamination(sf_dir):
        from linktransformer_spark.streaming.ops import (
            streaming_contamination,
        )

        docs = read_table(spark, sf_dir, "documents")
        bench = docs.filter(F.col("doc_id") % 10 == 7).select(
            "doc_id", "text"
        )
        nw = read_stream_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 7
        ).select("doc_id", "text")
        out = streaming_contamination(nw, bench, on="text", n=8)
        return run_available_now(out, output_mode="append")

    _mh_idx = {}

    def stream_dedup_against_index(sf_dir):
        # same workload as stream_dedup_against, static side read from
        # a PERSISTED minhash index (built once per sf) — the round-9
        # long-running ingest shape: the drain should beat the
        # in-memory twin by the seen side's signature build, and scale
        # the same way in the join
        import tempfile

        from linktransformer_spark.operators.dedup import (
            save_minhash_index,
        )
        from linktransformer_spark.streaming.ops import (
            streaming_dedup_against_index,
        )

        seen = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 2 == 0
        ).select("doc_id", "text")
        if sf_dir not in _mh_idx:
            path = tempfile.mkdtemp(prefix="lt_ss_mh_")
            save_minhash_index(seen, path, on="text", id_col="doc_id")
            _mh_idx[sf_dir] = path
        nw = read_stream_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 2 == 1
        ).select("doc_id", "text")
        out = streaming_dedup_against_index(
            nw, _mh_idx[sf_dir], on="text", id_col="doc_id", threshold=0.6
        )
        return run_available_now(out, output_mode="append")

    def stream_retention(sf_dir):
        ev = read_stream_table(spark, sf_dir, "events")
        out = streaming_retention_activity(ev)
        return run_available_now(out, output_mode="update")

    def stream_transitions(sf_dir):
        ev = read_stream_table(spark, sf_dir, "events")
        out = streaming_transitions(ev, tiebreak_col="event_id")
        return run_available_now(out, output_mode="append")

    return {
        "stream_dedup_against": stream_dedup_against,
        "stream_dedup_against_index": stream_dedup_against_index,
        "stream_semdedup_against": stream_semdedup_against,
        "stream_funnel": stream_funnel,
        "stream_ann_ivf_indexed": stream_ann_ivf_indexed,
        "stream_bm25_indexed": stream_bm25_indexed,
        "stream_bm25_pruned": stream_bm25_pruned,
        "stream_pq_indexed": stream_pq_indexed,
        "stream_contamination": stream_contamination,
        "stream_retention": stream_retention,
        "stream_transitions": stream_transitions,
    }


def main() -> None:
    spark = lt.get_spark(
        "lt-stream-sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    fns = drains(spark)
    names = sys.argv[1:] or list(fns)
    runs_per = int(os.environ.get("LT_SCALE_RUNS", "2"))
    results: dict[str, dict] = {}
    for name in names:
        fn = fns[name]
        results[name] = {}
        for sf_dir, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
            fn(sf_dir).count()  # warm: index builds, JIT, workers
            best, rows = float("inf"), 0
            for _ in range(runs_per):
                t0 = time.time()
                rows = fn(sf_dir).count()
                best = min(best, time.time() - t0)
            results[name][tag] = round(best, 2)
            results[name][f"{tag}_rows"] = rows
            print(
                f"# {name} @ {tag}: {results[name][tag]}s ({rows} drained rows)",
                file=sys.stderr,
            )
    print("| entry | sf0.1 (s) | sf1 (s) | ratio @10x | drained rows sf0.1 -> sf1 |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        ratio = r["sf1"] / max(r["sf0.1"], 1e-9)
        print(
            f"| {name} | {r['sf0.1']} | {r['sf1']} | {ratio:.1f}x | "
            f"{r['sf0.1_rows']} -> {r['sf1_rows']} |"
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
