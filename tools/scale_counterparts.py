#!/usr/bin/env python
"""Knob counterparts for the super-linear scale-sweep entries.

Each super-linear entry in tools/scale_sweep.py has a documented scale
knob; this harness measures the SAME operator with the knob engaged at
both SFs, so PLANS.md can pair every super-linear measurement with its
measured fix:

- merge_knn exact-cross (O(L*R) by definition) -> mode='broadcast_knn'
- er_resolve_lsh pinned n_planes=9 -> n_planes='auto' (13 at 150k keys)
- semdedup pinned n_cells=16 -> n_cells='auto' (ceil(n/256))
- bm25_indexed with a corpus-proportional query batch -> FIXED 100-query
  batch (the serving contract: retrieval cost tracks the query batch)
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

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("LT_SCALE_DIR", "/tmp/lt_scale/sf1")


def counterparts(spark):
    def merge_knn_broadcast(sf_dir):
        cust = read_table(spark, sf_dir, "customer")
        supp = read_table(spark, sf_dir, "supplier")
        return lt.merge_knn(
            cust, supp, left_on="c_name", right_on="s_name",
            model="hash-ngram", mode="broadcast_knn", k=3,
            left_id_col="c_custkey", right_id_col="s_suppkey",
        )

    def er_resolve_lsh_auto(sf_dir):
        cust = read_table(spark, sf_dir, "customer")
        supp = read_table(spark, sf_dir, "supplier")
        return lt.resolve_entities(
            cust, supp, left_on="c_name", right_on="s_name",
            left_id_col="c_custkey", right_id_col="s_suppkey",
            sim_threshold=0.8, blocking="lsh", model="hash-ngram",
            n_planes="auto", lsh_dim=64,
        )

    def semdedup_auto(sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        return lt.semantic_dedup(
            emb, "embedding", "vec_id", threshold=0.3, n_cells="auto"
        ).select("vec_id")

    _idx = {}

    def bm25_fixed_queries(sf_dir):
        import tempfile

        from linktransformer_spark.functions import similarity as S

        docs = read_table(spark, sf_dir, "documents")
        if sf_dir not in _idx:
            path = tempfile.mkdtemp(prefix="lt_cp_bm25_")
            lt.save_bm25_index(docs, path)
            _idx[sf_dir] = path
        queries = docs.filter(F.col("doc_id") < 100).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        )
        return lt.bm25_topk_indexed(spark, _idx[sf_dir], queries, k=5)

    _ivf_auto = {}

    def ann_ivf_indexed_auto(sf_dir):
        # direct counterpart of the r8 sweep's ann_ivf_indexed 7.1x
        # entry: same FIXED 500-query batch, but the index is built
        # with n_cells='auto' (ceil(n/256)) so per-cell rows — and
        # per-probe scan work — stay ~constant as the corpus grows
        import tempfile

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _ivf_auto:
            path = tempfile.mkdtemp(prefix="lt_cp_ivf_auto_")
            lt.save_ivf_index(emb, path, n_cells="auto", mode="seeded")
            _ivf_auto[sf_dir] = path
        q = emb.filter(F.col("vec_id") < 500)
        return lt.ann_topk_ivf_indexed(
            spark, _ivf_auto[sf_dir], q, k=10, n_probe=4)

    _pq = {}

    def ann_serve_r90_indexed(sf_dir):
        # THE serving default (operators/serving.py): PQ index built
        # once per sf (auto knobs resolve against the actual corpus
        # count), then a FIXED 2000-query batch served against it —
        # the serving contract under which wall must track the query
        # batch, not the corpus. Counterpart of the r8 sweep's
        # ann_ivf_indexed 7.1x entry (pinned n_cells=16 at build).
        import tempfile

        emb = read_table(spark, sf_dir, "embeddings")
        if sf_dir not in _pq:
            path = tempfile.mkdtemp(prefix="lt_cp_pq_")
            lt.save_pq_index(emb, path)
            _pq[sf_dir] = path
        q = emb.filter(F.col("vec_id") < 2000)
        return lt.ann_topk_pq_indexed(spark, _pq[sf_dir], q, k=10)

    return {
        "merge_knn_broadcast": merge_knn_broadcast,
        "er_resolve_lsh_auto": er_resolve_lsh_auto,
        "semdedup_auto": semdedup_auto,
        "bm25_fixed_queries": bm25_fixed_queries,
        "ann_ivf_indexed_auto": ann_ivf_indexed_auto,
        "ann_serve_r90_indexed": ann_serve_r90_indexed,
    }


def main() -> None:
    spark = lt.get_spark(
        "lt-scale-cp", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    fns = counterparts(spark)
    names = sys.argv[1:] or list(fns)
    results = {}
    for name in names:
        fn = fns[name]
        results[name] = {}
        for sf_dir, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
            fn(sf_dir).count()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n = fn(sf_dir).count()
                best = min(best, time.time() - t0)
            results[name][tag] = round(best, 2)
            print(f"# {name} @ {tag}: {results[name][tag]}s ({n} rows)",
                  file=sys.stderr)
    for name, r in results.items():
        print(f"| {name} | {r['sf0.1']} | {r['sf1']} | "
              f"{r['sf1'] / max(r['sf0.1'], 1e-9):.1f}x |")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
