"""Measure the text-dependent paths on the realistic Zipf-vocab corpus
next to the shipped 31-word-vocab corpus (round-10 verdict item 6).

Two named artifacts trace to the synthetic generator, not the plans:
- the 31-word vocab makes every BM25 term a stopword (df ~ corpus), so
  from-scratch BM25 and serve walls look quadratic at fixed queries;
- TPC-H names differ only in their digits, so the merge-LSH hyperplane
  buckets barely discriminate (~6x candidate inflation) and the route
  recall reads worse than real text would.

This sweep runs search_bm25 (from-scratch), the BM25 index build +
indexed serve, and the merge auto->LSH route (wall + pair recall vs
exact) on BOTH corpora at the same scale. Output: the PLANS.md
round-10 batch-5 table.

Usage: python tools/zipf_corpus_bench.py [n_docs]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import linktransformer_spark as lt
from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
SF = "/root/testdata/sf0.1"


def _bm25_queries(docs, n_docs):
    from linktransformer_spark.functions import similarity as S

    # FIXED ~100-query batch regardless of corpus size — the round-8
    # sweep's lesson: a corpus-proportional query batch confounds the
    # corpus-scaling readout (and on the all-stopword vocab31 corpus
    # at 50k docs it pushes one from-scratch run past 5 minutes)
    step = max(1, n_docs // 100)
    return docs.filter(F.col("doc_id") % step == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )


def _timed(fn, runs=3):
    fn()  # warm
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        w = time.time() - t0
        best = w if best is None or w < best else best
    return best, n


def main():
    from tools.gen_scale_data import gen_zipf_documents
    import pyarrow.parquet as pq

    spark = lt.get_spark("zipf-bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    zdir = tempfile.mkdtemp(prefix="lt_zipf_docs_")
    pq.write_table(gen_zipf_documents(N_DOCS), f"{zdir}/documents_zipf.parquet")

    # >5000 docs: the shipped sf0.1 corpus tops out at 5k — read the
    # deterministic generated sf1 twin (tools/gen_scale_data.py) instead
    v31_src = SF if N_DOCS <= 5000 else os.environ.get(
        "LT_SCALE_DIR", "/tmp/lt_scale/sf1"
    )
    corpora = {
        "vocab31": spark.read.parquet(f"{v31_src}/documents.parquet")
        .select("doc_id", "text").limit(N_DOCS),
        "zipf12k": spark.read.parquet(f"{zdir}/documents_zipf.parquet")
        .select("doc_id", "text"),
    }

    print(f"n_docs={N_DOCS}\n")
    print("| corpus | bm25_scratch_s | index_build_s | serve_s |")
    print("|---|---|---|---|")
    idx_paths = {}
    for name, docs in corpora.items():
        docs = docs.localCheckpoint(eager=True)
        qs = _bm25_queries(docs, N_DOCS).localCheckpoint(eager=True)
        w_scr, _ = _timed(lambda: lt.bm25_topk(docs, qs, k=10).count())
        path = tempfile.mkdtemp(prefix=f"lt_zipf_bm_{name}_")
        t0 = time.time()
        lt.save_bm25_index(docs, path)
        w_build = time.time() - t0
        idx_paths[name] = path
        w_srv, _ = _timed(
            lambda: lt.bm25_topk_indexed(spark, path, qs, k=10).count()
        )
        print(f"| {name} | {w_scr:.2f} | {w_build:.2f} | {w_srv:.2f} |")

    # merge auto->LSH route: TPC-H digit-names vs zipf titles, same
    # 2000 x 1000 shape as the bench entry
    # pair_recall@3 matches the bench operating point; recall@1 is the
    # matching-task readout (the zipf left rows have exactly ONE true
    # near match, so the @3 number is noise-diluted by construction —
    # ranks 2-3 are arbitrary weak neighbors for ANY method)
    print("\n| keys | lsh_wall_s | exact_wall_s | recall@3 | recall@1 |")
    print("|---|---|---|---|---|")
    from linktransformer_spark.operators.knn_join import AUTO_LSH_CONF

    zdocs = spark.read.parquet(f"{zdir}/documents_zipf.parquet")
    shapes = {
        "tpch_names": (
            spark.read.parquet(f"{SF}/customer.parquet")
            .filter(F.col("c_custkey") <= 2000)
            .select(F.col("c_custkey").alias("lid"),
                    F.col("c_name").alias("lkey")),
            spark.read.parquet(f"{SF}/supplier.parquet")
            .select(F.col("s_suppkey").alias("rid"),
                    F.col("s_name").alias("rkey")),
        ),
        # left = PERTURBED right titles (drop the last token / swap the
        # first for a common word) — a realistic matching task where
        # true near-matches exist. Independent random titles would make
        # "top-3 neighbors" arbitrary near-orthogonal rows and recall
        # meaningless for ANY method (measured 0.25 on that shape —
        # not an LSH defect, there was nothing to find).
        "zipf_titles": (
            zdocs.filter((F.col("doc_id") >= 2000) & (F.col("doc_id") < 3000))
            .select(
                F.col("doc_id").alias("lid"),
                F.array_join(
                    F.slice(F.split(F.col("title"), " "), 1,
                            F.size(F.split(F.col("title"), " ")) - 1),
                    " ",
                ).alias("lkey"),
            )
            .unionByName(
                zdocs.filter(
                    (F.col("doc_id") >= 2000) & (F.col("doc_id") < 3000)
                ).select(
                    (F.col("doc_id") + 1000).alias("lid"),
                    F.concat(
                        F.lit("the "),
                        F.array_join(
                            F.slice(F.split(F.col("title"), " "), 2, 99),
                            " ",
                        ),
                    ).alias("lkey"),
                )
            ),
            zdocs.filter((F.col("doc_id") >= 2000) & (F.col("doc_id") < 3000))
            .select(F.col("doc_id").alias("rid"),
                    F.col("title").alias("rkey")),
        ),
    }
    for name, (l, r) in shapes.items():
        l = l.localCheckpoint(eager=True)
        r = r.localCheckpoint(eager=True)
        kw = dict(left_on="lkey", right_on="rkey", model="hash-ngram",
                  k=3, left_id_col="lid", right_id_col="rid")

        def run_lsh():
            spark.conf.set(AUTO_LSH_CONF, "1")
            try:
                return lt.merge_knn(l, r, mode="auto", **kw).count()
            finally:
                spark.conf.unset(AUTO_LSH_CONF)

        def run_exact():
            return lt.merge_knn(l, r, mode="exact_cross", **kw).count()

        w_lsh, _ = _timed(run_lsh)
        w_ex, _ = _timed(run_exact)
        rec = {}
        for kk in (3, 1):
            kw_k = dict(kw, k=kk)
            exact_p = (
                lt.merge_knn(l, r, mode="exact_cross", **kw_k)
                .select("lid", "rid").localCheckpoint(eager=True)
            )
            spark.conf.set(AUTO_LSH_CONF, "1")
            try:
                lsh_p = lt.merge_knn(l, r, mode="auto", **kw_k).select(
                    "lid", "rid"
                )
                hit = exact_p.join(lsh_p, ["lid", "rid"]).count()
            finally:
                spark.conf.unset(AUTO_LSH_CONF)
            rec[kk] = hit / max(exact_p.count(), 1)
        print(f"| {name} | {w_lsh:.2f} | {w_ex:.2f} | "
              f"{rec[3]:.4f} | {rec[1]:.4f} |")
    spark.stop()


if __name__ == "__main__":
    main()
