"""Measure the serve-time cost of index tombstones at two scales.

Protocol (same as tools/scale_sweep.py): local[32], shuffle=32, one
warm run + 2 timed, min reported. For BM25 and IVF at sf0.1 and the
generated sf1 (/tmp/lt_scale/sf1):

- baseline: serve against a clean index;
- tomb10: serve with 10%% of the corpus tombstoned (the anti-join in
  the plan, delete set = |corpus|/10 ids);
- purged: serve against the physically purged index (anti-join gone,
  masked rows gone).

The claim under test: tombstones cost one hash anti-join against an
ids-only relation — bounded, scale-stable — and a purge returns serve
to baseline shape. Results land in PLANS.md (round 9).
"""
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
import linktransformer_spark as lt  # noqa: E402
from linktransformer_spark.functions import similarity as S  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/lt_scale/sf1",
}


def timed(fn, n=2):
    fn()  # warm
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf, d in SFS.items():
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        queries = docs.filter(F.col("doc_id") % 50 == 0).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(S.word_tokens(F.col("text")), 1, 8), " "
            ).alias("q_text"),
        ).limit(500).localCheckpoint()
        qv = emb.filter(F.col("vec_id") < 2000).localCheckpoint()

        # --- BM25 ---
        bp = f"/tmp/lt_delsweep_bm25_{sf}"
        lt.save_bm25_index(docs, bp)
        r = {}
        r["bm25_serve_clean"] = timed(
            lambda: lt.bm25_topk_indexed(spark, bp, queries, k=10).count()
        )
        lt.delete_from_bm25_index(
            docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"), bp
        )
        r["bm25_serve_tomb10"] = timed(
            lambda: lt.bm25_topk_indexed(spark, bp, queries, k=10).count()
        )
        bo = f"/tmp/lt_delsweep_bm25p_{sf}"
        t0 = time.time()
        lt.compact_bm25_index(spark, bp, bo)
        r["bm25_purge_wall"] = round(time.time() - t0, 3)
        r["bm25_serve_purged"] = timed(
            lambda: lt.bm25_topk_indexed(spark, bo, queries, k=10).count()
        )

        # --- IVF ---
        ip = f"/tmp/lt_delsweep_ivf_{sf}"
        lt.save_ivf_index(emb, ip)  # n_cells='auto'
        r["ivf_serve_clean"] = timed(
            lambda: lt.ann_topk_ivf_indexed(spark, ip, qv, k=10, n_probe=4)
            .count()
        )
        lt.delete_from_ivf_index(
            emb.filter(F.col("vec_id") % 10 == 3).select("vec_id"), ip
        )
        r["ivf_serve_tomb10"] = timed(
            lambda: lt.ann_topk_ivf_indexed(spark, ip, qv, k=10, n_probe=4)
            .count()
        )
        io = f"/tmp/lt_delsweep_ivfp_{sf}"
        t0 = time.time()
        lt.purge_ivf_index(spark, ip, io)
        r["ivf_purge_wall"] = round(time.time() - t0, 3)
        r["ivf_serve_purged"] = timed(
            lambda: lt.ann_topk_ivf_indexed(spark, io, qv, k=10, n_probe=4)
            .count()
        )
        out[sf] = r
        print(sf, json.dumps(r), flush=True)
    print(json.dumps(out))


def vector_and_minhash():
    """Second half of the round-9 table: PQ serve and the MinHash
    against-index ingest under 10% tombstones, both scales."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf, d in SFS.items():
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        qv = emb.filter(F.col("vec_id") < 2000).localCheckpoint()
        r = {}

        pp = f"/tmp/lt_delsweep_pq_{sf}"
        lt.save_pq_index(emb, pp)
        kw = dict(k=10, n_probe="auto", retrieve_k="auto")
        r["pq_serve_clean"] = timed(
            lambda: lt.ann_topk_pq_indexed(spark, pp, qv, **kw).count()
        )
        lt.delete_from_pq_index(
            emb.filter(F.col("vec_id") % 10 == 3).select("vec_id"), pp
        )
        r["pq_serve_tomb10"] = timed(
            lambda: lt.ann_topk_pq_indexed(spark, pp, qv, **kw).count()
        )
        po = f"/tmp/lt_delsweep_pqp_{sf}"
        t0 = time.time()
        lt.purge_pq_index(spark, pp, po)
        r["pq_purge_wall"] = round(time.time() - t0, 3)
        r["pq_serve_purged"] = timed(
            lambda: lt.ann_topk_pq_indexed(spark, po, qv, **kw).count()
        )

        from linktransformer_spark.operators.dedup import (
            delete_from_minhash_index,
            near_dup_pairs_minhash_against_index,
            purge_minhash_index,
            save_minhash_index,
        )

        seen = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
        new = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "text"
        ).localCheckpoint()
        mp = f"/tmp/lt_delsweep_mh_{sf}"
        save_minhash_index(seen, mp, on="text", id_col="doc_id")
        mkw = dict(on="text", id_col="doc_id", threshold=0.6)
        r["mh_ingest_clean"] = timed(
            lambda: near_dup_pairs_minhash_against_index(
                new, mp, **mkw).count()
        )
        delete_from_minhash_index(
            seen.filter(F.col("doc_id") % 10 == 4).select("doc_id"), mp,
            id_col="doc_id",
        )
        r["mh_ingest_tomb10"] = timed(
            lambda: near_dup_pairs_minhash_against_index(
                new, mp, **mkw).count()
        )
        mo = f"/tmp/lt_delsweep_mhp_{sf}"
        t0 = time.time()
        purge_minhash_index(spark, mp, mo)
        r["mh_purge_wall"] = round(time.time() - t0, 3)
        r["mh_ingest_purged"] = timed(
            lambda: near_dup_pairs_minhash_against_index(
                new, mo, **mkw).count()
        )
        out[sf] = r
        print(sf, json.dumps(r), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys as _s
    vector_and_minhash() if "vector" in _s.argv[1:] else main()
