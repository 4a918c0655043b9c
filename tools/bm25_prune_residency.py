#!/usr/bin/env python
"""BM25 streaming-prune partition-fold residency profile
(PLANS.md round 12 — VERDICT round-11 item 3).

`_prune_bm25_contributions` concatenates its partition's share of the
joined contribution relation in pandas before pruning — exact fold
order needs each (q, d) group's rows together and a stateless stream
cannot aggregate, so rows-per-partition IS the residency floor. This
profiles that residency at the sf1 decade (50k docs) via the batch
twin of the exact pre-prune relation (same join, same per-query
exchange): per-partition row counts + estimated bytes, plus the pruned
streaming drain wall. Scenarios: realistic SHORT keyword queries, the
pathological FAT query stream (full document texts), and the two
levers (max_df_ratio stopword pruning; prune_partitions widening).

Usage: python tools/bm25_prune_residency.py [scenario ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF1 = os.environ.get("LT_SCALE_DIR", "/tmp/lt_scale/sf1")

SCENARIOS = {
    # (query style, n_queries, max_df_ratio, prune_partitions)
    "short_1k": ("short", 1000, None, None),
    "short_5k": ("short", 5000, None, None),
    "fat_1k": ("fat", 1000, None, None),
    "fat_1k_df": ("fat", 1000, 0.5, None),
    "fat_1k_wide": ("fat", 1000, None, 256),
    # round-13: the df-stats auto width (derive_bm25_prune_partitions)
    # vs the hand-picked 256 above — same fat profile
    "fat_1k_auto": ("fat", 1000, None, "auto"),
    "fat_1k_df_auto": ("fat", 1000, 0.5, "auto"),
}


def main() -> None:
    import linktransformer_spark as lt
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.streaming import run_available_now
    from linktransformer_spark.streaming.ops import (
        final_bm25_topk, streaming_bm25_against_index,
    )

    names = sys.argv[1:] or list(SCENARIOS)
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("bm25_prune_residency")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF1}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = f"/tmp/lt_bm25_resid_{os.getpid()}"
    lt.save_bm25_index(docs, idx, text_col="text", id_col="doc_id")
    postings = spark.read.parquet(f"{idx}/postings")
    dfreq = spark.read.parquet(f"{idx}/dfreq")

    out = []
    from linktransformer_spark.streaming import (
        derive_bm25_prune_partitions,
    )

    for name in names:
        style, nq, mdr, pparts = SCENARIOS[name]
        if pparts == "auto":
            # resolve here so the batch residency twin measures the
            # SAME width the streaming call derives
            pparts = derive_bm25_prune_partitions(
                spark, idx, max_df_ratio=mdr, expected_batch_queries=nq
            )
            print(f"# {name}: auto width -> {pparts}", flush=True)
        qtext = (
            F.col("text") if style == "fat"
            else F.array_join(F.slice(S.word_tokens(F.col("text")), 1, 8),
                              " ")
        )
        queries = docs.filter(
            F.col("doc_id") % F.lit(max(1, 50000 // nq)) == 0
        ).select(F.col("doc_id").alias("q_id"), qtext.alias("query"))
        nq_actual = queries.count()

        # batch twin of the streaming pre-prune contribution relation:
        # distinct (q, term) x postings equi-join, then the SAME
        # per-query exchange the pruner uses
        qterms = queries.select(
            F.col("q_id").alias("_q"),
            F.explode(S.word_tokens(F.col("query"))).alias("term"),
        ).distinct()
        if mdr is not None:
            keep = dfreq.filter(
                F.col("df").cast("double")
                <= F.lit(mdr) * F.col("n_docs").cast("double")
            ).select("term")
            qterms = qterms.join(keep, "term", "left_semi")
        contrib = qterms.join(
            postings.select(
                "term", F.col("doc_id").alias("_d"),
                F.col("impact").alias("_c"),
            ),
            "term",
        )
        contrib = (contrib.repartition(pparts, "_q") if pparts
                   else contrib.repartition("_q"))
        per_part = (
            contrib.withColumn("_p", F.spark_partition_id())
            .groupBy("_p").count()
            .agg(
                F.count(F.lit(1)).alias("parts"),
                F.sum("count").alias("rows_total"),
                F.max("count").alias("rows_max_part"),
            ).first()
        )
        # ~41 bytes/contribution row in pandas (q int64, d int64,
        # c float64, term object ~ 17B for the short TPC-H-ish terms)
        est_mb = float(per_part["rows_max_part"]) * 41 / 1e6

        # pruned streaming drain wall (1 timed; relative magnitudes)
        src = f"/tmp/lt_bm25_resid_q_{os.getpid()}"
        queries.coalesce(8).write.mode("overwrite").parquet(src)
        sdf = spark.readStream.schema("q_id long, query string") \
            .parquet(src)
        t0 = time.time()
        drained = run_available_now(
            streaming_bm25_against_index(
                spark, sdf, idx, query_col="query", query_id="q_id",
                prune_topk=10, max_df_ratio=mdr,
                prune_partitions=pparts,
            ),
            output_mode="append",
        )
        final_bm25_topk(drained, k=10).count()
        wall = time.time() - t0
        out.append({
            "scenario": name, "n_queries": int(nq_actual),
            "contrib_rows_total": int(per_part["rows_total"]),
            "rows_max_partition": int(per_part["rows_max_part"]),
            "est_max_partition_mb": round(est_mb, 1),
            "pruned_drain_wall": round(wall, 2),
        })
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps({"profile": out}))


if __name__ == "__main__":
    main()
