#!/usr/bin/env python
"""Hot-registry fan-out sweep for streaming_attach_candidates
(PLANS.md round 12 — VERDICT round-11 item 2).

The attach drain emits one row per (record, entity) match at or above
sim_threshold — threshold-bounded only. A HOT registry block (many
entities sharing one blocking key, all similar enough to pass the
threshold) inflates the drained sink linearly in the block size even
though final_attach only ever reads each record's single best row.

Protocol: registry of E entities in ONE blocking block, each key a
near-variant of the record key (lev_sim >= threshold for all of them);
a stream of R records hits the block. Sweep E at fixed R, measure the
drained row count and wall, unpruned vs prune_topk=1 (the
final_attach-exact prune — selection order score DESC, entity ASC,
matched_key ASC, so the post-drain best-entity pick is bit-identical).

Usage: python tools/attach_fanout_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

R = 1000          # records in the stream
SWEEP_E = [500, 2000, 8000]   # hot-block registry sizes
THRESH = 0.62


def main() -> None:
    from linktransformer_spark.streaming import run_available_now
    from linktransformer_spark.streaming.ops import (
        final_attach, streaming_attach_candidates,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("attach_fanout_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src_root = f"/tmp/lt_attach_sweep_{os.getpid()}"
    records = spark.range(R).select(
        F.col("id").alias("rec_id"),
        F.format_string("acme industrial supply co %04d", F.col("id") % 50)
        .alias("name"),
        F.lit(7).alias("block"),
    )
    rec_src = f"{src_root}/records"
    records.coalesce(4).write.mode("overwrite").parquet(rec_src)

    results = []
    for E in SWEEP_E:
        registry = spark.range(E).select(
            F.col("id").alias("entity_id"),
            F.format_string("acme industrial supply co %04d", F.col("id"))
            .alias("key"),
            F.lit(7).alias("block"),
        ).cache()
        registry.count()

        for prune in (None, 1):
            walls = []
            rows = None
            fin = None
            for it in range(3):
                sdf = spark.readStream.schema(
                    "rec_id long, name string, block int"
                ).parquet(rec_src)
                t0 = time.time()
                cand = streaming_attach_candidates(
                    sdf, registry, on="name", id_col="rec_id",
                    sim_threshold=THRESH,
                    blocking_vars=[("block", "block")],
                    prune_topk=prune,
                )
                if prune is None and E > 500:
                    # the unpruned sink at this fan-out OOMs a default
                    # (1g) driver through the memory sink — THE cliff.
                    # Count via foreachBatch (distributed, no driver
                    # row pinning) to measure past it.
                    acc = {"n": 0}

                    def count_batch(bdf, _eid):
                        acc["n"] += bdf.count()

                    q = (cand.writeStream.foreachBatch(count_batch)
                         .trigger(availableNow=True).start())
                    q.awaitTermination(600)
                    q.stop()
                    n = acc["n"]
                else:
                    drained = run_available_now(cand, output_mode="append")
                    n = drained.count()
                    if it == 0:
                        fin = sorted(
                            (r["record_id"], r["entity_id"],
                             round(r["score"], 9))
                            for r in final_attach(
                                drained, spark.read.parquet(rec_src),
                                on="name", id_col="rec_id",
                            ).collect()
                        )
                walls.append(time.time() - t0)
                rows = n
            results.append({
                "E": E, "prune_topk": prune, "sink_rows": rows,
                "wall_min": round(min(walls[1:]), 3),
                "final_fp": None if fin is None else hash(tuple(fin)),
            })
            print(json.dumps(results[-1]), flush=True)
        registry.unpersist()

    # parity check where both arms drained through the memory sink:
    # pruned and unpruned final_attach picks must be bit-identical
    # (the fuller parity matrix lives in tests/test_entity.py)
    by_e = {}
    for r in results:
        if r["final_fp"] is not None:
            by_e.setdefault(r["E"], {})[r["prune_topk"]] = r["final_fp"]
    for e, fps in by_e.items():
        if None in fps and 1 in fps:
            assert fps[None] == fps[1], f"final_attach mismatch at E={e}"
    print(json.dumps({"sweep": results, "parity": "ok"}))


if __name__ == "__main__":
    main()
