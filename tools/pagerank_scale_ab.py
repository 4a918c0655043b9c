#!/usr/bin/env python
"""At-scale A/B of pagerank's two plan forms (round-14 VERDICT item 7).

Generates a deterministic 20M-edge / 1M-node zipf(1.3) graph
(~306 MB parquet — over _FILTER_PRUNE_MIN_BYTES, so the production
dispatch fires without knob forcing), then alternates warm runs of

- NEW: filter-form degree prune + inline iteration plan (round 13)
- OLD: window-form prune + localCheckpoint per iteration (round 12)

Usage: python tools/pagerank_scale_ab.py [iterations]
Round-14 recorded result (local[32], min of 3 warm alternating runs):
iterations=6 -> new 15.3s vs old 22.5s (1.47x, old runs tight at
22.5-23.3s); iterations=3 -> new 15.3s vs old 17.2s (1.12x).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/lt_pr_edges.parquet"
ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not os.path.exists(PATH):
        rng = np.random.default_rng(42)
        n_nodes, n_edges = 1_000_000, 20_000_000
        src = (rng.zipf(1.3, n_edges) - 1) % n_nodes
        dst = rng.integers(0, n_nodes, n_edges)
        w = rng.random(n_edges)
        pq.write_table(
            pa.table({"src": src.astype("int64"),
                      "dst": dst.astype("int64"), "w": w}),
            PATH, row_group_size=1_000_000,
        )
        print(f"wrote {os.path.getsize(PATH) / 1e6:.0f} MB")

    import linktransformer_spark as lt
    from linktransformer_spark.operators import graph as G

    spark = lt.get_spark("pr-scale-ab", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(PATH)
    print("leaf bytes est:", G._leaf_scan_bytes(edges))

    def run(variant: str) -> float:
        if variant == "new":
            G._FILTER_PRUNE_MIN_CAP, G._INLINE_MAX_ITER = 4096, 6
        else:
            G._FILTER_PRUNE_MIN_CAP, G._INLINE_MAX_ITER = 1 << 60, 0
        t0 = time.time()
        lt.pagerank(edges, weight_col="w", iterations=ITER,
                    max_in_degree=4096, max_out_degree=4096).count()
        return time.time() - t0

    run("new"), run("old")  # warm both paths
    res: dict = {"new": [], "old": []}
    for v in ("new", "old", "old", "new", "new", "old"):
        res[v].append(run(v))
        print(v, round(res[v][-1], 1), flush=True)
    print("MIN new", min(res["new"]), "old", min(res["old"]))
    spark.stop()


if __name__ == "__main__":
    main()
