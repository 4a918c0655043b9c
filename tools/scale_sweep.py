#!/usr/bin/env python
"""Scale-evidence sweep: t(sf1)/t(sf0.1) for the headline operators.

Runs the 10 headline bench entries (the verdict-named set) at
/root/testdata/sf0.1 and at the generated ~sf1 dataset
(tools/gen_scale_data.py), 1 warm + N timed runs each (min reported,
same protocol as bench.py), and prints a markdown table with the
scaling ratio. 10x data with a near-linear plan should land well under
~15x wall (shuffle/sort log factors + fixed overheads); anything above
names a super-linear stage to fix or knob to document.

Usage: python tools/scale_sweep.py [entry ...]   # default: headline 10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import linktransformer_spark as lt  # noqa: E402
from bench import bench_queries  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("LT_SCALE_DIR", "/tmp/lt_scale/sf1")

HEADLINE = [
    "merge_knn_k3",
    "er_resolve_lsh",
    "dedup_minhash_docs",
    "semdedup_embeddings",
    "search_bm25_indexed",
    "graph_pagerank",
    "events_funnel",
    "ann_lsh_topk",
    "docs_curation_pipeline",
    "docs_dsir_weights",
]


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    runs_per = int(os.environ.get("LT_SCALE_RUNS", "2"))
    spark = lt.get_spark(
        "lt-scale-sweep", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench_queries(spark)
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = queries[name]
        results[name] = {}
        for sf_dir, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
            fn(sf_dir).count()  # warm
            best = float("inf")
            for _ in range(runs_per):
                t0 = time.time()
                n = fn(sf_dir).count()
                best = min(best, time.time() - t0)
            results[name][tag] = round(best, 2)
            print(f"# {name} @ {tag}: {results[name][tag]}s ({n} rows)",
                  file=sys.stderr)
    print("| entry | sf0.1 (s) | sf1 (s) | ratio @10x data |")
    print("|---|---|---|---|")
    for name, r in results.items():
        ratio = r["sf1"] / max(r["sf0.1"], 1e-9)
        print(f"| {name} | {r['sf0.1']} | {r['sf1']} | {ratio:.1f}x |")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
