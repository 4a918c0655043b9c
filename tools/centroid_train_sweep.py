"""Probe-fraction / recall curve for the r90 PQ serving index:
seeded vs TRAINED centroids (save_pq_index train_cells/train_codes) on
a corpus with actual cluster structure.

The synthetic bench embeddings are near-uniform on the sphere — no
cluster structure for IVF cells to exploit, which is why the r90
auto recipe must probe ~75% of cells to hold recall there. Real
embedding corpora are clustered; this sweep generates a deterministic
mixture-of-Gaussians corpus (seeded numpy, reproducible) and measures
recall@10 vs n_probe for the seeded and the Lloyd-refined build.

Usage: python tools/centroid_train_sweep.py [n_rows] [n_clusters]
Writes a markdown table to stdout (PLANS.md round 10).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import linktransformer_spark as lt
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
K_CLUSTERS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
N_QUERIES = 500
SEED = 7


def gen_clustered(n, k, dim, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, k, size=n)
    pts = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def main():
    spark = lt.get_spark("centroid-sweep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pts = gen_clustered(N, K_CLUSTERS, DIM, SEED)
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(N)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32).localCheckpoint(eager=True)
    q = emb.filter(F.col("vec_id") < N_QUERIES)

    exact = (
        lt.ann_topk(q, emb, k=10, mode="broadcast_knn")
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    print(f"corpus n={N} k_clusters={K_CLUSTERS} dim={DIM} "
          f"queries={N_QUERIES} exact pairs={n_exact}\n")

    import tempfile

    builds = {
        "seeded": dict(),
        "trained(c8,b4)": dict(train_cells=8, train_codes=4),
    }
    paths = {}
    n_cells = None
    for name, kw in builds.items():
        path = tempfile.mkdtemp(prefix=f"lt_ctr_{name.split('(')[0]}_")
        t0 = time.time()
        lt.save_pq_index(emb, path, **kw)
        bt = time.time() - t0
        meta = spark.read.json(f"{path}/meta").collect()[0]
        n_cells = int(meta["n_cells"])
        stats = lt.index_cell_stats(spark, path).collect()[0]
        print(f"{name}: build {bt:.1f}s n_cells={n_cells} "
              f"max_over_mean={stats['max_over_mean']:.2f} "
              f"nonempty={stats['n_nonempty_cells']}")
        paths[name] = path

    print("\n| n_probe | probe_frac | " + " | ".join(
        f"recall {n} | serve_s {n}" for n in builds) + " |")
    print("|" + "---|" * (2 + 2 * len(builds)))
    for frac in (0.05, 0.10, 0.15, 0.25, 0.50, 0.75):
        n_probe = max(1, int(round(n_cells * frac)))
        cells_out = [f"{n_probe}", f"{frac:.2f}"]
        for name in builds:
            t0 = time.time()
            approx = lt.ann_topk_pq_indexed(
                spark, paths[name], q, k=10, n_probe=n_probe
            ).select("query_id", "neighbor_id").localCheckpoint(eager=True)
            st = time.time() - t0
            hit = exact.join(approx, ["query_id", "neighbor_id"]).count()
            cells_out += [f"{hit / max(n_exact, 1):.4f}", f"{st:.2f}"]
        print("| " + " | ".join(cells_out) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
