"""Drifted-index rebalance measurement (operators/ann.py
rebalance_ivf_index — the ACT half of the index_cell_stats loop).

Scenario: the documented IVF maintenance failure. An index is built
(seeded centroids) over an initial corpus drawn from a FEW clusters,
then the corpus grows by appends drawn from OTHER clusters — the
frozen centroids cram every appended vector into whichever build-time
cells sit closest, a handful of cells go hot, per-probe recall decays
and the probed scan stops tracking n_probe/n_cells. The sweep
measures, before and after one rebalance call:

- index_cell_stats (max_over_mean, the monitor's headline);
- recall@10 vs exact at a FIXED n_probe;
- the probed-row fraction per query (the scan-cost proxy: sum of
  probed cells' sizes / corpus, averaged over queries);
- indexed serve wall (min of 3).

Usage: python tools/rebalance_sweep.py [n_rows] [n_clusters]
Writes a markdown table to stdout (PLANS.md round 10 addendum).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import linktransformer_spark as lt
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
K_CLUSTERS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
N_QUERIES = 500
N_PROBE = 4
N_CELLS = 32
SEED = 7
INIT_CLUSTERS = 30  # build-time corpus: clusters 0..29; the appended
                    # half lives in the two unseen clusters 30, 31


def gen_clustered(n, k, dim, seed):
    """Half the corpus spreads over clusters 0..k-3 (the build-time
    content mix); the other half lands in the two UNSEEN clusters
    k-2, k-1 — the 'new content domain arrives after the build'
    drift: the frozen centroids cram that entire mass into whichever
    one or two cells sit closest."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.where(
        rng.random(n) < 0.5,
        rng.integers(0, k - 2, size=n),
        rng.integers(k - 2, k, size=n),
    )
    pts = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts, assign


def probed_fraction(spark, path, q):
    return probed_fraction_at(spark, path, q, N_PROBE)


def probed_fraction_at(spark, path, q, n_probe):
    """Mean over queries of (rows in the query's probed cells) /
    corpus rows — the partition-pruned scan's size."""
    from linktransformer_spark.operators.ann import (
        _assign_cells_declarative,
    )
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.operators import knn_join as KJ

    cent = spark.read.parquet(f"{path}/centroids").select(
        "cell", F.col("centroid").alias("_cent_emb"))
    qn = q.select(
        F.col("vec_id").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col("embedding")).alias(KJ.LEFT_EMB))
    qa = _assign_cells_declarative(qn, KJ.LEFT_ID, KJ.LEFT_EMB, cent,
                                   n_probe)
    counts = (spark.read.parquet(f"{path}/cells")
              .groupBy("cell").agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n")).first()[0]
    per_q = (qa.join(counts, "cell")
             .groupBy(KJ.LEFT_ID).agg(F.sum("n").alias("probed")))
    mean_probed = per_q.agg(F.avg("probed")).first()[0]
    return float(mean_probed) / float(total)


def recall_and_wall(spark, path, q, exact_pairs, n_probe):
    walls = []
    for _ in range(3):
        t0 = time.time()
        got = lt.ann_topk_ivf_indexed(spark, path, q, k=10,
                                      n_probe=n_probe)
        got_pairs = {(r.query_id, r.neighbor_id) for r in got.collect()}
        walls.append(time.time() - t0)
    return len(got_pairs & exact_pairs) / len(exact_pairs), min(walls)


def main():
    spark = lt.get_spark("rebalance-sweep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pts, assign = gen_clustered(N, K_CLUSTERS, DIM, SEED)
    # initial corpus: the smallest ids, drawn from INIT_CLUSTERS only
    init_mask = assign < INIT_CLUSTERS
    init_idx = np.nonzero(init_mask)[0]
    tail_idx = np.nonzero(~init_mask)[0]
    order = np.concatenate([init_idx, tail_idx])
    ids = np.empty(N, dtype=np.int64)
    ids[order] = np.arange(N)

    def df_of(idx):
        rows = [(int(ids[i]), [float(x) for x in pts[i]]) for i in idx]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(32)

    initial = df_of(init_idx).localCheckpoint(eager=True)
    appended = df_of(tail_idx).localCheckpoint(eager=True)
    full = initial.unionByName(appended).localCheckpoint(eager=True)
    q = full.filter(F.col("vec_id") % (N // N_QUERIES) == 0)
    print(f"corpus n={N} clusters={K_CLUSTERS} init_clusters="
          f"{INIT_CLUSTERS} (n_init={len(init_idx)}) n_cells={N_CELLS} "
          f"n_probe={N_PROBE} queries={q.count()}")

    exact = lt.ann_topk(q, full, k=10, mode="broadcast_knn")
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    import tempfile
    path = tempfile.mkdtemp(prefix="lt_rebal_sweep_")
    t0 = time.time()
    lt.save_ivf_index(initial, path, n_cells=N_CELLS)
    lt.append_to_ivf_index(appended, path)
    print(f"build+append wall {time.time()-t0:.1f}s")

    rows = []
    st = lt.index_cell_stats(spark, path).collect()[0]
    rec, wall = recall_and_wall(spark, path, q, exact_pairs, N_PROBE)
    frac = probed_fraction(spark, path, q)
    rows.append(("drifted (pre)", st.n_cells, round(st.max_over_mean, 2),
                 round(frac, 4), round(rec, 4), round(wall, 2)))

    t0 = time.time()
    rb = lt.rebalance_ivf_index(spark, path, max_over_mean=2.0,
                                split_factor=2).collect()[0]
    rb_wall = time.time() - t0
    print(f"rebalance: hot={rb.n_hot_cells} new={rb.n_new_cells} "
          f"moved={rb.rows_moved} wall {rb_wall:.1f}s")

    st = lt.index_cell_stats(spark, path).collect()[0]
    rec, wall = recall_and_wall(spark, path, q, exact_pairs, N_PROBE)
    frac = probed_fraction(spark, path, q)
    rows.append(("rebalanced x1", st.n_cells, round(st.max_over_mean, 2),
                 round(frac, 4), round(rec, 4), round(wall, 2)))

    # a second pass (rebalance is idempotent-ish: re-run until calm)
    rb = lt.rebalance_ivf_index(spark, path, max_over_mean=2.0,
                                split_factor=2).collect()[0]
    print(f"rebalance2: hot={rb.n_hot_cells} new={rb.n_new_cells} "
          f"moved={rb.rows_moved}")
    st = lt.index_cell_stats(spark, path).collect()[0]
    rec, wall = recall_and_wall(spark, path, q, exact_pairs, N_PROBE)
    frac = probed_fraction(spark, path, q)
    rows.append(("rebalanced x2", st.n_cells, round(st.max_over_mean, 2),
                 round(frac, 4), round(rec, 4), round(wall, 2)))

    # equal-scan-budget readout: fixed n_probe over more, smaller
    # cells reads a smaller corpus fraction — the fair comparison
    # raises n_probe on the rebalanced index until the probed
    # fraction matches the drifted index's, then compares recall
    target = rows[0][3]
    for np_ in range(N_PROBE + 1, N_PROBE + 8):
        frac = probed_fraction_at(spark, path, q, np_)
        if frac >= target or np_ == N_PROBE + 7:
            rec, wall = recall_and_wall(spark, path, q, exact_pairs, np_)
            st = lt.index_cell_stats(spark, path).collect()[0]
            rows.append((f"rebalanced x2 @ n_probe={np_} (equal budget)",
                         st.n_cells, round(st.max_over_mean, 2),
                         round(frac, 4), round(rec, 4), round(wall, 2)))
            break

    # refine=N twin (round-11): same drifted index, Lloyd-refined
    # children — the recall-at-fixed-probe recovery path
    path2 = tempfile.mkdtemp(prefix="lt_rebal_sweep_rf_")
    lt.save_ivf_index(initial, path2, n_cells=N_CELLS)
    lt.append_to_ivf_index(appended, path2)
    for pass_no in (1, 2):
        t0 = time.time()
        rb = lt.rebalance_ivf_index(spark, path2, max_over_mean=2.0,
                                    split_factor=2, refine=4).collect()[0]
        print(f"refine rebalance{pass_no}: hot={rb.n_hot_cells} "
              f"new={rb.n_new_cells} moved={rb.rows_moved} "
              f"wall {time.time()-t0:.1f}s")
        st = lt.index_cell_stats(spark, path2).collect()[0]
        rec, wall = recall_and_wall(spark, path2, q, exact_pairs, N_PROBE)
        frac = probed_fraction(spark, path2, q)
        rows.append((f"rebalanced x{pass_no} (refine=4)", st.n_cells,
                     round(st.max_over_mean, 2), round(frac, 4),
                     round(rec, 4), round(wall, 2)))

    for np_ in range(N_PROBE + 1, N_PROBE + 8):
        frac = probed_fraction_at(spark, path2, q, np_)
        if frac >= target or np_ == N_PROBE + 7:
            rec, wall = recall_and_wall(spark, path2, q, exact_pairs, np_)
            st = lt.index_cell_stats(spark, path2).collect()[0]
            rows.append((f"refined x2 @ n_probe={np_} (equal budget)",
                         st.n_cells, round(st.max_over_mean, 2),
                         round(frac, 4), round(rec, 4), round(wall, 2)))
            break

    print("\n| state | n_cells | max_over_mean | probed_frac | "
          "recall@10 | serve_s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")


if __name__ == "__main__":
    main()
