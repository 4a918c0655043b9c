"""connected_components + cluster_rows/dedup_rows semantics."""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


# local_threshold=0 forces the distributed large/small-star loop;
# the default routes small edge sets through driver union-find — both
# must produce the identical (node -> min id) contract
@pytest.mark.parametrize("local_threshold", [None, 0])
def test_connected_components_known_graph(spark, local_threshold):
    # two components {1,2,3,7} and {5,6}; 9-10-11 chain; isolated 42 not in edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 1), (5, 6), (9, 10), (10, 11)], ["src", "dst"]
    )
    kw = {} if local_threshold is None else {"local_threshold": local_threshold}
    got = {r["node"]: r["component"] for r in lt.connected_components(edges, **kw).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5, 9: 9, 10: 9, 11: 9}


@pytest.mark.parametrize("local_threshold", [None, 0])
def test_connected_components_long_chain(spark, local_threshold):
    # path graph 0-1-2-...-63: worst case for naive propagation; the
    # alternating star algorithm must still converge to min-label 0
    n = 64
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    kw = {} if local_threshold is None else {"local_threshold": local_threshold}
    comp = lt.connected_components(edges, **kw)
    rows = comp.collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert lt.connected_components(edges).count() == 0


def test_cluster_rows_labels_and_noise(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = lt.cluster_rows(
        part, model="levenshtein", on="p_name",
        cluster_type="SLINK", cluster_params={"threshold": 0.3},
        id_col="p_partkey",
    )
    assert "cluster" in out.columns
    assert out.count() == part.count()
    # identical names must share a cluster
    multi = (
        out.groupBy("p_name")
        .agg(F.countDistinct("cluster").alias("k"), F.count("*").alias("n"))
        .filter((F.col("n") > 1) & (F.col("k") > 1))
        .count()
    )
    assert multi == 0
    # label of a non-noise cluster == min row id in it
    bad = (
        out.filter(F.col("cluster") >= 0)
        .groupBy("cluster")
        .agg(F.min("p_partkey").alias("mn"))
        .filter(F.col("cluster") != F.col("mn"))
        .count()
    )
    assert bad == 0


def test_cluster_rows_min_samples_noise(spark):
    # chain a-b and singleton c with min cluster size 3:
    # a,b have degree 1 < 2 -> all noise
    df = spark.createDataFrame(
        [(0, "widget alpha"), (1, "widget alphb"), (2, "zzzzzz")], ["id", "txt"]
    )
    out = lt.cluster_rows(
        df, model="levenshtein", on="txt",
        cluster_type="SLINK",
        cluster_params={"threshold": 0.2, "min cluster size": 3},
        id_col="id",
    )
    labels = {r["id"]: r["cluster"] for r in out.collect()}
    assert labels == {0: -1, 1: -1, 2: -1}


def test_dedup_rows_keeps_noise_and_min_ids(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = lt.dedup_rows(
        part, model="levenshtein", on="p_name",
        cluster_type="SLINK", cluster_params={"threshold": 0.3},
        id_col="p_partkey",
    )
    assert out.columns == part.columns
    # no two surviving rows may be similar at the threshold
    n = out.count()
    assert 0 < n < part.count()
    # survivors are unique by name (exact-dup drop happened)
    assert out.select("p_name").distinct().count() == n


def test_cluster_rejects_unknown_type(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    with pytest.raises(ValueError):
        lt.cluster_rows(part, on="p_name", cluster_type="kmeans")


def test_hdbscan_known_groups(spark):
    """Two dense groups + one outlier through the full cluster_rows
    HDBScan path (numpy HDBSCAN* unless the hdbscan lib is present):
    groups separate, outlier is noise (-1), labels are min-row-id
    canonical on the numpy path."""
    rows = [(i, "alpha widget") for i in range(6)] + \
           [(i, "omega gasket") for i in range(6, 12)] + \
           [(12, "zzz qqq jjj xxx")]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = lt.cluster_rows(
        df, model="hash-ngram", on="txt", cluster_type="HDBScan",
        id_col="id", cluster_params={"min cluster size": 3, "min samples": 1},
    )
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert len(got) == 13
    assert len({got[i] for i in range(6)}) == 1 and got[0] >= 0
    assert len({got[i] for i in range(6, 12)}) == 1 and got[6] >= 0
    assert got[0] != got[6]
    assert got[12] == -1


def test_hdbscan_blocked_equals_global_on_separated_blocks(spark):
    """block_on with HDBScan: one applyInPandas task per block. With
    blocks that are far apart in embedding space, per-block clustering
    must equal global clustering restricted to the block."""
    rows = (
        [(i, "b1", "alpha widget") for i in range(5)]
        + [(i, "b1", "alpha gadget") for i in range(5, 10)]
        + [(i, "b2", "omega gasket") for i in range(10, 15)]
        + [(i, "b2", "omega basket") for i in range(15, 20)]
        + [(20, "b2", "zzz qqq jjj")]
    )
    df = spark.createDataFrame(rows, ["id", "blk", "txt"])
    params = {"min cluster size": 3, "min samples": 1}
    blocked = lt.cluster_rows(
        df, model="hash-ngram", on="txt", cluster_type="HDBScan",
        id_col="id", cluster_params=params, block_on=["blk"],
    )
    got = {r["id"]: r["cluster"] for r in blocked.collect()}
    assert len(got) == 21
    # each quintet is one cluster; all four distinct (min-row-id labels)
    quintets = [range(0, 5), range(5, 10), range(10, 15), range(15, 20)]
    labs = []
    for q in quintets:
        assert len({got[i] for i in q}) == 1 and got[q[0]] >= 0
        labs.append(got[q[0]])
    assert len(set(labs)) == 4
    # the outlier's block has viable clusters, so it is condensed-tree
    # noise rather than a singleton cluster
    assert got[20] == -1


def test_hdbscan_dedup_rows(spark):
    """dedup_rows with HDBScan keeps one row per cluster + every noise
    row (noise rows are real singletons, module-doc deviation)."""
    rows = [(i, "alpha widget") for i in range(6)] + \
           [(i, "omega gasket") for i in range(6, 12)] + \
           [(12, "zzz qqq jjj xxx"), (13, "yyy www vvv uuu")]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = lt.dedup_rows(
        df, model="hash-ngram", on="txt", cluster_type="HDBScan",
        id_col="id", cluster_params={"min cluster size": 3, "min samples": 1},
    )
    kept = sorted(r["id"] for r in out.collect())
    # exact-dup drop collapses each identical-text group to its min id
    # before clustering; both noise rows survive
    assert kept == [0, 6, 12, 13]


def test_hdbscan_tiny_data_all_noise(spark):
    """n < 2*min_cluster_size: no split can produce two viable
    clusters and the root is never selectable
    (allow_single_cluster=False library parity) -> all noise."""
    rows = [(0, "aaa"), (1, "aab"), (2, "abb")]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = lt.cluster_rows(
        df, model="hash-ngram", on="txt", cluster_type="HDBScan",
        id_col="id", cluster_params={"min cluster size": 5, "min samples": 1},
    )
    assert {r["cluster"] for r in out.collect()} == {-1}


def test_hdbscan_rejects_min_cluster_size_one(spark):
    from linktransformer_spark.operators.cluster import _numpy_hdbscan
    import numpy as np

    with pytest.raises(ValueError, match="min cluster size"):
        _numpy_hdbscan(np.zeros((4, 2)), 1, 1)


def test_hdbscan_epsilon_mapping_via_slink(spark):
    """The documented HDBSCAN->SLINK migration: with a fixed
    cluster_selection_epsilon HDBSCAN's extraction is DBSCAN*, so
    SLINK(threshold=e, min cluster size=max(m, s)) produces the same
    partition — pin it on a hand-computable frame (two tight groups,
    one outlier)."""
    rows = [(0, "alpha widget"), (1, "alpha widget"), (2, "alpha widgets"),
            (3, "omega gasket"), (4, "omega gasket"), (5, "zzz unrelated")]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = lt.cluster_rows(
        df, on="txt", cluster_type="SLINK", id_col="id",
        cluster_params={"min cluster size": 2, "threshold": 0.3,
                        "metric": "cosine"},
    )
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4]
    assert got[0] != got[3]
    assert got[5] == -1  # noise: no epsilon-neighbor


def test_agglomerative_ward_known_groups(spark):
    # two tight groups of identical strings + one outlier; ward at a
    # small threshold merges the duplicates, never across groups
    rows = [(0, "alpha widget"), (1, "alpha widget"), (2, "alpha widget"),
            (3, "omega gasket"), (4, "omega gasket"), (5, "zzz unrelated")]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = lt.cluster_rows(
        df, model="hash-ngram", on="txt", cluster_type="agglomerative",
        cluster_params={"threshold": 0.1}, id_col="id",
    )
    labels = {r["id"]: r["cluster"] for r in out.collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[3] == labels[4] == 3
    assert labels[5] == 5


def test_agglomerative_single_linkage_equals_slink_cc(spark, sf_dir):
    # single-linkage agglomerative at cosine-distance threshold eps is
    # the connected components of the eps-similarity graph — must equal
    # the SLINK path's partition (SLINK noise = singleton clusters)
    part = spark.read.parquet(f"{sf_dir}/part.parquet").limit(120)
    eps = 0.35
    agg = lt.cluster_rows(
        part, model="hash-ngram", on="p_name", cluster_type="agglomerative",
        cluster_params={"threshold": eps, "clustering linkage": "single",
                        "metric": "cosine"},
        id_col="p_partkey",
    )
    slink = lt.cluster_rows(
        part, model="hash-ngram", on="p_name", cluster_type="SLINK",
        cluster_params={"threshold": eps, "min cluster size": 2},
        id_col="p_partkey",
    )
    a = {r["p_partkey"]: r["cluster"] for r in agg.collect()}
    s = {
        r["p_partkey"]: (r["cluster"] if r["cluster"] >= 0 else r["p_partkey"])
        for r in slink.collect()
    }
    assert a == s


def test_agglomerative_block_on_partitions_work(spark):
    # block keys split the data; identical texts in the same block merge
    rows = [(0, "alpha widget", "north"), (1, "alpha widget", "north"),
            (2, "alpha widget", "south"), (3, "omega gasket", "south")]
    df = spark.createDataFrame(rows, ["id", "txt", "region"])
    out = lt.cluster_rows(
        df, model="hash-ngram", on="txt", cluster_type="agglomerative",
        cluster_params={"threshold": 0.1}, id_col="id", block_on=["region"],
    )
    labels = {r["id"]: r["cluster"] for r in out.collect()}
    assert labels[0] == labels[1] == 0
    assert labels[2] == 2 and labels[3] == 3  # different blocks never merge


def test_slink_block_on_restricts_edges(spark):
    """SLINK with block_on: identical texts in DIFFERENT blocks must not
    merge (the ε-graph is restricted to same-block pairs)."""
    import linktransformer_spark as lt

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "A"), (2, "alpha beta gamma", "A"),
         (3, "alpha beta gamma", "B"), (4, "zzz qqq www", "A")],
        "id long, name string, blk string",
    )
    out = lt.cluster_rows(
        df, model="hash-ngram", on="name", cluster_type="SLINK",
        cluster_params={"threshold": 0.2}, id_col="id", block_on=["blk"],
    )
    got = {r.id: r.cluster for r in out.collect()}
    assert got[1] == got[2] != -1    # same block, same text -> merged
    # same text but other block: no same-block neighbor -> DBSCAN noise
    assert got[3] == -1
    assert got[4] == -1              # dissimilar -> noise


def test_block_on_validation(spark):
    import linktransformer_spark as lt

    df = spark.createDataFrame([(1, "x", "A")], "id long, name string, blk string")
    with __import__("pytest").raises(ValueError, match="not in DataFrame"):
        lt.cluster_rows(df, model="hash-ngram", on="name", id_col="id",
                        block_on=["nope"])


def test_single_block_quadratic_warning_gated_by_size(spark):
    """The documented single-task O(n^2) cliff warns at runtime above
    20k rows and stays quiet below (keep-loud contract)."""
    import warnings as w

    import linktransformer_spark as lt

    small = spark.createDataFrame(
        [(i, f"doc {i % 5} text") for i in range(50)], "id long, text string"
    )
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)  # would raise if warned
        lt.cluster_rows(
            small, on="text", model="hash-ngram",
            cluster_type="agglomerative", cluster_params={"threshold": 0.3},
            id_col="id",
        ).count()


def test_single_block_warning_does_not_reencode(spark, tmp_path):
    """The O(n^2) single-block warning counts the INPUT df, not the
    post-encode frame — a join-based encoder (e.g. paid API calls)
    must run its embed stage exactly once per cluster_rows call."""
    import os

    import linktransformer_spark as lt
    from linktransformer_spark.encoders.api import ApiEncoder
    from linktransformer_spark.operators.knn_join import CosineScorer

    marker = str(tmp_path / "embed_calls")
    os.makedirs(marker)

    class _CountingClient:
        def embed(self, batch, model):
            # one marker file per embedded text; works across the
            # separate Python-worker processes of local mode
            for s in batch:
                open(os.path.join(marker, f"{abs(hash(s))}_{len(os.listdir(marker))}"), "w").close()
            return [[float(len(s)), 1.0, 0.5, 0.25] for s in batch]

    df = spark.createDataFrame(
        [(i, f"document text number {i}") for i in range(12)],
        "id long, text string",
    )
    enc = ApiEncoder("text-embedding-3-small", client_factory=_CountingClient)
    out = lt.cluster_rows(
        df, model=CosineScorer(enc), on="text",
        cluster_type="agglomerative", cluster_params={"threshold": 0.3},
        id_col="id",
    )
    assert out.count() == 12
    # 12 distinct keys -> exactly 12 embed row-encodings (not 24)
    assert len(os.listdir(marker)) == 12
