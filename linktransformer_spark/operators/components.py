"""Distributed connected components — pure DataFrame, no GraphFrames.

Replaces the reference's networkx connected-components
(/root/reference/src/linktransformer/cluster_fns.py:81-93), which is
driver-bound. Implements the alternating large-star / small-star
algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14): converges in O(log^2 n) rounds on any graph (in
practice a handful), each round = two groupBy-shuffles on node id.
That is the right shape for 100 TB edge sets: no driver state, no
broadcast of the graph, skew handled by AQE.

Component label = MIN node id in the component (deterministic, and
exactly what a SQL oracle's recursive min-reachability computes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """Cheap convergence fingerprint: (count, xor of a 64-bit pair hash).
    xor (not sum) so it can never overflow under ANSI mode — the engine
    must behave under a caller's default Spark 4 session, where
    spark.sql.ansi.enabled is true. Hash collisions across iterations
    are astronomically unlikely; the iteration cap backstops anyway."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


# Edge sets at or below this size are solved with driver-side
# union-find instead of the iterative distributed algorithm — the same
# size-adaptivity as a broadcast-hash join (a 4M-edge list is ~64 MB,
# well under any driver's broadcast budget; the distributed loop costs
# 4-6 shuffle rounds + a checkpoint/checksum action per round, which
# dwarfs the driver solve until edges reach the hundreds of millions).
# Override per-session with spark.conf lt.cc.localEdgeThreshold; set 0
# to force the distributed path (tests exercise both).
LOCAL_CC_DEFAULT_THRESHOLD = 4_000_000


def _local_union_find(rows) -> list[tuple[int, int]]:
    """Driver-side union-find with path compression; component label =
    min node id (identical contract to the distributed path)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in rows:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # full compression pass: every node -> min id of its component
    # (roots were always merged toward the smaller id, so find() IS min)
    return [(node, find(node)) for node in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    local_threshold: int | None = None,
) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component) mapping.

    Only nodes that appear in an edge are returned; callers decide what
    isolated nodes mean (own-component vs noise).
    """
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )
    spark = edges.sparkSession
    if local_threshold is None:
        local_threshold = int(
            spark.conf.get("lt.cc.localEdgeThreshold", str(LOCAL_CC_DEFAULT_THRESHOLD))
        )
    if local_threshold > 0:
        # ONE action decides the route AND fetches the edges: a
        # (threshold+1)-row limit probe returns the complete edge set
        # exactly when it is small enough for the driver solve. The
        # previous count-then-toPandas shape paid two jobs and two
        # full plan compiles of the (often expensive) upstream
        # pair-generation subtree — measured ~0.7s of pure driver
        # latency per dedup query at sf0.1 (round 14 §driver-floor).
        # A graph over the threshold pays one discarded probe
        # (bounded at threshold+1 collected rows) before the
        # distributed loop — the case that already runs multi-round
        # distributed work.
        import pandas as pd

        pdf = e.limit(local_threshold + 1).toPandas()
        if len(pdf) <= local_threshold:
            pairs = _local_union_find(pdf.itertuples(index=False, name=None))
            out = pd.DataFrame(pairs, columns=["node", "component"], dtype="int64")
            return spark.createDataFrame(out, schema="node long, component long")
    # the first round consumes e TWICE (e union e-reversed); cut
    # lineage so a potentially expensive upstream pair-generation
    # plan executes once, not twice
    e = e.localCheckpoint(eager=False)
    prev = None
    for i in range(max_iterations):
        # ---- large-star ----
        # neighborhoods over both directions; m = min(N(u) ∪ {u});
        # connect every LARGER neighbor to m.
        und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = und.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
        e = (
            und.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        # ---- small-star ----
        # orient edges to the smaller endpoint; connect all smaller
        # neighbors (and u) to m = min(N⁻(u) ∪ {u}).
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        e = (
            oriented.join(mins, "src")
            .select(
                F.explode(F.array(F.col("dst"), F.col("src"))).alias("src"),
                F.col("m").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # cut lineage each round (iterative plans otherwise grow
        # exponentially in Catalyst analysis time)
        e = e.localCheckpoint(eager=True)
        cur = _checksum(e)
        if prev is not None and cur == prev:
            break
        prev = cur

    # at convergence e is a star: (node, root). Roots themselves appear
    # only on the dst side; add their self-mapping.
    nodes = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return nodes.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def clusters_from_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Edge list -> one row per cluster: (cluster, nodes).

    DataFrame form of the reference's ``clusters_from_edges``
    (/root/reference/src/linktransformer/cluster_fns.py:81-93), which
    returns {cluster_id: [nodes]} from networkx subgraphs. Cluster ids
    there follow networkx iteration order; here the id is the
    component's MIN node id and ``nodes`` is sorted ascending — fully
    deterministic, and scale-safe: a dense 0..k-1 renumbering would
    need a global no-partition window (single-task bottleneck), while
    the partition itself is the contract (SURVEY §1.3). A plain
    dict(collect()) recovers the reference's shape for small graphs.
    """
    comp = connected_components(edges, src=src, dst=dst)
    return comp.groupBy(F.col("component").alias("cluster")).agg(
        F.sort_array(F.collect_set("node")).alias("nodes")
    )
