"""Graph centrality: fixed-iteration PageRank over an edge-list
DataFrame — link-graph curation signal (rank web domains/documents by
citation structure before sampling; Page et al. 1999).

Beyond-the-reference extension (the reference's only graph kernel is
connected components for dedup clustering — operators/components.py);
a training-data pipeline over crawled corpora additionally wants a
quality/centrality score per node of the link graph.

Spark-first shape: each iteration is ONE shuffle round — ranks join
the (pre-aggregated, lineage-cut) edge relation on src, messages hash-
aggregate on dst, and the teleport term applies in a left join against
the node relation. The composed k-iteration plan stays LINEAR via a
lazy ``localCheckpoint`` per iteration (same trick as mmr_rerank).

Float determinism (the DuckDB-oracle contract): every float sum in
the operator is order-pinned — the per-node message sum folds the
in-neighbor contributions in src order, and per-src out-weights fold
in dst order. Arrays are bounded by node degree; the ENFORCED
``max_in_degree`` / ``max_out_degree`` caps (default 1M each) prune
super-hub edges ONCE at build time (keep each node's strongest
``max_*_degree`` edges by (weight DESC, neighbor ASC) — the standard
web-graph hygiene step), so no per-iteration fold array can exceed
the cap. The prune is a spillable row_number window; the collected
arrays — the OOM hazard — are what the cap bounds.

Dangling nodes (no out-edges): by default their rank mass LEAKS
(teleport-only variant) — ranks still order correctly for the
curation use case, but sum to < 1. ``redistribute_dangling=True``
adds the standard correction (each iteration's dangling mass is
spread uniformly over all nodes), making ranks a probability
distribution; the per-iteration dangling sum is a ONE-ROW
order-pinned fold over the |dangling| rank rows, broadcast back —
bounded output, but the collect_list behind it scales with the
dangling-node count, so the default stays the leaky variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "degree_prune_stats"]


def _pinned_fold(key: str, val: str) -> F.Column:
    """Sum ``val`` in ``key`` order — deterministic float accumulation
    (collect_list -> array_sort on (key, val) struct -> sequential
    fold), the repo-wide pattern for cross-engine float parity."""
    return F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col(key).alias("k"), F.col(val).alias("v")))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["v"],
    )


def _cap_degree(e: DataFrame, key: str, other: str, cap: int) -> DataFrame:
    """Keep each ``key`` node's strongest ``cap`` edges by
    (weight DESC, other-endpoint ASC) — deterministic hub prune."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(
        F.col("_w").desc(), F.col(other).asc()
    )
    return (
        e.withColumn("_deg_rn", F.row_number().over(w))
        .filter(F.col("_deg_rn") <= cap)
        .drop("_deg_rn")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    weight_col: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    max_in_degree: int | None = 1_000_000,
    max_out_degree: int | None = 1_000_000,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-``iterations`` PageRank over directed weighted edges.

    Returns ``(node, rank)`` for every node appearing as src or dst.
    ``weight_col`` (optional) weights each edge; transition probability
    out of ``u`` is ``w(u,v) / sum_x w(u,x)``. Parallel (src, dst)
    duplicates are pre-summed. For bit-exact oracle parity use
    integer-valued weights (exact in double); arbitrary float weights
    are correct but their pre-sum is the one unpinned accumulation.

    ``max_in_degree`` / ``max_out_degree`` (ENFORCED, default 1M each,
    ``None`` to opt out) prune the deduplicated edge relation ONCE
    before iteration: each node keeps its ``max_in_degree`` strongest
    in-edges and ``max_out_degree`` strongest out-edges (by weight
    DESC, endpoint ASC — deterministic). A web-scale super-hub
    (in-degree in the tens of millions) would otherwise build one
    giant per-node message array every iteration; graphs whose degrees
    are all under the caps are returned bit-identically. In-prune runs
    first, out-prune second (the order is part of the contract).

    ``redistribute_dangling=True`` spreads each iteration's dangling
    rank mass (nodes with no out-edges) uniformly over all nodes —
    ranks then form a probability distribution (sum to 1 up to float
    error) instead of leaking that mass; the default ``False`` is the
    cheaper teleport-only variant whose ranks still order correctly.

    The iteration count is a build-time constant (the plan unrolls),
    which is what makes the operator fully SQL-oracle-checkable as a
    chain of CTEs — convergence-threshold looping would need a
    driver-side loop with a collect per round instead.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    for nm, cap in (("max_in_degree", max_in_degree),
                    ("max_out_degree", max_out_degree)):
        if cap is not None and cap < 1:
            raise ValueError(f"{nm} must be >= 1 (or None)")
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e0 = edges.select(
        F.col(src_col).cast("long").alias("_src"),
        F.col(dst_col).cast("long").alias("_dst"),
        w.alias("_w"),
    )
    e = e0.groupBy("_src", "_dst").agg(F.sum("_w").alias("_w"))
    if max_in_degree is not None:
        e = _cap_degree(e, "_dst", "_src", max_in_degree)
    if max_out_degree is not None:
        e = _cap_degree(e, "_src", "_dst", max_out_degree)
    e = e.localCheckpoint(eager=False)
    # order-pinned folds in window form (functions/pinned.py — bit-
    # identical to _pinned_fold, no ObjectHashAggregate / interpreted
    # ArrayAggregate; the groupBy reuses the window's exchange)
    from ..functions.pinned import pinned_total, with_running_sum

    outw = (
        with_running_sum(e, ["_src"], "_dst", "_w")
        .groupBy("_src")
        .agg(pinned_total("_dst").alias("_ow"))
    )
    e2 = e.join(outw, "_src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # bounded 1-row action; shared by every iteration
    teleport = (1.0 - damping) / n
    if redistribute_dangling:
        # dangling = nodes with no out-edge; fixed set, computed once
        dangling = nodes.join(
            e.select(F.col("_src").alias("node")).distinct(), "node",
            "left_anti",
        ).localCheckpoint(eager=False)
    r = nodes.withColumn("_r", F.lit(1.0 / n))
    for _ in range(iterations):
        msgs = r.join(e2, F.col("node") == F.col("_src")).select(
            "_dst",
            "_src",
            ((F.col("_r") * F.col("_w")) / F.col("_ow")).alias("_c"),
        )
        agg = (
            with_running_sum(msgs, ["_dst"], "_src", "_c")
            .groupBy("_dst")
            .agg(pinned_total("_src").alias("_m"))
        )
        base = F.lit(teleport) + F.lit(damping) * F.coalesce(
            F.col("_m"), F.lit(0.0)
        )
        joined = nodes.join(agg, F.col("node") == F.col("_dst"), "left")
        if redistribute_dangling:
            # one-row order-pinned dangling-mass sum, broadcast back —
            # the totals pattern (bounded OUTPUT; the fold array scales
            # with |dangling|, which is why this is opt-in)
            dmass = (
                r.join(dangling, "node")
                .agg(_pinned_fold("node", "_r").alias("_dm"))
            )
            joined = joined.crossJoin(F.broadcast(dmass))
            base = base + F.lit(damping) * F.col("_dm") / F.lit(float(n))
        r = joined.select("node", base.alias("_r")).localCheckpoint(
            eager=False
        )
    return r.select("node", F.col("_r").alias("rank"))


def degree_prune_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    weight_col: str | None = None,
    max_in_degree: int | None = 1_000_000,
    max_out_degree: int | None = 1_000_000,
) -> DataFrame:
    """Observable for :func:`pagerank`'s degree caps ("no silent
    caps"): one summary row quantifying exactly what the prune removes
    from THIS graph at these caps, computed with the same
    deterministic (weight DESC, endpoint ASC) ranking and the same
    in-then-out order as :func:`pagerank` itself. Columns:
    ``edges_total`` (after parallel-duplicate pre-sum — the relation
    the prune sees), ``edges_after_in_prune``, ``edges_after_out_prune``
    (what iteration runs on), ``in_nodes_pruned`` / ``out_nodes_pruned``
    (nodes that lost at least one edge in each phase), and
    ``max_in_degree_seen`` / ``max_out_degree_seen`` (hottest hubs on
    the pre-sum relation, for sizing the caps). All exact integers.
    Cost: the prune's own two windows plus count aggregates — run it
    when ``pagerank`` matters enough to audit, not per-query.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("_src"),
            F.col(dst_col).cast("long").alias("_dst"),
            w.alias("_w"),
        )
        .groupBy("_src", "_dst")
        .agg(F.sum("_w").alias("_w"))
        .localCheckpoint(eager=False)
    )
    total = e.count()
    # coalesce: max over an EMPTY edge set is null — return a zero-row
    # summary rather than crash on int(null).
    deg = e.groupBy("_dst").agg(F.count(F.lit(1)).alias("_n")).agg(
        F.coalesce(F.max("_n"), F.lit(0)).alias("mx")
    ).crossJoin(
        e.groupBy("_src").agg(F.count(F.lit(1)).alias("_n")).agg(
            F.coalesce(F.max("_n"), F.lit(0)).alias("mxo")
        )
    ).first()
    e1 = e if max_in_degree is None else _cap_degree(
        e, "_dst", "_src", max_in_degree
    )
    e1 = e1.localCheckpoint(eager=False)
    after_in = e1.count()
    in_pruned = (
        0
        if max_in_degree is None
        else e.groupBy("_dst").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_in_degree)
        .count()
    )
    e2 = e1 if max_out_degree is None else _cap_degree(
        e1, "_src", "_dst", max_out_degree
    )
    after_out = e2.count()
    out_pruned = (
        0
        if max_out_degree is None
        else e1.groupBy("_src").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_out_degree)
        .count()
    )
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                total,
                after_in,
                after_out,
                in_pruned,
                out_pruned,
                int(deg["mx"]),
                int(deg["mxo"]),
            )
        ],
        "edges_total bigint, edges_after_in_prune bigint, "
        "edges_after_out_prune bigint, in_nodes_pruned bigint, "
        "out_nodes_pruned bigint, max_in_degree_seen bigint, "
        "max_out_degree_seen bigint",
    )
