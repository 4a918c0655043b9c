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
in dst order. Arrays are bounded by node degree; a pathological hub
(in-degree in the millions) makes one big array — cap upstream by
pruning super-hubs, the standard web-graph hygiene step.

Dangling nodes (no out-edges): their rank mass LEAKS (teleport-only
variant) rather than being redistributed — redistribution needs a
global order-pinned sum over all dangling nodes per iteration, which
cannot be bounded at 100 TB; ranks still order correctly for the
curation use case. Document ranks therefore sum to < 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


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


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    weight_col: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-``iterations`` PageRank over directed weighted edges.

    Returns ``(node, rank)`` for every node appearing as src or dst.
    ``weight_col`` (optional) weights each edge; transition probability
    out of ``u`` is ``w(u,v) / sum_x w(u,x)``. Parallel (src, dst)
    duplicates are pre-summed. For bit-exact oracle parity use
    integer-valued weights (exact in double); arbitrary float weights
    are correct but their pre-sum is the one unpinned accumulation.

    The iteration count is a build-time constant (the plan unrolls),
    which is what makes the operator fully SQL-oracle-checkable as a
    chain of CTEs — convergence-threshold looping would need a
    driver-side loop with a collect per round instead.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
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
    e = (
        e0.groupBy("_src", "_dst")
        .agg(F.sum("_w").alias("_w"))
        .localCheckpoint(eager=False)
    )
    outw = e.groupBy("_src").agg(_pinned_fold("_dst", "_w").alias("_ow"))
    e2 = e.join(outw, "_src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # bounded 1-row action; shared by every iteration
    teleport = (1.0 - damping) / n
    r = nodes.withColumn("_r", F.lit(1.0 / n))
    for _ in range(iterations):
        msgs = r.join(e2, F.col("node") == F.col("_src")).select(
            "_dst",
            "_src",
            ((F.col("_r") * F.col("_w")) / F.col("_ow")).alias("_c"),
        )
        agg = msgs.groupBy("_dst").agg(_pinned_fold("_src", "_c").alias("_m"))
        r = (
            nodes.join(agg, F.col("node") == F.col("_dst"), "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("_m"), F.lit(0.0))
                ).alias("_r"),
            )
            .localCheckpoint(eager=False)
        )
    return r.select("node", F.col("_r").alias("rank"))
