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
the cap. At production cap sizes the prune is a narrow degree
aggregate + broadcast boundary join — the edge relation is never
re-shuffled or sorted for it; toy caps keep the spillable
row_number-window form. The collected arrays — the OOM hazard — are
what the cap bounds.

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


# Inline-iteration bound: past this many iterations the composed lazy
# plan (which references the edge relation once per iteration) is cut
# with per-iteration localCheckpoints as before.
_INLINE_MAX_ITER = 6

# Below this cap the prune uses the window form: the boundary relation
# (one row per over-cap node) is broadcast in the filter form, and its
# size is only bounded by |E|/cap — tiny at the 1M default (<= 1e6 rows
# per 1e12 edges) but potentially huge for toy caps on a big graph.
_FILTER_PRUNE_MIN_CAP = 4096
# ... and below this estimated edge-relation size the window form wins
# outright: the filter form trades two full-edge sort-exchanges for a
# handful of narrow aggregate + broadcast jobs, and on a small relation
# the sorts are cheaper than the extra job round-trips (measured ~1.5s
# slower at sf0.1's ~200k edges; the sorts it removes grow with |E|,
# the jobs it adds do not).
_FILTER_PRUNE_MIN_BYTES = 256 << 20


def _cap_degree_window(e: DataFrame, key: str, other: str,
                       cap: int) -> DataFrame:
    """Keep each ``key`` node's strongest ``cap`` edges by
    (weight DESC, other-endpoint ASC) — deterministic hub prune,
    window form (shuffles + sorts the WHOLE edge relation by ``key``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(
        F.col("_w").desc(), F.col(other).asc()
    )
    return (
        e.withColumn("_deg_rn", F.row_number().over(w))
        .filter(F.col("_deg_rn") <= cap)
        .drop("_deg_rn")
    )


def _cap_degree_filter(e: DataFrame, key: str, other: str,
                       cap: int) -> DataFrame:
    """Same prune, filter form: a narrow degree aggregate finds the
    over-cap nodes, a window over ONLY their rows finds each one's
    cap-th (boundary) edge, and one broadcast left join + filter keeps
    the rows at-or-before the boundary. The edge relation itself is
    never re-shuffled or sorted (its incoming partitioning flows
    through — the win vs the window form, which exchanges+sorts all of
    ``e`` by ``key`` even when no node is over the cap). Bit-identical
    to the window form: (key, other) is unique after the pre-sum, so
    (weight DESC, other ASC) is a total order and "row_number <= cap"
    is exactly "lexicographically at-or-before the cap-th row"; the
    NaN arms mirror Spark's sort order (NaN greatest, hence first under
    DESC, ties by other ASC)."""
    from pyspark.sql import Window

    deg = e.groupBy(key).agg(F.count(F.lit(1)).alias("_deg"))
    hot = deg.filter(F.col("_deg") > cap).select(key)
    w = Window.partitionBy(key).orderBy(
        F.col("_w").desc(), F.col(other).asc()
    )
    bound = (
        e.join(F.broadcast(hot), key, "left_semi")
        .withColumn("_deg_rn", F.row_number().over(w))
        .filter(F.col("_deg_rn") == cap)
        .select(
            F.col(key),
            F.col("_w").alias("_bw"),
            F.col(other).alias("_bo"),
        )
    )
    before_or_eq = F.when(
        F.isnan("_bw"),
        F.isnan("_w") & (F.col(other) <= F.col("_bo")),
    ).otherwise(
        F.isnan("_w")
        | (F.col("_w") > F.col("_bw"))
        | ((F.col("_w") == F.col("_bw")) & (F.col(other) <= F.col("_bo")))
    )
    return (
        e.join(F.broadcast(bound), key, "left")
        .filter(F.col("_bw").isNull() | before_or_eq)
        .select(*e.columns)  # the using-join fronts `key`; restore order
    )


def _leaf_scan_bytes(df: DataFrame) -> int | None:
    """Sum of Catalyst's sizeInBytes over the plan's LEAF scans. The
    whole-plan estimate is useless above a join (no key stats — the
    estimate is the cartesian product, 1.4 TB for sf0.1's 13 MB of
    input), but the leaves are real file sizes, and an edge relation
    derived by join+aggregate is bounded by a small multiple of them.
    None when any leaf reports the unknown sentinel (RDD-backed
    relations) — callers treat None as "route conservatively"."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            s = leaves.apply(i).stats().sizeInBytes()
            total += int(s if isinstance(s, int) else s.toString())
        return None if total <= 0 or total >= (1 << 60) else total
    except Exception:
        return None


def _cap_degree(e: DataFrame, key: str, other: str, cap: int) -> DataFrame:
    """Deterministic hub prune; dispatches on ``cap`` and the plan's
    leaf-scan size: production-sized caps over a large edge relation
    take the filter form (no full-edge exchange or sort), small
    relations and toy caps keep the window form (whose boundary
    relation could be broadcast-hostile at |E|/cap rows, and whose
    sorts are cheaper than the filter form's extra jobs when the
    relation is small)."""
    if cap >= _FILTER_PRUNE_MIN_CAP:
        est = _leaf_scan_bytes(e)
        if est is not None and est >= _FILTER_PRUNE_MIN_BYTES:
            return _cap_degree_filter(e, key, other, cap)
    return _cap_degree_window(e, key, other, cap)


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
    # null weights count as 0.0 (coalesce at cast time): besides making
    # w(u,v)/sum_x w(u,x) well-defined for partially-null inputs, this
    # keeps the two degree-prune forms bit-identical — an all-null
    # (src,dst) duplicate group would otherwise pre-sum to a NULL _w,
    # and a NULL boundary weight silently disables the cap in
    # _cap_degree_filter's `_bw.isNull()` arm while the window form
    # (DESC = nulls last) still enforces it (round-14 advisory).
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
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
    # Iteration-plan mode. Inline (no localCheckpoint anywhere): the
    # planner SEES every relation's partitioning, so each iteration
    # costs exactly ONE exchange (the per-dst message aggregation) —
    # the rank/edge join and the node teleport join reuse the hash
    # partitioning of their inputs. A lazy localCheckpoint under AQE
    # reports UnknownPartitioning, which forced a full re-exchange of
    # BOTH join sides in EVERY iteration. Inline lineage grows
    # linearly (r appears once per iteration), so it is capped at
    # _INLINE_MAX_ITER; past that — and on the redistribute path,
    # where r appears twice per iteration (exponential growth) — the
    # checkpoint-per-iteration form is kept.
    from ..functions.pinned import pinned_total, with_running_sum

    inline = (not redistribute_dangling) and iterations <= _INLINE_MAX_ITER
    _cut = (lambda df: df) if inline else (
        lambda df: df.localCheckpoint(eager=False)
    )
    # The pruned edge relation is ALWAYS lineage-cut (inline or not):
    # every downstream relation references it several times (e2 once,
    # nodes twice, each filter-prune its input three times), so an
    # uncut plan grows multiplicatively with the reference fan-out —
    # measured 3.2x slower when left inline. Everything BELOW this cut
    # is shallow (scan-of-RDD + one operator), so inline mode keeps
    # the per-iteration joins exchange-free without plan blowup.
    e = e.localCheckpoint(eager=False)
    # per-src out-weight totals, order-pinned: a running sum in _dst
    # order plus its last value over the full frame — both windows
    # share one exchange+sort by _src, and e2 needs no groupBy+join
    # (the previous form paid a separate aggregate and a self-join).
    # Bit-exactness: last(running) in _dst order == max_by(running,
    # _dst) == the pinned fold total; + 0.0 normalizes the sign of an
    # all-zero total (functions/pinned.py module doc).
    from pyspark.sql import Window

    worder = Window.partitionBy("_src").orderBy(F.col("_dst").asc())
    wrun = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = worder.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    e2 = _cut(
        e.withColumn("_run", F.sum("_w").over(wrun))
        .withColumn("_ow", F.last("_run").over(wall) + F.lit(0.0))
        .drop("_run")
    )
    nodes = _cut(
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    if inline:
        # teleport rides as a broadcast one-row column instead of a
        # driver-side count: the whole k-iteration pagerank is ONE lazy
        # plan (no action, no second edge-derivation pass — exchanges
        # and the node-count subquery are reused within the single
        # execution). Same IEEE double ops as the literal form:
        # (1.0 - damping) / n, 1.0 / n.
        nrow = F.broadcast(
            nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        )
        base_teleport = (F.lit(1.0) - F.lit(damping)) / F.col("_n")
        r = nodes.crossJoin(nrow).select(
            "node", (F.lit(1.0) / F.col("_n")).alias("_r")
        )
    else:
        n = nodes.count()  # bounded 1-row action; shared by iterations
        teleport = (1.0 - damping) / n
        base_teleport = F.lit(teleport)
        r = nodes.withColumn("_r", F.lit(1.0 / n))
    if redistribute_dangling:
        # dangling = nodes with no out-edge; fixed set, computed once
        dangling = nodes.join(
            e.select(F.col("_src").alias("node")).distinct(), "node",
            "left_anti",
        ).localCheckpoint(eager=False)
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
        )  # the ONE exchange per iteration (window + groupBy share it)
        base = base_teleport + F.lit(damping) * F.coalesce(
            F.col("_m"), F.lit(0.0)
        )
        joined = nodes.join(agg, F.col("node") == F.col("_dst"), "left")
        if inline:
            joined = joined.crossJoin(nrow)
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
        r = _cut(joined.select("node", base.alias("_r")))
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
    # same null-as-0.0 weight coalesce as pagerank (the audit must see
    # the exact relation the prune sees)
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
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
