"""PageRank semantics (operators/graph.py) on hand-built graphs; the
registered query graph_pagerank is oracle-checked separately."""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


def _e(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_pagerank_cycle_is_uniform(spark):
    # ring: every node has in/out degree 1 -> rank stays exactly 1/n
    n = 5
    e = _e(spark, [(i, (i + 1) % n) for i in range(n)])
    rows = lt.pagerank(e, iterations=4).collect()
    assert len(rows) == n
    for r in rows:
        assert abs(r["rank"] - 1.0 / n) < 1e-12


def test_pagerank_star_center_dominates(spark):
    # spokes point at the center; center points back at one spoke
    e = _e(spark, [(i, 0) for i in range(1, 6)] + [(0, 1)])
    rows = {r["node"]: r["rank"] for r in lt.pagerank(e, iterations=5).collect()}
    assert rows[0] == max(rows.values())
    assert rows[1] > rows[2]  # the center's endorsement beats plain spokes


def test_pagerank_mass_conserved_without_dangling(spark):
    e = _e(spark, [(1, 2), (2, 3), (3, 1), (2, 1)])
    total = sum(r["rank"] for r in lt.pagerank(e, iterations=6).collect())
    assert abs(total - 1.0) < 1e-9


def test_pagerank_dangling_mass_leaks(spark):
    # node 3 has no out-edges -> its mass leaks (documented variant)
    e = _e(spark, [(1, 3), (2, 3)])
    total = sum(r["rank"] for r in lt.pagerank(e, iterations=3).collect())
    assert total < 1.0


def test_pagerank_weights_shift_rank(spark):
    ew = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    rows = {r["node"]: r["rank"]
            for r in lt.pagerank(ew, weight_col="w", iterations=4).collect()}
    assert rows[2] > rows[3]  # 90% of node 1's mass flows to 2


def test_pagerank_parallel_edges_presum(spark):
    # (1->2) twice == weight-2 edge
    a = lt.pagerank(_e(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]),
                    iterations=3).collect()
    b = lt.pagerank(
        spark.createDataFrame(
            [(1, 2, 2.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
            ["src", "dst", "w"]),
        weight_col="w", iterations=3).collect()
    assert {(r["node"], r["rank"]) for r in a} == {(r["node"], r["rank"]) for r in b}


def test_pagerank_validates(spark):
    e = _e(spark, [(1, 2)])
    with pytest.raises(ValueError):
        lt.pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        lt.pagerank(e, damping=1.0)


# ---------------------------------------------------------------------------
# Degree caps + dangling redistribution (round 7)
# ---------------------------------------------------------------------------
def test_pagerank_caps_noop_when_under_cap(spark):
    e = _e(spark, [(1, 2), (2, 3), (3, 1), (2, 1)])
    loose = {r["node"]: r["rank"] for r in lt.pagerank(e, iterations=4).collect()}
    off = {r["node"]: r["rank"] for r in lt.pagerank(
        e, iterations=4, max_in_degree=None, max_out_degree=None).collect()}
    assert loose == off  # bit-identical when no degree exceeds the cap


def test_pagerank_in_degree_cap_prunes_hub_edges(spark):
    # hub 0 has in-degree 5; cap 2 keeps the strongest two in-edges
    # (equal weights -> smallest src ids 1,2) == pruned-graph pagerank
    e = _e(spark, [(i, 0) for i in range(1, 6)] + [(0, 1)])
    capped = {r["node"]: r["rank"] for r in lt.pagerank(
        e, iterations=4, max_in_degree=2).collect()}
    pruned = {r["node"]: r["rank"] for r in lt.pagerank(
        _e(spark, [(1, 0), (2, 0), (0, 1)]), iterations=4).collect()}
    # nodes 3..5 become isolated-but-present in the capped graph? No:
    # their OUT edge was pruned, so they vanish from the edge relation
    # entirely -- the capped graph is exactly the pruned graph plus
    # nothing else
    assert set(capped) == set(pruned) == {0, 1, 2}
    for k, v in pruned.items():
        assert abs(capped[k] - v) < 1e-12


def test_pagerank_out_degree_cap_keeps_strongest(spark):
    ew = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    capped = {r["node"]: r["rank"] for r in lt.pagerank(
        ew, weight_col="w", iterations=4, max_out_degree=1).collect()}
    pruned = {r["node"]: r["rank"] for r in lt.pagerank(
        spark.createDataFrame([(1, 2, 9.0), (2, 1, 1.0), (3, 1, 1.0)],
                              ["src", "dst", "w"]),
        weight_col="w", iterations=4).collect()}
    for k, v in pruned.items():
        assert abs(capped[k] - v) < 1e-12


def test_pagerank_redistribute_dangling_sums_to_one(spark):
    # node 3 dangles; with redistribution ranks form a distribution
    e = _e(spark, [(1, 3), (2, 3), (3, 3)][:2])
    rows = lt.pagerank(e, iterations=5, redistribute_dangling=True).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
    # and the leaky default still leaks
    leaky = sum(r["rank"] for r in lt.pagerank(e, iterations=5).collect())
    assert leaky < 1.0
    # no-dangling graph: both modes identical
    ring = _e(spark, [(1, 2), (2, 3), (3, 1)])
    a = {r["node"]: r["rank"] for r in lt.pagerank(ring, iterations=3).collect()}
    b = {r["node"]: r["rank"] for r in lt.pagerank(
        ring, iterations=3, redistribute_dangling=True).collect()}
    assert a == b


def test_pagerank_cap_validation(spark):
    e = _e(spark, [(1, 2)])
    with pytest.raises(ValueError, match="max_in_degree"):
        lt.pagerank(e, max_in_degree=0)
    with pytest.raises(ValueError, match="max_out_degree"):
        lt.pagerank(e, max_out_degree=-3)


def test_cap_degree_filter_matches_window(spark):
    # the filter-form prune (production caps: narrow degree agg +
    # broadcast boundary join) must be row-identical to the window
    # form at every cap, including tie-heavy weights
    import random

    from linktransformer_spark.operators import graph as G

    rnd = random.Random(7)
    rows = [
        (rnd.randrange(6), rnd.randrange(6), float(rnd.randrange(1, 4)))
        for _ in range(300)
    ]
    ep = (
        spark.createDataFrame(rows, "s long, d long, w double")
        .selectExpr("s as _src", "d as _dst", "cast(w as double) as _w")
        .groupBy("_src", "_dst")
        .agg(F.sum("_w").alias("_w"))
    )
    for key, other in (("_dst", "_src"), ("_src", "_dst")):
        for cap in (1, 2, 5, 50):
            a = sorted(
                map(tuple, G._cap_degree_window(ep, key, other, cap).collect())
            )
            b = sorted(
                map(tuple, G._cap_degree_filter(ep, key, other, cap).collect())
            )
            assert a == b, (key, cap)


def test_pagerank_inline_matches_checkpointed(spark, monkeypatch):
    # the inline iteration plan (no localCheckpoints, iterations <=
    # _INLINE_MAX_ITER) must be bit-identical to the checkpointed form
    from linktransformer_spark.operators import graph as G

    ew = spark.createDataFrame(
        [(1, 2, 3.0), (2, 3, 1.0), (3, 1, 2.0), (2, 1, 5.0), (4, 1, 1.0),
         (1, 4, 7.0), (4, 3, 2.0)],
        ["src", "dst", "w"],
    )
    a = sorted(
        map(tuple, lt.pagerank(ew, weight_col="w", iterations=4).collect())
    )
    monkeypatch.setattr(G, "_INLINE_MAX_ITER", 0)
    b = sorted(
        map(tuple, lt.pagerank(ew, weight_col="w", iterations=4).collect())
    )
    assert a == b


def test_pagerank_null_weights_count_as_zero(spark):
    """Null edge weights coalesce to 0.0 at cast time (round-14
    advisory): ranks equal the explicit-0.0 run bit-exactly, and the
    degree caps stay enforced in BOTH prune forms even when a
    duplicate group's weights are all null."""
    from linktransformer_spark.operators import graph as G

    rows = [(1, d, None) for d in range(2, 12)] + [
        (1, 5, None),  # all-null duplicate group -> presum would be null
        (2, 3, 4.0), (3, 1, None), (3, 1, 2.0), (4, 1, 1.0),
    ]
    ew = spark.createDataFrame(rows, "src long, dst long, w double")
    ez = ew.fillna({"w": 0.0})
    a = sorted(map(tuple, lt.pagerank(ew, weight_col="w", iterations=3,
                                      max_out_degree=4).collect()))
    b = sorted(map(tuple, lt.pagerank(ez, weight_col="w", iterations=3,
                                      max_out_degree=4).collect()))
    assert a == b
    # both prune forms agree on the null-heavy relation
    e = ew.selectExpr("src as _src", "dst as _dst",
                      "coalesce(w, 0.0d) as _w") \
        .groupBy("_src", "_dst").agg(F.sum("_w").alias("_w"))
    fa = sorted(map(tuple,
                    G._cap_degree_filter(e, "_src", "_dst", 4).collect()))
    fb = sorted(map(tuple,
                    G._cap_degree_window(e, "_src", "_dst", 4).collect()))
    assert fa == fb
    assert len([r for r in fa if r[0] == 1]) == 4  # cap enforced
