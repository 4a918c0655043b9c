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
