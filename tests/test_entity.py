"""Entity-resolution semantics (operators/entity.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from linktransformer_spark.operators.entity import match_pairs, resolve_entities


def _frames(spark):
    left = spark.createDataFrame([
        Row(lid=1, name="acme corp", blk="us"),
        Row(lid=2, name="acme corpx", blk="us"),
        Row(lid=3, name="zzz unrelated", blk="us"),
        Row(lid=4, name="acme corp", blk="eu"),   # blocked away from R side
    ])
    right = spark.createDataFrame([
        Row(rid=7, rname="acme corp", rblk="us"),
        Row(rid=8, rname="other name", rblk="us"),
    ])
    return left, right


def test_match_pairs_blocked_and_threshold(spark):
    left, right = _frames(spark)
    p = match_pairs(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.85, blocking_vars=[("blk", "rblk")],
    ).collect()
    got = {(r["left_id"], r["right_id"]) for r in p}
    # lid=1 exact match (1.0), lid=2 one edit over len 10 (0.9);
    # lid=4 identical text but a different block -> excluded
    assert got == {(1, 7), (2, 7)}
    scores = {(r["left_id"], r["right_id"]): r["score"] for r in p}
    assert scores[(1, 7)] == 1.0 and abs(scores[(2, 7)] - 0.9) < 1e-9


def test_resolve_entities_groups_and_singletons(spark):
    left, right = _frames(spark)
    out = resolve_entities(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.85, blocking_vars=[("blk", "rblk")],
    ).collect()
    assert len(out) == 6  # every input record appears exactly once
    by_rec = {(r["side"], r["record_id"]): r for r in out}
    # lid 1, lid 2, rid 7 fuse transitively into one entity
    e = {by_rec[("L", 1)]["entity_id"], by_rec[("L", 2)]["entity_id"],
         by_rec[("R", 7)]["entity_id"]}
    assert len(e) == 1
    ent = by_rec[("L", 1)]
    assert ent["n_members"] == 3
    assert ent["canonical"] == "acme corp"
    # unmatched records are singletons with their own entity
    for key in (("L", 3), ("L", 4), ("R", 8)):
        assert by_rec[key]["n_members"] == 1
        assert by_rec[key]["canonical"] == by_rec[key]["key"]
    # L/R node encoding keeps entity ids distinct between sides
    assert by_rec[("L", 3)]["entity_id"] != by_rec[("R", 8)]["entity_id"]


def test_resolve_entities_unblocked_cross(spark):
    left, right = _frames(spark)
    out = resolve_entities(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid", sim_threshold=0.85,
    )
    by_rec = {(r["side"], r["record_id"]): r for r in out.collect()}
    # without blocking, lid=4 (identical text, other block) joins too
    assert by_rec[("L", 4)]["n_members"] == 4


def test_match_pairs_hash_ngram_model(spark):
    left, right = _frames(spark)
    p = match_pairs(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.95, model="hash-ngram",
    ).collect()
    got = {(r["left_id"], r["right_id"]) for r in p}
    assert (1, 7) in got and (4, 7) in got  # exact texts -> cosine 1.0
    assert (3, 8) not in got


def test_entity_validation_errors(spark):
    left, right = _frames(spark)
    kw = dict(left_on="name", right_on="rname",
              left_id_col="lid", right_id_col="rid")
    with pytest.raises(ValueError, match="sim_threshold"):
        match_pairs(left, right, sim_threshold=1.5, **kw)
    with pytest.raises(ValueError, match="not in left"):
        match_pairs(left, right, sim_threshold=0.5,
                    blocking_vars=["nope"], **kw)
    with pytest.raises(ValueError, match="unknown model"):
        match_pairs(left, right, sim_threshold=0.5, model="bogus", **kw)


def test_blocked_plan_is_equi_join(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    plan = match_pairs(
        cust, supp, left_on="c_name", right_on="s_name",
        left_id_col="c_custkey", right_id_col="s_suppkey",
        sim_threshold=0.62, blocking_vars=[("c_nationkey", "s_nationkey")],
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
