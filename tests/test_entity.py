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


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs (round 6)
# ---------------------------------------------------------------------------
def test_snm_finds_adjacent_cross_side_pairs(spark):
    import linktransformer_spark as lt
    l = spark.createDataFrame(
        [(1, "aaa"), (2, "mmm"), (3, "zzz")], ["id", "name"])
    r = spark.createDataFrame(
        [(10, "aab"), (11, "zzy")], ["id", "name"])
    out = {(p["left_id"], p["right_id"])
           for p in lt.sorted_neighborhood_pairs(
               l, r, left_on="name", right_on="name",
               left_id_col="id", right_id_col="id", window=1).collect()}
    # sort: aaa(L1) aab(R10) mmm(L2) zzy(R11) zzz(L3)
    assert out == {(1, 10), (2, 10), (2, 11), (3, 11)}


def test_snm_catches_what_equality_blocking_misses(spark):
    """Near-identical names with DIFFERENT blocking attributes: the
    equi-blocked match_pairs finds nothing, the neighborhood does."""
    import linktransformer_spark as lt
    from linktransformer_spark.operators.entity import match_pairs
    l = spark.createDataFrame([(1, "acme corp", 10)], ["id", "name", "region"])
    r = spark.createDataFrame([(2, "acme corp.", 20)], ["id", "name", "region"])
    blocked = match_pairs(
        l, r, left_on="name", right_on="name", left_id_col="id",
        right_id_col="id", sim_threshold=0.5, blocking_vars=["region"])
    assert blocked.count() == 0
    snm = lt.sorted_neighborhood_pairs(
        l, r, left_on="name", right_on="name",
        left_id_col="id", right_id_col="id", window=2)
    assert snm.count() == 1


def test_snm_prefix_bucketing_matches_global_sort(spark, sf_dir):
    """Distributed prefix-bucket ranking must equal a single global
    rank — pairs identical for any prefix_len."""
    import linktransformer_spark as lt
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    kw = dict(left_on="c_name", right_on="s_name",
              left_id_col="c_custkey", right_id_col="s_suppkey", window=4)
    a = {tuple(r) for r in lt.sorted_neighborhood_pairs(
        cust, supp, prefix_len=1, **kw).collect()}
    b = {tuple(r) for r in lt.sorted_neighborhood_pairs(
        cust, supp, prefix_len=3, **kw).collect()}
    assert a == b and a


def test_snm_validates(spark):
    import linktransformer_spark as lt
    l = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError):
        lt.sorted_neighborhood_pairs(
            l, l, left_on="name", right_on="name",
            left_id_col="id", right_id_col="id", window=0)
    s = spark.createDataFrame([("x", "a")], ["id", "name"])
    with pytest.raises(ValueError, match="integral"):
        lt.sorted_neighborhood_pairs(
            s, l, left_on="name", right_on="name",
            left_id_col="id", right_id_col="id")


# ---------------------------------------------------------------------------
# match_pairs_weighted (round 6)
# ---------------------------------------------------------------------------
def test_weighted_fields_combine_and_threshold(spark):
    import linktransformer_spark as lt
    l = spark.createDataFrame(
        [(1, "acme corp", 100.0, 5)], ["id", "name", "bal", "nat"])
    r = spark.createDataFrame(
        [(2, "acme corp", 100.0, 5),    # perfect: 1.0
         (3, "acme corp", 100.0, 9),    # loses the 0.1 exact field
         (4, "zzz", 100.0, 5)],         # name mismatch dominates
        ["id", "name", "bal", "nat"])
    out = {p["right_id"]: p["score"]
           for p in lt.match_pairs_weighted(
               l, r,
               fields=[("name", "name", 0.7, "lev"),
                       ("bal", "bal", 0.2, "num"),
                       ("nat", "nat", 0.1, "exact")],
               left_id_col="id", right_id_col="id",
               sim_threshold=0.85).collect()}
    assert abs(out[2] - 1.0) < 1e-12
    assert abs(out[3] - 0.9) < 1e-12
    assert 4 not in out


def test_weighted_num_field_relative_proximity(spark):
    import linktransformer_spark as lt
    l = spark.createDataFrame([(1, 100.0)], ["id", "v"])
    r = spark.createDataFrame([(2, 90.0), (3, None)], ["id", "v"])
    out = {p["right_id"]: p["score"]
           for p in lt.match_pairs_weighted(
               l, r, fields=[("v", "v", 1.0, "num")],
               left_id_col="id", right_id_col="id",
               sim_threshold=-1.0).collect()}
    assert abs(out[2] - 0.9) < 1e-12   # 1 - 10/100
    assert out[3] == 0.0               # null scores 0


def test_weighted_validates(spark):
    import linktransformer_spark as lt
    l = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="non-empty"):
        lt.match_pairs_weighted(
            l, l, fields=[], left_id_col="id", right_id_col="id",
            sim_threshold=0.5)
    with pytest.raises(ValueError, match="kind"):
        lt.match_pairs_weighted(
            l, l, fields=[("name", "name", 1.0, "soundex")],
            left_id_col="id", right_id_col="id", sim_threshold=0.5)


# ---------------------------------------------------------------------------
# phonetic_key (round 6)
# ---------------------------------------------------------------------------
def test_phonetic_key_groups_sound_alikes(spark):
    from linktransformer_spark.functions.similarity import phonetic_key
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("robert!",), ("Ashcraft",), ("",),
         (None,), ("123",)], ["name"])
    out = [r["pk"] for r in df.select(phonetic_key(F.col("name")).alias("pk")).collect()]
    assert out[0] == out[1] == out[2] == "R163"
    assert out[3].startswith("A")
    assert out[4] == "" and out[5] == "" and out[6] == ""


def test_phonetic_key_pads_short_names(spark):
    from linktransformer_spark.functions.similarity import phonetic_key
    df = spark.createDataFrame([("Lee",), ("Ab",)], ["name"])
    out = [r["pk"] for r in df.select(phonetic_key(F.col("name")).alias("pk")).collect()]
    assert all(len(k) == 4 for k in out)
    assert out[0] == "L000"


# ---------------------------------------------------------------------------
# LSH similarity blocking (round 7): blocking="lsh"
# ---------------------------------------------------------------------------
def test_lsh_blocking_finds_cross_block_matches(spark):
    """Identical keys land in the same hyperplane bucket regardless of
    any discrete attribute — the case equality blocking structurally
    misses (left 4 is 'eu', right 7 is 'us', same name)."""
    left, right = _frames(spark)
    out = match_pairs(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.99, blocking="lsh", model="hash-ngram",
    )
    pairs = {(r["left_id"], r["right_id"]) for r in out.collect()}
    assert (1, 7) in pairs and (4, 7) in pairs  # cross-block match found


def test_lsh_blocking_is_subset_of_cross(spark):
    """LSH candidates with exact re-score are a SUBSET of the exact
    cross product at the same threshold (approximate recall, no false
    positives), with identical scores on shared pairs."""
    left, right = _frames(spark)
    kw = dict(left_on="name", right_on="rname", left_id_col="lid",
              right_id_col="rid", sim_threshold=0.3, model="hash-ngram")
    lsh = {(r["left_id"], r["right_id"]): round(r["score"], 9)
           for r in match_pairs(left, right, blocking="lsh", **kw).collect()}
    full = {(r["left_id"], r["right_id"]): round(r["score"], 9)
            for r in match_pairs(left, right, **kw).collect()}
    assert set(lsh) <= set(full)
    for k, v in lsh.items():
        assert full[k] == v


def test_lsh_blocking_scorer_can_be_levenshtein(spark):
    left, right = _frames(spark)
    out = match_pairs(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.95, blocking="lsh", model="levenshtein",
    )
    pairs = {(r["left_id"], r["right_id"]) for r in out.collect()}
    assert (1, 7) in pairs  # exact name, lev_sim = 1.0


def test_lsh_blocking_validates(spark):
    left, right = _frames(spark)
    kw = dict(left_on="name", right_on="rname", left_id_col="lid",
              right_id_col="rid", sim_threshold=0.5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        match_pairs(left, right, blocking="lsh", blocking_vars=["blk"], **kw)
    with pytest.raises(ValueError, match="n_planes"):
        match_pairs(left, right, blocking="lsh", n_planes=0, **kw)
    with pytest.raises(ValueError, match="unknown blocking"):
        match_pairs(left, right, blocking="nope", **kw)


def test_lsh_blocking_plan_is_equi_join(spark):
    """The LSH candidate stage must be a bucket equi-join — never a
    cartesian product."""
    left, right = _frames(spark)
    out = match_pairs(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.5, blocking="lsh", model="hash-ngram",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_resolve_entities_lsh_end_to_end(spark):
    left, right = _frames(spark)
    out = resolve_entities(
        left, right, left_on="name", right_on="rname",
        left_id_col="lid", right_id_col="rid",
        sim_threshold=0.99, blocking="lsh", model="hash-ngram",
    )
    rows = {(r["side"], r["record_id"]): r for r in out.collect()}
    assert len(rows) == 6  # every input record labeled
    # 1, 4 (both "acme corp") and 7 share one entity
    e = rows[("L", 1)]["entity_id"]
    assert rows[("L", 4)]["entity_id"] == e == rows[("R", 7)]["entity_id"]
    assert rows[("L", 1)]["n_members"] == 3
    assert rows[("L", 3)]["n_members"] == 1  # singleton stays alone


# --------------------------------------------------------- incremental attach

class TestAttachToEntities:
    def _registry(self, spark):
        return spark.createDataFrame(
            [
                (100, "acme corporation", 5),
                (100, "acme corp", 5),        # second member key, same entity
                (200, "globex company", 5),
                (300, "initech llc", 7),
            ],
            ["entity_id", "key", "blk"],
        )

    def _new(self, spark):
        return spark.createDataFrame(
            [
                (1, "acme corp.", 5),          # near member key of 100
                (2, "globex compan", 5),       # near 200
                (3, "wholly unrelated", 5),    # no match
                (4, "initech llc", 5),         # right key, WRONG block
            ],
            ["rid", "name", "blk"],
        )

    def test_attach_blocked_best_match_and_nulls(self, spark):
        import linktransformer_spark as lt

        out = {
            r["record_id"]: (r["entity_id"], r["matched_key"])
            for r in lt.attach_to_entities(
                self._new(spark), self._registry(spark),
                on="name", id_col="rid", sim_threshold=0.6,
                blocking_vars=[("blk", "blk")],
            ).collect()
        }
        assert out[1][0] == 100 and out[1][1].startswith("acme")
        assert out[2] == (200, "globex company")
        assert out[3] == (None, None)          # below threshold
        assert out[4] == (None, None)          # blocked out
        assert len(out) == 4                   # one row per new record

    def test_attach_tie_breaks_to_smallest_entity_then_key(self, spark):
        import linktransformer_spark as lt

        reg = spark.createDataFrame(
            [(9, "same key"), (4, "same key"), (4, "same kez")],
            ["entity_id", "key"],
        )
        new = spark.createDataFrame([(1, "same key")], ["rid", "name"])
        r = lt.attach_to_entities(
            new, reg, on="name", id_col="rid", sim_threshold=0.5
        ).collect()[0]
        assert (r["entity_id"], r["matched_key"]) == (4, "same key")

    def test_attach_registry_roundtrip_from_resolve(self, spark):
        """resolve_entities -> registry -> attach: a record equal to a
        resolved member key adopts that entity's id."""
        import linktransformer_spark as lt

        cust = spark.createDataFrame(
            [(1, "acme corporation", 5)], ["c_id", "c_name", "n"]
        )
        supp = spark.createDataFrame(
            [(7, "acme corporatio", 5)], ["s_id", "s_name", "n"]
        )
        assigned = lt.resolve_entities(
            cust, supp, left_on="c_name", right_on="s_name",
            left_id_col="c_id", right_id_col="s_id",
            sim_threshold=0.6, blocking_vars=[("n", "n")],
        )
        eids = {r["entity_id"] for r in assigned.collect()}
        assert len(eids) == 1  # the two records resolved into ONE entity
        registry = assigned.select("entity_id", "key")
        new = spark.createDataFrame([(42, "acme corporatio")], ["rid", "name"])
        got = lt.attach_to_entities(
            new, registry, on="name", id_col="rid", sim_threshold=0.6
        ).collect()[0]
        assert got["entity_id"] == eids.pop()

    def test_attach_lsh_blocking_finds_cross_block_match(self, spark):
        import linktransformer_spark as lt

        reg = spark.createDataFrame(
            [(100, "acme corporation", 1)], ["entity_id", "key", "blk"]
        )
        new = spark.createDataFrame(
            [(1, "acme corporation", 2)], ["rid", "name", "blk"]
        )
        # exact-blocked on blk: missed
        missed = lt.attach_to_entities(
            new, reg, on="name", id_col="rid", sim_threshold=0.9,
            blocking_vars=[("blk", "blk")],
        ).collect()[0]
        assert missed["entity_id"] is None
        # lsh similarity blocking: identical keys share every bucket
        hit = lt.attach_to_entities(
            new, reg, on="name", id_col="rid", sim_threshold=0.9,
            blocking="lsh", n_planes=4,
        ).collect()[0]
        assert hit["entity_id"] == 100

    def test_attach_validations(self, spark):
        import linktransformer_spark as lt

        new = self._new(spark)
        reg = self._registry(spark)
        with pytest.raises(ValueError, match="sim_threshold"):
            lt.attach_to_entities(new, reg, on="name", id_col="rid",
                                  sim_threshold=2.0)
        with pytest.raises(ValueError, match="mutually exclusive"):
            lt.attach_to_entities(
                new, reg, on="name", id_col="rid", sim_threshold=0.5,
                blocking="lsh", blocking_vars=["blk"],
            )
        with pytest.raises(ValueError, match="blocking var"):
            lt.attach_to_entities(
                new, reg, on="name", id_col="rid", sim_threshold=0.5,
                blocking_vars=["nope"],
            )


def test_streaming_attach_matches_batch(spark, tmp_path):
    """streaming_attach_candidates + final_attach == attach_to_entities
    on the same inputs (the drain-then-rank split changes latency, not
    rows) — unmatched NULL rows included."""
    import linktransformer_spark as lt
    from linktransformer_spark.streaming.ops import (
        final_attach, run_available_now, streaming_attach_candidates,
    )

    reg = spark.createDataFrame(
        [(100, "acme corporation", 5), (200, "globex company", 5)],
        ["entity_id", "key", "blk"],
    )
    new = spark.createDataFrame(
        [(1, "acme corporatio", 5), (2, "globex compan", 5),
         (3, "nothing alike", 5), (4, "acme corporation", 9)],
        ["rid", "name", "blk"],
    )
    kw = dict(on="name", id_col="rid", sim_threshold=0.6,
              blocking_vars=[("blk", "blk")])
    want = sorted(map(tuple, lt.attach_to_entities(new, reg, **kw).collect()))

    src = str(tmp_path / "src")
    new.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    drained = run_available_now(
        streaming_attach_candidates(stream, reg, **kw)
    )
    got = sorted(map(tuple, final_attach(
        drained, new, on="name", id_col="rid").collect()))
    assert got == want


def test_streaming_attach_pruned_matches_unpruned(spark, tmp_path):
    """prune_topk bounds the drained attach sink at records x topn
    without changing final_attach's best-entity pick — the prune keeps
    each record's top rows under EXACTLY the finalizer's selection
    order (score DESC, entity ASC, matched_key ASC). A hot registry
    block (many near-identical entities behind one blocking key) makes
    the unpruned sink fan out, so the drop is observable."""
    from pyspark.sql import functions as F

    from linktransformer_spark.streaming.ops import (
        final_attach, run_available_now, streaming_attach_candidates,
    )

    # 40 entities in ONE block, all lev-similar to every record key
    reg = spark.range(40).select(
        F.col("id").alias("entity_id"),
        F.format_string("acme widget depot %02d", F.col("id")).alias("key"),
        F.lit(5).alias("blk"),
    )
    new = spark.range(12).select(
        F.col("id").alias("rid"),
        F.format_string("acme widget depot %02d", F.col("id")).alias("name"),
        F.lit(5).alias("blk"),
    )
    kw = dict(on="name", id_col="rid", sim_threshold=0.6,
              blocking_vars=[("blk", "blk")])
    src = str(tmp_path / "src")
    new.write.mode("overwrite").parquet(src)

    def run(prune):
        stream = spark.readStream.schema(new.schema).parquet(src)
        return run_available_now(
            streaming_attach_candidates(stream, reg, prune_topk=prune, **kw)
        )

    raw = run(None)
    pruned = run(1)
    assert raw.count() > pruned.count()
    assert pruned.count() <= new.count()
    want = sorted(map(tuple, final_attach(
        raw, new, on="name", id_col="rid").collect()))
    got = sorted(map(tuple, final_attach(
        pruned, new, on="name", id_col="rid").collect()))
    assert got == want and got


def test_attach_prune_null_matched_key_tie_matches_spark_order(spark):
    """A candidate tied on (score, entity_id) where one row's
    matched_key is NULL: final_attach's window orders matched_key asc
    NULLS FIRST, so the null row wins the tie — the pruner's pandas
    sort must keep THAT row (na_position='first'), not the non-null
    one, or the pruned top-1 diverges from the unpruned serve."""
    from pyspark.sql import functions as F  # noqa: F811

    from linktransformer_spark.streaming.ops import (
        _prune_attach_topk, final_attach,
    )

    cands = spark.createDataFrame(
        [(1, "k1", 7, None, 0.9), (1, "k1", 7, "aaa", 0.9),
         (2, "k2", 3, "zzz", 0.5), (2, "k2", 3, None, 0.5)],
        "record_id long, key string, entity_id long, "
        "matched_key string, score double",
    )
    new = spark.createDataFrame(
        [(1, "k1"), (2, "k2")], "rid long, name string"
    )
    want = sorted(map(tuple, final_attach(
        cands, new, on="name", id_col="rid").collect()))
    pruned = _prune_attach_topk(cands, 1)
    kept = {(r["record_id"], r["matched_key"]) for r in pruned.collect()}
    assert kept == {(1, None), (2, None)}
    got = sorted(map(tuple, final_attach(
        pruned, new, on="name", id_col="rid").collect()))
    assert got == want


def test_attach_prune_property_random_ties(spark):
    """Property: for random candidate relations (duplicate scores,
    shared keys, multi-block ties), per-record top-1 pruning under the
    final_attach selection order never changes the final best-entity
    pick. _prune_attach_topk is a plain DataFrame transform, so the
    property drives it batch-side."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from linktransformer_spark.streaming.ops import (
        _prune_attach_topk, final_attach,
    )
    from pyspark.sql import functions as F

    cand_row = st.tuples(
        st.integers(0, 6),                      # record_id
        st.integers(0, 8),                      # entity_id
        # None included: the pruner must place a NULL matched_key FIRST
        # on an (score, entity_id) tie, matching final_attach's Spark
        # window order (asc NULLS FIRST) — pandas defaults NaN last
        st.sampled_from(["aa", "ab", "ba", None]),  # matched_key
        st.sampled_from([0.25, 0.5, 0.5, 0.75, 1.0]),  # tie-heavy score
    )

    def nsort(rows_):
        # None-safe tuple sort: matched_key may be NULL now
        return sorted(
            map(tuple, rows_),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(cand_row, min_size=1, max_size=40))
    def run(rows):
        cands = spark.createDataFrame(
            [(r, f"k{r}", e, mk, s) for r, e, mk, s in rows],
            "record_id long, key string, entity_id long, "
            "matched_key string, score double",
        )
        new = spark.createDataFrame(
            [(r, f"k{r}") for r in sorted({r for r, *_ in rows})],
            "rid long, name string",
        )
        want = nsort(final_attach(
            cands, new, on="name", id_col="rid").collect())
        pruned = _prune_attach_topk(cands, 1)
        assert pruned.count() <= new.count() * len(
            {(mk, s) for _, _, mk, s in rows}
        ) and pruned.count() >= 0
        got = nsort(final_attach(
            pruned, new, on="name", id_col="rid").collect())
        assert got == want

    run()


def test_lsh_kernel_matches_relational_reference(spark):
    # the round-13 in-kernel LSH path (Arrow buckets from raw keys +
    # in-cogroup encode_batch dots) must be row- and bit-identical to
    # the relational reference it replaced: encode -> hyperplane_bucket
    # -> bucket equi-join -> dot fold -> threshold
    from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder
    from linktransformer_spark.functions.similarity import dot
    from linktransformer_spark.operators.ann import hyperplane_bucket
    from linktransformer_spark.operators.entity import match_pairs

    names = ["Alice Muller", "Alice Müller", "Bob Stone", "bob stone ",
             "Ünïcodé Näme", "", "xy", "Alice  Muller", "Stone Bob",
             "ali ce muller"]
    df1 = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["lid", "name"]
    )
    df2 = spark.createDataFrame(
        [(100 + i, n.upper() if i % 2 else n) for i, n in enumerate(names)],
        ["rid", "name"],
    )
    got = sorted(
        map(tuple, match_pairs(
            df1, df2, left_on="name", right_on="name",
            left_id_col="lid", right_id_col="rid",
            sim_threshold=0.35, blocking="lsh", model="hash-ngram",
            n_planes=4, lsh_dim=16,
        ).collect())
    )
    enc = HashNgramEncoder(dim=16)
    l = enc.encode(
        df1.select(F.col("lid"), F.col("name").alias("_k")), "_k", "_e"
    ).withColumn("_bkt", hyperplane_bucket("_e", 16, 4))
    r = enc.encode(
        df2.select(F.col("rid"), F.col("name").alias("_k2")), "_k2", "_e2"
    ).withColumn("_bkt", hyperplane_bucket("_e2", 16, 4))
    ref = sorted(
        map(tuple, (
            l.join(r, "_bkt")
            .withColumn("score", dot(F.col("_e"), F.col("_e2")))
            .filter(F.col("score") >= 0.35)
            .select("lid", "rid", "score")
        ).collect())
    )
    assert got == ref and len(ref) > 0
