"""merge_asof semantics: direction, exact-match gating, tolerance,
numeric on-columns, null handling (pandas merge_asof is the semantic
model; pinned on tiny hand-computable frames)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from linktransformer_spark.operators.asof import merge_asof


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01 10:00:03"), 100.0),
            (2, "A", ts("2024-01-01 10:00:10"), 101.0),
            (3, "B", ts("2024-01-01 10:00:05"), 200.0),
            (4, "C", ts("2024-01-01 10:00:05"), 300.0),  # no quotes for C
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (10, "A", ts("2024-01-01 10:00:01"), 99.5),
            (11, "A", ts("2024-01-01 10:00:03"), 99.9),   # exact tie w/ trade 1
            (12, "A", ts("2024-01-01 10:00:08"), 100.5),
            (13, "B", ts("2024-01-01 10:00:30"), 199.0),  # only AFTER trade 3
        ],
        "quote_id long, sym string, ts timestamp, bid double",
    )


def collect_map(df, key="trade_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_backward_basic(trades, quotes):
    out = collect_map(
        merge_asof(trades, quotes, on="ts", by="sym", right_id_col="quote_id")
    )
    assert out[1]["quote_id"] == 11 and out[1]["bid"] == 99.9  # exact match allowed
    assert out[2]["quote_id"] == 12
    assert out[3]["quote_id"] is None  # only future quotes for B
    assert out[4]["quote_id"] is None  # no quotes at all for C


def test_backward_no_exact_matches(trades, quotes):
    out = collect_map(
        merge_asof(trades, quotes, on="ts", by="sym", right_id_col="quote_id",
                   allow_exact_matches=False)
    )
    # trade 1 @10:00:03 must skip quote 11 @10:00:03 and take quote 10
    assert out[1]["quote_id"] == 10


def test_forward(trades, quotes):
    out = collect_map(
        merge_asof(trades, quotes, on="ts", by="sym", right_id_col="quote_id",
                   direction="forward")
    )
    assert out[1]["quote_id"] == 11  # exact counts forward too
    assert out[2]["quote_id"] is None  # nothing after 10:00:10 for A
    assert out[3]["quote_id"] == 13


def test_tolerance(trades, quotes):
    out = collect_map(
        merge_asof(trades, quotes, on="ts", by="sym", right_id_col="quote_id",
                   tolerance=2.0)
    )
    assert out[1]["quote_id"] == 11  # gap 0s
    assert out[2]["quote_id"] == 12  # gap 2s, inclusive
    out5 = collect_map(
        merge_asof(trades, quotes, on="ts", by="sym", right_id_col="quote_id",
                   tolerance=1.0)
    )
    assert out5[2]["quote_id"] is None  # gap 2s > 1s


def test_numeric_on(spark):
    l = spark.createDataFrame([(1, 5.0), (2, 12.0)], "lid long, x double")
    r = spark.createDataFrame([(7, 4.0, "a"), (8, 11.0, "b")],
                              "rid long, x double, tag string")
    out = {row["lid"]: row.asDict()
           for row in merge_asof(l, r, on="x", right_id_col="rid").collect()}
    assert out[1]["tag"] == "a" and out[2]["tag"] == "b"


def test_tie_between_right_rows(spark):
    l = spark.createDataFrame([(1, 10.0)], "lid long, x double")
    r = spark.createDataFrame([(7, 10.0), (9, 10.0), (8, 10.0)],
                              "rid long, x double")
    [row] = merge_asof(l, r, on="x", right_id_col="rid").collect()
    assert row["rid"] == 9  # deterministic: largest right id wins the tie


def test_bad_direction(spark):
    l = spark.createDataFrame([(1, 1.0)], "lid long, x double")
    with pytest.raises(ValueError, match="direction"):
        merge_asof(l, l, on="x", direction="sideways")


def test_nearest_picks_smaller_gap_and_ties_backward(spark):
    l = spark.createDataFrame(
        [(1, 10.0), (2, 14.0), (3, 100.0)], "lid long, x double"
    )
    r = spark.createDataFrame(
        [(101, 8.0, "a"), (102, 15.0, "b")], "rid long, x double, v string"
    )
    out = {row["lid"]: row["v"] for row in
           merge_asof(l, r, on="x", right_id_col="rid",
                      direction="nearest").collect()}
    # lid=1: gaps 2 vs 5 -> backward 'a'; lid=2: gaps 6 vs 1 -> forward
    # 'b'; lid=3: only backward candidates -> 'b'
    assert out == {1: "a", 2: "b", 3: "b"}

    # exact tie: left at 11.5 is 3.5 from both -> backward wins (pandas)
    lt_ = spark.createDataFrame([(9, 11.5)], "lid long, x double")
    [row] = merge_asof(lt_, r, on="x", right_id_col="rid",
                       direction="nearest").collect()
    assert row["v"] == "a"


def test_nearest_matches_pandas(spark):
    import pandas as pd

    lpd = pd.DataFrame({"x": [1.0, 4.0, 7.5, 9.0, 20.0]})
    rpd = pd.DataFrame({"x": [0.0, 5.0, 8.0, 30.0],
                        "rid": [1, 2, 3, 4]})
    want = pd.merge_asof(lpd, rpd, on="x", direction="nearest")
    l = spark.createDataFrame(lpd.assign(lid=range(5)))
    r = spark.createDataFrame(rpd)
    got = {row["x"]: row["rid"] for row in
           merge_asof(l, r, on="x", right_id_col="rid",
                      direction="nearest").collect()}
    for _, w in want.iterrows():
        assert got[w["x"]] == w["rid"]


def test_nearest_with_tolerance(spark):
    l = spark.createDataFrame([(1, 10.0), (2, 50.0)], "lid long, x double")
    r = spark.createDataFrame([(101, 12.0, "a")], "rid long, x double, v string")
    out = {row["lid"]: row["v"] for row in
           merge_asof(l, r, on="x", right_id_col="rid", direction="nearest",
                      tolerance=5.0).collect()}
    assert out == {1: "a", 2: None}  # 40-gap match nulled out whole


def test_null_payload_field_carried_atomically(spark):
    """The matched right row attaches VERBATIM, nulls included — a null
    field must NOT be backfilled from an older right row (pandas
    merge_asof parity; the struct-carry regression test)."""
    l = spark.createDataFrame([(1, 10.0)], "lid long, x double")
    r = spark.createDataFrame(
        [(7, 1.0, "old_a", "old_b"), (8, 5.0, None, "new_b")],
        "rid long, x double, a string, b string",
    )
    [row] = merge_asof(l, r, on="x", right_id_col="rid").collect()
    assert row["rid"] == 8
    assert row["a"] is None  # not "old_a"
    assert row["b"] == "new_b"


def test_tie_without_right_id_is_deterministic(spark):
    """With right_id_col=None, equal-ts right rows are ordered by a
    payload hash, not partition layout — same winner at any layout."""
    l = spark.createDataFrame([(1, 10.0)], "lid long, x double")
    rows = [(7, 10.0, "p"), (9, 10.0, "q"), (8, 10.0, "r")]
    winners = set()
    for nparts in (1, 3, 7):
        r = spark.createDataFrame(
            rows, "rid long, x double, tag string"
        ).repartition(nparts)
        [row] = merge_asof(l, r, on="x").collect()
        winners.add((row["rid"], row["tag"]))
    assert len(winners) == 1


def test_both_side_suffixes_on_collision(spark):
    """Non-key column collisions suffix BOTH sides (pandas rule); the on
    key keeps its bare left name."""
    l = spark.createDataFrame([(1, 5.0, "L")], "lid long, x double, v string")
    r = spark.createDataFrame([(7, 4.0, "R")], "rid long, x double, v string")
    out = merge_asof(l, r, on="x", right_id_col="rid")
    assert "v_x" in out.columns and "v_y" in out.columns
    assert "x" in out.columns and "x_y" in out.columns and "x_x" not in out.columns
    [row] = out.collect()
    assert row["v_x"] == "L" and row["v_y"] == "R" and row["x"] == 5.0


def test_asof_map_payload_without_right_id(spark):
    """A MapType right payload column must not break the deterministic
    tie-break surrogate (xxhash64 rejects maps; hashable fields only)."""
    import linktransformer_spark as lt
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(10, "u1")], ["ts", "uid"])
    right = spark.createDataFrame(
        [(5, "u1", {"k": "v"}), (7, "u1", {"k": "w"})],
        "ts long, uid string, attrs map<string,string>",
    )
    out = lt.merge_asof(left, right, on="ts", by="uid").collect()
    assert len(out) == 1
    assert out[0]["attrs"] == {"k": "w"}  # latest ts <= 10


def test_null_ordering_keys_never_match(spark):
    """Null right ts rows are not candidates (any direction); null left
    ts rows get a null match instead of a bogus carry."""
    l = spark.createDataFrame([(1, 10.0), (2, None)], "lid long, x double")
    r = spark.createDataFrame(
        [(101, None, "bogus"), (102, 100.0, "good")],
        "rid long, x double, v string",
    )
    for d in ("backward", "forward", "nearest"):
        out = {row["lid"]: row["v"] for row in
               merge_asof(l, r, on="x", right_id_col="rid",
                          direction=d).collect()}
        assert out[2] is None, d          # null left key -> no match
        assert out[1] != "bogus", d       # null right key never matches
    [row] = [x for x in merge_asof(l, r, on="x", right_id_col="rid",
                                   direction="nearest").collect()
             if x["lid"] == 1]
    assert row["v"] == "good"             # real forward match survives
