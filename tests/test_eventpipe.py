"""Funnel + retention semantics (operators/eventpipe.py).

Hand-built micro-frames pin the strict-order / within / tie rules;
the registered queries are oracle-checked separately by the driver."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from linktransformer_spark.operators.eventpipe import (
    funnel,
    funnel_user_steps,
    retention,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=T0 + dt.timedelta(seconds=s), event_type=t)
         for (u, s, t) in rows]
    )


def test_funnel_strict_order(spark):
    # user 1 completes a->b->c; user 2 has b BEFORE a, so b never fires
    ev = _ev(spark, [
        (1, 0, "a"), (1, 10, "b"), (1, 20, "c"),
        (2, 0, "b"), (2, 10, "a"),
    ])
    out = {r["user_id"]: r for r in
           funnel_user_steps(ev, ["a", "b", "c"]).collect()}
    assert out[1]["t_1"] == T0
    assert out[1]["t_2"] == T0 + dt.timedelta(seconds=10)
    assert out[1]["t_3"] == T0 + dt.timedelta(seconds=20)
    assert out[2]["t_1"] == T0 + dt.timedelta(seconds=10)
    assert out[2]["t_2"] is None and out[2]["t_3"] is None


def test_funnel_same_timestamp_counts(spark):
    # at-or-after semantics: b at the exact ts of a still fires
    ev = _ev(spark, [(1, 5, "a"), (1, 5, "b")])
    row = funnel_user_steps(ev, ["a", "b"]).collect()[0]
    assert row["t_1"] == row["t_2"] == T0 + dt.timedelta(seconds=5)


def test_funnel_earliest_chain_used(spark):
    # step 2 fires at the EARLIEST b after the EARLIEST a, even when a
    # later a would also qualify
    ev = _ev(spark, [(1, 0, "a"), (1, 3, "b"), (1, 10, "a"), (1, 11, "b")])
    row = funnel_user_steps(ev, ["a", "b"]).collect()[0]
    assert row["t_1"] == T0
    assert row["t_2"] == T0 + dt.timedelta(seconds=3)


def test_funnel_within_budget_from_step1(spark):
    # c at t=100 is inside b's reach but outside the 50 s budget from a
    ev = _ev(spark, [(1, 0, "a"), (1, 40, "b"), (1, 100, "c"),
                     (2, 0, "a"), (2, 40, "b"), (2, 50, "c")])
    out = {r["user_id"]: r for r in
           funnel_user_steps(ev, ["a", "b", "c"], within=50).collect()}
    assert out[1]["t_3"] is None
    assert out[2]["t_3"] == T0 + dt.timedelta(seconds=50)  # boundary inclusive


def test_funnel_users_only_step1_completers(spark):
    ev = _ev(spark, [(1, 0, "a"), (2, 0, "b")])
    rows = funnel_user_steps(ev, ["a", "b"]).collect()
    assert [r["user_id"] for r in rows] == [1]


def test_funnel_summary_counts_and_fracs(spark):
    ev = _ev(spark, [
        (1, 0, "a"), (1, 1, "b"),
        (2, 0, "a"), (2, 1, "b"),
        (3, 0, "a"),
        (4, 0, "a"), (4, 1, "b"),
    ])
    rows = {r["step"]: r for r in funnel(ev, ["a", "b", "c"]).collect()}
    assert rows[1]["n_users"] == 4 and rows[1]["frac_first"] == 1.0
    assert rows[2]["n_users"] == 3 and rows[2]["frac_first"] == 0.75
    assert rows[3]["n_users"] == 0 and rows[3]["frac_prev"] == 0.0
    assert rows[2]["frac_prev"] == 0.75
    assert [rows[i]["step_name"] for i in (1, 2, 3)] == ["a", "b", "c"]


def test_funnel_validation(spark):
    ev = _ev(spark, [(1, 0, "a")])
    with pytest.raises(ValueError):
        funnel_user_steps(ev, ["a"])
    with pytest.raises(ValueError):
        funnel_user_steps(ev, ["a", "a"])


def test_retention_offsets_and_rates(spark):
    # user 1 first seen day 0, active days 0/1/3; user 2 day 0 only;
    # user 3 first seen day 1, active day 2 as offset 1
    day = 86400
    ev = _ev(spark, [
        (1, 0, "x"), (1, day + 5, "x"), (1, 3 * day, "x"),
        (2, 10, "x"),
        (3, day, "x"), (3, 2 * day, "x"),
    ])
    rows = {(str(r["cohort"]), r["period_offset"]): r
            for r in retention(ev).collect()}
    c0 = "2024-01-01"
    c1 = "2024-01-02"
    assert rows[(c0, 0)]["n_active"] == 2 and rows[(c0, 0)]["n_cohort"] == 2
    assert rows[(c0, 1)]["n_active"] == 1
    assert rows[(c0, 1)]["retention"] == 0.5
    assert rows[(c0, 3)]["n_active"] == 1
    assert (c0, 2) not in rows  # nobody from cohort 0 active on day 2
    assert rows[(c1, 0)]["n_cohort"] == 1 and rows[(c1, 1)]["n_active"] == 1


def test_retention_max_offset_and_period_validation(spark):
    day = 86400
    ev = _ev(spark, [(1, 0, "x"), (1, 9 * day, "x")])
    rows = retention(ev, max_offset=7).collect()
    assert max(r["period_offset"] for r in rows) <= 7
    with pytest.raises(ValueError):
        retention(ev, period="hour")


def test_retention_dedups_within_period(spark):
    # many events in one day still count the user once
    ev = _ev(spark, [(1, 0, "x"), (1, 5, "x"), (1, 10, "x")])
    rows = retention(ev).collect()
    assert len(rows) == 1 and rows[0]["n_active"] == 1


def test_funnel_is_single_shuffle(spark, sf_dir):
    """The fold plan shuffles once (the user groupBy) — no join chain."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = funnel_user_steps(
        ev, ["signup", "view", "click"]
    )._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# transition_matrix / trending (round 6)
# ---------------------------------------------------------------------------
from linktransformer_spark.operators.eventpipe import (  # noqa: E402
    transition_matrix,
    trending,
)


def test_transitions_counts_and_conditional_p(spark):
    # user 1: a->b->a ; user 2: a->b  =>  a->b n=2, b->a n=1
    ev = _ev(spark, [(1, 0, "a"), (1, 10, "b"), (1, 20, "a"),
                     (2, 0, "a"), (2, 10, "b")])
    rows = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in transition_matrix(ev).collect()}
    assert rows[("a", "b")] == (2, 1.0)
    assert rows[("b", "a")] == (1, 1.0)
    assert len(rows) == 2  # last events have no successor


def test_transitions_p_conditions_on_prefiltered_total(spark):
    # a->b x3, a->c x1: with min_count=2 the a->c row is dropped but
    # a->b's p stays 0.75 (conditioned on ALL outgoing transitions)
    ev = _ev(spark, [(u, 0, "a") for u in range(1, 5)]
             + [(u, 10, "b") for u in range(1, 4)] + [(4, 10, "c")])
    rows = {(r["from_type"], r["to_type"]): r["p"]
            for r in transition_matrix(ev, min_count=2).collect()}
    assert rows == {("a", "b"): 0.75}


def test_transitions_tiebreak_pins_simultaneous_events(spark):
    ev = spark.createDataFrame([
        Row(user_id=1, ts=T0, event_type="b", event_id=2),
        Row(user_id=1, ts=T0, event_type="a", event_id=1),
        Row(user_id=1, ts=T0 + dt.timedelta(seconds=1), event_type="c", event_id=3),
    ])
    rows = {(r["from_type"], r["to_type"])
            for r in transition_matrix(ev, tiebreak_col="event_id").collect()}
    assert rows == {("a", "b"), ("b", "c")}


def test_transitions_single_shuffle_before_agg(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = transition_matrix(
        ev, tiebreak_col="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" not in plan  # no joins at all


def test_trending_topk_rank_and_lift(spark):
    # window 0: a x3, b x1; window 1: a x1, b x2 -> lift a=1/3, b=2
    rows = [(1, 0, "a"), (2, 1, "a"), (3, 2, "a"), (1, 3, "b"),
            (1, 60, "a"), (2, 61, "b"), (3, 62, "b")]
    ev = _ev(spark, rows)
    out = {(int(r["window_start"].timestamp()), r["event_type"]):
           (r["n"], r["rank"], r["lift"])
           for r in trending(ev, window_seconds=60, k=2).collect()}
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[(base, "a")] == (3, 1, None)          # no previous window
    assert out[(base, "b")] == (1, 2, None)
    assert out[(base + 60, "b")] == (2, 1, 2.0)
    assert out[(base + 60, "a")] == (1, 2, round(1 / 3, 6))


def test_trending_lift_null_when_gap(spark):
    # type present in window 0 and window 2 but not 1 -> lift null
    ev = _ev(spark, [(1, 0, "a"), (1, 125, "a")])
    out = trending(ev, window_seconds=60, k=1).collect()
    assert all(r["lift"] is None for r in out)


def test_trending_k_bounds_rows_per_window(spark):
    ev = _ev(spark, [(1, 0, "a"), (1, 1, "b"), (1, 2, "c")])
    out = trending(ev, window_seconds=60, k=2).collect()
    assert len(out) == 2 and {r["rank"] for r in out} == {1, 2}


# ---------------------------------------------------------------------------
# session_paths / volume_anomaly (round 6)
# ---------------------------------------------------------------------------
from linktransformer_spark.operators.eventpipe import (  # noqa: E402
    session_paths,
    volume_anomaly,
)


def test_session_paths_bounded_by_session(spark):
    # user 1: [a b c] then (gap) [a b c]; the path crossing the gap
    # (b c a / c a b) must NOT appear
    rows = [(1, 0, "a"), (1, 10, "b"), (1, 20, "c"),
            (1, 10000, "a"), (1, 10010, "b"), (1, 10020, "c")]
    ev = _ev(spark, rows)
    out = session_paths(ev, gap_seconds=1800, n=3, k=10).collect()
    assert {(r["path"], r["n_occurrences"]) for r in out} == {("a -> b -> c", 2)}
    assert out[0]["rank"] == 1


def test_session_paths_short_sessions_contribute_nothing(spark):
    ev = _ev(spark, [(1, 0, "a"), (1, 10, "b")])
    assert session_paths(ev, n=3).count() == 0


def test_session_paths_rank_ties_lexicographic(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
            (2, 0, "c"), (2, 1, "b"), (2, 2, "a")]
    out = sorted(session_paths(_ev(spark, rows), n=3, k=5).collect(),
                 key=lambda r: r["rank"])
    assert [r["path"] for r in out] == ["a -> b -> c", "c -> b -> a"]


def test_volume_anomaly_flags_spike(spark):
    # steady 2 events/window for 10 windows, then a 40-event spike
    rows = []
    for w in range(10):
        rows += [(1, w * 60 + 1, "a"), (2, w * 60 + 2, "a")]
    rows += [(u, 10 * 60 + u % 50, "a") for u in range(40)]
    ev = _ev(spark, rows)
    out = {int(r["window_start"].timestamp()) % 100000 // 60: r
           for r in volume_anomaly(ev, window_seconds=60, trailing=5).collect()}
    spike = [r for r in out.values() if r["n"] == 40]
    assert len(spike) == 1 and spike[0]["is_anomaly"]
    # steady windows with full trailing history are not anomalous
    # (zero variance -> null z -> never flagged)
    steady = [r for r in out.values() if r["n"] == 2]
    assert all(not r["is_anomaly"] for r in steady)
    assert all(r["z"] is None for r in steady)  # var == 0 guard


def test_volume_anomaly_first_window_unflagged(spark):
    ev = _ev(spark, [(1, 0, "a"), (2, 1, "a")])
    rows = volume_anomaly(ev, window_seconds=60, trailing=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["mean_n"] is None and r["z"] is None and not r["is_anomaly"]


def test_volume_anomaly_validates(spark):
    ev = _ev(spark, [(1, 0, "a")])
    with pytest.raises(ValueError):
        volume_anomaly(ev, trailing=1)
    with pytest.raises(ValueError):
        session_paths(ev, n=0)


# ---------------------------------------------------------------------------
# decayed_engagement (round 6)
# ---------------------------------------------------------------------------
def test_decayed_engagement_halves_per_half_life(spark):
    from linktransformer_spark.operators.eventpipe import decayed_engagement

    rows = [
        Row(user_id=1, ts=dt.datetime(2024, 1, 8), value=10.0, event_id=1),
        Row(user_id=2, ts=dt.datetime(2024, 1, 1), value=10.0, event_id=2),
        Row(user_id=3, ts=dt.datetime(2024, 1, 15), value=10.0, event_id=3),
    ]
    ev = spark.createDataFrame(rows)
    out = {r["user_id"]: r["score"]
           for r in decayed_engagement(
               ev, as_of="2024-01-15 00:00:00", tiebreak_col="event_id",
               half_life_seconds=7 * 86400.0).collect()}
    assert abs(out[3] - 10.0) < 1e-9          # zero age
    assert abs(out[1] - 5.0) < 1e-9           # one half-life
    assert abs(out[2] - 2.5) < 1e-9           # two half-lives


def test_decayed_engagement_excludes_future_events(spark):
    from linktransformer_spark.operators.eventpipe import decayed_engagement

    ev = spark.createDataFrame([
        Row(user_id=1, ts=dt.datetime(2024, 1, 1), value=1.0, event_id=1),
        Row(user_id=1, ts=dt.datetime(2024, 2, 1), value=99.0, event_id=2),
    ])
    out = decayed_engagement(
        ev, as_of="2024-01-10 00:00:00", tiebreak_col="event_id").collect()
    assert len(out) == 1 and out[0]["n_events"] == 1
    assert out[0]["score"] < 1.0  # only the decayed first event


def test_decayed_engagement_validates(spark):
    from linktransformer_spark.operators.eventpipe import decayed_engagement

    ev = _ev(spark, [(1, 0, "a")])
    with pytest.raises(ValueError):
        decayed_engagement(ev, as_of="2024-01-01", half_life_seconds=0)


# ---------------------------------------------------------------------------
# ab_test (round 6)
# ---------------------------------------------------------------------------
def test_ab_test_detects_clear_effect(spark):
    from linktransformer_spark.operators.eventpipe import ab_test

    rows = ([("A", 1)] * 10 + [("A", 0)] * 90
            + [("B", 1)] * 50 + [("B", 0)] * 50)
    df = spark.createDataFrame(rows, ["variant", "flag"])
    r = ab_test(df, variant_col="variant", control="A", treatment="B",
                flag_col="flag").first()
    assert r["n_c"] == 100 and r["conv_c"] == 10
    assert r["rate_c"] == 0.1 and r["rate_t"] == 0.5
    assert r["lift"] == 4.0
    assert r["significant"] and r["z"] > 5


def test_ab_test_null_z_cases(spark):
    from linktransformer_spark.operators.eventpipe import ab_test

    # all conversions identical -> pooled variance 0 -> null z
    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 1)], ["variant", "flag"])
    r = ab_test(df, variant_col="variant", control="A", treatment="B",
                flag_col="flag").first()
    assert r["z"] is None and not r["significant"]
    # one-armed experiment
    df2 = spark.createDataFrame([("A", 1), ("A", 0)], ["variant", "flag"])
    r2 = ab_test(df2, variant_col="variant", control="A", treatment="B",
                 flag_col="flag").first()
    assert r2["n_t"] == 0 and r2["z"] is None and not r2["significant"]


# ---------------------------------------------------------------------------
# Enforced per-user skew caps (round 7): the hot-user/bot hazard
# ---------------------------------------------------------------------------
def test_funnel_cap_equals_truncated_input(spark):
    """A hot user's funnel under the cap == running the funnel over
    only their earliest N funnel-step events (exact prefix
    truncation), and every under-cap user is untouched."""
    hot = [(1, s, "a" if s % 3 == 0 else "b") for s in range(30)]
    cold = [(2, 0, "a"), (2, 5, "b")]
    ev = _ev(spark, hot + cold)
    capped = {r["user_id"]: (r["t_1"], r["t_2"]) for r in
              funnel_user_steps(ev, ["a", "b"], max_events_per_user=4)
              .collect()}
    trunc = {r["user_id"]: (r["t_1"], r["t_2"]) for r in
             funnel_user_steps(
                 _ev(spark, hot[:4] + cold), ["a", "b"],
                 max_events_per_user=None).collect()}
    assert capped == trunc
    # under-cap user identical to the uncapped run
    full = {r["user_id"]: (r["t_1"], r["t_2"]) for r in
            funnel_user_steps(ev, ["a", "b"], max_events_per_user=None)
            .collect()}
    assert capped[2] == full[2]


def test_funnel_cap_bounds_collected_array(spark):
    """Structural check: with the cap on, the collect_list input per
    user is at most N rows (the row_number filter precedes the agg)."""
    ev = _ev(spark, [(1, s, "a") for s in range(50)])
    plan = funnel_user_steps(
        ev, ["a", "b"], max_events_per_user=10
    )._jdf.queryExecution().executedPlan().toString()
    # the cap's filter sits in the plan between window and aggregate
    assert "_cap_rn" in plan
    with pytest.raises(ValueError, match="max_events_per_user"):
        funnel_user_steps(ev, ["a", "b"], max_events_per_user=0)


def test_session_paths_cap_equals_truncated_input(spark):
    from linktransformer_spark.operators.eventpipe import session_paths

    hot = [(1, s, f"t{s % 5}") for s in range(40)]
    ev = _ev(spark, hot)
    capped = sorted(
        (r["path"], r["n_occurrences"]) for r in
        session_paths(ev, n=2, k=50, max_events_per_user=6).collect())
    trunc = sorted(
        (r["path"], r["n_occurrences"]) for r in
        session_paths(_ev(spark, hot[:6]), n=2, k=50,
                      max_events_per_user=None).collect())
    assert capped == trunc and capped
    with pytest.raises(ValueError, match="max_events_per_user"):
        session_paths(ev, max_events_per_user=-1)


def test_decayed_engagement_cap_keeps_most_recent(spark):
    from linktransformer_spark.operators.eventpipe import decayed_engagement

    rows = [Row(user_id=1, ts=dt.datetime(2024, 1, d), value=1.0,
                event_id=d) for d in range(1, 11)]
    ev = spark.createDataFrame(rows)
    out = decayed_engagement(
        ev, as_of="2024-01-15 00:00:00", tiebreak_col="event_id",
        max_events_per_user=3).collect()[0]
    assert out["n_events"] == 3
    # equals the fold over only the 3 MOST RECENT events (days 8,9,10)
    recent = decayed_engagement(
        spark.createDataFrame(rows[-3:]), as_of="2024-01-15 00:00:00",
        tiebreak_col="event_id", max_events_per_user=None).collect()[0]
    assert abs(out["score"] - recent["score"]) < 1e-12
    with pytest.raises(ValueError, match="max_events_per_user"):
        decayed_engagement(ev, as_of="2024-01-15", max_events_per_user=0)


# ---------------------------------------------------------------------------
# attribution (round 7)
# ---------------------------------------------------------------------------
def test_attribution_last_vs_first_touch(spark):
    from linktransformer_spark.operators.eventpipe import attribution

    ev = _ev(spark, [
        (1, 0, "ad"), (1, 10, "email"), (1, 20, "buy"),     # last=email, first=ad
        (2, 0, "email"), (2, 5, "ad"), (2, 30, "buy"),      # last=ad, first=email
        (3, 0, "buy"),                                       # unattributed
    ])
    last = {r["touch_type"]: r["n_conversions"] for r in attribution(
        ev, conversion_type="buy", touch_types=["ad", "email"],
        model="last_touch").collect()}
    first = {r["touch_type"]: r["n_conversions"] for r in attribution(
        ev, conversion_type="buy", touch_types=["ad", "email"],
        model="first_touch").collect()}
    assert last == {"email": 1, "ad": 1, None: 1}
    assert first == {"ad": 1, "email": 1, None: 1}


def test_attribution_lookback_expires_touches(spark):
    from linktransformer_spark.operators.eventpipe import attribution

    ev = _ev(spark, [(1, 0, "ad"), (1, 500, "buy")])
    out = {r["touch_type"]: (r["n_conversions"], r["frac"]) for r in attribution(
        ev, conversion_type="buy", touch_types=["ad"],
        model="last_touch", lookback_seconds=100).collect()}
    assert out == {None: (1, 1.0)}  # touch too old -> unattributed
    ok = {r["touch_type"]: r["n_conversions"] for r in attribution(
        ev, conversion_type="buy", touch_types=["ad"],
        model="last_touch", lookback_seconds=1000).collect()}
    assert ok == {"ad": 1}


def test_attribution_validates(spark):
    from linktransformer_spark.operators.eventpipe import attribution

    ev = _ev(spark, [(1, 0, "a")])
    with pytest.raises(ValueError, match="non-empty"):
        attribution(ev, conversion_type="buy", touch_types=[])
    with pytest.raises(ValueError, match="cannot also"):
        attribution(ev, conversion_type="a", touch_types=["a"])
    with pytest.raises(ValueError, match="no lookback"):
        attribution(ev, conversion_type="buy", touch_types=["a"],
                    model="first_touch", lookback_seconds=10)
    with pytest.raises(ValueError, match="unknown model"):
        attribution(ev, conversion_type="buy", touch_types=["a"], model="x")
