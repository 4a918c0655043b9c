"""Label-quality / score-quality diagnostics (round 7):
cohen_kappa, calibration_bins/summary, key_skew_topk. Hand-computed
micro-cases; the registered queries (docs_lang_kappa,
docs_calibration, events_key_skew) are oracle-checked separately."""

import pytest

import linktransformer_spark as lt


def test_cohen_kappa_textbook_value(spark):
    # classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = lt.cohen_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50
    assert abs(r["p_observed"] - 0.7) < 1e-9
    # pe = (25*30 + 25*20)/2500 = 0.5 -> kappa = 0.2/0.5 = 0.4
    assert abs(r["p_expected"] - 0.5) < 1e-9
    assert abs(r["kappa"] - 0.4) < 1e-9


def test_cohen_kappa_constant_raters_null(spark):
    df = spark.createDataFrame([("x", "x")] * 5, ["a", "b"])
    r = lt.cohen_kappa(df, "a", "b").collect()[0]
    assert r["p_observed"] == 1.0 and r["p_expected"] == 1.0
    assert r["kappa"] is None  # undefined, not 0


def test_cohen_kappa_drops_nulls_and_casts(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (None, 1), (1, None)], ["a", "b"]
    )
    r = lt.cohen_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 2 and r["p_observed"] == 1.0


def test_calibration_bins_hand_case(spark):
    rows = [(0.05, 0), (0.08, 0), (0.95, 1), (0.92, 1), (0.55, 1), (0.58, 0)]
    df = spark.createDataFrame(rows, ["s", "y"])
    bins = {r["bin"]: r for r in
            lt.calibration_bins(df, "s", "y", n_bins=10).collect()}
    assert set(bins) == {0, 5, 9}
    assert bins[0]["n"] == 2 and bins[0]["frac_positive"] == 0.0
    assert abs(bins[0]["mean_score"] - 0.065) < 1e-9
    assert bins[5]["frac_positive"] == 0.5
    assert bins[9]["frac_positive"] == 1.0
    assert bins[9]["bin_lo"] == 0.9 and bins[9]["bin_hi"] == 1.0


def test_calibration_clamps_and_validates(spark):
    df = spark.createDataFrame([(-0.2, 0), (1.3, 1)], ["s", "y"])
    bins = {r["bin"]: r["n"] for r in
            lt.calibration_bins(df, "s", "y", n_bins=4).collect()}
    assert bins == {0: 1, 3: 1}  # out-of-range clamps into end bins
    with pytest.raises(ValueError):
        lt.calibration_bins(df, "s", "y", n_bins=1)


def test_calibration_summary_ece(spark):
    # bin0: conf .1 acc 0 (gap .1, n=2); bin9: conf .9 acc 1 (gap .1, n=2)
    rows = [(0.1, 0), (0.1, 0), (0.9, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, ["s", "y"])
    r = lt.calibration_summary(df, "s", "y", n_bins=10).collect()[0]
    assert r["n"] == 4 and r["n_nonempty_bins"] == 2
    assert abs(r["ece"] - 0.1) < 1e-9
    assert abs(r["mce"] - 0.1) < 1e-9


def test_key_skew_topk_hand_case(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    out = sorted(lt.key_skew_topk(df, "k", k=2).collect(),
                 key=lambda r: r["rank"])
    assert [(r["key"], r["n"]) for r in out] == [("hot", 6), ("warm", 3)]
    assert out[0]["frac"] == 0.6 and out[0]["cum_frac"] == 0.6
    assert out[1]["cum_frac"] == 0.9
    assert all(r["n_keys"] == 3 and r["n_rows"] == 10 for r in out)


def test_key_skew_multi_key_and_validation(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["x", "y"])
    out = lt.key_skew_topk(df, ["x", "y"], k=5).collect()
    assert {r["key"] for r in out} == {"1</s>a", "2</s>b"}
    with pytest.raises(ValueError, match="unknown column"):
        lt.key_skew_topk(df, "nope")
    with pytest.raises(ValueError):
        lt.key_skew_topk(df, "x", k=0)


# ---------------------------------------------------------------------------
# histogram / user_lifecycle / funnel_conversion_stats (round 7)
# ---------------------------------------------------------------------------
def test_histogram_hand_case(spark):
    df = spark.createDataFrame([(float(v),) for v in
                                [0, 1, 2, 3, 4, 5, 5, 9, 10]], ["x"])
    bins = {r["bin"]: r for r in lt.histogram(df, "x", n_bins=5).collect()}
    # width 2: [0,2) [2,4) [4,6) [6,8) [8,10]
    assert {b: bins[b]["n"] for b in bins} == {0: 2, 1: 2, 2: 3, 4: 2}
    assert bins[0]["bin_lo"] == 0.0 and bins[0]["bin_hi"] == 2.0
    assert abs(sum(r["frac"] for r in bins.values()) - 1.0) < 1e-5


def test_histogram_explicit_bounds_clamp(spark):
    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,)], ["x"])
    bins = {r["bin"]: r["n"] for r in
            lt.histogram(df, "x", n_bins=4, lo=0.0, hi=1.0).collect()}
    assert bins == {0: 1, 2: 1, 3: 1}


def test_histogram_degenerate_range(spark):
    df = spark.createDataFrame([(7.0,), (7.0,)], ["x"])
    out = lt.histogram(df, "x", n_bins=10).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2
    with pytest.raises(ValueError):
        lt.histogram(df, "x", n_bins=0)


def test_user_lifecycle_hand_case(spark):
    import datetime as dt
    from linktransformer_spark.operators.eventpipe import user_lifecycle

    rows = [
        (1, dt.datetime(2024, 1, 1, 8), 1.5),
        (1, dt.datetime(2024, 1, 1, 9), 2.5),
        (1, dt.datetime(2024, 1, 5, 9), 1.0),
        (2, dt.datetime(2024, 2, 1, 0), 4.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["user_id"]: r for r in user_lifecycle(df).collect()}
    assert out[1]["n_events"] == 3 and out[1]["n_active_days"] == 2
    assert out[1]["lifetime_days"] == 4
    assert abs(out[1]["total_value"] - 5.0) < 1e-9
    assert out[2]["lifetime_days"] == 0 and out[2]["n_events"] == 1
    # value_col=None drops the total column
    assert "total_value" not in user_lifecycle(
        df, value_col=None).columns


def test_funnel_conversion_stats_hand_case(spark):
    import datetime as dt
    from linktransformer_spark.operators.eventpipe import (
        funnel_conversion_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: a->b in 10s; user 2: a->b in 30s; user 3: a only
    for u, delays in ((1, {"a": 0, "b": 10}), (2, {"a": 0, "b": 30}),
                      (3, {"a": 0})):
        for t, s in delays.items():
            rows.append((u, t0 + dt.timedelta(seconds=s), t))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = funnel_conversion_stats(df, ["a", "b"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["step"] == 2 and r["n_users"] == 2
    assert abs(r["p50_seconds"] - 20.0) < 1e-9  # interpolated median
    assert abs(r["mean_seconds"] - 20.0) < 1e-9


# ---------------------------------------------------------------------------
# scd2_apply (round 7)
# ---------------------------------------------------------------------------
def _scd2_frames(spark):
    import datetime as dt
    hist = spark.createDataFrame(
        [
            (1, "a", dt.datetime(2020, 1, 1), dt.datetime(2021, 1, 1)),
            (1, "b", dt.datetime(2021, 1, 1), None),
            (2, "x", dt.datetime(2020, 1, 1), None),
            (3, "z", dt.datetime(2020, 1, 1), None),
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [
            (1, "c", dt.datetime(2024, 1, 1)),   # changes 1
            (2, "x", dt.datetime(2024, 1, 1)),   # identical -> no-op
            (9, "new", dt.datetime(2024, 1, 1)), # unseen key
        ],
        "k long, attr string, ts timestamp",
    )
    return hist, upd


def test_scd2_close_reopen_noop_insert(spark):
    import datetime as dt

    hist, upd = _scd2_frames(spark)
    out = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in lt.scd2_apply(hist, upd, "k").collect()
    )
    t24 = dt.datetime(2024, 1, 1)
    assert out == sorted([
        (1, "a", dt.datetime(2020, 1, 1), dt.datetime(2021, 1, 1)),  # closed
        (1, "b", dt.datetime(2021, 1, 1), t24),                      # closed now
        (1, "c", t24, None),                                         # reopened
        (2, "x", dt.datetime(2020, 1, 1), None),                     # no-op
        (3, "z", dt.datetime(2020, 1, 1), None),                     # untouched
        (9, "new", t24, None),                                       # inserted
    ])


def test_scd2_latest_update_per_key_wins(spark):
    import datetime as dt

    hist, _ = _scd2_frames(spark)
    upd = spark.createDataFrame(
        [
            (2, "mid", dt.datetime(2024, 1, 1)),
            (2, "late", dt.datetime(2024, 6, 1)),
        ],
        "k long, attr string, ts timestamp",
    )
    rows = {(r["k"], r["attr"]): r for r in
            lt.scd2_apply(hist, upd, "k").collect()}
    assert (2, "late") in rows and (2, "mid") not in rows
    assert rows[(2, "late")]["valid_to"] is None
    assert rows[(2, "x")]["valid_to"] == dt.datetime(2024, 6, 1)


def test_scd2_validates_columns(spark):
    hist, upd = _scd2_frames(spark)
    with pytest.raises(ValueError, match="not in history"):
        lt.scd2_apply(hist.drop("valid_to"), upd, "k")
    with pytest.raises(ValueError, match="not in updates"):
        lt.scd2_apply(hist, upd.drop("ts"), "k")
