"""Event-pipeline analytics: ordered conversion funnels and cohort
retention — the two workhorse queries of any large event stream, and a
natural companion to the events sessionize/as-of/rollup substrate
(north-star extensions; the reference is batch record linkage and has
no event surface).

funnel_user_steps — strict-order funnel in ONE shuffle
------------------------------------------------------
For each user, step 1 fires at the user's earliest step-1 event; step
i (i>1) fires at the earliest step-i event at-or-after step (i-1)'s
fire time (and, with ``within``, no later than ``within`` seconds
after step 1). The textbook SQL formulation is a chain of k-1
(groupBy + join) rounds — 2(k-1) shuffles, all on the user key. The
Spark-first plan instead folds each user's event list once:

    filter to funnel step types (tiny IN-list, pushed to the scan)
      -> groupBy(user).agg(sort_array(collect_list(struct(ts, step))))
      -> F.aggregate fold over the sorted list, state = array of k
         fire-times (epoch micros), updated per event expression-side

ONE hash shuffle on the user key; the fold is a JVM expression (no
Python, no window). Processing events in (ts, step) order makes the
fold equal to the recursive min-join definition: when an event of
step i arrives, state[i-1] already holds the earliest achievable
step-(i-1) time iff one exists at ts' <= ts — ties at identical ts
resolve lower-step-first, which is exactly the at-or-after (>=)
join semantics the oracle uses.

Skew cap (100 TB): per-user state is the filtered event list; a
pathological user (a bot, a stuck producer) with millions of funnel
events would build one giant array in one task and OOM it. The
ENFORCED ``max_events_per_user`` cap (default 100k, ``None`` to opt
out loudly) pre-caps each user to their EARLIEST N funnel-step events
via a ``row_number() <= N`` window BEFORE the collect: the window
sort is spillable (external sort, bounded memory), so the collected
array — the actual OOM hazard — is bounded by the cap. Because the
fold consumes events in (ts, step) order and is prefix-monotone,
capping to the earliest N is exactly "run the funnel on the user's
first N events" — well-defined truncation semantics, and a no-op for
every user under the cap.

retention — classic day-N cohort retention
------------------------------------------
Cohort = calendar period of the user's first event; a user is
retained at offset d if they have any event in cohort+d. Two hash
aggregations (first-seen per user, distinct user-period activity) and
one broadcast-friendly join, all keyed on user — Catalyst reuses the
exchange. Output is one row per (cohort, offset) with the cohort size
and retention fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_user_steps", "funnel", "summarize_funnel_users",
           "funnel_conversion_stats", "retention", "transition_matrix",
           "trending", "session_paths", "volume_anomaly",
           "decayed_engagement", "ab_test", "user_lifecycle", "attribution",
           "event_cap_stats"]

_US = 1_000_000  # microseconds per second (fold state is epoch micros)


def _validate_steps(steps) -> list[str]:
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    return steps


def funnel_user_steps(
    events: DataFrame,
    steps,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: float | None = None,
    max_events_per_user: int | None = 100_000,
) -> DataFrame:
    """Per-user strict-order funnel fire times.

    Returns one row per user that completed step 1, with columns
    ``user_col, t_1, ..., t_k`` (timestamps; ``t_i`` null when the
    user never reached step i). ``within`` (seconds) bounds every
    later step to at most ``within`` seconds after the step-1 time.

    ``max_events_per_user`` (ENFORCED, default 100k) bounds per-user
    state: each user's funnel is computed over their EARLIEST N
    funnel-step events (by (ts, step) — the fold's own order, so
    this is exact prefix truncation, not sampling). Users under the
    cap are unaffected. Pass ``None`` to opt out — only safe when you
    KNOW no key is pathological; an uncapped hot user builds one
    unbounded in-memory array in a single task.
    """
    steps = _validate_steps(steps)
    k = len(steps)
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1 (or None)")

    # step name -> 0-based index, as a tiny CASE chain (IN-filter first
    # so the scan prunes to funnel event types only)
    idx = F.when(F.col(type_col) == steps[0], F.lit(0))
    for i, s in enumerate(steps[1:], start=1):
        idx = idx.when(F.col(type_col) == s, F.lit(i))

    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts"),
            idx.alias("step"),
        ).alias("_e"),
    )
    if max_events_per_user is not None:
        from pyspark.sql import Window

        # spillable window sort bounds the collected array (the OOM
        # hazard); same (user) partitioning as the groupBy below, so
        # AQE/Catalyst reuse one exchange
        cap_w = Window.partitionBy("_u").orderBy(
            F.col("_e.ts").asc(), F.col("_e.step").asc()
        )
        ev = (
            ev.withColumn("_cap_rn", F.row_number().over(cap_w))
            .filter(F.col("_cap_rn") <= max_events_per_user)
            .drop("_cap_rn")
        )

    init = F.array([F.lit(None).cast("long") for _ in range(k)])
    within_us = None if within is None else int(round(within * _US))

    def _merge(acc, e):
        # fire step e.step iff not already fired, predecessor fired
        # (events arrive ts-ascending so acc[step-1] <= e.ts always),
        # and the within-budget from step 1 is not exhausted.
        def upd(v, i):
            # element_at is 1-based, so position i is the 0-based
            # predecessor; clamp to 1 because ANSI mode evaluates both
            # branches of the OR and errors on index 0.
            pred = F.element_at(acc, F.greatest(i, F.lit(1)))
            can_fire = (
                (i == e["step"])
                & v.isNull()
                & ((i == F.lit(0)) | pred.isNotNull())
            )
            if within_us is not None:
                can_fire = can_fire & (
                    (i == F.lit(0)) | (e["ts"] <= acc[0] + F.lit(within_us))
                )
            return F.when(can_fire, e["ts"]).otherwise(v)

        return F.transform(acc, upd)

    folded = (
        ev.groupBy("_u")
        .agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
        .select(
            "_u",
            F.aggregate(F.col("_evs"), init, _merge).alias("_t"),
        )
    )
    out = folded.filter(F.col("_t")[0].isNotNull()).select(
        F.col("_u").alias(user_col),
        *[
            F.timestamp_micros(F.col("_t")[i]).alias(f"t_{i + 1}")
            for i in range(k)
        ],
    )
    return out


def funnel(
    events: DataFrame,
    steps,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: float | None = None,
    max_events_per_user: int | None = 100_000,
) -> DataFrame:
    """Funnel summary: one row per step with the user count that
    reached it and conversion fractions (vs step 1 and vs the previous
    step), rounded to 6 decimals. Column names: ``step`` (1-based),
    ``step_name``, ``n_users``, ``frac_first``, ``frac_prev``.
    ``max_events_per_user``: see :func:`funnel_user_steps`."""
    steps = _validate_steps(steps)
    per_user = funnel_user_steps(
        events, steps, user_col=user_col, ts_col=ts_col,
        type_col=type_col, within=within,
        max_events_per_user=max_events_per_user,
    )
    return summarize_funnel_users(per_user, steps)


def summarize_funnel_users(per_user: DataFrame, steps) -> DataFrame:
    """Funnel summary over a ``funnel_user_steps``-shaped relation
    (``t_1..t_k`` fire-time columns) — shared by the batch ``funnel``
    and the drained streaming funnel (streaming/ops.py)."""
    steps = _validate_steps(steps)
    k = len(steps)
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{i + 1}")).alias(f"n_{i + 1}")
            for i in range(k)
        ]
    )
    # k is tiny: unpivot the single counts row expression-side
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("step_name"),
                F.col(f"n_{i + 1}").cast("long").alias("n_users"),
                F.col("n_1").cast("long").alias("_n1"),
                (F.col("n_1") if i == 0 else F.col(f"n_{i}"))
                .cast("long")
                .alias("_nprev"),
            )
            for i in range(k)
        ]
    )
    exploded = counts.select(F.explode(rows).alias("r")).select("r.*")
    zero_safe = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
    )
    return exploded.select(
        "step",
        "step_name",
        "n_users",
        zero_safe(F.col("n_users"), F.col("_n1")).alias("frac_first"),
        zero_safe(F.col("n_users"), F.col("_nprev")).alias("frac_prev"),
    )


def retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention table.

    Cohort = ``date_trunc(period)`` of the user's first event; a user
    counts at offset d when they have any event in period cohort+d.
    Returns (``cohort``, ``period_offset``, ``n_active``, ``n_cohort``,
    ``retention``) with retention rounded to 6 decimals; offset 0 is
    the cohort itself (retention 1.0 by construction).

    Plan: distinct (user, period) activity and first-period per user
    are both hash aggs on the user key (exchange reused), joined back
    on user, then one agg on (cohort, offset). No windows, no Python.
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day|week|month")
    ts = F.col(ts_col).cast("timestamp")
    p = F.date_trunc(period, ts).cast("date")
    ev = events.select(F.col(user_col).alias("_u"), p.alias("_p"))

    activity = ev.distinct()
    first = activity.groupBy("_u").agg(F.min("_p").alias("_cohort"))

    if period == "day":
        off = F.datediff(F.col("_p"), F.col("_cohort"))
    elif period == "week":
        off = (F.datediff(F.col("_p"), F.col("_cohort")) / 7).cast("int")
    else:
        off = (
            (F.year("_p") - F.year("_cohort")) * 12
            + (F.month("_p") - F.month("_cohort"))
        )

    joined = activity.join(first, "_u").select(
        F.col("_cohort").alias("cohort"), off.cast("int").alias("period_offset")
    )
    if max_offset is not None:
        joined = joined.filter(F.col("period_offset") <= max_offset)

    sizes = first.groupBy(F.col("_cohort").alias("cohort")).agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    act = joined.groupBy("cohort", "period_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return act.join(sizes, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "n_cohort",
        F.round(
            F.col("n_active").cast("double") / F.col("n_cohort").cast("double"), 6
        ).alias("retention"),
    )


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition table over each user's event
    sequence: one row per observed (from_type, to_type) pair with the
    transition count and the row-conditional probability
    ``p = n / sum(n over from_type)`` — the "what do users do next"
    path-analysis primitive.

    Ordering inside a user is (ts, tiebreak) — pass a unique
    ``tiebreak_col`` (e.g. the event id) to pin simultaneous events;
    without one, ties order by the event type string (still
    deterministic, but arbitrary).

    Plan: ONE shuffle — a lead window on the user key produces each
    event's successor in-partition; the (from, to) pair counts are a
    hash aggregate (map-side combine), and the per-from totals come
    from a second window over the AGGREGATED relation, which has at
    most |event types|^2 rows — negligible at any corpus size. p is a
    ratio of exact integers (engine-portable). No Python, no joins.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    tb = F.col(tiebreak_col) if tiebreak_col is not None else F.col(type_col)
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col("_tb").asc()
    )
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(type_col).alias("from_type"),
            tb.alias("_tb"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return (
        counts.withColumn("_t", F.sum("n").over(tot))
        .filter(F.col("n") >= min_count)
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("_t").cast("double"), 6).alias("p"),
        )
    )


def trending(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_seconds: int = 3600,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` event types per fixed time window, with the
    window-over-window lift — the "what is spiking right now"
    dashboard primitive.

    Windows are ``floor(epoch / window_seconds)`` buckets (engine-
    portable, unlike session-local window frames). Returns
    (``window_start``, ``event_type``, ``n``, ``rank``, ``lift``) for
    the top-k of each window, rank 1-based by (n DESC, type ASC);
    ``lift = n / n_previous_window`` for the same type (null when the
    type was absent from the immediately preceding window).

    Plan: one hash aggregate on (window, type) — map-side combined, so
    the shuffle carries at most |windows|x|types| rows regardless of
    event volume — then two windows (lag by type, rank by window) over
    that aggregated relation. At 100 TB the aggregate output is still
    tiny (cardinality is bounded by time x type, not rows), so the
    window stages are free; no Python, no joins.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    from pyspark.sql import Window

    win = (
        F.floor(
            F.unix_timestamp(F.col(ts_col).cast("timestamp"))
            / F.lit(window_seconds)
        ).cast("long")
    ).alias("_w")
    counts = events.select(win, F.col(type_col).alias("event_type")).groupBy(
        "_w", "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    lag_w = Window.partitionBy("event_type").orderBy(F.col("_w").asc())
    rank_w = Window.partitionBy("_w").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    prev = F.lag(F.struct(F.col("_w").alias("w"), F.col("n").alias("n"))).over(lag_w)
    return (
        counts.withColumn(
            "_lift",
            F.when(
                prev["w"] == F.col("_w") - 1,
                F.round(F.col("n").cast("double") / prev["n"].cast("double"), 6),
            ),
        )
        .withColumn("_r", F.row_number().over(rank_w))
        .filter(F.col("_r") <= k)
        .select(
            F.timestamp_seconds(F.col("_w") * window_seconds).alias("window_start"),
            "event_type",
            "n",
            F.col("_r").cast("int").alias("rank"),
            F.col("_lift").alias("lift"),
        )
    )


def session_paths(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
    gap_seconds: int = 1800,
    n: int = 3,
    k: int = 20,
    max_events_per_user: int | None = 100_000,
) -> DataFrame:
    """Top-``k`` most frequent length-``n`` event-type paths within
    sessions — the sequence-mining generalization of
    :func:`transition_matrix` (n=2 paths are its transitions, but
    bounded by session, not the user's whole history).

    Sessions use the engine's standard lag/cumsum rule (a gap
    STRICTLY GREATER than ``gap_seconds`` starts a new session — same
    boundary as the events_sessionize query). A session with fewer
    than ``n`` events contributes no paths. Returns
    (``path`` — ' -> '-joined type sequence, ``n_occurrences``,
    ``rank``), rank 1-based by (count DESC, path ASC).

    Plan: one window shuffle on the user key assigns sessions; one
    groupBy (user, session) collects the ordered type array (sorted
    in-group by (ts, tiebreak) — the same sorted-collect fold shape as
    the funnel); path n-grams slice out map-side (the shingle
    position-explode — no further shuffle); the count is a hash agg on
    the path and top-k is TakeOrdered.

    ``max_events_per_user`` (ENFORCED, default 100k, ``None`` to opt
    out) bounds the per-(user, session) collected array — the OOM
    hazard a bot user poses: each user keeps their EARLIEST N events
    (by (ts, tiebreak) — the sessionize order itself), so sessions of
    capped users are exactly the sessions of their first N events; the
    cap's row_number shares the sessionize window's partitioning and
    sort, so it costs no extra exchange.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    if gap_seconds < 1:
        raise ValueError("gap_seconds must be >= 1")
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1 (or None)")
    from pyspark.sql import Window

    tb = F.col(tiebreak_col) if tiebreak_col is not None else F.col(type_col)
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(type_col).alias("_t"),
        tb.alias("_tb"),
    )
    w = Window.partitionBy("_u").orderBy(F.col("_ts").asc(), F.col("_tb").asc())
    if max_events_per_user is not None:
        ev = (
            ev.withColumn("_cap_rn", F.row_number().over(w))
            .filter(F.col("_cap_rn") <= max_events_per_user)
            .drop("_cap_rn")
        )
    gap_us = gap_seconds * 1_000_000
    sess = (
        ev.withColumn("_prev", F.lag("_ts").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.unix_micros("_ts") - F.unix_micros("_prev") > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_sid",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    seqs = sess.groupBy("_u", "_sid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("_ts", "_tb", F.col("_t").alias("t")))
            ),
            lambda x: x["t"],
        ).alias("_seq")
    )
    paths = (
        seqs.filter(F.size("_seq") >= n)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.size("_seq") - F.lit(n - 1))
            ).alias("_p"),
            "_seq",
        )
        .select(
            F.array_join(F.slice("_seq", F.col("_p"), n), " -> ").alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("path").asc()
    ).limit(k)
    rank_w = Window.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
    return topk.withColumn("rank", F.row_number().over(rank_w).cast("int"))


def volume_anomaly(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_seconds: int = 3600,
    trailing: int = 24,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-(window, type) volume anomalies: flag windows whose event
    count deviates from the TRAILING ``trailing``-window mean by more
    than ``z_threshold`` standard deviations — the monitoring
    primitive for ingest pipelines (drops, spikes, stuck producers).

    The trailing mean/std derive from INTEGER window sums (count and
    count-squared over the preceding frame), so the float arithmetic
    is a fixed expression over exact integers — engine-portable with
    no order pinning needed. Windows with fewer than 2 trailing
    observations yield null z and are never flagged; zero trailing
    variance also yields null z (no finite score exists), but a count
    DEVIATING from a constant history is still flagged — the
    "perfectly steady pipeline suddenly spikes" case is precisely the
    alert this exists for. Returns (``window_start``, ``event_type``,
    ``n``, ``mean_n``, ``z``, ``is_anomaly``).

    Plan: one map-side-combined (window, type) hash agg over the
    corpus; both frame sums run over its bounded |windows| x |types|
    output. Missing windows (zero events) do NOT appear as zero counts
    — densify upstream if gaps must count as anomalies.
    """
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    if trailing < 2:
        raise ValueError("trailing must be >= 2")
    from pyspark.sql import Window

    win = (
        F.floor(
            F.unix_timestamp(F.col(ts_col).cast("timestamp"))
            / F.lit(window_seconds)
        ).cast("long")
    ).alias("_w")
    counts = events.select(win, F.col(type_col).alias("event_type")).groupBy(
        "_w", "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    frame = (
        Window.partitionBy("event_type")
        .orderBy(F.col("_w").asc())
        .rowsBetween(-trailing, -1)
    )
    s1 = F.sum("n").over(frame)
    s2 = F.sum(F.col("n") * F.col("n")).over(frame)
    cnt = F.count("n").over(frame)
    mean = s1.cast("double") / cnt.cast("double")
    var = (
        s2.cast("double") - s1.cast("double") * s1.cast("double") / cnt.cast("double")
    ) / cnt.cast("double")
    z = F.when(
        (cnt >= 2) & (var > 0),
        (F.col("n").cast("double") - mean) / F.sqrt(var),
    )
    # constant history (var == 0) with a deviating count: infinite z —
    # no finite score, but definitely an anomaly
    flat_dev = (cnt >= 2) & (var == F.lit(0.0)) & (
        F.col("n").cast("double") != mean
    )
    return (
        counts.withColumn("_c", cnt)
        .withColumn("mean_n", F.when(cnt >= 1, F.round(mean, 6)))
        .withColumn("z", F.round(z, 6))
        .withColumn("_flat_dev", flat_dev)
        .select(
            F.timestamp_seconds(F.col("_w") * window_seconds).alias("window_start"),
            "event_type",
            "n",
            "mean_n",
            "z",
            (
                F.coalesce(
                    F.abs(F.col("z")) > F.lit(float(z_threshold)), F.lit(False)
                )
                | F.coalesce(F.col("_flat_dev"), F.lit(False))
            ).alias("is_anomaly"),
        )
    )


def decayed_engagement(
    events: DataFrame,
    *,
    as_of: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    half_life_seconds: float = 604800.0,
    max_events_per_user: int | None = 100_000,
) -> DataFrame:
    """Per-user exponentially time-decayed engagement score:
    ``sum(value * 2^(-(as_of - t) / half_life))`` — the standard
    recency-weighted activity metric (a week-old action counts half as
    much under the default 7-day half-life). Events after ``as_of``
    are excluded; ``as_of`` is an explicit timestamp string (never
    "now" — determinism and backfills both need a pinned reference
    point).

    Returns (``user_col``, ``n_events``, ``score``). ONE hash shuffle
    on the user key; the decayed sum folds each user's events in
    (ts, tiebreak) order (order-pinned floats, the engine-wide rule —
    pass the event id as ``tiebreak_col`` to pin simultaneous events).
    The decay term's pow/division chain is mirrored operation-for-
    operation in the SQL twin.

    ``max_events_per_user`` (ENFORCED, default 100k, ``None`` to opt
    out) bounds the per-user pinned-fold array: each user keeps their
    MOST RECENT N events before ``as_of`` (by (ts DESC, tiebreak)) —
    the largest decay weights; what truncation drops is the
    smallest-weight tail, i.e. the contributions decay was already
    suppressing. ``n_events`` counts the retained events.
    """
    if half_life_seconds <= 0:
        raise ValueError("half_life_seconds must be > 0")
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1 (or None)")
    tb = F.col(tiebreak_col) if tiebreak_col is not None else F.col(value_col)
    ref = F.lit(as_of).cast("timestamp")
    ev = events.filter(F.col(ts_col).cast("timestamp") <= ref).select(
        F.col(user_col),
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            tb.alias("tb"),
            (
                F.col(value_col).cast("double")
                * F.pow(
                    F.lit(2.0),
                    -(
                        (F.unix_micros(ref) - F.unix_micros(F.col(ts_col).cast("timestamp")))
                        .cast("double")
                        / F.lit(float(half_life_seconds) * 1_000_000.0)
                    ),
                )
            ).alias("w"),
        ).alias("_e"),
    )
    if max_events_per_user is not None:
        from pyspark.sql import Window

        cap_w = Window.partitionBy(user_col).orderBy(
            F.col("_e.t").desc(), F.col("_e.tb").asc()
        )
        ev = (
            ev.withColumn("_cap_rn", F.row_number().over(cap_w))
            .filter(F.col("_cap_rn") <= max_events_per_user)
            .drop("_cap_rn")
        )
    return ev.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.aggregate(
            F.array_sort(F.collect_list("_e")),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("score"),
    )


def ab_test(
    events: DataFrame,
    *,
    variant_col: str,
    control: str,
    treatment: str,
    flag_col: str,
    by: str | None = None,
    z_threshold: float = 1.959963984540054,
) -> DataFrame:
    """Two-proportion z-test per group — the experiment-readout
    primitive: compare conversion rates between a control and a
    treatment variant, with the pooled-variance z statistic and a
    significance flag (default threshold = the two-sided 95% critical
    value).

    ``flag_col`` is the 0/1 success indicator; rows whose variant is
    neither ``control`` nor ``treatment`` are ignored. Returns one row
    per ``by`` group (or one row total): ``n_c, conv_c, rate_c, n_t,
    conv_t, rate_t, lift, z, significant``. Groups where either arm
    has no exposures, or where the pooled variance is zero (all
    successes or all failures), yield null z and are never flagged.

    ONE hash aggregate (conditional sums, map-side combined); every
    float derives from exact integer counts through a fixed expression
    — engine-portable with no order pinning.
    """
    is_c = F.col(variant_col) == F.lit(control)
    is_t = F.col(variant_col) == F.lit(treatment)
    flag = F.col(flag_col).cast("long")
    grp = [F.col(by)] if by is not None else []
    agg = events.filter(is_c | is_t).groupBy(*grp).agg(
        F.sum(F.when(is_c, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(is_c, flag).otherwise(0)).alias("conv_c"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(is_t, flag).otherwise(0)).alias("conv_t"),
    )
    rc = F.col("conv_c").cast("double") / F.col("n_c").cast("double")
    rt = F.col("conv_t").cast("double") / F.col("n_t").cast("double")
    pp = (F.col("conv_c") + F.col("conv_t")).cast("double") / (
        F.col("n_c") + F.col("n_t")
    ).cast("double")
    var = (
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_c").cast("double")
            + F.lit(1.0) / F.col("n_t").cast("double")
        )
    )
    z = F.when(
        (F.col("n_c") > 0) & (F.col("n_t") > 0) & (var > 0),
        (rt - rc) / F.sqrt(var),
    )
    both = (F.col("n_c") > 0) & (F.col("n_t") > 0)
    return agg.select(
        *([by] if by is not None else []),
        "n_c", "conv_c",
        F.when(F.col("n_c") > 0, F.round(rc, 6)).alias("rate_c"),
        "n_t", "conv_t",
        F.when(F.col("n_t") > 0, F.round(rt, 6)).alias("rate_t"),
        F.when(both & (rc > 0), F.round(rt / rc - F.lit(1.0), 6)).alias("lift"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            F.abs(F.round(z, 6)) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("significant"),
    )


def user_lifecycle(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-user lifecycle dimension — the user table every event
    warehouse materializes: (``user_col``, ``first_seen``,
    ``last_seen``, ``lifetime_days`` (date diff, 0 for one-day users),
    ``n_events``, ``n_active_days`` (distinct calendar days),
    ``total_value`` — exact-decimal sum, null column -> omitted).

    ONE map-side-combined hash aggregate on the user key; the value
    total uses the profiler's DECIMAL(27,6) exact-sum trick, so every
    output is engine-exact with no float-order pinning.
    """
    ts = F.col(ts_col).cast("timestamp")
    aggs = [
        F.min(ts).alias("first_seen"),
        F.max(ts).alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(ts.cast("date")).alias("n_active_days"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value")
        )
    out = events.groupBy(F.col(user_col)).agg(*aggs)
    return out.select(
        user_col,
        "first_seen",
        "last_seen",
        F.datediff(
            F.col("last_seen").cast("date"), F.col("first_seen").cast("date")
        ).cast("int").alias("lifetime_days"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_active_days").cast("long").alias("n_active_days"),
        *([F.round("total_value", 6).alias("total_value")]
          if value_col is not None else []),
    )


def funnel_conversion_stats(
    events: DataFrame,
    steps,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: float | None = None,
    max_events_per_user: int | None = 100_000,
) -> DataFrame:
    """Time-to-convert statistics per funnel step: for each step i >= 2,
    over users who reached it, the distribution of ``t_i - t_1``
    seconds — (``step``, ``step_name``, ``n_users``, ``p50_seconds``,
    ``p90_seconds``, ``mean_seconds``). The question a funnel summary
    can't answer: not just HOW MANY convert, but HOW FAST.

    Composes :func:`funnel_user_steps` (one shuffle) with a map-side
    step unpivot and one aggregate per step. Percentiles are exact
    ``percentile`` (linear interpolation — DuckDB quantile_cont
    parity); deltas are exact integer micros divided by 1e6 once, and
    the mean uses the exact-decimal sum. Engine-exact throughout.
    """
    steps = _validate_steps(steps)
    k = len(steps)
    per_user = funnel_user_steps(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col,
        within=within, max_events_per_user=max_events_per_user,
    )
    pairs = F.array(*[
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("step_name"),
            (
                (F.unix_micros(F.col(f"t_{i + 1}"))
                 - F.unix_micros(F.col("t_1"))).cast("double")
                / F.lit(1_000_000.0)
            ).alias("dt"),
        )
        for i in range(1, k)
    ])
    long = per_user.select(F.explode(pairs).alias("p")).select("p.*").filter(
        F.col("dt").isNotNull()
    )
    return long.groupBy("step", "step_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.percentile(F.col("dt"), F.lit(0.5)), 6).alias("p50_seconds"),
        F.round(F.percentile(F.col("dt"), F.lit(0.9)), 6).alias("p90_seconds"),
        F.round(
            F.sum(F.col("dt").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_seconds"),
    )


def attribution(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types,
    model: str = "last_touch",
    lookback_seconds: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Conversion attribution: credit each ``conversion_type`` event
    to the user's ``model`` touch event — ``'last_touch'`` (the most
    recent touch strictly before the conversion, optionally within
    ``lookback_seconds``) or ``'first_touch'`` (the user's earliest
    touch before the conversion — the "original source" model, no
    lookback by definition).

    Returns the attribution report: one row per credited
    ``touch_type`` plus a NULL-type row for unattributed conversions —
    (``touch_type``, ``n_conversions``, ``frac``), frac over ALL
    conversions (single division of exact counts).

    Plan: ONE window pass on the user key — the carried
    last/first-touch columns use an IGNORE NULLS window over the
    (ts, tiebreak)-ordered preceding frame, so no self-join and no
    second shuffle; the rollup is a hash agg on the bounded touch-type
    domain with a 1-row totals broadcast. Ties at identical ts order
    by ``tiebreak_col`` (pass the event id; defaults to the type
    string — deterministic but arbitrary).
    """
    touches = list(touch_types)
    if not touches:
        raise ValueError("touch_types must be non-empty")
    if conversion_type in touches:
        raise ValueError("conversion_type cannot also be a touch type")
    if model not in ("last_touch", "first_touch"):
        raise ValueError(f"unknown model {model!r}; use last_touch|first_touch")
    if model == "first_touch" and lookback_seconds is not None:
        raise ValueError("first_touch has no lookback (original-source model)")
    if lookback_seconds is not None and lookback_seconds <= 0:
        raise ValueError("lookback_seconds must be > 0")
    from pyspark.sql import Window

    tb = F.col(tiebreak_col) if tiebreak_col is not None else F.col(type_col)
    ev = events.filter(
        F.col(type_col).isin(touches + [conversion_type])
    ).select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts"),
        F.col(type_col).alias("_t"),
        tb.alias("_tb"),
    )
    w = (
        Window.partitionBy("_u")
        .orderBy(F.col("_ts").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("_t").isin(touches)
    pick = F.last if model == "last_touch" else F.first
    carried = (
        ev.withColumn(
            "_tt", pick(F.when(is_touch, F.col("_t")), ignorenulls=True).over(w)
        )
        .withColumn(
            "_tts", pick(F.when(is_touch, F.col("_ts")), ignorenulls=True).over(w)
        )
    )
    conv = carried.filter(F.col("_t") == conversion_type)
    credited = F.col("_tt")
    if lookback_seconds is not None:
        within = (
            F.col("_ts") - F.col("_tts")
            <= F.lit(int(round(lookback_seconds * _US)))
        )
        credited = F.when(within, F.col("_tt"))
    rolled = conv.select(credited.alias("touch_type")).groupBy(
        "touch_type"
    ).agg(F.count(F.lit(1)).alias("n_conversions"))
    totals = rolled.agg(F.sum("n_conversions").cast("long").alias("_tot"))
    return rolled.crossJoin(F.broadcast(totals)).select(
        "touch_type",
        F.col("n_conversions").cast("long").alias("n_conversions"),
        F.round(
            F.col("n_conversions").cast("double") / F.col("_tot").cast("double"),
            6,
        ).alias("frac"),
    )


def event_cap_stats(
    events: DataFrame,
    user_col: str = "user_id",
    max_events_per_user: int = 100_000,
    type_col: str | None = None,
    types: list[str] | None = None,
) -> DataFrame:
    """Observable for the ``max_events_per_user`` skew caps ("no
    silent caps"): one summary row quantifying exactly what the cap
    truncates on this corpus — ``users_total``, ``users_capped``
    (event count > cap), ``events_dropped`` (sum of count - cap over
    capped users), and ``max_user_events`` (the hottest key, for
    sizing the cap). Pass ``type_col``/``types`` to pre-filter the
    same way the capped operator does (e.g. funnel step types), so the
    numbers match what :func:`funnel_user_steps` /
    :func:`session_paths` / :func:`decayed_engagement` actually see.
    All exact integers — order-free, oracle-stable. Cost: one
    groupBy(user) count + a 1-row aggregate.
    """
    if max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1")
    if (type_col is None) != (types is None):
        # silently ignoring a lone type_col/types would produce stats
        # that do NOT match the capped operator's filtered view.
        raise ValueError(
            "pass type_col and types together (or neither); got "
            f"type_col={type_col!r}, types={types!r}"
        )
    ev = events
    if type_col is not None and types is not None:
        ev = ev.filter(F.col(type_col).isin(list(types)))
    per = ev.groupBy(F.col(user_col).alias("_u")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    hot = F.col("_n") > max_events_per_user
    return per.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.sum(F.when(hot, 1).otherwise(0)).alias("users_capped"),
        F.sum(
            F.when(hot, F.col("_n") - max_events_per_user).otherwise(0)
        ).alias("events_dropped"),
        F.max("_n").alias("max_user_events"),
    )
