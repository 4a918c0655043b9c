"""One-pass table profiler (training-data-pipeline staple).

``profile_table`` computes, per column:

  n_rows, n_null, n_distinct, min/max, mean (numeric), min/max (string)

Exactness is a knob, because the expensive piece — distinct counts —
changes physical shape:

- ``exact=False`` : ``approx_count_distinct`` (HyperLogLog++) rides in
  the SAME single aggregation as every other stat — one scan, pure
  partial aggregation, no extra shuffle. The 100 TB path (HLL error
  ±~2.3%; means switch to plain double, whose partition-order float
  drift is bounded).
- ``exact=True``  : exact distincts via a MELT — explode each row into
  (column_idx, value-as-string) pairs, hash-aggregate twice
  (distinct-pairs, then count per column). Spark's own
  ``count(DISTINCT a), count(DISTINCT b), …`` rewrite plans an Expand
  plus a SortAggregate (var-length string buffers knock the aggregate
  off the hash path) — measured 3.7 s vs 0.27 s for the melt on a
  5-column 150 k-row profile. The melt costs a second scan, but both
  of its aggregations combine map-side, so the shuffle carries one row
  per DISTINCT VALUE, never per input row. The oracle-checkable path.

Float determinism for the oracle: exact numeric means are computed as
``CAST(sum(CAST(c AS DECIMAL(27,6))) AS DOUBLE) / n_nonnull`` — the
sum is exact decimal arithmetic in both engines, so the one double
division is bit-identical. Timestamps profile as epoch micros
(engine-portable), not formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format profile: one output row per column with
    (column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    mean, min_str, max_str). Numeric stats are null for string columns
    and vice versa; timestamps appear as epoch-micros numerics."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    norm = {}  # column -> (normalized Column, is_numeric)
    for c in cols:
        dt = dtypes[c]
        if dt.startswith("timestamp"):
            # NTZ needs an explicit cast to session-tz (UTC-pinned)
            # timestamp before unix_micros accepts it
            norm[c] = (F.unix_micros(F.col(c).cast("timestamp")), True)
        else:
            norm[c] = (F.col(c), _is_numeric(dt))

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col, is_num = norm[c]
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_null_{i}"))
        if not exact:
            aggs.append(F.approx_count_distinct(col).alias(f"_dist_{i}"))
        if is_num:
            aggs.append(F.min(col).cast("double").alias(f"_min_{i}"))
            aggs.append(F.max(col).cast("double").alias(f"_max_{i}"))
            if exact:
                mean = F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(
                    col
                ).cast("double")
            else:
                mean = F.avg(col.cast("double"))
            aggs.append(mean.alias(f"_mean_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"_mins_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"_maxs_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_min_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"_max_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"_mean_{i}"))
            aggs.append(F.min(col.cast("string")).alias(f"_mins_{i}"))
            aggs.append(F.max(col.cast("string")).alias(f"_maxs_{i}"))

    wide = df.agg(*aggs)

    # one wide row -> |cols| long rows: stack is a driver-cheap reshape
    # of the already-aggregated scalars, no second pass over the data
    stack_args: list = [F.lit(len(cols))]
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.lit(dtypes[c]),
            F.col("_n"),
            F.col(f"_null_{i}"),
            (F.col(f"_dist_{i}") if not exact else F.lit(None).cast("long")),
            F.col(f"_min_{i}"),
            F.col(f"_max_{i}"),
            F.col(f"_mean_{i}"),
            F.col(f"_mins_{i}"),
            F.col(f"_maxs_{i}"),
        ]
    stacked = wide.select(
        F.stack(*stack_args).alias(
            "column", "dtype", "n_rows", "n_null", "n_distinct",
            "min_num", "max_num", "mean", "min_str", "max_str",
        )
    )
    if not exact:
        return stacked

    # exact distincts via melt: value->string is injective per column
    # (doubles/longs format uniquely; all NaNs collapse, matching
    # count(DISTINCT)); nulls filtered out, matching count(DISTINCT)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"), norm[c][0].cast("string").alias("v")
            )
            for c in cols
        ]
    )
    nd = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.c", "p.v")
        .filter(F.col("v").isNotNull())
        .groupBy("c", "v")
        .agg(F.lit(1))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .withColumnRenamed("c", "column")
    )
    return (
        stacked.drop("n_distinct")
        .join(F.broadcast(nd), "column", "left")
        .select(
            "column", "dtype", "n_rows", "n_null",
            F.coalesce(F.col("_nd"), F.lit(0)).alias("n_distinct"),
            "min_num", "max_num", "mean", "min_str", "max_str",
        )
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 4,
    bucket_col: str = "bucket",
    approx: bool = False,
    relative_error: float = 0.001,
) -> DataFrame:
    """Assign each row its quantile bucket of ``col`` (1..n_buckets) —
    the binning step behind quality-stratified data mixes ("train on
    the top quartile", "sample uniformly across perplexity deciles").

    The boundaries are ONE aggregate over the column (exact
    ``percentile`` by default — linearly interpolated, matching
    DuckDB's quantile_cont, so the whole op is oracle-checkable;
    ``approx=True`` switches to approx_percentile/GK-sketch for the
    100 TB path where the exact percentile's per-group value map no
    longer fits). Assignment is a broadcast of the (n_buckets-1)-row
    boundary array + a counting filter — NO global sort and NO window
    (an ntile() over the whole table would single-partition it).
    Rows with a NULL ``col`` get a NULL bucket.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    x = F.col(col).cast("double")
    probs_arr = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    if approx:
        agg = F.approx_percentile(x, probs_arr, F.lit(int(1.0 / relative_error)))
    else:
        agg = F.percentile(x, probs_arr)
    bnds = df.agg(agg.alias("_bnds"))
    out = df.crossJoin(F.broadcast(bnds))
    bucket = F.when(
        x.isNotNull(),
        (
            F.size(F.filter(F.col("_bnds"), lambda b: x > b)) + F.lit(1)
        ).cast("int"),
    )
    return out.withColumn(bucket_col, bucket).drop("_bnds")


def winsorize(
    df: DataFrame,
    col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    out_col: str | None = None,
    approx: bool = False,
    relative_error: float = 0.001,
) -> DataFrame:
    """Clamp ``col`` to its [p_low, p_high] quantile range — the
    outlier-robustification step before scaling/averaging quality or
    engagement signals (one pathological value otherwise dominates any
    mean-based downstream statistic).

    Same plan shape as :func:`quantile_buckets`: the two boundaries are
    ONE aggregate (exact ``percentile`` by default — matches DuckDB's
    quantile_cont, oracle-checkable; ``approx=True`` for the GK-sketch
    100 TB path), broadcast back, and the clamp is a map-only
    least/greatest expression. NULLs pass through unchanged.
    """
    if not 0.0 <= p_low < p_high <= 1.0:
        raise ValueError("need 0 <= p_low < p_high <= 1")
    x = F.col(col).cast("double")
    probs = F.array(F.lit(float(p_low)), F.lit(float(p_high)))
    if approx:
        agg = F.approx_percentile(x, probs, F.lit(int(1.0 / relative_error)))
    else:
        agg = F.percentile(x, probs)
    bnds = df.agg(agg.alias("_wb"))
    out = df.crossJoin(F.broadcast(bnds))
    clamped = F.when(
        x.isNotNull(),
        F.least(
            F.greatest(x, F.element_at("_wb", 1)), F.element_at("_wb", 2)
        ),
    )
    return out.withColumn(out_col or col, clamped).drop("_wb")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff between two versions of a table: one row per key
    that was ``added``, ``removed``, or ``changed`` (unchanged rows
    are omitted — at 100 TB the diff output should scale with the
    CHANGE volume, not the table). ``changed_cols`` lists which of the
    compared columns differ (null-safe comparison; NaN != NaN like
    SQL). ``compare_cols`` defaults to the non-key columns both frames
    share.

    One full-outer hash join on the keys plus map-only comparison
    expressions — the pipeline regression check before promoting a
    rebuilt corpus/index (what did the new dedup config actually
    change?).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns
            if c not in keys and c in new.columns
        ]
    for c in keys + compare_cols:
        if c not in old.columns:
            raise ValueError(f"column {c!r} not in old frame")
        if c not in new.columns:
            raise ValueError(f"column {c!r} not in new frame")
    o = old.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, [f"_k{i}" for i in range(len(keys))], "full_outer")
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    ) if compare_cols else F.array().cast("array<string>")
    ctype = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
    )
    # changed_cols is meaningful only when the key exists on BOTH
    # sides — an added/removed row "differs" in every column trivially
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    return (
        j.withColumn("change_type", ctype)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.col(f"_k{i}").alias(k) for i, k in enumerate(keys)],
            "change_type",
            F.when(both, changed)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )


def key_skew_topk(
    df: DataFrame,
    keys: list[str] | str,
    k: int = 20,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic: the top-``k`` heaviest key
    values with their share of the table — run this BEFORE shuffling
    100 TB on a key; it tells you whether you need salting, an AQE
    skew join, or one of the engine's enforced per-key caps (the
    funnel/session family), and which literal keys are the offenders.

    Returns (``rank`` 1-based by (n DESC, key ASC), ``key`` — the
    '</s>'-serialized key value, ``n``, ``frac``, ``cum_frac``,
    ``n_keys``, ``n_rows``) — the totals ride every row so one
    relation carries the whole diagnostic. frac/cum_frac are single
    double divisions of exact integer counts (cum over the <= k
    TakeOrdered survivors — the top_vocab window-over-survivors
    shape); no float accumulation anywhere.

    Plan: ONE map-side-combined hash agg on the serialized key, a
    one-row totals broadcast, TakeOrdered(k) for the head, and a
    window over the <= k survivors only.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..functions.serialize import serialize_columns
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    for c in keys:
        if c not in df.columns:
            raise ValueError(f"key_skew_topk: unknown column {c!r}")
    key = serialize_columns(keys)
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    cum = Window.orderBy(F.col("n").desc(), F.col("key").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("_cum_n", F.sum("n").over(cum))
        .select(
            "rank",
            "key",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("frac"),
            F.round(
                F.col("_cum_n").cast("double") / F.col("n_rows").cast("double"),
                6,
            ).alias("cum_frac"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width value histogram of a numeric column — the
    distribution primitive behind length/quality/value dashboards.

    Returns one row per NON-EMPTY bin: (``bin`` 0-based, ``bin_lo``,
    ``bin_hi``, ``n``, ``frac``). Bounds default to the column's exact
    min/max (one 1-row aggregate, broadcast back); values outside
    explicit bounds clamp into the end bins; nulls are dropped. A
    degenerate range (min = max) puts everything in bin 0.

    ONE map-side-combined hash aggregate on the bin id over a map-only
    bin assignment; ``frac`` is a single double division of exact
    integer counts. The |bins|-row output is constant-size at any
    corpus scale.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    x = F.col(col).cast("double")
    base = df.select(x.alias("_x")).filter(F.col("_x").isNotNull())
    if lo is None or hi is None:
        bounds = base.agg(
            F.min("_x").alias("_lo"), F.max("_x").alias("_hi")
        )
        base = base.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
        if lo is not None:
            lo_c = F.lit(float(lo))
        if hi is not None:
            hi_c = F.lit(float(hi))
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    w = (hi_c - lo_c) / F.lit(float(n_bins))
    bin_ = F.when(w > 0, F.least(
        F.greatest(
            F.floor((F.col("_x") - lo_c) / w).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )).otherwise(F.lit(0))
    agg = base.select(
        bin_.alias("bin"), lo_c.alias("_l"), w.alias("_w")
    ).groupBy("bin", "_l", "_w").agg(F.count(F.lit(1)).alias("n"))
    totals = agg.agg(F.sum("n").cast("long").alias("_tot"))
    return (
        agg.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            F.round(F.col("_l") + F.col("bin") * F.col("_w"), 6).alias("bin_lo"),
            F.round(F.col("_l") + (F.col("bin") + 1) * F.col("_w"), 6).alias("bin_hi"),
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("frac"),
        )
    )


def corpus_datacard(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    source_col: str | None = None,
    top_sources: int = 10,
) -> DataFrame:
    """One-call corpus datacard — the summary block of a dataset card
    (Gebru et al., "Datasheets for Datasets"), as a long relation
    ``(metric, key, value)``:

    - ``n_docs`` / ``n_chars_total`` / ``n_tokens_total``
    - ``chars_p50`` / ``chars_p90`` (exact interpolated percentile) /
      ``chars_mean`` (exact integer sum, one double division)
    - ``quality_mean`` (textpipe composite score per doc, rounded to
      6 dp and summed in DECIMAL(27,6) — order-free exact)
    - ``exact_dup_frac`` — fraction of docs whose text equals an
      earlier doc's: (n - n_distinct_texts) / n
    - ``lang_frac`` per ``lang_col`` value (when given)
    - ``source_frac`` for the ``top_sources`` largest ``source_col``
      values (count DESC, name ASC — deterministic)

    Every piece is a hash aggregate with map-side combine over one
    corpus scan's projections (the text relation is lineage-cut and
    re-consumed); output is a few dozen rows regardless of corpus
    size. All values double, rounded to 6 dp — fully SQL-mirrorable
    (`docs_datacard` oracle). For near-dup rate at scale chain
    ``near_dup_pairs_minhash`` stats separately — the datacard's dup
    metric is the EXACT-duplicate floor, one groupBy, no LSH.
    """
    from .textpipe import quality_score_expr, token_count_expr

    t = F.coalesce(F.col(text_col), F.lit(""))
    cols = [
        t.alias("_t"),
        F.length(t).alias("_nc"),
        token_count_expr(t).cast("long").alias("_nt"),
        F.round(quality_score_expr(t), 6).cast("decimal(27,6)").alias("_q"),
    ]
    if lang_col is not None:
        cols.append(F.coalesce(F.col(lang_col), F.lit("")).alias("_lang"))
    if source_col is not None:
        cols.append(F.coalesce(F.col(source_col), F.lit("")).alias("_src"))
    base = docs.select(*cols).localCheckpoint(eager=False)

    def row(metric, key, value):
        return F.struct(
            F.lit(metric).alias("metric"),
            key.alias("key") if isinstance(key, F.Column) else F.lit(key).alias("key"),
            F.round(value, 6).cast("double").alias("value"),
        )

    n = F.count(F.lit(1)).cast("double")
    main = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_nc").cast("long").alias("_ncs"),
        F.sum("_nt").cast("long").alias("_nts"),
        F.sum("_q").alias("_qs"),
        F.percentile("_nc", F.array(F.lit(0.5), F.lit(0.9))).alias("_pct"),
        F.count_distinct("_t").cast("long").alias("_ndist"),
    ).select(
        F.explode(
            F.array(
                row("n_docs", "", F.col("_n").cast("double")),
                row("n_chars_total", "", F.col("_ncs").cast("double")),
                row("n_tokens_total", "", F.col("_nts").cast("double")),
                row("chars_p50", "", F.col("_pct")[0]),
                row("chars_p90", "", F.col("_pct")[1]),
                row("chars_mean", "",
                    F.col("_ncs").cast("double") / F.col("_n").cast("double")),
                row("quality_mean", "",
                    F.col("_qs").cast("double") / F.col("_n").cast("double")),
                row("exact_dup_frac", "",
                    (F.col("_n") - F.col("_ndist")).cast("double")
                    / F.col("_n").cast("double")),
            )
        ).alias("r")
    ).select("r.metric", "r.key", "r.value")

    out = main
    if lang_col is not None:
        totals = base.agg(n.alias("_tot"))
        langs = (
            base.groupBy("_lang").agg(F.count(F.lit(1)).alias("_ln"))
            .crossJoin(F.broadcast(totals))
            .select(
                F.lit("lang_frac").alias("metric"),
                F.col("_lang").alias("key"),
                F.round(F.col("_ln").cast("double") / F.col("_tot"), 6)
                .alias("value"),
            )
        )
        out = out.unionByName(langs)
    if source_col is not None:
        from pyspark.sql import Window

        totals = base.agg(n.alias("_tot"))
        srcs = base.groupBy("_src").agg(F.count(F.lit(1)).alias("_sn"))
        w = Window.orderBy(F.col("_sn").desc(), F.col("_src").asc())
        srcs = (
            srcs.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= top_sources)
            .crossJoin(F.broadcast(totals))
            .select(
                F.lit("source_frac").alias("metric"),
                F.col("_src").alias("key"),
                F.round(F.col("_sn").cast("double") / F.col("_tot"), 6)
                .alias("value"),
            )
        )
        out = out.unionByName(srcs)
    return out
