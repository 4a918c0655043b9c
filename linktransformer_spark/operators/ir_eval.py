"""IR and binary-classification evaluation — distributed window+agg pipelines.

Re-expresses the reference's evaluators
(/root/reference/src/linktransformer/modified_sbert/evaluation.py:294-405
``compute_metrics``; :444-498 ``BinaryClassificationEvaluator_wandb``) as
pure relational plans over three tables instead of driver-side dict loops:

    results  (qid, cid, score)   ranked candidates (e.g. merge_knn output)
    relevant (qid, cid)          gold pairs
    pairs    (score, label)      scored sentence pairs for binary eval

Formulas (identical to the reference / sentence-transformers):
  accuracy@k  = mean over queries of [any relevant doc in top-k]
  precision@k = mean of (#relevant in top-k)/k
  recall@k    = mean of (#relevant in top-k)/n_rel(q)
  MRR@k       = mean of 1/rank(first relevant in top-k), else 0
  NDCG@k      = mean of DCG@k / IDCG@k, DCG = sum rel_r / log2(r+1)
  MAP@k       = mean of sum_{relevant hits r<=k} (cum_correct(r)/r) / min(k, n_rel)

All per-(qid,k) work is one groupBy after a rank window — a single
shuffle on qid; the per-k explode multiplies rows only AFTER the
rank<=max(k) prune, so the shuffled volume is #queries * max_k.

Determinism note (engine semantics, documented deviation): ranking
tie-breaks on (score DESC, cid ASC); the reference inherits FAISS/sort
insertion order on ties (SURVEY §1.3). Binary-eval threshold sweeps run
over DISTINCT score levels (threshold = midpoint between adjacent
distinct scores) — identical to the reference's row-level sweep
whenever scores are distinct, and deterministic under ties where the
reference is input-order-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KS = (1, 3, 5, 10)


def rank_results(
    results: DataFrame, qid: str = "qid", cid: str = "cid", score: str = "score"
) -> DataFrame:
    """Attach 1-based ``rank`` per query: score DESC, cid ASC tie-break."""
    w = Window.partitionBy(qid).orderBy(F.col(score).desc(), F.col(cid).asc())
    return results.withColumn("rank", F.row_number().over(w))


def ir_metrics(
    results: DataFrame,
    relevant: DataFrame,
    ks: Sequence[int] = DEFAULT_KS,
    qid: str = "qid",
    cid: str = "cid",
    score: str = "score",
) -> DataFrame:
    """One row per k: (k, accuracy, precision, recall, mrr, ndcg, map).

    Averages run over every query that has >=1 relevant doc (the
    reference filters its query set the same way,
    evaluation.py:100-110); queries with no retrieved rows contribute 0.
    """
    ks = sorted(set(int(k) for k in ks))
    max_k = ks[-1]

    ranked = rank_results(results, qid, cid, score).filter(F.col("rank") <= max_k)
    rel = relevant.select(F.col(qid), F.col(cid), F.lit(1).alias("is_rel")).distinct()
    n_rel = rel.groupBy(qid).agg(F.count(F.lit(1)).alias("n_rel"))

    hits = (
        ranked.join(rel, [qid, cid], "left")
        .withColumn("is_rel", F.coalesce("is_rel", F.lit(0)))
        # cumulative correct within the query's ranking (for MAP)
        .withColumn(
            "cum_correct",
            F.sum("is_rel").over(
                Window.partitionBy(qid).orderBy("rank").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )

    ks_df = results.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    per_qk = (
        hits.crossJoin(F.broadcast(ks_df))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy(qid, "k")
        .agg(
            F.max("is_rel").alias("hit"),
            F.sum("is_rel").alias("num_correct"),
            F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("first_rel_rank"),
            F.sum(
                F.when(F.col("is_rel") == 1, 1.0 / F.log2(F.col("rank") + 1)).otherwise(0.0)
            ).alias("dcg"),
            F.sum(
                F.when(
                    F.col("is_rel") == 1, F.col("cum_correct") / F.col("rank")
                ).otherwise(0.0)
            ).alias("sum_prec"),
        )
    )

    # every (query-with-relevant-docs, k) pair — zeros where no results
    universe = n_rel.crossJoin(F.broadcast(ks_df))
    per_qk = (
        universe.join(per_qk, [qid, "k"], "left")
        .withColumn("hit", F.coalesce("hit", F.lit(0)))
        .withColumn("num_correct", F.coalesce("num_correct", F.lit(0)))
        .withColumn("dcg", F.coalesce("dcg", F.lit(0.0)))
        .withColumn("sum_prec", F.coalesce("sum_prec", F.lit(0.0)))
    )

    # IDCG@k = sum_{r=1..min(k,n_rel)} 1/log2(r+1); tiny per-row loop,
    # evaluated on #queries*#ks rows only (post-aggregation).
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("k"), F.col("n_rel"))),
        F.lit(0.0),
        lambda acc, r: acc + 1.0 / F.log2(r.cast("double") + 1.0),
    )

    per_qk = per_qk.select(
        F.col(qid),
        "k",
        F.col("hit").cast("double").alias("acc_q"),
        (F.col("num_correct") / F.col("k")).alias("prec_q"),
        (F.col("num_correct") / F.col("n_rel")).alias("rec_q"),
        F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)).alias("mrr_q"),
        (F.col("dcg") / idcg).alias("ndcg_q"),
        (F.col("sum_prec") / F.least(F.col("k"), F.col("n_rel"))).alias("map_q"),
    )

    return (
        per_qk.groupBy("k")
        .agg(
            F.avg("acc_q").alias("accuracy"),
            F.avg("prec_q").alias("precision"),
            F.avg("rec_q").alias("recall"),
            F.avg("mrr_q").alias("mrr"),
            F.avg("ndcg_q").alias("ndcg"),
            F.avg("map_q").alias("map"),
        )
    )


def _level_sweep(pairs: DataFrame, score: str, label: str) -> DataFrame:
    """Distinct-score-level cumulative relation shared by the binary
    metrics: one row per distinct score, ordered DESC, with cumulative
    tp/fp when thresholding at 'this level and above', plus the
    midpoint threshold to the next (lower) level."""
    levels = (
        pairs.groupBy(F.col(score).alias("s"))
        .agg(
            F.sum(F.col(label).cast("int")).alias("pos"),
            F.sum(1 - F.col(label).cast("int")).alias("neg"),
        )
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(Window.unboundedPreceding, 0)
    return (
        levels.withColumn("tp", F.sum("pos").over(w))
        .withColumn("fp", F.sum("neg").over(w))
        .withColumn(
            "threshold",
            (F.col("s") + F.lead("s").over(Window.orderBy(F.col("s").desc()))) / 2.0,
        )
    )


def binary_eval(pairs: DataFrame, score: str = "score", label: str = "label") -> DataFrame:
    """Best-threshold accuracy/F1 + average precision over scored pairs
    (higher score = more similar). Returns ONE row:
      (accuracy, accuracy_threshold, f1, f1_threshold, precision, recall, ap)

    Reference protocol: evaluation.py:464-475 (sweep) — cut points
    between adjacent scores, metrics from cumulative counts; AP is the
    step-function sum_n (R_n - R_{n-1}) P_n over descending thresholds
    (sklearn ``average_precision_score`` semantics).
    Among equal-metric thresholds the HIGHEST threshold wins (the
    reference's scan-from-top strict-improvement rule).
    """
    totals = pairs.agg(
        F.sum(F.col(label).cast("int")).alias("P"),
        F.sum(1 - F.col(label).cast("int")).alias("N"),
    )
    lv = _level_sweep(pairs, score, label).crossJoin(F.broadcast(totals))
    # drop the lowest level for acc/f1 (no cut below it — reference
    # iterates range(len(rows)-1)); keep all levels for AP.
    cuts = lv.filter(F.col("threshold").isNotNull())

    acc_expr = (F.col("tp") + (F.col("N") - F.col("fp"))) / (F.col("P") + F.col("N"))
    prec_expr = F.col("tp") / (F.col("tp") + F.col("fp"))
    # P can be 0 (no positive pairs in the evaluated slice — hit at tiny
    # SFs); sklearn's zero_division convention: recall = 0, not an error
    rec_expr = F.when(F.col("P") > 0, F.col("tp") / F.col("P")).otherwise(
        F.lit(0.0)
    )
    f1_expr = F.when(
        F.col("tp") > 0, 2 * prec_expr * rec_expr / (prec_expr + rec_expr)
    ).otherwise(F.lit(0.0))

    scored = cuts.select(
        F.col("threshold"),
        acc_expr.alias("acc"),
        f1_expr.alias("f1"),
        prec_expr.alias("prec"),
        rec_expr.alias("rec"),
    )
    best_acc = scored.orderBy(F.col("acc").desc(), F.col("threshold").desc()).limit(1)
    best_f1 = scored.orderBy(F.col("f1").desc(), F.col("threshold").desc()).limit(1)

    # AP over ALL levels: sum (R_i - R_{i-1}) * P_i, descending score
    wl = Window.orderBy(F.col("s").desc())
    ap_df = (
        lv.withColumn("r", rec_expr)
        .withColumn("p", prec_expr)
        .withColumn("r_prev", F.coalesce(F.lag("r").over(wl), F.lit(0.0)))
        .agg(F.sum((F.col("r") - F.col("r_prev")) * F.col("p")).alias("ap"))
    )

    return (
        best_acc.select(
            F.col("acc").alias("accuracy"), F.col("threshold").alias("accuracy_threshold")
        )
        .crossJoin(
            best_f1.select(
                F.col("f1"),
                F.col("threshold").alias("f1_threshold"),
                F.col("prec").alias("precision"),
                F.col("rec").alias("recall"),
            )
        )
        .crossJoin(ap_df)
    )


# ---------------------------------------------------------------------------
# Logging sinks — the reference evaluators' per-step CSV/wandb side
# channel (evaluation.py:130-199 IR; :498-533 binary), decoupled from
# metric computation: compute distributed, log driver-side (the metric
# relations are tiny — one row per k, or one row total).
# ---------------------------------------------------------------------------

_IR_METRIC_HEADERS = (  # reference header vocabulary, evaluation.py:131-149
    ("accuracy", "Accuracy"),
    ("precision", "Precision"),
    ("recall", "Recall"),
    ("mrr", "MRR"),
    ("ndcg", "NDCG"),
    ("map", "MAP"),
)


def _append_csv(csv_path, headers, row):
    import os

    new = not os.path.isfile(csv_path)
    if not new:
        with open(csv_path, encoding="utf-8") as f:
            existing = f.readline().rstrip("\n")
        if existing != ",".join(headers):
            # appending under a different header (other ks/score_name)
            # would silently misalign values with columns
            raise ValueError(
                f"{csv_path} has header {existing!r}; refusing to append "
                f"rows for {','.join(headers)!r} — use a different name= "
                "or output_path"
            )
    with open(csv_path, "a", encoding="utf-8") as f:
        if new:
            f.write(",".join(headers) + "\n")
        f.write(",".join(str(v) for v in row) + "\n")


def _wandb_log(payload: dict) -> bool:
    """wandb.log when the package is importable and a run is active;
    silently a no-op otherwise (the reference hard-requires wandb —
    import-gating is our environment deviation)."""
    try:
        import wandb
    except ImportError:
        return False
    if wandb.run is None:
        return False
    wandb.log(payload)
    return True


def log_ir_metrics(
    metrics: DataFrame,
    output_path: str,
    name: str = "",
    epoch: int = -1,
    steps: int = -1,
    score_name: str = "cos_sim",
    use_wandb: bool = False,
) -> str:
    """Append one wide row of an ``ir_metrics`` result to the
    reference's evaluation CSV
    (``Information-Retrieval_evaluation{_name}_results.csv``, header
    ``epoch,steps,{score}-Accuracy@{k},...`` — evaluation.py:130-199)
    and optionally wandb.log the same payload. Returns the csv path.
    """
    import os

    rows = sorted(metrics.collect(), key=lambda r: r["k"])  # one row per k
    headers = ["epoch", "steps"]
    data = [epoch, steps]
    payload = {}
    for col, title in _IR_METRIC_HEADERS:
        for r in rows:
            key = f"{score_name}-{title}@{r['k']}"
            headers.append(key)
            data.append(r[col])
            payload[key] = r[col]
    suffix = f"_{name}" if name else ""
    csv_path = os.path.join(
        output_path, f"Information-Retrieval_evaluation{suffix}_results.csv"
    )
    os.makedirs(output_path, exist_ok=True)
    _append_csv(csv_path, headers, data)
    if use_wandb:
        _wandb_log(payload)
    return csv_path


def log_binary_eval(
    metrics: DataFrame,
    output_path: str,
    name: str = "",
    epoch: int = -1,
    steps: int = -1,
    score_name: str = "Cosine-Similarity",
    use_wandb: bool = False,
) -> str:
    """Append a ``binary_eval`` row to
    ``binary_classification_evaluation{_name}_results.csv`` and
    optionally wandb.log with the reference's key phrasing
    (``Classification Accuracy {score_name}`` etc,
    evaluation.py:489-498). Returns the csv path."""
    import os

    r = metrics.collect()[0]
    cols = ["accuracy", "accuracy_threshold", "f1", "f1_threshold",
            "precision", "recall", "ap"]
    headers = ["epoch", "steps", *cols]
    data = [epoch, steps, *[r[c] for c in cols]]
    suffix = f"_{name}" if name else ""
    csv_path = os.path.join(
        output_path, f"binary_classification_evaluation{suffix}_results.csv"
    )
    os.makedirs(output_path, exist_ok=True)
    _append_csv(csv_path, headers, data)
    if use_wandb:
        _wandb_log({
            f"Classification Accuracy {score_name}": r["accuracy"],
            f"Classification Accuracy threshold {score_name}": r["accuracy_threshold"],
            f"Classification F1 {score_name}": r["f1"],
            f"Classification F1 threshold {score_name}": r["f1_threshold"],
            f"Classification Precision {score_name}": r["precision"],
            f"Classification Recall {score_name}": r["recall"],
            f"Classification Average precision {score_name}": r["ap"],
        })
    return csv_path


# ---------------------------------------------------------------------------
# Label-quality / score-quality diagnostics (round 7): judge agreement
# and classifier calibration — the QA tier over LLM-judge and
# classifier outputs (SURVEY §2.7 evaluation surface, extended).
# ---------------------------------------------------------------------------

def cohen_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Cohen's kappa between two categorical columns (Cohen 1960) —
    chance-corrected agreement between two raters: two LLM-judge runs,
    a judge vs a heuristic, declared vs detected language. The
    standard QA gate before trusting a labeling pass.

    Returns ONE row: ``n`` (pairs compared; rows with a null on either
    side are dropped), ``p_observed`` (raw agreement), ``p_expected``
    (chance agreement from the marginals), ``kappa`` — all rounded to
    6 decimals. kappa is null when ``p_expected = 1`` (both raters
    constant — undefined, not 0).

    100 TB shape: TWO hash aggregates (the pair agg and the per-label
    marginals, both map-side combined; the marginal relation is
    bounded by the label vocabulary) and a full-outer join of the two
    tiny marginal relations. EVERY quantity is exact-integer until one
    final double division each — sum(na_l * nb_l) is an integer, so
    there is no float accumulation to pin and the result is engine-
    exact by construction.
    """
    a, b = F.col(col_a).cast("string"), F.col(col_b).cast("string")
    base = df.select(a.alias("_a"), b.alias("_b")).filter(
        F.col("_a").isNotNull() & F.col("_b").isNotNull()
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), 1).otherwise(0)).alias("_agree"),
    )
    ma = base.groupBy(F.col("_a").alias("_lbl")).agg(
        F.count(F.lit(1)).alias("_na"))
    mb = base.groupBy(F.col("_b").alias("_lbl")).agg(
        F.count(F.lit(1)).alias("_nb"))
    prod = (
        ma.join(mb, "_lbl", "full_outer")
        .select(
            (F.coalesce(F.col("_na"), F.lit(0))
             * F.coalesce(F.col("_nb"), F.lit(0))).alias("_p")
        )
        .agg(F.sum("_p").alias("_sum_prod"))
    )
    j = tot.crossJoin(F.broadcast(prod))
    n = F.col("_n").cast("double")
    po = F.col("_agree").cast("double") / n
    pe = F.col("_sum_prod").cast("double") / (n * n)
    return j.select(
        F.col("_n").cast("long").alias("n"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)), 6
        ).alias("kappa"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic classifier: bucket scores
    into ``n_bins`` equal-width bins over [0, 1] and compare each
    bin's mean score (confidence) with its positive fraction
    (accuracy) — the table behind every calibration curve and the
    input to ECE (:func:`calibration_summary`).

    Returns (``bin`` 0-based, ``bin_lo``, ``bin_hi``, ``n``,
    ``mean_score``, ``frac_positive``), one row per NON-EMPTY bin.
    Scores outside [0, 1] clamp into the end bins; null scores/labels
    are dropped. ``label_col`` is a 0/1 indicator.

    ONE map-side-combined hash aggregate on the bin id. The per-bin
    mean uses the profiler's exact-decimal trick — scores sum as
    DECIMAL(27,6) (exact, order-free) with ONE double division — so
    the output is engine-exact without any order pinning. Note the
    score is quantized to 6 decimals by that sum; calibration analysis
    never needs more.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("long")
    base = df.select(s.alias("_s"), lab.alias("_y")).filter(
        F.col("_s").isNotNull() & F.col("_y").isNotNull()
    )
    bin_ = F.least(
        F.greatest(F.floor(F.col("_s") * n_bins).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    agg = base.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_s").cast("decimal(27,6)")).alias("_ssum"),
        F.sum("_y").alias("_pos"),
    )
    return agg.select(
        "bin",
        F.round(F.col("bin").cast("double") / n_bins, 6).alias("bin_lo"),
        F.round((F.col("bin") + 1).cast("double") / n_bins, 6).alias("bin_hi"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("_ssum").cast("double") / F.col("n").cast("double"), 6
        ).alias("mean_score"),
        F.round(
            F.col("_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("frac_positive"),
    )


def calibration_summary(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row Expected Calibration Error over
    :func:`calibration_bins`: ``ECE = sum_b (n_b / n) *
    |frac_positive_b - mean_score_b|`` (Naeini et al. 2015), plus the
    max-bin gap (MCE) and totals. The fold runs over the bounded
    (<= n_bins) bin relation in bin order — order-pinned floats on a
    bounded relation, the engine's totals pattern."""
    bins = calibration_bins(df, score_col, label_col, n_bins=n_bins)
    gap = F.abs(F.col("frac_positive") - F.col("mean_score"))
    w = bins.select(
        "bin", F.col("n"), (gap * F.col("n").cast("double")).alias("_wgap"),
        gap.alias("_gap"),
    )
    out = w.agg(
        F.sum("n").alias("_n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("bin").alias("k"),
                                        F.col("_wgap").alias("v")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("_sum_wgap"),
        F.max("_gap").alias("_mce"),
        F.count(F.lit(1)).alias("_nb"),
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_nb").cast("int").alias("n_nonempty_bins"),
        F.round(
            F.col("_sum_wgap") / F.col("_n").cast("double"), 6
        ).alias("ece"),
        F.round(F.col("_mce"), 6).alias("mce"),
    )
