"""semantic_topk_join — the engine's core custom operator.

Backs ``merge`` / ``merge_knn`` / ``merge_blocking`` / ``merge_range`` /
``aggregate_rows`` / ``merge_k_judge`` (SURVEY §2.2 ops 1-5, 10). The
reference implements all of these with a FAISS flat inner-product index
(/root/reference/src/linktransformer/infer.py:144-151, 669-678, 821-824);
Catalyst has no kNN-join strategy, so this module provides three
execution modes behind one API (SURVEY §4 "custom pieces"):

- ``exact_cross``  : cross/theta join + window top-k. Exact, fully
  declarative, oracle-checkable (QUALIFY row_number formulation).
  Catalyst executes it as BroadcastNestedLoopJoin when one side is
  small. O(|L|·|R|) — the correctness path, also the right plan when
  the right side is a small reference list (broadcast, no shuffle of
  the big side).
- ``broadcast_knn`` : broadcast the (small) right side's vectors to
  every executor; per-partition exact numpy top-k inside mapInPandas.
  Exact scores, O(|L|·|R|) flops but vectorized and with O(|L|·k)
  output instead of materializing the cross product — the fast path
  when the right side fits in executor memory (the usual record-linkage
  shape: big messy left, curated right).
- ``lsh``          : BucketedRandomProjectionLSH candidate generation +
  exact re-rank of candidates. Approximate recall, near-linear — the
  100 TB x 100 TB path.

Tie-breaking is deterministic everywhere: ORDER BY score DESC,
right_id ASC (FAISS breaks ties by insertion order — SURVEY §1.3; we
define engine semantics instead of chasing float-order parity).

Scorers are pluggable: cosine-of-embeddings (any Encoder) or direct
string similarity (normalized Levenshtein) — the latter gives exact
cross-engine parity for the DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..encoders.base import Encoder
from ..functions import similarity as S

LEFT_ID = "_lt_left_id"
RIGHT_ID = "_lt_right_id"
LEFT_KEY = "_lt_key_l"
RIGHT_KEY = "_lt_key_r"
LEFT_EMB = "_lt_emb_l"
RIGHT_EMB = "_lt_emb_r"

Mode = Literal["auto", "exact_cross", "broadcast_knn", "lsh"]

# mode="auto" with an expression-embedding scorer routes to LSH + exact
# re-rank when the right side's Catalyst size estimate exceeds this
# (bytes). Below it, exact_cross's BroadcastNestedLoopJoin is the right
# plan (small curated right side — the reference's usual shape); above
# it the O(|L|·|R|) candidate stage stops being viable and the default
# must survive a 100x right side without the user knowing mode names.
AUTO_LSH_CONF = "spark.linktransformer.merge.autoLshThresholdBytes"
AUTO_LSH_DEFAULT_BYTES = 128 * 1024 * 1024

# the middle tier of the auto ladder (round 13): right sides too big
# to nested-loop but small enough to broadcast-embed take the EXACT
# numpy broadcast-knn path before falling back to approximate LSH.
# The threshold is a PLAN-size (text) estimate; the real constraint is
# the broadcast embedding matrix at rows x dim x 8 bytes — 256 MB of
# TPC-H-ish text is ~2.5-5M rows = ~1.3-2.6 GB embeddings at dim 64,
# comfortably under Spark's 8 GB broadcast cap and a production
# executor's memory. Above it, exactness stops being broadcastable and
# the LSH tier's measured recall curve (PLANS.md rounds 9/10/13) is
# the honest contract.
BROADCAST_KNN_CONF = "spark.linktransformer.merge.broadcastKnnThresholdBytes"
BROADCAST_KNN_DEFAULT_BYTES = 256 * 1024 * 1024

# pair-count budget for the exact_cross tier: the nested loop's cost
# is |L| x |R| PAIRS, which right-side bytes alone cannot see — a
# 360 KB right side crossed with a 20k-row left ran the interpreted
# fold for 24 minutes (round-13 measurement; ~6.5 us/pair through the
# non-codegen ArrayAggregate eval). Above this budget, auto escalates
# the exact band to the broadcast tier — the SAME matches from the
# numpy matmul in seconds. 30M pairs ~ 2-3 min worst-case interpreted,
# and keeps every reference-shaped merge (small curated right side,
# driver SFs) on the declarative plan.
EXACT_CROSS_MAX_PAIRS_CONF = "spark.linktransformer.merge.exactCrossMaxPairs"
EXACT_CROSS_MAX_PAIRS_DEFAULT = 30_000_000
# bytes/row for ROW-COUNT estimation from plan bytes: deliberately
# low (narrow projected relations measured ~36 B/row) so rows — and
# therefore pairs — are OVER-estimated; over-escalation lands on the
# broadcast tier, which is still exact, while under-escalation leaves
# a multi-minute nested loop in place.
EXACT_CROSS_EST_ROW_BYTES = 32

# recall/cost knobs of the lsh candidate stage, settable per session
# without threading new parameters through merge_knn (same stance as
# AUTO_LSH_CONF): plane count ('auto' = one per corpus doubling,
# max-side) and extra multi-probe buckets on the query side. The
# measured recall/wall curve lives in PLANS.md round 9.
LSH_PLANES_CONF = "spark.linktransformer.merge.lshPlanes"
LSH_EXTRA_CONF = "spark.linktransformer.merge.lshExtraProbes"
# OR-construction width for the lsh merge route: L independent plane
# sets (hash tables), candidates unioned + pair-deduped. Unset =
# derived from the corpus's bucket-occupancy skew (_auto_lsh_tables);
# an explicit int pins it.
LSH_TABLES_CONF = "spark.linktransformer.merge.lshTables"

# pair-count budget for the STRING (levenshtein) scorer's auto route:
# below it the declarative BroadcastNestedLoopJoin + codegen
# levenshtein is cheapest (and is the SQL-oracle-shaped plan); at or
# above it auto takes the exact in-kernel broadcast tier
# (_broadcast_lev_knn) — the JVM kernel measured ~2.8 us/pair at
# sf0.1 vs ~1.1 us/pair for the vectorized in-process scorer, and the
# kernel also removes the 15M-row candidate materialization + top-k
# aggregation from the plan. Unlike the cosine broadcast tier this
# kernel is BIT-identical to the declarative plan (integer distance,
# the same float64 division, the same (score DESC, id ASC) tie-break),
# so routing through it never trades exactness. 100k pairs keeps
# unit-test-sized inputs declarative while every driver SF exercises
# the kernel.
LEV_BROADCAST_MIN_PAIRS_CONF = "spark.linktransformer.merge.levBroadcastMinPairs"
LEV_BROADCAST_MIN_PAIRS_DEFAULT = 100_000


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate of a DataFrame (file sizes for
    scans, propagated through projections). Planning-time only — no job
    runs. None when unavailable: streaming relations, and plans whose
    stats are the Long.MaxValue "unknown" sentinel (python-RDD-backed
    createDataFrame relations report that). None means UNKNOWN, not
    small — auto_embedding_mode falls back to a count-based estimate
    rather than assuming broadcastability."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = int(size if isinstance(size, int) else size.toString())
        return None if size >= (1 << 60) else size
    except Exception:
        return None


# nominal bytes/row for the count-based fallback below: the routing
# threshold is a BYTE budget, so an unknown-stats relation's row count
# converts at a round text-ish width. Routing only needs the right
# ORDER OF MAGNITUDE — at the default 128 MB threshold this flips to
# lsh past ~1.3M right rows, far beyond exact_cross viability anyway.
AUTO_LSH_ROW_BYTES = 100


def _est_rows(df: DataFrame, size: int | None) -> int:
    """Row-count estimate for the pair budget: plan bytes over the
    deliberately-low EXACT_CROSS_EST_ROW_BYTES (over-estimates rows —
    the safe direction, see the constant's note), or a count when the
    stats are the unknown sentinel."""
    if size is None:
        size = plan_size_bytes(df)
    if size is None:
        return int(df.count())
    return max(1, size // EXACT_CROSS_EST_ROW_BYTES)


def auto_embedding_mode(right_raw: DataFrame,
                        allow_broadcast: bool = False,
                        left_raw: DataFrame | None = None) -> str:
    """Size-aware mode resolution for expression-embedding scorers —
    the auto LADDER (round 13): ``exact_cross`` while the right side
    is small enough to nested-loop-broadcast (<= ``AUTO_LSH_CONF``),
    then — when the caller allows it — the EXACT numpy
    ``broadcast_knn`` tier up to ``BROADCAST_KNN_CONF``, and only past
    that the approximate ``lsh`` tier (bucketed candidates + exact
    re-rank). Measured motivation: at 20k x 10k the interpreted
    nested loop runs 24 minutes and 2-table LSH recalls 0.71, while
    broadcast-knn is EXACT in seconds — the middle band deserves the
    exact answer it can afford. ``allow_broadcast=False`` (the
    default; merge_range, and merge_knn with blocking_vars) skips the
    middle tier: broadcast_knn emits exactly k rows per left row and
    scores the WHOLE right side, which breaks range-join semantics
    and silently ignores blocks.

    When Catalyst's size estimate is UNAVAILABLE (python-RDD-backed
    relations report the Long.MaxValue sentinel — plan_size_bytes
    returns None), the right side is COUNTED and sized at
    ``AUTO_LSH_ROW_BYTES`` per row instead of being assumed small:
    treating unknown as small sent a 10k-row RDD-backed corpus through
    the O(|L|*|R|) nested loop (measured round 13, the 24-minute
    cartesian) — a silent scale cliff for exactly the frames a user
    hands over without parquet-backed stats. The count is one cheap
    job on a relation the merge is about to scan repeatedly anyway,
    and runs only on the unknown-stats path."""
    spark = right_raw.sparkSession
    try:
        thresh = int(spark.conf.get(AUTO_LSH_CONF, str(AUTO_LSH_DEFAULT_BYTES)))
    except Exception:
        thresh = AUTO_LSH_DEFAULT_BYTES
    size = plan_size_bytes(right_raw)
    if size is None:
        size = right_raw.count() * AUTO_LSH_ROW_BYTES
    if size <= thresh:
        # the exact band — but bytes cannot see the nested loop's
        # |L| x |R| cost: above the pair budget, escalate to the
        # broadcast tier (SAME matches, numpy matmul, seconds instead
        # of the measured 24-minute interpreted fold). Callers that
        # cannot take the broadcast tier (range semantics, blocking)
        # keep the declarative plan unconditionally.
        if allow_broadcast and left_raw is not None:
            try:
                budget = int(spark.conf.get(
                    EXACT_CROSS_MAX_PAIRS_CONF,
                    str(EXACT_CROSS_MAX_PAIRS_DEFAULT)))
            except Exception:
                budget = EXACT_CROSS_MAX_PAIRS_DEFAULT
            pairs = _est_rows(left_raw, None) * _est_rows(right_raw, size)
            if pairs > budget:
                return "broadcast_knn"
        return "exact_cross"
    if allow_broadcast:
        try:
            bc = int(spark.conf.get(BROADCAST_KNN_CONF,
                                    str(BROADCAST_KNN_DEFAULT_BYTES)))
        except Exception:
            bc = BROADCAST_KNN_DEFAULT_BYTES
        if size <= bc:
            return "broadcast_knn"
    return "lsh"


def auto_lev_mode(left_raw: DataFrame, right_raw: DataFrame) -> str:
    """Auto routing for the string scorer (round 13): ``exact_cross``
    below the pair budget (tiny inputs — the declarative plan has the
    least overhead and IS the semantics definition), the exact
    in-kernel broadcast tier (`_broadcast_lev_knn`) when the pair
    count crosses ``LEV_BROADCAST_MIN_PAIRS_CONF`` and the right side
    fits the broadcast contract. Results are bit-identical either way
    (pytest-pinned + the full oracle drive), so this is purely a plan
    choice. A right side too big to collect keeps the declarative
    plan — there is no approximate string tier."""
    spark = right_raw.sparkSession
    size = plan_size_bytes(right_raw)
    if size is None:
        size = right_raw.count() * AUTO_LSH_ROW_BYTES
    try:
        bc = int(spark.conf.get(BROADCAST_KNN_CONF,
                                str(BROADCAST_KNN_DEFAULT_BYTES)))
    except Exception:
        bc = BROADCAST_KNN_DEFAULT_BYTES
    if size > bc:
        return "exact_cross"
    try:
        budget = int(spark.conf.get(LEV_BROADCAST_MIN_PAIRS_CONF,
                                    str(LEV_BROADCAST_MIN_PAIRS_DEFAULT)))
    except Exception:
        budget = LEV_BROADCAST_MIN_PAIRS_DEFAULT
    pairs = _est_rows(left_raw, None) * _est_rows(right_raw, size)
    return "broadcast_knn" if pairs >= budget else "exact_cross"


def max_count_one_job(left: DataFrame, right: DataFrame) -> int:
    """max(|left|, |right|) as ONE Spark job — the two aggregate scans
    run as parallel stages of a single action instead of two serial
    driver round-trips (each count was ~0.3s of pure latency on the
    auto-routing path)."""
    return int(
        left.groupBy().count()
        .unionAll(right.groupBy().count())
        .agg(F.max("count").alias("m")).first()["m"]
    )


# Decision memo for ensure_parallelism, keyed on (analyzed-plan
# semanticHash, target): the probe behind the decision costs real
# driver time (physical planning + a partition count), and operators
# re-run it for every construction of the same query (bench reruns,
# serving loops, multi-operator pipelines over one relation). The
# memoized value is a PLAN-SHAPE decision (spread or not), never data
# or results. Staleness window: a path overwritten with different
# data inside one session reuses the old decision — a task-count
# KNOB, never correctness (the repartition is semantically neutral
# both ways). Index writers expire it via
# ``tombstones.refresh_index_path`` (same contract as the LSH width
# memo). FIFO-bounded.
_SPREAD_MEMO: dict = {}
_SPREAD_MEMO_MAX = 512


def clear_spread_memo() -> None:
    """Drop every memoized spread decision (see ``_SPREAD_MEMO``).
    Called by ``tombstones.refresh_index_path`` alongside
    ``clear_auto_tables_memo``."""
    _SPREAD_MEMO.clear()


def _est_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the task count of a SHUFFLE-FREE plan from its leaf
    relations' Catalyst byte statistics, replicating
    ``FilePartition.maxSplitBytes`` arithmetic — planning-time only,
    no job, no RDD. ``df.rdd.getNumPartitions()`` (the previous probe)
    physically plans the subtree and materializes its broadcast
    exchanges: measured 135-290 ms on a bare sf0.1 scan and 2.0-5.4 s
    on a union-with-broadcast-join input, PER CONSTRUCTION — it was
    the single largest driver-floor component (guide §5: the driver
    should do almost no work). The estimate only has to land on the
    right side of ``< target``; a miss adds or skips one round-robin
    exchange and never changes results. Returns None (caller falls
    back to the exact probe) when any leaf reports the unknown-stats
    sentinel or is RDD-backed (checkpointed inputs — their .rdd probe
    is cheap: the plan is already physical)."""
    try:
        jss = df.sparkSession._jsparkSession
        sql_conf = jss.sessionState().conf()
        max_pb = int(sql_conf.filesMaxPartitionBytes())
        open_cost = int(sql_conf.filesOpenCostInBytes())
        dp = df.sparkSession.sparkContext.defaultParallelism
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        sizes = []
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            cls = leaf.getClass().getSimpleName()
            if cls == "Range":
                # Range parallelizes to defaultParallelism by itself;
                # its tiny byte size would misread as one split
                sizes.append(None)
                continue
            if cls == "LogicalRDD":
                return None  # partitioning lives on the RDD; ask it
            s = leaf.stats().sizeInBytes()
            s = int(s if isinstance(s, int) else s.toString())
            if s >= (1 << 60):
                return None  # unknown sentinel
            sizes.append(s)
        if not sizes:
            return None
        byte_sizes = [s for s in sizes if s is not None]
        total = sum(byte_sizes) + open_cost * len(byte_sizes)
        bytes_per_core = max(1, total // max(1, dp))
        max_split = min(max_pb, max(open_cost, bytes_per_core))
        est = sum(
            max(1, -(-(s + open_cost) // max_split)) for s in byte_sizes
        )
        est += dp * sum(1 for s in sizes if s is None)  # Range leaves
        return est
    except Exception:  # noqa: BLE001 — sizing probe must never break the plan
        return None


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition up to cluster parallelism when the input
    arrives under-partitioned.

    Load-bearing at both ends of the scale: a small reference table read
    from one parquet file plans as ONE partition, and every downstream
    broadcast join / mapInPandas inherits that — the O(|L|·|R|) scoring
    stage then runs on a single core (measured 32x slowdown at sf0.1).
    At real scale inputs already have >= target partitions and this is a
    no-op. User-specified repartition counts are exempt from AQE
    coalescing, so the fan-out survives adaptive re-planning.
    """
    if df.isStreaming:
        # partitioning of a stream is governed by the source +
        # shuffle settings; .rdd/plan probes are illegal here
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    key = None
    try:
        key = (
            int(df._jdf.queryExecution().analyzed().semanticHash()),
            target,
        )
        need = _SPREAD_MEMO.get(key)
        if need is not None:
            return df.repartition(target) if need else df
    except Exception:  # noqa: BLE001 — memo must never break the plan
        pass
    need = _needs_spread(df, target)
    if key is not None:
        if len(_SPREAD_MEMO) >= _SPREAD_MEMO_MAX:
            _SPREAD_MEMO.pop(next(iter(_SPREAD_MEMO)))
        _SPREAD_MEMO[key] = need
    return df.repartition(target) if need else df


def _needs_spread(df: DataFrame, target: int) -> bool:
    """The probe behind :func:`ensure_parallelism`, un-memoized."""
    try:
        # A SHUFFLE exchange in the plan means downstream parallelism is
        # already spark.sql.shuffle.partitions — nothing to fix, and
        # calling .rdd would materialize AQE query stages (execute the
        # subplan!) just to count partitions. NB a BroadcastExchange is
        # NOT a shuffle: its probe side keeps the scan's partitioning,
        # which is exactly the 1-partition case this guard exists for.
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if (
            "Exchange hashpartitioning" in plan
            or "Exchange rangepartitioning" in plan
            or "Exchange RoundRobinPartitioning" in plan
            or "Exchange SinglePartition" in plan
        ):
            return False
    except Exception:
        pass
    # shuffle-free plan (scan + maps [+ broadcast build]): task count
    # follows from the leaf scans' sizes — estimate without touching
    # the RDD (which would execute broadcast builds just to count).
    est = _est_scan_partitions(df)
    if est is not None:
        return est < target
    return df.rdd.getNumPartitions() < target


@dataclass
class CosineScorer:
    """score = dot of L2-normalized embeddings (== cosine)."""

    encoder: Encoder

    def prepare(self, df: DataFrame, key_col: str, emb_col: str) -> DataFrame:
        if self.encoder.expression_based:
            return self.encoder.encode(df, key_col, emb_col)
        return self.encoder.encode_distinct(df, key_col, emb_col)

    def score(self) -> Column:
        return S.dot(F.col(LEFT_EMB), F.col(RIGHT_EMB))

    needs_embeddings = True
    # score() IS the plain normalized-dot kernel — lets the LSH path
    # swap in the bit-equal numpy re-score (bucket_dot_rescored_pairs)
    score_is_dot = True


@dataclass
class LevenshteinScorer:
    """score = 1 - lev/maxlen on the serialized keys (ASCII-exact vs
    the DuckDB oracle; see functions/similarity.lev_sim)."""

    def prepare(self, df: DataFrame, key_col: str, emb_col: str) -> DataFrame:
        return df

    def score(self) -> Column:
        return S.lev_sim(F.col(LEFT_KEY), F.col(RIGHT_KEY))

    needs_embeddings = False


def resolve_scorer(model) -> "CosineScorer | LevenshteinScorer":
    """model="levenshtein" -> string scorer; anything else -> encoder
    cosine (see encoders.base.resolve_encoder)."""
    if isinstance(model, (CosineScorer, LevenshteinScorer)):
        return model
    if isinstance(model, str) and model == "levenshtein":
        return LevenshteinScorer()
    from ..encoders.base import resolve_encoder

    return CosineScorer(resolve_encoder(model))


def candidate_scores(
    left: DataFrame,
    right: DataFrame,
    scorer,
    block_on: list[tuple[str, str]] | None = None,
    mode: Mode = "exact_cross",
    threshold: float | None = None,
    k: int | None = None,
) -> DataFrame:
    """Score left x right candidates.

    ``left`` must carry LEFT_ID/LEFT_KEY (and LEFT_EMB if embedding
    scorer); same for right. Returns columns of both inputs plus
    ``score``. ``block_on`` is a list of (left_col, right_col) equality
    pairs that turn the cross join into an equi-join (Catalyst then
    hash-partitions instead of nested-looping — blocking IS partition
    pruning, SURVEY §4).
    """
    if mode == "broadcast_knn":
        if not getattr(scorer, "needs_embeddings", False):
            return _broadcast_lev_knn(left, right, block_on=block_on,
                                      k=k or 1)
        return _broadcast_knn(left, right, scorer, block_on=block_on, k=k or 1)
    if mode == "lsh":
        return _lsh_candidates(left, right, scorer, block_on=block_on, threshold=threshold, k=k)

    cond = None
    for lc, rc in block_on or []:
        eq = left[lc].eqNullSafe(right[rc])
        cond = eq if cond is None else (cond & eq)
    joined = left.join(right, cond, "inner") if cond is not None else left.crossJoin(right)
    joined = joined.withColumn("score", scorer.score())
    if threshold is not None:
        joined = joined.filter(F.col("score") >= F.lit(threshold))
    return joined


def topk(df: DataFrame, k: int, extra_partition: list[str] | None = None) -> DataFrame:
    """Deterministic per-left-row top-k: row_number over
    (score DESC, right_id ASC). One shuffle on left_id; with AQE the
    partial sort is map-side. Adds ``_lt_rank``."""
    w = Window.partitionBy(LEFT_ID, *(extra_partition or [])).orderBy(
        F.col("score").desc(), F.col(RIGHT_ID).asc()
    )
    return df.withColumn("_lt_rank", F.row_number().over(w)).filter(
        F.col("_lt_rank") <= k
    )


def top1(df: DataFrame) -> DataFrame:
    """Exact top-1 per left row as ONE hash aggregation:
    ``max(struct(score, -right_id))`` is lexicographic, so its winner is
    exactly ORDER BY score DESC, right_id ASC — the same deterministic
    tie-break as ``topk``. Returns the narrow (LEFT_ID, RIGHT_ID, score).

    Why not the window: WindowExec (and its sort) is row-at-a-time —
    no whole-stage codegen — and processes EVERY candidate row; measured
    5.2s vs 0.7s for this aggregation on the 15M-candidate sf0.1 1-NN
    join. The aggregation also partial-aggregates map-side, so the
    shuffle carries |L| rows regardless of candidate count — the window
    form needs a pre-partitioned left to avoid shuffling candidates.
    k=1 is the reference's flagship ``merge`` shape, worth the special
    case; k>1 keeps the sort-based window (a collect_list/slice
    aggregation measured 9x WORSE than the window at k=3: agg buffers
    materialize every candidate)."""
    m = F.max(
        F.struct(F.col("score").alias("s"), (-F.col(RIGHT_ID)).alias("nr"))
    ).alias("_m")
    return df.groupBy(LEFT_ID).agg(m).select(
        F.col(LEFT_ID),
        (-F.col("_m.nr")).alias(RIGHT_ID),
        F.col("_m.s").alias("score"),
    )


def _lev_codepoint_matrix(lkeys, rkeys):
    """Exact CODE-POINT levenshtein distance matrix (n, m) int64 — the
    unicode-correct fallback of `_broadcast_lev_knn` (and its
    executable spec). A numpy DP vectorized over pairs: strings are
    padded into uint32 code-point arrays, the DP walks the padded
    length, and each row's answer is snapshotted at its own (la, lb).
    The inner column loop's D[j] = min(M[j], D[j-1]+1) dependency is
    the prefix-min identity D[j] = j + running_min(M[j] - j), so one
    np.minimum.accumulate replaces it."""
    import numpy as np

    def enc(keys):
        lens = np.array([len(s) for s in keys], dtype=np.int64)
        L = max(1, int(lens.max()) if len(lens) else 1)
        out = np.zeros((len(keys), L), dtype=np.uint32)
        for i, s in enumerate(keys):
            if s:
                out[i, : len(s)] = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                )
        return out, lens

    Ae, Al = enc(lkeys)
    Be, Bl = enc(rkeys)
    n, m = len(lkeys), len(rkeys)
    D = np.empty((n, m), dtype=np.int64)
    # chunk left rows so the pair-DP state stays ~tens of MB
    chunk = max(1, 200_000 // max(1, m))
    for s in range(0, n, chunk):
        idx = np.arange(s, min(s + chunk, n))
        P = len(idx) * m
        ae = np.repeat(Ae[idx], m, axis=0)
        al = np.repeat(Al[idx], m)
        be = np.tile(Be, (len(idx), 1))
        bl = np.tile(Bl, len(idx))
        La, Lb = ae.shape[1], be.shape[1]
        jj = np.arange(Lb + 1, dtype=np.int32)
        Dp = np.broadcast_to(jj, (P, Lb + 1)).astype(np.int32)
        out = np.empty(P, dtype=np.int32)
        zero = al == 0
        out[zero] = bl[zero]
        rows = np.arange(P)
        for i in range(1, La + 1):
            cost = (ae[:, i - 1 : i] != be).astype(np.int32)
            M = np.empty((P, Lb + 1), dtype=np.int32)
            M[:, 0] = i
            np.minimum(Dp[:, 1:] + 1, Dp[:, :-1] + cost, out=M[:, 1:])
            Mj = M - jj
            np.minimum.accumulate(Mj, axis=1, out=Mj)
            Dp = Mj + jj
            hit = al == i
            if hit.any():
                out[hit] = Dp[rows[hit], bl[hit]]
        D[idx] = out.reshape(len(idx), m)
    return D


def _broadcast_lev_knn(left, right, block_on=None, k: int = 1) -> DataFrame:
    """Exact levenshtein top-k with the right side closure-shipped —
    the string scorer's broadcast tier. Per Arrow batch, the full
    distance block (batch x right) is computed by an in-process
    vectorized scorer: DuckDB's C++ `levenshtein` when every key on
    both sides is ASCII (DuckDB counts UTF-8 BYTES, Spark counts code
    points — equal exactly on ASCII), the exact code-point numpy DP
    otherwise. Scores and selection are then BIT-identical to the
    declarative lev_sim plan: the distance is an exact integer, the
    score is the same float64 `1 - d / max(la, lb, 1)` division, and
    top-k uses the same (score DESC, right_id ASC) tie-break (ids
    pre-sorted ascending + stable argsort, the `_broadcast_knn`
    discipline). Returns (left columns..., RIGHT_ID, score) — exactly
    k rows per left row (fewer only when |right| < k); callers apply
    any threshold as a post-filter (rank-then-filter ≡ the
    declarative filter-then-rank, see merge).

    The right side is the bounded, collected side — same contract as
    `_broadcast_knn` (raise `LEV_BROADCAST_MIN_PAIRS_CONF` thresholds
    rather than shipping an unbounded relation here)."""
    import numpy as np
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    if block_on:
        raise NotImplementedError(
            "broadcast_knn with blocking: use mode='exact_cross'"
        )
    rows = right.select(RIGHT_ID, RIGHT_KEY).collect()
    r_ids = np.array([r[0] for r in rows], dtype="int64")
    r_keys = ["" if r[1] is None else r[1] for r in rows]
    order = np.argsort(r_ids)  # ids ascending = the tie-break order
    r_ids = r_ids[order]
    r_keys = [r_keys[i] for i in order]
    r_ascii = all(s.isascii() for s in r_keys)
    r_lens = np.array([len(s) for s in r_keys], dtype=np.int64)
    spark = left.sparkSession
    b = spark.sparkContext.broadcast((r_ids, r_keys, r_ascii, r_lens))

    left_schema = left.schema
    out_schema = StructType(
        list(left_schema.fields)
        + [StructField(RIGHT_ID, LongType()), StructField("score", DoubleType())]
    )
    kk = k

    def gen(batches):
        import duckdb
        import pandas as pd

        ids, keys, ascii_ok, blens = b.value
        m = len(ids)
        take = min(kk, m)
        if take == 0:
            return
        con = None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lkeys = ["" if s is None else s for s in pdf[LEFT_KEY].tolist()]
            llens = np.array([len(s) for s in lkeys], dtype=np.int64)
            if ascii_ok and all(s.isascii() for s in lkeys):
                if con is None:  # once per task; right table registered once
                    con = duckdb.connect()
                    con.execute("SET threads TO 1")  # Spark owns parallelism
                    con.register(
                        "rt", pd.DataFrame(
                            {"j": np.arange(m, dtype=np.int64), "k": keys}
                        )
                    )
                con.register(
                    "lt", pd.DataFrame(
                        {"i": np.arange(n, dtype=np.int64), "k": lkeys}
                    )
                )
                res = con.execute(
                    "SELECT l.i, r.j, levenshtein(l.k, r.k) AS d "
                    "FROM lt l CROSS JOIN rt r"
                ).fetchnumpy()
                D = np.empty((n, m), dtype=np.int64)
                D[res["i"], res["j"]] = res["d"]
            else:
                D = _lev_codepoint_matrix(lkeys, keys)
            denom = np.maximum(np.maximum(llens[:, None], blens[None, :]), 1)
            scores = 1.0 - D / denom.astype(np.float64)
            idx = np.argsort(-scores, axis=1, kind="stable")[:, :take]
            out = pdf.loc[pdf.index.repeat(take)].reset_index(drop=True)
            out[RIGHT_ID] = ids[idx].reshape(-1)
            out["score"] = np.take_along_axis(scores, idx, axis=1).reshape(-1)
            yield out

    return left.mapInPandas(gen, schema=out_schema)


def _broadcast_knn(left, right, scorer, block_on=None, k: int = 1) -> DataFrame:
    """Exact kNN with the right side broadcast; numpy matmul per Arrow
    batch. Returns (left columns..., RIGHT_ID, score); caller joins the
    right columns back by id (one broadcast hash join when right is
    small — which it must be for this mode).

    NOTE scores are float64 matmul results; they can differ from the
    declarative path in the last ulp, so this mode is for performance
    paths, not oracle comparisons (SURVEY §7 hard-part 6).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if not getattr(scorer, "needs_embeddings", False):
        raise ValueError("broadcast_knn requires an embedding-based scorer")
    if block_on:
        raise NotImplementedError("broadcast_knn with blocking: use mode='exact_cross'")

    enc = getattr(scorer, "encoder", None)
    batch_encoder = enc if enc is not None and hasattr(enc, "encode_batch") else None

    if batch_encoder is not None:
        # Ship KEY STRINGS, embed inside the stage: the right side's
        # vectors come from one narrow (id, key) collect + a driver-side
        # encode_batch, and the left side embeds per Arrow batch in the
        # same task that scores it. Catalyst then PRUNES the relational
        # encode subplans of both sides entirely (they feed only the
        # emb columns nobody reads) — at sf0.1 that removes ~4 shuffle
        # stages from the critical path, and at scale it ships strings
        # instead of dim-sized vectors through the scan.
        rows = right.select(RIGHT_ID, RIGHT_KEY).collect()
        r_ids = np.array([r[0] for r in rows], dtype="int64")
        r_mat = batch_encoder.encode_batch([r[1] for r in rows])
        left = left.drop(LEFT_EMB)
    else:
        rows = right.select(RIGHT_ID, RIGHT_EMB).collect()
        r_ids = np.array([r[0] for r in rows], dtype="int64")
        r_mat = np.array([r[1] for r in rows], dtype="float64")  # (m, d), normalized
    order = np.argsort(r_ids)  # tie-break prep: ids ascending
    r_ids, r_mat = r_ids[order], r_mat[order]
    spark = left.sparkSession
    b = spark.sparkContext.broadcast((r_ids, r_mat))

    left_schema = left.schema
    out_schema = StructType(
        list(left_schema.fields)
        + [StructField(RIGHT_ID, LongType()), StructField("score", DoubleType())]
    )
    kk = k
    use_batch_enc = batch_encoder is not None

    def gen(batches):
        ids, mat = b.value
        m = len(ids)
        take = min(kk, m)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if use_batch_enc:
                q = batch_encoder.encode_batch(pdf[LEFT_KEY].tolist())  # (n, d)
            else:
                q = np.array(pdf[LEFT_EMB].tolist(), dtype="float64")  # (n, d)
            scores = q @ mat.T  # (n, m)
            # top-k with deterministic tie-break: argsort on (-score, id-order)
            # ids are ascending, and np.argsort is stable -> sorting by
            # -score alone keeps id order among exact ties.
            idx = np.argsort(-scores, axis=1, kind="stable")[:, :take]
            n = len(pdf)
            out = pdf.loc[pdf.index.repeat(take)].reset_index(drop=True)
            out[RIGHT_ID] = ids[idx].reshape(-1)
            out["score"] = np.take_along_axis(scores, idx, axis=1).reshape(-1)
            yield out

    return left.mapInPandas(gen, schema=out_schema)


def bucket_dot_self_pairs(
    assigned: DataFrame,
    group_col: str,
    id_col: str,
    emb_col: str,
    threshold: float,
    flops_per_chunk: int = 4_000_000,
) -> DataFrame:
    """The SELF-join twin of :func:`bucket_dot_rescored_pairs`: within
    each ``group_col`` group, emit every (src < dst by ``id_col``)
    pair with left-assoc dot >= ``threshold`` — the SemDeDup within-
    cell pair stage without the join + interpreted per-pair fold.
    Returns ``(src, dst, group_col, cosine)``; bit-equal to
    ``l JOIN r ON cell AND l.id < r.id`` + the ``S.dot`` fold (same
    accumulation rules; duplicate ids produce no self-pair, exactly
    like the strict ``<`` join condition). Each row's vector crosses
    Arrow once per group; the (chunk x group) score matrix is bounded
    by ``flops_per_chunk``; group residency is bounded by the caller's
    cell-sizing rule (auto cells target ~256 rows)."""
    itype = assigned.schema[id_col].dataType.simpleString()
    gtype = assigned.schema[group_col].dataType.simpleString()
    out_schema = (
        f"src {itype}, dst {itype}, {group_col} {gtype}, cosine double"
    )
    thr = float(threshold)

    def fn(pdf):
        import numpy as np
        import pandas as pd

        def empty():
            return pd.DataFrame({
                "src": pdf[id_col].iloc[:0],
                "dst": pdf[id_col].iloc[:0],
                group_col: pdf[group_col].iloc[:0],
                "cosine": np.empty(0, dtype=np.float64),
            })

        n = len(pdf)
        if n < 2:
            return empty()
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        V = np.array(pdf[emb_col].tolist(), dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        gval = pdf[group_col].iloc[0]
        chunk = max(1, min(4096, flops_per_chunk // n))
        parts = []
        for s0 in range(0, n, chunk):
            Vc = V[s0:s0 + chunk]
            acc = np.zeros((Vc.shape[0], n), dtype=np.float64)
            for j in range(V.shape[1]):
                acc += Vc[:, j:j + 1] * V[:, j]
            li, ri = np.nonzero(acc >= thr)
            # strict id order, not position order: equal ids (if the
            # caller ever ships duplicates) pair with NOTHING — the
            # join form's l.id < r.id contract
            keep = ids[s0 + li] < ids[ri]
            li, ri = li[keep], ri[keep]
            if len(li):
                parts.append(pd.DataFrame({
                    "src": ids[s0 + li],
                    "dst": ids[ri],
                    group_col: gval,
                    "cosine": acc[li, ri],
                }))
        if not parts:
            return empty()
        return pd.concat(parts, ignore_index=True)

    return assigned.groupBy(group_col).applyInPandas(fn, schema=out_schema)


def bucket_dot_self_pairs_salted(
    assigned: DataFrame,
    group_col: str,
    id_col: str,
    emb_col: str,
    threshold: float,
    salt_base: int = 1 << 20,
    flops_per_chunk: int = 4_000_000,
) -> DataFrame:
    """The SALTED twin of :func:`bucket_dot_self_pairs`: within each
    ``(group_col, _salt)`` salt CELL, emit every (src < dst) pair with
    left-assoc dot >= ``threshold`` under the triangle-salt pair rule
    — in an OFF-DIAGONAL cell (i != j in ``_salt = i*salt_base + j``)
    the endpoints must come from the two different sub-groups
    (``_sg``), so every uncapped pair is emitted exactly once (the
    ``_salt_pair_cond`` join's own guarantee; both operands of that
    per-pair predicate live INSIDE the salt cell, which is what makes
    the group-local kernel legal). Bit-equal to the salted self-join +
    interpreted ``S.dot`` fold (same accumulation rules, same strict
    ``<`` id order); per-group residency is bounded at ~2*cap rows by
    the caller's :func:`~.dedup._cap_buckets` salt sizing."""
    itype = assigned.schema[id_col].dataType.simpleString()
    gtype = assigned.schema[group_col].dataType.simpleString()
    out_schema = (
        f"src {itype}, dst {itype}, {group_col} {gtype}, cosine double"
    )
    thr = float(threshold)
    base = int(salt_base)

    def fn(pdf):
        import numpy as np
        import pandas as pd

        def empty():
            return pd.DataFrame({
                "src": pdf[id_col].iloc[:0],
                "dst": pdf[id_col].iloc[:0],
                group_col: pdf[group_col].iloc[:0],
                "cosine": np.empty(0, dtype=np.float64),
            })

        n = len(pdf)
        if n < 2:
            return empty()
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        V = np.array(pdf[emb_col].tolist(), dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        sg = pdf["_sg"].to_numpy(dtype=np.int64)
        salt = int(pdf["_salt"].iloc[0])
        diag = (salt // base) == (salt % base)
        gval = pdf[group_col].iloc[0]
        chunk = max(1, min(4096, flops_per_chunk // n))
        parts = []
        for s0 in range(0, n, chunk):
            Vc = V[s0:s0 + chunk]
            acc = np.zeros((Vc.shape[0], n), dtype=np.float64)
            for j in range(V.shape[1]):
                acc += Vc[:, j:j + 1] * V[:, j]
            li, ri = np.nonzero(acc >= thr)
            keep = ids[s0 + li] < ids[ri]
            if not diag:
                keep &= sg[s0 + li] != sg[ri]
            li, ri = li[keep], ri[keep]
            if len(li):
                parts.append(pd.DataFrame({
                    "src": ids[s0 + li],
                    "dst": ids[ri],
                    group_col: gval,
                    "cosine": acc[li, ri],
                }))
        if not parts:
            return empty()
        return pd.concat(parts, ignore_index=True)

    return assigned.groupBy(group_col, "_salt").applyInPandas(
        fn, schema=out_schema
    )


def bucket_dot_rescored_pairs(
    lb: DataFrame,
    rb: DataFrame,
    keys: list[str],
    left_id: str = LEFT_ID,
    right_id: str = RIGHT_ID,
    left_emb: str = LEFT_EMB,
    right_emb: str = RIGHT_EMB,
    threshold: float | None = None,
    k: int | None = None,
    carry_right: list[str] | None = None,
    flops_per_chunk: int = 4_000_000,
    exclude_equal_ids: bool = False,
    encoder=None,
    left_key_col: str | None = None,
    right_key_col: str | None = None,
) -> DataFrame:
    """Exact dot re-score of an LSH bucket join, as ONE Arrow-batched
    cogroup instead of join + per-pair expression fold.

    The declarative form (equi-join on the bucket, then the
    ``S.dot`` fold per candidate row) is the measured constant-factor
    floor of every LSH path: higher-order functions are
    CodegenFallback, and in the shuffled-join stages they land in, the
    fold runs ~7 µs per candidate row (vs ~0.5 µs in compiled BNLJ
    stages) — a 14x tax on candidates x rescore (PLANS.md round 9).
    This replica moves the re-score into ``applyInPandas`` over the
    bucket cogroup: each row's embedding crosses Arrow ONCE PER BUCKET
    OCCURRENCE (not once per pair — the transfer-bound failure of the
    earlier per-pair pandas_udf attempt), the (chunk x bucket) score
    matrix is vectorized numpy, and the emitted pair row is ~24 bytes.

    Float parity (the established in-repo replica rules, same as the
    streaming minhash/semdedup twins): scores accumulate PER DIMENSION
    left-associated from 0.0 — ``acc += L[:, j] * R[:, j]`` for j in
    order — which rounds every product and partial sum exactly like
    the ``aggregate(zip_with(...))`` fold, so results are bit-equal to
    the Column path (property-pinned in test_properties).

    ``keys``: cogroup columns (the bucket id, plus any blocking
    columns — grouping matches null==null, i.e. exactly eqNullSafe
    blocking semantics). ``threshold``: emit only pairs with
    score >= threshold. ``k``: per-left-row IN-GROUP top-k
    (score DESC, right_id ASC [, carry_right ASC]) — safe pre-pruning
    for a downstream global top-k under the same order: any dropped
    candidate has k group-mates strictly preferred to it, so its
    global rank exceeds k; and threshold-then-topk == topk-then-
    threshold because both keep high scores. ``carry_right``: extra
    right-side columns to emit per surviving pair (e.g. a tie-break
    key). Returns (left_id, right_id, *carry_right, score).

    Memory is bounded: the score matrix is chunked to
    ``flops_per_chunk`` cells (~32 MB at the default), so a hot bucket
    costs more chunks, never more resident memory. The cogroup itself
    materializes one (bucket-rows x dim) pandas frame per side per
    group — bounded by the CALLERS' bucket-sizing rules (auto planes /
    auto cells target ~32-256 rows per bucket and grow one bit per
    corpus doubling; the skew guards cap or salt the hot tail), which
    is the same contract the join form's per-task memory relied on.

    ``exclude_equal_ids``: drop pairs with left_id == right_id BEFORE
    the in-group top-k (the leave-one-out contract — excluding in the
    candidate stage, not post-filtering a k+1 list, keeps semantics
    exact when duplicate vectors tie with the self at cosine 1.0).

    ``encoder`` + ``left_key_col``/``right_key_col``: IN-KERNEL
    embedding — the inputs carry the raw KEY STRINGS instead of
    ``left_emb``/``right_emb`` arrays, and each cogroup batch embeds
    them with ``encoder.encode_batch`` (the bit-identical numpy mirror
    of the relational encode — see encoders/hash_ngram.py). The bucket
    cogroup then shuffles ~25-byte strings instead of dim x 8-byte
    arrays (~20x narrower at dim=64), and the relational encode
    subplan (distinct + explode + wide aggregate + join-back, 2-3
    exchanges per side) disappears entirely [guide §2.3 "shuffle keys
    and metadata instead of payloads", §4.2].
    """
    carry = list(carry_right or [])
    lsch, rsch = lb.schema, rb.schema
    out_schema = ", ".join(
        [f"{left_id} {lsch[left_id].dataType.simpleString()}",
         f"{right_id} {rsch[right_id].dataType.simpleString()}"]
        + [f"{c} {rsch[c].dataType.simpleString()}" for c in carry]
        + ["score double"]
    )
    thr = threshold
    kk = k
    r_order = [right_id] + carry

    def fn(l_pdf, r_pdf):
        import numpy as np
        import pandas as pd

        def emit(lid, rid, cols, sc):
            out = {left_id: lid, right_id: rid}
            for name, vals in zip(carry, cols):
                out[name] = vals
            out["score"] = sc
            return pd.DataFrame(out)

        if len(l_pdf) == 0 or len(r_pdf) == 0:
            return emit(
                l_pdf[left_id].iloc[:0], r_pdf[right_id].iloc[:0],
                [r_pdf[c].iloc[:0] for c in carry],
                np.empty(0, dtype=np.float64),
            )
        # right rows in (right_id [, carry]) ASC order, so a STABLE
        # argsort on -score yields exactly the downstream tie-break
        r_pdf = r_pdf.sort_values(r_order, kind="mergesort").reset_index(
            drop=True
        )
        if encoder is not None:
            R = encoder.encode_batch(r_pdf[right_key_col].tolist())
        else:
            R = np.array(r_pdf[right_emb].tolist(), dtype=np.float64)
        nr = len(r_pdf)
        rid_arr = r_pdf[right_id].to_numpy()
        carry_arrs = [r_pdf[c].to_numpy() for c in carry]
        l_ids = l_pdf[left_id].to_numpy()
        L_all = l_pdf[
            left_key_col if encoder is not None else left_emb
        ].tolist()
        chunk = max(1, min(4096, flops_per_chunk // max(nr, 1)))
        parts = []
        for s0 in range(0, len(l_pdf), chunk):
            if encoder is not None:
                Lc = encoder.encode_batch(L_all[s0:s0 + chunk])
            else:
                Lc = np.array(L_all[s0:s0 + chunk], dtype=np.float64)
            nl = Lc.shape[0]
            acc = np.zeros((nl, nr), dtype=np.float64)
            for j in range(Lc.shape[1]):
                acc += Lc[:, j:j + 1] * R[:, j]
            self_mask = None
            if exclude_equal_ids:
                self_mask = (
                    l_ids[s0:s0 + nl, None] == rid_arr[None, :]
                )
            if kk is not None:
                take = min(kk, nr)
                # exclusion BEFORE the top-k selection: masked pairs
                # rank to the bottom; the kept pairs' emitted scores
                # are the untouched true accumulations
                sel = acc if self_mask is None else np.where(
                    self_mask, -np.inf, acc
                )
                idx = np.argsort(-sel, axis=1, kind="stable")[:, :take]
                sc = np.take_along_axis(sel, idx, axis=1)
                li = np.repeat(np.arange(nl), take)
                ri = idx.reshape(-1)
                sc = sc.reshape(-1)
                keep = np.isfinite(sc)
                if thr is not None:
                    keep &= sc >= thr
                li, ri, sc = li[keep], ri[keep], sc[keep]
            else:
                if thr is not None:
                    ok = acc >= thr
                else:
                    ok = np.ones_like(acc, dtype=bool)
                if self_mask is not None:
                    ok &= ~self_mask
                li, ri = np.nonzero(ok)
                sc = acc[li, ri]
            if len(li):
                parts.append(emit(
                    l_ids[s0 + li], rid_arr[ri],
                    [a[ri] for a in carry_arrs], sc,
                ))
        if not parts:
            return emit(
                l_pdf[left_id].iloc[:0], r_pdf[right_id].iloc[:0],
                [r_pdf[c].iloc[:0] for c in carry],
                np.empty(0, dtype=np.float64),
            )
        return pd.concat(parts, ignore_index=True)

    return (
        lb.groupBy(*keys)
        .cogroup(rb.groupBy(*keys))
        .applyInPandas(fn, schema=out_schema)
    )


# memo for _auto_lsh_tables, keyed on (right plan semanticHash, dim,
# planes, probes): the derivation triggers the corpus ENCODE (~1.5s
# even on a 1k-row bench corpus — measured round 13), and a session
# that merges repeatedly against the same corpus (bench's warm+timed
# runs, production ingest loops) would pay it per call. Staleness
# window: a path overwritten with different data inside one session
# reuses the old width — a recall/cost KNOB, never correctness, and
# the standing remedy (new session or explicit LSH_TABLES_CONF)
# matches the documented conf contract. FIFO-bounded.
_AUTO_TABLES_MEMO: dict = {}
_AUTO_TABLES_MEMO_MAX = 256


def clear_auto_tables_memo() -> None:
    """Drop every memoized LSH table-width derivation. Called by
    ``tombstones.refresh_index_path`` — the hook every index writer
    already runs after mutating stored data — so a mutation in-session
    can never serve a stale width (round-13 verdict's de-gray item: the
    memo keys on PLAN identity, which an overwrite at the same path
    preserves). Arbitrary non-index parquet overwrites remain the
    documented staleness window; ``LSH_TABLES_CONF`` pins the width
    explicitly when that matters, and bench.py times a cold-memo twin
    (``merge_knn_auto_cold``) so the derivation cost stays visible."""
    _AUTO_TABLES_MEMO.clear()


def _auto_lsh_tables(right, dim: int, n_planes: int, n_extra: int) -> int:
    """Derive the OR-construction width (hash-table count) from the
    corpus's bucket-occupancy profile — the round-12 verdict's recall
    item: ``auto`` must reach recall >= 0.9 on spread corpora without
    paying for redundant tables on degenerate ones.

    The statistic: expected co-residency mass of a probe,
    ``(1 + n_extra) * (sum occ^2 / n) / n`` — the occupancy-weighted
    mean bucket share times the probe count. Measured on the two bench
    shapes (round 13): the TPC-H digit-name corpus COLLAPSES into 4 of
    128 buckets (coverage 1.44 — each query's probes already sweep the
    corpus, single-table recall 0.985, extra tables pure waste); the
    Zipf-title corpus spreads across every bucket (coverage 0.32,
    single-table recall 0.826). When probing covers the corpus
    (coverage >= 1) one table is exact-enough; when buckets genuinely
    separate (< 1) a second independent plane set lifts recall
    1-(1-p)^2 — measured 0.826 -> 0.96+ on the Zipf shape (PLANS.md
    round 10 sweep) at 2x candidate cost. Wider L stays an explicit
    choice (``LSH_TABLES_CONF``): tripling every large merge's
    candidate volume is not a defensible default when per-shape recall
    is unmeasured.

    Cost: ONE narrow plan-time aggregation over the corpus (bucket id
    -> map-side-combined count) — the same class of plan-time job as
    ``resolve_n_planes``'s count, and small next to the encode +
    candidate passes the merge already runs."""
    from .ann import hyperplane_bucket

    memo_key = None
    try:
        memo_key = (
            int(right._jdf.queryExecution().analyzed().semanticHash()),
            dim, n_planes, n_extra,
        )
        cached = _AUTO_TABLES_MEMO.get(memo_key)
        if cached is not None:
            return cached
    except Exception:  # noqa: BLE001 — memo must never break the plan
        pass
    occ = (
        right.withColumn("_lt_occ_b",
                         hyperplane_bucket(RIGHT_EMB, dim, n_planes))
        .groupBy("_lt_occ_b").count()
        .agg(
            F.sum("count").alias("n"),
            F.sum(F.col("count") * F.col("count")).alias("n2"),
        )
        .first()
    )
    if occ is None or not occ["n"]:
        tables = 1
    else:
        n = float(occ["n"])
        coverage = (1 + n_extra) * (float(occ["n2"]) / n) / n
        tables = 1 if coverage >= 1.0 else 2
    if memo_key is not None:
        if len(_AUTO_TABLES_MEMO) >= _AUTO_TABLES_MEMO_MAX:
            _AUTO_TABLES_MEMO.pop(next(iter(_AUTO_TABLES_MEMO)))
        _AUTO_TABLES_MEMO[memo_key] = tables
    return tables


def _auto_lsh_tables_bucketed(rb, right_raw, dim: int, n_planes: int,
                              n_extra: int, bucket_col: str) -> int:
    """:func:`_auto_lsh_tables` over an ALREADY-bucketized relation
    (the arrow-keys route computes table-0 buckets anyway): identical
    statistic — coverage = (1 + n_extra) * (sum occ^2 / n) / n over the
    table-0 bucket occupancy — same memo keyed on the RAW right plan."""
    memo_key = None
    try:
        memo_key = (
            int(right_raw._jdf.queryExecution().analyzed().semanticHash()),
            dim, n_planes, n_extra,
        )
        cached = _AUTO_TABLES_MEMO.get(memo_key)
        if cached is not None:
            return cached
    except Exception:  # noqa: BLE001 — memo must never break the plan
        pass
    occ = (
        rb.groupBy(bucket_col).count()
        .agg(
            F.sum("count").alias("n"),
            F.sum(F.col("count") * F.col("count")).alias("n2"),
        )
        .first()
    )
    if occ is None or not occ["n"]:
        tables = 1
    else:
        n = float(occ["n"])
        coverage = (1 + n_extra) * (float(occ["n2"]) / n) / n
        tables = 1 if coverage >= 1.0 else 2
    if memo_key is not None:
        if len(_AUTO_TABLES_MEMO) >= _AUTO_TABLES_MEMO_MAX:
            _AUTO_TABLES_MEMO.pop(next(iter(_AUTO_TABLES_MEMO)))
        _AUTO_TABLES_MEMO[memo_key] = tables
    return tables


def _lsh_candidates(left, right, scorer, block_on=None, threshold=None,
                    k=None, n_planes="auto", n_extra=3) -> DataFrame:
    """Hyperplane-LSH candidate pairs, exact-rescored — the same
    sign-bucket machinery every other approximate path here uses
    (ann_topk lsh, er_resolve_lsh, semantic blocking): the corpus side
    takes its exact bucket, the query side multi-probes ``1+n_extra``
    buckets (Lv et al. 2007 — flip the least-confident bits), and
    candidates are ONE equi-join on the bucket id. ``n_planes='auto'``
    grows one plane per corpus doubling (resolve_n_planes), keeping
    per-bucket rows ~constant and candidate volume LINEAR in the
    corpus — the measured scale rule.

    Replaces a BucketedRandomProjectionLSH formulation whose pure-kNN
    radius (sqrt(2) on normalized vectors = half the space) degenerated
    to a near-cross-product through the ML explode machinery — measured
    35+ min for the 15k x 1k sf0.1 bench shape vs well under a minute
    for this plan at every measured operating point. Recall stays
    approximate by contract (a pair split by every probed bucket is
    missed; raise ``n_extra`` / lower ``n_planes`` to recover, set
    mode='exact_cross' for exactness — measured curve in PLANS.md
    round 9; note the TPC-H name columns are a near-worst case, since
    every name shares all its non-digit n-grams)."""
    if not getattr(scorer, "needs_embeddings", False):
        raise ValueError("lsh mode requires an embedding-based scorer")
    from .ann import (
        hyperplane_bucket, hyperplane_probe_buckets, resolve_n_planes,
    )

    spark = left.sparkSession
    try:
        conf_planes = spark.conf.get(LSH_PLANES_CONF, None)
        if conf_planes is not None:
            n_planes = conf_planes if conf_planes == "auto" else int(conf_planes)
        conf_extra = spark.conf.get(LSH_EXTRA_CONF, None)
        if conf_extra is not None:
            n_extra = int(conf_extra)
    except Exception:  # noqa: BLE001 — conf read must never break the plan
        pass

    # dim from the encoder when it declares one (hash-ngram does) —
    # skips a per-query first() job; the empty-corpus early return is
    # only needed when dim must be PROBED from data (an empty right on
    # the known-dim kernel path simply yields zero candidates with the
    # kernel's schema). `or None` treats a non-positive dim as UNKNOWN:
    # the Encoder base class declares the placeholder `dim: int = 0`,
    # and running the hyperplanes at dim=0 folds every dot over an
    # empty prefix to 0.0 — one bucket, a near-cross-product candidate
    # join (round-14 advisory).
    dim = getattr(getattr(scorer, "encoder", None), "dim", None) or None
    if dim is None:
        dim_row = right.select(F.size(RIGHT_EMB).alias("d")).first()
        if dim_row is None:  # empty corpus -> no candidates, keep schema
            return (
                left.crossJoin(right.limit(0))
                .withColumn("score", F.lit(None).cast("double"))
            )
        dim = int(dim_row["d"])
    # size planes on the LARGER side (the match_pairs lsh rule): the
    # join's candidate volume is |L| x probes x bucket_size, so bucket
    # granularity must track the bigger relation — right-side-only
    # sizing at 15k x 1k measured 12M candidates and a 90s interpreted
    # dot fold vs ~1M and ~8s with max-side sizing (same recall knob).
    # rows_per_bucket=128 (not the ANN family's 32): recall on real
    # match keys comes from bucket CO-RESIDENCY while precision comes
    # from the exact re-score — and the round-10 numpy cogroup made
    # re-scoring 4x more candidates cheaper than probing 4x more
    # buckets. Measured on perturbed Zipf titles (PLANS.md round 10):
    # 128 rpb = recall@1 0.76 at 3.3s vs 0.68 at 4.8s under the 32-rpb
    # rule; still one plane per corpus doubling, so candidate volume
    # stays linear at scale.
    n_planes = resolve_n_planes(
        n_planes, lambda: max_count_one_job(left, right),
        rows_per_bucket=128,
    )
    n_extra = max(0, min(int(n_extra), n_planes - 1))
    n_tables = None
    try:
        conf_tables = spark.conf.get(LSH_TABLES_CONF, None)
        if conf_tables is not None:
            n_tables = max(1, int(conf_tables))
    except Exception:  # noqa: BLE001 — conf read must never break the plan
        pass
    left_p = ensure_parallelism(left)
    if getattr(scorer, "score_is_dot", False):
        # the fully in-kernel route (round 13): when the scorer's
        # encoder has the bit-identical numpy mirror (hash-ngram) and
        # no blocking columns ride the cogroup keys, buckets come from
        # ONE Arrow pass per side over the raw KEY STRINGS and the
        # exact dots are re-derived from those strings inside the
        # bucket cogroup — the relational encode subplan (distinct +
        # explode + wide aggregate + join-back per side) disappears
        # and the shuffle carries ~25-byte keys instead of dim x 8-byte
        # arrays [guide §2.3, §4.2; entity.match_pairs rationale]
        enc = getattr(scorer, "encoder", None)
        # gate on expression_based, not mere encode_batch presence: the
        # in-kernel route re-encodes each key once per bucket occurrence
        # ((1+n_extra) probes x tables x cogroup chunks), which is only
        # free for the cheap deterministic mirrors (hash-ngram). A
        # model-based encoder (SBert) would pay ~8-10x inference AND its
        # batch-composition float drift breaks the 'identical exact
        # score across tables' assumption behind the pair-id dedup
        # (round-14 advisory).
        arrow_keys = (
            enc is not None and hasattr(enc, "encode_batch")
            and getattr(enc, "expression_based", False)
            and not block_on
            and LEFT_KEY in left.columns and RIGHT_KEY in right.columns
        )
        if arrow_keys:
            from .ann import (
                hyperplane_bucket_keys_arrow,
                hyperplane_probe_buckets_keys_arrow,
            )

            right_k = right.select(RIGHT_ID, RIGHT_KEY)
            rb0 = hyperplane_bucket_keys_arrow(
                right_k, RIGHT_ID, RIGHT_KEY, enc, dim, n_planes,
                bucket_col="_lt_bkt",
            )
            if n_tables is None:
                n_tables = _auto_lsh_tables_bucketed(
                    rb0, right, dim, n_planes, n_extra, "_lt_bkt"
                )
            left_k = left.select(LEFT_ID, LEFT_KEY)
            if n_tables > 1:
                # narrow (id, key) rows; cut once so the per-table
                # probe passes scan an RDD, not the upstream plan twice
                left_k = left_k.localCheckpoint(eager=False)
                right_k = right_k.localCheckpoint(eager=False)
            parts = []
            for t in range(n_tables):
                off = t * n_planes
                lb = hyperplane_probe_buckets_keys_arrow(
                    left_k, LEFT_ID, LEFT_KEY, enc, dim, n_planes,
                    n_extra, bucket_col="_lt_bkt", plane_offset=off,
                )
                rb = rb0 if t == 0 else hyperplane_bucket_keys_arrow(
                    right_k, RIGHT_ID, RIGHT_KEY, enc, dim, n_planes,
                    bucket_col="_lt_bkt", plane_offset=off,
                )
                parts.append(bucket_dot_rescored_pairs(
                    lb, rb, ["_lt_bkt"], threshold=threshold, k=k,
                    encoder=enc, left_key_col=LEFT_KEY,
                    right_key_col=RIGHT_KEY,
                ))
            if len(parts) == 1:
                return parts[0]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out.dropDuplicates([LEFT_ID, RIGHT_ID])
        if n_tables is None:
            # conf unset: derive the OR-construction width from the
            # corpus's bucket-occupancy skew (degenerate -> 1, spread
            # -> 2; rationale + measurements in _auto_lsh_tables)
            n_tables = _auto_lsh_tables(right, dim, n_planes, n_extra)
        if n_tables > 1:
            # each table's probe-bucket step lineage-cuts its input
            # (separate RDD materializations — NO exchange reuse across
            # them), so an uncut encoded left would re-execute its
            # encode plan once PER TABLE, and each cut would re-plan
            # the full encode subtree at build time. One cut here makes
            # every table's step a cheap scan-of-RDD + dots projection.
            left_p = left_p.localCheckpoint(eager=False)
        # the round-10 re-score path: bucket cogroup + vectorized
        # numpy dot (bit-equal to the fold — see
        # bucket_dot_rescored_pairs) instead of join + interpreted
        # per-pair fold. Output is the NARROW (left_id, right_id,
        # score) relation — exactly what both consumers (top-k merge
        # re-rank, near-dup pair filter) read; eqNullSafe blocking
        # folds into the cogroup keys (null groups match null groups).
        #
        # n_tables > 1 (LSH_TABLES_CONF) is the OR-construction: each
        # table hashes on an INDEPENDENT plane set (offset t*n_planes
        # into the coefficient stream) and the candidate union dedupes
        # on the pair ids — recall 1-(1-p)^L for L tables at ~L x probe
        # cost, the standard lever when one table's co-residency
        # probability caps recall on weakly-similar true matches
        # (measured curve: PLANS.md round 10).
        parts = []
        for t in range(n_tables):
            off = t * n_planes
            lb = hyperplane_probe_buckets(
                left_p, LEFT_EMB, dim, n_planes, n_extra,
                out_col="_lt_bkt", plane_offset=off,
            )
            rb = right.withColumn(
                "_lt_bkt",
                hyperplane_bucket(RIGHT_EMB, dim, n_planes,
                                  plane_offset=off),
            )
            keys = ["_lt_bkt"]
            for i, (lc, rc) in enumerate(block_on or []):
                kn = f"_lt_blk{i}"
                lb = lb.withColumn(kn, F.col(lc))
                rb = rb.withColumn(kn, F.col(rc))
                keys.append(kn)
            parts.append(bucket_dot_rescored_pairs(
                lb.select(*keys, LEFT_ID, LEFT_EMB),
                rb.select(*keys, RIGHT_ID, RIGHT_EMB),
                keys, threshold=threshold, k=k,
            ))
        if len(parts) == 1:
            # single table: probe buckets are pairwise distinct per
            # left row, so each pair appears at most once — no dedup
            return parts[0]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # a pair found by several tables carries the IDENTICAL exact
        # score — dedup by ids alone (narrow rows, in-group top-k has
        # already bounded the volume at k per (row, table, bucket))
        return out.dropDuplicates([LEFT_ID, RIGHT_ID])
    lb = hyperplane_probe_buckets(
        left_p, LEFT_EMB, dim, n_planes, n_extra, out_col="_lt_bkt",
    )
    rb = right.withColumn(
        "_lt_bkt", hyperplane_bucket(RIGHT_EMB, dim, n_planes)
    )
    out = lb.join(rb, "_lt_bkt").drop("_lt_bkt")
    out = out.withColumn("score", scorer.score())
    if threshold is not None:
        out = out.filter(F.col("score") >= F.lit(threshold))
    if block_on:
        cond = None
        for lc, rc in block_on:
            eq = F.col(lc).eqNullSafe(F.col(rc))
            cond = eq if cond is None else (cond & eq)
        out = out.filter(cond)
    return out
