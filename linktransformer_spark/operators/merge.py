"""Public merge family: ``merge``, ``merge_knn``, ``merge_blocking``,
``aggregate_rows`` (SURVEY §2.2 ops 1, 2, 4, 5).

Semantics mirrored from the reference:
- merge = semantic 1-NN left-driven join, every left row gets exactly
  one match + ``score`` (/root/reference/src/linktransformer/infer.py:24-164)
- merge_knn = k matches per left row, optional ``drop_sim_threshold``
  post-filter (infer.py:564-711); merge ≡ merge_knn(k=1)
  (/root/reference/tests/infer_test.py:157-170)
- merge_blocking = per-block merge; rows of blocks present on only one
  side pass through unmatched (infer.py:240-270)
- aggregate_rows = merge with the reference list as the right side
  (infer.py:279-312)

Plan shape (exact_cross mode, the declarative default):

    scan L ──▶ +id +key [+emb] ─┐
                                 ├─ join(block equi / cross) ─ score
    scan R ──▶ +id +key [+emb] ─┘        │
                windowed row_number(score DESC, rid ASC) ≤ k
                                         │
                     suffix-renamed L cols ⨝ R cols + score

The embedding step is a map-only expression (HashNgramEncoder) or an
Arrow pandas-UDF stage (SBERT); either way Catalyst prunes columns so
only the serialized key reaches it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.serialize import DEFAULT_SEP, resolve_keys, serialize_columns
from ..ids import check_reserved, with_row_id
from ..plans.suffixes import apply_renames, suffix_plan
from . import knn_join as KJ
from .knn_join import (
    LEFT_EMB,
    LEFT_ID,
    LEFT_KEY,
    RIGHT_EMB,
    RIGHT_ID,
    RIGHT_KEY,
    Mode,
    resolve_scorer,
)

_HELPERS_L = (LEFT_ID, LEFT_KEY, LEFT_EMB)
_HELPERS_R = (RIGHT_ID, RIGHT_KEY, RIGHT_EMB)


def _prepare_sides(
    df1: DataFrame,
    df2: DataFrame,
    on=None,
    left_on=None,
    right_on=None,
    model=None,
    suffixes=("_x", "_y"),
    left_id_col: str | None = None,
    right_id_col: str | None = None,
    deterministic_ids: bool = True,
    sep: str = DEFAULT_SEP,
    skip_embed: bool = False,
):
    left_keys, right_keys = resolve_keys(df1.columns, df2.columns, on, left_on, right_on)
    check_reserved(df1)
    check_reserved(df2)
    scorer = resolve_scorer(model)

    # Parallelism guard at the RAW input (usually a bare scan, where the
    # partition probe is free). Downstream plans keep this partitioning
    # through maps and broadcast joins — including the encode join-back
    # (a BroadcastHashJoin whose PROBE side is this scan) and the
    # scoring stage — so a single-file input would otherwise run the
    # whole O(|L|*|R|) stage on one core (measured 32x at sf0.1).
    df1 = KJ.ensure_parallelism(df1)

    lmap, rmap = suffix_plan(df1.columns, df2.columns, suffixes)

    left = with_row_id(df1, id_col=left_id_col, out_col=LEFT_ID, deterministic=deterministic_ids)
    left = left.withColumn(LEFT_KEY, serialize_columns(left_keys, sep))
    right = with_row_id(df2, id_col=right_id_col, out_col=RIGHT_ID, deterministic=deterministic_ids)
    right = right.withColumn(RIGHT_KEY, serialize_columns(right_keys, sep))

    # skip_embed: the broadcast-kNN key-shipping path embeds INSIDE the
    # scoring stage (encode_batch over Arrow batches / driver), so the
    # relational encode subplan would be dead weight. Catalyst does
    # prune it at optimization time, but merely ANALYZING the wide
    # encode plan (dim aggregate columns + dim-term norm expression,
    # twice) costs multiple driver seconds per query — skip building it.
    if scorer.needs_embeddings and not skip_embed:
        left = scorer.prepare(left, LEFT_KEY, LEFT_EMB)
        right = scorer.prepare(right, RIGHT_KEY, RIGHT_EMB)

    left = apply_renames(left, lmap)
    right = apply_renames(right, rmap)
    return left, right, scorer, lmap, rmap


def _finalize(df: DataFrame, lmap, rmap, keep_score: bool = True) -> DataFrame:
    cols = [*lmap.values(), *rmap.values()]
    if keep_score:
        cols.append("score")
    return df.select(*cols)


def _score_narrow_then_join_back(
    left: DataFrame,
    right: DataFrame,
    scorer,
    k: int | None,
    block: list[tuple[str, str]] | None = None,
    mode: str = "exact_cross",
    threshold: float | None = None,
) -> DataFrame:
    """Score (id, key[, emb]) projections only, THEN re-attach full rows
    by id — manual column pruning through the candidate join + top-k
    window.

    Catalyst cannot do this itself: the final select needs every user
    column, so without the restructure all of them ride through the
    O(|L|·|R|) candidate materialization and the top-k shuffle. Pruning
    first makes the shuffled candidate row ~24 bytes (two longs + a
    double); the wide rows rejoin at |L|·k / |matches| volume. The
    join-back re-scans the inputs, but those scans are column-pruned
    parquet reads — orders of magnitude cheaper than wide candidates at
    scale (and the embed stage is NOT recomputed: the join-back sides
    drop the key/emb helper columns entirely).
    """
    lcols = [LEFT_ID, LEFT_KEY] + ([LEFT_EMB] if scorer.needs_embeddings else [])
    rcols = [RIGHT_ID, RIGHT_KEY] + ([RIGHT_EMB] if scorer.needs_embeddings else [])
    if block:
        lcols += [lc for lc, _ in block if lc not in lcols]
        rcols += [rc for _, rc in block if rc not in rcols]
    left_narrow = left.select(*lcols)
    if k is not None and k > 1 and mode == "exact_cross":
        # Pre-partition the NARROW left by id. When the right side
        # broadcasts (the usual shape), the join preserves this
        # partitioning, so the top-k window's ClusteredDistribution
        # (LEFT_ID [, block]) is already satisfied and the |L|*|R|
        # scored-candidate relation never shuffles — only the |L|-row
        # input does. Without this, every scored pair rides through the
        # window exchange (360 MB at sf0.1; unbounded at scale). If the
        # right side is too big to broadcast, Catalyst re-partitions
        # for the join anyway and this is a cheap no-op-ish extra
        # exchange of the narrow left.
        # explicit partition count: a bare repartition(col) is AQE-
        # coalescable, and 15k narrow rows coalesce to ONE partition —
        # which would run the whole O(|L|*|R|) scoring stage on one core
        nparts = left.sparkSession.sparkContext.defaultParallelism
        left_narrow = left_narrow.repartition(nparts, F.col(LEFT_ID))
    cand = KJ.candidate_scores(
        left_narrow, right.select(*rcols), scorer,
        block_on=block, mode=mode,
        # LSH uses the threshold to bound candidate generation; for
        # exact_cross it must NOT go below the top-k — see filter below
        threshold=threshold if mode == "lsh" else None,
    )
    if k == 1 and mode == "exact_cross":
        # 1-NN (the reference's flagship merge shape): hash-agg top-1,
        # no sort/WindowExec, candidates never shuffle (see KJ.top1)
        cand = KJ.top1(cand)
    elif k is not None:
        cand = KJ.topk(cand, k)
    if threshold is not None and mode != "lsh":
        # Threshold ABOVE the top-k, where `score` is a materialized
        # attribute (window sort key / agg output). Same rows as the
        # reference's rank-then-filter: every candidate ranked above a
        # passing row also passes. Placing it BELOW instead looks like
        # the scale win (smaller sort input) but Catalyst pushes the
        # predicate through the scoring projection and re-evaluates the
        # similarity kernel per row for the filter — measured 1.5x
        # slower on the sf0.1 levenshtein k=3 join, and the kernel, not
        # the sort, dominates at every scale.
        cand = cand.filter(F.col("score") >= F.lit(threshold))
    narrow = cand.select(LEFT_ID, RIGHT_ID, "score")
    lfull = left.drop(LEFT_KEY, LEFT_EMB)
    rfull = right.drop(RIGHT_KEY, RIGHT_EMB)
    return narrow.join(lfull, LEFT_ID).join(rfull, RIGHT_ID)


def merge_knn(
    df1: DataFrame,
    df2: DataFrame,
    on=None,
    left_on=None,
    right_on=None,
    model=None,
    k: int = 1,
    drop_sim_threshold: float | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    mode: Mode = "auto",
    left_id_col: str | None = None,
    right_id_col: str | None = None,
    deterministic_ids: bool = True,
    blocking_vars: list[str] | None = None,
    merge_type: str | None = None,
) -> DataFrame:
    """Semantic top-k join (reference merge_knn, infer.py:564-711).

    ``merge_type`` is accepted for reference API parity
    (infer.py:67-89): deprecated, value-validated ("1:m"/"m:1"/"1:1"),
    otherwise ignored — the reference only used it to PRINT key-
    uniqueness warnings, which would cost an eager action here.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if merge_type is not None:
        import warnings

        warnings.warn(
            "merge_type is deprecated. It will be removed in the future as "
            "it only validates whether the join columns are unique",
            DeprecationWarning,
            stacklevel=2,
        )
        if merge_type not in ("1:m", "m:1", "1:1"):
            raise ValueError(f"Invalid merge type: {merge_type}")
    scorer = resolve_scorer(model)
    if df2.isStreaming:
        raise ValueError(
            "the right side of a semantic merge must be static: the match "
            "index is built from it (stream-STATIC joins only)"
        )
    if df1.isStreaming:
        # stream-static semantic join: the stateless broadcast-kNN stage
        # (mapInPandas per Arrow batch against the broadcast index) is
        # the only mode that runs under Structured Streaming — window
        # top-k and the top-1 aggregation need global state.
        if mode not in ("auto", "broadcast_knn"):
            raise ValueError("streaming merge supports mode='broadcast_knn' only")
        if not scorer.needs_embeddings:
            raise ValueError(
                "streaming merge needs an embedding model (the string "
                "scorer has no broadcast index form)"
            )
        mode = "broadcast_knn"
    if mode == "auto":
        # expression scorers stay fully declarative; UDF-backed encoders
        # use the broadcast numpy path (right side small by contract).
        mode = "exact_cross"
        enc = getattr(scorer, "encoder", None)
        if scorer.needs_embeddings and enc is not None and not enc.expression_based:
            mode = "broadcast_knn"
        elif scorer.needs_embeddings:
            # size-aware ladder: exact_cross plans the O(|L|·|R|)
            # candidate stage as a BroadcastNestedLoopJoin — viable
            # only for a small right side; the mid band takes the
            # EXACT numpy broadcast tier (unless blocking_vars, which
            # the broadcast path cannot honor); only past the
            # broadcast threshold does auto route to LSH candidates +
            # exact re-rank (approximate recall; set
            # mode='exact_cross' to force exactness).
            mode = KJ.auto_embedding_mode(
                df2, allow_broadcast=not blocking_vars, left_raw=df1
            )
        elif not blocking_vars:
            # string-scorer ladder (round 13): past the pair budget,
            # the exact in-kernel broadcast tier computes the same
            # integer distances / float ops / tie-break as the
            # declarative plan — bit-identical rows, ~2.5x kernel
            # throughput, and no |L|x|R| candidate materialization
            mode = KJ.auto_lev_mode(df1, df2)
    key_shipping = (
        mode == "broadcast_knn"
        and hasattr(getattr(scorer, "encoder", None), "encode_batch")
    )
    left, right, scorer, lmap, rmap = _prepare_sides(
        df1, df2, on, left_on, right_on, scorer, suffixes,
        left_id_col, right_id_col, deterministic_ids,
        skip_embed=key_shipping,
    )

    block = None
    if blocking_vars:
        if mode == "broadcast_knn":
            # the numpy index scores against the WHOLE broadcast right
            # side — silently ignoring the blocks would return
            # cross-block matches
            raise ValueError(
                "blocking_vars requires a declarative mode "
                "(exact_cross/lsh); broadcast_knn scores against the "
                "full right side"
            )
        block = [(lmap.get(c, c), rmap.get(c, c)) for c in blocking_vars]

    if mode == "broadcast_knn":
        enc = getattr(scorer, "encoder", None)
        if scorer.needs_embeddings and not hasattr(enc, "encode_batch"):
            # vector-shipping path reads right twice (vector collect +
            # row re-attach): persist so the embed subplan runs once
            right = right.persist()
        # else: key-shipping path — do NOT persist, so the unused
        # relational encode subplan stays prunable on both reads
        cand = KJ.candidate_scores(left, right, scorer, mode=mode, k=k)
        # scores/right ids computed; re-attach full right rows (small side -> broadcast)
        cand = cand.join(
            F.broadcast(right.drop(RIGHT_EMB, RIGHT_KEY)), RIGHT_ID, "inner"
        )
        out = cand
        if drop_sim_threshold is not None:
            # broadcast path emits exactly k rows per left regardless of
            # score; reference post-filter applies (infer.py:704-706)
            out = out.filter(F.col("score") >= F.lit(drop_sim_threshold))
    else:
        # rank-filter pushdown: `score >= t` commutes with row_number
        # ordered by (score DESC, rid) — every row ranked above a
        # passing row also passes — so filtering BEFORE the top-k gives
        # the same rows as the reference's post-filter (infer.py:704-706)
        # while shrinking the sort/aggregate input by the threshold's
        # selectivity (the win at scale).
        out = _score_narrow_then_join_back(
            left, right, scorer, k, block=block, mode=mode,
            threshold=drop_sim_threshold,
        )
    return _finalize(out, lmap, rmap)


def merge(
    df1: DataFrame,
    df2: DataFrame,
    on=None,
    left_on=None,
    right_on=None,
    model=None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    mode: Mode = "auto",
    **kw,
) -> DataFrame:
    """Semantic 1-NN join (reference merge, infer.py:24-164).
    Exactly merge_knn with k=1."""
    return merge_knn(
        df1, df2, on=on, left_on=left_on, right_on=right_on, model=model,
        k=1, suffixes=suffixes, mode=mode, **kw,
    )


def merge_blocking(
    df1: DataFrame,
    df2: DataFrame,
    on=None,
    left_on=None,
    right_on=None,
    model=None,
    blocking_vars: list[str] | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    mode: Mode = "auto",
    **kw,
) -> DataFrame:
    """Blocked semantic 1-NN join (reference merge_blocking,
    infer.py:169-274).

    Blocking becomes an equi-join condition on the block key — Catalyst
    hash-partitions both sides on it, so "per-block matching" is
    partition pruning, not a driver loop. Rows of blocks present on only
    one side pass through unmatched (null other-side columns + null
    score), matching the reference's pd.concat of skipped blocks.
    """
    if not blocking_vars:
        return merge(df1, df2, on=on, left_on=left_on, right_on=right_on,
                     model=model, suffixes=suffixes, mode=mode, **kw)
    for c in blocking_vars:
        if c not in df1.columns:
            raise ValueError(f"Blocking vars {blocking_vars} not in df1")
        if c not in df2.columns:
            raise ValueError(f"Blocking vars {blocking_vars} not in df2")
    if mode == "broadcast_knn":
        raise NotImplementedError("blocking is declarative; use exact_cross/lsh/auto")

    left, right, scorer, lmap, rmap = _prepare_sides(
        df1, df2, on, left_on, right_on, model, suffixes,
        kw.get("left_id_col"), kw.get("right_id_col"),
        kw.get("deterministic_ids", True),
    )
    block = [(lmap.get(c, c), rmap.get(c, c)) for c in blocking_vars]
    out = _score_narrow_then_join_back(
        left, right, scorer, 1, block=block,
        mode="exact_cross" if mode == "auto" else mode,
    )
    matched = _finalize(out, lmap, rmap)

    # pass-through of one-side-only blocks (anti-join on the block key)
    lb = [lmap.get(c, c) for c in blocking_vars]
    rb = [rmap.get(c, c) for c in blocking_vars]
    l_only = apply_renames(df1, lmap).join(
        apply_renames(df2, rmap).select(*rb).distinct(),
        on=[F.col(a).eqNullSafe(F.col(b)) for a, b in zip(lb, rb)],
        how="left_anti",
    )
    r_only = apply_renames(df2, rmap).join(
        apply_renames(df1, lmap).select(*lb).distinct(),
        on=[F.col(b).eqNullSafe(F.col(a)) for a, b in zip(lb, rb)],
        how="left_anti",
    )
    return matched.unionByName(l_only, allowMissingColumns=True).unionByName(
        r_only, allowMissingColumns=True
    )


def aggregate_rows(
    df: DataFrame,
    ref_df: DataFrame,
    model=None,
    left_on=None,
    right_on=None,
    **kw,
) -> DataFrame:
    """Semantic many-to-one mapping onto a coarse reference list
    (reference aggregate_rows, infer.py:279-312) — merge with ref_df as
    the right side. The ref list is small by construction: Catalyst
    broadcasts it, so this is a map-side operation on the fact side."""
    return merge(df, ref_df, on=None, left_on=left_on, right_on=right_on,
                 model=model, suffixes=("_x", "_y"), **kw)
