"""Cross-table entity resolution — the reference's flagship user
story (link two record tables) composed end-to-end into ONE Catalyst
plan: blocked candidate generation -> similarity scoring -> match
threshold -> connected components over the bipartite match graph ->
one entity id + canonical key per group.

The reference exposes the stages separately (merge_blocking to score,
clusters_from_edges to group — infer.py:169-274, utils.py:236-268);
``resolve_entities`` is the composition a production linkage pipeline
actually runs, returning the assignment table both input sides map
into.

Plan shape at 100 TB:
- candidates: equi-join on the blocking key (hash-partitioned, never
  a cross product when ``blocking_vars`` is given); score is a JVM
  expression (levenshtein or hash-ngram dot), filter pushes into the
  join's output before anything widens.
- graph: left record i becomes node 2i, right record j node 2j+1 —
  the bipartite encoding keeps one CC over longs instead of a
  struct-keyed graph. CC is the engine's large-/small-star iteration
  (operators/components.py), label = min node id of the component.
- output: entity_id = component label (singletons keep their own
  node id), canonical = lexicographically smallest key in the entity
  (deterministic, no float ties), n_members by one hash agg keyed on
  entity_id.

Every stage is an equi-join or hash agg on a derived key; nothing
touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.serialize import serialize_columns
from ..ids import require_integral_id
from .components import connected_components

__all__ = ["attach_to_entities", "match_pairs", "match_pairs_weighted",
           "resolve_entities", "sorted_neighborhood_pairs"]


def _norm_blocking(blocking_vars):
    """Normalize to [(left_col, right_col), ...] — a bare string means
    the same column name on both sides."""
    out = []
    for b in blocking_vars or []:
        out.append((b, b) if isinstance(b, str) else (b[0], b[1]))
    return out


def _sides(df1, df2, left_on, right_on, left_id_col, right_id_col, blocking_vars):
    blocks = _norm_blocking(blocking_vars)
    lkey = serialize_columns([left_on] if isinstance(left_on, str) else list(left_on))
    rkey = serialize_columns([right_on] if isinstance(right_on, str) else list(right_on))
    lb = [F.col(lc).alias(f"_b{i}") for i, (lc, _) in enumerate(blocks)]
    rb = [F.col(rc).alias(f"_b{i}") for i, (_, rc) in enumerate(blocks)]
    left = df1.select(
        F.col(left_id_col).cast("long").alias("_lid"), lkey.alias("_lkey"), *lb
    )
    right = df2.select(
        F.col(right_id_col).cast("long").alias("_rid"), rkey.alias("_rkey"), *rb
    )
    return left, right


def match_pairs(
    df1: DataFrame,
    df2: DataFrame,
    *,
    left_on,
    right_on,
    left_id_col: str,
    right_id_col: str,
    sim_threshold: float,
    blocking_vars: list[str] | None = None,
    model: str = "levenshtein",
    blocking: str = "exact",
    n_planes: int | str = 8,
    lsh_dim: int = 64,
) -> DataFrame:
    """Scored candidate pairs above ``sim_threshold``:
    ``(left_id, right_id, score)``.

    ``blocking`` picks the candidate generator:

    - ``'exact'`` (default): ``blocking_vars`` entries are either a
      column name present in BOTH frames or a ``(left_col, right_col)``
      pair; candidates are generated only within equal blocking values
      (an equi-join — the hand-keyed scale path). Without blocking the
      candidate stage is the exact cross product: correct, and only
      sane when one side is small.
    - ``'lsh'``: SIMILARITY blocking — both sides' match keys embed
      with the deterministic hash-n-gram encoder and candidates are
      pairs landing in the SAME random-hyperplane sign bucket
      (``n_planes`` planes over the ``lsh_dim``-dim embedding; the
      ann_topk ``lsh_hyperplane`` machinery). This is the 100 TB
      generalization of the reference's merge_blocking
      (infer.py:169-274): blocks on LEARNED similarity instead of a
      hand-picked key, so near-matches that differ in every discrete
      attribute still meet. An equi-join on the bucket id —
      approximate recall (a pair split by a hyperplane is missed;
      lower ``n_planes`` for recall, raise it for precision/balance),
      exact re-score inside buckets. A hot bucket (many near-identical
      keys) concentrates one join partition — raise ``n_planes``, the
      operator's skew knob. ``n_planes="auto"`` targets ~256 rows per
      bucket (ceil(log2(n/256)) over the larger side — see
      ann.resolve_n_planes): the plane count must GROW with the
      corpus (one per doubling) or candidate volume goes quadratic,
      the super-linear cliff the sf1 scale sweep measures. Pin an int
      for a byte-stable SQL mirror.

    ``model`` picks the scorer: ``levenshtein`` (normalized edit
    similarity) or ``hash-ngram`` (deterministic n-gram embedding
    cosine) — both exact JVM expressions with DuckDB twins."""
    if not -1.0 <= sim_threshold <= 1.0:
        raise ValueError("sim_threshold must be within [-1, 1]")
    if blocking not in ("exact", "lsh"):
        raise ValueError(f"unknown blocking {blocking!r}; use exact|lsh")
    if blocking == "lsh":
        if blocking_vars:
            raise ValueError(
                "blocking='lsh' and blocking_vars are mutually exclusive — "
                "LSH candidates come from the embedding buckets"
            )
        if n_planes != "auto" and n_planes < 1:
            raise ValueError("n_planes must be >= 1 (or 'auto')")
    # _sides casts ids to long and the CC stage encodes nodes as
    # 2*id/2*id+1 — a string/UUID id would cast to null (non-ANSI) and
    # collapse every record into one null entity, so fail loudly first.
    require_integral_id(df1, left_id_col, "match_pairs")
    require_integral_id(df2, right_id_col, "match_pairs")
    for lc, rc in _norm_blocking(blocking_vars):
        if lc not in df1.columns:
            raise ValueError(f"blocking var {lc!r} not in left frame")
        if rc not in df2.columns:
            raise ValueError(f"blocking var {rc!r} not in right frame")
    left, right = _sides(
        df1, df2, left_on, right_on, left_id_col, right_id_col, blocking_vars)

    need_emb = model == "hash-ngram" or blocking == "lsh"
    # LSH blocking + the dot scorer = the fully in-kernel path: buckets
    # AND re-scores both come from encode_batch (the bit-identical
    # numpy mirror), so neither side is relationally encoded and the
    # bucket cogroup shuffles key STRINGS, never embedding arrays
    # [guide §2.3 / §4.2; measured below in OPTIMIZATION_r13.md]
    lsh_kernel = blocking == "lsh" and model == "hash-ngram"
    if need_emb and not lsh_kernel:
        # relational encode (embed-once CSE; see encoders/hash_ngram.py
        # for why the inline expression form is off the table); vectors
        # ride the join for both the bucket id and the dot scorer
        from ..encoders.hash_ngram import HashNgramEncoder

        enc = HashNgramEncoder(dim=lsh_dim)
        left = enc.encode(left, "_lkey", "_lemb")
        right = enc.encode(right, "_rkey", "_remb")

    if model == "levenshtein":
        from ..functions.similarity import lev_sim

        score = lev_sim(F.col("_lkey"), F.col("_rkey"))
    elif model == "hash-ngram":
        from ..functions.similarity import dot

        score = dot(F.col("_lemb"), F.col("_remb"))
    else:
        raise ValueError(f"unknown model {model!r}; use levenshtein|hash-ngram")

    if blocking == "lsh":
        from .ann import (
            hyperplane_bucket, hyperplane_bucket_keys_arrow,
            resolve_n_planes,
        )
        from .knn_join import max_count_one_job

        n_planes = resolve_n_planes(
            n_planes, lambda: max_count_one_job(left, right)
        )
        if lsh_kernel:
            # the hot path at scale, fully in-kernel (round 13):
            # buckets via ONE Arrow pass per side over the raw key
            # strings, exact dots re-computed from those strings inside
            # the bucket cogroup — no relational encode subplan, and
            # the cogroup shuffle carries ~25-byte keys instead of
            # dim x 8-byte embedding arrays. Bit-equal to the
            # declarative encode + bucket + dot (encode_batch is the
            # documented bit-identical mirror; see
            # hyperplane_bucket_keys_arrow for the sign-fold argument)
            from ..encoders.hash_ngram import HashNgramEncoder
            from .knn_join import bucket_dot_rescored_pairs

            enc = HashNgramEncoder(dim=lsh_dim)
            lb = hyperplane_bucket_keys_arrow(
                left.select("_lid", "_lkey"), "_lid", "_lkey",
                enc, lsh_dim, n_planes,
            )
            rb = hyperplane_bucket_keys_arrow(
                right.select("_rid", "_rkey"), "_rid", "_rkey",
                enc, lsh_dim, n_planes,
            )
            return bucket_dot_rescored_pairs(
                lb, rb, ["_bkt"], left_id="_lid", right_id="_rid",
                threshold=sim_threshold,
                encoder=enc, left_key_col="_lkey", right_key_col="_rkey",
            ).select(
                F.col("_lid").alias("left_id"),
                F.col("_rid").alias("right_id"),
                "score",
            )
        left = left.withColumn(
            "_bkt", hyperplane_bucket("_lemb", lsh_dim, n_planes)
        )
        right = right.withColumn(
            "_bkt", hyperplane_bucket("_remb", lsh_dim, n_planes)
        )
        cand = left.join(right, "_bkt")
    elif blocking_vars:
        on = [f"_b{i}" for i in range(len(blocking_vars))]
        cand = left.join(right, on)
    else:
        cand = left.crossJoin(right)
    return (
        cand.withColumn("score", score)
        .filter(F.col("score") >= F.lit(sim_threshold))
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            "score",
        )
    )


def resolve_entities(
    df1: DataFrame,
    df2: DataFrame,
    *,
    left_on,
    right_on,
    left_id_col: str,
    right_id_col: str,
    sim_threshold: float,
    blocking_vars: list[str] | None = None,
    model: str = "levenshtein",
    blocking: str = "exact",
    n_planes: int | str = 8,
    lsh_dim: int = 64,
) -> DataFrame:
    """Full ER pipeline: match, group, label.

    Returns one row per INPUT RECORD (both sides):
    ``entity_id`` (long — stable min-node label), ``side`` ('L'/'R'),
    ``record_id`` (the side's id), ``key`` (the serialized match key),
    ``canonical`` (lexicographically smallest key in the entity),
    ``n_members`` (records in the entity; 1 for unmatched singletons).
    ``blocking``/``n_planes``/``lsh_dim``: see :func:`match_pairs` —
    ``blocking='lsh'`` resolves on similarity blocks with no hand-
    picked key.
    """
    pairs = match_pairs(
        df1, df2,
        left_on=left_on, right_on=right_on,
        left_id_col=left_id_col, right_id_col=right_id_col,
        sim_threshold=sim_threshold,
        blocking_vars=blocking_vars, model=model,
        blocking=blocking, n_planes=n_planes, lsh_dim=lsh_dim,
    )
    edges = pairs.select(
        (F.col("left_id") * 2).alias("src"),
        (F.col("right_id") * 2 + 1).alias("dst"),
    )
    left, right = _sides(
        df1, df2, left_on, right_on, left_id_col, right_id_col, None)
    nodes = (
        left.select(
            (F.col("_lid") * 2).alias("_node"),
            F.lit("L").alias("side"),
            F.col("_lid").alias("record_id"),
            F.col("_lkey").alias("key"),
        )
        .unionByName(
            right.select(
                (F.col("_rid") * 2 + 1).alias("_node"),
                F.lit("R").alias("side"),
                F.col("_rid").alias("record_id"),
                F.col("_rkey").alias("key"),
            )
        )
    )
    comp = connected_components(edges).withColumnRenamed("node", "_node")
    labeled = nodes.join(comp, "_node", "left").select(
        F.coalesce(F.col("component"), F.col("_node")).alias("entity_id"),
        "side",
        "record_id",
        "key",
    )
    groups = labeled.groupBy("entity_id").agg(
        F.min("key").alias("canonical"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return labeled.join(groups, "entity_id").select(
        "entity_id", "side", "record_id", "key", "canonical", "n_members"
    )


def attach_to_entities(
    new: DataFrame,
    registry: DataFrame,
    *,
    on,
    id_col: str,
    sim_threshold: float,
    registry_key: str = "key",
    registry_entity: str = "entity_id",
    blocking_vars: list | None = None,
    model: str = "levenshtein",
    blocking: str = "exact",
    n_planes: int | str = 8,
    lsh_dim: int = 64,
) -> DataFrame:
    """Incremental entity resolution — the production ingest shape.

    A prior :func:`resolve_entities` run (or any reference list)
    yields an entity REGISTRY: one ``(registry_entity, registry_key)``
    row per known member key. New record batches then ATTACH to it
    instead of re-resolving the world: each new record scores against
    the blocked registry keys and adopts the best-matching entity at
    or above ``sim_threshold``; records matching nothing come back
    with NULL entity — the caller resolves those separately (e.g. a
    batch :func:`resolve_entities` among themselves) and unions the
    new assignments into the registry. Per-batch cost scales with the
    batch's candidate pairs, never the history's record count — the
    same incremental contract as ``dedup_*_against`` and the stored
    indexes (a 100 TB registry re-resolve per ingest batch is not an
    option).

    Returns one row per NEW record:
    ``(record_id, key, entity_id, matched_key, score)`` with the last
    three NULL for unmatched records. Fully deterministic: best score
    wins; ties break to the smallest ``entity_id``, then the smallest
    ``matched_key`` — no float-order dependence (the score itself is
    an exact JVM expression, see :func:`match_pairs`).

    ``blocking``/``model``/``n_planes``/``lsh_dim`` are
    :func:`match_pairs`'s knobs: ``'exact'`` blocks on
    ``blocking_vars`` ``(new_col, registry_col)`` pairs (an equi-join;
    omitting it is an exact cross product — only sane for a small
    registry), ``'lsh'`` blocks on hash-n-gram hyperplane sign buckets
    (the no-hand-key scale path; ``n_planes='auto'`` sizes buckets
    from the larger side). Reference parity note: the reference's
    incremental story is "re-run merge on the union"
    (`infer.py:169-274` has no incremental form); this operator is the
    stored-registry analogue of that merge, keyed by the entity table
    it already produced."""
    if not -1.0 <= sim_threshold <= 1.0:
        raise ValueError("sim_threshold must be within [-1, 1]")
    if blocking not in ("exact", "lsh"):
        raise ValueError(f"unknown blocking {blocking!r}; use exact|lsh")
    if blocking == "lsh" and blocking_vars:
        raise ValueError(
            "blocking='lsh' and blocking_vars are mutually exclusive"
        )
    require_integral_id(new, id_col, "attach_to_entities")
    require_integral_id(registry, registry_entity, "attach_to_entities")
    for lc, rc in _norm_blocking(blocking_vars):
        if lc not in new.columns:
            raise ValueError(f"blocking var {lc!r} not in new frame")
        if rc not in registry.columns:
            raise ValueError(f"blocking var {rc!r} not in registry frame")
    left, right = _sides(
        new, registry, on, registry_key, id_col, registry_entity,
        blocking_vars,
    )

    need_emb = model == "hash-ngram" or blocking == "lsh"
    lsh_kernel = blocking == "lsh" and model == "hash-ngram"
    if need_emb and not lsh_kernel:
        from ..encoders.hash_ngram import HashNgramEncoder

        enc = HashNgramEncoder(dim=lsh_dim)
        left = enc.encode(left, "_lkey", "_lemb")
        right = enc.encode(right, "_rkey", "_remb")

    if model == "levenshtein":
        from ..functions.similarity import lev_sim

        score = lev_sim(F.col("_lkey"), F.col("_rkey"))
    elif model == "hash-ngram":
        from ..functions.similarity import dot

        score = dot(F.col("_lemb"), F.col("_remb"))
    else:
        raise ValueError(f"unknown model {model!r}; use levenshtein|hash-ngram")

    scored = None
    if blocking == "lsh":
        from .ann import (
            hyperplane_bucket, hyperplane_bucket_keys_arrow,
            resolve_n_planes,
        )
        from .knn_join import max_count_one_job

        n_planes = resolve_n_planes(
            n_planes, lambda: max_count_one_job(left, right)
        )
        if lsh_kernel:
            # numpy cogroup re-score (bit-equal to the fold) with
            # k=1 IN-GROUP pre-pruning: each new record lands in ONE
            # bucket, and the in-group order (score DESC, _rid ASC,
            # _rkey ASC) is exactly the window below, so pruning to
            # the per-bucket best preserves the global argmax.
            # Fully in-kernel (round 13): buckets from ONE Arrow pass
            # per side over the raw keys, dots re-derived from the
            # keys inside the cogroup — no relational encode, no
            # embedding arrays in the shuffle (match_pairs rationale)
            from ..encoders.hash_ngram import HashNgramEncoder
            from .knn_join import bucket_dot_rescored_pairs

            enc = HashNgramEncoder(dim=lsh_dim)
            lb = hyperplane_bucket_keys_arrow(
                left.select("_lid", "_lkey"), "_lid", "_lkey",
                enc, lsh_dim, n_planes,
            )
            rb = hyperplane_bucket_keys_arrow(
                right.select("_rid", "_rkey"), "_rid", "_rkey",
                enc, lsh_dim, n_planes,
            )
            scored = bucket_dot_rescored_pairs(
                lb, rb, ["_bkt"], left_id="_lid", right_id="_rid",
                threshold=sim_threshold, k=1, carry_right=["_rkey"],
                encoder=enc, left_key_col="_lkey", right_key_col="_rkey",
            ).withColumnRenamed("score", "_score")
        else:
            left = left.withColumn(
                "_bkt", hyperplane_bucket("_lemb", lsh_dim, n_planes)
            )
            right = right.withColumn(
                "_bkt", hyperplane_bucket("_remb", lsh_dim, n_planes)
            )
            cand = left.join(right, "_bkt")
    elif blocking_vars:
        cand = left.join(
            right, [f"_b{i}" for i in range(len(blocking_vars))]
        )
    else:
        cand = left.crossJoin(right)

    from pyspark.sql import Window

    w = Window.partitionBy("_lid").orderBy(
        F.col("_score").desc(), F.col("_rid").asc(), F.col("_rkey").asc()
    )
    if scored is None:
        scored = cand.withColumn("_score", score).filter(
            F.col("_score") >= F.lit(sim_threshold)
        )
    best = (
        scored
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "_lid",
            F.col("_rid").alias("entity_id"),
            F.col("_rkey").alias("matched_key"),
            F.col("_score").alias("score"),
        )
    )
    base = new.select(
        F.col(id_col).cast("long").alias("_lid"),
        serialize_columns(
            [on] if isinstance(on, str) else list(on)
        ).alias("key"),
    )
    return base.join(best, "_lid", "left").select(
        F.col("_lid").alias("record_id"),
        "key", "entity_id", "matched_key", "score",
    )


def sorted_neighborhood_pairs(
    df1: DataFrame,
    df2: DataFrame,
    *,
    left_on,
    right_on,
    left_id_col: str,
    right_id_col: str,
    window: int = 5,
    prefix_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995 merge/purge): sort BOTH sides' records by the serialized key
    and emit every cross-side pair within ``window`` positions —
    the classic blocking alternative when no clean equi-join blocking
    key exists (catches near-matches that differ in their blocking
    attribute, which equality blocking structurally misses).

    Returns (``left_id``, ``right_id``, ``rank_gap``) candidate pairs
    (gap = |sort positions|, 1..window); score them with
    :func:`match_pairs`-style scorers or ``lev_sim`` downstream.

    Scale shape — the global sort WITHOUT a global window: records
    bucket by a ``prefix_len``-character key prefix (prefix order is
    consistent with full-key order, so bucket-then-key ordering IS the
    global ordering); in-bucket ranks come from a per-bucket window
    and bucket offsets from a running sum over the TINY bucket-count
    relation (the top_vocab single-partition-over-survivors pattern).
    The pair join is a band equi-join on ``floor(rank/window)`` (each
    left row probes its band and the two adjacent ones) — never a
    theta join. A hot prefix bucket concentrates one window partition:
    raise ``prefix_len`` until buckets are balanced, the operator's
    one skew knob.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if prefix_len < 1:
        raise ValueError("prefix_len must be >= 1")
    require_integral_id(df1, left_id_col, "sorted_neighborhood_pairs")
    require_integral_id(df2, right_id_col, "sorted_neighborhood_pairs")
    from pyspark.sql import Window as W

    lkey = serialize_columns([left_on] if isinstance(left_on, str) else list(left_on))
    rkey = serialize_columns([right_on] if isinstance(right_on, str) else list(right_on))
    u = (
        df1.select(
            F.lit(0).alias("_side"),
            F.col(left_id_col).cast("long").alias("_rid"),
            lkey.alias("_key"),
        )
        .unionByName(
            df2.select(
                F.lit(1).alias("_side"),
                F.col(right_id_col).cast("long").alias("_rid"),
                rkey.alias("_key"),
            )
        )
        .withColumn("_bkt", F.substring("_key", 1, prefix_len))
        .localCheckpoint(eager=False)
    )
    counts = u.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_bn"))
    # running offset over the bucket relation — |buckets| rows, the
    # only unbounded-window stage, bounded by the key-prefix domain
    off_w = W.orderBy(F.col("_bkt").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_bn").over(off_w), F.lit(0))
    ).select("_bkt", "_off")
    in_w = W.partitionBy("_bkt").orderBy(
        F.col("_key").asc(), F.col("_side").asc(), F.col("_rid").asc()
    )
    ranked = (
        u.withColumn("_r", F.row_number().over(in_w))
        .join(F.broadcast(offsets), "_bkt")
        .select(
            "_side", "_rid", (F.col("_r") + F.col("_off")).alias("_rank")
        )
        .localCheckpoint(eager=False)
    )
    l = ranked.filter(F.col("_side") == 0).select(
        F.col("_rid").alias("left_id"),
        F.col("_rank").alias("_lr"),
        F.explode(
            F.array(
                F.floor(F.col("_rank") / window) - 1,
                F.floor(F.col("_rank") / window),
                F.floor(F.col("_rank") / window) + 1,
            )
        ).alias("_band"),
    )
    r = ranked.filter(F.col("_side") == 1).select(
        F.col("_rid").alias("right_id"),
        F.col("_rank").alias("_rr"),
        F.floor(F.col("_rank") / window).alias("_band"),
    )
    return (
        l.join(r, "_band")
        .filter(F.abs(F.col("_lr") - F.col("_rr")) <= window)
        .select(
            "left_id",
            "right_id",
            F.abs(F.col("_lr") - F.col("_rr")).cast("int").alias("rank_gap"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )


def match_pairs_weighted(
    df1: DataFrame,
    df2: DataFrame,
    *,
    fields: list[tuple],
    left_id_col: str,
    right_id_col: str,
    sim_threshold: float,
    blocking_vars: list[str] | None = None,
) -> DataFrame:
    """Field-weighted record comparison (the Fellegi-Sunter-shaped
    scoring rule every production linkage system uses): each field
    contributes ``weight * field_similarity`` and the pair score is
    their sum — name similarity dominating, address/code/amount fields
    refining, all in one threshold.

    ``fields`` entries are ``(left_col, right_col, weight, kind)``:
    - ``'lev'``   : normalized edit similarity of the string forms
    - ``'exact'`` : 1.0 on null-safe equality else 0.0
    - ``'num'``   : 1 - |a-b| / max(|a|, |b|, 1) (scale-relative
      numeric proximity; nulls score 0)
    The weighted sum accumulates in ``fields`` order (order-pinned
    floats — the SQL oracle mirrors the same chain). Weights are the
    caller's calibration; they need not sum to 1, the threshold is on
    the raw sum. Returns (``left_id``, ``right_id``, ``score``).

    Blocking and the candidate plan are exactly :func:`match_pairs`'s
    (equi-join on blocking values, else cross); the scorer is still a
    pure JVM expression.
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    require_integral_id(df1, left_id_col, "match_pairs_weighted")
    require_integral_id(df2, right_id_col, "match_pairs_weighted")
    for lc, rc in _norm_blocking(blocking_vars):
        if lc not in df1.columns:
            raise ValueError(f"blocking var {lc!r} not in left frame")
        if rc not in df2.columns:
            raise ValueError(f"blocking var {rc!r} not in right frame")
    from ..functions.similarity import lev_sim

    blocks = _norm_blocking(blocking_vars)
    lcols = [F.col(lc).alias(f"_f{i}_l") for i, (lc, *_rest) in enumerate(fields)]
    rcols = [F.col(rc).alias(f"_f{i}_r") for i, (_lc, rc, *_rest) in enumerate(fields)]
    lb = [F.col(lc).alias(f"_b{i}") for i, (lc, _) in enumerate(blocks)]
    rb = [F.col(rc).alias(f"_b{i}") for i, (_, rc) in enumerate(blocks)]
    left = df1.select(
        F.col(left_id_col).cast("long").alias("_lid"), *lcols, *lb
    )
    right = df2.select(
        F.col(right_id_col).cast("long").alias("_rid"), *rcols, *rb
    )
    if blocking_vars:
        cand = left.join(right, [f"_b{i}" for i in range(len(blocks))])
    else:
        cand = left.crossJoin(right)

    score = None
    for i, (_lc, _rc, weight, kind) in enumerate(fields):
        a, b = F.col(f"_f{i}_l"), F.col(f"_f{i}_r")
        if kind == "lev":
            s = lev_sim(
                F.coalesce(a.cast("string"), F.lit("")),
                F.coalesce(b.cast("string"), F.lit("")),
            )
        elif kind == "exact":
            s = F.when(a.eqNullSafe(b), F.lit(1.0)).otherwise(F.lit(0.0))
        elif kind == "num":
            ad, bd = a.cast("double"), b.cast("double")
            s = F.when(
                ad.isNotNull() & bd.isNotNull(),
                F.lit(1.0)
                - F.abs(ad - bd) / F.greatest(F.abs(ad), F.abs(bd), F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        else:
            raise ValueError(f"unknown field kind {kind!r}; use lev|exact|num")
        t = F.lit(float(weight)) * s
        score = t if score is None else score + t
    return (
        cand.withColumn("score", score)
        .filter(F.col("score") >= F.lit(float(sim_threshold)))
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            "score",
        )
    )
