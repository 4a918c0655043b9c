"""Similarity search over an embedding column (north-star extension).

Three execution strategies behind one API:

- ``exact_cross``    : normalize -> cross join -> dot -> window top-k.
  Exact, declarative, oracle-checkable. Right plan when one side is
  small (Catalyst broadcasts it).
- ``broadcast_knn``  : corpus vectors broadcast once per executor,
  numpy matmul top-k per Arrow batch (exact scores, O(|Q|·k) output).
  The single-node-beating throughput path while the corpus fits in
  executor memory.
- ``lsh_hyperplane`` : deterministic random-hyperplane LSH (sign-bit
  bucket join) with exact re-rank inside buckets. Approximate recall,
  near-linear cost — the 100 TB path. Hyperplanes are derived by pure
  integer arithmetic (Knuth multiplicative hash), so the whole plan
  stays reproducible across runs and engines: no RNG state anywhere.
- ``exact_int8``     : symmetric per-vector int8 quantization of the
  normalized vectors, then the exact-cross plan on integer dot
  products rescaled by the two per-vector scales. 4x less scan/
  shuffle/broadcast bandwidth than float32 and the integer
  accumulation is order-independent (exact under any summation
  order), so it stays fully oracle-checkable; scores deviate from
  true cosine by the quantization error (~1e-3 at dim 64).
  ``quantize_embeddings`` exposes the same transform for storing a
  quantized copy of a 100 TB embedding table at rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from . import knn_join as KJ

KNUTH = 2654435761
MOD31 = 2147483648  # 2^31


def hyperplane_component(h: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5)."""
    return ((h * 64 + j + 1) * KNUTH % MOD31) / MOD31 - 0.5


def hyperplane_bucket(vec: Column | str, dim: int, n_planes: int = 12,
                      plane_offset: int = 0) -> Column:
    """Sign-bit bucket id of ``vec`` against n_planes fixed hyperplanes.

    Pass a SQL-text fragment (e.g. a column name) to build the whole
    n_planes x dim expression as ONE F.expr parse — the Column form
    costs ~n_planes*dim py4j roundtrips (~1 s of driver time at
    64x6). Both forms produce the same sequential-fold dot, so bucket
    ids are bit-identical (repr() round-trips the exact coefficient
    doubles; mirrored in oracle.sql_hyperplane_bucket).

    ``plane_offset`` selects an INDEPENDENT plane set (plane h reads
    coefficient stream position h + plane_offset) — the multi-table
    OR-construction's knob: table t uses offset t*n_planes, so no two
    tables share a plane."""
    if isinstance(vec, str):
        terms = []
        for h in range(n_planes):
            coeffs = "array(" + ", ".join(
                f"{hyperplane_component(h + plane_offset, j)!r}D"
                for j in range(dim)
            ) + ")"
            dot = (
                f"aggregate(zip_with({vec}, {coeffs}, "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << h} ELSE 0 END)")
        return F.expr("(" + " + ".join(terms) + ")")
    bucket = F.lit(0)
    for h in range(n_planes):
        coeffs = F.array(*[
            F.lit(hyperplane_component(h + plane_offset, j))
            for j in range(dim)
        ])
        dot = S.dot(vec, coeffs)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << h)).otherwise(F.lit(0))
    return bucket


def _ids_nullsafe(s):
    """Ids of an Arrow batch as int64 numpy — or, when the column
    carries nulls, as a pandas nullable-Int64 series. Ids reach the
    key-kernels through ``cast('long')``, so a non-castable id
    (string/UUID — entity.py documents these flowing through as null
    on the relational paths) arrives in pandas as NaN and a plain
    ``to_numpy(dtype=np.int64)`` would raise, failing the task where
    the replaced relational plan silently passed the null through
    (round-14 advisory). Null ids keep their bucket rows; downstream
    consumers see exactly what the relational join emitted."""
    import numpy as np

    if s.isna().any():
        return s.astype("Int64").reset_index(drop=True)
    return s.to_numpy(dtype=np.int64)


def hyperplane_bucket_keys_arrow(
    df: DataFrame,
    id_col: str,
    key_col: str,
    encoder,
    dim: int,
    n_planes: int,
    bucket_col: str = "_bkt",
    plane_offset: int = 0,
) -> DataFrame:
    """(bucket, id, key) via ONE Arrow pass: embed the key strings with
    ``encoder.encode_batch`` (the bit-identical numpy mirror of the
    relational encode) and take the hyperplane sign bucket in-kernel.

    Replaces the relational encode (distinct + explode + wide aggregate
    + join-back — 2-3 exchanges) plus the bucket expression, and leaves
    the KEY STRING as the row payload so a downstream in-kernel
    re-score (knn_join.bucket_dot_rescored_pairs with ``encoder``)
    never shuffles an embedding array at all.

    Bit-parity with :func:`hyperplane_bucket`: the dot folds per
    DIMENSION left-associated from 0.0 (same rounding sequence as the
    aggregate fold), coefficients are the same exact doubles, and the
    sign test is ``>= 0`` — embeddings are never NaN (counts / clipped
    norms), so numpy and SQL comparison semantics agree."""
    import numpy as np

    C = np.array(
        [[hyperplane_component(h + plane_offset, j) for j in range(dim)]
         for h in range(n_planes)],
        dtype=np.float64,
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = encoder.encode_batch(pdf[key_col].tolist())
            b = np.zeros(len(pdf), dtype=np.int64)
            for h in range(n_planes):
                acc = np.zeros(len(pdf), dtype=np.float64)
                for j in range(dim):
                    acc = acc + E[:, j] * C[h, j]
                b = b + np.where(acc >= 0, np.int64(1 << h), np.int64(0))
            yield pd.DataFrame({
                bucket_col: b,
                id_col: _ids_nullsafe(pdf[id_col]),
                key_col: pdf[key_col],
            })

    return KJ.ensure_parallelism(df).mapInPandas(
        gen, schema=f"{bucket_col} long, {id_col} long, {key_col} string"
    )


def hyperplane_probe_buckets_keys_arrow(
    df: DataFrame,
    id_col: str,
    key_col: str,
    encoder,
    dim: int,
    n_planes: int,
    n_extra: int,
    bucket_col: str = "_bkt",
    plane_offset: int = 0,
) -> DataFrame:
    """Multi-probe twin of :func:`hyperplane_bucket_keys_arrow`: emits
    the exact bucket plus ``n_extra`` least-confident-bit flips per
    input row (1 + n_extra rows each), all from ONE Arrow pass over the
    raw key strings. Bit-parity with :func:`hyperplane_probe_buckets`:
    the same per-dimension dot fold, the same O(n_planes^2) counting
    rank with the ``k < h`` tie (|d_k| <= |d_h| for k < h, strict for
    k > h), the same ``b0 ^ mask`` flips — the expressions' numpy
    transliteration over the identical doubles."""
    import numpy as np

    if not 0 <= n_extra < n_planes:
        raise ValueError("n_extra must be in [0, n_planes)")
    C = np.array(
        [[hyperplane_component(h + plane_offset, j) for j in range(dim)]
         for h in range(n_planes)],
        dtype=np.float64,
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = encoder.encode_batch(pdf[key_col].tolist())
            n = len(pdf)
            D = np.empty((n, n_planes), dtype=np.float64)
            for h in range(n_planes):
                acc = np.zeros(n, dtype=np.float64)
                for j in range(dim):
                    acc = acc + E[:, j] * C[h, j]
                D[:, h] = acc
            b0 = np.zeros(n, dtype=np.int64)
            for h in range(n_planes):
                b0 = b0 + np.where(D[:, h] >= 0, np.int64(1 << h),
                                   np.int64(0))
            A = np.abs(D)
            rank = np.zeros((n, n_planes), dtype=np.int64)
            for h in range(n_planes):
                for k in range(n_planes):
                    if k == h:
                        continue
                    if k < h:
                        rank[:, h] += A[:, k] <= A[:, h]
                    else:
                        rank[:, h] += A[:, k] < A[:, h]
            probes = [b0]
            for r in range(n_extra):
                mask = np.zeros(n, dtype=np.int64)
                for h in range(n_planes):
                    mask = mask + np.where(rank[:, h] == r,
                                           np.int64(1 << h), np.int64(0))
                probes.append(np.bitwise_xor(b0, mask))
            ids = _ids_nullsafe(pdf[id_col])
            keys = pdf[key_col].to_numpy()
            yield pd.DataFrame({
                bucket_col: np.concatenate(probes),
                id_col: (
                    np.tile(ids, 1 + n_extra)
                    if isinstance(ids, np.ndarray)
                    else pd.concat([ids] * (1 + n_extra),
                                   ignore_index=True)
                ),
                key_col: np.tile(keys, 1 + n_extra),
            })

    return KJ.ensure_parallelism(df).mapInPandas(
        gen, schema=f"{bucket_col} long, {id_col} long, {key_col} string"
    )


# routing budget for the exact ANN broadcast tier (the string scorer's
# LEV_BROADCAST_MIN_PAIRS pattern, round 13): at or above this many
# estimated |Q| x |C| pairs — provided the corpus side also fits the
# broadcast byte budget (knn_join.BROADCAST_KNN_CONF) — mode
# 'exact_cross' / 'exact_int8' runs its scoring as ONE numpy kernel
# with the corpus closure-shipped instead of the declarative
# cross join + interpreted fold + window top-k. Results are
# BIT-identical either way (the kernel replays the fold orders — see
# _broadcast_dot_topk / _broadcast_int8_topk), so this is purely a
# plan choice; tiny inputs keep the declarative plan (least overhead,
# and it IS the semantics definition).
ANN_BROADCAST_MIN_PAIRS_CONF = "spark.linktransformer.ann.exactBroadcastMinPairs"
ANN_BROADCAST_MIN_PAIRS_DEFAULT = 100_000


def _use_exact_broadcast(q: DataFrame, c: DataFrame) -> bool:
    """True when the exact modes should take the broadcast-numpy tier:
    pair estimate >= ANN_BROADCAST_MIN_PAIRS_CONF and the corpus within
    the broadcast byte budget — all from Catalyst plan bytes, NO jobs:
    a corpus with unknown stats (RDD-backed / checkpointed relations)
    keeps the declarative plan rather than paying a count. That is the
    opposite polarity from merge's auto ladder, deliberately: there an
    unknown size risks a 24-minute cartesian, here the caller chose an
    exact mode explicitly and both routes are exact — the cheap,
    historical plan is the safe default and the conf pins the kernel
    when wanted. min_pairs <= 0 force-pins the kernel (tests), and row
    over-estimation from plan bytes errs toward the kernel."""
    spark = c.sparkSession
    try:
        min_pairs = int(spark.conf.get(
            ANN_BROADCAST_MIN_PAIRS_CONF,
            str(ANN_BROADCAST_MIN_PAIRS_DEFAULT)))
    except Exception:  # noqa: BLE001 — conf read must never break the plan
        min_pairs = ANN_BROADCAST_MIN_PAIRS_DEFAULT
    if min_pairs <= 0:
        return True
    size = KJ.plan_size_bytes(c)
    if size is None:
        return False
    try:
        cap = int(spark.conf.get(KJ.BROADCAST_KNN_CONF,
                                 str(KJ.BROADCAST_KNN_DEFAULT_BYTES)))
    except Exception:  # noqa: BLE001
        cap = KJ.BROADCAST_KNN_DEFAULT_BYTES
    if size > cap:
        return False
    qsize = KJ.plan_size_bytes(q)
    if qsize is None:
        return False
    pairs = KJ._est_rows(q, qsize) * KJ._est_rows(c, size)
    return pairs >= min_pairs


def _collect_corpus(c: DataFrame):
    """(ids int64 ascending, raw float64 matrix) from a bounded
    (RIGHT_ID, RIGHT_EMB) frame — one Arrow toPandas of the raw
    columns (no expressions to plan), ids pre-sorted ascending for the
    stable-argsort tie-break discipline."""
    import numpy as np

    pdf = c.select(KJ.RIGHT_ID, KJ.RIGHT_EMB).toPandas()
    r_ids = pdf[KJ.RIGHT_ID].to_numpy(dtype=np.int64)
    r_mat = (
        np.array(pdf[KJ.RIGHT_EMB].tolist(), dtype=np.float64)
        if len(pdf) else np.zeros((0, 1), dtype=np.float64)
    )
    order = np.argsort(r_ids, kind="stable")
    return r_ids[order], r_mat[order]


def _l2n_numpy(V):
    """Numpy replica of ``S.l2_normalize`` — bit-exact: the squared
    norm accumulates PER DIMENSION left-associated from 0.0 (the
    ``aggregate(zip_with(a, a, x*y))`` fold), then the same
    ``max(sqrt(.), 1e-12)`` clip and elementwise divide. The identical
    transliteration is already pytest-pinned inside
    ``_mmr_rerank_grouped``. Float32 inputs widen exactly (the JVM
    path's cast('double') is the same value)."""
    import numpy as np

    if V.size == 0:
        return V
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for j in range(V.shape[1]):
        acc = acc + V[:, j] * V[:, j]
    nrm = np.maximum(np.sqrt(acc), 1e-12)
    return V / nrm[:, None]


def _quantize_numpy(Vn):
    """Numpy replica of ``_quantize_expr`` over NORMALIZED vectors —
    bit-exact: abs + order-free row max, the same
    ``max(absmax, 1e-12) / 127.0`` scale (two IEEE double ops), and
    ``floor(x / scale + 0.5)`` per element (divide, add, floor — the
    identical op sequence; codes are exact small integers, so the
    int64 carrier equals the JVM's floor->long->int chain)."""
    import numpy as np

    if Vn.size == 0:
        return Vn.astype(np.int64), np.zeros(0, dtype=np.float64)
    absmax = np.max(np.abs(Vn), axis=1)
    scale = np.maximum(absmax, 1e-12) / 127.0
    codes = np.floor(Vn / scale[:, None] + 0.5).astype(np.int64)
    return codes, scale


def _broadcast_dot_topk(q: DataFrame, c: DataFrame, k: int) -> DataFrame:
    """mode='exact_cross' scoring as one mapInPandas kernel: the
    (id, vec) corpus is collected + closure-broadcast and each query
    Arrow batch computes its PER-ROW top-k against it in numpy — no
    |Q| x |C| cross-join materialization, no interpreted per-pair
    fold. The caller applies the usual global ``KJ.topk`` window on
    the (|Q| x k)-row output: per-row top-k under (score DESC,
    right_id ASC) is a superset filter for that window (any dropped
    candidate has k row-mates strictly preferred to it), so the final
    rows are identical to the declarative plan even when query ids
    repeat or are null (the window pools those partitions exactly as
    before).

    BIT-parity of the scores (the established replica rules —
    bucket_dot_rescored_pairs, _broadcast_lev_knn):

    - inputs are the same JVM-computed L2-normalized vectors (the
      kernel never re-normalizes);
    - scores accumulate PER DIMENSION left-associated from 0.0
      (``acc += Q[:, j] * C[:, j]``) — every product and partial sum
      rounds exactly like the ``aggregate(zip_with(...))`` fold in
      S.dot;
    - per-row selection: corpus ids pre-sorted ascending + stable
      argsort on -score == the (score DESC, right_id ASC) order
      (embeddings are never NaN — l2_normalize clips the norm — so
      the argsort order matches SQL DESC exactly).

    Inputs carry the RAW vectors — L2 normalization runs in numpy as
    the pinned replica of ``S.l2_normalize`` (``_l2n_numpy``; the same
    per-dim fold + clip + divide already relied on bit-exactly by
    ``_mmr_rerank_grouped``), which keeps the corpus collect a bare
    column scan with no higher-order expressions to plan — measured
    ~1.5s of the kernel route's per-query construction was the
    collect job's expression planning.

    Returns (LEFT_ID, RIGHT_ID, score) — min(k, |C|) rows per query
    row."""
    import numpy as np

    r_ids, r_mat = _collect_corpus(c)
    r_mat = _l2n_numpy(r_mat)
    spark = q.sparkSession
    b = spark.sparkContext.broadcast((r_ids, r_mat))
    kk = k

    def gen(batches):
        import pandas as pd

        ids, mat = b.value
        m = len(ids)
        take = min(kk, m)
        if take == 0:
            return
        d = mat.shape[1]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            Q = _l2n_numpy(
                np.array(pdf[KJ.LEFT_EMB].tolist(), dtype=np.float64)
            )
            acc = np.zeros((n, m), dtype=np.float64)
            for j in range(d):
                acc += Q[:, j:j + 1] * mat[:, j]
            idx = np.argsort(-acc, axis=1, kind="stable")[:, :take]
            yield pd.DataFrame({
                # id pass-through via index-repeat (no dtype coercion —
                # a null query id stays null, as in the window plan)
                KJ.LEFT_ID: pdf[KJ.LEFT_ID].iloc[
                    np.repeat(np.arange(n), take)
                ].reset_index(drop=True),
                KJ.RIGHT_ID: ids[idx].reshape(-1),
                "score": np.take_along_axis(acc, idx, axis=1).reshape(-1),
            })

    return q.mapInPandas(
        gen,
        schema=f"{KJ.LEFT_ID} long, {KJ.RIGHT_ID} long, score double",
    )


def _broadcast_int8_topk(q: DataFrame, c: DataFrame, k: int) -> DataFrame:
    """mode='exact_int8' scoring as one mapInPandas kernel (same
    contract and raw-vector inputs as :func:`_broadcast_dot_topk` —
    per-row top-k, the caller's global ``KJ.topk`` window finalizes).
    Normalization and quantization run in numpy on BOTH sides as the
    pinned bit-exact replicas (``_l2n_numpy`` + ``_quantize_numpy``),
    so the collected corpus codes and the per-batch query codes are
    the exact values the declarative plan would join; the scoring
    replay:

    - the integer dot is exact in int64 under ANY summation order
      (codes lie in [-127, 127], so |dot| <= dim * 127^2 — numpy's
      int64 matmul cannot overflow or round);
    - the float score replays Spark's left-associated
      ``Multiply(Multiply(cast(dot AS double), _lscale), _rscale)``:
      ``(D.astype(f64) * ls[:, None]) * rs[None, :]`` performs the
      same two IEEE double multiplies per pair in the same order;
    - per-row selection exactly as :func:`_broadcast_dot_topk`
      (ids ascending + stable argsort on -score).

    Returns (LEFT_ID, RIGHT_ID, score)."""
    import numpy as np

    r_ids, r_raw = _collect_corpus(c)
    r_codes, r_scale = _quantize_numpy(_l2n_numpy(r_raw))
    spark = q.sparkSession
    b = spark.sparkContext.broadcast((r_ids, r_codes, r_scale))
    kk = k

    def gen(batches):
        import pandas as pd

        ids, codes, scale = b.value
        m = len(ids)
        take = min(kk, m)
        if take == 0:
            return
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            Lq, ls = _quantize_numpy(_l2n_numpy(
                np.array(pdf[KJ.LEFT_EMB].tolist(), dtype=np.float64)
            ))
            D = Lq @ codes.T  # exact integer dots
            sc = (D.astype(np.float64) * ls[:, None]) * scale[None, :]
            idx = np.argsort(-sc, axis=1, kind="stable")[:, :take]
            yield pd.DataFrame({
                KJ.LEFT_ID: pdf[KJ.LEFT_ID].iloc[
                    np.repeat(np.arange(n), take)
                ].reset_index(drop=True),
                KJ.RIGHT_ID: ids[idx].reshape(-1),
                "score": np.take_along_axis(sc, idx, axis=1).reshape(-1),
            })

    return q.mapInPandas(
        gen,
        schema=f"{KJ.LEFT_ID} long, {KJ.RIGHT_ID} long, score double",
    )


_INT8_QMAX = 127


def _quantize_expr(vec: Column) -> tuple[Column, Column]:
    """(int8 codes as array<int>, per-vector float scale) for a numeric
    array. Symmetric max-abs scaling; code = floor(x/scale + 0.5)
    (round-half-up — identical in Spark and DuckDB, unlike banker's
    rounding). Codes lie in [-127, 127]."""
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.greatest(absmax, F.lit(1e-12)) / F.lit(float(_INT8_QMAX))
    codes = F.transform(
        vec, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")
    )
    return codes, scale.cast("double")


def quantize_embeddings(
    df: DataFrame,
    vector_col: str = "embedding",
    *,
    codes_col: str = "q_codes",
    scale_col: str = "q_scale",
    normalize: bool = True,
) -> DataFrame:
    """Add symmetric int8 quantization columns for ``vector_col``.

    With ``normalize=True`` (the cosine-search convention) the vector
    is L2-normalized before quantization, so dequantized dot products
    approximate cosine directly. Map-only — safe to run as a storage
    rewrite over any corpus size; downstream, ``ann_topk`` mode
    ``exact_int8`` consumes these columns' transform inline."""
    vec = F.col(vector_col)
    if normalize:
        vec = S.l2_normalize(vec)
    codes, scale = _quantize_expr(vec)
    return df.withColumn(codes_col, codes).withColumn(scale_col, scale)


def _int_dot(a: Column, b: Column) -> Column:
    """Integer dot product accumulated in long — exact, order-free."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    mode: str = "exact_cross",
    n_planes: int | str = 12,
    dim: int | None = None,
    multi_probe: int = 0,
    max_bucket_size: int | None = None,
    hot_bucket: str = "salt",
    n_tables: int = 1,
) -> DataFrame:
    """Top-k nearest corpus rows per query row by cosine.

    ``n_tables`` (lsh_hyperplane only): the classic multi-table
    OR-construction — L independent plane sets (coefficient-stream
    offset t*n_planes per table), candidate union deduped on pair ids.
    Recall ~ 1-(1-p)^L at ~L x probe cost; composes with
    ``multi_probe`` (probes multiply per table) and the skew guards
    (applied per table). Default 1 keeps the byte-stable single-table
    plan the SQL mirrors pin.

    Returns (query_id, neighbor_id, rank, score). Deterministic
    tie-break (score DESC, neighbor_id ASC) everywhere.
    ``multi_probe`` (lsh_hyperplane only): additionally probe that
    many flipped-least-confident-bit buckets per query — recall
    recovery at (1 + multi_probe)x probe cost, corpus side untouched
    (see :func:`hyperplane_probe_buckets`).

    ``n_planes`` (lsh_hyperplane only) accepts ``"auto"`` —
    ceil(log2(n_corpus/256)) via :func:`resolve_n_planes`. The plane
    count must GROW with the corpus (one plane per doubling): at a
    FIXED n_planes the candidate join volume is quadratic in corpus
    size (bucket count is pinned at 2^n_planes), the super-linear
    cliff the sf1 scale sweep measures. Pin an int when you need a
    byte-stable SQL mirror of the bucketing.

    ``max_bucket_size`` (lsh_hyperplane only) is the hot-bucket skew
    guard — a sign-bucket that concentrates near-identical vectors
    (duplicate embeddings, a dense cluster) concentrates one join
    partition. ``hot_bucket='salt'`` (the default HERE, unlike the
    dedup family: dropping an ANN bucket silently empties those
    queries' result lists, a worse failure than extra latency)
    grid-partitions hot buckets two-sidedly with output identical to
    the uncapped join and per-task work bounded at ~cap^2;
    ``'drop'`` removes hot buckets from BOTH sides (queries in them
    return no candidates — only for telemetry-guarded pipelines).
    """
    # fan the query side out up front: single-file inputs otherwise run
    # the scoring stage (mapInPandas matmul / NLJ / bucket join probe)
    # on one core in every mode
    qpar = KJ.ensure_parallelism(queries)
    if mode in ("exact_cross", "exact_int8") and _use_exact_broadcast(
        qpar, corpus
    ):
        # broadcast-numpy tier (round 14): the kernels take the RAW
        # vectors (normalize/quantize replayed bit-exactly in numpy —
        # see their parity docstrings), so neither side plans any
        # higher-order expression; rows are bit-identical to the
        # declarative branches below, pytest- and oracle-pinned.
        q_raw = qpar.select(
            F.col(query_id).cast("long").alias(KJ.LEFT_ID),
            F.col(vector_col).alias(KJ.LEFT_EMB),
        )
        c_raw = corpus.select(
            F.col(corpus_id).cast("long").alias(KJ.RIGHT_ID),
            F.col(vector_col).alias(KJ.RIGHT_EMB),
        )
        kernel = (
            _broadcast_dot_topk if mode == "exact_cross"
            else _broadcast_int8_topk
        )
        ranked = KJ.topk(kernel(q_raw, c_raw, k), k).withColumnRenamed(
            "_lt_rank", "rank"
        )
        return ranked.select(
            F.col(KJ.LEFT_ID).alias("query_id"),
            F.col(KJ.RIGHT_ID).alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("score").alias("score"),
        )
    q = qpar.select(
        F.col(query_id).cast("long").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    c = corpus.select(
        F.col(corpus_id).cast("long").alias(KJ.RIGHT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.RIGHT_EMB),
    )

    if mode == "broadcast_knn":
        scorer = _CosOnPrepared()
        cand = KJ._broadcast_knn(q, c, scorer, k=k)
        w = Window.partitionBy(KJ.LEFT_ID).orderBy(F.col("score").desc(), F.col(KJ.RIGHT_ID).asc())
        ranked = cand.withColumn("rank", F.row_number().over(w))
    elif mode == "lsh_hyperplane":
        if dim is None:
            raise ValueError("lsh_hyperplane mode needs dim=")
        if n_tables < 1:
            raise ValueError("n_tables must be >= 1")
        n_planes = resolve_n_planes(n_planes, c.count)
        parts = []
        for t in range(n_tables):
            off = t * n_planes
            if multi_probe:
                qb = hyperplane_probe_buckets(
                    q, KJ.LEFT_EMB, dim, n_planes, multi_probe,
                    plane_offset=off,
                )
            else:
                qb = q.withColumn(
                    "_bkt",
                    hyperplane_bucket(KJ.LEFT_EMB, dim, n_planes,
                                      plane_offset=off),
                )
            cb = c.withColumn(
                "_bkt",
                hyperplane_bucket(KJ.RIGHT_EMB, dim, n_planes,
                                  plane_offset=off),
            )
            keys = ["_bkt"]
            if max_bucket_size is not None:
                from .dedup import _cap_buckets, _salt_two_sided

                if hot_bucket == "salt":
                    # a (query, corpus) pair shares exactly ONE
                    # (_bkt, _salt) grid cell (the bipartite salt
                    # contract), so the cell IS the cogroup key
                    qb, cb = _salt_two_sided(
                        qb, cb, ["_bkt"], max_bucket_size,
                        id_col=KJ.LEFT_ID, rid_col=KJ.RIGHT_ID,
                    )
                    keys = ["_bkt", "_salt"]
                elif hot_bucket == "drop":
                    qb = _cap_buckets(qb, ["_bkt"], max_bucket_size)
                    cb = _cap_buckets(cb, ["_bkt"], max_bucket_size)
                else:
                    raise ValueError(
                        f"hot_bucket must be 'drop' or 'salt', got "
                        f"{hot_bucket!r}"
                    )
            # in-bucket re-score as the Arrow numpy cogroup — bit-equal
            # to the S.dot fold and free of its interpreted
            # per-candidate-row floor in shuffled join stages
            # (knn_join.bucket_dot_rescored_pairs); in-group top-k
            # pre-pruning bounds the global window's input at k per
            # (query, cell) without changing its result
            parts.append(KJ.bucket_dot_rescored_pairs(
                qb.select(*keys, KJ.LEFT_ID, KJ.LEFT_EMB),
                cb.select(*keys, KJ.RIGHT_ID, KJ.RIGHT_EMB),
                keys, k=k,
            ))
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
        if n_tables > 1:
            # the OR-construction (n_tables independent plane sets,
            # plane_offset t*n_planes): a pair found by several tables
            # carries the identical exact score — dedup on ids alone.
            # recall ~ 1-(1-p)^L at ~L x probe cost, the standard
            # lever when one table's co-residency caps recall
            # (measured: PLANS.md round 10)
            cand = cand.dropDuplicates([KJ.LEFT_ID, KJ.RIGHT_ID])
        ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    elif mode == "exact_cross":
        cand = q.crossJoin(c).withColumn(
            "score", S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))
        )
        ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    elif mode == "exact_int8":
        lc, ls = _quantize_expr(F.col(KJ.LEFT_EMB))
        rc, rs = _quantize_expr(F.col(KJ.RIGHT_EMB))
        qq = q.select(KJ.LEFT_ID, lc.alias("_lq"), ls.alias("_lscale"))
        cc = c.select(KJ.RIGHT_ID, rc.alias("_rq"), rs.alias("_rscale"))
        cand = qq.crossJoin(cc).withColumn(
            "score",
            _int_dot(F.col("_lq"), F.col("_rq")).cast("double")
            * F.col("_lscale") * F.col("_rscale"),
        )
        ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return ranked.select(
        F.col(KJ.LEFT_ID).alias("query_id"),
        F.col(KJ.RIGHT_ID).alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").alias("score"),
    )


class _CosOnPrepared:
    needs_embeddings = True

    @staticmethod
    def score() -> Column:
        return S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partitioned scale path.
#
# Candidate generation becomes an EQUI-JOIN on cell id: corpus rows are
# assigned to their nearest centroid (spherical k-means, deterministic
# seeded init + fixed Lloyd iterations), queries probe their n_probe
# nearest cells, and Catalyst hash-partitions both sides on the cell id
# — per-task work is |cell| x |queries probing it|, no broadcast of the
# corpus, no cross join. This is the IVF-Flat design of FAISS
# (the reference's index is IndexFlatIP — brute force;
# /root/reference/src/linktransformer/infer.py:144-151 — so this mode
# is an extension, not a parity surface) re-expressed as a join.
#
# Determinism: centroid init = the n_cells corpus vectors with smallest
# ids; Lloyd updates are float averages whose partition-order drift is
# sub-ulp in practice but not guaranteed — hence no SQL oracle for this
# mode (driver records the weaker rows-only check; the pytest gate
# asserts recall against the exact path instead).
# ---------------------------------------------------------------------------


def _assign_cells(df: DataFrame, vec_col: str, id_col: str, bc, n_probe: int) -> DataFrame:
    """(id, vec, cell) rows: each input row replicated once per probed
    centroid (numpy argsort over the broadcast centroid matrix,
    Arrow-batched). The VECTOR passes through the stage so the caller
    can equi-join assignments directly on ``cell`` — no join back to
    the input by id (saves one shuffle join per side; the map-side
    Arrow cost of shipping the vector is linear and local)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField(id_col, LongType()),
        StructField(vec_col, ArrayType(DoubleType())),
        StructField("cell", IntegerType()),
    ])

    def gen(batches):
        C = bc.value  # (m, d) L2-normalized
        take = min(n_probe, len(C))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype="float64")
            s = V @ C.T
            cells = np.argsort(-s, axis=1, kind="stable")[:, :take]
            out = pdf.loc[pdf.index.repeat(take)].reset_index(drop=True)
            out["cell"] = cells.reshape(-1).astype("int32")
            yield out

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def ivf_train_centroids(
    corpus: DataFrame, vec_col: str, id_col: str, n_cells: int, n_iter: int = 2,
    sample=None, sample_exhausted: bool = False,
):
    """Spherical k-means centroids as a numpy array (n_cells, d).

    Training runs DRIVER-SIDE on a bounded deterministic sample (the
    ``sample_rows`` smallest-id vectors, one TakeOrdered job): classic
    sampled k-means. Lloyd rounds are then pure numpy — no per-round
    Spark jobs — and the resulting (n_cells x d) matrix broadcasts to
    the one distributed pass that matters, cell ASSIGNMENT over the full
    corpus. At 100 TB the sample stays 100k rows; centroid quality
    depends on sample size, not corpus size. ``sample`` lets the caller
    reuse an already-collected prefix (same TakeOrdered contract).
    """
    import numpy as np

    sample_rows = max(n_cells * 64, 4096)
    # a provided sample suffices when it covers sample_rows, or when the
    # caller states it already contains the WHOLE corpus
    # (sample_exhausted) — a small sample of a big corpus is re-collected
    if sample is not None and (len(sample) >= sample_rows or sample_exhausted):
        rows = sample
    else:
        rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    V = np.array([r[1] for r in rows], dtype="float64")
    C = V[:n_cells].copy()
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    for _ in range(n_iter):
        cells = np.argmax(V @ C.T, axis=1)
        newC = C.copy()  # cells that lose all members keep their centroid
        for cell in np.unique(cells):
            newC[cell] = V[cells == cell].mean(axis=0)
        newC /= np.maximum(np.linalg.norm(newC, axis=1, keepdims=True), 1e-12)
        C = newC
    return C


# Auto-sizing rule for cell counts (SemDeDup / seeded IVF): per-cell
# work is quadratic (dedup) or linear-per-probe (IVF), so cells must
# GROW with the corpus. ~256 rows/cell is the measured sweet spot
# (20k rows / local[32]: 16 cells -> 15.6s, 64 -> 4.1s, 256 -> 4.4s;
# n/256 = 78 sits inside the flat bottom). SemDeDup's own web-scale
# recipe (~100k clusters for ~10^8+ docs) follows the same rule.
AUTO_ROWS_PER_CELL = 256


def resolve_n_cells(n_cells, count_fn, rows_per_cell: int = AUTO_ROWS_PER_CELL,
                    floor: int = 4) -> int:
    """Resolve an ``n_cells`` argument: ``"auto"`` -> ceil(n/256) with a
    small floor (``count_fn`` is only invoked then — explicit ints stay
    count-free). The cheap count is one metadata-or-scan pass; at 100 TB
    that is noise next to the quadratic cost of an undersized cell."""
    if n_cells == "auto":
        n = int(count_fn())
        return max(floor, -(-n // rows_per_cell))
    if isinstance(n_cells, str):
        raise ValueError(f"n_cells must be an int or 'auto', got {n_cells!r}")
    return int(n_cells)


def resolve_n_planes(n_planes, count_fn, rows_per_bucket: int = 32,
                     floor: int = 4, ceiling: int = 24) -> int:
    """Resolve an ``n_planes`` argument: ``"auto"`` ->
    ceil(log2(n / rows_per_bucket)), clamped to [floor, ceiling].

    The scale rule the sf1 sweep measured the hard way: hyperplane-LSH
    bucket COUNT is fixed at 2^n_planes, so at fixed ``n_planes`` the
    expected bucket size grows linearly with the corpus and the
    candidate join volume QUADRATICALLY (sum of bucket^2) — a 10x
    corpus at the same planes is ~100x candidate pairs (er_resolve_lsh
    measured 38x wall at 10x data with pinned planes). Targeting a
    constant ~``rows_per_bucket`` rows per bucket keeps candidate
    volume linear in the corpus: n_planes must GROW one plane per
    corpus doubling, exactly like ``n_cells`` tracks n/256 for IVF.
    The 32-row default reproduces both round-7 hand-tuned values
    (6 planes at 2k vectors, 9 planes at 15k ER keys — PLANS.md).
    Explicit ints stay count-free (and byte-stable for SQL mirrors).
    """
    if n_planes == "auto":
        import math

        n = max(int(count_fn()), 1)
        want = math.ceil(math.log2(max(n / rows_per_bucket, 2.0)))
        return max(floor, min(ceiling, want))
    if isinstance(n_planes, str):
        raise ValueError(
            f"n_planes must be an int or 'auto', got {n_planes!r}"
        )
    return int(n_planes)


def ivf_seed_centroids(corpus_norm: DataFrame, id_col: str, vec_col: str,
                       n_cells: int) -> DataFrame:
    """Deterministic seed centroids: the ``n_cells`` smallest-id corpus
    vectors (already L2-normalized), with a dense 0-based ``cell`` index
    in id order. Tiny by construction — the single-partition window over
    ``n_cells`` rows is free."""
    seeds = corpus_norm.select(id_col, vec_col).orderBy(id_col).limit(n_cells)
    return seeds.withColumn(
        "cell", F.row_number().over(Window.orderBy(id_col)) - 1
    ).select("cell", F.col(vec_col).alias("_cent_emb"))


def _assign_cells_declarative(
    df: DataFrame, id_col: str, vec_col: str, cent: DataFrame, n_probe: int
) -> DataFrame:
    """(id, cell, vec) via broadcast centroid join + sequential-fold dot
    — bit-identical to the SQL-oracle formulation (same fold order, same
    tie-break ``dot DESC, cell ASC``), unlike the numpy matmul path
    whose SIMD summation order can flip near-tied argmaxes.

    n_probe=1 (the corpus side) is a hash AGGREGATION, not a window:
    ``max(struct(dot, -cell, vec))`` partial-aggregates map-side, so the
    shuffle carries |rows| not |rows|·n_cells (the ``top1`` trick from
    knn_join). The struct comparison never reaches the vector field —
    cell is distinct within a group."""
    scored = df.crossJoin(F.broadcast(cent)).withColumn(
        "_cdot", S.dot(F.col(vec_col), F.col("_cent_emb"))
    )
    if n_probe == 1:
        m = F.max(
            F.struct(
                F.col("_cdot").alias("s"),
                (-F.col("cell")).alias("nc"),
                F.col(vec_col).alias("e"),
            )
        ).alias("_m")
        return scored.groupBy(id_col).agg(m).select(
            id_col,
            (-F.col("_m.nc")).cast("int").alias("cell"),
            F.col("_m.e").alias(vec_col),
        )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cdot").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= n_probe)
        .select(id_col, "cell", vec_col)
    )


def ivf_topk_seeded(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    n_cells: int | str = "auto",
    n_probe: int = 4,
) -> DataFrame:
    """IVF top-k with SEED centroids (no Lloyd iterations) and fully
    declarative cell assignment — the oracle-checkable IVF: every float
    op is a sequential fold an ANSI-SQL engine reproduces bit-for-bit.

    ``n_cells="auto"`` (default) sizes cells from a cheap corpus count
    as ceil(n / 256) — see :data:`AUTO_ROWS_PER_CELL`; pass an int to
    pin it (required for a byte-stable SQL mirror).

    Same join topology as :func:`ivf_topk` (cell equi-join, no corpus
    broadcast, no cross join between query and corpus), so the plan
    scales identically; what it trades away is centroid quality (seed
    vectors instead of k-means), i.e. recall per probe, not correctness
    or shape. Use :func:`ivf_topk` when recall matters more than
    cross-engine checkability."""
    q = KJ.ensure_parallelism(queries).select(
        F.col(query_id).cast("long").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    c = KJ.ensure_parallelism(corpus).select(
        F.col(corpus_id).cast("long").alias(KJ.RIGHT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.RIGHT_EMB),
    )
    n_cells = resolve_n_cells(n_cells, corpus.count)
    cent = ivf_seed_centroids(c, KJ.RIGHT_ID, KJ.RIGHT_EMB, n_cells)
    cq = _assign_cells_declarative(q, KJ.LEFT_ID, KJ.LEFT_EMB, cent, n_probe)
    cc = _assign_cells_declarative(c, KJ.RIGHT_ID, KJ.RIGHT_EMB, cent, 1)
    # in-cell re-score as the Arrow numpy cogroup (bit-equal to the
    # fold — knn_join.bucket_dot_rescored_pairs; the round-10 fix for
    # the interpreted per-candidate-row floor in shuffled join stages)
    cand = KJ.bucket_dot_rescored_pairs(
        cq.select("cell", KJ.LEFT_ID, KJ.LEFT_EMB),
        cc.select("cell", KJ.RIGHT_ID, KJ.RIGHT_EMB),
        ["cell"], k=k,
    )
    ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    return ranked.select(
        F.col(KJ.LEFT_ID).alias("query_id"),
        F.col(KJ.RIGHT_ID).alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").alias("score"),
    )


def pq_codebook(
    corpus_norm: DataFrame, id_col: str, vec_col: str, m: int, n_codes: int,
    dim: int,
) -> DataFrame:
    """Seeded product-quantization codebook: subspace ``j`` of the
    ``n_codes`` smallest-id corpus vectors, as rows
    (sub, code, _code_vec). dim must divide evenly into m subspaces.
    Deterministic by construction (same seeding rule as
    ivf_seed_centroids) — the property that lets the PQ index be
    SQL-mirrored."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    ds = dim // m
    seeds = corpus_norm.select(id_col, vec_col).orderBy(id_col).limit(n_codes)
    seeds = seeds.withColumn(
        "code", F.row_number().over(Window.orderBy(id_col)) - 1
    )
    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.struct(
                j.alias("sub"),
                F.slice(F.col(vec_col), j * ds + 1, ds).alias("_code_vec"),
            ),
        )
    ).alias("s")
    return seeds.select("code", subs).select(
        F.col("s.sub").alias("sub"), "code", F.col("s._code_vec").alias("_code_vec")
    )


def _pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebook: DataFrame, m: int,
    ds: int, keep: list[str],
) -> DataFrame:
    """(id[, keep...], sub, code): nearest codebook entry per subspace,
    tie-break (dot DESC, code ASC), via the same map-side-combining
    max(struct) aggregation as the IVF assignment — the shuffle carries
    |rows|·m, not |rows|·m·n_codes."""
    sub_vec = F.expr(
        f"slice({vec_col}, sub * {ds} + 1, {ds})"
    )
    scored = df.crossJoin(F.broadcast(codebook)).withColumn(
        "_cdot", S.dot(sub_vec, F.col("_code_vec"))
    )
    grp = [id_col, "sub", *keep]
    mx = F.max(
        F.struct(F.col("_cdot").alias("s"), (-F.col("code")).alias("nc"))
    ).alias("_m")
    return scored.groupBy(*grp).agg(mx).select(
        id_col, *keep, "sub", (-F.col("_m.nc")).cast("int").alias("code")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    n_cells: int | str = "auto",
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """FAISS-IVFPQ re-expressed as joins, fully deterministic and
    SQL-mirrored: IVF (seeded centroids) restricts candidates to probed
    cells, product quantization compresses each corpus vector to ``m``
    small integer codes, and scoring is ADC — the approximate inner
    product is the sum over subspaces of dot(query subvector, coded
    centroid), looked up from a per-query table instead of touching the
    corpus vector.

    Why this shape at 100 TB: the corpus side of the scoring join
    carries (id, cell, m codes) — a few dozen BYTES per vector instead
    of d floats — so shuffle volume and executor memory drop by ~d·4/m;
    candidates come from the cell equi-join (no cross join, no corpus
    broadcast). Bit-determinism: the per-pair ADC sum folds its m
    lookup terms in subspace order via sort_array + aggregate (a plain
    SUM's partial-aggregation order is engine-dependent for doubles).

    Returns (query_id, neighbor_id, rank, score); score is the ADC
    APPROXIMATION of cosine (exact re-rank of the top candidates is
    the standard chaser — compose with ann_topk on the survivors)."""
    q = KJ.ensure_parallelism(queries).select(
        F.col(query_id).cast("long").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    c = KJ.ensure_parallelism(corpus).select(
        F.col(corpus_id).cast("long").alias(KJ.RIGHT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.RIGHT_EMB),
    )
    if dim is None:
        first = corpus.select(F.size(vector_col).alias("d")).first()
        dim = int(first["d"])
    ds = dim // m

    n_cells = resolve_n_cells(n_cells, corpus.count)
    cent = ivf_seed_centroids(c, KJ.RIGHT_ID, KJ.RIGHT_EMB, n_cells)
    book = pq_codebook(c, KJ.RIGHT_ID, KJ.RIGHT_EMB, m, n_codes, dim)

    # corpus index: cell assignment + m PQ codes per vector (the only
    # full-corpus passes; both shuffle |C| and |C|*m narrow rows)
    cc = _assign_cells_declarative(c, KJ.RIGHT_ID, KJ.RIGHT_EMB, cent, 1)
    c_codes = _pq_encode(cc, KJ.RIGHT_ID, KJ.RIGHT_EMB, book, m, ds, keep=["cell"])

    # query side: probed cells + the ADC lookup table
    # (qid, sub, code, lut) = dot of the query's subvector with every
    # codebook entry — |Q|*m*n_codes tiny rows
    cq = _assign_cells_declarative(q, KJ.LEFT_ID, KJ.LEFT_EMB, cent, n_probe)
    sub_vec = F.expr(f"slice({KJ.LEFT_EMB}, sub * {ds} + 1, {ds})")
    lut = (
        q.crossJoin(F.broadcast(book))
        .withColumn("lut", S.dot(sub_vec, F.col("_code_vec")))
        .select(KJ.LEFT_ID, "sub", "code", "lut")
    )

    pairs = cq.select(KJ.LEFT_ID, "cell").join(c_codes, "cell")
    terms = pairs.join(lut, [KJ.LEFT_ID, "sub", "code"])
    # deterministic ADC sum: the m terms in subspace order, window form
    # (functions/pinned.py — bit-identical to the collect_list fold)
    from ..functions.pinned import pinned_total, with_running_sum

    folded = (
        with_running_sum(terms, [KJ.LEFT_ID, KJ.RIGHT_ID], "sub", "lut")
        .groupBy(KJ.LEFT_ID, KJ.RIGHT_ID)
        .agg(pinned_total("sub").alias("score"))
    )
    ranked = KJ.topk(folded, k).withColumnRenamed("_lt_rank", "rank")
    return ranked.select(
        F.col(KJ.LEFT_ID).alias("query_id"),
        F.col(KJ.RIGHT_ID).alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").alias("score"),
    )


def ivf_pq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    retrieve_k: int | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ retrieve-wide + EXACT re-rank — the standard production
    chaser: ADC ranks ``retrieve_k`` (default 8·k) candidates per query
    from compressed codes, then only those pairs fetch their true
    vectors for an exact cosine, and the final top-k ranks on exact
    scores (deterministic (score DESC, id ASC), exact values in the
    output). Corpus vectors are touched for |Q|·retrieve_k rows
    instead of |Q|·|corpus| — the re-rank join is an id equi-join
    against the (pruned) corpus scan."""
    retrieve_k = retrieve_k or 8 * k
    cand = ivf_pq_topk(
        queries, corpus, vector_col, query_id, corpus_id,
        k=retrieve_k, n_cells=n_cells, n_probe=n_probe, m=m,
        n_codes=n_codes, dim=dim,
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(query_id).cast("long").alias("query_id"),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("neighbor_id"),
        S.l2_normalize(F.col(vector_col)).alias(KJ.RIGHT_EMB),
    )
    exact = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("score", S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB)))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "score",
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    n_cells: int | None = None,
    n_probe: int = 4,
    n_iter: int = 2,
) -> DataFrame:
    """Approximate top-k by cosine via IVF cell-join.

    Returns (query_id, neighbor_id, rank, score) like ann_topk.
    n_cells defaults to ~sqrt(|corpus|) (classic IVF balance point:
    per-probe work |corpus|/n_cells comparisons).
    """
    import math

    # fan out BEFORE the per-row work: a single-file parquet corpus
    # otherwise runs every mapInPandas assignment stage on one core
    q = KJ.ensure_parallelism(queries).select(
        F.col(query_id).cast("long").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    c = KJ.ensure_parallelism(corpus).select(
        F.col(corpus_id).cast("long").alias(KJ.RIGHT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.RIGHT_EMB),
    )
    sample = None
    if n_cells is None:
        # one TakeOrdered serves both the size estimate (exact when the
        # corpus fits in the 4096-row prefix) and the k-means sample
        sample = c.select(KJ.RIGHT_ID, KJ.RIGHT_EMB).orderBy(KJ.RIGHT_ID).limit(4096).collect()
        n = len(sample) if len(sample) < 4096 else c.count()
        n_cells = max(4, int(math.sqrt(n)))

    C = ivf_train_centroids(
        c, KJ.RIGHT_EMB, KJ.RIGHT_ID, n_cells, n_iter, sample=sample,
        # a short limit-4096 collect means the corpus fits in the sample
        sample_exhausted=sample is not None and len(sample) < 4096,
    )
    bc = q.sparkSession.sparkContext.broadcast(C)

    # assignments carry the vectors through (no join back by id); the
    # only shuffles left are the cell equi-join and the top-k window
    cq = _assign_cells(q, KJ.LEFT_EMB, KJ.LEFT_ID, bc, n_probe=n_probe)
    cc = _assign_cells(c, KJ.RIGHT_EMB, KJ.RIGHT_ID, bc, n_probe=1)

    # in-cell re-score as the Arrow numpy cogroup (see ivf_topk_seeded)
    cand = KJ.bucket_dot_rescored_pairs(
        cq.select("cell", KJ.LEFT_ID, KJ.LEFT_EMB),
        cc.select("cell", KJ.RIGHT_ID, KJ.RIGHT_EMB),
        ["cell"], k=k,
    )
    ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    return ranked.select(
        F.col(KJ.LEFT_ID).alias("query_id"),
        F.col(KJ.RIGHT_ID).alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").alias("score"),
    )


def knn_classify(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
    mode: str = "exact_cross",
    n_planes: int | str = 12,
    dim: int | None = None,
) -> DataFrame:
    """Leave-one-out kNN label prediction over an embedding column:
    each row is classified by majority vote of its k nearest OTHER
    rows (cosine; vote ties broken by min label, neighbor ties by
    score DESC, id ASC). Returns ``(id_col, label_col, predicted)``.

    The self-row is excluded in the candidate stage (not post-filtered
    from a k+1 list), so the semantics are exact even when duplicate
    vectors tie with the self at cosine 1.0. ``mode='exact_cross'`` is
    the O(n^2) oracle-checkable baseline; ``'lsh_hyperplane'`` routes
    candidates through the hyperplane bucket equi-join for scale (same
    trade as :func:`ann_topk`). The vote argmax is a hash aggregation
    (``max(struct(n, -label))``), not a window."""
    from ..ids import require_integral_id

    require_integral_id(df, id_col, "knn_classify")
    base = KJ.ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(label_col).cast("long").alias("_lb"),
        S.l2_normalize(F.col(vector_col)).alias("_v"),
    ).localCheckpoint(eager=False)
    q = base.select(
        F.col("_id").alias(KJ.LEFT_ID),
        F.col("_lb").alias("_tl"),
        F.col("_v").alias(KJ.LEFT_EMB),
    )
    c = base.select(
        F.col("_id").alias(KJ.RIGHT_ID),
        F.col("_lb").alias("_nl"),
        F.col("_v").alias(KJ.RIGHT_EMB),
    )
    if mode == "lsh_hyperplane":
        if dim is None:
            raise ValueError("lsh_hyperplane mode needs dim=")
        n_planes = resolve_n_planes(n_planes, base.count)
        qb = q.withColumn("_bkt", hyperplane_bucket(KJ.LEFT_EMB, dim, n_planes))
        cb = c.withColumn("_bkt", hyperplane_bucket(KJ.RIGHT_EMB, dim, n_planes))
        # in-bucket re-score as the Arrow numpy cogroup (bit-equal to
        # the fold — the round-10 interpreted-floor fix), leave-one-out
        # exclusion INSIDE the candidate stage. The neighbor label
        # rides the cogroup as a carry column (8 bytes next to the
        # vector it already ships — one broadcast-join stage fewer;
        # the carry does not disturb the tie-break: RIGHT_ID is unique
        # here, so (right_id, _nl) order == right_id order); the row's
        # own label still rejoins by id on the k-pruned pairs.
        pairs = KJ.bucket_dot_rescored_pairs(
            qb.select("_bkt", KJ.LEFT_ID, KJ.LEFT_EMB),
            cb.select("_bkt", KJ.RIGHT_ID, "_nl", KJ.RIGHT_EMB),
            ["_bkt"], k=k, exclude_equal_ids=True, carry_right=["_nl"],
        )
        cand = pairs.join(q.select(KJ.LEFT_ID, "_tl"), KJ.LEFT_ID)
    elif mode == "exact_cross":
        cand = q.join(c, F.col(KJ.LEFT_ID) != F.col(KJ.RIGHT_ID))
        cand = cand.withColumn(
            "score", S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB))
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    nn = KJ.topk(cand, k)
    votes = nn.groupBy(KJ.LEFT_ID, "_tl", "_nl").agg(F.count(F.lit(1)).alias("_nv"))
    pred = (
        votes.groupBy(KJ.LEFT_ID, "_tl")
        .agg(
            F.max(
                F.struct(F.col("_nv").alias("n"), (-F.col("_nl")).alias("negl"))
            ).alias("_m")
        )
        .select(
            F.col(KJ.LEFT_ID).alias(id_col),
            F.col("_tl").alias(label_col),
            (-F.col("_m.negl")).alias("predicted"),
        )
    )
    return pred


def knn_label_eval(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
    mode: str = "exact_cross",
    n_planes: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Per-label leave-one-out kNN accuracy — the embedding-quality
    scorecard (how separable are the labels under this embedding?).
    Returns ``(label_col, n, n_correct, accuracy)``."""
    pred = knn_classify(df, vector_col, id_col, label_col, k, mode, n_planes, dim)
    correct = F.when(F.col("predicted") == F.col(label_col), 1).otherwise(0)
    return pred.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(correct).alias("n_correct"),
        (F.sum(correct).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "accuracy"
        ),
    )


def _mmr_rerank_grouped(
    candidates: DataFrame,
    *,
    query_id: str,
    id_col: str,
    score_col: str,
    vector_col: str,
    k: int,
    lam: float,
) -> DataFrame:
    """One-shuffle MMR: the greedy loop in numpy per query group, with
    the relational chain's float ops replayed in the same order —
    per-dimension left-assoc dots seeded at 0.0 (S.dot's fold),
    max-abs-free l2 normalization (S.l2_normalize), order-free MAX
    penalty, and (mmr DESC, id ASC) tie-breaks. See :func:`mmr_rerank`
    mode='grouped'."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField(query_id, LongType()),
        StructField(id_col, LongType()),
        StructField("rank", IntegerType()),
        StructField(score_col, DoubleType()),
        StructField("mmr", DoubleType()),
    ])
    one_minus = 1.0 - lam  # same Python-literal subtraction as F.lit(1.0 - lam)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        q = int(pdf["_q"].iloc[0])
        # max-relevance dedupe per candidate id (the relational pinned
        # window): stable sort by (id, -rel), keep first per id
        pdf = (
            pdf.sort_values(["_d", "_rel"], ascending=[True, False],
                            kind="stable")
            .drop_duplicates("_d", keep="first")
        )
        ids = pdf["_d"].to_numpy(dtype=np.int64)
        rel = pdf["_rel"].to_numpy(dtype=np.float64)
        v = np.array(pdf["_v"].tolist(), dtype=np.float64)
        n, dim = v.shape
        # S.l2_normalize: sequential per-dim square accumulation, no BLAS
        acc = np.zeros(n)
        for i in range(dim):
            acc = acc + v[:, i] * v[:, i]
        nrm = np.maximum(np.sqrt(acc), 1e-12)
        vn = v / nrm[:, None]

        remaining = list(range(n))
        pen = np.full(n, -np.inf)  # max dot vs picked so far
        out = {query_id: [], id_col: [], "rank": [], score_col: [], "mmr": []}

        def emit(idx: int, rank: int, mmr_val: float) -> None:
            out[query_id].append(q)
            out[id_col].append(int(ids[idx]))
            out["rank"].append(rank)
            out[score_col].append(float(rel[idx]))
            out["mmr"].append(float(mmr_val))

        # rank 1: argmax relevance, tie on id ASC
        best = min(remaining, key=lambda i: (-rel[i], ids[i]))
        emit(best, 1, lam * rel[best])
        remaining.remove(best)
        last_pick = best
        for j in range(2, k + 1):
            if not remaining:
                break
            # fold the newest pick into the running MAX penalty:
            # dot(candidate, pick) with S.dot's left-assoc dim order
            d_acc = np.zeros(n)
            for i in range(dim):
                d_acc = d_acc + vn[:, i] * vn[last_pick, i]
            pen = np.maximum(pen, d_acc)
            best = min(
                remaining,
                key=lambda i: (-(lam * rel[i] - one_minus * pen[i]), ids[i]),
            )
            emit(best, j, lam * rel[best] - one_minus * pen[best])
            remaining.remove(best)
            last_pick = best
        return pd.DataFrame(out)

    prepped = candidates.select(
        F.col(query_id).cast("long").alias("_q"),
        F.col(id_col).cast("long").alias("_d"),
        F.col(score_col).cast("double").alias("_rel"),
        F.col(vector_col).alias("_v"),
    )
    return prepped.groupBy("_q").applyInPandas(fn, schema=out_schema)


def mmr_rerank(
    candidates: DataFrame,
    *,
    query_id: str = "query_id",
    id_col: str = "neighbor_id",
    score_col: str = "score",
    vector_col: str = "embedding",
    k: int = 5,
    lam: float = 0.7,
    mode: str = "grouped",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results per query maximizing
    ``lam * relevance - (1 - lam) * max_sim_to_already_picked`` —
    the standard diversity pass over an ANN/BM25 candidate list
    (dedup near-identical hits, cover multiple facets).

    ``mode`` picks the execution strategy — results are BIT-IDENTICAL
    (pytest-pinned), because every float op runs in the same order:

    - ``'grouped'`` (default): ONE ``applyInPandas`` stage partitioned
      by query — the greedy loop runs in numpy per Arrow group with
      the declarative plan's exact fold orders (per-dimension
      left-assoc dots, order-free MAX penalty, (mmr DESC, id ASC)
      ties). One shuffle total; the k-iteration relational chain's
      per-round scheduling overhead (the wall-clock at bench scale)
      disappears. The per-group memory is the query's candidate list —
      bounded by the operator's contract (candidates come from an
      upstream top-N).
    - ``'relational'``: the fully declarative k-round chain below —
      the SQL-oracle-shaped plan, kept both as the semantics
      definition and for engines/settings where Python workers are
      unavailable.

    ``candidates`` is a per-(query, candidate) relation carrying the
    relevance score and the CANDIDATE's embedding (the usual shape:
    ``ann_topk`` output joined back to the corpus vectors). Embeddings
    are L2-normalized internally, so the diversity penalty is cosine.
    Returns ``(query_id, id_col, rank, score, mmr)`` — rank 1..k in
    greedy pick order, ``score`` the input relevance, ``mmr`` the
    marginal objective at pick time (``lam*score`` for rank 1; ties
    break on candidate id).

    Duplicate (query, candidate) rows are collapsed up front to the
    max-relevance row (ties by the unnormalized stored vector order are
    impossible after the collapse: one row survives per pair), so the
    greedy picks stay deterministic even when an upstream union feeds
    the same candidate twice (e.g. hybrid-retrieval arms).

    Fully relational greedy loop — NO driver-side collect: iteration j
    joins the remaining candidates against the j-1 picked rows per
    query (at most ``|cand_q| * (j-1)`` pairs per query), takes the
    per-candidate MAX similarity (order-free — float-deterministic
    without sort pinning), and picks the argmax via a rank-1 window.
    Each iteration's picks and remainder are lazily lineage-cut, so
    the composed plan is LINEAR in k (k-1 small self-joins), not
    exponential. Work is O(k^2 * |candidates|) dots, partitioned by
    query — the contract is candidate lists already bounded by an
    upstream top-N, the only setting where greedy MMR is defined.
    DuckDB oracle: the same chain, unrolled as k-1 CTE blocks.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if mode not in ("grouped", "relational"):
        raise ValueError(f"unknown mode {mode!r}; use grouped|relational")
    if mode == "grouped":
        return _mmr_rerank_grouped(
            candidates, query_id=query_id, id_col=id_col,
            score_col=score_col, vector_col=vector_col, k=k, lam=lam,
        )
    dup_w = Window.partitionBy("_q", "_d").orderBy(F.col("_rel").desc())
    cand = (
        candidates.select(
            F.col(query_id).cast("long").alias("_q"),
            F.col(id_col).cast("long").alias("_d"),
            F.col(score_col).cast("double").alias("_rel"),
            S.l2_normalize(F.col(vector_col)).alias("_v"),
        )
        # collapse duplicate (query, candidate) rows to the max-relevance
        # one — F.first over an un-deduped group would be order-dependent
        # and iteration 1 could pick the same id twice
        .withColumn("_dup_rn", F.row_number().over(dup_w))
        .filter(F.col("_dup_rn") == 1)
        .drop("_dup_rn")
        .localCheckpoint(eager=False)
    )

    def _rank1(df: DataFrame, order: Column, rank_val: int, mmr: Column) -> DataFrame:
        w = Window.partitionBy("_q").orderBy(order.desc(), F.col("_d").asc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "_q", "_d", "_rel", "_v",
                F.lit(rank_val).alias("rank"), mmr.alias("mmr"),
            )
        )

    first = _rank1(
        cand, F.col("_rel"), 1, F.lit(lam) * F.col("_rel")
    ).localCheckpoint(eager=False)
    picks = [first]
    selected = first
    for j in range(2, k + 1):
        # remaining derives from the (already lineage-cut) cand and
        # pick frames each round instead of chaining its own
        # checkpoints — one anti-join against the selected union costs
        # |cand| x (j-1) comparisons on the tiny pick side and drops
        # k-1 checkpoint materializations from the composed plan
        remaining = cand.join(
            selected.select("_q", "_d"), ["_q", "_d"], "left_anti"
        )
        pen = (
            remaining.join(
                selected.select("_q", F.col("_v").alias("_sv")), "_q"
            )
            .groupBy("_q", "_d")
            .agg(
                F.first("_rel").alias("_rel"),
                F.first("_v").alias("_v"),
                F.max(S.dot(F.col("_v"), F.col("_sv"))).alias("_pen"),
            )
        )
        mmr = F.lit(lam) * F.col("_rel") - F.lit(1.0 - lam) * F.col("_pen")
        pick = _rank1(pen.withColumn("_mmr", mmr), F.col("_mmr"), j,
                      F.col("_mmr")).localCheckpoint(eager=False)
        picks.append(pick)
        selected = selected.unionByName(pick)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("_q").alias(query_id),
        F.col("_d").alias(id_col),
        F.col("rank").cast("int").alias("rank"),
        F.col("_rel").alias(score_col),
        F.col("mmr").alias("mmr"),
    )


def srp_signs(in_dim: int, out_dim: int, salt: int = 0) -> list[list[int]]:
    """Deterministic +/-1 sign matrix for signed random projection —
    a pure build-time function of (i, j, salt), so Spark and any
    oracle share the exact same literals (no runtime hash mirroring).

    Signs come from SHA-256 of the coordinate string, NOT the engine's
    polynomial rolling hash: for short coordinate strings the poly
    hash never wraps its modulus, so its parity degenerates to the
    parity of the character-code sum — rows become exact copies or
    negations of each other and the effective projection rank
    collapses (measured: out_dim=32 performed identically to 16). A
    cryptographic hash's low bit has no such structure."""
    import hashlib

    def bit(i: int, j: int) -> int:
        d = hashlib.sha256(f"{salt}:{i}:{j}".encode()).digest()
        return d[0] & 1

    return [
        [1 if bit(i, j) == 0 else -1 for i in range(in_dim)]
        for j in range(out_dim)
    ]


def srp_project(
    df: DataFrame,
    vector_col: str = "embedding",
    out_col: str = "projected",
    *,
    in_dim: int,
    out_dim: int = 16,
    salt: int = 0,
) -> DataFrame:
    """Signed-random-projection dimensionality reduction (Achlioptas
    2003 / Charikar 2002): ``out[j] = sum_i sign_ij * v[i]`` with a
    deterministic +/-1 matrix. By Johnson-Lindenstrauss, dot products
    and cosines survive approximately at out_dim << in_dim — this is
    the DIMENSION axis of embedding compression, composing with
    :func:`quantize_embeddings` (the PRECISION axis) for a combined
    (in_dim/out_dim) x 4 shuffle/storage cut on the ANN family.

    Execution: an Arrow-batched ``pandas_udf`` whose numpy loop
    accumulates dimension-by-dimension (``out += V[:, i] * S[:, i]``)
    — the SAME left-associative add order as the SQL oracle's literal
    chain, so results are bit-exact across engines, while each batch
    is one vectorized pass (map-only, no shuffle). The fully-unrolled
    expression form was tried first and rejected: out_dim x in_dim
    element references make a ~2000-node tree that costs ~12s of
    driver-side planning/codegen PER QUERY at any data size (the
    Catalyst tree is the bottleneck, not the rows); the interpreted
    higher-order-function form is worse (~8us per fold step, measured
    on the poly_hash path). Null vectors are a contract violation
    (repo-wide fixed-dim embedding contract) and fail loudly.
    """
    if in_dim < 1 or out_dim < 1:
        raise ValueError("in_dim and out_dim must be >= 1")
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    smat = np.array(srp_signs(in_dim, out_dim, salt), dtype=np.float64)
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )
    vc = vector_col

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vc].tolist(), dtype=np.float64)
            if v.ndim != 2 or v.shape[1] != in_dim:
                raise ValueError(
                    f"srp_project: expected fixed {in_dim}-dim vectors, "
                    f"got shape {v.shape}"
                )
            out = np.zeros((v.shape[0], out_dim), dtype=np.float64)
            for i in range(in_dim):
                # sequential per-dimension accumulation — pinned float
                # order (left-assoc over i), NOT a BLAS matmul whose
                # summation order is unspecified
                out += v[:, i : i + 1] * smat[:, i][None, :]
            pdf = pdf.copy()
            pdf[out_col] = list(out)
            yield pdf

    return df.mapInPandas(gen, schema=schema)


_IVF_INDEX_VERSION = 1


def _read_ivf_meta(spark, path: str) -> dict:
    """Open a :func:`save_ivf_index` directory: refuse a torn index
    (pending commit journal from a crashed writer — serving would mix
    old and new directory states), then read and version-check meta."""
    from .txn import assert_no_pending_commit

    assert_no_pending_commit(spark, path)
    meta = spark.read.json(f"{path}/meta").collect()[0].asDict()
    if int(meta["version"]) != _IVF_INDEX_VERSION:
        raise ValueError(
            f"ivf index at {path} has version {meta['version']}, "
            f"this build reads version {_IVF_INDEX_VERSION}"
        )
    return meta


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    vector_col: str = "embedding",
    corpus_id: str = "vec_id",
    n_cells: int | str = "auto",
    mode: str = "seeded",
) -> None:
    """Materialize an IVF index at ``path``: ``cells/`` parquet
    PARTITIONED BY cell holding (id, normalized vector) per corpus row,
    ``centroids/`` (cell, centroid vector), and a one-row ``meta/``
    json (version, n_cells, mode) validated at load time.

    Build once / probe many: the expensive parts of every IVF query —
    normalizing the corpus, assigning each vector to its cell — are
    paid at ingest; retrieval reads ONLY the probed cell partitions
    (Spark partition pruning on the ``cell`` directory key), so query
    I/O is ~(n_probe / n_cells) of the corpus regardless of its size —
    the same sublinear-serving shape as the BM25 bucket index and the
    MinHash band index.

    ``mode='seeded'`` uses the deterministic smallest-id seed centroids
    (bit-exact SQL mirror — the checkable path); ``mode='kmeans'`` runs
    the Lloyd trainer for better recall per probe (deterministic given
    the seeding, but not SQL-expressible).
    """
    from .tombstones import clear_tombstones, refresh_index_path

    if mode not in ("seeded", "kmeans"):
        raise ValueError("mode must be seeded|kmeans")
    spark = corpus.sparkSession
    # a rebuild at the same path must not inherit tombstones, nor a
    # crashed writer's stale lock marker
    from .txn import clear_commit_journal
    from .upsert import clear_writer_lock

    clear_tombstones(spark, path)
    clear_writer_lock(spark, path)
    clear_commit_journal(spark, path)
    c = KJ.ensure_parallelism(corpus).select(
        F.col(corpus_id).cast("long").alias(corpus_id),
        S.l2_normalize(F.col(vector_col)).alias(vector_col),
    )
    ncells = resolve_n_cells(n_cells, corpus.count)
    if mode == "seeded":
        cent = ivf_seed_centroids(c, corpus_id, vector_col, ncells)
    else:
        cmat = ivf_train_centroids(c, vector_col, corpus_id, ncells)
        cent = spark.createDataFrame(
            [(i, [float(x) for x in cmat[i]]) for i in range(len(cmat))],
            "cell int, _cent_emb array<double>",
        )
    assigned = _assign_cells_declarative(c, corpus_id, vector_col, cent, 1)
    assigned.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")
    cent.select("cell", F.col("_cent_emb").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(_IVF_INDEX_VERSION, int(ncells), mode, corpus_id, vector_col)],
        "version int, n_cells int, mode string, id_col string, vector_col string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    refresh_index_path(spark, path)


def delete_from_ivf_index(
    ids: DataFrame,
    path: str,
    id_col: str | None = None,
) -> None:
    """Tombstone corpus ids in a :func:`save_ivf_index` directory (see
    :mod:`.tombstones`). Deleted vectors vanish from
    :func:`ann_topk_ivf_indexed` results immediately — survivors take
    the freed top-k slots, because the anti-join runs BEFORE scoring.
    Unlike BM25 there is no staleness at all: the index's scoring
    state is per-row only (frozen centroids + stored vectors), so a
    tombstoned serve is EXACTLY the serve a filtered rebuild with the
    same centroids would produce. :func:`purge_ivf_index` rewrites the
    cells without the tombstoned rows when their scan cost matters."""
    from .tombstones import refresh_index_path, write_tombstones

    spark = ids.sparkSession
    meta = _read_ivf_meta(spark, path)
    stored = str(meta["id_col"])
    write_tombstones(ids, path, id_col or stored, stored, stored_rel="cells")
    refresh_index_path(spark, path)


def purge_ivf_index(spark, path: str, out_path: str) -> None:
    """Physically apply an IVF index's tombstones: rewrite ``cells/``
    minus the deleted rows into a fresh index at ``out_path`` (frozen
    centroids and meta copied over, tombstone set empty). Serving from
    the purged index is bit-identical to the tombstoned serve — the
    rewrite buys back the masked rows' scan+anti-join cost and makes
    the deleted ids re-ingestable. I/O scales with the index, and the
    per-cell partition layout is preserved (one directory per cell).
    Same commit-point stance as :func:`~.search.compact_bm25_index`:
    writes a complete new directory; swapping it over the old one is
    the caller's atomic rename."""
    from .tombstones import (
        anti_tombstones, clear_tombstones, refresh_index_path,
    )

    meta = _read_ivf_meta(spark, path)
    from .tombstones import require_distinct_out

    require_distinct_out(path, out_path, "purge_ivf_index")
    stored = str(meta["id_col"])
    cells = spark.read.parquet(f"{path}/cells")
    kept = anti_tombstones(cells, spark, path, stored, stored)
    clear_tombstones(spark, out_path)
    kept.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{out_path}/cells")
    spark.read.parquet(f"{path}/centroids").write.mode("overwrite").parquet(
        f"{out_path}/centroids"
    )
    spark.read.json(f"{path}/meta").coalesce(1).write.mode(
        "overwrite"
    ).json(f"{out_path}/meta")
    refresh_index_path(spark, out_path)


def ann_topk_ivf_indexed(
    spark,
    path: str,
    queries: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k retrieval against a :func:`save_ivf_index` directory.

    The query batch normalizes and cell-assigns against the stored
    centroids (broadcast — n_cells rows), the distinct probed cells
    are collected (bounded: <= |queries| x n_probe, same bounded-
    collect contract as the BM25 bucket filter) and pushed as a
    partition filter on ``cells/``, and scoring is the usual cell
    equi-join + top-k window. Results equal ``ivf_topk_seeded`` on the
    same corpus/centroids bit-for-bit."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    meta = _read_ivf_meta(spark, path)
    cent = spark.read.parquet(f"{path}/centroids").select(
        "cell", F.col("centroid").alias("_cent_emb")
    )
    q = KJ.ensure_parallelism(queries).select(
        F.col(query_id).cast("long").alias(KJ.LEFT_ID),
        S.l2_normalize(F.col(vector_col)).alias(KJ.LEFT_EMB),
    )
    cq = _assign_cells_declarative(q, KJ.LEFT_ID, KJ.LEFT_EMB, cent, n_probe)
    probed = [r["cell"] for r in cq.select("cell").distinct().collect()]
    stored = spark.read.parquet(f"{path}/cells").filter(
        F.col("cell").isin(probed)
    )
    # tombstoned vectors drop out BEFORE scoring (no-op without deletes/)
    from .tombstones import anti_tombstones

    stored = anti_tombstones(
        stored, spark, path, str(meta["id_col"]), str(meta["id_col"])
    )
    # in-cell re-score as the Arrow numpy cogroup (bit-equal to the
    # fold — the round-10 interpreted-floor fix); the probed-cell
    # partition filter and the tombstone anti-join above still apply
    # to the scan BEFORE the cogroup shuffles it
    cand = KJ.bucket_dot_rescored_pairs(
        cq.select("cell", KJ.LEFT_ID, KJ.LEFT_EMB),
        stored.select(
            "cell",
            F.col(str(meta["id_col"])).alias(KJ.RIGHT_ID),
            F.col(str(meta["vector_col"])).alias(KJ.RIGHT_EMB),
        ),
        ["cell"], k=k,
    )
    ranked = KJ.topk(cand, k).withColumnRenamed("_lt_rank", "rank")
    return ranked.select(
        F.col(KJ.LEFT_ID).alias("query_id"),
        F.col(KJ.RIGHT_ID).alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("score").alias("score"),
    )


def hyperplane_probe_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_extra: int,
    out_col: str = "_bkt",
    plane_offset: int = 0,
) -> DataFrame:
    """Multi-probe LSH buckets (Lv et al. 2007): the exact bucket plus
    ``n_extra`` variants obtained by flipping the LEAST-CONFIDENT
    hyperplane bits (smallest |dot| — the planes the vector sits
    closest to, i.e. where a true neighbor most plausibly landed on
    the other side). Recovers most of the recall lost to bucket
    granularity at ``(1 + n_extra)x`` probe cost WITHOUT rebuilding
    the corpus side — the standard alternative to more/larger tables.

    Emits ``1 + n_extra`` rows per input row (bucket ids all
    distinct). Plane confidence ranks use an O(n_planes^2) counting
    comparison instead of a sort — pure arithmetic that any SQL engine
    mirrors bit-for-bit. The per-plane dot array is materialized ONCE
    (lazy lineage cut) before the rank/flip arithmetic references it
    ~n_planes^2 times — without the cut the expression tree repeats
    each dim-term fold quadratically (the srp_project planning-cost
    lesson)."""
    if not 0 <= n_extra < n_planes:
        raise ValueError("n_extra must be in [0, n_planes)")
    # SQL-text build (single F.expr parse per expression): the Column
    # form cost ~n_planes*dim py4j roundtrips for the plane-coefficient
    # literals alone (~1 s of driver time PER CALL at 4x64, paid on
    # every query) — same single-parse treatment hyperplane_bucket's
    # text path and hash_ngram.encode already use. repr() round-trips
    # the exact coefficient doubles, so expressions (and buckets) are
    # bit-identical to the Column form.
    q = f"`{vec_col}`"
    dot_terms = []
    for h in range(n_planes):
        coeffs = "array(" + ", ".join(
            f"{hyperplane_component(h + plane_offset, j)!r}D"
            for j in range(dim)
        ) + ")"
        dot_terms.append(
            f"aggregate(zip_with({q}, {coeffs}, "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    step = df.withColumn(
        "_hp_dots", F.expr("array(" + ", ".join(dot_terms) + ")")
    ).localCheckpoint(eager=False)

    def d(h):
        return f"element_at(_hp_dots, {h + 1})"

    b0 = "(" + " + ".join(
        f"(CASE WHEN {d(h)} >= 0 THEN {1 << h} ELSE 0 END)"
        for h in range(n_planes)
    ) + ")"

    def rank(h):
        # counting comparison; k < h ties go to k (the Column form's
        # (ak < ah) | (ak == ah AND k < h) collapses to <= / < by the
        # python-literal k<h)
        cs = [
            f"(CASE WHEN abs({d(k)}) "
            f"{'<=' if k < h else '<'} abs({d(h)}) THEN 1 ELSE 0 END)"
            for k in range(n_planes) if k != h
        ]
        return "(" + " + ".join(cs) + ")" if cs else "0"

    ranks = [rank(h) for h in range(n_planes)]
    probes = [b0]
    for r in range(n_extra):
        # flip MASK built directly (shiftleft takes only literal shift
        # amounts): exactly one rank matches r, so the sum is 1<<plane
        mask = "(" + " + ".join(
            f"({1 << h} * (CASE WHEN {ranks[h]} = {r} THEN 1 ELSE 0 END))"
            for h in range(n_planes)
        ) + ")"
        probes.append(f"({b0} ^ {mask})")
    return step.withColumn(
        out_col, F.explode(F.expr("array(" + ", ".join(probes) + ")"))
    ).drop("_hp_dots")


def append_to_ivf_index(
    new: DataFrame,
    path: str,
    vector_col: str | None = None,
    corpus_id: str | None = None,
) -> None:
    """Append a new corpus batch to a :func:`save_ivf_index` directory.

    Sound WITHOUT rebuilding because the index's scoring state is
    per-row only: new vectors are assigned against the STORED
    centroids (frozen at build time) and their (id, vector) rows
    append into the cell partitions — existing rows are untouched and
    every previously-correct probe stays correct. Contrast the BM25
    impact index, where appending documents silently STALES the whole
    index (idf and avgdl are corpus-global, baked into every stored
    impact) — that one is rebuild-only by design.

    Centroid quality degrades as the appended distribution drifts from
    the build-time corpus (cells imbalance -> recall per probe drops);
    monitor cell sizes and rebuild when skewed — the standard IVF
    maintenance trade. Column names default to the ones recorded in
    the index meta.

    Takes the :func:`~.upsert.index_write_lock` (reentrant under an
    upsert): an append's new files landing in a cell partition while a
    concurrent rebalance/upsert swaps that directory would silently
    vanish."""
    from .upsert import index_write_lock

    spark = new.sparkSession
    with index_write_lock(spark, path):
        _append_to_ivf_index_locked(new, path, vector_col, corpus_id)


def _append_to_ivf_index_locked(
    new: DataFrame,
    path: str,
    vector_col: str | None = None,
    corpus_id: str | None = None,
) -> None:
    spark = new.sparkSession
    meta = _read_ivf_meta(spark, path)
    id_col = corpus_id or str(meta["id_col"])
    vec_col = vector_col or str(meta["vector_col"])
    cent = spark.read.parquet(f"{path}/centroids").select(
        "cell", F.col("centroid").alias("_cent_emb")
    )
    c = KJ.ensure_parallelism(new).select(
        F.col(id_col).cast("long").alias(str(meta["id_col"])),
        S.l2_normalize(F.col(vec_col)).alias(str(meta["vector_col"])),
    )
    assigned = _assign_cells_declarative(
        c, str(meta["id_col"]), str(meta["vector_col"]), cent, 1
    )
    assigned.repartition("cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")
    from .tombstones import refresh_index_path

    refresh_index_path(spark, path)


def index_cell_stats(spark, path: str) -> DataFrame:
    """One-row cell-balance observable for a stored vector index
    (:func:`save_ivf_index` or :func:`~.serving.save_pq_index` — any
    directory with a ``cell``-partitioned ``cells/`` relation and a
    ``meta/`` carrying ``n_cells``).

    The documented IVF/PQ maintenance trade ("appends encode against
    frozen centroids; monitor cell sizes and rebuild when the
    distribution drifts") finally gets its monitor — the same
    no-silent-state stance as the skew-cap observables and
    :func:`~.tombstones.tombstone_stats`. Columns:

    - ``n_cells`` — the build-time cell count (meta);
    - ``n_nonempty_cells`` — cells currently holding rows;
    - ``n_rows`` / ``max_cell_rows`` / ``min_cell_rows`` — stored-row
      totals (min over NONEMPTY cells);
    - ``mean_cell_rows`` — n_rows / n_cells (empty cells included:
      emptiness IS drift);
    - ``max_over_mean`` — the skew headline. Rule of thumb (README):
      ~1-4 is healthy for seeded centroids; sustained >8, or
      n_nonempty_cells well below n_cells, means probes concentrate
      on a few hot cells (per-probe recall decays and the probed-scan
      cost ceases to track n_probe/n_cells) — run
      :func:`rebalance_ivf_index` / :func:`rebalance_pq_index` (the
      in-place ACT half of this loop; only hot partitions rewrite),
      or schedule a rebuild / a :func:`~.serving.save_pq_index`
      ``train_cells`` refresh when trained geometry is worth a full
      pass;
    - ``top_cell`` — the fullest cell (ties to the smallest id).

    Counts only — the scan reads the partition column and row counts,
    never the vectors. Tombstoned rows still count: they still occupy
    the probed scan, which is exactly what this observable prices."""
    from .txn import assert_no_pending_commit

    assert_no_pending_commit(spark, path)  # family-agnostic (IVF or PQ)
    meta = spark.read.json(f"{path}/meta").collect()[0].asDict()
    n_cells = int(meta["n_cells"])
    per = (
        spark.read.parquet(f"{path}/cells")
        .groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_nonempty_cells"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_cell_rows"),
        F.min("n").alias("min_cell_rows"),
        F.max(
            F.struct(F.col("n").alias("n"), (-F.col("cell")).alias("nc"))
        ).alias("_top"),
    )
    return agg.select(
        F.lit(n_cells).cast("int").alias("n_cells"),
        F.col("n_nonempty_cells").cast("bigint").alias("n_nonempty_cells"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("max_cell_rows").cast("bigint").alias("max_cell_rows"),
        F.col("min_cell_rows").cast("bigint").alias("min_cell_rows"),
        (F.col("n_rows").cast("double") / F.lit(float(n_cells))).alias(
            "mean_cell_rows"
        ),
        (
            (F.col("max_cell_rows") * F.lit(n_cells)).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("max_over_mean"),
        (-F.col("_top.nc")).cast("int").alias("top_cell"),
    )


def _rebalance_cells(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    carry_cols: list,
    n_cells0: int,
    max_over_mean: float,
    split_factor: int,
    refine: int = 0,
    refine_sample: int = 2048,
):
    """Shared hot-cell split over a ``cell``-partitioned ``cells/``
    relation (IVF and PQ indexes — the PQ family carries its frozen
    per-row ``codes`` through untouched). Contract and determinism
    rules documented on :func:`rebalance_ivf_index`. Returns
    ``(n_hot, n_new, rows_moved, n_cells_after)``; performs no write
    when no cell is hot."""
    from .upsert import _fs, _TMP_SUFFIX

    if split_factor < 2:
        raise ValueError("split_factor must be >= 2")
    if max_over_mean <= 0:
        raise ValueError("max_over_mean must be > 0")
    if refine < 0:
        raise ValueError("refine must be >= 0 (Lloyd iteration count)")
    if refine and refine_sample < split_factor:
        raise ValueError(
            f"refine_sample must be >= split_factor ({split_factor}) — "
            "each hot cell's Lloyd sample has to cover its children"
        )
    cells = spark.read.parquet(f"{path}/cells")
    counts = cells.groupBy(F.col("cell").cast("int").alias("cell")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    total = counts.agg(F.sum("_n")).first()[0] or 0
    mean = float(total) / float(n_cells0) if n_cells0 else 0.0
    hot_rows = counts.filter(
        (F.col("_n") > F.lit(float(max_over_mean) * mean))
        & (F.col("_n") >= split_factor)
    ).select("cell", "_n").collect()
    hot = sorted(r["cell"] for r in hot_rows)
    # the hot cells' total row count, from the counts already in hand —
    # the duplicate-id guard below needs it and a members.count() would
    # re-scan the largest partitions in the index for nothing
    n_members = sum(int(r["_n"]) for r in hot_rows)
    if not hot:
        return 0, 0, 0, n_cells0, None, None

    hi = {h: i for i, h in enumerate(hot)}
    members = cells.filter(F.col("cell").isin(hot)).select(
        F.col("cell").cast("int").alias("_old_cell"),
        F.col(id_col), F.col(vec_col), *carry_cols,
    )
    # children: the split_factor smallest-id stored vectors per hot
    # cell; child j's serving id by the closed form in the docstring
    wch = Window.partitionBy("_old_cell").orderBy(F.col(id_col).asc())
    child_map = F.create_map(*[
        x for h in hot for x in (F.lit(h), F.lit(hi[h]))
    ])
    children = (
        members.withColumn("_child", F.row_number().over(wch) - 1)
        .filter(F.col("_child") < split_factor)
        .withColumn(
            "_new_cell",
            F.when(F.col("_child") == 0, F.col("_old_cell")).otherwise(
                F.lit(n_cells0)
                + child_map[F.col("_old_cell")] * F.lit(split_factor - 1)
                + (F.col("_child") - 1)
            ).cast("int"),
        )
        .select("_old_cell", "_new_cell",
                F.col(vec_col).alias("_child_emb"))
    )
    # materialize the bounded child relation (n_hot x split_factor
    # rows) BEFORE any mutation: its lineage reads the hot cells'
    # parquet files, which the swap below replaces — a lazy re-read
    # after the swap would hit deleted files
    child_rows = children.collect()
    if refine:
        # post-split recall refine (round-10 drift table: seeded
        # children drop recall@10 at fixed n_probe, 0.771->0.740):
        # Lloyd-iterate ONLY the split cells' children, each over a
        # bounded smallest-id sample of ITS OWN members (the
        # train_cells economics — driver numpy, corpus-size-free; the
        # bounded collect is n_hot x refine_sample rows). Same
        # assignment rule as the reassignment below (first-max dot ==
        # tie to the smaller child id, children ordered by id ASC), so
        # the refined geometry and the row routing stay consistent.
        # Un-oracled by design: the registered rebalance queries pin
        # refine=0 (the SQL-rederivable seeded split); the recall gate
        # lives in pytest (test_upsert) and tools/rebalance_sweep.py.
        import numpy as np

        from .serving import _np_train_cells

        ws = Window.partitionBy("_old_cell").orderBy(F.col(id_col).asc())
        sample_rows = (
            members.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") <= refine_sample)
            .select("_old_cell", vec_col)
            .collect()
        )
        by_cell: dict = {}
        for r in sample_rows:
            by_cell.setdefault(int(r["_old_cell"]), []).append(
                list(r[vec_col])
            )
        refined = []
        for h in hot:
            kids = sorted(
                (r for r in child_rows if int(r["_old_cell"]) == h),
                key=lambda r: int(r["_new_cell"]),
            )
            C0 = np.array([r["_child_emb"] for r in kids],
                          dtype=np.float64)
            V = np.array(by_cell[h], dtype=np.float64)
            C = _np_train_cells(V, C0, refine)
            refined.extend(
                {
                    "_old_cell": h,
                    "_new_cell": int(r["_new_cell"]),
                    "_child_emb": [float(x) for x in C[i]],
                }
                for i, r in enumerate(kids)
            )
        child_rows = refined
        children = spark.createDataFrame(
            [(r["_old_cell"], r["_new_cell"], r["_child_emb"])
             for r in child_rows],
            "_old_cell int, _new_cell int, _child_emb array<double>",
        )
    new_ids = sorted(
        int(r["_new_cell"]) for r in child_rows
        if int(r["_new_cell"]) >= n_cells0
    )
    # reassignment: every hot-cell row scores only its OWN cell's
    # children (equi-join on the old cell; the child relation is
    # bounded — broadcast), first-max sequential-fold dot, tie to the
    # smaller new cell id. The max-struct comparison resolves on
    # (_cdot, -_new_cell) — distinct within a group — so the carried
    # payload fields after them never influence the winner.
    scored = members.join(F.broadcast(children), "_old_cell").withColumn(
        "_cdot", S.dot(F.col(vec_col), F.col("_child_emb"))
    )
    m = F.max(
        F.struct(
            F.col("_cdot").alias("s"),
            (-F.col("_new_cell")).alias("nc"),
            F.col(vec_col).alias("e"),
            *[F.col(c).alias(f"c{i}") for i, c in enumerate(carry_cols)],
        )
    ).alias("_m")
    reassigned = scored.groupBy(id_col).agg(m).select(
        F.col(id_col),
        (-F.col("_m.nc")).cast("int").alias("cell"),
        F.col("_m.e").alias(vec_col),
        *[F.col(f"_m.c{i}").alias(c) for i, c in enumerate(carry_cols)],
    )
    n_reassigned, moved = reassigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(~F.col("cell").isin(hot), F.lit(1))
        ).alias("moved"),
    ).first()
    if n_reassigned != n_members:
        # the reassignment groups by id, so duplicate stored ids
        # (e.g. a raw append of an existing id) would silently
        # collapse to one winner and DROP the other stored row — fail
        # loudly instead (the upsert/delete paths' id-anomaly stance)
        raise ValueError(
            f"rebalance: hot cells hold {n_members} rows but only "
            f"{n_reassigned} distinct {id_col!r} values — duplicate "
            "stored ids would silently collapse during reassignment; "
            "dedupe the index (upsert replaces ids atomically) before "
            "rebalancing"
        )

    # STAGE everything aside — cells partitions and centroids — and
    # hand the swap plan back to the caller, which stages meta and
    # commits all three relations under ONE journal (txn.commit_swaps):
    # cells/, centroids/ and meta/ must change together, and the old
    # per-directory delete-then-rename loop could strand moved rows of
    # un-swapped children on a mid-loop crash (silent row loss). With
    # the journal, every crash point serves exactly old or new.
    tmp_rel = "cells" + _TMP_SUFFIX
    tmp = f"{path}/{tmp_rel}"
    reassigned.select(id_col, vec_col, *carry_cols, "cell").repartition(
        "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(tmp)
    fs, _ = _fs(spark, f"{path}/cells")
    jvm = spark.sparkContext._jvm
    entries = []
    for v in list(hot) + new_ids:
        src_rel = f"{tmp_rel}/cell={v}"
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/{src_rel}")):
            entries.append(("swap", src_rel, f"cells/cell={v}"))
        else:
            entries.append(("delete", f"cells/cell={v}"))

    cent = spark.read.parquet(f"{path}/centroids")
    new_cent = cent.filter(~F.col("cell").isin(hot)).unionByName(
        spark.createDataFrame(
            [(int(r["_new_cell"]), [float(x) for x in r["_child_emb"]])
             for r in child_rows],
            "cell int, centroid array<double>",
        )
    )
    tmp_c_rel = "centroids" + _TMP_SUFFIX
    new_cent.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{tmp_c_rel}"
    )
    entries.append(("swap", tmp_c_rel, "centroids"))

    n_after = n_cells0 + len(hot) * (split_factor - 1)
    return (len(hot), len(new_ids), int(moved), n_after, entries,
            [tmp_rel, tmp_c_rel])


def _rebalance_stats(spark, n_hot, n_new, moved, before, after):
    return spark.createDataFrame(
        [(n_hot, n_new, moved, before, after)],
        "n_hot_cells int, n_new_cells int, rows_moved bigint, "
        "n_cells_before int, n_cells_after int",
    )


def rebalance_ivf_index(
    spark,
    path: str,
    max_over_mean: float = 4.0,
    split_factor: int = 2,
    refine: int = 0,
    refine_sample: int = 2048,
) -> DataFrame:
    """Split an IVF index's hot cells in place — the ACT half of the
    observe-act loop :func:`index_cell_stats` opens (the documented
    append-drift trade: frozen centroids concentrate appended vectors
    into a few cells; per-probe recall decays and the probed scan
    stops tracking n_probe/n_cells).

    A cell is HOT when its stored-row count exceeds ``max_over_mean``
    x mean (mean = n_rows / meta n_cells — the
    :func:`index_cell_stats` definition, tombstoned rows included) and
    it has at least ``split_factor`` rows. Each hot cell ``h`` splits
    into ``split_factor`` children seeded from its ``split_factor``
    smallest-id stored vectors (the :func:`ivf_seed_centroids` stance
    — deterministic and SQL-mirrorable; rebuild with
    ``mode='kmeans'`` when trained geometry is worth a full pass):

    - child 0 keeps the cell id ``h`` (untouched cells never renumber,
      and cell ids stay DENSE 0..n_cells-1 — the PQ serve's positional
      centroid matrix relies on that); child j>=1 gets id
      ``n_cells + hi*(split_factor-1) + (j-1)`` where ``hi`` is the
      hot cell's 0-based rank among hot cells in ascending-id order —
      a closed form any reader (or the SQL mirror) can re-derive;
    - the hot cell's rows reassign to the child with the max
      sequential-fold dot, tie to the smaller child id (child 0's id
      is below every new id, so new-cell-ASC == child-index-ASC — the
      exact `_assign_cells_declarative` rule);
    - ONLY the hot cells' partitions rewrite (staged to a sibling tmp
      directory, then swapped — the :mod:`.upsert` discipline);
      ``centroids/`` is rewritten with child-0 vectors replacing the
      hot centroids plus the new children appended (bounded relation);
      ``meta.n_cells`` grows by ``n_hot * (split_factor - 1)``.

    Serving needs no code change — it reads the centroid relation —
    and tombstones are untouched (ids never change). What a rebalance
    buys is PROBE GRANULARITY (measured, PLANS.md round-10 addendum):
    at fixed n_probe the probed scan shrinks and the serve speeds up
    at some recall cost; at EQUAL scan budget (raise n_probe to match
    the pre-rebalance probed fraction) recall meets-or-beats the
    drifted index AND the serve stays faster. A mega-cell may need
    several passes (its halves can still exceed the new mean) — re-run
    until ``n_hot_cells`` is 0; each pass rewrites only the current
    hot partitions. Returns a one-row observable (n_hot_cells,
    n_new_cells, rows_moved, n_cells_before, n_cells_after); no-op
    when no cell is hot.

    ``refine=N`` runs N deterministic Lloyd iterations on each hot
    cell's children ONLY, over a bounded smallest-id sample of that
    cell's members (``refine_sample`` rows max per hot cell — the
    train_cells economics, driver numpy, corpus-size-free). The
    round-10 drift table showed the seeded split trading recall@10 at
    fixed n_probe (0.771→0.740); the refined children recover it by
    placing the split boundary at the actual sub-cluster geometry
    instead of the two smallest-id members. ``refine=0`` (default)
    stays the bit-exact SQL-rederivable seeded split that the
    registered oracle queries pin; the refined mode's recall gate
    lives in pytest and tools/rebalance_sweep.py.

    SINGLE-WRITER: rebalance mutates cells/, centroids/ and meta/
    in place (guarded by the :func:`~.upsert.index_write_lock` marker
    — a concurrent upsert/rebalance raises). CRASH-TRANSACTIONAL: all
    three relations stage aside and commit under ONE journal
    (:func:`~.txn.commit_swaps`) — a crash at any point serves exactly
    the old index (journal never written) or is rolled forward to
    exactly the new one by
    :func:`~linktransformer_spark.recover_index`; readers raise on a
    pending journal instead of serving a torn mix."""
    from .tombstones import refresh_index_path
    from .txn import commit_swaps
    from .upsert import index_write_lock

    with index_write_lock(spark, path):
        meta = _read_ivf_meta(spark, path)
        n_cells0 = int(meta["n_cells"])
        n_hot, n_new, moved, n_after, entries, cleanup = _rebalance_cells(
            spark, path, str(meta["id_col"]), str(meta["vector_col"]), [],
            n_cells0, max_over_mean, split_factor,
            refine=refine, refine_sample=refine_sample,
        )
        if n_hot:
            # stage meta aside and commit cells/ + centroids/ + meta/
            # under ONE journal — the three relations change together
            spark.createDataFrame(
                [(_IVF_INDEX_VERSION, int(n_after), str(meta["mode"]),
                  str(meta["id_col"]), str(meta["vector_col"]))],
                "version int, n_cells int, mode string, id_col string, "
                "vector_col string",
            ).coalesce(1).write.mode("overwrite").json(
                f"{path}/meta._lt_stage"
            )
            entries.append(("swap", "meta._lt_stage", "meta"))
            commit_swaps(spark, path, entries,
                         cleanup=cleanup + ["meta._lt_stage"])
            refresh_index_path(spark, path)
    return _rebalance_stats(spark, n_hot, n_new, moved, n_cells0, n_after)


def rebalance_pq_index(
    spark,
    path: str,
    max_over_mean: float = 4.0,
    split_factor: int = 2,
    refine: int = 0,
    refine_sample: int = 2048,
) -> DataFrame:
    """The :func:`rebalance_ivf_index` twin for the r90 serving index
    (:func:`~.serving.save_pq_index` — the family that actually drifts
    in production, since appends encode against the frozen model).
    Identical split semantics and surgery; the frozen per-row PQ
    ``codes`` ride along untouched (they encode against the CODEBOOK,
    which is cell-independent — moving a row between cells never
    re-encodes it), and the new cell ids stay dense so the serve's
    positional centroid matrix (`_load_pq_model`) keeps working.
    ``meta.n_cells`` grows; the auto serving knobs (n_probe,
    retrieve_k) re-derive from it on the next serve, so a rebalanced
    index automatically probes proportionally more cells."""
    from .tombstones import refresh_index_path
    from .serving import _read_pq_meta, _write_pq_meta
    from .txn import commit_swaps
    from .upsert import index_write_lock

    with index_write_lock(spark, path):
        # meta is read and written back — read it inside the lock so a
        # writer serialized behind a concurrent upsert sees the fresh
        # n_rows, not a stale pre-upsert value
        meta = _read_pq_meta(spark, path)
        n_cells0 = int(meta["n_cells"])
        n_hot, n_new, moved, n_after, entries, cleanup = _rebalance_cells(
            spark, path, str(meta["id_col"]), str(meta["vector_col"]),
            ["codes"], n_cells0, max_over_mean, split_factor,
            refine=refine, refine_sample=refine_sample,
        )
        if n_hot:
            meta["n_cells"] = int(n_after)
            _write_pq_meta(spark, path, meta, int(meta["n_rows"]),
                           rel="meta._lt_stage")
            entries.append(("swap", "meta._lt_stage", "meta"))
            commit_swaps(spark, path, entries,
                         cleanup=cleanup + ["meta._lt_stage"])
            refresh_index_path(spark, path)
    return _rebalance_stats(spark, n_hot, n_new, moved, n_cells0, n_after)
