"""Serving-grade approximate nearest-neighbor retrieval — the measured
>= 0.9-recall@10 recipe (IVF-PQ scan-wide + exact re-rank).

The reference serves exact FAISS IndexFlatIP
(/root/reference/src/linktransformer/infer.py:144-151); a user replacing
it needs an approximate configuration whose recall is MEASURED, not
hoped. This module is that configuration, with the evidence baked into
the defaults:

**The r90 recipe** (``ann_serving_topk`` / ``save_pq_index`` +
``ann_topk_pq_indexed``), all knobs resolved by
:func:`resolve_serving_params`:

- ``n_cells = clamp(ceil(n/256), 1, 4096)`` — cells bound per-task
  candidate work and give the stored index its partition-pruning key.
- ``n_probe = max(ceil(0.75 * n_cells), min(n_cells, 8))`` — probe
  WIDE. On the bench corpus (synthetic near-uniform 64-dim sphere —
  deliberately the hard case: no global cluster structure for cells to
  exploit) cell-locality alone cannot reach 0.9 recall at a narrow
  probe; what makes wide probing affordable is that the probed scan
  reads 8-bit PQ codes (m bytes/vector), not d doubles.
- ``m = 16`` subquantizers (4-dim subspaces at d=64), ``n_codes =
  min(256, n)`` codewords — 16 bytes/vector, a 32x scan/shuffle/memory
  cut vs float64 vectors.
- ``retrieve_k = max(40*k, 400)`` — the ADC shortlist is retrieve-wide;
  only those rows fetch their true vectors for the exact re-rank, so
  full-precision work per query is O(retrieve_k), independent of the
  corpus.

Measured operating points (recall@10 vs exact top-10, self-join batch,
numpy replica of exactly these fold semantics; re-measured per round in
bench.py's ``recall_at_10`` telemetry):

=====================  ========  =========================
corpus                 recall    config (auto-resolved)
=====================  ========  =========================
sf0.1   (n=2,000)      0.99      cells=8  probe=8  rk=400
sf1     (n=20,000)     0.91      cells=79 probe=60 rk=400
=====================  ========  =========================

Raise ``retrieve_k`` (first knob), ``n_probe``, or ``n_codes`` to buy
more recall; the sf1 curve: rk=800 -> 0.96, rk=1600 -> 0.98.

Why this shape at 100 TB: the only full-precision passes are the
one-time index build and the |Q| x retrieve_k re-rank join; serving
scans (cell-pruned) byte codes with Arrow-batched numpy lookup-adds and
ships ``partitions x |Q| x retrieve_k`` narrow candidate rows — no
corpus broadcast (broadcast_knn's limit), no |Q| x |corpus| pair
materialization (exact_cross's limit). The query batch is the bounded
side (collected + closure-shipped — the same documented contract as
broadcast_knn's right side, knn_join.py:284).

Bit-determinism: every float accumulation in the numpy stages is
per-dimension left-associative (never BLAS matmul), matching the
``F.aggregate(zip_with(...))`` folds of the declarative ivf_pq path and
the DuckDB oracle's ``list_reduce`` — so ``ann_serving_topk`` equals
:func:`~linktransformer_spark.operators.ann.ivf_pq_rerank_topk` on the
same parameters bit-for-bit, and the registered query has a full SQL
oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from . import knn_join as KJ

SERVE_MAX_CELLS = 4096       # centroid collect stays bounded
SERVE_MAX_QUERY_BATCH = 65536
_PQ_INDEX_VERSION = 1


def resolve_serving_params(
    n: int,
    dim: int,
    k: int = 10,
    n_cells: int | str = "auto",
    n_probe: int | str = "auto",
    m: int | str = "auto",
    n_codes: int | str = "auto",
    retrieve_k: int | str = "auto",
) -> dict:
    """Resolve the r90 serving knobs (module doc) from corpus size.

    Every parameter accepts an explicit int to pin it (the registered
    oracle query pins all of them for a byte-stable SQL mirror)."""
    if n_cells == "auto":
        n_cells = min(max(1, math.ceil(n / 256)), SERVE_MAX_CELLS)
    n_cells = int(n_cells)
    if n_cells < 1:
        raise ValueError("n_cells must be >= 1")
    if n_probe == "auto":
        n_probe = max(math.ceil(0.75 * n_cells), min(n_cells, 8))
    n_probe = min(int(n_probe), n_cells)
    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    if m == "auto":
        m = next((c for c in (16, 8, 4, 2, 1) if dim % c == 0))
    m = int(m)
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim {dim}, got {m}")
    if n_codes == "auto":
        n_codes = min(256, max(1, n))
    n_codes = int(n_codes)
    if n_codes < 1:
        raise ValueError("n_codes must be >= 1")
    if retrieve_k == "auto":
        retrieve_k = max(40 * k, 400)
    retrieve_k = int(retrieve_k)
    if retrieve_k < k:
        raise ValueError(f"retrieve_k {retrieve_k} must be >= k {k}")
    return {
        "n_cells": n_cells, "n_probe": n_probe, "m": m,
        "n_codes": n_codes, "retrieve_k": retrieve_k,
    }


# ---------------------------------------------------------------------------
# numpy replicas of the declarative fold semantics. Each accumulation
# is per-dimension left-associative — acc = (((0 + x0) + x1) + ...) —
# the bit-exact order of similarity.dot / oracle.sql_dot. Never matmul.

def _np_normalize(V):
    import numpy as np

    acc = np.zeros(V.shape[0], dtype=np.float64)
    for t in range(V.shape[1]):
        acc = acc + V[:, t] * V[:, t]
    nrm = np.maximum(np.sqrt(acc), 1e-12)
    return V / nrm[:, None]


def _np_dot_all(A, B):
    """(na, d) x (nb, d) -> (na, nb) left-assoc dots."""
    import numpy as np

    acc = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
    for t in range(A.shape[1]):
        acc = acc + A[:, t : t + 1] * B[None, :, t]
    return acc


def _np_assign_cell(V, C):
    """Nearest centroid, tie (dot DESC, cell ASC) — argmax returns the
    first (= lowest-index) max, matching _assign_cells_declarative."""
    return _np_dot_all(V, C).argmax(1)


def _np_encode(V, book):
    """PQ codes (n, m): per subspace, nearest codeword by left-assoc
    dot, tie (dot DESC, code ASC) — mirrors ann._pq_encode."""
    import numpy as np

    n, d = V.shape
    n_codes, m, ds = book.shape
    codes = np.empty((n, m), dtype=np.int64)
    for sub in range(m):
        codes[:, sub] = _np_dot_all(
            V[:, sub * ds : (sub + 1) * ds], book[:, sub, :]
        ).argmax(1)
    return codes


def _np_train_cells(V, C, n_iter: int):
    """Deterministic spherical k-means refine of the coarse centroids:
    assignment by the SAME max-dot/first-max rule serving uses
    (_np_assign_cell), update = normalized mean, FIXED iteration
    count, sample in id order — rebuildable bit-for-bit from the same
    corpus. Cells that lose every member keep their centroid (the
    ivf_train_centroids rule)."""
    import numpy as np

    C = C.copy()
    for _ in range(int(n_iter)):
        a = _np_dot_all(V, C).argmax(1)
        newC = C.copy()
        for c in np.unique(a):
            newC[c] = V[a == c].mean(axis=0)
        C = _np_normalize(newC)
    return C


def _np_train_book(V, book, n_iter: int):
    """Per-subspace codeword refine under the SAME max-dot encoding
    rule (_np_encode): assignment by first-max dot, update = plain
    subvector mean (the ADC target is dot(q_sub, codeword) ~
    dot(q_sub, x_sub), so the cluster mean is the estimator), fixed
    iterations, empty codes keep their codeword."""
    import numpy as np

    n_codes, m, ds = book.shape
    book = book.copy()
    for sub in range(m):
        X = V[:, sub * ds:(sub + 1) * ds]
        B = book[:, sub, :].copy()
        for _ in range(int(n_iter)):
            a = _np_dot_all(X, B).argmax(1)
            newB = B.copy()
            for c in np.unique(a):
                newB[c] = X[a == c].mean(axis=0)
            B = newB
        book[:, sub, :] = B
    return book


def _np_probe_mask(Q, C, n_probe):
    """(n_q, n_cells) bool: the n_probe nearest cells per query, tie
    (dot DESC, cell ASC)."""
    import numpy as np

    dots = _np_dot_all(Q, C)
    n_q, n_cells = dots.shape
    cells = np.tile(np.arange(n_cells), (n_q, 1))
    order = np.lexsort((cells, -dots), axis=1)[:, :n_probe]
    mask = np.zeros((n_q, n_cells), dtype=bool)
    np.put_along_axis(mask, order, True, axis=1)
    return mask


def _np_lut(Q, book):
    """(n_q, m, n_codes) ADC lookup table, left-assoc subvector dots."""
    import numpy as np

    n_codes, m, ds = book.shape
    lut = np.empty((Q.shape[0], m, n_codes), dtype=np.float64)
    for sub in range(m):
        lut[:, sub, :] = _np_dot_all(
            Q[:, sub * ds : (sub + 1) * ds], book[:, sub, :]
        )
    return lut


def _candidate_gen(Q, qids, probe_mask, book, retrieve_k, C=None,
                   vec_field=None, code_field=None, cell_field=None,
                   id_field="_cid"):
    """mapInPandas generator: score a corpus partition's rows against
    the (closure-shipped) query batch with ADC lookup-adds, keep — per
    query — every row that can reach the global top-``retrieve_k``
    shortlist, and emit exact per-partition top-``retrieve_k``
    candidates ordered by (adc DESC, id ASC).

    Two input shapes: raw vectors (``vec_field`` + centroids ``C`` —
    the inline path normalizes/assigns/encodes here) or pre-encoded
    index rows (``code_field`` + ``cell_field`` — the stored-index
    path). ADC sums fold the m subspace terms in subspace order
    (left-assoc), bit-matching the declarative ivf_pq fold."""
    import numpy as np
    import pandas as pd

    m = book.shape[1]
    lut = _np_lut(Q, book)           # per-task, O(|Q|*m*n_codes*ds)
    n_q = Q.shape[0]

    def gen(batches):
        kept_q, kept_c, kept_s = [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if vec_field is not None:
                V = _np_normalize(
                    np.array(pdf[vec_field].tolist(), dtype=np.float64)
                )
                cell = _np_assign_cell(V, C)
                codes = _np_encode(V, book)
            else:
                cell = pdf[cell_field].to_numpy(dtype=np.int64)
                codes = np.array(pdf[code_field].tolist(), dtype=np.int64)
            cids = pdf[id_field].to_numpy(dtype=np.int64)
            b = len(cids)
            scores = np.zeros((n_q, b), dtype=np.float64)
            for sub in range(m):             # subspace-order fold
                scores = scores + lut[:, sub, :][:, codes[:, sub]]
            allowed = probe_mask[:, cell]    # (n_q, b)
            scores = np.where(allowed, scores, -np.inf)
            if b > retrieve_k:
                # keep everything >= the retrieve_k-th largest score —
                # boundary TIES survive to the exact partition-end sort
                thr = np.partition(scores, b - retrieve_k, axis=1)[
                    :, b - retrieve_k
                ]
                keep = scores >= thr[:, None]
            else:
                keep = np.ones_like(scores, dtype=bool)
            keep &= np.isfinite(scores)
            qi, bi = np.nonzero(keep)
            if len(qi):
                kept_q.append(qids[qi])
                kept_c.append(cids[bi])
                kept_s.append(scores[qi, bi])
        if kept_q:
            q = np.concatenate(kept_q)
            c = np.concatenate(kept_c)
            s = np.concatenate(kept_s)
            # exact per-query top-R by (adc DESC, id ASC)
            order = np.lexsort((c, -s, q))
            q, c, s = q[order], c[order], s[order]
            _, first = np.unique(q, return_index=True)
            starts = np.zeros(len(q), dtype=np.int64)
            starts[first] = first
            starts = np.maximum.accumulate(starts)
            rank = np.arange(len(q)) - starts
            sel = rank < retrieve_k
            yield pd.DataFrame(
                {"_qid": q[sel], "_cid": c[sel], "_adc": s[sel]}
            )

    return gen


def _shortlist_and_rerank(cand, queries_norm, corpus_norm, k, retrieve_k,
                          q_model=None):
    """Global top-``retrieve_k`` shortlist by (adc DESC, id ASC), then
    exact re-rank: only shortlisted pairs fetch true vectors (id
    equi-joins), score = the left-assoc dot, final top-k by
    (score DESC, id ASC).

    ``q_model=(qids, Q)``: the serving paths already hold the
    (bounded, closure-shipped) query batch driver-side, so the exact
    re-rank runs as one Arrow-batched numpy pass over the shortlist —
    per-dimension left-associated accumulation, bit-equal to the
    ``S.dot`` fold the ``q_model=None`` declarative form keeps (the
    round-10 interpreted-floor fix: the fold ran ~7 µs per shortlist
    row inside the shuffled re-rank stage)."""
    wl = Window.partitionBy("_qid").orderBy(
        F.col("_adc").desc(), F.col("_cid").asc()
    )
    # NOTE (measured, round 13): statically broadcasting the shortlist
    # for the re-rank join regressed the serve 1.8x — the shortlist is
    # |Q| x retrieve_k pairs (800k at the bench shape, 26M at the max
    # batch), i.e. usually the BIGGER side; AQE's runtime SMJ->BHJ
    # conversion already broadcasts whichever side is actually small.
    short = (
        cand.withColumn("_r", F.row_number().over(wl))
        .filter(F.col("_r") <= retrieve_k)
        .select("_qid", "_cid")
    )
    if q_model is not None:
        import numpy as np

        qids, Q = q_model
        spark = cand.sparkSession
        b = spark.sparkContext.broadcast(
            ({int(i): n for n, i in enumerate(qids)}, Q)
        )

        def gen(batches):
            import pandas as pd

            idx, Qm = b.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qi = pdf["_qid"].map(idx).to_numpy(dtype=np.int64)
                Qs = Qm[qi]                                 # (n, d)
                C = np.array(pdf["_cv"].tolist(), dtype=np.float64)
                acc = np.zeros(len(pdf), dtype=np.float64)
                for j in range(Qs.shape[1]):
                    acc = acc + Qs[:, j] * C[:, j]
                yield pd.DataFrame({
                    "_qid": pdf["_qid"].to_numpy(dtype=np.int64),
                    "_cid": pdf["_cid"].to_numpy(dtype=np.int64),
                    "score": acc,
                })

        exact = short.join(corpus_norm, "_cid").mapInPandas(
            gen, schema="_qid long, _cid long, score double"
        )
    else:
        exact = (
            short.join(queries_norm, "_qid")
            .join(corpus_norm, "_cid")
            .withColumn("score", S.dot(F.col("_qv"), F.col("_cv")))
        )
    wk = Window.partitionBy("_qid").orderBy(
        F.col("score").desc(), F.col("_cid").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_cid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            "score",
        )
    )


_CAND_SCHEMA = "_qid long, _cid long, _adc double"


def _spread(df, parts: int):
    """Repartition to ``parts`` only when the incoming plan has fewer
    partitions (small local scans need the spread for the numpy stages
    to parallelize); a scan that already provides at least ``parts``
    tasks skips the round-robin exchange — at scale that exchange
    was a full shuffle of the corpus. Results are partitioning-
    invariant: the candidate generator emits exact per-partition
    top-retrieve_k supersets and the global shortlist re-cuts by the
    same (adc DESC, id ASC) total order."""
    from .knn_join import ensure_parallelism

    # delegates to the shared memoized probe (leaf-size split estimate
    # + spread-decision memo): the previous .rdd.getNumPartitions()
    # probe measured 135-290 ms of physical planning per construction
    return ensure_parallelism(df, min_parts=parts)


def _resolve_parts(spark, n: int, rows_per_task: int) -> int:
    """Task count for the numpy stages: at least ceil(n/rows_per_task)
    (bounds per-task memory at scale), but never leave cores idle on a
    small corpus — measured 11.4s -> 3.9s at sf0.1 when the single
    8192-row task became 8 (the encode/ADC numpy is the wall there,
    and it parallelizes perfectly). Extra tasks cost only narrow
    candidate rows in the shortlist shuffle (|parts| x |Q| x
    retrieve_k), negligible next to the scoring work they spread."""
    dp = spark.sparkContext.defaultParallelism
    return max(1, math.ceil(n / rows_per_task), min(dp, math.ceil(n / 256)))


def _collect_query_batch(queries, query_id, vector_col, max_query_batch):
    rows = (
        queries.select(
            F.col(query_id).cast("long").alias("_qid"),
            F.col(query_id).isNull().alias("_src_null"),
            F.col(vector_col),
        )
        .limit(max_query_batch + 1)
        .collect()
    )
    if len(rows) > max_query_batch:
        raise ValueError(
            f"serving query batch exceeds {max_query_batch} rows — the "
            "query side is the bounded, closure-shipped side (same "
            "contract as broadcast_knn's right side); split the batch "
            "or raise max_query_batch"
        )
    # the non-ANSI long cast nulls an unconvertible id (e.g. a string)
    # SILENTLY — those queries would vanish from the result with no
    # signal; the batch is already collected, so the check is free
    nbad = sum(1 for r in rows if r["_qid"] is None and not r["_src_null"])
    nnull = sum(1 for r in rows if r["_src_null"])
    if nbad or nnull:
        raise ValueError(
            f"serving query batch: {nbad} id(s) in {query_id!r} do not "
            f"cast to long and {nnull} are NULL — those queries would "
            "silently drop from the result; fix the id column (add a "
            "surrogate id via ids.with_row_id if needed)"
        )
    return rows


def ann_serving_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    k: int = 10,
    n_cells: int | str = "auto",
    n_probe: int | str = "auto",
    m: int | str = "auto",
    n_codes: int | str = "auto",
    retrieve_k: int | str = "auto",
    dim: int | None = None,
    rows_per_task: int = 8192,
    max_query_batch: int = SERVE_MAX_QUERY_BATCH,
) -> DataFrame:
    """THE serving default for top-k cosine retrieval (module doc): the
    r90 IVF-PQ scan-wide + exact-re-rank recipe, inline (no stored
    index — :func:`save_pq_index` + :func:`ann_topk_pq_indexed` is the
    build-once production form of exactly this plan).

    Returns (query_id, neighbor_id, rank, score); score is the EXACT
    cosine (re-rank output), deterministic tie-break (score DESC,
    neighbor_id ASC). Bit-equal to ``ivf_pq_rerank_topk`` on the same
    pinned parameters."""
    import numpy as np

    if k < 1:
        raise ValueError("k must be >= 1")
    spark = corpus.sparkSession
    # corpus count and dim in ONE scan job (dim rides the count's pass
    # as a first() aggregate instead of its own action)
    nd = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(vector_col)).alias("d"),
    ).first()
    n = int(nd["n"])
    empty = spark.createDataFrame(
        [], "query_id long, neighbor_id long, rank int, score double"
    )
    if n == 0:
        return empty
    if dim is None:
        dim = int(nd["d"])
    p = resolve_serving_params(
        n, dim, k, n_cells=n_cells, n_probe=n_probe, m=m,
        n_codes=n_codes, retrieve_k=retrieve_k,
    )
    qrows = _collect_query_batch(queries, query_id, vector_col,
                                 max_query_batch)
    if not qrows:
        return empty

    # seeds: the smallest-id corpus vectors (the deterministic rule
    # shared with ivf_seed_centroids / pq_codebook); bounded collect
    # <= max(n_cells, n_codes) <= SERVE_MAX_CELLS rows
    n_seed = max(p["n_cells"], p["n_codes"])
    seeds = (
        corpus.select(
            F.col(corpus_id).cast("long").alias("_cid"), F.col(vector_col)
        )
        .orderBy("_cid")
        .limit(n_seed)
        .collect()
    )
    SV = _np_normalize(
        np.array([r[vector_col] for r in seeds], dtype=np.float64)
    )
    C = SV[: p["n_cells"]]
    ds = dim // p["m"]
    book = SV[: p["n_codes"]].reshape(min(p["n_codes"], len(SV)), p["m"], ds)

    qids = np.array([r["_qid"] for r in qrows], dtype=np.int64)
    Q = _np_normalize(np.array([r[vector_col] for r in qrows],
                               dtype=np.float64))
    probe_mask = _np_probe_mask(Q, C, p["n_probe"])

    parts = _resolve_parts(spark, n, rows_per_task)
    gen = _candidate_gen(Q, qids, probe_mask, book, p["retrieve_k"],
                         C=C, vec_field=vector_col, id_field="_cid")
    cand = _spread(
        corpus.select(
            F.col(corpus_id).cast("long").alias("_cid"), F.col(vector_col)
        ),
        parts,
    ).mapInPandas(gen, schema=_CAND_SCHEMA)
    qn = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, Q)],
        "_qid long, _qv array<double>",
    )
    cn = corpus.select(
        F.col(corpus_id).cast("long").alias("_cid"),
        S.l2_normalize(F.col(vector_col)).alias("_cv"),
    )
    return _shortlist_and_rerank(cand, F.broadcast(qn), cn, k,
                                 p["retrieve_k"], q_model=(qids, Q))


# ---------------------------------------------------------------------------
# the stored-index form: build once (one corpus pass), probe many.

def _encode_cells(corpus, corpus_id: str, vector_col: str, C, book,
                  parts: int):
    """The PQ ingest stage shared by build and append: normalize,
    assign each vector to its nearest (frozen) centroid, encode the m
    sub-vectors against the (frozen) codebook — one Arrow-batched pass,
    per-dimension left-associative accumulation (bit-equal to the
    declarative SQL mirror)."""
    import numpy as np

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_normalize(
                np.array(pdf["_v"].tolist(), dtype=np.float64)
            )
            cell = _np_assign_cell(V, C)
            codes = _np_encode(V, book)
            yield pd.DataFrame(
                {
                    "_cid": pdf["_cid"].to_numpy(dtype=np.int64),
                    "_v": list(V),
                    "codes": list(codes.astype(np.int16)),
                    "cell": cell.astype(np.int32),
                }
            )

    return (
        _spread(
            corpus.select(
                F.col(corpus_id).cast("long").alias("_cid"),
                F.col(vector_col).alias("_v"),
            ),
            parts,
        )
        .mapInPandas(
            gen,
            schema=(
                "_cid long, _v array<double>, codes array<smallint>, "
                "cell int"
            ),
        )
        .select(
            F.col("_cid").alias(corpus_id),
            F.col("_v").alias(vector_col),
            "codes",
            "cell",
        )
    )


def save_pq_index(
    corpus: DataFrame,
    path: str,
    vector_col: str = "embedding",
    corpus_id: str = "vec_id",
    n_cells: int | str = "auto",
    m: int | str = "auto",
    n_codes: int | str = "auto",
    rows_per_task: int = 8192,
    train_cells: int = 0,
    train_codes: int = 0,
) -> None:
    """Materialize the r90 serving index at ``path``: ``cells/``
    parquet PARTITIONED BY cell holding (id, normalized vector, m PQ
    codes) per corpus row, ``centroids/``, ``book/`` (sub, code,
    codeword), and a one-row ``meta/`` json validated at load.

    Scale knobs resolve at BUILD time against the actual corpus count
    (``n_cells='auto'`` = clamp(ceil(n/256), 1, 4096)) and are frozen
    into ``meta/`` — per-cell row count stays ~256 as the corpus
    grows, so per-probe serving I/O tracks the query, not the corpus
    (the round-8 sweep measured the pinned-16 build at 7.1x for 10x
    data; the auto build's serve counterpart is in PLANS.md round 9).

    Serving reads ONLY the probed cell partitions (Spark partition
    pruning on the ``cell`` directory key) and the true vectors only
    for the re-rank shortlist.

    ``train_cells=N`` / ``train_codes=N`` run N deterministic Lloyd
    iterations (driver-side numpy over the smallest-id sample — the
    ivf_train_centroids economics: sample-bounded, corpus-size-free)
    on the coarse centroids / the per-subspace codebook before
    encoding. On a corpus with cluster structure, trained centroids
    concentrate true neighbors into the probed cells, buying the same
    recall at a FAR narrower ``n_probe`` (the measured curve lives in
    PLANS.md round 10 — recall@10 >=0.9 at n_probe <=25% of cells on
    the clustered benchmark, vs ~75% for seeded on the same corpus).
    Default 0 keeps the seeded build — the bit-exact SQL-mirrored
    path every oracle query pins. Either way the resulting model is
    FROZEN into the index; append/serve/purge are agnostic to how the
    centroids were produced."""
    import numpy as np

    spark = corpus.sparkSession
    nd = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(vector_col)).alias("d"),
    ).first()
    n = int(nd["n"])
    if n == 0:
        raise ValueError("cannot build a PQ index over an empty corpus")
    dim = int(nd["d"])
    p = resolve_serving_params(n, dim, 10, n_cells=n_cells, m=m,
                               n_codes=n_codes)
    n_seed = max(p["n_cells"], p["n_codes"])
    if train_cells or train_codes:
        n_seed = min(int(n), max(n_seed * 64, 4096))
    seeds = (
        corpus.select(
            F.col(corpus_id).cast("long").alias("_cid"), F.col(vector_col)
        )
        .orderBy("_cid")
        .limit(n_seed)
        .collect()
    )
    SV = _np_normalize(
        np.array([r[vector_col] for r in seeds], dtype=np.float64)
    )
    C = SV[: p["n_cells"]]
    ds = dim // p["m"]
    book = SV[: p["n_codes"]].reshape(min(p["n_codes"], len(SV)),
                                      p["m"], ds)
    if train_cells:
        C = _np_train_cells(SV, C, train_cells)
    if train_codes:
        book = _np_train_book(SV, book, train_codes)

    enc = _encode_cells(corpus, corpus_id, vector_col, C, book,
                        _resolve_parts(spark, n, rows_per_task))
    from .tombstones import clear_tombstones
    from .txn import clear_commit_journal
    from .upsert import clear_writer_lock

    clear_tombstones(spark, path)
    clear_writer_lock(spark, path)
    clear_commit_journal(spark, path)
    enc.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")
    spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(len(C))],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (int(sub), int(code), [float(x) for x in book[code, sub]])
            for code in range(book.shape[0])
            for sub in range(p["m"])
        ],
        "sub int, code int, codeword array<double>",
    ).write.mode("overwrite").parquet(f"{path}/book")
    spark.createDataFrame(
        [(
            _PQ_INDEX_VERSION, p["n_cells"], p["m"], p["n_codes"],
            int(dim), corpus_id, vector_col, int(n),
        )],
        "version int, n_cells int, m int, n_codes int, dim int, "
        "id_col string, vector_col string, n_rows bigint",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    from .tombstones import refresh_index_path

    refresh_index_path(spark, path)


def _read_pq_meta(spark: SparkSession, path: str) -> dict:
    from .txn import assert_no_pending_commit

    assert_no_pending_commit(spark, path)
    meta = spark.read.json(f"{path}/meta").collect()[0].asDict()
    if int(meta["version"]) != _PQ_INDEX_VERSION:
        raise ValueError(
            f"pq index at {path} has version {meta['version']}, "
            f"this build reads version {_PQ_INDEX_VERSION}"
        )
    return meta


def _load_pq_model(spark: SparkSession, path: str, meta: dict):
    """The frozen (centroids, codebook) numpy pair of a stored PQ
    index — both bounded collects (n_cells and n_codes x m rows)."""
    import numpy as np

    cent = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    C = np.array([r["centroid"] for r in cent], dtype=np.float64)
    brows = spark.read.parquet(f"{path}/book").collect()
    m = int(meta["m"])
    n_codes = int(meta["n_codes"])
    book = np.empty((n_codes, m, int(meta["dim"]) // m), dtype=np.float64)
    for r in brows:
        book[r["code"], r["sub"], :] = r["codeword"]
    return C, book


def _write_pq_meta(spark: SparkSession, path: str, meta: dict,
                   n_rows: int, rel: str = "meta") -> None:
    spark.createDataFrame(
        [(
            _PQ_INDEX_VERSION, int(meta["n_cells"]), int(meta["m"]),
            int(meta["n_codes"]), int(meta["dim"]), str(meta["id_col"]),
            str(meta["vector_col"]), int(n_rows),
        )],
        "version int, n_cells int, m int, n_codes int, dim int, "
        "id_col string, vector_col string, n_rows bigint",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/{rel}")


def _commit_pq_meta(spark: SparkSession, path: str, meta: dict,
                    n_rows: int) -> None:
    """Stage + journal the meta rewrite of a LIVE pq index (the
    append/upsert ``n_rows`` updates): a bare overwrite is
    delete-then-write, and a crash in between leaves the index without
    a meta — unopenable for nothing. The journaled single swap serves
    old-or-new like every other in-place mutation."""
    from .txn import commit_swaps

    _write_pq_meta(spark, path, meta, n_rows, rel="meta._lt_stage")
    commit_swaps(spark, path, [("swap", "meta._lt_stage", "meta")],
                 cleanup=("meta._lt_stage",))


def append_to_pq_index(
    new: DataFrame,
    path: str,
    vector_col: str | None = None,
    corpus_id: str | None = None,
    rows_per_task: int = 8192,
) -> None:
    """Append a corpus batch to a :func:`save_pq_index` directory.

    Sound without a rebuild for the same reason as
    :func:`~.ann.append_to_ivf_index`: the index's scoring state is
    per-row (frozen centroids + frozen codebook), so new vectors
    encode against the stored model and append into the cell
    partitions; existing rows and every previously-correct probe stay
    untouched. ``meta/`` is rewritten with the grown ``n_rows`` — an
    informational count (read back by :func:`purge_pq_index`'s
    re-derivation and the observability surface); the auto serving
    knobs (n_probe, retrieve_k) derive from the frozen ``n_cells``
    and the request's ``k``, not from ``n_rows``.

    The documented drift is quantization quality, not correctness:
    centroids and codewords were trained (seeded) on the build-time
    corpus, so a heavily drifted append distribution degrades
    cells-balance and ADC tightness — monitor cell sizes and rebuild,
    the standard IVF-PQ maintenance trade. Ids must be unique across
    batches; a tombstoned id (:func:`delete_from_pq_index`) stays
    masked even if re-appended, until a purge clears the tombstones.

    Takes the :func:`~.upsert.index_write_lock` (reentrant under an
    upsert): the append's new files and the meta rewrite would be
    silently lost under a concurrent rebalance/upsert swap."""
    from .tombstones import refresh_index_path
    from .upsert import index_write_lock

    spark = new.sparkSession
    with index_write_lock(spark, path):
        _append_to_pq_index_locked(new, path, vector_col, corpus_id,
                                   rows_per_task)


def _append_to_pq_index_locked(new, path, vector_col, corpus_id,
                               rows_per_task):
    from .tombstones import refresh_index_path

    spark = new.sparkSession
    meta = _read_pq_meta(spark, path)
    id_col = corpus_id or str(meta["id_col"])
    vec_col = vector_col or str(meta["vector_col"])
    C, book = _load_pq_model(spark, path, meta)
    n_new = new.count()
    if n_new == 0:
        return
    d0 = int(new.select(F.size(vec_col).alias("d")).first()["d"])
    if d0 != int(meta["dim"]):
        raise ValueError(
            f"appended vectors have dim {d0}, index at {path} was built "
            f"with dim {meta['dim']} — mismatched dims would encode "
            "garbage codes silently"
        )
    enc = _encode_cells(
        new.select(
            F.col(id_col).cast("long").alias(str(meta["id_col"])),
            F.col(vec_col).alias(str(meta["vector_col"])),
        ),
        str(meta["id_col"]), str(meta["vector_col"]), C, book,
        _resolve_parts(spark, n_new, rows_per_task),
    )
    enc.repartition("cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")
    _commit_pq_meta(spark, path, meta, int(meta["n_rows"]) + n_new)
    refresh_index_path(spark, path)


def delete_from_pq_index(
    ids: DataFrame,
    path: str,
    id_col: str | None = None,
) -> None:
    """Tombstone corpus ids in a :func:`save_pq_index` directory (see
    :mod:`.tombstones`). Deleted vectors vanish from
    :func:`ann_topk_pq_indexed` immediately — masked before BOTH the
    ADC scan and the exact re-rank, so survivors take the freed
    shortlist and top-k slots. As with the IVF index there is no score
    staleness: scoring state is per-row, so the tombstoned serve
    equals a filtered rebuild with the same frozen model.
    ``meta.n_rows`` stays at the ingested count until a purge (it is
    informational — the serve-time auto knobs derive from ``n_cells``
    and ``k`` only, so tombstones cannot drift them)."""
    from .tombstones import refresh_index_path, write_tombstones

    spark = ids.sparkSession
    meta = _read_pq_meta(spark, path)
    stored = str(meta["id_col"])
    write_tombstones(ids, path, id_col or stored, stored, stored_rel="cells")
    refresh_index_path(spark, path)


def purge_pq_index(spark: SparkSession, path: str, out_path: str) -> None:
    """Physically apply a PQ index's tombstones: rewrite ``cells/``
    minus the deleted rows into a fresh index at ``out_path`` (frozen
    centroids/codebook copied, ``n_rows`` re-counted from the
    survivors, tombstone set empty). Serving from the purged index is
    bit-identical to the tombstoned serve at the same explicit
    (n_probe, retrieve_k); with auto knobs, the purged index's params
    re-derive from the SURVIVING count — the honest corpus size. Same
    write-then-rename commit discipline as the other purge/compact
    paths."""
    from .tombstones import (
        anti_tombstones, clear_tombstones, refresh_index_path,
        require_distinct_out,
    )

    require_distinct_out(path, out_path, "purge_pq_index")
    meta = _read_pq_meta(spark, path)
    stored = str(meta["id_col"])
    cells = spark.read.parquet(f"{path}/cells")
    kept = anti_tombstones(cells, spark, path, stored, stored)
    clear_tombstones(spark, out_path)
    kept.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{out_path}/cells")
    for part in ("centroids", "book"):
        spark.read.parquet(f"{path}/{part}").write.mode(
            "overwrite"
        ).parquet(f"{out_path}/{part}")
    n_kept = (
        spark.read.parquet(f"{out_path}/cells").count()
    )
    _write_pq_meta(spark, out_path, meta, n_kept)
    refresh_index_path(spark, out_path)


def ann_topk_pq_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    k: int = 10,
    n_probe: int | str = "auto",
    retrieve_k: int | str = "auto",
    max_query_batch: int = SERVE_MAX_QUERY_BATCH,
) -> DataFrame:
    """Serve the r90 recipe from a :func:`save_pq_index` directory.

    The probed cells are pushed as a partition filter on ``cells/``
    (the scan reads n_probe/n_cells of the code rows and nothing
    else); ADC scoring streams those partitions through the same
    Arrow-batched lookup-add generator as the inline path; true
    vectors are read only for the shortlist re-rank (id equi-join on
    the pruned scan). Results equal :func:`ann_serving_topk` on the
    same corpus and parameters."""
    import numpy as np

    if k < 1:
        raise ValueError("k must be >= 1")
    meta = _read_pq_meta(spark, path)
    p = resolve_serving_params(
        int(meta["n_rows"]), int(meta["dim"]), k,
        n_cells=int(meta["n_cells"]), n_probe=n_probe,
        m=int(meta["m"]), n_codes=int(meta["n_codes"]),
        retrieve_k=retrieve_k,
    )
    cent = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    C = np.array([r["centroid"] for r in cent], dtype=np.float64)
    brows = spark.read.parquet(f"{path}/book").collect()
    book = np.empty((p["n_codes"], p["m"], int(meta["dim"]) // p["m"]),
                    dtype=np.float64)
    for r in brows:
        book[r["code"], r["sub"], :] = r["codeword"]

    qrows = _collect_query_batch(queries, query_id, vector_col,
                                 max_query_batch)
    empty = spark.createDataFrame(
        [], "query_id long, neighbor_id long, rank int, score double"
    )
    if not qrows:
        return empty
    qids = np.array([r["_qid"] for r in qrows], dtype=np.int64)
    Q = _np_normalize(np.array([r[vector_col] for r in qrows],
                               dtype=np.float64))
    probe_mask = _np_probe_mask(Q, C, p["n_probe"])
    probed = sorted(int(c) for c in np.nonzero(probe_mask.any(0))[0])

    id_col = str(meta["id_col"])
    vec_col = str(meta["vector_col"])
    stored = spark.read.parquet(f"{path}/cells").filter(
        F.col("cell").isin(probed)
    )
    # tombstoned vectors drop out before BOTH the ADC scan and the
    # exact re-rank (cn below derives from the same filtered relation)
    from .tombstones import anti_tombstones

    stored = anti_tombstones(stored, spark, path, id_col, id_col)
    gen = _candidate_gen(Q, qids, probe_mask, book, p["retrieve_k"],
                         code_field="codes", cell_field="cell",
                         id_field=id_col)
    cand = stored.select(
        F.col(id_col).cast("long").alias(id_col), "codes", "cell"
    ).mapInPandas(gen, schema=_CAND_SCHEMA)
    qn = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, Q)],
        "_qid long, _qv array<double>",
    )
    cn = stored.select(
        F.col(id_col).cast("long").alias("_cid"),
        F.col(vec_col).alias("_cv"),  # stored normalized at build
    )
    return _shortlist_and_rerank(cand, F.broadcast(qn), cn, k,
                                 p["retrieve_k"], q_model=(qids, Q))


def hybrid_topk_indexed(
    spark: SparkSession,
    bm25_path: str,
    pq_path: str,
    queries: DataFrame,
    query_id: str = "q_id",
    query_col: str = "q_text",
    vector_col: str = "embedding",
    k: int = 10,
    k_arm: int = 10,
    k_rrf: int = 60,
    n_probe: int | str = "auto",
    retrieve_k: int | str = "auto",
    max_df_ratio: float | None = None,
    max_query_batch: int = SERVE_MAX_QUERY_BATCH,
) -> DataFrame:
    """One-call hybrid retrieval against the STORED indexes: the
    lexical arm serves from a :func:`~.search.save_bm25_index`
    directory, the semantic arm from a :func:`save_pq_index`
    directory (the r90 recipe), and the two top-``k_arm`` lists fuse
    by Reciprocal Rank Fusion (:func:`~.search.rrf_fuse`, Cormack,
    Clarke & Buettcher 2009) — the standard production hybrid stack,
    now one call over two persisted indexes instead of two from-
    scratch corpus passes.

    ``queries`` carries the query id, the query TEXT (``query_col``)
    for the lexical arm, and the query VECTOR (``vector_col``) for
    the semantic arm. Returns (``query_id``, <the BM25 index's stored
    doc id column>, ``rank``, ``rrf_score``, ``n_lists``), top-``k``
    per query by (rrf_score DESC, id ASC).

    Scale shape: each arm keeps its own serve plan untouched — the
    BM25 arm reads only the query terms' bucket partitions, the PQ
    arm only the probed cell partitions plus the shortlist's true
    vectors; fusion is one hash aggregate over the two k_arm-bounded
    candidate lists (cost tracks the query batch, never either
    corpus). Tombstones on EITHER index are honored by that arm's own
    serve path, so a doc deleted from one index simply loses that
    arm's contribution (and drops entirely when deleted from both) —
    delete from both indexes for a full takedown.
    """
    from .search import _read_bm25_meta, bm25_topk_indexed, rrf_fuse

    doc_id = str(_read_bm25_meta(spark, bm25_path)["id_col"])
    if query_id == doc_id:
        raise ValueError(
            f"query_id {query_id!r} collides with the BM25 index's "
            "stored doc id column — rename the query id column"
        )
    bm = bm25_topk_indexed(
        spark, bm25_path,
        queries.select(query_id, query_col),
        query_id=query_id, query_col=query_col, k=k_arm,
        max_df_ratio=max_df_ratio,
    ).select(query_id, doc_id, "rank")
    an = ann_topk_pq_indexed(
        spark, pq_path,
        queries.select(query_id, vector_col),
        vector_col=vector_col, query_id=query_id, k=k_arm,
        n_probe=n_probe, retrieve_k=retrieve_k,
        max_query_batch=max_query_batch,
    ).select(
        F.col("query_id").alias(query_id),
        F.col("neighbor_id").alias(doc_id),
        "rank",
    )
    # arm order is the fusion fold's accumulation order (rrf_fuse
    # folds contributions sorted by arm index): lexical first,
    # semantic second — pinned, so results are reproducible
    return rrf_fuse([bm, an], query_id=query_id, id_col=doc_id,
                    k_rrf=k_rrf, k=k)
