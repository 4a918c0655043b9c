"""BM25 keyword search over a document corpus — impact-scored
inverted-index joins.

Part of the beyond-the-reference training-data tier (the reference's
query surface is embedding-based; corpus curation also needs exact
keyword retrieval: building eval slices, pulling topic subsets,
contamination forensics). Okapi BM25 per Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond".

Why this shape at 100 TB: the index IS a DataFrame
``(term, doc, impact)`` where ``impact`` is the FULL per-posting BM25
contribution ``idf * tf*(k1+1)/(tf + k1*(1-b + b*dl/avgdl))`` — BM25's
per-(query, doc, term) summand depends only on the posting, never on
the query, so it can be baked at index-build time (the same
precomputation Lucene does with its stored norms and impact-ordered
postings). Retrieval is then ONE equi-join of query terms against the
impact relation + a groupBy + a top-k window; the build-time joins
(doc length, document frequency) run once over the posting relation
instead of once per candidate row. Every aggregate partial-aggregates
map-side; nothing leaves the JVM.

The persistable form (:func:`save_bm25_index`) writes the impact
relation partitioned by a term-hash bucket; :func:`bm25_topk_indexed`
computes the buckets of the incoming query terms and pushes
``bucket IN (...)`` down to the parquet scan, so a query batch
touching t distinct terms reads at most t of the ``n_buckets``
partitions — retrieval I/O tracks the query, not the corpus.

Determinism: the BM25 score sums double contributions across matched
terms; a plain SUM's partial-aggregation order is engine- and
partitioning-dependent, so the fold accumulates in term sort order
(same array_sort/aggregate pattern as unigram_lm_score and DSIR) —
bit-identical across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import similarity as S


def _impact_postings(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k1: float,
    b: float,
    frozen_stats: tuple[int, float] | None = None,
    frozen_dfreq: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the impact-scored posting relation.

    Returns ``(postings, dfreq)`` where ``postings`` is
    ``(_tok, _d, _c)`` with ``_c`` the fully precomputed BM25
    contribution of that (term, doc) pair, and ``dfreq`` is
    ``(_tok, _df, _N, _avgdl)`` for stopword-impact pruning and for
    persisting the corpus stats.

    Plan: one doc-side explode -> (doc, dl, term) groupBy (map-side
    combine; the shuffle carries distinct (doc, term) rows, not token
    occurrences — ``dl`` rides the key for free since it is
    functionally dependent on the doc). Corpus stats (N, avgdl) are a
    broadcast one-row aggregate of that relation; IDF joins the
    vocab-sized df relation against it; the final postings join
    reshuffles the posting relation on term ONCE — exactly the
    exchange the retrieval join needs anyway.

    ``frozen_stats=(N, avgdl)`` (the append path) skips the corpus
    aggregate and bakes impacts against the GIVEN stats instead of the
    input's own — how a delta segment scores consistently with the
    base index it joins.
    """
    # spread an unsplit input first (no-op past a shuffle or at scale):
    # the tokenize+explode map stage otherwise runs on the SCAN's
    # partitioning — one task for a single-file corpus, every core idle
    # until the groupBy exchange (guide §2.5 unsplittable input; the
    # same conditional spread the textpipe family took in round 13)
    from .knn_join import ensure_parallelism

    base = ensure_parallelism(docs).select(
        F.col(id_col).alias("_d"),
        S.word_tokens(F.col(text_col)).alias("_toks"),
    )
    dtc = (
        base.select(
            "_d",
            F.size("_toks").alias("_dl"),
            F.explode("_toks").alias("_tok"),
        )
        .groupBy("_d", "_dl", "_tok")
        .agg(F.count("*").alias("_tf"))
        .localCheckpoint(eager=False)
    )
    spark = docs.sparkSession
    if frozen_stats is not None:
        n_docs, avgdl = frozen_stats
        stats = spark.createDataFrame(
            [(int(n_docs), float(avgdl))], "_N bigint, _avgdl double"
        )
    else:
        stats = dtc.agg(
            F.countDistinct("_d").alias("_N"),
            (F.sum("_tf").cast("double") / F.countDistinct("_d")).alias("_avgdl"),
        )
    if frozen_dfreq is not None:
        # delta segment: per-term df comes from the BASE index's frozen
        # vocab (terms unseen there keep df=0 — maximally rare under
        # the Lucene-style idf, which is defined at df=0)
        delta_terms = dtc.select("_tok").distinct()
        dfreq = (
            delta_terms.join(
                frozen_dfreq.select("_tok", "_df"), "_tok", "left"
            )
            .select("_tok", F.coalesce(F.col("_df"), F.lit(0)).alias("_df"))
            .crossJoin(F.broadcast(stats))
        )
    else:
        dfreq = (
            dtc.groupBy("_tok")
            .agg(F.count("*").alias("_df"))
            .crossJoin(F.broadcast(stats))
        )
    idf = dfreq.select("_tok", _idf_expr().alias("_idf"), "_avgdl")
    postings = dtc.join(idf, "_tok").select(
        "_tok",
        "_d",
        _impact_expr(k1, b).alias("_c"),
        "_tf",
        "_dl",
    )
    return postings, dfreq.select("_tok", "_df", "_N", "_avgdl")


def _idf_expr() -> F.Column:
    """Lucene-style non-negative IDF over (_df, _N) — ONE expression
    shape shared by the build and compaction paths so recomputed
    impacts are bit-identical doubles."""
    return F.log(
        F.lit(1.0)
        + (F.col("_N").cast("double") - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )


def _impact_expr(k1: float, b: float) -> F.Column:
    """Full per-posting BM25 contribution over (_idf, _tf, _dl,
    _avgdl) — shared by build and compaction for bit-exact parity."""
    return (
        F.col("_idf")
        * (F.col("_tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("_tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("_dl").cast("double") / F.col("_avgdl"))
            )
        )
    )


def _query_terms(
    queries: DataFrame,
    query_id: str,
    query_col: str,
    dfreq: DataFrame | None,
    max_df_ratio: float | None,
) -> DataFrame:
    """Distinct (query, term) pairs, optionally stopword-impact-pruned
    against the vocab-sized df relation (semi-join BEFORE the posting
    join — the pruning must never touch the big relation)."""
    qterms = queries.select(
        F.col(query_id).alias("_q"),
        F.explode(S.word_tokens(F.col(query_col))).alias("_tok"),
    ).distinct()
    if max_df_ratio is not None:
        if dfreq is None:
            raise ValueError(
                "max_df_ratio pruning needs the index's df relation "
                "(the dfreq/ directory save_bm25_index always writes); "
                "rebuild the index with save_bm25_index"
            )
        keep = dfreq.filter(
            F.col("_df").cast("double")
            <= F.lit(max_df_ratio) * F.col("_N").cast("double")
        ).select("_tok")
        qterms = qterms.join(keep, "_tok", "left_semi")
    return qterms


def _retrieve(
    postings: DataFrame,
    qterms: DataFrame,
    id_col: str,
    query_id: str,
    k: int,
) -> DataFrame:
    """The retrieval tail shared by the live and indexed paths:
    ONE equi-join on term, an order-pinned score fold in window form
    (functions/pinned.py — bit-identical to the collect_list fold,
    measured 5.4s -> 1.4s at sf0.1 on the 2.7M-row one-shot join; the
    groupBy reuses the window's (q, d) exchange), a top-k rank window
    (WindowGroupLimit pushdown)."""
    from ..functions.pinned import pinned_total, with_running_sum

    scored = (
        with_running_sum(
            qterms.join(postings, "_tok"), ["_q", "_d"], "_tok", "_c"
        )
        .groupBy("_q", "_d")
        .agg(
            F.count("*").alias("_nt"),
            pinned_total("_tok").alias("_score"),
        )
    )
    w = Window.partitionBy("_q").orderBy(F.col("_score").desc(), F.col("_d").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.col("_q").alias(query_id),
            F.col("_d").alias(id_col),
            F.col("_r").cast("int").alias("rank"),
            F.col("_score").alias("score"),
            F.col("_nt").cast("long").alias("n_terms"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "q_id",
    query_col: str = "q_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25 (one-shot form:
    index build + retrieval in one plan; for repeated query batches
    over a stable corpus use :func:`save_bm25_index` +
    :func:`bm25_topk_indexed`).

    Tokenization is the engine's standard word tokenizer (lowercase,
    whitespace split — functions/similarity.word_tokens, SQL twin
    ``sql_word_tokens``); query terms are deduplicated per query (the
    classic sum-over-unique-terms form). IDF is the Lucene-style
    non-negative variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Returns ``(query_id, id_col, rank, score, n_terms)`` — ``rank`` is
    1-based by ``score DESC, id ASC``; ``n_terms`` counts matched query
    terms. Queries matching nothing produce no rows (left-join against
    the query table to see them).

    ``max_df_ratio`` (opt-in) drops query terms whose document
    frequency exceeds that fraction of the corpus — classic stopword
    impact pruning. On a corpus where some terms appear in nearly
    every document, those terms contribute ~0 IDF but dominate the
    posting-join volume (a term in every doc costs |Q|x|corpus|
    candidate rows); pruning them bounds the join at
    |Q| x max_df_ratio x N per term, which is the knob that keeps
    retrieval latency flat as the corpus grows to 100 TB. Changes
    scores only by the pruned terms' (near-zero) contributions, and
    changes ``n_terms`` accordingly.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_df_ratio is not None and not 0.0 < max_df_ratio <= 1.0:
        raise ValueError("max_df_ratio must be in (0, 1]")
    postings, dfreq = _impact_postings(docs, text_col, id_col, k1, b)
    qterms = _query_terms(queries, query_id, query_col, dfreq, max_df_ratio)
    return _retrieve(postings, qterms, id_col, query_id, k)


# ---------------------------------------------------------------------------
# Persistable index
# ---------------------------------------------------------------------------

N_BUCKETS_DEFAULT = 64
_BM25_INDEX_VERSION = 3  # v3: postings carry raw tf/dl for compaction


def build_bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Materializable impact index: returns
    ``(postings, dfreq, stats)`` with postings =
    ``(bucket, term, doc id (original name), impact, tf, dl)``, dfreq =
    ``(term, df, n_docs)``, and stats a ONE-ROW ``(n_docs, avgdl)``
    relation (the corpus-global quantities every stored impact bakes
    in — persisted so :func:`append_to_bm25_index` can score delta
    segments against the same reference frame). The raw ``tf``/``dl``
    ride along (two ints per posting) so
    :func:`compact_bm25_index` can re-derive every corpus stat and
    re-bake every impact from the postings ALONE — compaction I/O
    scales with the index, never the corpus text (the Lucene
    segment-merge economics).
    ``bucket = pmod(xxhash64(term), n_buckets)`` is the partition key
    :func:`save_bm25_index` writes under."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    postings, dfreq = _impact_postings(docs, text_col, id_col, k1, b)
    out = postings.select(
        F.pmod(F.xxhash64("_tok"), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col("_tok").alias("term"),
        F.col("_d").alias(id_col),
        F.col("_c").alias("impact"),
        F.col("_tf").cast("int").alias("tf"),
        F.col("_dl").cast("int").alias("dl"),
    )
    df_out = dfreq.select(
        F.col("_tok").alias("term"),
        F.col("_df").alias("df"),
        F.col("_N").alias("n_docs"),
    )
    stats = dfreq.select("_N", "_avgdl").limit(1).select(
        F.col("_N").alias("n_docs"), F.col("_avgdl").alias("avgdl")
    )
    return out, df_out, stats


def save_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> None:
    """Write the impact index under ``path``: ``postings/`` parquet
    PARTITIONED BY bucket (term-hash), ``dfreq/`` (vocab-sized, for
    max_df_ratio pruning at retrieval and for scoring delta segments),
    and a one-row ``meta/`` json (version, n_buckets, k1, b, id_col,
    and the frozen corpus stats n_docs/avgdl) that
    :func:`bm25_topk_indexed` validates at load — retrieval against an
    index built with different parameters must fail loudly, never
    prune the wrong partitions (same meta contract as the IVF index).
    Partitioning by the term hash is what makes the on-disk form an
    index rather than a dump: a retrieval touching t distinct terms
    reads <= min(t, n_buckets) partitions, so few-term lookups scan a
    sliver of the corpus regardless of its size. Size n_buckets so one
    bucket (~|postings|/n_buckets rows) is a few HDFS blocks at your
    scale.

    Growing corpora: :func:`append_to_bm25_index` adds a delta segment
    scored against the FROZEN stats recorded here (the Lucene segment
    model — per-segment reference frames, periodic compaction =
    rebuild). Impacts of existing postings never change on append; the
    documented staleness is that appended documents are scored as if
    the corpus still had the build-time N/avgdl/df."""
    from .tombstones import clear_tombstones, refresh_index_path

    postings, dfreq, stats = build_bm25_index(
        docs, text_col=text_col, id_col=id_col, k1=k1, b=b, n_buckets=n_buckets
    )
    # a rebuild must not inherit tombstones from a previous index at
    # the same path — the postings it masks no longer exist; same for
    # a crashed writer's stale lock marker
    from .txn import clear_commit_journal
    from .upsert import clear_writer_lock

    clear_tombstones(docs.sparkSession, path)
    clear_writer_lock(docs.sparkSession, path)
    clear_commit_journal(docs.sparkSession, path)
    # one file per (shuffle partition, bucket) would explode the file
    # count; cluster rows by bucket first so each bucket writes from
    # few tasks. repartition(bucket) hashes the low-cardinality bucket
    # key — adequate here because n_buckets >> shuffle parallelism is
    # the sizing rule anyway.
    postings.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")
    dfreq.write.mode("overwrite").parquet(f"{path}/dfreq")
    st = stats.collect()[0]
    docs.sparkSession.createDataFrame(
        [(
            _BM25_INDEX_VERSION, int(n_buckets), float(k1), float(b),
            id_col, int(st["n_docs"]), float(st["avgdl"]),
        )],
        "version int, n_buckets int, k1 double, b double, "
        "id_col string, n_docs bigint, avgdl double",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    refresh_index_path(docs.sparkSession, path)


def _read_bm25_meta(
    spark: SparkSession, index_path: str, min_version: int = 2
) -> dict:
    """``min_version=2`` (default) — read-only serving never touches
    the v3 tf/dl columns, so v2 indexes stay servable; append and
    compaction pass ``min_version=3`` (they need every segment to
    carry raw tf/dl, and appending tf/dl-less rows to a v3 directory
    would poison later compactions)."""
    from .txn import assert_no_pending_commit

    assert_no_pending_commit(spark, index_path)
    try:
        meta = spark.read.json(f"{index_path}/meta").collect()[0].asDict()
    except Exception as e:  # noqa: BLE001 — any unreadable meta is fatal
        raise ValueError(
            f"bm25 index at {index_path} has no readable meta/ "
            f"(pre-meta index layout?); rebuild with save_bm25_index: {e}"
        ) from e
    v = int(meta["version"])
    if v > _BM25_INDEX_VERSION or v < min_version:
        need = (
            f"versions {min_version}..{_BM25_INDEX_VERSION}"
            if min_version < _BM25_INDEX_VERSION
            else f"version {_BM25_INDEX_VERSION} (postings with raw "
            "tf/dl); rebuild with save_bm25_index"
        )
        raise ValueError(
            f"bm25 index at {index_path} has version {v}, "
            f"this operation reads {need}"
        )
    return meta


def delete_from_bm25_index(
    ids: DataFrame,
    index_path: str,
    id_col: str | None = None,
) -> None:
    """Tombstone a batch of document ids in a :func:`save_bm25_index`
    directory (see :mod:`.tombstones` for the Lucene delete model).

    The deleted documents vanish from :func:`bm25_topk_indexed`
    results immediately — including the rank slots they occupied, so
    survivors move UP, never a k-minus-deleted truncation. Stored
    impacts are untouched: surviving documents keep the scores the
    index's frozen reference frame (N, avgdl, df) gave them, exactly
    as appended documents do. The drift this leaves relative to a
    rebuild over the filtered corpus is removed by the next
    :func:`compact_bm25_index`, which applies tombstones physically
    and re-bakes every stat from the surviving postings — bit-identical
    to that rebuild.

    ``ids`` carries the document ids in ``id_col`` (defaults to the
    id column recorded in the index meta). Tombstoning an id that was
    never indexed is harmless; re-appending a tombstoned id stays
    masked until a compaction clears the tombstone set."""
    from .tombstones import refresh_index_path, write_tombstones

    meta = _read_bm25_meta(ids.sparkSession, index_path)
    stored = str(meta["id_col"])
    write_tombstones(ids, index_path, id_col or stored, stored,
                     stored_rel="postings")
    refresh_index_path(ids.sparkSession, index_path)


def bm25_topk_indexed(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    query_id: str = "q_id",
    query_col: str = "q_text",
    k: int = 10,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-``k`` retrieval against a :func:`save_bm25_index` directory.

    ``n_buckets`` and the document id column come from the index's
    ``meta/`` — NEVER from the caller: a mismatched bucket count would
    silently prune the wrong partitions and return incomplete results,
    so the build-time parameters are the only source of truth.

    The scoring work left at query time is only the posting join, the
    order-pinned fold, and the rank window — IDF, doc length, and the
    tf saturation are baked into the stored ``impact``. The query
    batch's distinct term buckets are collected (bounded: <= number of
    distinct query terms, itself <= the query batch size — the same
    bounded-collect contract as the broadcast-kNN right side) and
    pushed as a partition filter, so the scan reads only the buckets
    the batch actually touches."""
    if k < 1:
        raise ValueError("k must be >= 1")
    meta = _read_bm25_meta(spark, index_path)
    id_col = str(meta["id_col"])
    n_buckets = int(meta["n_buckets"])
    postings = spark.read.parquet(f"{index_path}/postings")
    dfreq = (
        spark.read.parquet(f"{index_path}/dfreq")
        .select(
            F.col("term").alias("_tok"),
            F.col("df").alias("_df"),
            F.col("n_docs").alias("_N"),
        )
        if max_df_ratio is not None
        else None
    )
    qterms = _query_terms(queries, query_id, query_col, dfreq, max_df_ratio)
    buckets = [
        r["_b"]
        for r in qterms.select(
            F.pmod(F.xxhash64("_tok"), F.lit(n_buckets)).cast("int").alias("_b")
        )
        .distinct()
        .collect()
    ]
    pruned = postings.filter(F.col("bucket").isin(buckets)).select(
        F.col("term").alias("_tok"),
        F.col(id_col).alias("_d"),
        F.col("impact").alias("_c"),
    )
    # tombstoned docs drop out BEFORE ranking, so survivors take the
    # freed rank slots (never a truncated top-k); no-op when the index
    # has no deletes/ relation
    from .tombstones import anti_tombstones

    pruned = anti_tombstones(pruned, spark, index_path, "_d", id_col)
    return _retrieve(pruned, F.broadcast(qterms), id_col, query_id, k)


def bm25_delta_postings(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Impact postings for a delta batch, scored against the FROZEN
    stats of the index at ``index_path`` (n_docs, avgdl from ``meta/``,
    per-term df from the stored ``dfreq/``; terms the base corpus
    never saw keep df=0). Returns the same (bucket, term, id, impact)
    shape :func:`save_bm25_index` writes — the compute half of
    :func:`append_to_bm25_index`, exposed separately so the append
    cost is benchmarkable without the parquet write."""
    meta = _read_bm25_meta(spark, index_path, min_version=3)
    id_col = str(meta["id_col"])
    frozen_dfreq = spark.read.parquet(f"{index_path}/dfreq").select(
        F.col("term").alias("_tok"), F.col("df").alias("_df")
    )
    postings, _ = _impact_postings(
        new_docs, text_col, id_col, float(meta["k1"]), float(meta["b"]),
        frozen_stats=(int(meta["n_docs"]), float(meta["avgdl"])),
        frozen_dfreq=frozen_dfreq,
    )
    return postings.select(
        F.pmod(F.xxhash64("_tok"), F.lit(int(meta["n_buckets"])))
        .cast("int").alias("bucket"),
        F.col("_tok").alias("term"),
        F.col("_d").alias(id_col),
        F.col("_c").alias("impact"),
        F.col("_tf").cast("int").alias("tf"),
        F.col("_dl").cast("int").alias("dl"),
    )


def append_to_bm25_index(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
) -> None:
    """Append a document batch to a :func:`save_bm25_index` directory —
    the Lucene segment model adapted to the impact layout.

    Impacts depend on corpus-global stats (idf needs df and N, length
    normalization needs avgdl), so a naive recompute would change the
    correct score of EVERY existing posting. Instead the delta batch is
    scored against the index's FROZEN reference frame: the build-time
    ``n_docs``/``avgdl`` from ``meta/`` and the stored per-term df —
    existing postings stay untouched (previously-correct retrievals
    stay correct), and the new documents merge into the same
    bucket-partitioned relation, immediately retrievable by
    :func:`bm25_topk_indexed` with scores exactly comparable to the
    base segment's (same reference frame on both sides).

    DOCUMENTED STALENESS: relative to a full rebuild, every impact
    (old and new) differs by the drift the appended batch causes in
    N, avgdl, and df — proportional to the append fraction. The
    production contract is periodic compaction (rebuild) once the
    appended tail is a material fraction of the corpus; ``dfreq/`` and
    ``meta/`` deliberately stay frozen between compactions so that ALL
    segments share one reference frame.

    Takes the :func:`~.upsert.index_write_lock` (reentrant under an
    upsert): delta files landing in a bucket partition while a
    concurrent upsert swaps that directory would silently vanish.
    """
    from .tombstones import refresh_index_path
    from .upsert import index_write_lock

    spark = new_docs.sparkSession
    with index_write_lock(spark, index_path):
        delta = bm25_delta_postings(spark, index_path, new_docs,
                                    text_col=text_col)
        delta.repartition("bucket").write.mode("append").partitionBy(
            "bucket"
        ).parquet(f"{index_path}/postings")
    refresh_index_path(spark, index_path)


def compact_bm25_index(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    n_buckets: int | None = None,
) -> None:
    """Compact a base+delta index into a fresh index at ``out_path``
    whose postings are BIT-IDENTICAL to a full
    :func:`save_bm25_index` rebuild over the union corpus — without
    touching the corpus text.

    This is what closes the append path's documented staleness loop:
    every stored posting carries its raw ``tf``/``dl`` (two ints), so
    N (distinct doc count), avgdl (exact-integer token total / N), and
    per-term df are all re-derivable from the postings relation alone,
    and every impact re-bakes through the same ``_idf_expr`` /
    ``_impact_expr`` shapes the build path uses — identical doubles,
    not approximately-equal ones (pinned in
    tests/test_search.py::test_bm25_compaction_equals_rebuild).
    Compaction I/O therefore scales with the INDEX (postings rows),
    never the corpus text volume — the Lucene segment-merge economics,
    and at 100 TB the difference between an overnight re-tokenize of
    the corpus and a bucket-local shuffle of the index.

    Writes a complete fresh index (postings/, dfreq/, meta/) at
    ``out_path``; swapping it over the old directory is the caller's
    (atomic, filesystem-level) rename — the same commit-point
    discipline Lucene uses, and why this function does not overwrite
    ``index_path`` in place while reading from it. ``n_buckets``
    defaults to the source index's; pass a larger value to re-bucket a
    grown index in the same pass. Contract (same as append): document
    ids must be unique across all segments — a doc ingested twice
    double-counts df exactly as it would in a rebuild of the
    duplicated corpus.

    Tombstones (:func:`delete_from_bm25_index`) are applied PHYSICALLY
    here: deleted documents drop out of the postings before the stats
    re-derive, so the compacted index equals a rebuild over the corpus
    minus the deletions, and the fresh index at ``out_path`` starts
    with an empty tombstone set (deleted ids become re-ingestable).
    """
    from .tombstones import (
        clear_tombstones, refresh_index_path, require_distinct_out,
    )

    require_distinct_out(index_path, out_path, "compact_bm25_index")
    meta = _read_bm25_meta(spark, index_path, min_version=3)
    nb = int(n_buckets if n_buckets is not None else meta["n_buckets"])
    id_col = str(meta["id_col"])
    out, dfreq, stats = _compacted_parts(spark, index_path, meta, nb)
    # the compacted output has no masked rows, so it carries no
    # tombstones — and must not inherit any from a previous index at
    # out_path
    clear_tombstones(spark, out_path)
    out.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{out_path}/postings")
    dfreq.select(
        F.col("_tok").alias("term"),
        F.col("_df").alias("df"),
        F.col("_N").alias("n_docs"),
    ).write.mode("overwrite").parquet(f"{out_path}/dfreq")
    st = stats.collect()[0]
    spark.createDataFrame(
        [(
            _BM25_INDEX_VERSION, nb, float(meta["k1"]), float(meta["b"]),
            id_col, int(st["_N"]), float(st["_avgdl"]),
        )],
        "version int, n_buckets int, k1 double, b double, "
        "id_col string, n_docs bigint, avgdl double",
    ).coalesce(1).write.mode("overwrite").json(f"{out_path}/meta")
    refresh_index_path(spark, out_path)


def _compacted_parts(
    spark: SparkSession, index_path: str, meta: dict, nb: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The compute half of :func:`compact_bm25_index`: re-derive
    (N, avgdl, df) from the stored postings and re-bake every impact —
    returns ``(postings, dfreq, stats)`` in the stored column shapes.
    Exposed via :func:`bm25_compacted_postings` so the compaction cost
    is benchmarkable without the parquet write (same stance as
    :func:`bm25_delta_postings`)."""
    if nb < 1:
        raise ValueError("n_buckets must be >= 1")
    k1, b = float(meta["k1"]), float(meta["b"])
    id_col = str(meta["id_col"])
    p = spark.read.parquet(f"{index_path}/postings").select(
        F.col("term").alias("_tok"),
        F.col(id_col).alias("_d"),
        F.col("tf").alias("_tf"),
        F.col("dl").alias("_dl"),
    )
    # compaction applies tombstones PHYSICALLY: drop deleted docs
    # before re-deriving (N, avgdl, df), so the output is bit-identical
    # to a rebuild over the corpus minus the deleted documents
    from .tombstones import anti_tombstones

    p = anti_tombstones(p, spark, index_path, "_d", id_col)
    # stats re-derivation: postings are exactly the build path's
    # distinct (doc, term) relation, so the SAME aggregate expression
    # reproduces the SAME (N, avgdl) doubles a rebuild would compute
    stats = p.agg(
        F.countDistinct("_d").alias("_N"),
        (F.sum("_tf").cast("double") / F.countDistinct("_d")).alias("_avgdl"),
    )
    dfreq = (
        p.groupBy("_tok")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(stats))
    )
    idf = dfreq.select("_tok", _idf_expr().alias("_idf"), "_avgdl")
    out = p.join(idf, "_tok").select(
        F.pmod(F.xxhash64("_tok"), F.lit(nb)).cast("int").alias("bucket"),
        F.col("_tok").alias("term"),
        F.col("_d").alias(id_col),
        _impact_expr(k1, b).alias("impact"),
        F.col("_tf").cast("int").alias("tf"),
        F.col("_dl").cast("int").alias("dl"),
    )
    return out, dfreq, stats


def bm25_compacted_postings(
    spark: SparkSession, index_path: str, n_buckets: int | None = None
) -> DataFrame:
    """The re-baked posting relation :func:`compact_bm25_index` would
    write — the compaction compute without the I/O."""
    meta = _read_bm25_meta(spark, index_path, min_version=3)
    nb = int(n_buckets if n_buckets is not None else meta["n_buckets"])
    return _compacted_parts(spark, index_path, meta, nb)[0]


def rrf_fuse(
    rankings: list[DataFrame],
    query_id: str = "q_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) —
    the standard hybrid-search combiner: given N ranked lists per
    query (lexical BM25, semantic ANN, ...), score each document
    ``sum over lists containing it of 1 / (k_rrf + rank)`` and re-rank.
    Rank-based fusion needs no score calibration between arms, which
    is why it is the default in every hybrid retrieval stack.

    Each input carries (``query_id``, ``id_col``, ``rank_col``).
    Returns (``query_id``, ``id_col``, ``rank``, ``rrf_score``,
    ``n_lists``) — top-``k`` per query by (score DESC, id ASC);
    ``n_lists`` counts the arms that retrieved the document.

    Plan: union the arms (each tagged with its list index), ONE hash
    aggregate on (query, doc) whose float sum folds contributions in
    arm order (order-pinned — arms containing the same doc contribute
    in a fixed sequence), and a top-k rank window (WindowGroupLimit).
    Fusion cost scales with the CANDIDATE lists, never the corpus.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1 or k_rrf < 1:
        raise ValueError("k and k_rrf must be >= 1")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(query_id).alias("_q"),
            F.col(id_col).alias("_d"),
            F.lit(i).alias("_arm"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    from ..functions.pinned import pinned_total, with_running_sum

    contrib = tagged.withColumn(
        "_rc", F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r").cast("double"))
    )
    scored = (
        with_running_sum(contrib, ["_q", "_d"], "_arm", "_rc")
        .groupBy("_q", "_d")
        .agg(
            F.count(F.lit(1)).alias("_nl"),
            pinned_total("_arm").alias("_s"),
        )
    )
    w = Window.partitionBy("_q").orderBy(F.col("_s").desc(), F.col("_d").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            F.col("_q").alias(query_id),
            F.col("_d").alias(id_col),
            F.col("_rk").cast("int").alias("rank"),
            F.col("_s").alias("rrf_score"),
            F.col("_nl").cast("long").alias("n_lists"),
        )
    )
