"""Tombstone deletes for the persistable indexes — the Lucene delete
model adapted to parquet directories.

Every stored index this package writes (BM25 impact index, IVF cells,
PQ serving index, MinHash band index) is an append-friendly parquet
layout whose rows are immutable once written. Deleting a document from
such an index therefore follows the Lucene two-phase contract:

1. **Tombstone** (`delete_from_*_index`): the deleted ids append into a
   small ``deletes/`` relation under the index directory. Serving paths
   anti-join the stored rows against it, so deleted documents stop
   appearing in results IMMEDIATELY — no index rewrite, cost = one
   (usually broadcast) anti-join per query batch. Scores of surviving
   documents do NOT change (BM25 impacts keep the build-time reference
   frame; vector cells keep their frozen centroids) — the same
   documented staleness stance as the append paths.
2. **Purge** (`purge_*_index` / :func:`~.search.compact_bm25_index`):
   a physical rewrite drops the tombstoned rows and clears ``deletes/``.
   For BM25 the compaction re-derives every corpus stat from the
   surviving postings, so the purged index is BIT-identical to a full
   rebuild over the filtered corpus; for the vector indexes the
   centroids/codebook stay frozen (per-row state only), so a purged
   serve equals a tombstoned serve exactly.

Tombstones match on the USER id. Re-appending a tombstoned id does not
resurrect it — the anti-join still masks it — until a purge clears the
tombstone set. Upsert-by-id is therefore purge-then-append (or append
under a fresh id), never append alone; this is deliberate: a serve-time
"newest wins" rule would need a version column on every stored row and
a window over every probe, paying at query time for what the rewrite
pays once.

At 100 TB the economics are the point: deletes (compliance purges,
right-to-be-forgotten, bad-shard retractions) arrive continuously, and
rewriting a corpus-scale index per delete batch is not an option. The
tombstone set is ids-only (bytes per delete), the serve-time anti-join
is broadcast-sized until deletes are a material fraction of the corpus,
and the purge amortizes into the compaction the index needs anyway.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELETES_DIR = "deletes"


def _deletes_path(index_path: str) -> str:
    return f"{index_path}/{DELETES_DIR}"


def _norm_path(p: str) -> str:
    """A scheme-tolerant normal form for comparing two index paths
    (local compare only — no FS round-trip)."""
    import os

    q = p
    for pre in ("file://", "file:"):
        if q.startswith(pre):
            q = q[len(pre):]
            break
    return os.path.normpath(q)


def require_distinct_out(index_path: str, out_path: str, op: str) -> None:
    """Refuse an in-place purge/compaction: every purge writer starts
    with ``clear_tombstones(out_path)`` and then overwrites ``out_path``
    while the lazy anti-join is still READING ``index_path`` — with the
    two paths equal, the tombstone set is deleted before the anti-join
    that depends on it executes, and the overwrite races the read of
    the same files. On a compliance-delete path that can fail mid-write
    or silently resurrect tombstoned documents, so it is an error, not
    a footgun. Write to a sibling directory and atomically rename —
    the documented commit-point discipline."""
    if _norm_path(index_path) == _norm_path(out_path):
        raise ValueError(
            f"{op}: out_path must differ from index_path ({index_path!r})"
            " — an in-place rewrite would clear the tombstones before "
            "the anti-join reads them and overwrite files still being "
            "read; write to a sibling path and rename over the old "
            "directory afterwards"
        )


def refresh_index_path(spark: SparkSession, index_path: str) -> None:
    """Invalidate Spark's cached file listings under ``index_path``.

    Every index writer calls this after mutating the directory:
    without it, a session that already served from the index keeps the
    OLD parquet file listing in its FileStatusCache, and the next read
    after an overwrite/compact dies with FAILED_READ_FILE on the
    replaced files. Cheap (cache invalidation only), and a no-op for
    sessions that never touched the path. Also expires the in-process
    LSH table-width memo: its keys are plan identities, which an
    overwrite at the same path preserves — serving a width derived
    from the pre-mutation data would be silently stale."""
    spark.catalog.refreshByPath(index_path)
    from .knn_join import clear_auto_tables_memo, clear_spread_memo

    clear_auto_tables_memo()
    # same staleness contract for the spread-decision memo: an
    # overwrite at one plan identity may change the split count
    clear_spread_memo()


def clear_tombstones(spark: SparkSession, index_path: str) -> None:
    """Remove the ``deletes/`` relation under ``index_path`` (no-op if
    absent). Called by every ``save_*_index`` overwrite and by the
    purge writers: a rebuilt index must never inherit stale tombstones
    from a previous life of the same directory."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(_deletes_path(index_path))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(p, True)


def write_tombstones(ids: DataFrame, index_path: str, src_col: str,
                     stored_col: str,
                     stored_rel: str | None = None) -> None:
    """Append a delete batch: the distinct ``src_col`` values of
    ``ids`` land in ``{index_path}/deletes`` under the index's stored
    id column name. Idempotent per id at read time (readers dedupe);
    unknown ids are harmless (the anti-join simply matches nothing).

    When ``stored_rel`` names the relation the serve-time anti-join
    runs against (``"postings"``, ``"cells"``, ``"bands"``), the batch
    is CAST to that relation's stored id type before writing: without
    it, successive delete batches carrying different caller types
    (int vs long vs string) would accumulate mixed-schema parquet
    files under ``deletes/``, which the merged read can reject or
    mis-resolve later. One parquet-footer schema read, no data scan.

    An id the non-ANSI cast cannot convert (e.g. ``'abc'`` against a
    long-id index) raises instead of writing a silent null, and so
    does an id that is ALREADY null in the batch: a null tombstone
    never anti-join-matches anything, so the requested delete would
    silently not happen — unacceptable on a compliance-delete path
    (same stance as upsert's ``_distinct_ids``).

    Takes the :func:`~.upsert.index_write_lock` (reentrant): a delete
    batch appended between a concurrent upsert's ``deletes/`` staging
    and swap would silently vanish — a lost compliance delete."""
    from .upsert import index_write_lock

    with index_write_lock(ids.sparkSession, index_path):
        _write_tombstones_locked(ids, index_path, src_col, stored_col,
                                 stored_rel)


def _write_tombstones_locked(ids: DataFrame, index_path: str,
                             src_col: str, stored_col: str,
                             stored_rel: str | None = None) -> None:
    sel = F.col(src_col)
    if stored_rel is not None:
        rel_schema = ids.sparkSession.read.parquet(
            f"{index_path}/{stored_rel}"
        ).schema
        sel = sel.cast(rel_schema[stored_col].dataType)
    # one aggregation pass covers both failure classes: a source null
    # (a delete request without an id) and a cast-produced null (an id
    # the index's stored type cannot represent)
    nnull, nbad = ids.agg(
        F.count(F.when(F.col(src_col).isNull(), F.lit(1))).alias("nnull"),
        F.count(
            F.when(sel.isNull() & F.col(src_col).isNotNull(), F.lit(1))
        ).alias("nbad"),
    ).first()
    if nnull:
        raise ValueError(
            f"{nnull} delete id(s) in {src_col!r} are NULL — a null "
            "tombstone deletes nothing; drop or fix those rows first"
        )
    if nbad:
        raise ValueError(
            f"{nbad} delete id(s) in {src_col!r} do not cast to "
            f"the index's stored id type — a "
            "null tombstone deletes nothing; fix the id column"
        )
    (
        ids.select(sel.alias(stored_col))
        .distinct()
        .write.mode("append")
        .parquet(_deletes_path(index_path))
    )


def tombstones_exist(spark: SparkSession, index_path: str) -> bool:
    """One filesystem ``exists`` RPC for ``{index_path}/deletes`` —
    the cheap fast-path guard so indexes that never saw a delete keep
    their exact original serve plan without paying a full DataSource
    resolution + AnalysisException per query batch."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(_deletes_path(index_path))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_tombstones(
    spark: SparkSession, index_path: str, stored_col: str
) -> DataFrame | None:
    """The distinct tombstoned ids, or ``None`` when no delete batch
    has ever been written (the common case — serving must stay
    zero-cost then). The existence probe is a single FS RPC; the
    AnalysisException catch stays as the backstop for a concurrent
    ``clear_tombstones`` between the probe and the read."""
    from pyspark.errors import AnalysisException

    if not tombstones_exist(spark, index_path):
        return None
    try:
        d = spark.read.parquet(_deletes_path(index_path))
    except AnalysisException:
        return None
    return d.select(stored_col).distinct()


def tombstone_stats(
    spark: SparkSession, index_path: str, stored_col: str,
    stored_rel: str | None = None, rel_col: str | None = None,
) -> DataFrame:
    """One-row purge-cadence observable (the "no silent state" stance
    the skew-cap observables set): ``n_tombstones`` (distinct deleted
    ids) and, when ``stored_rel`` names a relation under the index
    (e.g. ``"postings"``, ``"cells"``, ``"bands"``), ``n_masked_rows``
    — the stored rows the serve-time anti-join is paying to skip — and
    ``masked_frac``. When masked_frac grows material (rule of thumb:
    >10-20%), schedule the purge/compaction; until then the measured
    serve overhead is ~zero (PLANS.md round 9)."""
    dels = read_tombstones(spark, index_path, stored_col)
    n_t = 0 if dels is None else dels.count()
    if stored_rel is None:
        return spark.createDataFrame(
            [(n_t,)], "n_tombstones bigint"
        )
    rel = spark.read.parquet(f"{index_path}/{stored_rel}")
    key = rel_col or stored_col
    total = rel.count()
    masked = 0
    if dels is not None and n_t:
        masked = rel.join(
            dels.select(F.col(stored_col).alias("_lt_del_id")),
            rel[key] == F.col("_lt_del_id"),
            "left_semi",
        ).count()
    return spark.createDataFrame(
        [(n_t, masked, total,
          float(masked) / total if total else 0.0)],
        "n_tombstones bigint, n_masked_rows bigint, n_stored_rows bigint, "
        "masked_frac double",
    )


def anti_tombstones(stored: DataFrame, spark: SparkSession,
                    index_path: str, key_col: str,
                    stored_col: str) -> DataFrame:
    """``stored`` minus the tombstoned ids (left-anti on ``key_col``).
    Returns ``stored`` unchanged when no tombstones exist, so indexes
    that never saw a delete keep their exact original plan. The
    tombstone side is ids-only and deduped; AQE broadcasts it while it
    is small, and the join stays a plain shuffled anti-join if a
    purge-overdue index accumulates a huge delete set."""
    dels = read_tombstones(spark, index_path, stored_col)
    if dels is None:
        return stored
    return stored.join(
        dels.select(F.col(stored_col).alias("_lt_del_id")),
        stored[key_col] == F.col("_lt_del_id"),
        "left_anti",
    )
