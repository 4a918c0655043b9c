"""One-call upsert for the four persistable indexes — delete the
batch's ids, append the batch's rows, one refresh.

The tombstone model (:mod:`.tombstones`) deliberately makes plain
delete-then-append WRONG for an upsert: re-appending a tombstoned id
stays masked until a purge, so the "new version" would be invisible.
The documented recipe was purge-then-append — a full index rewrite per
upsert batch. These operators do better by exploiting each index's
physical layout:

- **IVF / PQ / BM25** (partition-keyed relations): the batch's old
  rows live in a bounded set of partitions (the cells holding its
  vectors; the term buckets holding its postings). The upsert rewrites
  ONLY those partitions minus the batch's ids — work scales with the
  affected partitions, never the index — then removes the ids from the
  tombstone set (so the new version serves) and appends the new rows
  through the family's frozen-model append path.
- **MinHash** (unpartitioned band/shingle relations): the rewrite is
  relation-wide — same I/O class as a purge, documented below.

Scoring semantics after an upsert are exactly the family's
delete+append semantics: per-row-state indexes (IVF, PQ, MinHash) have
no staleness at all — the upserted serve equals a one-shot build over
the modified corpus with the same frozen model; BM25 keeps the frozen
(N, avgdl, df) reference frame, with the usual drift-until-compaction
contract (old versions' contribution to the frozen stats lingers until
:func:`~.search.compact_bm25_index`).

Durability stance: upsert MUTATES the index in place (that is its
point — one call, no directory swap). Every rewrite stages the
surviving rows to a sibling temp directory FIRST and only then swaps
it over the old one, so a reader never races a half-written relation
and the source is never read lazily while being overwritten (the
failure the purge paths' ``require_distinct_out`` guard exists for).
Each multi-directory swap runs under a COMMIT JOURNAL
(:mod:`.txn`): the full swap plan lands in ``._lt_commit`` atomically
before any live directory is touched, so a crash at any point either
serves exactly the old state (journal never written) or is rolled
FORWARD to exactly the new one by
:func:`~linktransformer_spark.recover_index`; readers detect a
pending journal at index open and raise instead of serving a torn
mix. A crash BETWEEN an upsert's steps (rows removed, append not yet
run) still reads as a committed delete — re-run the upsert to
complete it (idempotent).

Index mutation is SINGLE-WRITER: every upsert, rebalance, append and
tombstone write takes :func:`index_write_lock` — a
create-fails-if-exists marker under the index path (holder-stamped,
reentrant within one driver THREAD) — so a second concurrent writer raises instead of
silently interleaving staged swaps (or losing an append's files / a
delete's tombstone batch under a concurrent swap). Readers are
unaffected (they never look at the marker); ``save_*`` full rebuilds
clear a crashed writer's stale marker like they clear tombstones.
"""
from __future__ import annotations

import contextlib
import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tombstones import (
    clear_tombstones, read_tombstones, refresh_index_path,
    tombstones_exist,
)

_TMP_SUFFIX = "._lt_upsert_tmp"
_LOCK_NAME = "._lt_writer_lock"

# Lease parameters (module-level so tests and operators can tune them;
# see index_write_lock's docstring for the protocol):
# - the holder refreshes the marker's mtime every LOCK_HEARTBEAT_SEC;
# - a marker older than LOCK_HEARTBEAT_SEC * LOCK_STALE_FACTOR is a
#   stale lease (the holder crashed or hung) and may be taken over;
# - a takeover re-reads the marker after LOCK_TAKEOVER_SETTLE_SEC to
#   confirm the holder really stopped refreshing;
# - every successful create waits LOCK_ACQUIRE_VERIFY_SEC and re-reads
#   its own token, closing the local-FS check-then-act create window
#   (two near-simultaneous creators both "succeed"; exactly one token
#   survives in the marker, so exactly one acquirer proceeds).
LOCK_HEARTBEAT_SEC = 15.0
LOCK_STALE_FACTOR = 4.0
LOCK_ACQUIRE_VERIFY_SEC = 0.05
LOCK_TAKEOVER_SETTLE_SEC = 1.0


def _lock_stale_sec() -> float:
    return LOCK_HEARTBEAT_SEC * LOCK_STALE_FACTOR


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p


# (thread ident, path) pairs whose lock THIS thread currently holds —
# makes the lock reentrant within one driver THREAD, so upsert_*
# (which holds it) can call the also-locked append_to_* /
# write_tombstones without deadlocking. Thread-affine on purpose: a
# second writer on ANOTHER thread of the same driver (two
# run_upsert_stream queries, a notebook thread pool) must hit the
# marker check and raise, not silently ride the reentrant fast path.
_HELD_MU = threading.Lock()
_HELD: set = set()


def _stamp_token(out, token: str) -> None:
    """Write the holder token into a just-created lock marker —
    module-level so the stamp-failure cleanup path is testable (the
    failure itself is a filesystem I/O error, unreachable otherwise)."""
    out.write(bytearray(token.encode("ascii")))


def _marker_mtime(fs, lock) -> float | None:
    """Marker mtime in epoch seconds; None when absent/unreadable."""
    try:
        return fs.getFileStatus(lock).getModificationTime() / 1000.0
    except Exception:
        return None


def _try_create_verified(fs, lock, token: str, path: str) -> bool:
    """One create-and-claim attempt: create(overwrite=False), stamp
    the holder token, then after a short settle RE-READ the marker and
    claim the lock only if OUR token survived. The verify read closes
    the local-FS check-then-act window (Hadoop's local create shim is
    not atomic): two near-simultaneous creators can both "succeed" and
    both stamp, but the marker holds exactly one final token, so
    exactly one acquirer verifies true — the loser backs off WITHOUT
    deleting (the marker is the winner's)."""
    import time

    try:
        out = fs.create(lock, False)
    except Exception:  # create-time FileAlreadyExistsException et al.
        return False
    try:
        try:
            _stamp_token(out, token)
        finally:
            out.close()
    except Exception as exc:
        # we WON the create but failed to stamp our token: the
        # orphaned empty/partial marker is OUR OWN file — without
        # this cleanup the index stays locked (and the token-
        # checked release path refuses to delete a marker whose
        # holder != our token). Distinct from "locked by another
        # writer": this is an I/O failure, not contention.
        with contextlib.suppress(Exception):
            fs.delete(lock, False)
        raise RuntimeError(
            f"could not stamp the writer-lock marker at "
            f"{path}/{_LOCK_NAME} (created, then the token write "
            f"failed: {exc}); the just-created marker was removed "
            "— the index is NOT left locked. Retry the operation."
        ) from exc
    time.sleep(LOCK_ACQUIRE_VERIFY_SEC)
    return _read_lock_token(fs, lock) == token


def _acquire_marker(fs, lock, token: str, path: str) -> bool:
    """Full acquire protocol: plain create first; on contention, take
    over ONLY a stale lease — marker older than the stale threshold
    whose (holder, mtime) is STILL unchanged after a settle delay (a
    live holder's heartbeat would have refreshed the mtime)."""
    import time
    import warnings

    if _try_create_verified(fs, lock, token, path):
        return True
    mt1 = _marker_mtime(fs, lock)
    if mt1 is None:
        # the holder released between our create failure and the stat
        return _try_create_verified(fs, lock, token, path)
    h1 = _read_lock_token(fs, lock)
    if time.time() - mt1 <= _lock_stale_sec():
        return False  # live (or recent) holder
    # stale lease: confirm the holder is really gone, then take over
    time.sleep(LOCK_TAKEOVER_SETTLE_SEC)
    mt2 = _marker_mtime(fs, lock)
    if mt2 is None:
        return _try_create_verified(fs, lock, token, path)
    h2 = _read_lock_token(fs, lock)
    if (mt2, h2) != (mt1, h1):
        return False  # refreshed or replaced during the settle — live
    warnings.warn(
        f"index_write_lock: taking over a STALE writer lease at "
        f"{path}/{_LOCK_NAME} (holder {h1!r}, marker age "
        f"{time.time() - mt1:.0f}s > stale threshold "
        f"{_lock_stale_sec():.0f}s and not refreshed during the "
        f"{LOCK_TAKEOVER_SETTLE_SEC:.1f}s settle) — the previous "
        "writer crashed or hung without releasing.",
        RuntimeWarning,
        stacklevel=3,
    )
    fs.delete(lock, False)
    return _try_create_verified(fs, lock, token, path)


def _heartbeat(fs, lock, token: str, stop: threading.Event) -> None:
    """Holder-side lease refresh: touch the marker's mtime every
    LOCK_HEARTBEAT_SEC while the lock is held. Stops silently when the
    marker no longer carries our token (a save_* rebuild cleared it,
    or a takeover replaced it) — refreshing someone else's marker
    would extend THEIR lease."""
    import time

    while not stop.wait(LOCK_HEARTBEAT_SEC):
        try:
            if _read_lock_token(fs, lock) != token:
                return
            fs.setTimes(lock, int(time.time() * 1000), -1)
        except Exception:
            return


def _read_lock_token(fs, lock) -> str | None:
    """Best-effort read of the marker's holder token (pid:uuid). None
    when unreadable/absent; '' for an empty (legacy/foreign) marker."""
    try:
        if not fs.exists(lock):
            return None
        stream = fs.open(lock)
        try:
            chars = []
            for _ in range(128):
                b = stream.read()
                if b < 0:
                    break
                chars.append(chr(b))
            return "".join(chars)
        finally:
            stream.close()
    except Exception:
        return None


@contextlib.contextmanager
def index_write_lock(spark: SparkSession, path: str):
    """SINGLE-WRITER guard for index mutation: every ``upsert_*`` and
    ``rebalance_*`` (staged partition swaps), every ``append_to_*``
    (new files into partition dirs a concurrent swap would delete),
    and every tombstone write (a delete landing between an upsert's
    ``deletes/`` stage and swap would silently vanish — a lost
    compliance delete). Two concurrent writers on one index path would
    otherwise interleave and corrupt it silently, so the second writer
    fails loudly instead. Reentrant within one driver THREAD (an
    upsert's internal append re-enters without re-acquiring); readers
    never look at the marker.

    Mechanism — a LEASE, not a bare marker: a create-fails-if-exists
    marker file ``{path}/._lt_writer_lock`` stamped with the holder's
    identity (``pid:uuid``), whose mtime the holder REFRESHES every
    ``LOCK_HEARTBEAT_SEC`` from a daemon thread while the lock is
    held. Acquire handles the three filesystem realities:

    - ``create(overwrite=False)`` is atomic on HDFS; on the local
      filesystem Hadoop's shim is check-then-act, so EVERY successful
      create re-reads the marker after ``LOCK_ACQUIRE_VERIFY_SEC`` and
      claims the lock only if its own token survived — two
      near-simultaneous creators converge to exactly one winner (the
      marker holds one final token) and the loser raises without
      touching the winner's marker.
    - A marker older than ``LOCK_HEARTBEAT_SEC * LOCK_STALE_FACTOR``
      is a STALE LEASE (the holder crashed or hung — a live holder's
      heartbeat would have refreshed it). Acquire takes it over, but
      only after re-reading (holder, mtime) following a
      ``LOCK_TAKEOVER_SETTLE_SEC`` settle to confirm the holder really
      stopped refreshing; the takeover emits a RuntimeWarning. A
      crashed writer therefore blocks successors for at most one stale
      threshold (~1 min at defaults) instead of forever.
    - Object stores without atomic create: the create/verify pair is
      best-effort (same caveat as the rename-based swaps); stores with
      conditional puts (S3 If-None-Match, GCS x-goog-if-generation-
      match: 0) should implement the create through that primitive for
      a hard guarantee.

    The marker is removed on exit, including on operator failure, and
    a full ``save_*`` rebuild clears a stale one
    (:func:`clear_writer_lock`, the ``clear_tombstones`` analogue).

    Release deletes the marker only when it still carries OUR token.
    Without that check, a ``save_*`` rebuild clearing a LIVE writer's
    marker would let that writer's exit delete a NEWER writer's
    marker, cascading lock loss across three writers; the heartbeat
    likewise stops refreshing the moment the marker's token is not
    ours. Reentrancy is THREAD-affine (``threading.get_ident()``), so
    a concurrent writer on another thread of the same driver raises
    like any foreign writer instead of silently entering."""
    norm = path.rstrip("/")
    key = (threading.get_ident(), norm)
    with _HELD_MU:
        if key in _HELD:
            reentrant = True
        else:
            reentrant = False
    if reentrant:
        yield
        return
    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    lock = jvm.org.apache.hadoop.fs.Path(f"{path}/{_LOCK_NAME}")
    token = f"{os.getpid()}:{uuid.uuid4().hex}"
    if not _acquire_marker(fs, lock, token, path):
        age = ""
        try:
            import time

            mtime = _marker_mtime(fs, lock)
            holder = _read_lock_token(fs, lock) or "unknown"
            if mtime is not None:
                age = (
                    f" Holder {holder!r}, marker age "
                    f"{time.time() - mtime:.0f}s (lease refreshes "
                    f"every {LOCK_HEARTBEAT_SEC:.0f}s)."
                )
        except Exception:
            pass
        raise RuntimeError(
            f"index at {path} is locked by another in-place writer "
            f"({_LOCK_NAME} exists).{age} Index mutation is "
            "single-writer; wait for the other "
            "upsert/rebalance/append/delete to finish. If the holder "
            "CRASHED, its lease expires after "
            f"{_lock_stale_sec():.0f}s and the next writer takes over "
            "automatically; to repair immediately, verify nothing is "
            "running and run recover_index(spark, path) (clears the "
            "stale marker and rolls forward any interrupted commit)."
        )
    stop_beat = threading.Event()
    beater = threading.Thread(
        target=_heartbeat, args=(fs, lock, token, stop_beat), daemon=True,
        name=f"lt-lock-heartbeat-{os.path.basename(norm)}",
    )
    beater.start()
    with _HELD_MU:
        _HELD.add(key)
    try:
        yield
    finally:
        with _HELD_MU:
            _HELD.discard(key)
        stop_beat.set()
        beater.join(5)
        # delete only OUR marker: if a save_* rebuild cleared it and a
        # newer writer has since created its own, deleting that one
        # would silently un-lock the newer writer
        holder = _read_lock_token(fs, lock)
        if holder is None or holder == token:
            fs.delete(lock, False)


def clear_writer_lock(spark: SparkSession, path: str) -> None:
    """Remove a (stale) writer-lock marker — called by every
    ``save_*`` full rebuild, exactly like ``clear_tombstones``: a
    rebuilt index must not inherit a crashed writer's lock."""
    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    fs.delete(
        jvm.org.apache.hadoop.fs.Path(f"{path}/{_LOCK_NAME}"), False
    )


def _distinct_ids(batch: DataFrame, id_col: str, dtype) -> DataFrame:
    """The batch's ids, cast to the index's stored id type, uniqueness
    enforced — an id appearing twice in one upsert batch has no
    defined winner, so fail loudly (same stance as require_integral_id).
    """
    ids = batch.select(
        F.col(id_col).alias("_lt_up_src"),
        F.col(id_col).cast(dtype).alias("_lt_up_id"),
    )
    n, nd, nbad, nnull = ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("_lt_up_id").alias("nd"),
        F.count(
            F.when(
                F.col("_lt_up_id").isNull()
                & F.col("_lt_up_src").isNotNull(),
                F.lit(1),
            )
        ).alias("nbad"),
        F.count(
            F.when(F.col("_lt_up_src").isNull(), F.lit(1))
        ).alias("nnull"),
    ).first()
    if nnull:
        raise ValueError(
            f"upsert batch has {nnull} NULL id(s) in {id_col!r} — a "
            "row without an id cannot replace anything; drop or fix "
            "those rows first"
        )
    if nbad:
        # the non-ANSI cast nulls unconvertible ids SILENTLY — without
        # this check the old version would survive and the new row
        # would append under a null id (and two such rows would trip
        # the duplicate error below with a misleading message)
        raise ValueError(
            f"upsert batch has {nbad} id(s) in {id_col!r} that do not "
            f"cast to the index's stored id type {dtype.simpleString()} "
            "— fix the batch's id column before upserting"
        )
    if n != nd:
        raise ValueError(
            f"upsert batch carries duplicate ids in {id_col!r} "
            f"({n} rows, {nd} distinct) — an in-batch duplicate has no "
            "defined winner; dedupe the batch first"
        )
    return ids.select("_lt_up_id").distinct()


def _rewrite_partitions_minus_ids(
    spark: SparkSession,
    index_root: str,
    rel: str,
    part_col: str,
    ids: DataFrame,
    stored_col: str,
) -> int:
    """Physically drop ``ids`` from ``{index_root}/{rel}`` (a
    ``part_col``-partitioned parquet relation) by rewriting ONLY the
    partitions that contain them. Returns the number of rows removed.

    The affected-partition list is a bounded collect (<= the
    partition count); surviving rows of those partitions stage to a
    sibling tmp dir, then every affected partition directory swaps
    under ONE commit journal (:func:`~.txn.commit_swaps`) — a crash at
    any point serves exactly the old state (journal never written) or
    rolls forward to exactly the new one. A fully-emptied partition
    has no staged counterpart and journals as a delete. Untouched
    partitions never read, never write."""
    from .txn import commit_swaps

    rel_path = f"{index_root}/{rel}"
    reldf = spark.read.parquet(rel_path)
    idsb = F.broadcast(ids)
    affected = [
        r[0]
        for r in reldf.join(
            idsb, reldf[stored_col] == F.col("_lt_up_id"), "left_semi"
        ).select(part_col).distinct().collect()
    ]
    if not affected:
        return 0
    hit = reldf.filter(F.col(part_col).isin(affected))
    n_removed = hit.join(
        idsb, hit[stored_col] == F.col("_lt_up_id"), "left_semi"
    ).count()
    kept = hit.join(
        idsb, hit[stored_col] == F.col("_lt_up_id"), "left_anti"
    )
    tmp_rel = rel.rstrip("/") + _TMP_SUFFIX
    tmp = f"{index_root}/{tmp_rel}"
    kept.repartition(part_col).write.mode("overwrite").partitionBy(
        part_col
    ).parquet(tmp)
    fs, _ = _fs(spark, rel_path)
    jvm = spark.sparkContext._jvm
    entries = []
    for v in affected:
        src_rel = f"{tmp_rel}/{part_col}={v}"
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{index_root}/{src_rel}")):
            entries.append(("swap", src_rel, f"{rel}/{part_col}={v}"))
        else:
            entries.append(("delete", f"{rel}/{part_col}={v}"))
    commit_swaps(spark, index_root, entries, cleanup=(tmp_rel,))
    refresh_index_path(spark, rel_path)
    return int(n_removed)


def _rewrite_relation_minus_ids(
    spark: SparkSession, index_root: str, rel: str, ids: DataFrame,
    stored_col: str,
) -> None:
    """Unpartitioned variant: stage the whole surviving relation, then
    one journaled swap (a bare delete+rename would leave the relation
    MISSING on a crash in between). I/O scales with the relation — the
    MinHash trade."""
    from .txn import commit_swaps

    rel_path = f"{index_root}/{rel}"
    reldf = spark.read.parquet(rel_path)
    kept = reldf.join(
        F.broadcast(ids), reldf[stored_col] == F.col("_lt_up_id"),
        "left_anti",
    )
    tmp_rel = rel.rstrip("/") + _TMP_SUFFIX
    kept.write.mode("overwrite").parquet(f"{index_root}/{tmp_rel}")
    commit_swaps(spark, index_root, [("swap", tmp_rel, rel)],
                 cleanup=(tmp_rel,))
    refresh_index_path(spark, rel_path)


def _untombstone(
    spark: SparkSession, path: str, ids: DataFrame, stored_col: str
) -> None:
    """Drop the batch's ids from the tombstone set so the re-ingested
    versions serve (plain append would stay masked). Runs AFTER the
    physical removal of the old rows — a crash in between leaves the
    ids deleted (consistent), never resurrected."""
    from .txn import commit_swaps

    if not tombstones_exist(spark, path):
        return
    dels = read_tombstones(spark, path, stored_col)
    if dels is None:
        return
    kept = dels.join(
        F.broadcast(ids), dels[stored_col] == F.col("_lt_up_id"),
        "left_anti",
    )
    if kept.isEmpty():
        clear_tombstones(spark, path)
    else:
        tmp_rel = f"deletes{_TMP_SUFFIX}"
        kept.write.mode("overwrite").parquet(f"{path}/{tmp_rel}")
        commit_swaps(spark, path, [("swap", tmp_rel, "deletes")],
                     cleanup=(tmp_rel,))
    refresh_index_path(spark, path)


def upsert_ivf_index(
    batch: DataFrame,
    path: str,
    vector_col: str | None = None,
    corpus_id: str | None = None,
) -> None:
    """Upsert a vector batch into a :func:`~.ann.save_ivf_index`
    directory: old rows with the batch's ids vanish (only their cells
    rewrite), tombstones on those ids clear, and the new vectors
    append against the frozen centroids. Serving afterwards equals a
    one-shot build over the modified corpus with the same centroids —
    per-row scoring state, no staleness (the IVF delete contract)."""
    from .ann import _read_ivf_meta, append_to_ivf_index

    spark = batch.sparkSession
    # every read happens INSIDE the lock: a writer serialized behind a
    # concurrent rebalance must see the post-rebalance meta/schema,
    # not stale pre-lock values
    with index_write_lock(spark, path):
        meta = _read_ivf_meta(spark, path)
        stored = str(meta["id_col"])
        dtype = spark.read.parquet(f"{path}/cells").schema[stored].dataType
        ids = _distinct_ids(batch, corpus_id or stored, dtype)
        _rewrite_partitions_minus_ids(spark, path, "cells", "cell",
                                      ids, stored)
        _untombstone(spark, path, ids, stored)
        append_to_ivf_index(batch, path, vector_col=vector_col,
                            corpus_id=corpus_id)
    refresh_index_path(spark, path)


def upsert_pq_index(
    batch: DataFrame,
    path: str,
    vector_col: str | None = None,
    corpus_id: str | None = None,
) -> None:
    """Upsert into a :func:`~.serving.save_pq_index` directory — same
    shape as :func:`upsert_ivf_index` (cell-targeted rewrite +
    untombstone + frozen-model append); ``meta.n_rows`` nets out the
    removed rows so the informational count stays the ingested-live
    total."""
    from .serving import _commit_pq_meta, _read_pq_meta, append_to_pq_index

    spark = batch.sparkSession
    # meta is read AND written back here, so it must be read inside
    # the lock: a stale pre-rebalance n_cells written back would hide
    # the rebalance's new cells from every subsequent serve
    with index_write_lock(spark, path):
        meta = _read_pq_meta(spark, path)
        stored = str(meta["id_col"])
        dtype = spark.read.parquet(f"{path}/cells").schema[stored].dataType
        ids = _distinct_ids(batch, corpus_id or stored, dtype)
        n_removed = _rewrite_partitions_minus_ids(
            spark, path, "cells", "cell", ids, stored
        )
        if n_removed:
            _commit_pq_meta(spark, path, meta,
                            max(0, int(meta["n_rows"]) - n_removed))
        _untombstone(spark, path, ids, stored)
        append_to_pq_index(batch, path, vector_col=vector_col,
                           corpus_id=corpus_id)
    refresh_index_path(spark, path)


def upsert_bm25_index(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str | None = None,
) -> None:
    """Upsert a document batch into a :func:`~.search.save_bm25_index`
    directory: the batch ids' old postings drop out of their term
    buckets (targeted partition rewrite), tombstones on those ids
    clear, and the new versions score against the index's FROZEN
    (N, avgdl, df) reference frame — the append contract. The usual
    BM25 staleness stance applies: the frozen stats still reflect the
    old versions until the next :func:`~.search.compact_bm25_index`."""
    from .search import _read_bm25_meta, append_to_bm25_index

    spark = batch.sparkSession
    with index_write_lock(spark, path):
        meta = _read_bm25_meta(spark, path)
        stored = str(meta["id_col"])
        dtype = spark.read.parquet(
            f"{path}/postings"
        ).schema[stored].dataType
        ids = _distinct_ids(batch, id_col or stored, dtype)
        _rewrite_partitions_minus_ids(
            spark, path, "postings", "bucket", ids, stored
        )
        _untombstone(spark, path, ids, stored)
        append_to_bm25_index(batch, path, text_col=text_col)
    refresh_index_path(spark, path)


def upsert_minhash_index(
    batch: DataFrame,
    path: str,
    on=None,
    id_col: str | None = None,
) -> None:
    """Upsert a document batch into a :func:`~.dedup.save_minhash_index`
    directory. The band/shingle relations are unpartitioned, so the
    old-version removal is a relation-wide rewrite — the one family
    where upsert I/O tracks the index (a purge's cost class), because
    a MinHash row's location carries no id locality. Family parameters
    (num_hashes, bands, shingle, word) come from the stored meta; the
    new signatures append under the identical family, so incremental
    dedup against the index sees exactly the modified corpus."""
    from .dedup import _load_index_meta, save_minhash_index

    spark = batch.sparkSession
    if id_col is None:
        raise ValueError("upsert_minhash_index requires id_col")
    if on is None:
        raise ValueError("upsert_minhash_index requires on")
    with index_write_lock(spark, path):
        meta = _load_index_meta(spark, path)
        dtype = spark.read.parquet(f"{path}/bands").schema["_id"].dataType
        ids = _distinct_ids(batch, id_col, dtype)
        for rel in ("bands", "shingles"):
            _rewrite_relation_minus_ids(spark, path, rel, ids, "_id")
        _untombstone(spark, path, ids, "_id")
        save_minhash_index(
            batch, path, on=on, id_col=id_col,
            num_hashes=int(meta["num_hashes"]), bands=int(meta["bands"]),
            shingle=int(meta["shingle"]), word=bool(meta["word"]),
            mode="append",
        )
    refresh_index_path(spark, path)


def index_health(spark: SparkSession, path: str) -> DataFrame:
    """One-row durability/maintenance observable for any stored index
    directory — the ops dashboard row the round-11/12 consistency work
    implies (the "no silent state" stance): is a commit journal
    pending (torn index — run
    :func:`~linktransformer_spark.recover_index`), is a writer lock
    held (and by whom, for how long), how many tombstones mask rows,
    and how many staging leftovers clutter the directory. Family-
    agnostic: reads only the durability artifacts, never the meta, so
    it also answers on an index whose readers currently REFUSE to open
    (that is its point). Metadata-only — a handful of filesystem
    calls, no Spark job over index data."""
    import time

    from .tombstones import DELETES_DIR, tombstones_exist
    from .txn import JOURNAL_NAME, pending_commit_exists

    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    P = jvm.org.apache.hadoop.fs.Path
    pending = pending_commit_exists(spark, path)
    lock = P(f"{path}/{_LOCK_NAME}")
    locked = bool(fs.exists(lock))
    holder, age = None, None
    if locked:
        holder = _read_lock_token(fs, lock) or None
        try:
            age = float(
                time.time()
                - fs.getFileStatus(lock).getModificationTime() / 1000.0
            )
        except Exception:
            age = None
    n_tomb = 0
    if tombstones_exist(spark, path):
        try:
            # family-agnostic: count distinct over whatever id column
            # the deletes relation stores (no meta read by design)
            dels = spark.read.parquet(f"{path}/{DELETES_DIR}")
            n_tomb = dels.select(dels.columns[0]).distinct().count()
        except Exception:
            n_tomb = 0
    leftovers = sorted(
        st.getPath().getName()
        for st in fs.listStatus(P(path))
        if st.getPath().getName().endswith(("._lt_upsert_tmp", "._lt_stage"))
        or st.getPath().getName() == f"{JOURNAL_NAME}.tmp"
    )
    return spark.createDataFrame(
        [(
            bool(pending), bool(locked), holder,
            None if age is None else round(age, 1),
            int(n_tomb), leftovers,
            bool(pending or locked or leftovers),
        )],
        "pending_commit boolean, locked boolean, lock_holder string, "
        "lock_age_sec double, n_tombstones bigint, "
        "staging_leftovers array<string>, needs_attention boolean",
    )
