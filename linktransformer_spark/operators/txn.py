"""Crash-transactional multi-directory commits for the stored indexes.

The persistable indexes (IVF/PQ cells, BM25 postings, MinHash bands)
mutate in place through staged directory swaps: surviving rows stage to
a sibling tmp dir, then each affected directory swaps (delete old +
rename staged). A single rename is atomic on HDFS/local, but a mutation
that must change SEVERAL directories together — a rebalance rewrites
``cells/`` partitions, ``centroids/`` AND ``meta/``; an upsert rewrites
many cell partitions — used to run the swaps as a bare loop: a crash
mid-loop left some directories swapped and the staged rows of the rest
stranded in the tmp dir. On an index that is SILENT row loss, not an
error.

This module closes that window with a commit journal — the classic
write-ahead intent log, kept deliberately tiny (one JSON file per
commit, one level of indirection, no manifest read path):

1. Every changed directory is staged ASIDE first; nothing live is
   touched. A crash here loses nothing (stray tmp dirs only).
2. The full swap plan is written to ``{index}/._lt_commit`` — staged as
   ``._lt_commit.tmp`` and renamed into place, so the journal itself
   appears atomically. The journal's existence IS the commit point:
   from here the transaction is logically applied.
3. The swaps execute (per-directory delete + rename).
4. The journal is deleted; tmp roots are cleaned.

A crash BEFORE step 2 serves exactly the old state. A crash anywhere
after step 2 leaves the journal in place; readers detect it at index
open (:func:`assert_no_pending_commit` — called by every family's meta
reader) and raise loudly instead of serving a torn mix, and
:func:`recover_index` rolls the journal FORWARD to exactly the new
state. Roll-forward is idempotent and unambiguous because a rename is
atomic: a swap entry whose staged source is gone has already been
applied (the rename happened, so the destination is the new version);
one whose source still exists is re-applied from scratch.

Single-writer is assumed (the :func:`~.upsert.index_write_lock` marker
guards every mutation); recovery must only run when no writer is live —
it also clears the crashed writer's stale lock marker.

Entry forms (paths RELATIVE to the index root):
- ``["swap", src, dst]`` — ``dst`` becomes the staged ``src``;
- ``["delete", dst]`` — ``dst`` is removed in the new state (a fully
  emptied partition has no staged counterpart).
"""
from __future__ import annotations

import json

from pyspark.sql import SparkSession

JOURNAL_NAME = "._lt_commit"

# test-only crash injection: when set, the Nth filesystem mutation of
# the NEXT commit_swaps/apply raises InjectedCrash (0 = before the
# journal is even written). tests/test_crash_commit.py walks every N.
_FAIL_AFTER: int | None = None
_OPS = 0


class InjectedCrash(RuntimeError):
    """Raised by the test-only crash hook — never in production."""


def _maybe_fail() -> None:
    global _OPS
    if _FAIL_AFTER is not None:
        if _OPS >= _FAIL_AFTER:
            raise InjectedCrash(f"injected crash at fs-op {_OPS}")
        _OPS += 1


def _reset_fail(fail_after: int | None) -> None:
    """Test helper: arm (or disarm with None) the crash hook."""
    global _FAIL_AFTER, _OPS
    _FAIL_AFTER = fail_after
    _OPS = 0


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def _read_small_file(fs, jvm, p) -> str:
    """Read a small text file through the Hadoop FS API (journal and
    lock markers are at most a few KB)."""
    stream = fs.open(p)
    try:
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        except Exception:
            # commons-io missing/renamed: byte-at-a-time fallback
            chunks = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                chunks.append(chr(b))
            return "".join(chunks)
    finally:
        stream.close()


def _write_small_file(fs, jvm, p, text: str) -> None:
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def pending_commit_exists(spark: SparkSession, index_path: str) -> bool:
    fs, jvm = _fs(spark, index_path)
    return bool(
        fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{index_path}/{JOURNAL_NAME}")
        )
    )


def assert_no_pending_commit(spark: SparkSession, index_path: str) -> None:
    """Called by every index meta reader: a pending journal means a
    writer crashed mid-commit — some directories hold the new version
    and the rest the old, so serving would mix states (or miss moved
    rows entirely). Fail loudly with the repair instead."""
    if pending_commit_exists(spark, index_path):
        raise RuntimeError(
            f"index at {index_path} has an interrupted commit "
            f"({JOURNAL_NAME} present): a writer crashed between the "
            "commit point and the directory swaps, so the on-disk "
            "state is a mix of old and new. Run "
            "linktransformer_spark.recover_index(spark, path) (with "
            "no writer running) to roll the commit forward, then "
            "retry."
        )


def commit_swaps(
    spark: SparkSession,
    index_path: str,
    entries: list,
    cleanup: tuple | list = (),
) -> None:
    """Atomically commit a set of staged directory swaps under
    ``index_path``. ``entries`` is a list of ``("swap", src, dst)`` /
    ``("delete", dst)`` with paths relative to the index root; every
    ``src`` must already be fully staged. ``cleanup`` lists relative
    tmp roots to delete after the journal clears (best-effort — a
    leftover tmp dir is cosmetic, never served)."""
    fs, jvm = _fs(spark, index_path)
    P = jvm.org.apache.hadoop.fs.Path
    jpath = P(f"{index_path}/{JOURNAL_NAME}")
    jtmp = P(f"{index_path}/{JOURNAL_NAME}.tmp")
    body = json.dumps({"v": 1, "entries": [list(e) for e in entries]})
    # Last line of defense: every in-tree writer asserts no pending
    # commit before mutating, but deleting a pre-existing journal here
    # would silently destroy a prior crash's roll-forward plan and
    # orphan that commit's half-applied swaps. A pending journal at
    # this point is always a protocol violation — refuse, mirroring
    # assert_no_pending_commit.
    if fs.exists(jpath):
        raise RuntimeError(
            f"commit_swaps: a commit journal already exists at "
            f"{index_path}/{JOURNAL_NAME} — a prior writer crashed "
            "between its commit point and its swaps, and overwriting "
            "the journal would orphan that commit's half-applied "
            "state. Run linktransformer_spark.recover_index(spark, "
            "path) (with no writer running) first, then retry."
        )
    # op 0: the commit point — stage the journal and rename it into
    # place so it appears atomically (a crash before this serves the
    # old state exactly; the staged dirs are aside)
    _maybe_fail()
    _write_small_file(fs, jvm, jtmp, body)
    if not fs.rename(jtmp, jpath):
        raise RuntimeError(
            f"could not commit journal at {index_path}/{JOURNAL_NAME}"
        )
    _apply_entries(spark, fs, jvm, index_path, entries)
    _maybe_fail()
    fs.delete(jpath, False)
    for rel in cleanup:
        fs.delete(P(f"{index_path}/{rel}"), True)


def _apply_entries(spark, fs, jvm, index_path: str, entries: list) -> None:
    """Roll the journal's swap plan forward. Idempotent: a swap whose
    staged source is gone has already been renamed into place."""
    P = jvm.org.apache.hadoop.fs.Path
    for e in entries:
        op = e[0]
        if op == "swap":
            _, src_rel, dst_rel = e
            src = P(f"{index_path}/{src_rel}")
            dst = P(f"{index_path}/{dst_rel}")
            if fs.exists(src):
                _maybe_fail()
                fs.delete(dst, True)
                _maybe_fail()
                if not fs.rename(src, dst):
                    raise RuntimeError(
                        f"commit: rename {src_rel} -> {dst_rel} failed "
                        f"under {index_path}"
                    )
            elif not fs.exists(dst):
                raise RuntimeError(
                    f"commit journal at {index_path} references "
                    f"{src_rel} -> {dst_rel} but neither exists — the "
                    "staged data was removed externally; restore from "
                    "backup or rebuild the index"
                )
        elif op == "delete":
            _maybe_fail()
            fs.delete(P(f"{index_path}/{e[1]}"), True)
        else:
            raise RuntimeError(f"unknown commit entry {e!r}")


def clear_commit_journal(spark: SparkSession, index_path: str) -> None:
    """Drop a stale journal without applying it — only correct from a
    ``save_*`` full rebuild, which is about to overwrite every
    relation anyway (the ``clear_tombstones`` analogue)."""
    fs, jvm = _fs(spark, index_path)
    P = jvm.org.apache.hadoop.fs.Path
    fs.delete(P(f"{index_path}/{JOURNAL_NAME}"), False)
    fs.delete(P(f"{index_path}/{JOURNAL_NAME}.tmp"), False)


def recover_index(
    spark: SparkSession, index_path: str, force: bool = False
) -> dict:
    """Repair an index after a writer crash — run ONLY when no writer
    is live. Rolls a pending commit journal FORWARD (the staged data
    is durable, so the new state is always completable), sweeps stray
    staging directories, and clears the crashed writer's stale lock
    marker. Returns ``{rolled_forward, removed, cleared_lock}``.

    The no-live-writer contract is ENFORCED, not assumed: recovery
    refuses when the writer-lock marker looks live — its lease mtime
    is younger than the stale threshold (a live holder's heartbeat
    refreshes it), or, as a same-host second opinion, the holder pid
    stamped in the marker is alive on THIS host. Clearing a live
    writer's marker would admit a second concurrent writer — exactly
    the corruption the lock exists to prevent. ``force=True``
    overrides both checks for an operator who is certain (e.g. the
    holder host is known dead but its pid number is recycled here).

    After recovery the index serves exactly the crashed writer's
    post-commit state if the crash happened after the commit point,
    and exactly the old state otherwise (staged-but-uncommitted data
    is swept — it was never logically applied)."""
    import os
    import time

    from .tombstones import refresh_index_path
    from .upsert import (
        _LOCK_NAME, _lock_stale_sec, _marker_mtime, _read_lock_token,
    )

    fs, jvm = _fs(spark, index_path)
    P = jvm.org.apache.hadoop.fs.Path
    guard_lock = P(f"{index_path}/{_LOCK_NAME}")
    if not force and fs.exists(guard_lock):
        mtime = _marker_mtime(fs, guard_lock)
        holder = _read_lock_token(fs, guard_lock)
        live_why = None
        if mtime is not None and time.time() - mtime < _lock_stale_sec():
            live_why = (
                f"lease mtime is {time.time() - mtime:.1f}s old, under "
                f"the {_lock_stale_sec():.0f}s stale threshold — a live "
                "holder refreshes it on a heartbeat"
            )
        elif holder and ":" in holder:
            try:
                pid = int(holder.split(":", 1)[0])
                os.kill(pid, 0)
            except (ValueError, ProcessLookupError):
                pass
            except PermissionError:
                live_why = f"holder pid {pid} is alive on this host"
            else:
                live_why = f"holder pid {pid} is alive on this host"
        if live_why:
            raise RuntimeError(
                f"recover_index: a writer appears LIVE on {index_path} "
                f"(holder {holder or 'unknown'!r}: {live_why}). "
                "Recovering now would clear its lock marker and admit "
                "a second concurrent writer mid-mutation. Wait for the "
                "writer to finish (or its lease to go stale), or pass "
                "force=True if you are CERTAIN nothing is running."
            )
    info = {"rolled_forward": False, "removed": [], "cleared_lock": False}
    jpath = P(f"{index_path}/{JOURNAL_NAME}")
    if fs.exists(jpath):
        plan = json.loads(_read_small_file(fs, jvm, jpath))
        _apply_entries(spark, fs, jvm, index_path, plan["entries"])
        fs.delete(jpath, False)
        info["rolled_forward"] = True
    # sweep staging leftovers: never served, only clutter
    for st in fs.listStatus(P(index_path)):
        name = st.getPath().getName()
        if (
            name.endswith("._lt_upsert_tmp")
            or name.endswith("._lt_stage")
            or name == f"{JOURNAL_NAME}.tmp"
            or (
                # legacy rename-aside leftover: only cosmetic when the
                # live relation exists; with it MISSING, the old dir
                # IS the data — restore it instead of sweeping
                name == "centroids._lt_old"
                and fs.exists(P(f"{index_path}/centroids"))
            )
        ):
            fs.delete(st.getPath(), True)
            info["removed"].append(name)
    old_c = P(f"{index_path}/centroids._lt_old")
    if fs.exists(old_c) and not fs.exists(P(f"{index_path}/centroids")):
        fs.rename(old_c, P(f"{index_path}/centroids"))
        info["removed"].append("centroids._lt_old -> centroids")
    lock = P(f"{index_path}/{_LOCK_NAME}")
    if fs.exists(lock):
        fs.delete(lock, False)
        info["cleared_lock"] = True
    refresh_index_path(spark, index_path)
    return info
