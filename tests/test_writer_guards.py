"""Round-11 consistency guards:

- single-writer lock for in-place index mutation (upsert/rebalance) —
  a second concurrent writer raises instead of silently interleaving
  staged partition swaps (operators/upsert.index_write_lock);
- null delete ids raise (a null tombstone anti-join-matches nothing, so
  the requested compliance delete would silently not happen);
- rebalance raises on duplicate stored ids (the reassignment groups by
  id, so a duplicate would silently collapse to one winner);
- the streaming BM25 drain finalizer dedupes duplicate contribution
  rows (a query id arriving in two stream rows must not double-count);
- streaming serve/ingest entries reject non-integral ids at definition
  (they coerce ids to int64 internally — silent truncation otherwise);
- a duplicate streaming query id carrying a DIFFERENT vector raises
  (the PQ serve's LUT cache is keyed by id).
"""

import contextlib
import os
import threading

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt
from linktransformer_spark.operators.upsert import (
    _LOCK_NAME, clear_writer_lock, index_write_lock,
)

SF = "/root/testdata/sf0.001"
PID = os.getpid()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_write_lock_reentrant_and_excludes_foreign_writer(spark, tmp_path):
    """In-process re-entry yields without re-acquiring (an upsert
    holds the lock and calls the also-locked append internally) and
    the INNER exit must not release the outer hold; a FOREIGN marker
    (another process's writer) raises."""
    path = str(tmp_path / f"idx_{PID}")
    os.makedirs(path, exist_ok=True)
    with index_write_lock(spark, path):
        assert os.path.exists(f"{path}/{_LOCK_NAME}")
        with index_write_lock(spark, path):  # reentrant — no raise
            pass
        # the inner exit did NOT release the outer hold
        assert os.path.exists(f"{path}/{_LOCK_NAME}")
    # released on clean exit — a new writer acquires
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")
    with index_write_lock(spark, path):
        pass
    # a marker this process does not hold (a foreign writer) excludes
    open(f"{path}/{_LOCK_NAME}", "w").close()
    with pytest.raises(RuntimeError, match="locked by another"):
        with index_write_lock(spark, path):
            pass
    os.remove(f"{path}/{_LOCK_NAME}")


def test_write_lock_reentrancy_is_thread_affine(spark, tmp_path):
    """A second writer on ANOTHER thread of the same driver (two
    run_upsert_stream queries, a notebook thread pool) must hit the
    marker check and raise — process-global reentrancy would let it
    silently enter and then delete the first writer's lock mid-swap."""
    path = str(tmp_path / f"idx_thr_{PID}")
    os.makedirs(path, exist_ok=True)
    result: dict = {}

    def other_thread_writer():
        try:
            with index_write_lock(spark, path):
                result["entered"] = True
        except RuntimeError as e:
            result["raised"] = str(e)

    with index_write_lock(spark, path):
        t = threading.Thread(target=other_thread_writer)
        t.start()
        t.join(30)
    assert "entered" not in result
    assert "locked by another" in result["raised"]
    # the failed cross-thread attempt must NOT have released our lock
    # prematurely; after our clean exit a new writer acquires
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")
    with index_write_lock(spark, path):
        pass


def test_write_lock_release_spares_newer_writers_marker(spark, tmp_path):
    """clear_writer_lock (every save_* rebuild) may clear a LIVE
    writer's marker; that writer's exit must then NOT delete the
    marker a NEWER writer has since created — holder identity in the
    marker prevents the cascading lock loss."""
    path = str(tmp_path / f"idx_tok_{PID}")
    os.makedirs(path, exist_ok=True)
    acquired = threading.Event()
    release = threading.Event()
    done: dict = {}

    def newer_writer():
        with index_write_lock(spark, path):
            acquired.set()
            release.wait(30)
        done["exited"] = True

    with contextlib.ExitStack() as stack:
        stack.enter_context(index_write_lock(spark, path))  # writer 1
        clear_writer_lock(spark, path)  # a save_* rebuild clears it
        t = threading.Thread(target=newer_writer)  # writer 2 acquires
        t.start()
        assert acquired.wait(30)
    # writer 1 exited: writer 2's marker must survive
    assert os.path.exists(f"{path}/{_LOCK_NAME}")
    with pytest.raises(RuntimeError, match="locked by another"):
        with index_write_lock(spark, path):
            pass
    release.set()
    t.join(30)
    assert done.get("exited")
    # writer 2's own exit releases its marker normally
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")


def test_write_lock_released_on_writer_failure(spark, tmp_path):
    path = str(tmp_path / f"idx_{PID}")
    os.makedirs(path, exist_ok=True)
    with pytest.raises(ValueError, match="boom"):
        with index_write_lock(spark, path):
            raise ValueError("boom")
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")


def test_upsert_respects_stale_lock(spark, emb, tmp_path):
    """A leftover marker (crashed writer) blocks the next upsert with
    remediation guidance; removing it unblocks."""
    path = str(tmp_path / f"ivf_{PID}")
    lt.save_ivf_index(emb, path, n_cells=8)
    batch = emb.filter(F.col("vec_id") % 50 == 3).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    open(f"{path}/{_LOCK_NAME}", "w").close()
    with pytest.raises(RuntimeError, match="recover_index"):
        lt.upsert_ivf_index(batch, path)
    os.remove(f"{path}/{_LOCK_NAME}")
    lt.upsert_ivf_index(batch, path)  # unblocked
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")


def test_rebalance_respects_lock(spark, emb, tmp_path):
    path = str(tmp_path / f"pq_{PID}")
    lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
    open(f"{path}/{_LOCK_NAME}", "w").close()
    with pytest.raises(RuntimeError, match="locked by another"):
        lt.rebalance_pq_index(spark, path, max_over_mean=0.01)
    os.remove(f"{path}/{_LOCK_NAME}")


def test_append_and_delete_respect_lock(spark, emb, tmp_path):
    """The lock covers EVERY index writer: an append's new partition
    files or a delete's tombstone batch landing during a concurrent
    upsert/rebalance swap would silently vanish, so both must raise
    under a held lock — and still work under their OWN lock (the
    reentrancy that lets upsert call append internally)."""
    path = str(tmp_path / f"ivf_ad_{PID}")
    lt.save_ivf_index(emb, path, n_cells=8)
    open(f"{path}/{_LOCK_NAME}", "w").close()
    batch = emb.filter(F.col("vec_id") % 50 == 1).select(
        (F.col("vec_id") + 70000).alias("vec_id"), "embedding"
    )
    with pytest.raises(RuntimeError, match="locked by another"):
        lt.append_to_ivf_index(batch, path)
    with pytest.raises(RuntimeError, match="locked by another"):
        lt.delete_from_ivf_index(
            emb.filter(F.col("vec_id") == 3).select("vec_id"), path
        )
    os.remove(f"{path}/{_LOCK_NAME}")
    lt.append_to_ivf_index(batch, path)
    lt.delete_from_ivf_index(
        emb.filter(F.col("vec_id") == 3).select("vec_id"), path
    )
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")


def test_save_rebuild_clears_stale_lock(spark, emb, tmp_path):
    """A full rebuild at the same path must not inherit a crashed
    writer's lock marker (the clear_tombstones analogue)."""
    path = str(tmp_path / f"ivf_sl_{PID}")
    lt.save_ivf_index(emb, path, n_cells=8)
    open(f"{path}/{_LOCK_NAME}", "w").close()
    lt.save_ivf_index(emb, path, n_cells=8)
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")
    # the rebuilt index accepts writers again
    lt.upsert_ivf_index(
        emb.filter(F.col("vec_id") % 50 == 3)
        .select("vec_id", F.reverse("embedding").alias("embedding")),
        path,
    )


def test_delete_null_ids_raise(spark, emb, tmp_path):
    path = str(tmp_path / f"ivf_del_{PID}")
    lt.save_ivf_index(emb, path, n_cells=8)
    ids = spark.createDataFrame(
        [(3,), (None,)], "vec_id bigint"
    )
    with pytest.raises(ValueError, match="NULL"):
        lt.delete_from_ivf_index(ids, path)
    # the valid id alone still deletes
    lt.delete_from_ivf_index(ids.filter(F.col("vec_id").isNotNull()), path)
    got = lt.ann_topk_ivf_indexed(
        spark, path, emb.filter(F.col("vec_id") < 5), k=3, n_probe=8
    )
    assert not any(r["neighbor_id"] == 3 for r in got.collect())


def test_rebalance_duplicate_stored_ids_raise(spark, emb, tmp_path):
    """A raw append of an EXISTING id (the anomaly upsert exists to
    prevent) must make rebalance fail loudly, not silently drop one of
    the two stored rows during the group-by-id reassignment."""
    path = str(tmp_path / f"ivf_dup_{PID}")
    lt.save_ivf_index(emb, path, n_cells=4)
    lt.append_to_ivf_index(
        emb.filter(F.col("vec_id") == 5).select("vec_id", "embedding"),
        path,
    )
    # max_over_mean tiny -> every cell with >= 2 rows is hot, so the
    # duplicate's cell is in the rewrite set
    with pytest.raises(ValueError, match="duplicate"):
        lt.rebalance_ivf_index(spark, path, max_over_mean=0.01)


def test_rebalance_leaves_no_aside_dir(spark, emb, tmp_path):
    """The rename-aside centroids swap must clean up its .old dir on
    success and leave a servable index."""
    path = str(tmp_path / f"ivf_rb_{PID}")
    lt.save_ivf_index(emb, path, n_cells=4)
    stats = lt.rebalance_ivf_index(spark, path, max_over_mean=0.5).first()
    assert stats["n_hot_cells"] > 0
    assert not os.path.exists(f"{path}/centroids._lt_old")
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")
    q = emb.filter(F.col("vec_id") < 10)
    assert lt.ann_topk_ivf_indexed(spark, path, q, k=3,
                                   n_probe=stats["n_cells_after"]).count() > 0


def test_final_bm25_topk_dedupes_duplicate_query_rows(spark):
    """The batch path's (query, term) distinct is global; a query id
    arriving in two stream rows emits its shared contributions twice —
    the finalizer must count each (query, term, doc) once."""
    from linktransformer_spark.streaming import final_bm25_topk

    drained = spark.createDataFrame(
        [
            (1, 10, "alpha", 0.5),
            (1, 10, "alpha", 0.5),   # second stream row, same query id
            (1, 10, "beta", 0.3),
            (1, 11, "alpha", 0.2),
        ],
        "_q long, _d long, _tok string, _c double",
    )
    rows = {(r["q_id"], r["doc_id"]): (r["score"], r["n_terms"])
            for r in final_bm25_topk(drained, k=5).collect()}
    assert rows[(1, 10)] == (0.8, 2)
    assert rows[(1, 11)] == (0.2, 1)


def test_final_ann_topk_dedupes_duplicate_query_rows(spark):
    """A query id arriving in two stream rows (same vector) drains its
    candidate set twice — identical rows must not occupy multiple rank
    slots (the final_bm25_topk dedup stance, mirrored)."""
    from linktransformer_spark.streaming import final_ann_topk

    drained = spark.createDataFrame(
        [
            (1, 10, 0.9),
            (1, 10, 0.9),   # second stream row, same query id
            (1, 11, 0.8),
            (1, 11, 0.8),
            (1, 12, 0.7),
            (2, 10, 0.5),
        ],
        "query_id long, neighbor_id long, score double",
    )
    got = final_ann_topk(drained, k=2).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["score"])
        )
    assert sorted(by_q[1]) == [(1, 10, 0.9), (2, 11, 0.8)]
    assert sorted(by_q[2]) == [(1, 10, 0.5)]


def test_streaming_pq_rejects_non_integral_query_id(spark, emb, tmp_path):
    from linktransformer_spark.streaming import streaming_pq_against_index

    path = str(tmp_path / f"pq_sid_{PID}")
    lt.save_pq_index(emb, path, n_cells=4, m=8, n_codes=16)
    src = str(tmp_path / "q_sid")
    emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    ).write.parquet(src)
    sdf = spark.readStream.schema(
        "vec_id string, embedding array<double>"
    ).parquet(src)
    with pytest.raises(ValueError, match="integral"):
        streaming_pq_against_index(spark, sdf, path)


def test_streaming_semdedup_rejects_non_integral_id(spark, emb, tmp_path):
    from linktransformer_spark.streaming import streaming_semdedup_against

    src = str(tmp_path / "sd_sid")
    emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    ).write.parquet(src)
    sdf = spark.readStream.schema(
        "vec_id string, embedding array<double>"
    ).parquet(src)
    with pytest.raises(ValueError, match="integral"):
        streaming_semdedup_against(sdf, emb, id_col="vec_id")


def test_streaming_pq_duplicate_qid_different_vector_raises(
    spark, emb, tmp_path
):
    """Same query id, two different vectors, one source file (one
    Arrow batch at assign time) — the contract check must kill the
    stream instead of silently scoring against the wrong LUT."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from linktransformer_spark.streaming import (
        run_available_now, streaming_pq_against_index,
    )

    path = str(tmp_path / f"pq_dup_{PID}")
    lt.save_pq_index(emb, path, n_cells=4, m=8, n_codes=16)
    twice = (
        emb.filter(F.col("vec_id").isin(1, 2))
        .select(F.lit(99).cast("long").alias("vec_id"), "embedding")
        .coalesce(1)
    )
    src = str(tmp_path / "q_dup")
    twice.write.parquet(src)
    sdf = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    with pytest.raises(
        (StreamingQueryException, Py4JJavaError),
        match="two different vectors",
    ):
        run_available_now(
            streaming_pq_against_index(spark, sdf, path, n_probe=2),
            output_mode="append",
        )


def test_lock_stamp_failure_removes_own_marker(spark, tmp_path, monkeypatch):
    """Winning the create but failing to stamp the token must NOT
    leave the index locked by our own orphaned empty marker (which the
    token-checked release path would refuse to delete): the acquire
    cleans up the just-created marker, raises a stamp-failure error
    distinct from 'locked by another writer', and a retry acquires."""
    from linktransformer_spark.operators import upsert as U

    path = str(tmp_path / f"idx_stamp_{PID}")
    os.makedirs(path, exist_ok=True)

    def boom(out, token):
        raise IOError("disk full")

    monkeypatch.setattr(U, "_stamp_token", boom)
    with pytest.raises(RuntimeError, match="NOT left locked"):
        with index_write_lock(spark, path):
            pass
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")
    monkeypatch.undo()
    with index_write_lock(spark, path):  # retry acquires normally
        assert os.path.exists(f"{path}/{_LOCK_NAME}")
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")


# ---------------------------------------------------------------------------
# Round-13 lease lock: heartbeat refresh, stale takeover, create-race
# verify, and the recover_index live-writer guard.
# ---------------------------------------------------------------------------


def _shrink_lease(monkeypatch):
    from linktransformer_spark.operators import upsert as U

    monkeypatch.setattr(U, "LOCK_HEARTBEAT_SEC", 0.2)
    monkeypatch.setattr(U, "LOCK_STALE_FACTOR", 2.0)   # stale after 0.4s
    monkeypatch.setattr(U, "LOCK_TAKEOVER_SETTLE_SEC", 0.1)
    return U


def test_stale_lease_takeover(spark, tmp_path, monkeypatch):
    """A crashed writer's marker (no heartbeat refreshing it) blocks
    successors only until the lease goes stale: the next acquire takes
    it over with a RuntimeWarning instead of failing forever."""
    import time

    _shrink_lease(monkeypatch)
    path = str(tmp_path / f"idx_lease_{PID}")
    os.makedirs(path, exist_ok=True)
    marker = f"{path}/{_LOCK_NAME}"
    with open(marker, "w") as f:
        f.write("99999:deadbeef")
    old = time.time() - 5.0
    os.utime(marker, (old, old))
    with pytest.warns(RuntimeWarning, match="STALE writer lease"):
        with index_write_lock(spark, path):
            # the marker is now OURS (new token), not the dead one's
            assert open(marker).read() != "99999:deadbeef"
    assert not os.path.exists(marker)


def test_live_lease_is_not_taken_over(spark, tmp_path, monkeypatch):
    """The holder's heartbeat keeps the marker mtime fresh, so a
    second writer arriving well past the stale threshold still sees a
    LIVE lease and raises — takeover only ever fires on a dead one."""
    import time

    _shrink_lease(monkeypatch)
    path = str(tmp_path / f"idx_live_{PID}")
    os.makedirs(path, exist_ok=True)
    result: dict = {}

    def contender():
        try:
            with index_write_lock(spark, path):
                result["entered"] = True
        except RuntimeError as e:
            result["raised"] = str(e)

    with index_write_lock(spark, path):
        time.sleep(1.2)  # 3x the 0.4s stale threshold — heartbeat beats
        t = threading.Thread(target=contender)
        t.start()
        t.join(30)
    assert "entered" not in result
    assert "locked by another" in result["raised"]


def test_near_simultaneous_acquire_single_winner(spark, tmp_path,
                                                 monkeypatch):
    """Two threads race the create on a FREE lock: the local-FS create
    shim is check-then-act, so both may 'create' — the post-stamp
    verify read converges to exactly one winner (one surviving token);
    the loser raises without deleting the winner's marker."""
    from concurrent.futures import ThreadPoolExecutor

    from linktransformer_spark.operators import upsert as U

    monkeypatch.setattr(U, "LOCK_ACQUIRE_VERIFY_SEC", 0.15)
    path = str(tmp_path / f"idx_race_{PID}")
    os.makedirs(path, exist_ok=True)
    barrier = threading.Barrier(2)
    outcomes = []

    def attempt(i):
        barrier.wait(10)
        try:
            with index_write_lock(spark, path):
                outcomes.append(("won", i))
                # hold briefly so the loser's attempt fully overlaps
                import time

                time.sleep(0.3)
        except RuntimeError:
            outcomes.append(("lost", i))

    with ThreadPoolExecutor(2) as ex:
        list(ex.map(attempt, [0, 1]))
    wins = [o for o in outcomes if o[0] == "won"]
    assert len(wins) == 1, outcomes
    # the winner's clean release left the lock free
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")
    with index_write_lock(spark, path):
        pass


def test_recover_refuses_live_writer(spark, tmp_path):
    """recover_index clearing a LIVE writer's marker would admit a
    second concurrent writer — it must refuse while the lease is fresh
    and proceed after release (or under force=True)."""
    import linktransformer_spark as lt

    path = str(tmp_path / f"idx_rec_{PID}")
    os.makedirs(path, exist_ok=True)
    with index_write_lock(spark, path):
        with pytest.raises(RuntimeError, match="appears LIVE"):
            lt.recover_index(spark, path)
        assert os.path.exists(f"{path}/{_LOCK_NAME}")
    # after the writer exits, recovery proceeds (no marker left)
    info = lt.recover_index(spark, path)
    assert info["cleared_lock"] is False


def test_recover_refuses_fresh_foreign_marker_force_overrides(
    spark, tmp_path
):
    """A fresh-mtime marker (writer possibly mid-swap elsewhere) is
    treated as live even without a heartbeat hit yet; force=True is
    the explicit operator override."""
    import linktransformer_spark as lt

    path = str(tmp_path / f"idx_force_{PID}")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{_LOCK_NAME}", "w") as f:
        f.write("99999:elsewhere")
    with pytest.raises(RuntimeError, match="appears LIVE"):
        lt.recover_index(spark, path)
    info = lt.recover_index(spark, path, force=True)
    assert info["cleared_lock"] is True
    assert not os.path.exists(f"{path}/{_LOCK_NAME}")


def test_recover_pid_liveness_second_opinion(spark, tmp_path,
                                             monkeypatch):
    """Past the stale threshold the same-host pid check still catches
    a HUNG (alive but not heartbeating… e.g. stopped) writer: a stale
    marker stamped with a live pid refuses, one with a dead pid
    recovers."""
    import subprocess
    import time

    import linktransformer_spark as lt

    _shrink_lease(monkeypatch)
    path = str(tmp_path / f"idx_pid_{PID}")
    os.makedirs(path, exist_ok=True)
    marker = f"{path}/{_LOCK_NAME}"

    # live pid (our own), stale mtime -> refuse
    with open(marker, "w") as f:
        f.write(f"{PID}:hung")
    old = time.time() - 5.0
    os.utime(marker, (old, old))
    with pytest.raises(RuntimeError, match="pid .* is alive"):
        lt.recover_index(spark, path)

    # dead pid, stale mtime -> recover clears the marker
    dead = subprocess.Popen(["true"])
    dead.wait()
    with open(marker, "w") as f:
        f.write(f"{dead.pid}:crashed")
    os.utime(marker, (old, old))
    info = lt.recover_index(spark, path)
    assert info["cleared_lock"] is True
