"""Tombstone deletes + physical purge across the four persistable
indexes (operators/tombstones.py and the delete_from_* / purge_* /
compact functions). The invariants pinned here:

- tombstoned ids vanish from every serve path IMMEDIATELY, and the
  freed top-k slots go to survivors (never a truncated result);
- a purge is output-identical to the tombstoned view (and for BM25,
  bit-identical to a full rebuild over the filtered corpus — the
  compaction guarantee extended to deletes);
- for the vector/minhash indexes a tombstoned serve equals a serve
  against a filtered rebuild with the same frozen model (per-row
  state — no staleness at all);
- rebuilding an index at the same path clears stale tombstones;
- appending a tombstoned id does NOT resurrect it until a purge;
- PQ append against the frozen model equals a full build when the
  seed window is unchanged.

Oracle parity for the registered delete queries runs in
test_oracle_queries; these pin the lifecycle semantics on the sf0.001
tables and hand-built corpora.
"""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def bm25_queries(spark, docs):
    from linktransformer_spark.functions import similarity as S

    return docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )


# ---------------------------------------------------------------- BM25

def test_bm25_tombstone_masks_and_purge_equals_rebuild(
    spark, docs, bm25_queries, tmp_path
):
    path = str(tmp_path / "idx")
    lt.save_bm25_index(docs, path)
    base = _rows(lt.bm25_topk_indexed(spark, path, bm25_queries, k=5))

    dels = docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
    lt.delete_from_bm25_index(dels, path)
    served = lt.bm25_topk_indexed(spark, path, bm25_queries, k=5)
    # masked everywhere, and survivors fill every rank slot
    assert served.filter(F.col("doc_id") % 10 == 3).count() == 0
    assert served.count() == bm25_queries.count() * 5

    # purge == full rebuild over the filtered corpus, bit-identical
    out = str(tmp_path / "purged")
    lt.compact_bm25_index(spark, path, out)
    ref = str(tmp_path / "ref")
    lt.save_bm25_index(docs.filter(F.col("doc_id") % 10 != 3), ref)
    assert _rows(lt.bm25_topk_indexed(spark, out, bm25_queries, k=5)) == _rows(
        lt.bm25_topk_indexed(spark, ref, bm25_queries, k=5)
    )
    # ...including the stored postings themselves
    assert _rows(spark.read.parquet(f"{out}/postings")) == _rows(
        spark.read.parquet(f"{ref}/postings")
    )

    # rebuild at the same path clears the tombstones
    lt.save_bm25_index(docs, path)
    assert _rows(lt.bm25_topk_indexed(spark, path, bm25_queries, k=5)) == base


def test_bm25_append_does_not_resurrect_tombstoned_id(spark, tmp_path):
    """Hand-built corpus with a doc-unique term, so the target doc is
    guaranteed top-1 for its query whenever it is servable."""
    corpus = spark.createDataFrame(
        [
            (1, "zebra unique marker words"),
            (2, "common words shared here"),
            (3, "more common shared words"),
        ],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([(1, "zebra")], ["q_id", "q_text"])
    path = str(tmp_path / "idx")
    lt.save_bm25_index(corpus, path, n_buckets=4)
    assert lt.bm25_topk_indexed(spark, path, q, k=3).count() == 1

    doc1 = corpus.filter(F.col("doc_id") == 1)
    lt.delete_from_bm25_index(doc1.select("doc_id"), path)
    # re-appending the tombstoned id does NOT resurrect it
    lt.append_to_bm25_index(doc1, path)
    assert lt.bm25_topk_indexed(spark, path, q, k=3).count() == 0
    # purge clears the tombstone: the id becomes re-ingestable
    out = str(tmp_path / "purged")
    lt.compact_bm25_index(spark, path, out)
    assert lt.bm25_topk_indexed(spark, out, q, k=3).count() == 0
    lt.append_to_bm25_index(doc1, out)
    served = lt.bm25_topk_indexed(spark, out, q, k=3)
    assert [r["doc_id"] for r in served.collect()] == [1]


def test_bm25_delete_unknown_id_is_noop(spark, docs, bm25_queries, tmp_path):
    path = str(tmp_path / "idx")
    lt.save_bm25_index(docs, path)
    base = _rows(lt.bm25_topk_indexed(spark, path, bm25_queries, k=5))
    ghost = spark.createDataFrame([(10**9,)], "doc_id bigint")
    lt.delete_from_bm25_index(ghost, path)
    assert _rows(lt.bm25_topk_indexed(spark, path, bm25_queries, k=5)) == base


# ----------------------------------------------------------------- IVF

def test_ivf_tombstone_equals_filtered_rebuild_and_purge(
    spark, emb, tmp_path
):
    q = emb.filter(F.col("vec_id") < 50)
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    dels = emb.filter(F.col("vec_id") % 7 == 2).select("vec_id")
    lt.delete_from_ivf_index(dels, path)
    tomb = lt.ann_topk_ivf_indexed(spark, path, q, k=5)
    assert tomb.filter(F.col("neighbor_id") % 7 == 2).count() == 0

    # purge serves bit-identically to the tombstoned view
    out = str(tmp_path / "purged")
    lt.purge_ivf_index(spark, path, out)
    assert _rows(lt.ann_topk_ivf_indexed(spark, out, q, k=5)) == _rows(tomb)
    # the masked rows are physically gone and the partition layout holds
    kept = spark.read.parquet(f"{out}/cells")
    assert kept.filter(F.col("vec_id") % 7 == 2).count() == 0
    assert "cell" in kept.columns

    # no staleness: per-row state means the tombstoned serve equals a
    # serve against the same frozen centroids over the filtered rows —
    # which is exactly what the purged index is; pinned above.


def test_ivf_rebuild_clears_tombstones(spark, emb, tmp_path):
    q = emb.filter(F.col("vec_id") < 50)
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    base = _rows(lt.ann_topk_ivf_indexed(spark, path, q, k=5))
    lt.delete_from_ivf_index(
        emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"), path
    )
    lt.save_ivf_index(emb, path, n_cells=16)
    assert _rows(lt.ann_topk_ivf_indexed(spark, path, q, k=5)) == base


# ------------------------------------------------------------------ PQ

def test_pq_tombstone_masks_scan_and_rerank_and_purge_matches(
    spark, emb, tmp_path
):
    q = emb.filter(F.col("vec_id") < 50)
    path = str(tmp_path / "pq")
    lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
    dels = emb.filter(F.col("vec_id") % 7 == 2).select("vec_id")
    lt.delete_from_pq_index(dels, path)
    tomb = lt.ann_topk_pq_indexed(
        spark, path, q, k=5, n_probe=4, retrieve_k=50
    )
    assert tomb.filter(F.col("neighbor_id") % 7 == 2).count() == 0
    out = str(tmp_path / "purged")
    lt.purge_pq_index(spark, path, out)
    assert _rows(
        lt.ann_topk_pq_indexed(spark, out, q, k=5, n_probe=4, retrieve_k=50)
    ) == _rows(tomb)
    # purge re-counts n_rows from the survivors
    meta = spark.read.json(f"{out}/meta").collect()[0]
    assert int(meta["n_rows"]) == emb.count() - dels.count()


def test_pq_append_frozen_model_equals_full_build(spark, emb, tmp_path):
    """Appending the id-tail equals the one-shot build: the seed window
    (smallest ids) is identical, so centroids/codebook — and therefore
    every code and every serve — match bit-for-bit."""
    q = emb.filter(F.col("vec_id") < 50)
    full = str(tmp_path / "full")
    part = str(tmp_path / "part")
    lt.save_pq_index(emb, full, n_cells=8, m=8, n_codes=16)
    lt.save_pq_index(
        emb.filter(F.col("vec_id") < 400), part, n_cells=8, m=8, n_codes=16
    )
    lt.append_to_pq_index(emb.filter(F.col("vec_id") >= 400), part)
    kw = dict(k=5, n_probe=4, retrieve_k=50)
    assert _rows(lt.ann_topk_pq_indexed(spark, part, q, **kw)) == _rows(
        lt.ann_topk_pq_indexed(spark, full, q, **kw)
    )
    meta = spark.read.json(f"{part}/meta").collect()[0]
    assert int(meta["n_rows"]) == emb.count()


def test_pq_append_empty_batch_is_noop(spark, emb, tmp_path):
    path = str(tmp_path / "pq")
    lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
    before = spark.read.json(f"{path}/meta").collect()[0].asDict()
    lt.append_to_pq_index(emb.filter(F.col("vec_id") < 0), path)
    after = spark.read.json(f"{path}/meta").collect()[0].asDict()
    assert before == after


# -------------------------------------------------------------- MinHash

@pytest.fixture(scope="module")
def mh_sides(docs):
    seen = docs.filter(F.col("doc_id") < 250).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") < 150).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
    )
    return seen, new


def test_minhash_tombstone_equals_filtered_rebuild(
    spark, mh_sides, tmp_path
):
    seen, new = mh_sides
    path = str(tmp_path / "mh")
    lt.save_minhash_index(seen, path, on="text", id_col="doc_id")
    dels = seen.filter(F.col("doc_id") % 5 == 1).select("doc_id")
    lt.delete_from_minhash_index(dels, path, id_col="doc_id")
    kw = dict(on="text", id_col="doc_id", threshold=0.6)
    tomb = lt.near_dup_pairs_minhash_against_index(new, path, **kw)
    assert tomb.filter(F.col("dst") % 5 == 1).count() == 0

    ref = str(tmp_path / "ref")
    lt.save_minhash_index(
        seen.filter(F.col("doc_id") % 5 != 1), ref, on="text",
        id_col="doc_id",
    )
    assert _rows(tomb) == _rows(
        lt.near_dup_pairs_minhash_against_index(new, ref, **kw)
    )

    out = str(tmp_path / "purged")
    lt.purge_minhash_index(spark, path, out)
    assert _rows(
        lt.near_dup_pairs_minhash_against_index(new, out, **kw)
    ) == _rows(tomb)
    assert (
        spark.read.parquet(f"{out}/bands")
        .filter(F.col("_id") % 5 == 1)
        .count()
        == 0
    )


def test_minhash_tombstones_mask_before_cap_accounting(
    spark, mh_sides, tmp_path
):
    """A hot bucket made ENTIRELY of deleted docs must not trip the
    skew cap for survivors: deletes apply before the bucket sizing."""
    seen, new = mh_sides
    # 30 verbatim copies of doc 0's text under ids the delete covers
    hot = (
        seen.filter(F.col("doc_id") == 0)
        .crossJoin(spark.range(30).select((F.col("id") * 5 + 10001).alias("_i")))
        .select(F.col("_i").alias("doc_id"), "text")
    )
    corpus = seen.unionByName(hot)
    path = str(tmp_path / "mh")
    lt.save_minhash_index(corpus, path, on="text", id_col="doc_id")
    lt.delete_from_minhash_index(
        corpus.filter(F.col("doc_id") > 10000).select("doc_id"), path,
        id_col="doc_id",
    )
    kw = dict(on="text", id_col="doc_id", threshold=0.6)
    # cap=5 would drop the hot bucket if the 30 deleted copies still
    # counted; with them masked the bucket is size ~1 and survives
    capped = lt.near_dup_pairs_minhash_against_index(
        new, path, max_bucket_size=5, hot_bucket="drop", **kw
    )
    ref = str(tmp_path / "ref")
    lt.save_minhash_index(seen, ref, on="text", id_col="doc_id")
    uncapped = lt.near_dup_pairs_minhash_against_index(new, ref, **kw)
    assert _rows(capped) == _rows(uncapped)


# ------------------------------------------------------------ streaming

def test_streaming_ann_honors_ivf_tombstones(spark, emb, tmp_path):
    from linktransformer_spark.streaming.ops import (
        final_ann_topk, streaming_ann_against_index,
    )

    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    lt.delete_from_ivf_index(
        emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"), path
    )
    q = emb.filter(F.col("vec_id") < 50)
    src = str(tmp_path / "qsrc")
    q.write.mode("overwrite").parquet(src)
    qs = spark.readStream.schema(q.schema).parquet(src)
    cand = streaming_ann_against_index(spark, qs, path, n_probe=4)
    name = "t_idx_del_stream"
    h = (
        cand.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    h.awaitTermination(120)
    res = final_ann_topk(spark.table(name), k=5)
    assert res.filter(F.col("neighbor_id") % 7 == 2).count() == 0
    assert res.count() == 250


# ----------------------------------------------------------- validation

def test_delete_validates_index_version(spark, emb, tmp_path):
    path = str(tmp_path / "bogus")
    spark.createDataFrame(
        [(99, 16, "seeded", "vec_id", "embedding")],
        "version int, n_cells int, mode string, id_col string, "
        "vector_col string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    with pytest.raises(ValueError, match="version"):
        lt.delete_from_ivf_index(emb.select("vec_id"), path)


def test_streaming_dedup_against_stored_index_with_tombstones(
    spark, docs, mh_sides, tmp_path
):
    """The long-running ingest shape: a stream dedups against a
    PERSISTED minhash index with tombstones — rows equal the batch
    in-memory run against the filtered seen corpus."""
    from linktransformer_spark.streaming.ops import (
        run_available_now, streaming_dedup_against_index,
    )

    seen, _ = mh_sides
    path = str(tmp_path / "mh")
    lt.save_minhash_index(seen, path, on="text", id_col="doc_id")
    lt.delete_from_minhash_index(
        seen.filter(F.col("doc_id") % 5 == 1).select("doc_id"), path,
        id_col="doc_id",
    )
    src = str(tmp_path / "stream_src")
    new_batch = docs.filter(F.col("doc_id") < 150).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix words")).alias("text"),
    )
    new_batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(new_batch.schema).parquet(src)
    got = run_available_now(
        streaming_dedup_against_index(
            stream, path, on="text", id_col="doc_id", threshold=0.6
        ).select("src", "dst", F.round("jaccard", 6).alias("j"))
    )
    want = lt.near_dup_pairs_minhash_against(
        new_batch, seen.filter(F.col("doc_id") % 5 != 1),
        on="text", id_col="doc_id", threshold=0.6,
        num_hashes=24, bands=8, shingle=3, word=True,
    ).select("src", "dst", F.round("jaccard", 6).alias("j"))
    assert _rows(got) == _rows(want)


def test_tombstone_stats_observable(spark, emb, tmp_path):
    """The purge-cadence observable: exact tombstone/masked-row counts
    per index, zero-shaped when no delete batch was ever written."""
    from linktransformer_spark.operators.tombstones import tombstone_stats

    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    r0 = tombstone_stats(spark, path, "vec_id", "cells").collect()[0]
    assert (r0["n_tombstones"], r0["n_masked_rows"]) == (0, 0)
    assert r0["n_stored_rows"] == emb.count()

    dels = emb.filter(F.col("vec_id") % 7 == 2).select("vec_id")
    lt.delete_from_ivf_index(dels, path)
    r1 = tombstone_stats(spark, path, "vec_id", "cells").collect()[0]
    assert r1["n_tombstones"] == dels.count()
    assert r1["n_masked_rows"] == dels.count()  # one cell row per vector
    assert abs(r1["masked_frac"] - dels.count() / emb.count()) < 1e-12

    # purge zeroes it
    out = str(tmp_path / "purged")
    lt.purge_ivf_index(spark, path, out)
    r2 = tombstone_stats(spark, out, "vec_id", "cells").collect()[0]
    assert (r2["n_tombstones"], r2["n_masked_rows"]) == (0, 0)
    assert r2["n_stored_rows"] == emb.count() - dels.count()


def test_pq_append_rejects_dim_mismatch(spark, emb, tmp_path):
    path = str(tmp_path / "pq")
    lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
    bad = emb.filter(F.col("vec_id") >= 490).select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        lt.append_to_pq_index(bad, path)


# ------------------------------------------- round-10 advisory fixes

def test_purge_and_compact_refuse_in_place(spark, docs, emb, tmp_path):
    """Every purge/compact entry point must reject out_path ==
    index_path: the in-place form clears the tombstone set before the
    lazy anti-join reads it and overwrites files still being read — on
    a compliance-delete path that can resurrect tombstoned docs."""
    bm = str(tmp_path / "bm")
    lt.save_bm25_index(docs.limit(50), bm)
    with pytest.raises(ValueError, match="out_path"):
        lt.compact_bm25_index(spark, bm, bm)
    # trailing-slash / file:-scheme aliases of the same directory too
    with pytest.raises(ValueError, match="out_path"):
        lt.compact_bm25_index(spark, bm, bm + "/")
    with pytest.raises(ValueError, match="out_path"):
        lt.compact_bm25_index(spark, bm, "file://" + bm)

    ivf = str(tmp_path / "ivf")
    lt.save_ivf_index(emb.limit(64), ivf, n_cells=4)
    with pytest.raises(ValueError, match="out_path"):
        lt.purge_ivf_index(spark, ivf, ivf)

    pq = str(tmp_path / "pq")
    lt.save_pq_index(emb.limit(64), pq, n_cells=4, m=8, n_codes=8)
    with pytest.raises(ValueError, match="out_path"):
        lt.purge_pq_index(spark, pq, pq)

    mh = str(tmp_path / "mh")
    lt.save_minhash_index(docs.limit(50), mh, on="text", id_col="doc_id")
    with pytest.raises(ValueError, match="out_path"):
        lt.purge_minhash_index(spark, mh, mh)


def test_tombstone_batches_cast_to_stored_id_type(spark, docs, tmp_path):
    """Successive delete batches with differing caller id types (int
    vs string) must land under deletes/ in the index's STORED id type
    — mixed-schema parquet there can break the later merged read or
    the serve-time anti-join."""
    path = str(tmp_path / "bm")
    corpus = docs.limit(60)
    lt.save_bm25_index(corpus, path)
    stored_type = spark.read.parquet(f"{path}/postings").schema[
        "doc_id"
    ].dataType

    lt.delete_from_bm25_index(
        spark.createDataFrame([(3,)], "doc_id int"), path
    )
    lt.delete_from_bm25_index(
        spark.createDataFrame([("13",)], "doc_id string"), path
    )
    dels = spark.read.parquet(f"{path}/deletes")
    assert dels.schema["doc_id"].dataType == stored_type
    assert {r.doc_id for r in dels.collect()} == {3, 13}

    # and the serve still masks both
    from linktransformer_spark.functions import similarity as S

    qs = corpus.filter(F.col("doc_id").isin(3, 13)).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(S.word_tokens(F.col("text")), 1, 8), " "
        ).alias("q_text"),
    )
    got = lt.bm25_topk_indexed(spark, path, qs, k=5)
    assert got.filter(F.col("doc_id").isin(3, 13)).count() == 0


def test_minhash_rebuild_in_place_same_session_meta_fresh(
    spark, docs, tmp_path
):
    """save_minhash_index must refresh the path AFTER the meta
    overwrite (the last mutation): a session that already read meta
    and then rebuilds in place must see the fresh listing, not a
    FAILED_READ_FILE on the replaced meta files."""
    from linktransformer_spark.operators.dedup import _load_index_meta

    path = str(tmp_path / "mh")
    lt.save_minhash_index(
        docs.limit(40), path, on="text", id_col="doc_id", num_hashes=24,
        bands=8,
    )
    assert int(_load_index_meta(spark, path)["num_hashes"]) == 24
    lt.save_minhash_index(
        docs.limit(40), path, on="text", id_col="doc_id", num_hashes=32,
        bands=8,
    )
    assert int(_load_index_meta(spark, path)["num_hashes"]) == 32
