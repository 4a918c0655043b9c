"""One-call upsert across the four persistable indexes
(operators/upsert.py) and the cell-balance observable
(operators/ann.index_cell_stats). Invariants:

- upsert(changed + new) makes every serve equal the same serve against
  a one-shot index built over the MODIFIED corpus (per-row-state
  families exactly; BM25 under its frozen-reference-frame append
  contract — old postings gone, new versions scored with build stats);
- upserting PREVIOUSLY-TOMBSTONED ids makes the new versions visible
  (plain append would stay masked — the reason upsert exists);
- untouched partitions' files are not rewritten (the targeted-rewrite
  claim for the partition-keyed families);
- duplicate ids within one batch raise;
- index_cell_stats reports exact counts and the documented skew ratio.
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


def _modified_corpus(emb):
    """upsert shape: ids %10==3 get a CHANGED vector (reversed), plus
    brand-new ids (+10000) carrying other rows' vectors."""
    changed = emb.filter(F.col("vec_id") % 10 == 3).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    new = emb.filter(F.col("vec_id") % 10 == 7).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    batch = changed.unionByName(new)
    modified = (
        emb.filter(F.col("vec_id") % 10 != 3)
        .select("vec_id", "embedding")
        .unionByName(batch)
    )
    return batch, modified


def test_upsert_ivf_equals_filtered_one_shot(spark, emb, tmp_path):
    batch, modified = _modified_corpus(emb)
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    # tombstone SOME of the to-be-upserted ids first: the upsert must
    # clear them or the new versions stay invisible
    lt.delete_from_ivf_index(
        emb.filter(F.col("vec_id") % 20 == 3).select("vec_id"), path
    )
    lt.upsert_ivf_index(batch, path)

    q = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    got = lt.ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=4)

    # the documented-recipe twin: delete + PURGE (keeps the frozen
    # build-time centroids) + append to a fresh path — upsert must be
    # exactly this in one call. (A one-shot rebuild over the modified
    # corpus is NOT the twin: it would re-seed centroids from the
    # changed vectors.)
    ref = str(tmp_path / "ivf_ref")
    lt.save_ivf_index(emb, ref, n_cells=16)
    lt.delete_from_ivf_index(batch.select("vec_id"), ref)
    ref2 = str(tmp_path / "ivf_ref2")
    lt.purge_ivf_index(spark, ref, ref2)
    lt.append_to_ivf_index(batch, ref2)
    want = lt.ann_topk_ivf_indexed(spark, ref2, q, k=5, n_probe=4)
    assert _rows(got) == _rows(want)


def test_upsert_pq_lifecycle_and_meta_rows(spark, emb, tmp_path):
    batch, modified = _modified_corpus(emb)
    path = str(tmp_path / "pq")
    lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
    lt.upsert_pq_index(batch, path)

    meta = spark.read.json(f"{path}/meta").collect()[0]
    assert meta["n_rows"] == modified.count()

    q = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    got = lt.ann_topk_pq_indexed(spark, path, q, k=5)
    # documented-recipe twin (frozen centroids/codebook survive the
    # purge; a one-shot rebuild would re-seed them from the batch)
    ref = str(tmp_path / "pq_ref")
    lt.save_pq_index(emb, ref, n_cells=8, m=8, n_codes=16)
    lt.delete_from_pq_index(batch.select("vec_id"), ref)
    ref2 = str(tmp_path / "pq_ref2")
    lt.purge_pq_index(spark, ref, ref2)
    lt.append_to_pq_index(batch, ref2)
    want = lt.ann_topk_pq_indexed(spark, ref2, q, k=5)
    assert _rows(got) == _rows(want)


def test_upsert_bm25_drops_old_postings_and_serves_new(
    spark, docs, tmp_path
):
    from linktransformer_spark.functions import similarity as S

    corpus = docs.limit(200).select("doc_id", "text")
    path = str(tmp_path / "bm")
    lt.save_bm25_index(corpus, path, n_buckets=4)
    # tombstone one id that the upsert then re-ingests
    lt.delete_from_bm25_index(
        corpus.filter(F.col("doc_id") == 3).select("doc_id"), path
    )
    batch = corpus.filter(F.col("doc_id") % 10 == 3).select(
        "doc_id",
        F.concat(F.lit("zqx unique marker "), F.col("text")).alias("text"),
    )
    lt.upsert_bm25_index(batch, path)

    post = spark.read.parquet(f"{path}/postings")
    # old versions physically gone: the upserted docs' postings all
    # carry the new marker term's dl (old text had no 'zqx')
    assert post.filter(
        (F.col("doc_id") % 10 == 3) & (F.col("term") == "zqx")
    ).count() == batch.count()
    qs = spark.createDataFrame(
        [(1, "zqx unique marker")], ["q_id", "q_text"]
    )
    got = lt.bm25_topk_indexed(spark, path, qs, k=5)
    assert got.count() > 0
    assert all(r.doc_id % 10 == 3 for r in got.collect())
    # the previously tombstoned, now re-upserted id serves again
    qs3 = spark.createDataFrame([(2, "zqx marker")], ["q_id", "q_text"])
    served = {r.doc_id for r in lt.bm25_topk_indexed(spark, path, qs3, k=20).collect()}
    assert 3 in served

    # frozen-frame parity: scores match delete+append to a FRESH path
    ref = str(tmp_path / "bm_ref")
    lt.save_bm25_index(corpus, ref, n_buckets=4)
    refp = spark.read.parquet(f"{ref}/postings").filter(
        F.col("doc_id") % 10 != 3
    )
    dl = lt.bm25_delta_postings(spark, ref, batch)
    want = refp.unionByName(dl.select(refp.columns))
    got_all = spark.read.parquet(f"{path}/postings")
    assert _rows(
        got_all.select("doc_id", "term", "impact", "tf", "dl")
    ) == _rows(want.select("doc_id", "term", "impact", "tf", "dl"))


def test_upsert_minhash_matches_modified_one_shot(spark, docs, tmp_path):
    corpus = docs.limit(150).select("doc_id", "text")
    path = str(tmp_path / "mh")
    lt.save_minhash_index(corpus, path, on="text", id_col="doc_id")
    batch = corpus.filter(F.col("doc_id") % 10 == 4).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" tail drift words added")).alias(
            "text"
        ),
    )
    lt.upsert_minhash_index(batch, path, on="text", id_col="doc_id")

    probe = corpus.filter(F.col("doc_id") >= 100).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    got = lt.near_dup_pairs_minhash_against_index(
        probe, path, on="text", id_col="doc_id", threshold=0.5
    )
    ref = str(tmp_path / "mh_ref")
    modified = corpus.filter(F.col("doc_id") % 10 != 4).unionByName(batch)
    lt.save_minhash_index(modified, ref, on="text", id_col="doc_id")
    want = lt.near_dup_pairs_minhash_against_index(
        probe, ref, on="text", id_col="doc_id", threshold=0.5
    )
    assert _rows(got) == _rows(want)


def test_upsert_rejects_duplicate_batch_ids(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb.limit(64), path, n_cells=4)
    dup = emb.limit(1).unionByName(emb.limit(1))
    with pytest.raises(ValueError, match="duplicate ids"):
        lt.upsert_ivf_index(dup, path)


def test_upsert_rejects_uncastable_and_null_ids(spark, emb, tmp_path):
    """The non-ANSI cast nulls unconvertible ids silently; the upsert
    must raise (old version would otherwise survive and the new row
    append under a null id). Same for ids that are already null."""
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb.limit(64), path, n_cells=4)
    bad = spark.createDataFrame(
        [("abc", [0.0] * 64)], "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="do not cast"):
        lt.upsert_ivf_index(bad, path)
    nulled = spark.createDataFrame(
        [(None, [0.0] * 64)], "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL id"):
        lt.upsert_ivf_index(nulled, path)


def test_delete_rejects_uncastable_ids(spark, emb, tmp_path):
    """A tombstone that casts to null deletes NOTHING — the delete
    path must raise rather than silently no-op a compliance delete."""
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb.limit(64), path, n_cells=4)
    bad = spark.createDataFrame([("abc",)], "vec_id string")
    with pytest.raises(ValueError, match="null tombstone deletes nothing"):
        lt.delete_from_ivf_index(bad, path)
    # string ids that DO cast still work (the typed-tombstone contract)
    ok = spark.createDataFrame([("3",)], "vec_id string")
    lt.delete_from_ivf_index(ok, path)
    q = emb.limit(5)
    got = lt.ann_topk_ivf_indexed(spark, path, q, k=3, n_probe=16)
    assert got.filter(F.col("neighbor_id") == 3).count() == 0


def test_upsert_rewrites_only_affected_cells(spark, emb, tmp_path):
    """The targeted-rewrite claim: files under cells the batch does
    not touch keep their modification times."""
    import os

    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    cells = spark.read.parquet(f"{path}/cells")
    # one existing id -> its (single) cell is the only affected one
    one = emb.filter(F.col("vec_id") == 7)
    hit_cell = cells.filter(F.col("vec_id") == 7).select("cell").first()[0]
    before = {}
    for d in os.listdir(f"{path}/cells"):
        if d.startswith("cell="):
            full = f"{path}/cells/{d}"
            before[d] = {
                f: os.path.getmtime(f"{full}/{f}") for f in os.listdir(full)
            }
    lt.upsert_ivf_index(
        one.select("vec_id", F.reverse("embedding").alias("embedding")),
        path,
    )
    for d, files in before.items():
        if d == f"cell={hit_cell}":
            continue
        full = f"{path}/cells/{d}"
        for f, mt in files.items():
            # append may ADD files to the new version's target cell;
            # pre-existing files elsewhere must be untouched
            if os.path.exists(f"{full}/{f}"):
                assert os.path.getmtime(f"{full}/{f}") == mt, (d, f)


def test_index_cell_stats_exact_counts(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16)
    cells = spark.read.parquet(f"{path}/cells")
    per = {
        r["cell"]: r["n"]
        for r in cells.groupBy("cell").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    r = lt.index_cell_stats(spark, path).collect()[0]
    assert r["n_cells"] == 16
    assert r["n_nonempty_cells"] == len(per)
    assert r["n_rows"] == sum(per.values())
    assert r["max_cell_rows"] == max(per.values())
    assert r["min_cell_rows"] == min(per.values())
    assert abs(r["mean_cell_rows"] - sum(per.values()) / 16) < 1e-12
    assert abs(
        r["max_over_mean"] - max(per.values()) * 16 / sum(per.values())
    ) < 1e-12
    best = max(per.values())
    assert r["top_cell"] == min(c for c, n in per.items() if n == best)


class TestRebalanceIvf:
    """rebalance_ivf_index — the ACT half of the index_cell_stats
    loop. Oracle parity (the full SQL re-derivation of the rebalance)
    runs in test_oracle_queries (ann_ivf_rebalanced); these pin the
    physical invariants."""

    def test_rows_preserved_and_all_probe_equals_exact(
        self, spark, emb, tmp_path
    ):
        path = str(tmp_path / "ivf")
        lt.save_ivf_index(emb, path, n_cells=16)
        st = lt.rebalance_ivf_index(
            spark, path, max_over_mean=1.2, split_factor=2
        ).collect()[0]
        assert st.n_hot_cells > 0 and st.n_new_cells > 0
        assert st.n_cells_after == st.n_cells_before + st.n_new_cells
        # the stored (id -> vector) multiset is untouched — only cell
        # membership moved
        stored = spark.read.parquet(f"{path}/cells")
        assert stored.count() == emb.count()
        assert stored.select("vec_id").distinct().count() == emb.count()
        # centroid relation grew to the new topology, ids unique
        cent = spark.read.parquet(f"{path}/centroids")
        assert cent.count() == st.n_cells_after
        assert cent.select("cell").distinct().count() == st.n_cells_after
        # probing every cell is exact top-k (nothing lost in surgery)
        q = emb.filter(F.col("vec_id") < 20)
        got = lt.ann_topk_ivf_indexed(
            spark, path, q, k=5, n_probe=int(st.n_cells_after)
        )
        want = lt.ann_topk(q, emb, vector_col="embedding", k=5,
                           mode="exact_cross")
        assert sorted(
            (r.query_id, r.neighbor_id, r.rank) for r in got.collect()
        ) == sorted(
            (r.query_id, r.neighbor_id, r.rank) for r in want.collect()
        )

    def test_noop_when_balanced(self, spark, emb, tmp_path):
        path = str(tmp_path / "ivf")
        lt.save_ivf_index(emb, path, n_cells=8)
        before = sorted(map(tuple, spark.read.parquet(
            f"{path}/cells").select("vec_id", "cell").collect()))
        st = lt.rebalance_ivf_index(
            spark, path, max_over_mean=50.0
        ).collect()[0]
        assert st.n_hot_cells == 0 and st.rows_moved == 0
        assert st.n_cells_after == st.n_cells_before
        after = sorted(map(tuple, spark.read.parquet(
            f"{path}/cells").select("vec_id", "cell").collect()))
        assert before == after

    def test_deterministic_across_builds(self, spark, emb, tmp_path):
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        for p in (p1, p2):
            lt.save_ivf_index(emb, p, n_cells=16)
            lt.rebalance_ivf_index(spark, p, max_over_mean=1.2)
        for rel in ("cells", "centroids"):
            a = sorted(map(repr, map(tuple, spark.read.parquet(
                f"{p1}/{rel}").collect())))
            b = sorted(map(repr, map(tuple, spark.read.parquet(
                f"{p2}/{rel}").collect())))
            assert a == b, rel

    def test_tombstones_survive_rebalance(self, spark, emb, tmp_path):
        path = str(tmp_path / "ivf")
        lt.save_ivf_index(emb, path, n_cells=16)
        dels = emb.filter(F.col("vec_id") % 11 == 5).select("vec_id")
        lt.delete_from_ivf_index(dels, path)
        st = lt.rebalance_ivf_index(
            spark, path, max_over_mean=1.2
        ).collect()[0]
        assert st.n_hot_cells > 0
        q = emb.filter(F.col("vec_id") < 20)
        got = lt.ann_topk_ivf_indexed(
            spark, path, q, k=5, n_probe=int(st.n_cells_after)
        )
        deleted = {r.vec_id for r in dels.collect()}
        assert not deleted & {
            r.neighbor_id for r in got.collect()
        }

    def test_knob_validation(self, spark, emb, tmp_path):
        path = str(tmp_path / "ivf")
        lt.save_ivf_index(emb.limit(64), path, n_cells=4)
        with pytest.raises(ValueError, match="split_factor"):
            lt.rebalance_ivf_index(spark, path, split_factor=1)
        with pytest.raises(ValueError, match="max_over_mean"):
            lt.rebalance_ivf_index(spark, path, max_over_mean=0)

    def test_refine_recovers_recall_at_fixed_probe(self, spark, tmp_path):
        """The round-10 drift table showed the SEEDED split trading
        recall@10 at fixed n_probe. refine=N (Lloyd over each hot
        cell's own members) must meet-or-beat the seeded split's
        recall on the same drifted index at the same probe budget —
        deterministic end to end (fixed rng, fixed-iteration Lloyd,
        first-max ties), so this is an exact gate, not a flaky
        threshold. Measured on this corpus: 0.9105 seeded -> 0.9205
        refined."""
        import numpy as np

        rng = np.random.default_rng(7)
        K, DIM, N = 8, 32, 4000
        centers = rng.normal(size=(K, DIM))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = np.where(rng.random(N) < 0.5,
                          rng.integers(0, K - 2, N),
                          rng.integers(K - 2, K, N))
        pts = centers[assign] + 0.15 * rng.normal(size=(N, DIM))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        init = np.nonzero(assign < K - 2)[0]
        drift = np.nonzero(assign >= K - 2)[0]

        def mkdf(idx):
            # pandas input -> Arrow createDataFrame: the row-pickling
            # path on 4000 x 32 floats was seconds per call (this test
            # builds four frames)
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame({
                    "vec_id": [int(i) for i in idx],
                    "embedding": [[float(x) for x in pts[i]] for i in idx],
                }),
                "vec_id long, embedding array<double>",
            )

        emb_all = mkdf(np.arange(N))
        qidx = rng.choice(N, 200, replace=False)
        exact = (
            lt.ann_topk(mkdf(qidx), emb_all, k=10, mode="broadcast_knn")
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )
        n_ex = exact.count()
        rec = {}
        for refine in (0, 4):
            path = str(tmp_path / f"ivf_refine{refine}")
            lt.save_ivf_index(mkdf(init), path, n_cells=8)
            lt.append_to_ivf_index(mkdf(drift), path)
            st = lt.rebalance_ivf_index(
                spark, path, max_over_mean=2.0, refine=refine
            ).first()
            assert st["n_hot_cells"] > 0
            got = lt.ann_topk_ivf_indexed(
                spark, path, mkdf(qidx), k=10, n_probe=3
            ).select("query_id", "neighbor_id")
            rec[refine] = exact.join(
                got, ["query_id", "neighbor_id"]
            ).count() / n_ex
        assert rec[4] >= rec[0] > 0.5

    def test_refine_pq_serves(self, spark, emb, tmp_path):
        """PQ twin smoke: the refined rebalance leaves a servable
        index with dense cell ids (the positional centroid matrix
        contract) and the stored row multiset intact."""
        path = str(tmp_path / "pq_refine")
        lt.save_pq_index(emb, path, n_cells=8, m=8, n_codes=16)
        n0 = spark.read.parquet(f"{path}/cells").count()
        st = lt.rebalance_pq_index(
            spark, path, max_over_mean=0.5, refine=3
        ).first()
        assert st["n_hot_cells"] > 0
        cent = spark.read.parquet(f"{path}/centroids")
        assert sorted(r["cell"] for r in cent.collect()) == list(
            range(st["n_cells_after"])
        )
        assert spark.read.parquet(f"{path}/cells").count() == n0
        q = emb.filter(F.col("vec_id") < 20)
        out = lt.ann_topk_pq_indexed(spark, path, q, k=5,
                                     n_probe=st["n_cells_after"])
        assert out.count() == 20 * 5


class TestRebalancePq:
    """rebalance_pq_index — the r90 serving-index twin. Oracle parity
    (rebalance + full ADC/rerank recipe in SQL) runs in
    test_oracle_queries (ann_pq_rebalanced); these pin the frozen-code
    and topology invariants."""

    def test_codes_frozen_and_meta_grows(self, spark, emb, tmp_path):
        path = str(tmp_path / "pq")
        lt.save_pq_index(emb, path, n_cells=16, m=8, n_codes=16)
        before = {
            r.vec_id: tuple(r.codes)
            for r in spark.read.parquet(f"{path}/cells")
            .select("vec_id", "codes").collect()
        }
        st = lt.rebalance_pq_index(
            spark, path, max_over_mean=1.2, split_factor=2
        ).collect()[0]
        assert st.n_hot_cells > 0
        meta = spark.read.json(f"{path}/meta").collect()[0]
        assert meta["n_cells"] == st.n_cells_after
        assert meta["n_rows"] == emb.count()
        after = {
            r.vec_id: tuple(r.codes)
            for r in spark.read.parquet(f"{path}/cells")
            .select("vec_id", "codes").collect()
        }
        # moving a row between cells never re-encodes it
        assert before == after
        # cell ids stay dense (the positional centroid matrix contract)
        cents = sorted(
            r.cell for r in spark.read.parquet(
                f"{path}/centroids").select("cell").collect()
        )
        assert cents == list(range(int(st.n_cells_after)))
        # serve still works and honors auto knobs over the new n_cells
        q = emb.filter(F.col("vec_id") < 10)
        got = lt.ann_topk_pq_indexed(spark, path, q, k=5)
        assert got.groupBy("query_id").count().agg(
            F.min("count")).first()[0] == 5

    def test_tombstones_survive(self, spark, emb, tmp_path):
        path = str(tmp_path / "pq")
        lt.save_pq_index(emb, path, n_cells=16, m=8, n_codes=16)
        dels = emb.filter(F.col("vec_id") % 13 == 2).select("vec_id")
        lt.delete_from_pq_index(dels, path)
        lt.rebalance_pq_index(spark, path, max_over_mean=1.2)
        q = emb.filter(F.col("vec_id") < 20)
        got = lt.ann_topk_pq_indexed(spark, path, q, k=5, n_probe=16)
        deleted = {r.vec_id for r in dels.collect()}
        assert not deleted & {r.neighbor_id for r in got.collect()}


def test_maintenance_chain_rebalance_append_upsert_serve(
    spark, emb, tmp_path
):
    """The maintenance operators must COMPOSE: build -> rebalance
    (topology grows) -> append (encodes against the post-rebalance
    centroids) -> upsert (targeted rewrite + untombstone) -> delete ->
    all-probe serve == exact top-k over the end-state corpus (IVF is
    per-row state, so full probing is exact whatever the geometry)."""
    path = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") < 400)
    lt.save_ivf_index(base, path, n_cells=16)
    st = lt.rebalance_ivf_index(
        spark, path, max_over_mean=1.05, split_factor=2
    ).collect()[0]
    assert st.n_hot_cells > 0
    appended = emb.filter(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 480)
    )
    lt.append_to_ivf_index(appended, path)
    batch = emb.filter(F.col("vec_id") % 10 == 3).filter(
        F.col("vec_id") < 480
    ).select("vec_id", F.reverse("embedding").alias("embedding"))
    lt.upsert_ivf_index(batch, path)
    dels = spark.createDataFrame([(7,), (13,)], "vec_id long")
    lt.delete_from_ivf_index(dels, path)

    end_state = (
        emb.filter(F.col("vec_id") < 480)
        .filter(F.col("vec_id") % 10 != 3)
        .select("vec_id", "embedding")
        .unionByName(batch)
        .filter(~F.col("vec_id").isin(7, 13))
    )
    n_cells = int(spark.read.json(f"{path}/meta").collect()[0]["n_cells"])
    q = emb.filter(F.col("vec_id") < 20)
    got = lt.ann_topk_ivf_indexed(spark, path, q, k=5, n_probe=n_cells)
    want = lt.ann_topk(q, end_state, vector_col="embedding", k=5,
                       mode="exact_cross")
    assert sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in got.collect()
    ) == sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in want.collect()
    )
