"""Skew-cap observability + recall-preserving salted joins.

The "no silent caps" contract: every candidate-dropping skew guard
(minhash/simhash hot buckets, semdedup hot cells, event-per-user caps,
pagerank degree prune) has (a) an exact drop-count observable and
(b) where the op is a self-join, a recall-preserving ``'salt'`` mode
whose output is bit-identical to the uncapped plan while per-task join
work stays bounded (triangle-salted sub-buckets — see
operators/dedup._cap_buckets).
"""

import pytest
from pyspark.sql import functions as F

from linktransformer_spark.operators.dedup import (
    bucket_cap_stats,
    minhash_cap_stats,
    near_dup_pairs_minhash,
    near_dup_pairs_semdedup,
    near_dup_pairs_simhash,
    simhash_cap_stats,
)
from linktransformer_spark.operators.eventpipe import event_cap_stats
from linktransformer_spark.operators.graph import degree_prune_stats


HOT = 40  # identical copies -> one size-40 bucket in EVERY band/block


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again")
            for i in range(HOT)]
    rows += [(100 + i,
              f"unique document number {i} with content about topic {i % 7} "
              f"and extra words {i * 13}")
             for i in range(60)]
    rows += [(200 + i,
              f"unique document number {i} with content about topic {i % 7} "
              f"and extra words {i * 13} suffix")
             for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_key(rows):
    return sorted((r.src, r.dst) for r in rows)


class TestSaltedMinhash:
    def test_salt_equals_uncapped_drop_loses(self, skewed_docs):
        unc = near_dup_pairs_minhash(
            skewed_docs, "text", "doc_id", threshold=0.5
        ).collect()
        drop = near_dup_pairs_minhash(
            skewed_docs, "text", "doc_id", threshold=0.5, max_bucket_size=8
        ).collect()
        salt = near_dup_pairs_minhash(
            skewed_docs, "text", "doc_id", threshold=0.5, max_bucket_size=8,
            hot_bucket="salt",
        ).collect()
        assert _pairs_key(salt) == _pairs_key(unc)
        # jaccard values identical too (same verify stage)
        ju = sorted((r.src, r.dst, r.jaccard) for r in unc)
        js = sorted((r.src, r.dst, r.jaccard) for r in salt)
        assert js == ju
        assert len(drop) < len(unc)  # the silent trade salt avoids

    def test_salt_noop_when_under_cap(self, skewed_docs):
        unc = near_dup_pairs_minhash(
            skewed_docs, "text", "doc_id", threshold=0.5
        ).collect()
        salt = near_dup_pairs_minhash(
            skewed_docs, "text", "doc_id", threshold=0.5,
            max_bucket_size=10_000, hot_bucket="salt",
        ).collect()
        assert _pairs_key(salt) == _pairs_key(unc)

    def test_bad_mode_raises(self, skewed_docs):
        with pytest.raises(ValueError, match="hot_bucket"):
            near_dup_pairs_minhash(
                skewed_docs, "text", "doc_id", max_bucket_size=8,
                hot_bucket="oops",
            ).collect()


class TestSaltedSimhash:
    def test_salt_equals_uncapped(self, skewed_docs):
        unc = near_dup_pairs_simhash(
            skewed_docs, "text", "doc_id", hamming_threshold=3
        ).collect()
        salt = near_dup_pairs_simhash(
            skewed_docs, "text", "doc_id", hamming_threshold=3,
            max_bucket_size=8, hot_bucket="salt",
        ).collect()
        ku = sorted((r.src, r.dst, r.hamming) for r in unc)
        ks = sorted((r.src, r.dst, r.hamming) for r in salt)
        assert ks == ku


class TestSaltedSemdedup:
    def test_hot_cell_salt_equals_uncapped(self, spark):
        import math

        # 3 clusters of 30 near-identical unit vectors in 8-d
        rows = []
        for c in range(3):
            for i in range(30):
                v = [0.0] * 8
                v[c] = 1.0
                v[(c + 3) % 8] = 0.01 * i  # slight spread
                n = math.sqrt(sum(x * x for x in v))
                rows.append((c * 100 + i, [x / n for x in v]))
        df = spark.createDataFrame(rows, "doc_id long, emb array<double>")
        unc = near_dup_pairs_semdedup(
            df, "emb", "doc_id", threshold=0.9, n_cells=3
        ).collect()
        salt = near_dup_pairs_semdedup(
            df, "emb", "doc_id", threshold=0.9, n_cells=3,
            max_cell_size=7, hot_cell="salt",
        ).collect()
        ku = sorted((r.src, r.dst, round(r.cosine, 9)) for r in unc)
        ks = sorted((r.src, r.dst, round(r.cosine, 9)) for r in salt)
        assert len(unc) > 0
        assert ks == ku
        # drop mode on the same cap removes whole cells
        drop = near_dup_pairs_semdedup(
            df, "emb", "doc_id", threshold=0.9, n_cells=3, max_cell_size=7
        ).collect()
        assert len(drop) < len(unc)


class TestCapStats:
    def test_minhash_stats_exact(self, skewed_docs):
        # 40 identical docs -> every one of the 8 bands has exactly one
        # hot bucket of size 40; cap=8 drops all 8.
        st = minhash_cap_stats(
            skewed_docs, "text", "doc_id", max_bucket_size=8
        ).collect()[0]
        assert st.buckets_dropped == 8
        assert st.rows_dropped == 8 * HOT
        assert st.pairs_dropped == 8 * (HOT * (HOT - 1) // 2)
        # salt cost: k = ceil(40/8) = 5 -> 40*5 - 40 = 160 extra per band
        assert st.salt_extra_rows == 8 * (HOT * 5 - HOT)

    def test_minhash_stats_noop_corpus(self, spark):
        # no shared shingles at all -> every band bucket has size 1
        df = spark.createDataFrame(
            [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(30)],
            "doc_id long, text string",
        )
        st = minhash_cap_stats(
            df, "text", "doc_id", max_bucket_size=5
        ).collect()[0]
        assert st.pairs_dropped == 0 and st.buckets_dropped == 0

    def test_simhash_stats_nonzero(self, skewed_docs):
        st = simhash_cap_stats(
            skewed_docs, "text", "doc_id", max_bucket_size=8
        ).collect()[0]
        # 4 pigeonhole blocks, each with a size-40 hot bucket at least
        assert st.buckets_dropped >= 4
        assert st.pairs_dropped >= 4 * (HOT * (HOT - 1) // 2)

    def test_generic_bucket_cap_stats(self, spark):
        df = spark.createDataFrame(
            [(i, i % 3) for i in range(10)], "id long, b long"
        )
        st = bucket_cap_stats(df, ["b"], cap=3).collect()[0]
        # sizes: b=0 -> 4 rows (hot), b=1 -> 3, b=2 -> 3
        assert st.buckets_total == 3
        assert st.buckets_dropped == 1
        assert st.rows_dropped == 4
        assert st.pairs_dropped == 6
        assert st.salt_extra_rows == 4  # k=2 -> 4*2 - 4


class TestEventCapStats:
    def test_exact_counts(self, spark):
        rows = [(f"u{u}", "click") for u in range(5) for _ in range((u + 1) * 2)]
        df = spark.createDataFrame(rows, "user_id string, event_type string")
        st = event_cap_stats(df, "user_id", max_events_per_user=5).collect()[0]
        # counts per user: 2,4,6,8,10 -> capped users: 3 (6,8,10)
        assert st.users_total == 5
        assert st.users_capped == 3
        assert st.events_dropped == (6 - 5) + (8 - 5) + (10 - 5)
        assert st.max_user_events == 10

    def test_type_filter_matches_funnel_view(self, spark):
        rows = [("u1", "view")] * 10 + [("u1", "buy")] * 2 + [("u2", "view")] * 3
        df = spark.createDataFrame(rows, "user_id string, event_type string")
        st = event_cap_stats(
            df, "user_id", max_events_per_user=4,
            type_col="event_type", types=["view"],
        ).collect()[0]
        assert st.users_total == 2
        assert st.users_capped == 1
        assert st.events_dropped == 6

    def test_validates_cap(self, spark):
        df = spark.createDataFrame([("u", "x")], "user_id string, event_type string")
        with pytest.raises(ValueError):
            event_cap_stats(df, "user_id", max_events_per_user=0)


class TestDegreePruneStats:
    def test_exact_counts(self, spark):
        # hub node 0 has in-degree 6; every other node in-degree <= 1
        edges = [(s, 0) for s in range(1, 7)] + [(1, 2), (2, 3), (7, 8)]
        df = spark.createDataFrame(edges, "src long, dst long")
        st = degree_prune_stats(
            df, "src", "dst", max_in_degree=4, max_out_degree=100
        ).collect()[0]
        assert st.edges_total == 9
        assert st.edges_after_in_prune == 7  # hub keeps 4 of 6
        assert st.edges_after_out_prune == 7
        assert st.in_nodes_pruned == 1
        assert st.out_nodes_pruned == 0
        assert st.max_in_degree_seen == 6
        assert st.max_out_degree_seen == 2  # nodes 1 and 2 emit two edges

    def test_parallel_edges_presummed(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (1, 2), (1, 3)], "src long, dst long"
        )
        st = degree_prune_stats(df).collect()[0]
        assert st.edges_total == 2  # (1,2) pre-summed
        assert st.max_out_degree_seen == 2


class TestSaltedAgainstJoin:
    def test_two_sided_salt_equals_uncapped(self, spark):
        from linktransformer_spark.operators.dedup import (
            near_dup_pairs_minhash_against,
        )

        boiler = "the quick brown fox jumps over the lazy dog again and again"
        seen = spark.createDataFrame(
            [(i, boiler) for i in range(25)]
            + [(100 + i, f"seen doc {i} about topic {i % 5} words {i * 7}")
               for i in range(30)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1000 + i, boiler + (" tail" if i % 2 else ""))
             for i in range(20)]
            + [(2000 + i, f"seen doc {i} about topic {i % 5} words {i * 7}")
               for i in range(10)],
            "doc_id long, text string",
        )
        kw = dict(on="text", id_col="doc_id", threshold=0.5)
        unc = near_dup_pairs_minhash_against(new, seen, **kw).collect()
        drop = near_dup_pairs_minhash_against(
            new, seen, max_bucket_size=6, **kw
        ).collect()
        salt = near_dup_pairs_minhash_against(
            new, seen, max_bucket_size=6, hot_bucket="salt", **kw
        ).collect()
        key = lambda rs: sorted((r.src, r.dst, round(r.jaccard, 9)) for r in rs)
        assert len(unc) > 0
        assert key(salt) == key(unc)
        assert len(drop) < len(unc)

    def test_two_sided_bad_mode(self, spark):
        from linktransformer_spark.operators.dedup import (
            near_dup_pairs_minhash_against,
        )

        df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
        with pytest.raises(ValueError, match="hot_bucket"):
            near_dup_pairs_minhash_against(
                df, df, on="text", id_col="doc_id",
                max_bucket_size=2, hot_bucket="nope",
            ).collect()

    def test_dedup_against_salted_filters_same_rows(self, spark):
        from linktransformer_spark.operators.dedup import dedup_against

        boiler = "spam spam spam lovely spam wonderful spam spam spam"
        seen = spark.createDataFrame(
            [(i, boiler) for i in range(20)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(100, boiler), (101, "a genuinely fresh document here")],
            "doc_id long, text string",
        )
        kw = dict(on="text", id_col="doc_id", threshold=0.8)
        unc = {r.doc_id for r in dedup_against(new, seen, **kw).collect()}
        slt = {r.doc_id for r in dedup_against(
            new, seen, max_bucket_size=4, hot_bucket="salt", **kw
        ).collect()}
        drp = {r.doc_id for r in dedup_against(
            new, seen, max_bucket_size=4, **kw
        ).collect()}
        assert unc == {101} and slt == {101}
        # drop mode loses the hot bucket -> the boilerplate dup SURVIVES
        assert drp == {100, 101}


class TestJaccardSemdedupStats:
    def test_jaccard_stats_exact(self, spark):
        from linktransformer_spark.operators.dedup import jaccard_cap_stats

        # shingle "a b c" appears in all 12 docs (df=12, hot at cap=10);
        # every doc also has one private shingle (df=1)
        rows = [(i, f"a b c priv{i} x{i} y{i}") for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        st = jaccard_cap_stats(
            df, "text", "doc_id", shingle=3, max_shingle_freq=10
        ).collect()[0]
        # 3-gram shingles per doc: "a b c", "b c privI", "c privI xI",
        # "privI xI yI" -> only "a b c" is shared
        assert st.buckets_dropped == 1
        assert st.rows_dropped == 12
        assert st.pairs_dropped == 12 * 11 // 2

    def test_semdedup_stats_match_cap_behavior(self, spark):
        import math

        from linktransformer_spark.operators.dedup import semdedup_cap_stats

        # interleaved ids so the 3 smallest-id seed centroids land one
        # per cluster (ids 0,1,2 = clusters 0,1,2)
        rows = []
        for c in range(3):
            for i in range(30):
                v = [0.0] * 8
                v[c] = 1.0
                v[(c + 3) % 8] = 0.01 * i
                n = math.sqrt(sum(x * x for x in v))
                rows.append((i * 3 + c, [x / n for x in v]))
        df = spark.createDataFrame(rows, "doc_id long, emb array<double>")
        st = semdedup_cap_stats(
            df, "emb", "doc_id", n_cells=3, max_cell_size=7
        ).collect()[0]
        # 3 cells of 30 rows each, all hot at cap=7
        assert st.buckets_total == 3
        assert st.buckets_dropped == 3
        assert st.rows_dropped == 90
        assert st.pairs_dropped == 3 * (30 * 29 // 2)


class TestSaltedIndexIngest:
    def test_index_salt_equals_uncapped(self, spark, tmp_path):
        from linktransformer_spark.operators.dedup import (
            near_dup_pairs_minhash_against_index,
            save_minhash_index,
        )

        boiler = "spam spam spam lovely spam wonderful spam spam spam"
        seen = spark.createDataFrame(
            [(i, boiler) for i in range(20)]
            + [(50 + i, f"indexed doc {i} topic {i % 4} words {i * 11}")
               for i in range(15)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "mh_idx")
        save_minhash_index(seen, path, on="text", id_col="doc_id",
                           num_hashes=24, bands=8, shingle=3)
        new = spark.createDataFrame(
            [(100 + i, boiler + (" tail" if i % 2 else ""))
             for i in range(10)],
            "doc_id long, text string",
        )
        kw = dict(on="text", id_col="doc_id", threshold=0.5)
        unc = near_dup_pairs_minhash_against_index(new, path, **kw).collect()
        salt = near_dup_pairs_minhash_against_index(
            new, path, max_bucket_size=4, hot_bucket="salt", **kw
        ).collect()
        drop = near_dup_pairs_minhash_against_index(
            new, path, max_bucket_size=4, **kw
        ).collect()
        key = lambda rs: sorted((r.src, r.dst, round(r.jaccard, 9)) for r in rs)
        assert len(unc) > 0
        assert key(salt) == key(unc)
        assert len(drop) < len(unc)


class TestSaltedAnnLsh:
    def test_ann_lsh_salt_equals_uncapped(self, spark):
        import linktransformer_spark as lt

        # 60 near-identical vectors (one hot sign-bucket) + 40 spread
        rows = []
        for i in range(60):
            v = [1.0, 0.5, 0.25, 0.125] + [0.001 * i] * 4
            rows.append((i, v))
        for i in range(40):
            v = [(-1.0) ** j * (0.1 + 0.01 * ((i * 7 + j) % 13))
                 for j in range(8)]
            rows.append((100 + i, v))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kw = dict(k=5, mode="lsh_hyperplane", dim=8, n_planes=5)
        unc = lt.ann_topk(df, df, **kw).collect()
        salt = lt.ann_topk(df, df, max_bucket_size=8, **kw).collect()
        key = lambda rs: sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.score, 9)) for r in rs
        )
        assert key(salt) == key(unc)
        # drop mode empties the hot bucket's queries
        drop = lt.ann_topk(df, df, max_bucket_size=8, hot_bucket="drop",
                           **kw).collect()
        assert len(drop) < len(unc)
        with pytest.raises(ValueError, match="hot_bucket"):
            lt.ann_topk(df, df, max_bucket_size=8, hot_bucket="x",
                        **kw).collect()

    def test_ann_lsh_salt_with_multiprobe(self, spark):
        import linktransformer_spark as lt

        rows = [(i, [1.0, 0.5, 0.25, 0.125, 0.0, 0.0, 0.0, 0.001 * i])
                for i in range(40)]
        rows += [(100 + i, [(-1.0) ** j * (0.1 + 0.01 * ((i * 5 + j) % 11))
                            for j in range(8)]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kw = dict(k=3, mode="lsh_hyperplane", dim=8, n_planes=5, multi_probe=2)
        unc = lt.ann_topk(df, df, **kw).collect()
        salt = lt.ann_topk(df, df, max_bucket_size=6, **kw).collect()
        key = lambda rs: sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.score, 9)) for r in rs
        )
        assert key(salt) == key(unc)


class TestCapValidation:
    """cap < 1 must raise, not silently drop every banded row (cap=0
    makes the ceil-div null under non-ANSI x DIV 0 -> null salts ->
    explode(null) emits nothing)."""

    def test_salt_cap_zero_raises(self, skewed_docs):
        with pytest.raises(ValueError, match=">= 1"):
            near_dup_pairs_minhash(
                skewed_docs, "text", "doc_id", threshold=0.5,
                max_bucket_size=0, hot_bucket="salt",
            )

    def test_drop_cap_zero_raises(self, skewed_docs):
        with pytest.raises(ValueError, match=">= 1"):
            near_dup_pairs_minhash(
                skewed_docs, "text", "doc_id", threshold=0.5,
                max_bucket_size=0, hot_bucket="drop",
            )

    def test_two_sided_salt_cap_zero_raises(self, spark):
        from linktransformer_spark.operators.dedup import (
            near_dup_pairs_minhash_against,
        )

        df = spark.createDataFrame(
            [(1, "some document text here")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match=">= 1"):
            near_dup_pairs_minhash_against(
                df, df, "text", "doc_id",
                max_bucket_size=0, hot_bucket="salt",
            )


class TestStatsEdgeCases:
    def test_degree_prune_stats_empty_edges(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        st = degree_prune_stats(df).collect()[0]
        assert st.edges_total == 0
        assert st.edges_after_in_prune == 0
        assert st.edges_after_out_prune == 0
        assert st.in_nodes_pruned == 0
        assert st.out_nodes_pruned == 0
        assert st.max_in_degree_seen == 0
        assert st.max_out_degree_seen == 0

    def test_event_cap_stats_lone_type_arg_raises(self, spark):
        df = spark.createDataFrame(
            [("u", "x")], "user_id string, event_type string"
        )
        with pytest.raises(ValueError, match="together"):
            event_cap_stats(df, "user_id", type_col="event_type")
        with pytest.raises(ValueError, match="together"):
            event_cap_stats(df, "user_id", types=["x"])
