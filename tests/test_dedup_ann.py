"""Dedup suite + ANN invariants (north-star extensions)."""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


@pytest.fixture(scope="module")
def docs_aug(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 100)
    dup = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(dup)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "a"), (2, "a"), (9, "b"), (1, "b"), (7, "c")], ["id", "txt"]
    )
    out = lt.dedup_exact(df, on="txt", id_col="id")
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 7]


def test_minhash_near_dups_found_and_removed(docs_aug):
    pairs = lt.near_dup_pairs_minhash(
        docs_aug, on="text", id_col="doc_id", threshold=0.6,
        num_hashes=24, bands=8, shingle=3,
    )
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    # every planted near-dup pair must be found (jaccard ~0.95, and with
    # 8 bands x 3 rows the LSH miss probability is negligible)
    planted = {(i, i + 1000000) for i in range(100)}
    assert planted <= got
    deduped = lt.dedup_minhash(
        docs_aug, on="text", id_col="doc_id", threshold=0.6,
        num_hashes=24, bands=8, shingle=3,
    )
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    # every planted copy has its original (smaller id, jaccard ~0.95) in
    # its component -> no copy can be a component min -> all removed.
    # (Originals CAN be removed too: synthetic docs share vocabulary, so
    # original-original pairs above the threshold chain components.)
    assert all(i + 1000000 not in kept for i in range(100))
    assert kept and kept <= set(range(100))


def test_simhash_pigeonhole_completeness(spark, docs_aug):
    # the block trick must find EXACTLY the brute-force hamming<=k set
    # (pigeonhole guarantees no false negatives; verification removes
    # false positives). NB short docs flip many bits from one extra
    # token, so planted copies mostly land ABOVE hamming 3 — that's
    # simhash semantics, not a bug; minhash is the short-doc tool.
    from linktransformer_spark.operators.dedup import shingle_hashes64, simhash64

    pairs = lt.near_dup_pairs_simhash(
        docs_aug, on="text", id_col="doc_id", hamming_threshold=3
    )
    got = {(r["src"], r["dst"]) for r in pairs.collect()}

    sim = docs_aug.select(
        F.col("doc_id").alias("id"),
        shingle_hashes64(F.col("text")).alias("_h"),
    ).select("id", simhash64(F.col("_h")).alias("s"))
    l, r = sim.alias("l"), sim.alias("r")
    brute = (
        l.join(r, F.col("l.id") < F.col("r.id"))
        .withColumn("h", F.bit_count(F.col("l.s").bitwiseXOR(F.col("r.s"))))
        .filter(F.col("h") <= 3)
    )
    want = {(x[0], x[1]) for x in brute.select(F.col("l.id"), F.col("r.id")).collect()}
    assert got == want


def test_jaccard_exact_pairs_symmetric_threshold(docs_aug):
    pairs = lt.near_dup_pairs_jaccard(
        docs_aug, on="text", id_col="doc_id", threshold=0.6, shingle=3
    )
    rows = pairs.collect()
    assert all(r["jaccard"] >= 0.6 for r in rows)
    assert all(r["src"] < r["dst"] for r in rows)
    planted = {(i, i + 1000000) for i in range(100)}
    assert planted <= {(r["src"], r["dst"]) for r in rows}


def test_embedding_neardup_and_dedup(emb):
    sub = emb.filter(F.col("vec_id") < 200)
    pairs = lt.near_dup_pairs_embedding(sub, "embedding", "vec_id", threshold=0.7)
    rows = pairs.collect()
    assert all(r["cosine"] >= 0.7 for r in rows)
    deduped = lt.dedup_embedding(sub, "embedding", "vec_id", threshold=0.7)
    # survivors = all rows minus the non-min members of each component
    removed = (
        lt.connected_components(pairs)
        .filter(F.col("component") != F.col("node"))
        .count()
    )
    assert deduped.count() == sub.count() - removed


def test_ann_broadcast_matches_exact(emb):
    q = emb.filter(F.col("vec_id") < 20)
    a = lt.ann_topk(q, emb, k=5, mode="exact_cross").select(
        "query_id", "neighbor_id", "rank"
    )
    b = lt.ann_topk(q, emb, k=5, mode="broadcast_knn").select(
        "query_id", "neighbor_id", "rank"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ann_lsh_self_is_top1(emb):
    q = emb.filter(F.col("vec_id") < 20)
    out = lt.ann_topk(q, emb, k=3, mode="lsh_hyperplane", dim=64, n_planes=8)
    top1 = out.filter(F.col("rank") == 1)
    # every query shares its bucket with itself -> top1 must be itself
    bad = top1.filter(F.col("query_id") != F.col("neighbor_id")).count()
    assert bad == 0


def test_analyze_documents_columns(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lt.analyze_documents(docs)
    for c in ("lang_id", "quality", "n_tokens", "n_subwords", "fingerprint"):
        assert c in out.columns
    row = out.first()
    assert 0.0 <= row["quality"] <= 1.0
    assert row["n_tokens"] > 0


def test_ivf_recall_and_determinism(spark, sf_dir):
    from linktransformer_spark.operators.ann import ann_topk, ivf_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact = ann_topk(q, emb, vector_col="embedding", k=5, mode="exact_cross")
    approx = ivf_topk(q, emb, vector_col="embedding", k=5, n_cells=16, n_probe=8)

    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.85, f"IVF recall@5 {recall:.3f} < 0.85"

    # determinism: a second build returns the identical pair set
    a2 = {(r["query_id"], r["neighbor_id"])
          for r in ivf_topk(q, emb, vector_col="embedding", k=5, n_cells=16, n_probe=8).collect()}
    assert a == a2


def test_ivf_seeded_recall_and_shape(spark, sf_dir):
    from linktransformer_spark.operators.ann import ann_topk, ivf_topk_seeded
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact = ann_topk(q, emb, vector_col="embedding", k=5, mode="exact_cross")
    approx = ivf_topk_seeded(q, emb, vector_col="embedding", k=5,
                             n_cells=16, n_probe=4)

    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    rows = approx.collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in rows}
    # seed centroids trade recall for checkability; still demand a floor
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"seeded IVF recall@5 {recall:.3f} < 0.5"
    # every query keeps at most k ranked neighbors, ranks 1..n contiguous
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    from linktransformer_spark.operators.ann import ann_topk, ivf_pq_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk(q, emb, k=5, mode="exact_cross").collect()}

    kw = dict(n_cells=16, m=8, n_codes=16, dim=64)
    direct = {(r["query_id"], r["neighbor_id"])
              for r in ivf_pq_topk(q, emb, k=5, n_probe=4, **kw).collect()}
    # seeded codebooks + ADC: modest direct recall by design — the
    # floor guards against structural regressions, not quality
    assert len(exact & direct) / len(exact) >= 0.25

    # the standard chaser: retrieve wide with ADC, exact re-rank after.
    # candidate recall of the true top-5 inside ADC top-64 must be high
    wide = {(r["query_id"], r["neighbor_id"])
            for r in ivf_pq_topk(q, emb, k=64, n_probe=8, **kw).collect()}
    assert len(exact & wide) / len(exact) >= 0.65

    again = {(r["query_id"], r["neighbor_id"])
             for r in ivf_pq_topk(q, emb, k=5, n_probe=4, **kw).collect()}
    assert direct == again


def test_ivfpq_rerank_beats_direct_and_scores_exact(spark, sf_dir):
    from linktransformer_spark.operators.ann import (
        ann_topk, ivf_pq_rerank_topk, ivf_pq_topk,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact_rows = ann_topk(q, emb, k=5, mode="exact_cross").collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"]
                    for r in exact_rows}

    kw = dict(n_cells=16, n_probe=4, m=8, n_codes=16, dim=64)
    direct = {(r["query_id"], r["neighbor_id"])
              for r in ivf_pq_topk(q, emb, k=5, **kw).collect()}
    rr_rows = ivf_pq_rerank_topk(q, emb, k=5, retrieve_k=40, **kw).collect()
    rr = {(r["query_id"], r["neighbor_id"]) for r in rr_rows}

    r_direct = len(exact & direct) / len(exact)
    r_rerank = len(exact & rr) / len(exact)
    assert r_rerank >= r_direct  # re-rank can only fix ADC ordering
    assert r_rerank >= 0.5
    # survivors carry EXACT cosine scores, not ADC approximations
    for r in rr_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-12


def test_ivfpq_bad_dim(spark, sf_dir):
    from linktransformer_spark.operators.ann import ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        ivf_pq_topk(emb, emb, k=5, m=7, dim=64)


def test_dedup_against_filters_only_cross_matches(spark):
    import linktransformer_spark as lt

    seen = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river"),
         (2, "completely unrelated corpus text about stars and planets")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog near the river bank"),
         (11, "fresh new document about cooking pasta with garlic and oil"),
         # within-batch dup of 11 — must SURVIVE (cross-dedup only)
         (12, "fresh new document about cooking pasta with garlic and oil")],
        "doc_id long, text string")
    kw = dict(on="text", id_col="doc_id", threshold=0.5,
              num_hashes=24, bands=8, shingle=2)

    pairs = lt.near_dup_pairs_minhash_against(new, seen, **kw)
    assert {(r.src, r.dst) for r in pairs.collect()} == {(10, 1)}

    kept = {r.doc_id for r in lt.dedup_against(new, seen, **kw).collect()}
    assert kept == {11, 12}


def test_minhash_hot_bucket_cap_drops_pathological_buckets(spark):
    import linktransformer_spark as lt

    # 6 identical docs (one hot bucket) + 2 near-dup docs
    rows = [(i, "common boilerplate text repeated everywhere") for i in range(6)]
    rows += [(10, "a quite unique document about owls and rivers"),
             (11, "a quite unique document about owls and rivers today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(on="text", id_col="doc_id", threshold=0.5,
              num_hashes=24, bands=8, shingle=2)
    uncapped = lt.near_dup_pairs_minhash(df, **kw)
    capped = lt.near_dup_pairs_minhash(df, max_bucket_size=3, **kw)
    un = {(r.src, r.dst) for r in uncapped.collect()}
    cp = {(r.src, r.dst) for r in capped.collect()}
    # the identical-doc clique (15 pairs) exceeds the cap and is dropped
    assert (0, 1) in un and (0, 1) not in cp
    # pairs found through small buckets survive
    assert (10, 11) in un and (10, 11) in cp
    assert cp <= un


def test_jaccard_shingle_freq_cap_is_lower_bound(spark):
    import linktransformer_spark as lt

    rows = [(i, f"the the the unique{i}") for i in range(5)]
    rows += [(10, "owls rivers owls rivers x"), (11, "owls rivers owls rivers y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(on="text", id_col="doc_id", threshold=0.3, shingle=1)
    un = {(r.src, r.dst): r.jaccard for r in lt.near_dup_pairs_jaccard(df, **kw).collect()}
    cp = {(r.src, r.dst): r.jaccard for r in lt.near_dup_pairs_jaccard(
        df, max_shingle_freq=4, **kw).collect()}
    # capped pairs are a subset with jaccard <= uncapped (lower bound)
    assert set(cp) <= set(un)
    for k, v in cp.items():
        assert v <= un[k] + 1e-12
    # the "the"-only pairs (shared shingle in 5 docs > cap) vanish
    assert (0, 1) in un and (0, 1) not in cp
    # small-frequency shingle pairs survive
    assert (10, 11) in cp


def test_embedding_lsh_pairs_subset_of_exact(spark, sf_dir):
    """BucketedRandomProjectionLSH candidates are re-scored with the
    exact cosine, so the lsh mode can MISS pairs but never invent or
    mis-score one: pairs(lsh) ⊆ pairs(exact) with identical scores."""
    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    exact = {(r.src, r.dst): round(r.cosine, 9)
             for r in lt.near_dup_pairs_embedding(
                 emb, "embedding", "vec_id", threshold=0.4).collect()}
    lsh = {(r.src, r.dst): round(r.cosine, 9)
           for r in lt.near_dup_pairs_embedding(
               emb, "embedding", "vec_id", threshold=0.4, mode="lsh").collect()}
    assert lsh, "lsh mode found no pairs at all"
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9


def test_cluster_rows_lsh_mode_refines_exact(spark, sf_dir):
    """SLINK clustering over LSH-prefiltered edges: the edge set is a
    subset of the exact ε-graph, so every LSH cluster must sit inside
    one exact cluster (a refinement — LSH can split, never merge)."""
    import linktransformer_spark as lt
    from linktransformer_spark.encoders.precomputed import PrecomputedEncoder
    from linktransformer_spark.operators.knn_join import CosineScorer
    from linktransformer_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    # threshold is cosine DISTANCE eps: 0.6 -> similarity >= 0.4 (the
    # same similarity level the pairs test above finds matches at)
    kw = dict(model=CosineScorer(PrecomputedEncoder("embedding")),
              on="vec_id", cluster_type="SLINK",
              cluster_params={"threshold": 0.6}, id_col="vec_id")
    exact = {r.vec_id: r.cluster for r in lt.cluster_rows(emb, **kw).collect()}
    lsh = {r.vec_id: r.cluster for r in lt.cluster_rows(emb, mode="lsh", **kw).collect()}
    assert set(lsh) == set(exact)
    # refinement: two rows in the same LSH cluster (non-noise) must be
    # in the same exact cluster
    from collections import defaultdict

    groups = defaultdict(list)
    for vid, c in lsh.items():
        if c != -1:
            groups[c].append(vid)
    assert any(len(g) > 1 for g in groups.values())
    for members in groups.values():
        assert len({exact[m] for m in members}) == 1


def test_minhash_index_round_trip_equals_direct(spark, sf_dir, tmp_path):
    """save_minhash_index + near_dup_pairs_minhash_against_index must
    emit exactly the rows of the direct text-vs-text against path (the
    family parameters travel in the index metadata)."""
    from pyspark.sql import functions as F

    import linktransformer_spark as lt
    from linktransformer_spark.sources.tables import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    seen = d.filter(F.col("doc_id") < 100)
    new = d.filter(F.col("doc_id") >= 100).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    ).unionByName(
        seen.limit(20).select((F.col("doc_id") + 900000).alias("doc_id"),
                              F.concat("text", F.lit(" tail")).alias("text"))
    )
    kw = dict(num_hashes=24, bands=8, shingle=3, word=True)
    path = str(tmp_path / "idx")
    lt.save_minhash_index(seen, path, on="text", id_col="doc_id", **kw)

    direct = {
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against(
            new, seen, on="text", id_col="doc_id", threshold=0.5, **kw
        ).collect()
    }
    from_index = {
        (r.src, r.dst, round(r.jaccard, 9))
        for r in lt.near_dup_pairs_minhash_against_index(
            new, path, on="text", id_col="doc_id", threshold=0.5
        ).collect()
    }
    assert from_index == direct and len(from_index) > 0


def test_minhash_index_version_gate(spark, tmp_path):
    import json
    import os

    import linktransformer_spark as lt

    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    path = str(tmp_path / "idx")
    lt.save_minhash_index(df, path, on="text", id_col="doc_id")
    # corrupt the version
    meta_dir = os.path.join(path, "meta")
    f = [x for x in os.listdir(meta_dir) if x.endswith(".json")][0]
    row = json.loads(open(os.path.join(meta_dir, f)).read())
    row["version"] = 999
    open(os.path.join(meta_dir, f), "w").write(json.dumps(row))
    crc = os.path.join(meta_dir, f".{f}.crc")
    if os.path.exists(crc):  # hadoop local-fs checksum sidecar
        os.remove(crc)
    import pytest

    with pytest.raises(ValueError, match="version"):
        lt.near_dup_pairs_minhash_against_index(
            df, path, on="text", id_col="doc_id")


def test_minhash_index_append_family_guard(spark, tmp_path):
    import pytest

    import linktransformer_spark as lt

    a = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "a b c d e f g")], ["doc_id", "text"])
    path = str(tmp_path / "idx")
    lt.save_minhash_index(a, path, on="text", id_col="doc_id", bands=8)
    with pytest.raises(ValueError, match="cannot append"):
        lt.save_minhash_index(b, path, on="text", id_col="doc_id",
                              bands=6, mode="append")
    # same family appends fine and the index covers both batches
    lt.save_minhash_index(b, path, on="text", id_col="doc_id",
                          bands=8, mode="append")
    hits = lt.near_dup_pairs_minhash_against_index(
        spark.createDataFrame([(9, "a b c d e f")], ["doc_id", "text"]),
        path, on="text", id_col="doc_id", threshold=0.5,
    ).collect()
    assert {r.dst for r in hits} == {1, 2}


def test_semdedup_ncells1_equals_global_dedup(emb):
    """With one cell SemDeDup degenerates to the global exact threshold
    dedup — same survivors as dedup_embedding."""
    a = lt.semantic_dedup(emb, "embedding", "vec_id", threshold=0.4, n_cells=1)
    b = lt.dedup_embedding(emb, "embedding", "vec_id", threshold=0.4)
    ai = sorted(r["vec_id"] for r in a.select("vec_id").collect())
    bi = sorted(r["vec_id"] for r in b.select("vec_id").collect())
    assert ai == bi and len(ai) > 0


def test_semdedup_pairs_within_cell_and_subset_of_exact(emb):
    """Every SemDeDup pair is a genuine cosine>=t pair (subset of the
    exact global pair set), and both endpoints share the emitted cell."""
    pairs = lt.near_dup_pairs_semdedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=16
    ).collect()
    assert len(pairs) > 0
    exact = {
        (r["src"], r["dst"])
        for r in lt.near_dup_pairs_embedding(
            emb, "embedding", "vec_id", threshold=0.3
        ).collect()
    }
    for r in pairs:
        assert (r["src"], r["dst"]) in exact
        assert r["src"] < r["dst"]
        assert r["cosine"] >= 0.3


def test_semdedup_survivors_are_min_ids(emb):
    """Dropped rows always have a surviving smaller-id near-dup witness
    chain: the kept row per component is the component's min id."""
    kept = {r["vec_id"] for r in
            lt.semantic_dedup(emb, "embedding", "vec_id",
                              threshold=0.3, n_cells=16).collect()}
    pairs = lt.near_dup_pairs_semdedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=16
    ).collect()
    dropped = {r["vec_id"] for r in emb.collect()} - kept
    assert dropped  # threshold chosen so some dedup happens
    # every dropped id appears in at least one pair with a smaller id
    # somewhere in its component; weaker local check: it appears in a pair
    in_pair = {r["src"] for r in pairs} | {r["dst"] for r in pairs}
    assert dropped <= in_pair


def test_dedup_keep_by_selects_longest_not_min_id(docs_aug):
    """keep_by=length(text) must keep the longer near-dup copy (the
    +1000000 augmented ids), where the default min-id rule keeps the
    original; pass-through rows are identical in both."""
    kept_def = {r["doc_id"] for r in
                lt.dedup_minhash(docs_aug, on="text", id_col="doc_id",
                                 threshold=0.6).collect()}
    kept_best = {r["doc_id"] for r in
                 lt.dedup_minhash(docs_aug, on="text", id_col="doc_id",
                                  threshold=0.6,
                                  keep_by=F.length("text")).collect()}
    assert len(kept_def) == len(kept_best)  # one survivor per component
    # the default keeps originals; keep_by=len keeps the ' tail' copies
    dup_survivors = {i for i in kept_best if i >= 1000000}
    assert dup_survivors  # at least some components flipped survivor
    assert not {i for i in kept_def if i >= 1000000} & dup_survivors


def test_dedup_by_pairs_tie_breaks_on_min_id(spark):
    df = spark.createDataFrame(
        [(3, "aa", 5.0), (1, "bb", 5.0), (9, "cc", 2.0)], ["id", "t", "q"]
    )
    pairs = spark.createDataFrame([(1, 3), (3, 9)], ["src", "dst"])
    out = lt.dedup_by_pairs(df, pairs, id_col="id", keep_by="q")
    assert [r["id"] for r in out.collect()] == [1]  # q tie 5.0 -> min id wins


def test_semdedup_cell_cap_bounds_pairs(emb):
    """max_cell_size drops pathological cells wholesale: capped pairs
    are a subset of uncapped, and a cap of 1 yields no pairs at all."""
    full = {(r["src"], r["dst"]) for r in lt.near_dup_pairs_semdedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=16).collect()}
    capped = {(r["src"], r["dst"]) for r in lt.near_dup_pairs_semdedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=16,
        max_cell_size=40).collect()}
    assert capped <= full and len(capped) < len(full)
    none = lt.near_dup_pairs_semdedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=16,
        max_cell_size=1).count()
    assert none == 0


def test_dedup_by_pairs_rejects_string_ids(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["id", "q"])
    pairs = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with _pytest.raises(ValueError, match="integral"):
        lt.dedup_by_pairs(df, pairs, id_col="id", keep_by="q")


def test_knn_classify_separable_clusters(spark):
    """Two well-separated clusters: leave-one-out 3-NN recovers every
    label; per-label eval reports accuracy 1.0."""
    rows = []
    for i in range(6):
        rows.append((i, 0, [10.0 + i * 0.01, 1.0]))
    for i in range(6, 12):
        rows.append((i, 1, [-10.0 - i * 0.01, 1.0]))
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = lt.knn_classify(df, "embedding", "vec_id", "label", k=3)
    assert all(r["predicted"] == r["label"] for r in out.collect())
    ev = {r["label"]: r for r in
          lt.knn_label_eval(df, "embedding", "vec_id", "label", k=3).collect()}
    assert ev[0]["accuracy"] == 1.0 and ev[1]["accuracy"] == 1.0
    assert ev[0]["n"] == 6 and ev[1]["n_correct"] == 6


def test_knn_classify_excludes_self_even_on_duplicates(spark):
    """Duplicate vectors: the self row must not vote for itself — with
    k=1 the duplicate's OTHER copy (different label) wins."""
    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0])],
        ["vec_id", "label", "embedding"],
    )
    out = {r["vec_id"]: r["predicted"]
           for r in lt.knn_classify(df, k=1).collect()}
    assert out == {1: 1, 2: 0}


def test_dedup_by_pairs_survivor_among_present_rows(spark):
    """A component whose min-labeled node is NOT a row of df (external
    pair graph, e.g. against-index pairs) must still keep one present
    member — the min PRESENT id — not drop the whole component."""
    df = spark.createDataFrame([(2, "x"), (3, "y"), (9, "z")], ["id", "t"])
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])  # node 1 absent
    out = sorted(r["id"] for r in lt.dedup_by_pairs(df, pairs, "id").collect())
    assert out == [2, 9]


def test_semdedup_and_dsir_reject_string_ids(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", [1.0, 0.0])], ["id", "embedding"])
    with _pytest.raises(ValueError, match="integral"):
        lt.near_dup_pairs_semdedup(df, "embedding", "id")
    docs = spark.createDataFrame([("a", "text here")], ["id", "text"])
    with _pytest.raises(ValueError, match="integral"):
        lt.dsir_log_weights(docs, docs, id_col="id")
    embl = spark.createDataFrame([("a", 0, [1.0])], ["id", "label", "embedding"])
    with _pytest.raises(ValueError, match="integral"):
        lt.knn_classify(embl, id_col="id")


def test_knn_label_eval_lsh_mode_passthrough(spark):
    rows = [(i, 0, [10.0, float(i)]) for i in range(5)] + [
        (i, 1, [-10.0, float(i)]) for i in range(5, 10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    ev = lt.knn_label_eval(df, k=3, mode="lsh_hyperplane", dim=2, n_planes=4)
    assert {r["label"] for r in ev.collect()} <= {0, 1}


def test_resolve_n_cells_auto_rule():
    """auto = ceil(n/256) with a floor of 4; an explicit int never
    triggers the count; the 20k-row case lands inside the measured
    sweet spot (the 64..256 flat bottom of the docstring sweep)."""
    from linktransformer_spark.operators.ann import resolve_n_cells

    assert resolve_n_cells("auto", lambda: 0) == 4
    assert resolve_n_cells("auto", lambda: 256) == 4
    assert resolve_n_cells("auto", lambda: 257) == 4
    assert resolve_n_cells("auto", lambda: 2000) == 8
    auto_20k = resolve_n_cells("auto", lambda: 20_000)
    assert auto_20k == 79 and 64 <= auto_20k <= 256
    # explicit int: count_fn must not run
    assert resolve_n_cells(16, lambda: (_ for _ in ()).throw(AssertionError)) == 16
    with pytest.raises(ValueError, match="auto"):
        resolve_n_cells("sixteen", lambda: 1)


def test_semdedup_auto_matches_explicit_equivalent(emb):
    """n_cells='auto' (the default) must produce exactly the survivors
    of the explicitly-sized equivalent — auto only picks the number."""
    from linktransformer_spark.operators.ann import resolve_n_cells

    expected_cells = resolve_n_cells("auto", emb.count)
    a = lt.semantic_dedup(emb, "embedding", "vec_id", threshold=0.3)
    b = lt.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.3, n_cells=expected_cells
    )
    ai = sorted(r["vec_id"] for r in a.select("vec_id").collect())
    bi = sorted(r["vec_id"] for r in b.select("vec_id").collect())
    assert ai == bi and len(ai) > 0


def test_ivf_seeded_auto_matches_explicit_equivalent(spark, emb):
    from linktransformer_spark.operators.ann import resolve_n_cells

    q = emb.limit(20)
    expected_cells = resolve_n_cells("auto", emb.count)
    a = lt.ivf_topk_seeded(q, emb, vector_col="embedding", k=3, n_probe=4)
    b = lt.ivf_topk_seeded(
        q, emb, vector_col="embedding", k=3, n_cells=expected_cells, n_probe=4
    )
    ka = sorted(map(tuple, a.select("query_id", "rank", "neighbor_id").collect()))
    kb = sorted(map(tuple, b.select("query_id", "rank", "neighbor_id").collect()))
    assert ka == kb and len(ka) > 0


def test_ann_int8_matches_exact_neighbors(emb):
    """int8 quantization at dim 64 perturbs cosine by ~1e-3 — the
    neighbor SET at k=5 should agree with exact search almost
    everywhere, and every score must be within the quantization
    error bound of the exact score."""
    q = emb.filter(F.col("vec_id") < 20)
    exact = lt.ann_topk(q, emb, k=5, mode="exact_cross").collect()
    int8 = lt.ann_topk(q, emb, k=5, mode="exact_int8").collect()
    ex = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact}
    i8 = {(r["query_id"], r["neighbor_id"]): r["score"] for r in int8}
    overlap = len(set(ex) & set(i8)) / len(ex)
    assert overlap >= 0.9, overlap
    for key in set(ex) & set(i8):
        assert abs(ex[key] - i8[key]) < 0.02, (key, ex[key], i8[key])


def test_ann_int8_self_is_top1(emb):
    q = emb.filter(F.col("vec_id") < 20)
    top1 = lt.ann_topk(q, emb, k=3, mode="exact_int8").filter(F.col("rank") == 1)
    assert top1.filter(F.col("query_id") != F.col("neighbor_id")).count() == 0


def test_quantize_embeddings_codes_and_scale(emb):
    out = lt.quantize_embeddings(emb.limit(50)).collect()
    for r in out:
        assert r["q_scale"] > 0
        assert all(-127 <= c <= 127 for c in r["q_codes"])
        # at least one component must hit the max-abs code +-127
        assert max(abs(c) for c in r["q_codes"]) == 127
        # dequantized vector reconstructs the normalized one closely
        import math
        nrm = math.sqrt(sum(x * x for x in r["embedding"]))
        recon_err = max(
            abs(c * r["q_scale"] - x / nrm)
            for c, x in zip(r["q_codes"], r["embedding"])
        )
        assert recon_err <= r["q_scale"] / 2 + 1e-12


def test_dedup_exact_against_hash_equals_raw(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    seen = d.filter(F.col("doc_id") < 30)
    nw = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    ).unionByName(d.filter(F.col("doc_id") >= 40))
    a = lt.dedup_exact_against(nw, seen, on="text", hash_keys=True)
    b = lt.dedup_exact_against(nw, seen, on="text", hash_keys=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the 10 exact copies must be dropped
    assert a.filter(F.col("doc_id") >= 500000).count() == 0


def test_dedup_exact_against_null_keys_match(spark):
    nw = spark.createDataFrame([(1, None), (2, "x")], "id long, t string")
    seen = spark.createDataFrame([(9, None)], "id long, t string")
    # null serializes to '' (reference parity) -> null matches null
    out = lt.dedup_exact_against(nw, seen, on="t").collect()
    assert [r["id"] for r in out] == [2]


def test_dedup_exact_against_multi_column_key(spark):
    from pyspark.sql import Row
    nw = spark.createDataFrame(
        [Row(id=1, a="x", b="y"), Row(id=2, a="x", b="z")])
    seen = spark.createDataFrame([Row(id=9, a="x", b="y")])
    out = lt.dedup_exact_against(nw, seen, on=["a", "b"]).collect()
    assert [r["id"] for r in out] == [2]


def test_dedup_exact_against_no_separator_conflation(spark):
    # ('a</s>', 'b') and ('a', '</s>b') serialize identically under a
    # join-with-separator scheme; the hashed path chains columns as
    # separate xxhash64 args, so they must NOT be conflated (parity
    # with the raw per-column join).
    from pyspark.sql import Row
    nw = spark.createDataFrame([Row(id=1, a="a</s>", b="b")])
    seen = spark.createDataFrame([Row(id=9, a="a", b="</s>b")])
    for hk in (True, False):
        out = lt.dedup_exact_against(nw, seen, on=["a", "b"], hash_keys=hk)
        assert out.count() == 1, f"conflated with hash_keys={hk}"


def test_dedup_exact_against_digests_decorrelated(spark):
    # The two shipped digests must come from different seed chains:
    # xxhash64(key) vs xxhash64(lit(1), key). If the second were
    # xxhash64(key, lit(1)) it would be a pure function of the first
    # (multi-arg xxhash64 feeds the running hash forward as the seed).
    df = spark.range(1).select(F.lit("probe").alias("k"))
    r = df.select(
        F.xxhash64(F.lit(1), F.col("k")).alias("salt_first"),
        F.xxhash64(F.col("k"), F.lit(1)).alias("salt_last"),
        F.xxhash64(F.lit(1), F.xxhash64(F.col("k"))).alias("not_this_either"),
    ).first()
    assert r["salt_first"] != r["salt_last"]
    assert r["salt_first"] != r["not_this_either"]


def test_entity_resolution_rejects_string_ids(spark):
    from linktransformer_spark.operators.entity import match_pairs
    import pytest as _pytest
    df1 = spark.createDataFrame([("u-1", "acme")], "rid string, name string")
    df2 = spark.createDataFrame([(1, "acme co")], "rid long, name string")
    with _pytest.raises(ValueError, match="integral"):
        match_pairs(df1, df2, left_on="name", right_on="name",
                    left_id_col="rid", right_id_col="rid", sim_threshold=0.5)
    with _pytest.raises(ValueError, match="integral"):
        match_pairs(df2, df1, left_on="name", right_on="name",
                    left_id_col="rid", right_id_col="rid", sim_threshold=0.5)


# ---------------------------------------------------------------------------
# mmr_rerank (round 6)
# ---------------------------------------------------------------------------
def _mmr_cand(spark, rows):
    # rows: (q, d, rel, vec)
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(query_id=q, neighbor_id=d, score=r, embedding=v)
         for (q, d, r, v) in rows]
    )


def test_mmr_first_pick_is_max_relevance(spark):
    cand = _mmr_cand(spark, [
        (1, 10, 0.9, [1.0, 0.0]), (1, 11, 0.8, [0.0, 1.0]),
    ])
    out = sorted(lt.mmr_rerank(cand, k=2).collect(), key=lambda r: r["rank"])
    assert out[0]["neighbor_id"] == 10 and out[0]["rank"] == 1
    assert abs(out[0]["mmr"] - 0.7 * 0.9) < 1e-12


def test_mmr_penalizes_redundant_candidates(spark):
    # d=11 is a near-clone of the first pick; d=12 is orthogonal with
    # lower relevance — MMR must pick 12 second
    cand = _mmr_cand(spark, [
        (1, 10, 0.90, [1.0, 0.0]),
        (1, 11, 0.89, [1.0, 0.001]),   # redundant
        (1, 12, 0.60, [0.0, 1.0]),     # diverse
    ])
    out = sorted(lt.mmr_rerank(cand, k=2, lam=0.5).collect(),
                 key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [10, 12]


def test_mmr_lam_one_reduces_to_relevance_order(spark):
    cand = _mmr_cand(spark, [
        (1, 10, 0.9, [1.0, 0.0]), (1, 11, 0.89, [1.0, 0.0]),
        (1, 12, 0.6, [0.0, 1.0]),
    ])
    out = sorted(lt.mmr_rerank(cand, k=3, lam=1.0).collect(),
                 key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in out] == [10, 11, 12]


def test_mmr_short_candidate_lists_yield_short_results(spark):
    cand = _mmr_cand(spark, [(1, 10, 0.9, [1.0, 0.0]),
                             (2, 20, 0.5, [1.0, 0.0]),
                             (2, 21, 0.4, [0.0, 1.0])])
    out = lt.mmr_rerank(cand, k=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert sorted(per_q[1]) == [1] and sorted(per_q[2]) == [1, 2]


def test_mmr_validates(spark):
    cand = _mmr_cand(spark, [(1, 10, 0.9, [1.0, 0.0])])
    with pytest.raises(ValueError):
        lt.mmr_rerank(cand, k=0)
    with pytest.raises(ValueError):
        lt.mmr_rerank(cand, lam=1.5)
    with pytest.raises(ValueError):
        lt.mmr_rerank(cand, mode="nope")


def test_mmr_grouped_bit_identical_to_relational(spark, sf_dir):
    """mode='grouped' (one applyInPandas shuffle) must return
    EXACTLY the relational k-round chain's rows — same picks, same
    unrounded doubles (the numpy loop replays the declarative fold
    orders). Checked on real embeddings with contested ties."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    cand = (
        lt.ann_topk(q, emb, k=15, mode="exact_cross")
        .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                         "embedding"), "neighbor_id")
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    val = lambda r: (r["neighbor_id"], r["score"], r["mmr"])  # noqa: E731
    grouped = {key(r): val(r) for r in
               lt.mmr_rerank(cand, k=6, lam=0.6, mode="grouped").collect()}
    relational = {key(r): val(r) for r in
                  lt.mmr_rerank(cand, k=6, lam=0.6,
                                mode="relational").collect()}
    assert grouped == relational and len(grouped) == 20 * 6


# ---------------------------------------------------------------------------
# srp_project (round 6)
# ---------------------------------------------------------------------------
def test_srp_shortlist_rerank_recall_floor(spark, sf_dir):
    """The production composition: 64->32 projected shortlist (50) ->
    exact rerank. Recall@10 vs the uncompressed exact search has a
    pinned floor (the synthetic embeddings have weakly separated
    neighborhoods — near-uniform pairwise cosines — so even a 2x
    compression costs recall; real embedding geometry does better)."""
    from linktransformer_spark.operators.ann import ann_topk, srp_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk(q, emb, k=10, mode="exact_cross").collect()}
    pr = srp_project(emb, in_dim=64, out_dim=32)
    short = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk(pr.filter(F.col("vec_id") < 50), pr,
                               vector_col="projected", k=50,
                               mode="exact_cross").collect()}
    # exact rerank keeps any true neighbor that survived the shortlist
    recall = len(exact & short) / len(exact)
    assert recall >= 0.6, f"SRP shortlist recall@10 {recall:.3f} < 0.6"


def test_srp_signs_deterministic_and_balanced(spark):
    from linktransformer_spark.operators.ann import srp_signs

    a = srp_signs(64, 16)
    assert a == srp_signs(64, 16)
    assert a != srp_signs(64, 16, salt=1)
    flat = [s for row in a for s in row]
    assert set(flat) == {-1, 1}
    # roughly balanced signs (a degenerate all-+1 matrix would be a
    # projection onto one line)
    assert 0.3 < flat.count(1) / len(flat) < 0.7


def test_srp_preserves_self_similarity(spark):
    from linktransformer_spark.operators.ann import srp_project
    from linktransformer_spark.functions import similarity as S

    df = spark.createDataFrame(
        [(1, [float(i % 7 - 3) for i in range(32)])], ["id", "embedding"])
    out = srp_project(df, in_dim=32, out_dim=8).select(
        S.dot(S.l2_normalize(F.col("projected")),
              S.l2_normalize(F.col("projected"))).alias("d")).first()
    assert abs(out["d"] - 1.0) < 1e-9


def test_srp_validates(spark):
    from linktransformer_spark.operators.ann import srp_project

    df = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "embedding"])
    with pytest.raises(ValueError):
        srp_project(df, in_dim=0, out_dim=4)
    with pytest.raises(ValueError):
        srp_project(df, in_dim=2, out_dim=0)


# ---------------------------------------------------------------------------
# containment_pairs (round 6)
# ---------------------------------------------------------------------------
def test_containment_detects_subset_jaccard_misses(spark):
    from pyspark.sql import Row
    long_words = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(8))  # fully contained prefix
    df = spark.createDataFrame([
        Row(doc_id=1, text=quote),
        Row(doc_id=2, text=long_words),
    ])
    cont = {(r["src"], r["dst"]): r["containment"]
            for r in lt.containment_pairs(
                df, on="text", id_col="doc_id", threshold=0.8).collect()}
    assert cont[(1, 2)] == 1.0          # the quote is fully inside doc 2
    assert (2, 1) not in cont           # big doc is NOT inside the quote
    jac = lt.near_dup_pairs_jaccard(
        df, on="text", id_col="doc_id", threshold=0.8).collect()
    assert jac == []                    # symmetric jaccard misses it


def test_containment_both_directions_for_twins(spark):
    from pyspark.sql import Row
    t = " ".join(f"x{i}" for i in range(20))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t)])
    out = {(r["src"], r["dst"]) for r in lt.containment_pairs(
        df, on="text", id_col="doc_id", threshold=0.99).collect()}
    assert out == {(1, 2), (2, 1)}


def test_containment_validates(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError):
        lt.containment_pairs(df, on="text", id_col="doc_id", threshold=0.0)


# ---------------------------------------------------------------------------
# save_ivf_index / ann_topk_ivf_indexed (round 6)
# ---------------------------------------------------------------------------
def test_ivf_index_round_trip_equals_seeded(spark, sf_dir, tmp_path):
    from linktransformer_spark.operators.ann import ivf_topk_seeded

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16, mode="seeded")
    q = emb.filter(F.col("vec_id") < 30)
    direct = {(r["query_id"], r["neighbor_id"], r["rank"])
              for r in ivf_topk_seeded(q, emb, k=5, n_cells=16,
                                       n_probe=4).collect()}
    indexed = {(r["query_id"], r["neighbor_id"], r["rank"])
               for r in lt.ann_topk_ivf_indexed(spark, path, q, k=5,
                                                n_probe=4).collect()}
    assert direct == indexed and direct


def test_ivf_index_partition_pruning(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=16, mode="seeded")
    import os
    cells = [d for d in os.listdir(f"{path}/cells") if d.startswith("cell=")]
    assert len(cells) > 4  # corpus actually spread over cells
    one_q = emb.filter(F.col("vec_id") == 0)
    out = lt.ann_topk_ivf_indexed(spark, path, one_q, k=3, n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan
    assert out.count() <= 3


def test_ivf_index_version_gate(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb, path, n_cells=8)
    bad = spark.createDataFrame(
        [(99, 8, "seeded", "vec_id", "embedding")],
        "version int, n_cells int, mode string, id_col string, vector_col string",
    )
    bad.coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    with pytest.raises(ValueError, match="version"):
        lt.ann_topk_ivf_indexed(spark, path, emb.limit(1)).count()


def test_ivf_index_kmeans_mode_builds(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200)
    path = str(tmp_path / "ivfk")
    lt.save_ivf_index(emb, path, n_cells=8, mode="kmeans")
    q = emb.filter(F.col("vec_id") < 10)
    out = lt.ann_topk_ivf_indexed(spark, path, q, k=3, n_probe=2)
    rows = out.collect()
    assert rows and all(1 <= r["rank"] <= 3 for r in rows)


# ---------------------------------------------------------------------------
# multi-probe LSH (round 6)
# ---------------------------------------------------------------------------
def test_multiprobe_improves_recall_over_single(spark, sf_dir):
    from linktransformer_spark.operators.ann import ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk(q, emb, k=5, mode="exact_cross").collect()}
    single = {(r["query_id"], r["neighbor_id"])
              for r in ann_topk(q, emb, k=5, mode="lsh_hyperplane",
                                dim=64, n_planes=6).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk(q, emb, k=5, mode="lsh_hyperplane",
                               dim=64, n_planes=6, multi_probe=2).collect()}
    r1 = len(exact & single) / len(exact)
    r2 = len(exact & multi) / len(exact)
    assert r2 >= r1  # extra probes can only add candidates
    assert single <= {p for p in multi} or r2 > r1  # strictly more pairs seen


def test_multiprobe_buckets_distinct_and_counted(spark):
    from linktransformer_spark.operators.ann import hyperplane_probe_buckets

    df = spark.createDataFrame(
        [(1, [float(i % 5 - 2) for i in range(16)])], ["id", "v"])
    out = hyperplane_probe_buckets(df, "v", 16, 6, 3).collect()
    assert len(out) == 4  # 1 exact + 3 flips
    assert len({r["_bkt"] for r in out}) == 4  # all distinct


def test_multiprobe_validates(spark):
    from linktransformer_spark.operators.ann import hyperplane_probe_buckets
    df = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "v"])
    with pytest.raises(ValueError):
        hyperplane_probe_buckets(df, "v", 2, 4, 4)


def test_ivf_index_append_equals_full_with_same_centroids(spark, sf_dir, tmp_path):
    """build(half1) + append(half2) must equal a from-scratch search
    that uses the SAME (half1-seeded) centroids over the full corpus —
    appends never disturb existing rows or probes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    h1 = emb.filter(F.col("vec_id") < 250)
    h2 = emb.filter(F.col("vec_id") >= 250)
    inc = str(tmp_path / "inc")
    lt.save_ivf_index(h1, inc, n_cells=8, mode="seeded")
    lt.append_to_ivf_index(h2, inc)

    q = emb.filter(F.col("vec_id") < 20)
    got = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in lt.ann_topk_ivf_indexed(spark, inc, q, k=5,
                                            n_probe=3).collect()}

    # reference: same centroids (seeded from h1 = the 8 smallest ids of
    # the FULL corpus too, since h1 holds the smallest ids) built over
    # the full corpus in one shot
    full = str(tmp_path / "full")
    lt.save_ivf_index(emb, full, n_cells=8, mode="seeded")
    want = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in lt.ann_topk_ivf_indexed(spark, full, q, k=5,
                                             n_probe=3).collect()}
    assert got == want and got


def test_ivf_index_append_version_gate(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    lt.save_ivf_index(emb.filter(F.col("vec_id") < 100), path, n_cells=4)
    bad = spark.createDataFrame(
        [(99, 4, "seeded", "vec_id", "embedding")],
        "version int, n_cells int, mode string, id_col string, vector_col string",
    )
    bad.coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    with pytest.raises(ValueError, match="version"):
        lt.append_to_ivf_index(emb.filter(F.col("vec_id") >= 100), path)


def test_resolve_n_planes_auto_scaling(spark):
    from linktransformer_spark.operators.ann import resolve_n_planes

    # explicit ints never invoke the count
    assert resolve_n_planes(9, lambda: 1 / 0) == 9
    # auto: one plane per corpus doubling around 32 rows/bucket —
    # reproduces the round-7 hand-tuned values (2k -> 6, 15k -> 9)
    assert resolve_n_planes("auto", lambda: 2_000) == 6
    assert resolve_n_planes("auto", lambda: 15_000) == 9
    assert resolve_n_planes("auto", lambda: 150_000) == 13
    assert resolve_n_planes("auto", lambda: 50) == 4      # floor
    assert resolve_n_planes("auto", lambda: 10 ** 12) == 24  # ceiling
    with pytest.raises(ValueError):
        resolve_n_planes("many", lambda: 10)


def test_ann_topk_lsh_auto_planes_matches_pinned(spark, sf_dir):
    import linktransformer_spark as lt

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # 500 corpus rows -> auto resolves to the floor (4 planes)
    auto = lt.ann_topk(emb, emb, k=5, mode="lsh_hyperplane",
                       dim=64, n_planes="auto").collect()
    pinned = lt.ann_topk(emb, emb, k=5, mode="lsh_hyperplane",
                         dim=64, n_planes=4).collect()
    key = lambda rs: sorted((r.query_id, r.neighbor_id, r.rank) for r in rs)
    assert key(auto) == key(pinned)


def test_ann_topk_multi_table_recall_and_default(spark, sf_dir):
    """n_tables (the round-10 OR-construction): recall vs the exact
    path must be monotone in table count on the fixed corpus
    (deterministic planes — no flake surface), and n_tables=1 must be
    the byte-stable single-table plan (identical rows to the default
    call)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(400)
    q = emb.limit(60)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in lt.ann_topk(q, emb, k=5, mode="broadcast_knn").collect()
    }

    def rec(n_tables):
        got = {
            (r.query_id, r.neighbor_id)
            for r in lt.ann_topk(
                q, emb, k=5, mode="lsh_hyperplane", dim=64, n_planes=6,
                n_tables=n_tables,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r3 = rec(1), rec(3)
    assert r3 >= r1

    base = sorted(map(tuple, lt.ann_topk(
        q, emb, k=5, mode="lsh_hyperplane", dim=64, n_planes=6
    ).collect()))
    one = sorted(map(tuple, lt.ann_topk(
        q, emb, k=5, mode="lsh_hyperplane", dim=64, n_planes=6, n_tables=1
    ).collect()))
    assert base == one

    with pytest.raises(ValueError, match="n_tables"):
        lt.ann_topk(q, emb, k=5, mode="lsh_hyperplane", dim=64, n_tables=0)


def test_ann_topk_multi_table_composes_with_salt(spark, sf_dir):
    """Tables x salted skew guard: every emitted pair must be unique
    and scores must equal the exact dot (the cogroup is bit-equal), on
    a corpus with a forced hot bucket (many identical vectors)."""
    from pyspark.sql import functions as F

    from linktransformer_spark.functions import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).limit(200)
    hot = emb.limit(1).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    for i in range(4):
        emb = emb.unionByName(hot.select(
            (F.col("vec_id") + i).alias("vec_id"), "embedding"
        ))
    q = emb.limit(40)
    out = lt.ann_topk(
        q, emb, k=3, mode="lsh_hyperplane", dim=64, n_planes=5,
        n_tables=2, max_bucket_size=16, hot_bucket="salt",
    )
    rows = out.collect()
    assert len({(r.query_id, r.neighbor_id) for r in rows}) == len(rows)
    # spot-check score exactness: left-assoc python dot over the
    # engine-normalized vectors (the fold's float order) must be
    # bit-equal to the emitted scores
    ids = [(r.query_id, r.neighbor_id, r.score) for r in rows[:20]]
    norm = {
        r["vec_id"]: r["v"]
        for r in emb.select(
            "vec_id", S.l2_normalize(F.col("embedding")).alias("v")
        ).collect()
    }
    for x, y, s in ids:
        acc = 0.0
        for a_, b_ in zip(norm[x], norm[y]):
            acc = acc + a_ * b_
        assert acc == s, (x, y)


def test_exact_broadcast_tier_bit_parity(spark, emb):
    """The round-14 broadcast-numpy tier for modes exact_cross /
    exact_int8 must emit rows BIT-identical to the declarative
    cross-join plan — including duplicate query ids (the window pools
    them) and exact score ties (duplicated corpus vectors)."""
    from linktransformer_spark.operators.ann import (
        ANN_BROADCAST_MIN_PAIRS_CONF,
    )

    q = emb.filter(F.col("vec_id") < 15)
    # duplicate query ids + duplicated vectors (ties at full cosine)
    q_dup = q.unionByName(q.limit(5))
    corpus = emb.filter(F.col("vec_id") < 300).unionByName(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 500000).alias("vec_id"),
            "embedding", "label",
        )
    )
    for mode in ("exact_cross", "exact_int8"):
        spark.conf.set(ANN_BROADCAST_MIN_PAIRS_CONF, "0")  # force kernel
        try:
            kern = sorted(map(tuple, lt.ann_topk(
                q_dup, corpus, k=4, mode=mode).collect()))
        finally:
            spark.conf.set(ANN_BROADCAST_MIN_PAIRS_CONF, str(1 << 60))
        try:
            decl = sorted(map(tuple, lt.ann_topk(
                q_dup, corpus, k=4, mode=mode).collect()))
        finally:
            spark.conf.unset(ANN_BROADCAST_MIN_PAIRS_CONF)
        assert kern == decl, mode  # bit-equal scores, ranks, ids


def test_exact_broadcast_tier_routes_by_size(spark, emb):
    """Parquet-backed corpora past the pair budget take the kernel
    (MapInPandas in the plan, no BroadcastNestedLoopJoin); an
    unknown-stats (RDD-backed) corpus keeps the declarative plan —
    routing must never launch a job to decide."""
    q = emb.filter(F.col("vec_id") < 15)
    plan_kern = lt.ann_topk(q, emb, k=4, mode="exact_cross")._jdf \
        .queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_kern
    assert "BroadcastNestedLoopJoin" not in plan_kern
    rdd_corpus = emb.sparkSession.createDataFrame(
        emb.limit(50).collect(), emb.schema
    )
    plan_decl = lt.ann_topk(q, rdd_corpus, k=4, mode="exact_cross")._jdf \
        .queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_decl


def test_keys_arrow_kernel_tolerates_null_ids(spark):
    """A non-castable id reaches the Arrow key-kernels as null; the
    pass must emit the row with a null id (the relational path's
    tolerance), not fail the task (round-14 advisory)."""
    from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder
    from linktransformer_spark.operators.ann import (
        hyperplane_bucket_keys_arrow, hyperplane_probe_buckets_keys_arrow,
    )

    df = spark.createDataFrame(
        [(None, "abc"), (1, "xyz"), (2, "abd")],
        "id long, key string",
    )
    enc = HashNgramEncoder(dim=8)
    out = hyperplane_bucket_keys_arrow(df, "id", "key", enc, 8, 4).collect()
    assert len(out) == 3 and sum(r["id"] is None for r in out) == 1
    out2 = hyperplane_probe_buckets_keys_arrow(
        df, "id", "key", enc, 8, 4, n_extra=2
    ).collect()
    assert len(out2) == 9 and sum(r["id"] is None for r in out2) == 3


def test_minhash_banded_stage_fused_parity_and_plan(spark):
    """The round-14 fused Arrow band stage must (a) emit EXACTLY the
    rows of slicing the relational minhash_signature at the band
    offsets — nulls, empties, unicode and duplicate ids included —
    and (b) contain no Generate/explode: the band rows come out of
    the one mapInPandas pass."""
    from linktransformer_spark.operators.dedup import (
        _minhash_banded_stage, minhash_signature,
    )

    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "the quick brown fox"),
         (2, ""), (3, None), (4, "Grüße aus Köln 東京"), (2, "dup id")],
        "doc_id long, text string",
    )
    num_hashes, bands, shingle, word = 24, 8, 3, True
    r = num_hashes // bands
    got = sorted(
        (row["_id"], row["band"], tuple(row["bsig"]))
        for row in _minhash_banded_stage(
            df, "text", "doc_id", num_hashes, bands, shingle, word
        ).collect()
    )
    sig_rows = df.select(
        F.col("doc_id").alias("_id"),
        minhash_signature(
            F.coalesce(F.col("text"), F.lit("")), num_hashes, shingle, word
        ).alias("sig"),
    ).collect()
    want = sorted(
        (row["_id"], b, tuple(row["sig"][b * r:(b + 1) * r]))
        for row in sig_rows for b in range(bands)
    )
    assert got == want

    plan = (
        _minhash_banded_stage(df, "text", "doc_id", num_hashes, bands,
                              shingle, word)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan and "MapInPandas" in plan
