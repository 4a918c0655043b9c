"""Fleet-wide physical-plan hygiene gate over EVERY registered batch
query: no accidental cartesian products, and nested-loop joins only
where they are a conscious choice.

Two failure modes this guards against:
- a refactor that silently turns an equi-join into CartesianProduct
  (e.g. a join key renamed on one side — Catalyst happily cross-joins);
- a new query shipping a BroadcastNestedLoopJoin nobody justified.

Every BNLJ in the allowed set below is one of:
- the documented exact-path candidate stage of a similarity op
  (cross scoring IS the semantics; the lsh/ivf/broadcast modes are the
  scale path and auto-mode routes to them above the size threshold), or
- a bounded literal broadcast (1-row totals/threshold relation, or the
  n_cells<=16-row centroid table) — constant size at any corpus scale.
"""

import pytest

from linktransformer_spark.oracle_queries import QUERIES
from tests.test_plan_shapes import plan_of

# query -> why a BroadcastNestedLoopJoin is deliberate there
BNLJ_ALLOWED = {
    "merge_1nn": "exact-cross candidate stage (expression scorer)",
    "merge_knn_k3": "exact-cross candidate stage",
    "merge_range_t55": "similarity theta-join (range semantics)",
    "aggregate_rows_ptype": "exact-cross candidate stage",
    "all_pair_combos_supplier": "full cross product IS the operator",
    "merge_k_judge_mock": "exact-cross retrieval stage",
    "dedup_embedding_pairs": "exact pair baseline (lsh mode is the scale path)",
    "ann_topk_bruteforce": "brute-force baseline by definition",
    "ann_mmr_rerank": "exact-cross candidate stage (rerank input)",
    "ann_topk_srp_rerank": "projected exact-cross shortlist stage (2x-compressed vectors)",
    "knn_label_eval": "exact leave-one-out baseline (lsh mode for scale)",
    "docs_lm_perplexity": "1-row totals broadcast",
    "docs_bigram_lm": "1-row totals (T, V) broadcast",
    "docs_quantile_buckets": "1-row boundary-array broadcast",
    "events_winsorize_value": "1-row quantile-bounds broadcast",
    "docs_dsir_weights": "1-row totals broadcasts",
    "ir_metrics_eval": "bounded threshold/total relation broadcast",
    "binary_eval_name_match": "bounded threshold relation broadcast",
    "ann_topk_ivfpq": "n_cells/n_codes-row codebook broadcast",
    "ann_topk_ivfpq_rerank": "n_cells/n_codes-row codebook broadcast",
    "ann_topk_ivf_seeded": "n_cells-row centroid broadcast",
    "ann_ivf_indexed": "n_cells-row stored-centroid broadcast",
    "ann_ivf_deleted": "n_cells-row stored-centroid broadcast",
    "ann_ivf_upsert": "n_cells-row stored-centroid broadcast",
    "ann_ivf_rebalanced": "n_cells-row stored-centroid broadcast (+ bounded child-centroid broadcast in the rebalance build step)",
    "semdedup_embeddings": "n_cells-row centroid broadcast",
    "search_bm25_documents": "1-row corpus-stats (N, avgdl) broadcast",
    "search_hybrid_rrf": "1-row corpus-stats broadcast (bm25 arm) + exact-cross semantic arm",
    "ann_topk_int8": "quantized exact-cross baseline (4x bandwidth cut; lsh/ivf modes are the scale path)",
    "docs_top_vocab": "1-row token-total broadcast",
    "docs_temperature_mixture": "1-row order-pinned normalizer broadcast",
    "docs_tfidf_terms": "1-row doc-count (N) broadcast",
    "docs_collocations_pmi": "1-row totals (n_tok, n_bi) broadcast",
    "docs_lang_kappa": "1-row totals x 1-row marginal-product broadcast",
    "events_key_skew": "1-row (n_keys, n_rows) totals broadcast",
    "events_value_histogram": "1-row (min, max) bounds + 1-row total broadcast",
    "events_attribution_last_touch": "1-row conversions-total broadcast",
    "events_attribution_first_touch": "1-row conversions-total broadcast",
    "dedup_jaccard_cap_stats": "10-row literal replication range broadcast (hot-corpus builder)",
    "dedup_minhash_salted": "10-row literal replication range broadcast (same hot-corpus fixture; the round-13 Arrow signature build no longer checkpoints the banded relation, so the fixture's BNLJ is visible in the plan again)",
    "graph_pagerank": "1-row node-count/teleport broadcast (round-13 inline iteration mode replaces the driver-side count action)",
    "docs_datacard": "1-row corpus-total broadcast (lang/source fraction denominators)",
}


def _batch_queries():
    return sorted(n for n in QUERIES if not n.startswith("stream_"))


@pytest.mark.parametrize("name", _batch_queries())
def test_no_cartesian_and_only_sanctioned_bnlj(spark, sf_dir, name):
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: accidental cartesian"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_ALLOWED, (
            f"{name}: unsanctioned BroadcastNestedLoopJoin — either fix the "
            "join or add it to BNLJ_ALLOWED with a justification"
        )
