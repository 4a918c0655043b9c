"""linktransformer_spark — a PySpark-native engine with the query /
data-processing capabilities of dell-research-harvard/linktransformer.

Public API mirrors the reference's flat operator surface
(/root/reference/src/linktransformer/infer.py) over
``pyspark.sql.DataFrame`` instead of pandas, plus large-scale
training-data-pipeline extensions (dedup, ANN, text analysis,
multimodal, streaming) that the 100 TB north star requires.
"""

from .session import get_spark
from .operators.merge import aggregate_rows, merge, merge_blocking, merge_knn
from .operators.range_join import merge_range
from .operators.pair_eval import all_pair_combos_evaluate, evaluate_pairs
from .operators.cluster import cluster, cluster_rows, dedup_rows
from .operators.components import clusters_from_edges, connected_components
from .operators.graph import pagerank
from .operators.ann import (
    ann_topk, ivf_pq_rerank_topk, ivf_pq_topk, ivf_topk, ivf_topk_seeded,
    ann_topk_ivf_indexed, append_to_ivf_index, mmr_rerank, quantize_embeddings,
    delete_from_ivf_index, index_cell_stats, purge_ivf_index,
    rebalance_ivf_index, rebalance_pq_index, save_ivf_index,
    ivf_train_centroids, knn_classify, knn_label_eval,
)
from .operators.txn import pending_commit_exists, recover_index
from .operators.upsert import (
    index_health, upsert_bm25_index, upsert_ivf_index,
    upsert_minhash_index, upsert_pq_index,
)
from .operators.serving import (
    ann_serving_topk, ann_topk_pq_indexed, resolve_serving_params,
    append_to_pq_index, delete_from_pq_index, purge_pq_index,
    save_pq_index, hybrid_topk_indexed,
)
from .data import DATA_DIR_PATH
from .modelling import LinkTransformer, LinkTransformerClassifier, save_model
from .operators.asof import merge_asof
from .operators.cdc import scd2_apply
from .operators.profile import (
    histogram,
    key_skew_topk,
    profile_table,
    quantile_buckets,
    table_diff,
    winsorize,
)
from .operators.sampling import (
    hash_sample,
    hash_split,
    sample_mixture,
    sample_per_group,
    temperature_mixture,
    weighted_sample_per_group,
)
from .operators.multimodal import (
    attach_fake_media, decode_image, extract_features, frame_sample, resize_image,
)
from .operators.dedup import (
    dedup_by_pairs,
    dedup_embedding,
    dedup_exact,
    dedup_exact_against,
    dedup_against,
    dedup_minhash,
    minhash_signature,
    near_dup_pairs_embedding,
    containment_pairs,
    near_dup_pairs_jaccard,
    near_dup_pairs_minhash,
    near_dup_pairs_minhash_against,
    near_dup_pairs_minhash_against_index,
    near_dup_pairs_semdedup,
    delete_from_minhash_index,
    purge_minhash_index,
    save_minhash_index,
    near_dup_pairs_simhash,
    semantic_dedup,
    simhash64,
)
from .operators.textpipe import (
    analyze_documents,
    annotate_quality_filter,
    filter_documents,
    gopher_quality_signals,
    repetition_stats,
    unigram_lm_score,
)
from .operators.entity import (
    attach_to_entities,
    match_pairs,
    match_pairs_weighted,
    resolve_entities,
    sorted_neighborhood_pairs,
)
from .operators.search import (
    append_to_bm25_index,
    delete_from_bm25_index,
    bm25_compacted_postings,
    bm25_delta_postings,
    compact_bm25_index,
    bm25_topk,
    rrf_fuse,
    bm25_topk_indexed,
    build_bm25_index,
    save_bm25_index,
)
from .operators.corpus import (
    contamination_pairs,
    dedup_lines,
    dedup_spans,
    dsir_log_weights,
    dsir_select,
    chunk_documents,
    materialize_chunks,
    pack_sequences,
    redact_pii,
)
from .operators.ir_eval import (
    binary_eval,
    calibration_bins,
    calibration_summary,
    cohen_kappa,
    ir_metrics,
    log_binary_eval,
    log_ir_metrics,
    rank_results,
)
from .train import (
    apply_in_chunks,
    save_prepared,
    tokenize_data_for_inference,
    train_clf_model,
    train_model,
    transform_column,
)
from .preprocess import (
    check_and_prep_data,
    check_clust_data,
    edges_from_clusters,
    prep_clus_data,
    prep_linkage_data,
    prep_paired_label_data,
)
from .operators.llm import (
    GeminiSpec,
    MockJudgeSpec,
    MockTopicSpec,
    MockTransformSpec,
    OpenAIChatSpec,
    classify_rows,
    get_completion_from_messages,
    load_clf,
    merge_k_judge,
    merge_knn_openai,
    merge_knn_with_llm,
    openai_transform,
    predict_rows_with_openai,
    transform_rows,
)
from .encoders.api import infer_embeddings_with_gemini
from .functions.similarity import cosine_similarity_corresponding_pairs
from .sources.tables import (
    read_bucketed, read_csv, read_excel, read_jsonl, save_bucketed,
    save_partitioned, write_jsonl,
)
from .encoders.base import Encoder, resolve_encoder
from .encoders.hash_ngram import HashNgramEncoder
from .encoders.precomputed import PrecomputedEncoder
from .functions.serialize import convert_to_text, serialize_columns
from .preprocess import preprocess_any_data


def load_model(model):
    """Resolve a model name, saved model directory, or Encoder to an
    encoder (reference load_model,
    /root/reference/src/linktransformer/utils.py:67-82). Strings route
    exactly like the reference (API-model predicates, else
    sentence-transformers), plus the deterministic ``"hash-ngram"``
    backend; a directory written by :func:`save_model` rebuilds the
    saved encoder (model-store round-trip)."""
    import os as _os

    from .modelling import MODEL_CONFIG, load_model_dir

    if isinstance(model, str) and _os.path.isfile(
        _os.path.join(model, MODEL_CONFIG)
    ):
        return load_model_dir(model)
    return resolve_encoder(model)


def infer_embeddings(df, on, model=None, out_col: str = "embedding"):
    """Append an L2-normalized embedding column for the serialized key
    columns ``on`` (reference infer_embeddings,
    /root/reference/src/linktransformer/utils.py:179-248 — matrix out;
    here a column, aligned by value not position). Embeds each
    DISTINCT key once and joins back (embed-once CSE)."""
    from pyspark.sql import functions as _F

    on_list = [on] if isinstance(on, str) else list(on)
    enc = resolve_encoder(model)
    key_col = "_lt_embed_key"
    work = df.withColumn(key_col, serialize_columns(on_list))
    out = enc.encode_distinct(work, key_col, out_col)
    return out.drop(key_col)

__all__ = [
    "get_spark",
    "merge",
    "merge_knn",
    "merge_blocking",
    "merge_range",
    "aggregate_rows",
    "evaluate_pairs",
    "all_pair_combos_evaluate",
    "cluster_rows",
    "dedup_rows",
    "connected_components",
    "pagerank",
    "merge_k_judge",
    "merge_knn_with_llm",
    "merge_knn_openai",
    "classify_rows",
    "transform_rows",
    "MockJudgeSpec",
    "MockTopicSpec",
    "MockTransformSpec",
    "OpenAIChatSpec",
    "GeminiSpec",
    "ann_topk",
    "mmr_rerank",
    "ann_topk_ivf_indexed",
    "attach_to_entities",
    "save_ivf_index",
    "append_to_bm25_index",
    "append_to_ivf_index",
    "append_to_pq_index",
    "delete_from_bm25_index",
    "delete_from_ivf_index",
    "delete_from_minhash_index",
    "delete_from_pq_index",
    "index_cell_stats",
    "index_health",
    "pending_commit_exists",
    "rebalance_ivf_index",
    "rebalance_pq_index",
    "recover_index",
    "purge_ivf_index",
    "purge_minhash_index",
    "purge_pq_index",
    "upsert_bm25_index",
    "upsert_ivf_index",
    "upsert_minhash_index",
    "upsert_pq_index",
    "bm25_compacted_postings",
    "bm25_delta_postings",
    "quantize_embeddings",
    "knn_classify",
    "histogram",
    "key_skew_topk",
    "knn_label_eval",
    "merge_asof",
    "DATA_DIR_PATH",
    "LinkTransformer",
    "LinkTransformerClassifier",
    "profile_table",
    "quantile_buckets",
    "winsorize",
    "table_diff",
    "scd2_apply",
    "hash_sample",
    "hash_split",
    "sample_mixture",
    "temperature_mixture",
    "sample_per_group",
    "weighted_sample_per_group",
    "ivf_topk",
    "ivf_pq_topk",
    "ivf_pq_rerank_topk",
    "ann_serving_topk",
    "ann_topk_pq_indexed",
    "hybrid_topk_indexed",
    "resolve_serving_params",
    "save_pq_index",
    "ivf_topk_seeded",
    "ivf_train_centroids",
    "attach_fake_media",
    "decode_image",
    "resize_image",
    "frame_sample",
    "extract_features",
    "dedup_by_pairs",
    "dedup_exact",
    "dedup_exact_against",
    "dedup_against",
    "dedup_minhash",
    "dedup_embedding",
    "near_dup_pairs_minhash",
    "near_dup_pairs_minhash_against",
    "near_dup_pairs_minhash_against_index",
    "save_minhash_index",
    "near_dup_pairs_simhash",
    "containment_pairs",
    "near_dup_pairs_jaccard",
    "near_dup_pairs_embedding",
    "near_dup_pairs_semdedup",
    "semantic_dedup",
    "minhash_signature",
    "simhash64",
    "analyze_documents",
    "annotate_quality_filter",
    "filter_documents",
    "repetition_stats",
    "unigram_lm_score",
    "gopher_quality_signals",
    "bm25_topk",
    "bm25_topk_indexed",
    "rrf_fuse",
    "build_bm25_index",
    "compact_bm25_index",
    "save_bm25_index",
    "match_pairs",
    "match_pairs_weighted",
    "resolve_entities",
    "sorted_neighborhood_pairs",
    "contamination_pairs",
    "dedup_lines",
    "dsir_log_weights",
    "dsir_select",
    "dedup_spans",
    "chunk_documents",
    "materialize_chunks",
    "pack_sequences",
    "redact_pii",
    "ir_metrics",
    "binary_eval",
    "calibration_bins",
    "calibration_summary",
    "cohen_kappa",
    "log_ir_metrics",
    "log_binary_eval",
    "rank_results",
    "check_and_prep_data",
    "check_clust_data",
    "prep_linkage_data",
    "prep_clus_data",
    "preprocess_any_data",
    "serialize_columns",
    "convert_to_text",
    "load_model",
    "save_model",
    "infer_embeddings",
    "prep_paired_label_data",
    "edges_from_clusters",
    "train_model",
    "train_clf_model",
    "transform_column",
    "save_prepared",
    "Encoder",
    "HashNgramEncoder",
    "PrecomputedEncoder",
    "resolve_encoder",
    "cluster",
    "clusters_from_edges",
    "cosine_similarity_corresponding_pairs",
    "apply_in_chunks",
    "tokenize_data_for_inference",
    "load_clf",
    "get_completion_from_messages",
    "predict_rows_with_openai",
    "openai_transform",
    "infer_embeddings_with_gemini",
    "read_csv",
    "read_excel",
    "read_jsonl",
    "write_jsonl",
    "save_bucketed",
    "save_partitioned",
    "read_bucketed",
]

__version__ = "0.1.0"
