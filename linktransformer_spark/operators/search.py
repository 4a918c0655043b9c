"""BM25 keyword search over a document corpus — inverted-index joins.

Part of the beyond-the-reference training-data tier (the reference's
query surface is embedding-based; corpus curation also needs exact
keyword retrieval: building eval slices, pulling topic subsets,
contamination forensics). Okapi BM25 per Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond".

Why this shape at 100 TB: there is no index *structure* to build —
the posting list IS a DataFrame ``(term, doc, tf)``, and retrieval is
an equi-join of query terms against it (AQE broadcasts the query side
while it fits). Every aggregate partial-aggregates map-side; the only
per-(query, doc) state is the order-pinned score fold. Nothing leaves
the JVM.

Determinism: the BM25 score sums double contributions across matched
terms; a plain SUM's partial-aggregation order is engine- and
partitioning-dependent, so the fold accumulates in term sort order
(same array_sort/aggregate pattern as unigram_lm_score and DSIR) —
bit-identical across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "q_id",
    query_col: str = "q_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25.

    Tokenization is the engine's standard word tokenizer (lowercase,
    whitespace split — functions/similarity.word_tokens, SQL twin
    ``sql_word_tokens``); query terms are deduplicated per query (the
    classic sum-over-unique-terms form). IDF is the Lucene-style
    non-negative variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Returns ``(query_id, id_col, rank, score, n_terms)`` — ``rank`` is
    1-based by ``score DESC, id ASC``; ``n_terms`` counts matched query
    terms. Queries matching nothing produce no rows (left-join against
    the query table to see them).

    Plan: one doc-side explode -> (doc, term, tf) groupBy (map-side
    combine; the shuffle carries distinct (doc, term) rows, not token
    occurrences), lineage-cut once and reused for doc lengths, df/IDF,
    and the posting join; corpus stats (N, avgdl) are a broadcast
    one-row aggregate; candidates = query-term equi-join on term; top-k
    is a rank window with WindowGroupLimit pushdown.

    ``max_df_ratio`` (opt-in) drops query terms whose document
    frequency exceeds that fraction of the corpus — classic stopword
    impact pruning. On a corpus where some terms appear in nearly
    every document, those terms contribute ~0 IDF but dominate the
    posting-join volume (a term in every doc costs |Q|x|corpus|
    candidate rows); pruning them bounds the join at
    |Q| x max_df_ratio x N per term, which is the knob that keeps
    retrieval latency flat as the corpus grows to 100 TB. Changes
    scores only by the pruned terms' (near-zero) contributions, and
    changes ``n_terms`` accordingly.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_df_ratio is not None and not 0.0 < max_df_ratio <= 1.0:
        raise ValueError("max_df_ratio must be in (0, 1]")
    dtc = (
        docs.select(
            F.col(id_col).alias("_d"),
            F.explode(S.word_tokens(F.col(text_col))).alias("_tok"),
        )
        .groupBy("_d", "_tok")
        .agg(F.count("*").alias("_tf"))
        .localCheckpoint(eager=False)
    )
    dl = dtc.groupBy("_d").agg(F.sum("_tf").alias("_dl"))
    stats = dl.agg(
        F.count("*").alias("_N"),
        (F.sum("_dl").cast("double") / F.count("*")).alias("_avgdl"),
    )
    dfreq = dtc.groupBy("_tok").agg(F.count("*").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "_tok",
        F.log(
            F.lit(1.0)
            + (F.col("_N").cast("double") - F.col("_df") + F.lit(0.5))
            / (F.col("_df") + F.lit(0.5))
        ).alias("_idf"),
        "_avgdl",
    )
    qterms = (
        queries.select(
            F.col(query_id).alias("_q"),
            F.explode(S.word_tokens(F.col(query_col))).alias("_tok"),
        )
        .distinct()
    )
    if max_df_ratio is not None:
        # prune BEFORE the posting join: the df relation is vocab-sized
        keep = (
            dfreq.crossJoin(F.broadcast(stats))
            .filter(
                F.col("_df").cast("double")
                <= F.lit(max_df_ratio) * F.col("_N").cast("double")
            )
            .select("_tok")
        )
        qterms = qterms.join(keep, "_tok", "left_semi")
    contrib = (
        qterms.join(dtc, "_tok")
        .join(idf, "_tok")
        .join(dl, "_d")
        .select(
            "_q",
            "_d",
            "_tok",
            (
                F.col("_idf")
                * (F.col("_tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("_tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * (F.col("_dl").cast("double") / F.col("_avgdl"))
                    )
                )
            ).alias("_c"),
        )
    )
    scored = contrib.groupBy("_q", "_d").agg(
        F.count("*").alias("_nt"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_tok").alias("t"), F.col("_c").alias("c")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("_score"),
    )
    w = Window.partitionBy("_q").orderBy(F.col("_score").desc(), F.col("_d").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.col("_q").alias(query_id),
            F.col("_d").alias(id_col),
            F.col("_r").cast("int").alias("rank"),
            F.col("_score").alias("score"),
            F.col("_nt").cast("long").alias("n_terms"),
        )
    )
