"""Vocabulary statistics for tokenizer construction and corpus audit:
token frequency tables with coverage, and bigram collocations scored
by pointwise mutual information (Church & Hanks 1990).

A BPE/unigram tokenizer build starts from exactly these two tables
(word-level pre-tokenization counts and high-PMI merge candidates);
at 100 TB both are classic one-shuffle aggregations whose OUTPUT is
tiny relative to the corpus (the vocabulary), which is what makes the
final ranking stages safe:

- ``token_counts``: explode + hash agg — one shuffle on the token,
  map-side combine does the heavy lifting (each mapper emits its
  distinct tokens once).
- ``top_vocab``: counts -> global top-k via orderBy+limit (Spark
  plans TakeOrderedAndProject — per-partition heaps, no full sort)
  -> rank/cumulative-coverage window over the k SURVIVORS only. The
  unbounded window runs on one partition by construction, but its
  input is vocab_size rows, not the corpus.
- ``collocations``: bigrams from a single array zip (map-side, no
  window, no self-join), hash agg per pair, two equi-joins back to
  the unigram table, PMI expression-side. The 1-row totals relation
  rides a sanctioned broadcast.

Tokenization is the engine-wide ``word_tokens`` pair (Spark:
functions/similarity.py, DuckDB: functions/oracle.py) so every oracle
mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import word_tokens

__all__ = ["token_counts", "top_vocab", "collocations", "tfidf_top_terms"]


def token_counts(df: DataFrame, on: str = "text", *, min_count: int = 1) -> DataFrame:
    """(token, n) frequency table over lowercased whitespace tokens.

    The tokenize+explode is the per-row-heavy stage; a small parquet
    input arrives as one scan split, so rows spread to the cores first
    (no-op at scale — see knn_join.ensure_parallelism)."""
    from .knn_join import ensure_parallelism

    out = (
        ensure_parallelism(df)
        .select(F.explode(word_tokens(F.col(on))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def top_vocab(df: DataFrame, on: str = "text", *, vocab_size: int = 1000) -> DataFrame:
    """Top ``vocab_size`` tokens by (count desc, token asc) with rank
    and corpus-coverage columns.

    Output: ``token, n, rank, frac, cum_frac`` — ``frac`` is the
    token's share of ALL token occurrences (not just the kept ones),
    ``cum_frac`` the running share in rank order, both rounded to 6
    decimals. ``cum_frac`` of the last row answers "how much of the
    corpus does a vocab of this size cover" — the number a tokenizer
    builder sizes against.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    cnt = token_counts(df, on)
    total = cnt.agg(F.sum("n").cast("long").alias("_total"))
    top = cnt.orderBy(F.col("n").desc(), F.col("token").asc()).limit(vocab_size)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # 1-row totals broadcast (sanctioned BNLJ, constant at any scale)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n",
            F.row_number().over(w).alias("rank"),
            F.round(F.col("n").cast("double") / F.col("_total").cast("double"), 6).alias("frac"),
            F.round(
                F.sum("n").over(wsum).cast("double") / F.col("_total").cast("double"), 6
            ).alias("cum_frac"),
        )
    )


def collocations(
    df: DataFrame,
    on: str = "text",
    *,
    min_count: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """Adjacent-bigram collocations scored by PMI.

    PMI = ln( p(w1,w2) / (p(w1) p(w2)) ) with p(w1,w2) = pair count /
    total bigrams and p(w) = token count / total tokens. Rows with
    pair count < ``min_count`` are dropped (PMI is noise at low
    counts); ``top_k`` keeps the strongest collocations by
    (pmi desc, w1, w2). Output: ``w1, w2, n_pair, pmi`` (pmi rounded
    to 6 decimals).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = word_tokens(F.col(on))
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    from .knn_join import ensure_parallelism

    dfp = ensure_parallelism(df)
    bi = (
        dfp.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    uni = token_counts(df, on)
    totals = uni.agg(
        F.sum("n").cast("long").alias("_n_tok"),
    ).crossJoin(
        F.broadcast(
            dfp.select(
                F.sum(
                    F.when(F.size(toks) >= 2, F.size(toks) - 1).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("_n_bi")
            )
        )
    )

    joined = (
        bi.join(uni.select(F.col("token").alias("w1"), F.col("n").alias("_c1")), "w1")
        .join(uni.select(F.col("token").alias("w2"), F.col("n").alias("_c2")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.col("_n_bi").cast("double"))
        / (
            (F.col("_c1").cast("double") / F.col("_n_tok").cast("double"))
            * (F.col("_c2").cast("double") / F.col("_n_tok").cast("double"))
        )
    )
    out = joined.select("w1", "w2", "n_pair", F.round(pmi, 6).alias("pmi"))
    if top_k is not None:
        out = out.orderBy(
            F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(top_k)
    return out


def tfidf_top_terms(
    df: DataFrame,
    on: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — the
    topic-labeling / corpus-audit primitive ("what is each document
    about", keyword extraction for slice discovery).

    tf is the raw in-document count; idf is the smoothed
    ``ln((1 + N) / (1 + df)) + 1`` (sklearn's ``smooth_idf`` form —
    never zero, so single-doc corpora still rank). Returns
    (``id_col``, ``term``, ``tf``, ``tfidf``, ``rank``), rank 1-based
    by (tfidf DESC, term ASC); ties in score resolve to the
    lexicographically first term. ``min_df`` drops hapax noise before
    ranking (df < min_df terms never surface).

    Plan: the same (doc, term, tf) relation the BM25 index builds —
    one explode + hash agg shuffle (map-side combine) — a vocab-sized
    df aggregate joined back on term, the 1-row N broadcast, and a
    per-doc rank window with WindowGroupLimit pushdown. The window
    partitions on the DOCUMENT key, so parallelism tracks documents;
    per-doc state is its distinct-term list. No Python anywhere.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    from .knn_join import ensure_parallelism

    dtc = (
        ensure_parallelism(df).select(
            F.col(id_col).alias("_d"),
            F.explode(word_tokens(F.col(on))).alias("term"),
        )
        .groupBy("_d", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    ndocs = dtc.agg(F.countDistinct("_d").alias("_N"))
    dfreq = dtc.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("_df") >= min_df)
    idf = dfreq.crossJoin(F.broadcast(ndocs)).select(
        "term",
        (
            F.log(
                (F.lit(1.0) + F.col("_N").cast("double"))
                / (F.lit(1.0) + F.col("_df").cast("double"))
            )
            + F.lit(1.0)
        ).alias("_idf"),
    )
    scored = dtc.join(idf, "term").select(
        "_d", "term", "tf", (F.col("tf").cast("double") * F.col("_idf")).alias("_s")
    )
    w = Window.partitionBy("_d").orderBy(F.col("_s").desc(), F.col("term").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.col("_d").alias(id_col),
            "term",
            "tf",
            F.col("_s").alias("tfidf"),
            F.col("_r").cast("int").alias("rank"),
        )
    )
