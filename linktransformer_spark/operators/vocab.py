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

__all__ = ["token_counts", "top_vocab", "collocations"]


def token_counts(df: DataFrame, on: str = "text", *, min_count: int = 1) -> DataFrame:
    """(token, n) frequency table over lowercased whitespace tokens."""
    out = (
        df.select(F.explode(word_tokens(F.col(on))).alias("token"))
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

    bi = (
        df.select(F.explode(pairs).alias("p"))
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
            df.select(
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
