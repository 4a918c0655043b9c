"""Row-wise and all-pairs scoring (SURVEY §2.2 ops 6-7).

- ``evaluate_pairs``: cosine of the two column-sets of the SAME row
  (/root/reference/src/linktransformer/infer.py:316-375,
  utils.py:102-107). No join at all — a single projection.
- ``all_pair_combos_evaluate``: full n x n score matrix, returned as the
  3-column frame (left_key, right_key, score) — note the reference
  returns only the key columns + score, not full rows (infer.py:558).
  Spark form: embed each side ONCE on the distinct keys, then crossJoin
  — the embed-once trick generalized (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.serialize import DEFAULT_SEP, serialize_columns
from ..ids import check_reserved
from . import knn_join as KJ
from .knn_join import resolve_scorer
from ..functions import similarity as S


def evaluate_pairs(
    df: DataFrame,
    left_on,
    right_on,
    model=None,
    score_col: str = "score",
) -> DataFrame:
    """Attach ``score`` = similarity of the row's own (left_on, right_on)
    column sets. Map-only: no shuffle, no join."""
    check_reserved(df)
    scorer = resolve_scorer(model)
    lkey = serialize_columns(left_on, DEFAULT_SEP)
    rkey = serialize_columns(right_on, DEFAULT_SEP)
    if scorer.needs_embeddings:
        enc = scorer.encoder
        df = df.withColumn("_lt_key_l", lkey).withColumn("_lt_key_r", rkey)
        df = enc.encode(df, "_lt_key_l", "_lt_emb_l") if enc.expression_based \
            else enc.encode_distinct(df, "_lt_key_l", "_lt_emb_l")
        df = enc.encode(df, "_lt_key_r", "_lt_emb_r") if enc.expression_based \
            else enc.encode_distinct(df, "_lt_key_r", "_lt_emb_r")
        out = df.withColumn(score_col, S.dot(F.col("_lt_emb_l"), F.col("_lt_emb_r")))
        return out.drop("_lt_key_l", "_lt_key_r", "_lt_emb_l", "_lt_emb_r")
    return df.withColumn(score_col, S.lev_sim(lkey, rkey))


def all_pair_combos_evaluate(
    df: DataFrame,
    left_on,
    right_on,
    model=None,
) -> DataFrame:
    """n x n cross product of the distinct key strings, scored.

    Output: (<left key col(s) serialized name>, <right ...>, score) —
    matches the reference's 3-column shape (infer.py:546-558). The
    distinct() before the crossJoin is the embed-once CSE; the cross
    join itself is O(n^2) by definition of the operator.
    """
    check_reserved(df)
    scorer = resolve_scorer(model)
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = [right_on] if isinstance(right_on, str) else list(right_on)
    lname = "-".join(left_on)
    rname = "-".join(right_on)

    # NOTE: the reference scores all n x n ROW combinations (duplicates
    # included, infer.py:537-556), so no distinct() here — multiplicity
    # is part of the output contract. The embed-once CSE still applies
    # inside encode_distinct for UDF-backed encoders.
    l = df.select(serialize_columns(left_on, DEFAULT_SEP).alias(lname))
    r = df.select(serialize_columns(right_on, DEFAULT_SEP).alias(rname))
    l = KJ.ensure_parallelism(l)
    if scorer.needs_embeddings:
        enc = scorer.encoder
        l = enc.encode(l, lname, "_lt_emb_l")
        r = enc.encode(r, rname, "_lt_emb_r")
        out = l.crossJoin(r).withColumn(
            "score", S.dot(F.col("_lt_emb_l"), F.col("_lt_emb_r"))
        )
        return out.select(lname, rname, "score")
    out = l.crossJoin(r).withColumn("score", S.lev_sim(F.col(lname), F.col(rname)))
    return out.select(lname, rname, "score")
