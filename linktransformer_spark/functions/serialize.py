"""Column serialization: N key columns -> one match-key string.

Reference: ``serialize_columns`` joins columns with the tokenizer's sep
token (fallback ``</s>``, ``<SEP>`` for API embedding models), coercing
nulls/values via ``str(v)`` with null -> ""
(/root/reference/src/linktransformer/utils.py:116-176,
/root/reference/src/linktransformer/infer.py:113-122).

Spark form: ``concat_ws(sep, coalesce(cast(c as string), ''))`` — pure
Catalyst, fully codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SEP = "</s>"
API_SEP = "<SEP>"


def serialize_columns(cols: list[str] | str, sep: str = DEFAULT_SEP) -> Column:
    """Expression producing the serialized match key for ``cols``.

    Single column -> coalesce(cast string, ''); multi -> sep-joined.
    """
    if isinstance(cols, str):
        cols = [cols]
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    if len(parts) == 1:
        return parts[0]
    # concat_ws skips nulls, but we've already coalesced so every part
    # contributes, matching the reference's str(v)/"" behavior.
    return F.concat_ws(sep, *parts)


def convert_to_text(col: Column | str) -> Column:
    """ASCII-fold: drop every non-ASCII character — column form of the
    reference's ``convert_to_text``
    (/root/reference/src/linktransformer/preprocess.py:13-14,
    ``s.encode('ascii', 'ignore').decode('ascii')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^\x00-\x7F]", "")


def resolve_keys(
    df1_cols: list[str],
    df2_cols: list[str],
    on=None,
    left_on=None,
    right_on=None,
) -> tuple[list[str], list[str]]:
    """Key-resolution semantics of the reference
    (/root/reference/src/linktransformer/infer.py:56-65): explicit
    left_on/right_on win; else ``on``; else the sorted intersection of
    column names."""
    def _as_list(v):
        if v is None:
            return None
        return [v] if isinstance(v, str) else list(v)

    left_on = _as_list(left_on)
    right_on = _as_list(right_on)
    on = _as_list(on)
    if (left_on is None) != (right_on is None):
        raise ValueError("left_on and right_on must be given together")
    if left_on is not None:
        return left_on, right_on
    if on is None:
        on = sorted(set(df1_cols) & set(df2_cols))
        if not on:
            raise ValueError("no common columns to merge on; pass on= or left_on/right_on")
    missing_l = [c for c in on if c not in df1_cols]
    missing_r = [c for c in on if c not in df2_cols]
    if missing_l or missing_r:
        raise ValueError(f"merge keys missing: left={missing_l} right={missing_r}")
    return on, on
