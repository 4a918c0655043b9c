"""DuckDB-dialect SQL mirrors of functions/similarity.py.

The driver's correctness gate runs our Spark query AND an ANSI-SQL
oracle side-by-side (see /root/repo/__spark_entry__.py). Every
deterministic kernel we use in Spark has a textual DuckDB twin here,
generated from the same constants, so the two can never drift apart
silently. All hashes are exact integer arithmetic; similarity scores
are single double divisions of exact integers — bit-identical across
engines.
"""

from __future__ import annotations

from .similarity import HASH_BASE, HASH_MOD


def sql_poly_hash(s: str, salt: int = 0) -> str:
    """DuckDB: polynomial rolling hash over code points of expr ``s``."""
    return (
        f"list_reduce(list_prepend(CAST({salt} AS BIGINT), "
        f"list_transform(list_filter(string_split({s}, ''), ch -> ch <> ''), "
        f"ch -> CAST(ord(ch) AS BIGINT))), "
        f"(acc, c) -> (acc * {HASH_BASE} + c) % {HASH_MOD})"
    )


def sql_char_ngrams(s: str, n: int) -> str:
    """DuckDB: all character n-grams of expr ``s`` (empty list if short)."""
    return (
        f"CASE WHEN length({s}) >= {n} THEN "
        f"list_transform(range(1, length({s}) - {n - 1} + 1), i -> {s}[i:i+{n - 1}]) "
        f"ELSE [] END"
    )


def sql_word_tokens(s: str) -> str:
    return f"list_filter(string_split_regex(lower({s}), '\\s+'), t -> t <> '')"


def sql_lev_sim(a: str, b: str) -> str:
    return (
        f"(1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE) / "
        f"CAST(greatest(length({a}), length({b}), 1) AS DOUBLE))"
    )


def sql_dot(a: str, b: str) -> str:
    """Sequential double dot product (mirrors similarity.dot)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def sql_l2_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({sql_dot(a, b)} / (greatest({sql_l2_norm(a)}, 1e-12) * "
        f"greatest({sql_l2_norm(b)}, 1e-12)))"
    )
