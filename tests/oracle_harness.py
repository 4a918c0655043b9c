"""Shared driver-style comparison: Spark result vs DuckDB oracle.

Mimics the driver's t2 gate: row count + schema width + order-insensitive
value comparison (we compare sorted tuples with float tolerance instead
of hashing, which is stricter in practice and gives usable diffs).
"""

from __future__ import annotations

import math


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _nonekey(t):
    # None is not orderable against floats/strings; sort None-last with
    # a type tag so mixed-type columns (nullable lift etc.) still sort
    return tuple(
        (v is None, "" if v is None else type(v).__name__, 0 if v is None else v)
        for v in t
    )


def rows_of_spark(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_nonekey
    )


def rows_of_duck(con, sql, columns):
    rel = con.sql(sql)
    idx = [rel.columns.index(c) for c in sorted(columns)]
    return sorted(
        (tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()),
        key=_nonekey,
    )


def compare(spark_df, con, sql, max_diff_print: int = 5):
    got = rows_of_spark(spark_df)
    want = rows_of_duck(con, sql, spark_df.columns)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    diffs = [(g, w) for g, w in zip(got, want) if g != w]
    assert not diffs, f"{len(diffs)} row diffs, first: {diffs[:max_diff_print]}"
