"""Order-pinned deterministic float accumulation, window form.

The repo-wide float-parity pattern is the fold
``aggregate(array_sort(collect_list(struct(key, val))), 0.0,
(acc, x) -> acc + x.v)`` inside a ``groupBy().agg(...)`` — sequential
left-to-right double addition in ``key`` order, reproducible across
engines and layouts. Its execution cost is NOT the additions: the
``collect_list`` forces ObjectHashAggregate (whole-stage codegen
disabled for the whole aggregate) and ``aggregate`` is a
CodegenFallback higher-order function (interpreted per element).
Measured on the BM25 retrieval tail at sf0.1 (2.7M input rows):
5.44s for the fold vs 1.41s for this window form — 3.9x, bit-identical
digests over the full-precision doubles.

Window form: a running ``sum(val)`` over
``partitionBy(groups).orderBy(key).rowsBetween(unboundedPreceding,
currentRow)`` accumulates the IDENTICAL left-to-right sequence, and
``max_by(running, key)`` picks the last (= total) value. Equality
argument, exact: the fold computes ``((0.0 + v1) + v2) + ...`` while
the running sum computes ``(v1 + v2) + ...``. ``0.0 + v1 == v1``
bit-exactly for every double except ``v1 = -0.0`` (which becomes
``+0.0``); the two sequences can therefore differ only while every
accumulated element is exactly ``-0.0``, so the final values differ
at most in the sign of a zero total — and the trailing ``+ 0.0``
(which maps ``-0.0`` to ``+0.0`` and is the bit-exact identity on
every other double, NaN included) removes exactly that case. NaN and
infinity propagation is identical in both forms.

Contract: ``key`` must be distinct within each group (true at every
call site — the fold's ``array_sort`` tie order on equal keys would
itself be nondeterministic otherwise, so the distinctness requirement
is not new).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RUN_COL = "_pinned_run"


def with_running_sum(
    df: DataFrame, group_cols: list[str], key, val,
    out: str = RUN_COL,
) -> DataFrame:
    """Attach the running order-pinned sum of ``val`` in ``key`` order
    per ``group_cols`` as column ``out``. Follow with
    ``.groupBy(*group_cols).agg(pinned_total(key, out), ...)`` —
    the groupBy reuses the window's exchange (same keys)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(key).asc() if isinstance(key, str) else key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(val).over(w))


def pinned_total(key, run: str = RUN_COL) -> Column:
    """Aggregate expression extracting the group total from the
    running column: the running value at the LAST key, normalized by
    ``+ 0.0`` (see module doc for the bit-exactness argument)."""
    return F.max_by(run, F.col(key) if isinstance(key, str) else key) + F.lit(0.0)
