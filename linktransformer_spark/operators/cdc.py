"""Slowly-changing-dimension (SCD Type 2) history maintenance — the
lakehouse upsert that keeps FULL attribute history instead of
overwriting (Kimball's dimension-versioning pattern; the table_diff
sibling that APPLIES changes rather than reporting them).

Beyond-the-reference extension: a training-data platform versions its
dimension tables (source registries, license states, domain quality
tiers) so that any past training run remains reproducible against the
dimension values it actually saw.

Spark-first shape: everything is hash joins + unions on the key —
closed history passes through untouched, open rows join the
(deduplicated) update batch once, and the null-safe attribute
comparison decides close-and-reopen vs pass-through. No windows over
the history, no Python; output volume = history + changed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str] | str,
    *,
    ts_col: str = "ts",
    compare_cols: list[str] | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 history table.

    ``history`` carries one row per (key, version): the key columns,
    the tracked attribute columns, ``valid_from`` and ``valid_to``
    (null = the open/current version). ``updates`` carries the key
    columns, the attributes, and ``ts_col`` (the effective time).
    Returns the NEW history:

    - closed versions (``valid_to`` not null) pass through untouched;
    - an open version whose attributes differ (null-safe) from its
      update CLOSES at the update's ts, and a new open version starts
      there;
    - an open version whose update carries identical attributes passes
      through (no empty versions);
    - keys seen only in ``updates`` insert as new open versions;
    - keys with no update pass through.

    Multiple updates per key in one batch collapse to the LATEST
    (max ts; ties break on the serialized attribute values ASC —
    deterministic). Updates whose ts precedes the open version's
    ``valid_from`` still apply at their own ts (out-of-order feeds
    should be replayed in order; this operator is one batch step).

    100 TB shape: one deterministic per-key dedup window over the
    UPDATE batch (batch-sized, not history-sized), one hash join of
    open rows against it, unions. History never shuffles more than
    once on the key; output grows only by changed + inserted rows.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in history.columns
            if c not in keys + [valid_from_col, valid_to_col]
            and c in updates.columns
        ]
    for c in keys + compare_cols:
        if c not in history.columns:
            raise ValueError(f"column {c!r} not in history")
        if c not in updates.columns:
            raise ValueError(f"column {c!r} not in updates")
    for c in (valid_from_col, valid_to_col):
        if c not in history.columns:
            raise ValueError(f"column {c!r} not in history")
    if ts_col not in updates.columns:
        raise ValueError(f"column {ts_col!r} not in updates")

    from pyspark.sql import Window

    from ..functions.serialize import serialize_columns

    ts = F.col(ts_col).cast("timestamp")
    # latest update per key, deterministic on ts ties
    dedup_w = Window.partitionBy(*keys).orderBy(
        F.col("_uts").desc(), serialize_columns(compare_cols).asc()
    )
    upd = (
        updates.select(*keys, *compare_cols, ts.alias("_uts"))
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    closed = history.filter(F.col(valid_to_col).isNotNull())
    open_ = history.filter(F.col(valid_to_col).isNull())

    u = upd.select(
        *[F.col(c).alias(f"_u_{c}") for c in keys],
        *[F.col(c).alias(f"_uv_{c}") for c in compare_cols],
        "_uts",
    )
    cond = [F.col(k) == F.col(f"_u_{k}") for k in keys]
    j = open_.join(u, cond, "left")

    same = None
    for c in compare_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_uv_{c}"))
        same = eq if same is None else (same & eq)
    if same is None:  # no tracked attributes: any update is a no-op
        same = F.lit(True)

    matched = F.col("_uts").isNotNull()
    hist_cols = history.columns

    # open rows: unchanged (no update, or identical attributes)
    untouched = j.filter(~matched | same).select(*hist_cols)
    # open rows with a differing update: close at the update ts...
    closed_now = (
        j.filter(matched & ~same)
        .select(
            *[c for c in hist_cols if c != valid_to_col],
            F.col("_uts").alias(valid_to_col),
        )
        .select(*hist_cols)
    )
    # ...and reopen with the new attributes
    reopened = j.filter(matched & ~same).select(
        *keys,
        *[F.col(f"_uv_{c}").alias(c) for c in compare_cols],
        F.col("_uts").alias(valid_from_col),
        F.lit(None).cast(dict(history.dtypes)[valid_to_col]).alias(valid_to_col),
    ).select(*hist_cols)
    # brand-new keys: insert as open versions
    inserted = (
        u.join(
            open_.select(*[F.col(k).alias(f"_u_{k}") for k in keys]),
            [f"_u_{k}" for k in keys],
            "left_anti",
        )
        .select(
            *[F.col(f"_u_{k}").alias(k) for k in keys],
            *[F.col(f"_uv_{c}").alias(c) for c in compare_cols],
            F.col("_uts").alias(valid_from_col),
            F.lit(None).cast(dict(history.dtypes)[valid_to_col]).alias(valid_to_col),
        )
        .select(*hist_cols)
    )
    return (
        closed.select(*hist_cols)
        .unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(reopened)
        .unionByName(inserted)
    )
