"""Row-id plumbing.

The reference injects a positional id ``id_lt = np.arange(len(df))`` into
every input and joins results back by position
(/root/reference/src/linktransformer/infer.py:95-101, 159-161). Spark has
no row order, so every operator here carries an *explicit* id column:

- If the caller supplies ``id_col`` (a pre-existing unique key such as
  ``c_custkey``) we use it directly — zero extra cost, fully
  deterministic, and the scale-correct choice (no global sort).
- Otherwise ``deterministic=True`` derives an id with
  ``row_number() OVER (ORDER BY <all columns>)`` — a total order on row
  content. That is a single-partition sort, acceptable for parity tests
  and small refs, NOT for 100 TB inputs (documented; callers on big data
  pass ``id_col``).
- ``deterministic=False`` uses ``monotonically_increasing_id()`` —
  unique, distributed, order-undefined. Fine whenever "keep first"
  semantics are not observable in the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LT_ID = "_lt_id"
RESERVED_COLS = (LT_ID, "_lt_left_id", "_lt_right_id", "_lt_key", "_lt_emb", "score")


def check_reserved(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Mirror the reference's reserved-name collision check
    (/root/reference/src/linktransformer/infer.py:95-98)."""
    bad = [c for c in df.columns if c in RESERVED_COLS and c not in allow]
    if bad:
        raise ValueError(
            f"Input DataFrame already contains reserved column(s) {bad}; "
            "rename them before calling this operator."
        )


def with_row_id(
    df: DataFrame,
    id_col: str | None = None,
    out_col: str = LT_ID,
    deterministic: bool = True,
) -> DataFrame:
    """Attach a unique row id column named ``out_col``. See module doc."""
    if id_col is not None:
        if id_col not in df.columns:
            raise ValueError(f"id_col {id_col!r} not in {df.columns}")
        return df.withColumn(out_col, F.col(id_col).cast("long"))
    if df.isStreaming:
        raise ValueError(
            "streaming input requires an explicit id_col= (derived row "
            "ids need a global order, which a stream does not have)"
        )
    if deterministic:
        # total order on full row content -> stable "first row" semantics.
        # single-partition sort: test/parity path only.
        order = [F.col(c).asc_nulls_first() for c in df.columns]
        return df.withColumn(out_col, F.row_number().over(Window.orderBy(*order)).cast("long"))
    return df.withColumn(out_col, F.monotonically_increasing_id())


def min_id_first(df: DataFrame, subset: list[str], id_col: str = LT_ID) -> DataFrame:
    """pandas ``drop_duplicates(keep="first")`` parity: keep the row with
    the minimum id per key (/root/reference/src/linktransformer/infer.py:477).
    Spark's ``dropDuplicates`` keeps an arbitrary row, so we use a window.
    Implemented as row_number over (key) ordered by id — one shuffle on
    ``subset``, map-side partial via AQE; scales with the group count.
    """
    w = Window.partitionBy(*subset).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_lt_rn", F.row_number().over(w))
        .filter(F.col("_lt_rn") == 1)
        .drop("_lt_rn")
    )


def require_integral_id(df: DataFrame, id_col: str, op: str) -> None:
    """Raise unless ``id_col`` is an integral column. The dedup/ANN/DSIR
    family casts ids to long internally — a string id would cast to
    null and silently collapse or drop rows, so fail loudly instead."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if not isinstance(
        df.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise ValueError(
            f"{op}: id_col {id_col!r} must be an integral type, got "
            f"{df.schema[id_col].dataType.simpleString()}; add a surrogate "
            "id (ids.with_row_id) first"
        )
