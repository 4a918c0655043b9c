"""One-pass table profiler (training-data-pipeline staple).

``profile_table`` computes, per column, in a SINGLE aggregation job
(map-side partial aggregation, one shuffle of one partial-state row
per task — no per-column jobs, no collect loops):

  n_rows, n_null, n_distinct, min/max, mean (numeric), min/max (string)

Exactness is a knob, because at 100 TB the two expensive pieces change
physical shape:

- ``exact=True``  : ``count(DISTINCT c)`` per column. Catalyst plans
  multi-distinct aggregates with an Expand (input replicated once per
  distinct column) — fine to a few hundred GB, the oracle-checkable
  path.
- ``exact=False`` : ``approx_count_distinct`` (HyperLogLog++) — pure
  partial aggregation, no Expand, the 100 TB path. Means switch from
  exact decimal-summed to plain double (partition-order float drift is
  possible but bounded; the HLL estimate is ±~2.3% anyway).

Float determinism for the oracle: numeric means are computed as
``CAST(sum(CAST(c AS DECIMAL(27,6))) AS DOUBLE) / n_nonnull`` — the
sum is exact decimal arithmetic in both engines, so the one double
division is bit-identical. Timestamps profile as epoch micros
(engine-portable), not formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format profile: one output row per column with
    (column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    mean, min_str, max_str). Numeric stats are null for string columns
    and vice versa; timestamps appear as epoch-micros numerics."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        dt = dtypes[c]
        if dt.startswith("timestamp"):
            # NTZ needs an explicit cast to session-tz (UTC-pinned)
            # timestamp before unix_micros accepts it
            col = F.unix_micros(col.cast("timestamp"))
            dt_num = True
        else:
            dt_num = _is_numeric(dt)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_null_{i}"))
        aggs.append(
            (
                F.count_distinct(col) if exact else F.approx_count_distinct(col)
            ).alias(f"_dist_{i}")
        )
        if dt_num:
            aggs.append(F.min(col).cast("double").alias(f"_min_{i}"))
            aggs.append(F.max(col).cast("double").alias(f"_max_{i}"))
            if exact:
                mean = F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(
                    col
                ).cast("double")
            else:
                mean = F.avg(col.cast("double"))
            aggs.append(mean.alias(f"_mean_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"_mins_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"_maxs_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_min_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"_max_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"_mean_{i}"))
            aggs.append(F.min(col.cast("string")).alias(f"_mins_{i}"))
            aggs.append(F.max(col.cast("string")).alias(f"_maxs_{i}"))

    wide = df.agg(*aggs)

    # one wide row -> |cols| long rows: stack is a driver-cheap reshape
    # of the already-aggregated scalars, no second pass over the data
    stack_args: list = [F.lit(len(cols))]
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.lit(dtypes[c]),
            F.col("_n"),
            F.col(f"_null_{i}"),
            F.col(f"_dist_{i}"),
            F.col(f"_min_{i}"),
            F.col(f"_max_{i}"),
            F.col(f"_mean_{i}"),
            F.col(f"_mins_{i}"),
            F.col(f"_maxs_{i}"),
        ]
    return wide.select(
        F.stack(*stack_args).alias(
            "column", "dtype", "n_rows", "n_null", "n_distinct",
            "min_num", "max_num", "mean", "min_str", "max_str",
        )
    )
