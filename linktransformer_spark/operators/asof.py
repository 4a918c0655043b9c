"""Point-in-time (as-of) join — a training-data-pipeline staple Spark
has no native operator for (pandas ships ``merge_asof``; the reference
is batch pandas but never uses it, so this is a north-star extension,
same family as the events sessionize/rollup substrate).

Semantics (pandas ``merge_asof`` parity): for every left row, attach
the single right row with the largest ``on`` value <= the left's
(direction="backward"; ">=" and smallest for "forward"), matching
within ``by`` groups, optionally within ``tolerance``.

Spark-first plan — the union+window trick, ONE shuffle total:

    left(+side=1)  UNION  right(+side=0)
      -> Window.partitionBy(by).orderBy(ts, side, rid)
         last(right_payload, ignorenulls=True)  [running carry-forward]
      -> filter side=1

Both sides shuffle once on ``by`` (hash partition), each partition
sorts once, and the carry-forward is a running ``last(IGNORE NULLS)``
over ROWS UNBOUNDED PRECEDING — no range-join explosion, no per-key
driver loop, no second shuffle. Compare the join formulation: a
left.ts >= right.ts theta-join is O(|L|·|R|) within each key and needs
a top-1 reduction after; the union form is O((|L|+|R|) log) for the
sort. Skewed ``by`` keys concentrate in one partition — at 100 TB
pre-split hot keys by a time-bucket salt and as-of join within the
bucket, then resolve bucket boundaries with a second pass over the
bucket-leading rows (not implemented here; the testdata keys are
uniform).

Determinism: ties on (ts) between right rows are broken by
``right_id_col`` ascending — the LAST one in window order wins, i.e.
the largest id; document and mirror in the oracle. ``side`` ordering
encodes ``allow_exact_matches``: with exact matches allowed the right
row sorts BEFORE a left row at the same ts (visible to it), without it
sorts after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "_asof_ts"
_SIDE = "_asof_side"
_RID = "_asof_rid"
_PREFIX = "_asof_r_"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_on: str | None = None,
    right_id_col: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> DataFrame:
    """As-of join ``left`` to ``right``; returns every left row plus the
    matched right row's payload columns (suffixed on name collision),
    nulls when no right row qualifies.

    ``on``/``right_on``: ordering column (timestamp or numeric).
    ``by``: equality keys (the shuffle partition keys).
    ``tolerance``: max |left.on - right.on| for a match — seconds when
    ``on`` is a timestamp, plain difference when numeric.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r_on = right_on or on
    by = [by] if isinstance(by, str) else list(by or [])

    # right payload = everything except the by keys; ordering col and id
    # ride along (prefixed) so tolerance/tie-break/inspection survive
    payload = [c for c in right.columns if c not in by]
    l_side = left
    for c in payload:
        l_side = l_side.withColumn(_PREFIX + c, F.lit(None).cast(dict(right.dtypes)[c]))
    l_side = (
        l_side.withColumn(_TS, F.col(on))
        .withColumn(_SIDE, F.lit(1 if allow_exact_matches else 0))
        .withColumn(_RID, F.lit(None).cast("long"))
    )
    r_side = right.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(_PREFIX + c) for c in payload],
    )
    for c in left.columns:
        if c not in by:
            r_side = r_side.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_side = (
        r_side.withColumn(_TS, F.col(_PREFIX + r_on))
        .withColumn(_SIDE, F.lit(0 if allow_exact_matches else 1))
        .withColumn(
            _RID,
            F.col(_PREFIX + right_id_col).cast("long")
            if right_id_col
            else F.lit(0).cast("long"),
        )
    )

    u = l_side.unionByName(r_side.select(*l_side.columns))
    # NULLS-pinned ordering (engines disagree on default null order):
    # left rows carry _RID null -> coalesce to -1 so they sort before
    # right rows that share (ts, side) — irrelevant for matching (side
    # separates them) but keeps the frame total and deterministic.
    ts_ord = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_ord, F.col(_SIDE).asc(), F.coalesce(F.col(_RID), F.lit(-1)).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u
    for c in payload:
        matched = matched.withColumn(
            _PREFIX + c, F.last(F.col(_PREFIX + c), ignorenulls=True).over(w)
        )

    out = matched.filter(F.col(_SIDE) == F.lit(1 if allow_exact_matches else 0)).drop(
        _TS, _SIDE, _RID
    )

    if tolerance is not None:
        lts, rts = F.col(on), F.col(_PREFIX + r_on)
        if dict(left.dtypes)[on].startswith("timestamp"):
            gap = F.abs(
                (F.unix_micros(lts) - F.unix_micros(rts)).cast("double") / 1e6
            )
        else:
            gap = F.abs(lts.cast("double") - rts.cast("double"))
        keep = rts.isNotNull() & (gap <= F.lit(float(tolerance)))
        for c in payload:
            out = out.withColumn(
                _PREFIX + c,
                F.when(keep, F.col(_PREFIX + c)).otherwise(F.lit(None)),
            )

    # final naming: pandas suffix rules — right payload keeps its name
    # unless it collides with a surviving left column
    left_names = set(left.columns)
    for c in payload:
        final = c + suffixes[1] if c in left_names else c
        out = out.withColumnRenamed(_PREFIX + c, final)
    return out
