"""Point-in-time (as-of) join — a training-data-pipeline staple Spark
has no native operator for (pandas ships ``merge_asof``; the reference
is batch pandas but never uses it, so this is a north-star extension,
same family as the events sessionize/rollup substrate).

Semantics (pandas ``merge_asof`` parity): for every left row, attach
the single right row with the largest ``on`` value <= the left's
(direction="backward"; ">=" and smallest for "forward"; smallest
|gap| with ties going backward for "nearest"), matching within ``by``
groups, optionally within ``tolerance``.

Spark-first plan — the union+window trick, ONE shuffle total:

    left(+side=1)  UNION  right(+side=0, payload packed in ONE struct)
      -> Window.partitionBy(by).orderBy(ts, side, rid)
         last(payload_struct, ignorenulls=True)  [running carry-forward]
      -> filter side=1, unpack struct fields

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

The payload is carried ATOMICALLY: all right columns ride in a single
struct that is non-null for every right row (even when every field in
it is null), and ONE ``last(struct, ignorenulls=True)`` carries it.
Per-column carries would backfill a null field of the matched row from
an OLDER right row — mixing columns of different right rows, which
pandas merge_asof never does (it attaches the matched row verbatim,
nulls included).

Determinism: ties on (ts) between right rows are broken by
``right_id_col`` ascending — the LAST one in window order wins, i.e.
the largest id; document and mirror in the oracle. Without a
``right_id_col`` the tie-break falls back to ``xxhash64(payload)``
(largest hash wins) so the carried match is stable across runs and
partition layouts; right rows with bit-identical payloads remain
interchangeable. ``side`` ordering encodes ``allow_exact_matches``:
with exact matches allowed the right row sorts BEFORE a left row at
the same ts (visible to it), without it sorts after.

Column naming (pandas suffix rules, both sides): the ``on`` key keeps
its bare left name (pandas emits a single key column); any OTHER left
column colliding with a right payload name gets ``suffixes[0]`` and
the right column gets ``suffixes[1]``. Unlike pandas we also keep the
matched right ordering column (suffixed) so tolerance/inspection
survive into the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "_asof_ts"
_SIDE = "_asof_side"
_RID = "_asof_rid"
_P = "_asof_payload"
_PB = "_asof_pb"
_PF = "_asof_pf"


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
    matched right row's payload columns (suffixed on name collision,
    both sides — see module docstring), nulls when no right row
    qualifies.

    ``on``/``right_on``: ordering column (timestamp or numeric).
    ``by``: equality keys (the shuffle partition keys).
    ``tolerance``: max |left.on - right.on| for a match — seconds when
    ``on`` is a timestamp, plain difference when numeric.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    r_on = right_on or on
    by = [by] if isinstance(by, str) else list(by or [])

    # right payload = everything except the by keys, packed into ONE
    # struct (atomic carry; ordering col and id ride along inside so
    # tolerance/tie-break/inspection survive)
    def _hashable_payload_hash(rel, cols):
        from pyspark.sql.types import MapType

        fields = rel.schema[_P].dataType
        ok = [c for c in cols if not isinstance(fields[c].dataType, MapType)]
        if not ok:
            return F.lit(0).cast("long")
        return F.xxhash64(*[F.col(_P)[c] for c in ok])

    payload = [c for c in right.columns if c not in by]
    r_side = right.select(
        *[F.col(c) for c in by],
        F.struct(*[F.col(c).alias(c) for c in payload]).alias(_P),
    )
    payload_type = r_side.schema[_P].dataType
    for c in left.columns:
        if c not in by:
            r_side = r_side.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_side = (
        r_side.withColumn(_TS, F.col(_P)[r_on])
        .withColumn(_SIDE, F.lit(0 if allow_exact_matches else 1))
        .withColumn(
            _RID,
            F.col(_P)[right_id_col].cast("long")
            if right_id_col
            # deterministic surrogate: without an id column, equal-ts
            # right rows in a by-group would otherwise be ordered by
            # partition layout and the carried match would drift run to
            # run; hash ties only between bit-identical payloads.
            # xxhash64 rejects MapType inputs, so hash only the
            # hashable payload fields (all-map payloads fall back to
            # the old arbitrary-tie lit(0))
            else _hashable_payload_hash(r_side, payload),
        )
    )
    l_side = (
        left.withColumn(_P, F.lit(None).cast(payload_type))
        .withColumn(_TS, F.col(on))
        .withColumn(_SIDE, F.lit(1 if allow_exact_matches else 0))
        .withColumn(_RID, F.lit(None).cast("long"))
    )

    # null ordering keys never match (pandas merge_asof raises on
    # them; we accept the rows but keep them out of the matching): a
    # null-ts right row would sort nulls-first and become everybody's
    # "backward" candidate with an undefined gap — drop it from the
    # union; null-ts left rows get a null match below.
    r_side = r_side.filter(F.col(_TS).isNotNull())
    u = l_side.unionByName(r_side.select(*l_side.columns))

    # NULLS-pinned ordering (engines disagree on default null order):
    # left rows carry _RID null -> coalesce keeps the frame total; left
    # and right rows never tie on (ts, side) with each other (side
    # separates them), and left-left order is irrelevant to the carry.
    def _carry_window(ts_ord):
        return (
            Window.partitionBy(*by)
            .orderBy(
                ts_ord, F.col(_SIDE).asc(), F.coalesce(F.col(_RID), F.lit(-1)).asc()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    ts_is_timestamp = dict(left.dtypes)[on].startswith("timestamp")

    def _abs_gap(lts, rts):
        if ts_is_timestamp:
            return F.abs(
                (F.unix_micros(lts) - F.unix_micros(rts)).cast("double") / 1e6
            )
        return F.abs(lts.cast("double") - rts.cast("double"))

    if direction == "nearest":
        # both carries over the SAME union: one Exchange on `by`, two
        # in-partition sorts (asc + desc). Per left row pick the struct
        # with the smaller |gap|; gap ties go backward (pandas rule).
        carried = u.withColumn(
            _PB, F.last(F.col(_P), ignorenulls=True).over(_carry_window(F.col(_TS).asc()))
        ).withColumn(
            _PF, F.last(F.col(_P), ignorenulls=True).over(_carry_window(F.col(_TS).desc()))
        )
        out = carried.filter(F.col(_SIDE) == F.lit(1 if allow_exact_matches else 0))
        gb = _abs_gap(F.col(on), F.col(_PB)[r_on])
        gf = _abs_gap(F.col(on), F.col(_PF)[r_on])
        pick = (
            F.when(F.col(_PF).isNull(), F.col(_PB))
            .when(F.col(_PB).isNull(), F.col(_PF))
            .when(gf < gb, F.col(_PF))
            .otherwise(F.col(_PB))
        )
        out = out.withColumn(_P, pick).drop(_PB, _PF)
    else:
        ts_ord = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
        matched = u.withColumn(
            _P, F.last(F.col(_P), ignorenulls=True).over(_carry_window(ts_ord))
        )
        out = matched.filter(F.col(_SIDE) == F.lit(1 if allow_exact_matches else 0))

    # left rows with a null ordering key: no match by definition (the
    # desc carry would otherwise hand nulls-last left rows the
    # smallest-ts right row)
    out = out.withColumn(_P, F.when(F.col(on).isNotNull(), F.col(_P)))

    if tolerance is not None:
        rts = F.col(_P)[r_on]
        gap = _abs_gap(F.col(on), rts)
        # null out the WHOLE struct when out of tolerance — the match is
        # all-or-nothing, never a partial row
        keep = rts.isNotNull() & (gap <= F.lit(float(tolerance)))
        out = out.withColumn(_P, F.when(keep, F.col(_P)))

    # final naming: pandas suffix rules on BOTH sides — the on key keeps
    # its bare left name; other collisions get suffixes[0]/suffixes[1]
    left_names = set(left.columns)
    payload_names = set(payload)
    sel = []
    for c in left.columns:
        if c in payload_names and c != on and c not in by:
            sel.append(F.col(c).alias(c + suffixes[0]))
        else:
            sel.append(F.col(c))
    for c in payload:
        final = c + suffixes[1] if c in left_names else c
        sel.append(F.col(_P)[c].alias(final))
    return out.select(*sel)
