"""Deterministic sampling for training-data curation.

RNG-free by design: membership is a pure function of row CONTENT
(polynomial hash), so a sample is reproducible across runs, engines,
partitionings and retries — unlike ``df.sample()``, whose membership
depends on partition layout and seed plumbing. Content-hash sampling
is also the only kind an oracle can check exactly, and the only kind
that stays STABLE under incremental reprocessing at 100 TB: adding new
rows never changes which old rows are in the sample (the property that
keeps train/test contamination checks meaningful across pipeline
runs).

Both operators are map-only or single-window plans:
- ``hash_sample``      : filter on hash(key) % M < f*M — fuses into
  the scan, zero shuffles, trivially pushdown-friendly.
- ``sample_per_group`` : deterministic n-per-group via a
  (group, hash-order) window — one shuffle on the group key; the
  WindowGroupLimit rank pushdown bounds the per-partition sort at k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S

_M = 1_000_000  # hash-bucket modulus: fraction resolution 1e-6


def _key_expr(key_cols: list[str]) -> Column:
    # null-safe multi-column key; unit separator avoids accidental
    # concatenation collisions ("ab"+"c" vs "a"+"bc")
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols]
    return F.concat_ws("", *parts)


def hash_sample(
    df: DataFrame,
    key_cols: list[str] | str,
    fraction: float,
    salt: int = 0,
) -> DataFrame:
    """Keep rows whose content-hash bucket falls below ``fraction``.

    ``salt`` derives independent samples from the same keys (salt=0 and
    salt=1 samples overlap ~fraction², like independent draws); the
    same (keys, fraction, salt) always returns the same rows.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    bucket = S.poly_hash(_key_expr(keys), salt=salt) % _M
    return df.filter(bucket < F.lit(int(round(fraction * _M))))


def sample_per_group(
    df: DataFrame,
    by: list[str] | str,
    n: int,
    key_cols: list[str] | str | None = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic ``n`` rows per group: rank by (content-hash, key)
    inside each group, keep rank <= n. With ``key_cols`` unset the
    whole row's string form is the hash key. The hash order is a
    reproducible stand-in for 'uniformly random n per group'."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    by = [by] if isinstance(by, str) else list(by)
    keys = (
        [key_cols] if isinstance(key_cols, str)
        else list(key_cols) if key_cols is not None
        else [c for c in df.columns if c not in by]
    )
    key = _key_expr(keys)
    h = S.poly_hash(key, salt=salt)
    w = Window.partitionBy(*by).orderBy(h.asc(), key.asc())
    return (
        df.withColumn("_smp_rank", F.row_number().over(w))
        .filter(F.col("_smp_rank") <= n)
        .drop("_smp_rank")
    )


def sample_mixture(
    df: DataFrame,
    group_col: str,
    fractions: dict,
    key_cols: list[str] | str | None = None,
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic stratified mixture sampling — the data-mix
    curation step (down-weight web crawl, keep all of wiki/code, ...):
    per-group keep fractions applied with the same content-hash
    membership as :func:`hash_sample`, so the mixture is reproducible
    across runs/engines/partitionings and STABLE under incremental
    reprocessing (new rows never change which old rows are kept).
    Groups absent from ``fractions`` use ``default_fraction`` (0.0 =
    drop, the explicit-allowlist posture).

    Map-only: the per-group threshold is a chained ``when`` expression
    over ``group_col`` (no join, no shuffle; fuses into the scan).
    """
    for g, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for group {g!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    keys = (
        [key_cols] if isinstance(key_cols, str)
        else list(key_cols) if key_cols is not None
        else [c for c in df.columns if c != group_col]
    )
    bucket = S.poly_hash(_key_expr(keys), salt=salt) % _M
    thresh = F.lit(int(round(default_fraction * _M)))
    # deterministic build order -> deterministic plan text
    for g in sorted(fractions, key=str):
        thresh = F.when(
            F.col(group_col) == F.lit(g),
            F.lit(int(round(float(fractions[g]) * _M))),
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def hash_split(
    df: DataFrame,
    key_cols: list[str] | str,
    fractions: dict[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint splits (train/val/test) by content hash:
    appends ``split_col`` naming the split whose cumulative-fraction
    interval the row's hash bucket falls into. Same properties as
    :func:`hash_sample` — reproducible across runs/engines/partition
    layouts, STABLE under incremental reprocessing (new rows never move
    old rows between splits, the property that keeps "was this example
    in train?" answerable forever), map-only, zero shuffles.

    ``fractions`` assigns splits in dict order; they must sum to <= 1
    (the remainder, if any, gets a NULL split — filter or name it).
    Example: ``hash_split(df, "text", {"train": .8, "val": .1,
    "test": .1})``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = S.poly_hash(_key_expr(keys), salt=salt) % _M
    expr = F.lit(None).cast("string")
    cum = 0.0
    cases = []
    for name, frac in fractions.items():
        cum += frac
        cases.append((int(round(cum * _M)), name))
    # build WHEN chain from the highest bound down so the first (i.e.
    # lowest-bound) interval wins for its bucket range
    for bound, name in reversed(cases):
        expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
    key_cols: list[str] | str | None = None,
    salt: int = 0,
) -> DataFrame:
    """Temperature-rebalanced mixture sampling (the multilingual /
    multi-source rebalancing rule of Lample & Conneau 2019 / XLM-R:
    sample group g with probability proportional to ``count_g^alpha``).
    ``alpha=1`` keeps natural proportions, ``alpha -> 0`` approaches
    uniform-over-groups; 0.5-0.7 is the usual range for boosting
    low-resource sources without drowning the head.

    Deterministic and exact-n: group g receives
    ``target_g = min(count_g, floor(budget * w_g))`` rows with
    ``w_g = count_g^alpha / sum_h count_h^alpha``, and WHICH rows is
    the same content-hash order as :func:`sample_per_group` — stable
    across runs, engines and partitionings. Floor apportionment means
    ``sum(target_g) <= budget`` (remainders are dropped, not
    redistributed — reproducibility beats hitting the budget exactly);
    sampling is without replacement, so upweighted small groups cap at
    their own size rather than repeating rows.

    Plan: per-group counts are one hash aggregate (|groups| rows); the
    normalizer folds those counts in group-sort order (order-pinned
    float sum — cross-engine-reproducible); targets broadcast-join
    back; selection is one (group, hash-order) window with the
    WindowGroupLimit rank pushdown. For a shuffle-free approximate
    variant, feed the computed per-group fractions to
    :func:`sample_mixture` instead (hash-threshold membership: map-only
    but only ~target_g rows per group, not exactly).

    ``alpha=0.5`` routes through sqrt (IEEE-correctly-rounded in every
    engine — bit-exact oracle parity); other alphas use pow. Rows with
    a NULL group value form a group of their own (the target join is
    null-safe), so they draw from the budget like any other group.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = (
        [key_cols] if isinstance(key_cols, str)
        else list(key_cols) if key_cols is not None
        else [c for c in df.columns if c != group_col]
    )
    cnt = F.col("_n").cast("double")
    powed = F.sqrt(cnt) if alpha == 0.5 else F.pow(cnt, F.lit(float(alpha)))
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    scored = counts.select("_g", "_n", powed.alias("_wp"))
    # order-pinned normalizer: fold the (tiny) group relation sorted by
    # group value — a plain SUM's partial order is partition-dependent
    norm = scored.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_g").alias("g"), F.col("_wp").alias("w")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("_z")
    )
    targets = scored.crossJoin(F.broadcast(norm)).select(
        "_g",
        F.least(
            F.col("_n"),
            F.floor(F.lit(float(budget)) * F.col("_wp") / F.col("_z")).cast("long"),
        ).alias("_target"),
    )
    key = _key_expr(keys)
    # materialize the (expensive, per-character) content hash and the
    # serialized tie-break key as COLUMNS on a spread input BEFORE the
    # window: the window's sort runs in at most |groups| tasks, so an
    # inline ORDER BY poly_hash(text) expression would hash the whole
    # relation on a handful of cores (and a single-file scan feeds the
    # exchange from ONE task) — the projection below computes it across
    # the cluster's map tasks instead [guide §2.5, §1.2]. Values are
    # identical: the window orders by the precomputed columns.
    from .knn_join import ensure_parallelism

    h = S.poly_hash(key, salt=salt)
    spread = ensure_parallelism(df).withColumn("_smp_h", h)
    # the tie-break key stays an inline expression (a cheap concat the
    # sort evaluates once per row); materializing it would ship a
    # duplicate of the text through the exchange
    w = Window.partitionBy(group_col).orderBy(
        F.col("_smp_h").asc(), key.asc()
    )
    # eqNullSafe: groupBy counts NULL group values as a group of their
    # own, so the target join must match them too — an equality join
    # would silently drop every NULL-group row (budget allocated to the
    # NULL group, then lost)
    return (
        spread.join(F.broadcast(targets), F.col(group_col).eqNullSafe(F.col("_g")))
        .withColumn("_smp_rank", F.row_number().over(w))
        .filter(F.col("_smp_rank") <= F.col("_target"))
        .drop("_g", "_target", "_smp_rank", "_smp_h")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    key_cols: list[str] | str | None = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``k`` rows
    per group with inclusion probability proportional to
    ``weight_col`` — the Efraimidis-Spirakis (2006) A-ES scheme with
    the engine's content hash in place of an RNG. The data-mixing
    staple "sample by quality weight, reproducibly": re-runs, engines,
    partitionings, and retries all draw the SAME sample, and adding
    new rows never changes which old rows were drawn (same stability
    contract as :func:`hash_sample`).

    A-ES: draw u_i in (0, 1], rank by u_i^(1/w_i) descending, keep the
    top k. Here ``u_i = (poly_hash(key) + 1) / (HASH_MOD + 1)`` —
    content-derived, so the "randomness" is a fixed function of the
    row. Ranking uses the monotone-equivalent ``ln(u_i) / w_i``
    (numerically safer than the tiny root for small weights); ties
    break on the serialized key ASC. Rows with null or non-positive
    weight are EXCLUDED (they have zero inclusion probability; a
    negative weight is a contract violation worth surfacing upstream).

    One shuffle on the group key; the WindowGroupLimit rank pushdown
    bounds each partition's sort at k. ``ln``/division are IEEE ops
    both engines share — fully oracle-checkable.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = (
        [key_cols] if isinstance(key_cols, str)
        else list(key_cols) if key_cols is not None
        else [c for c in df.columns if c not in (group_col, weight_col)]
    )
    key = _key_expr(keys)
    u = (S.poly_hash(key, salt=salt) + F.lit(1)).cast("double") / F.lit(
        float(S.HASH_MOD + 1)
    )
    w = F.col(weight_col).cast("double")
    score = F.log(u) / w
    win = Window.partitionBy(group_col).orderBy(score.desc(), key.asc())
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_ws_rank", F.row_number().over(win))
        .filter(F.col("_ws_rank") <= k)
        .drop("_ws_rank")
    )
