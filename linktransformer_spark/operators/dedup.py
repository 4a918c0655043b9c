"""Large-scale deduplication suite (north-star extension beyond the
reference surface; BASELINE.json "LLM-data-pipeline operators").

Five strategies, all built from the same portable integer kernels
(functions/similarity.py <-> functions/oracle.py) so each one is
DuckDB-oracle-checkable:

- exact        : hash-groupBy on the key, keep min-id row. One shuffle.
- minhash LSH  : shingle -> minhash signature -> band buckets ->
                 candidate pairs -> exact-Jaccard verify -> connected
                 components -> keep min id. The classic near-dup
                 pipeline (Broder '97; used by every web-scale corpus
                 cleaner). Candidate generation is equi-join on
                 (band, band_hash): shuffle scales with duplicates, not
                 with n^2.
- simhash      : 64-bit sign fingerprint of token hashes (Charikar '02);
                 near-dups = hamming distance <= k, candidates via the
                 pigeonhole block trick (split bits into k+1 blocks,
                 equi-join per block).
- ngram jaccard: exact set-similarity join via shingle explode +
                 per-pair intersection counts — the exact (quadratic in
                 colliding shingles, not in rows) baseline.
- embedding    : cosine near-dup over a vector column (see
                 operators/ann.py for candidate generation at scale).

All thresholds compare ratios of exact integers (single double
division) -> bit-identical across engines.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..functions.serialize import DEFAULT_SEP, serialize_columns
from ..ids import LT_ID, min_id_first, require_integral_id, with_row_id
from . import knn_join as KJ
from .components import connected_components

# minhash constants: h_i(x) = (A_i * x + B_i) mod P, P prime > any hash
MH_PRIME = 2147483647
MH_A_STEP = 1299709  # distinct odd multipliers/offsets per hash id
MH_B_STEP = 15485863


def _shingle_rows(base: DataFrame, n: int, word: bool) -> DataFrame:
    """Shingle OCCURRENCE rows (_id, _g) from (_id, _key) — the
    relational, codegen-friendly form of ``_shingles``.

    Word mode (n>1): explode start POSITIONS and slice the carried
    token array — ``slice``/``array_join`` are plain Catalyst
    expressions (whole-stage codegen), and consecutive tokens are
    already adjacent in the array, so no shuffle at all. The previous
    window-lead formulation shuffled every token row just to pair
    neighbors (and WindowExec is row-at-a-time); the slice form
    measured 1.5x faster at sf0.1 and is shuffle-free at any scale.
    (The ``transform``-lambda shingler is worse than both: higher-order
    functions are CodegenFallback — interpreted per row.)

    Docs with fewer than n tokens contribute one whole-text shingle
    (the _shingles fallback branch), including "" for empty docs. Char
    mode explodes char_ngrams directly.
    """
    if not word:
        return base.select(
            "_id", F.explode_outer(S.char_ngrams(F.col("_key"), n)).alias("_g")
        ).withColumn("_g", F.coalesce("_g", F.lit("")))
    toks_expr = S.word_tokens(F.col("_key"))
    if n == 1:
        # unigrams: every token is a shingle; only empty docs take the
        # whole-text ("") fallback
        toks = base.select("_id", F.explode(toks_expr).alias("_g"))
        return toks.unionByName(
            base.filter(F.size(toks_expr) < 1).select("_id", F.lit("").alias("_g"))
        )
    base2 = base.select("_id", toks_expr.alias("_toks"))
    full = (
        base2.filter(F.size("_toks") >= n)
        .select(
            "_id",
            "_toks",
            F.explode(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1))
            ).alias("_p"),
        )
        .select(
            "_id", F.array_join(F.slice("_toks", F.col("_p"), n), " ").alias("_g")
        )
    )
    short = base2.filter(F.size("_toks") < n).select(
        "_id", F.array_join("_toks", " ").alias("_g")
    )
    return full.unionByName(short)


def _distinct_shingle_rows(base: DataFrame, n: int, word: bool) -> DataFrame:
    """DISTINCT shingle rows (_id, _g) with exactly ``_shingles``
    semantics (word mode: whole-text fallback for short docs; char
    mode: no rows when len < n) — but built relationally so gram
    construction stays in whole-stage codegen instead of the
    interpreted array expressions."""
    if word:
        rows = _shingle_rows(base, n, word)
    else:
        s = F.col("_key")
        rows = (
            base.filter(F.length(s) >= n)
            .select(
                "_id",
                "_key",
                F.explode(F.sequence(F.lit(1), F.length(s) - F.lit(n - 1))).alias("_p"),
            )
            .select("_id", F.col("_key").substr(F.col("_p"), F.lit(n)).alias("_g"))
        )
    return rows.dropDuplicates(["_id", "_g"])


def _shingles(text: Column, n: int, word: bool) -> Column:
    """Distinct shingle array: word n-grams (space-joined) or char n-grams."""
    if word:
        toks = S.word_tokens(text)
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    else:
        grams = S.char_ngrams(text, n)
    return F.array_distinct(grams)


def _shingles_nonempty(text: Column, n: int, word: bool) -> Column:
    """``_shingles`` with the batch-path guarantee that no doc has an
    empty shingle set: char mode's empty result becomes {''} — exactly
    what ``_shingle_rows``'s explode_outer hashes — so per-row
    signatures/arrays are row-for-row compatible with the relational
    batch build. (Word mode already falls back to the whole-text join,
    which is '' for empty docs.)"""
    sh = _shingles(text, n, word)
    if not word:
        sh = F.when(F.size(sh) > 0, sh).otherwise(F.array(F.lit("")))
    return sh


def minhash_signature(text: Column, num_hashes: int, shingle: int = 3,
                      word: bool = True) -> Column:
    """Array of ``num_hashes`` minhash values of the shingle set.

    h_i(s) = (A_i * poly_hash(s) + B_i) mod P with A_i, B_i derived from
    i by integer arithmetic — engine-portable, no RNG state. Empty docs
    hash the '' shingle (the ``_shingles_nonempty`` fallback, matching
    the batch ``_shingle_rows`` build) so a per-row signature equals the
    batch signature for every input, short/empty docs included.
    """
    sh = _shingles_nonempty(text, shingle, word)
    hashed = F.transform(sh, lambda g: S.poly_hash(g))
    sigs = []
    # NOTE plain closures: PySpark inspects lambda ARITY, so the usual
    # `lambda h, a=a` default-arg binding breaks higher-order functions;
    # each F.transform call evaluates its lambda immediately, so loop
    # late-binding is not an issue.
    for i in range(num_hashes):
        a = (1 + i * MH_A_STEP) % MH_PRIME
        b = (i * MH_B_STEP) % MH_PRIME
        vals = F.transform(hashed, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MH_PRIME))
        sigs.append(F.coalesce(F.array_min(vals), F.lit(MH_PRIME)))
    return F.array(*sigs)


def py_shingles(key: str, n: int, word: bool) -> list[str]:
    """Python replica of ``_shingles_nonempty``. ``key`` must be the
    ALREADY JVM-LOWERCASED string in word mode (word_tokens lowercases;
    keeping that step in the JVM is what makes both sides of a
    stream-static join case-fold identically — the one Unicode-
    sensitive op) and the RAW string in char mode (``_shingles`` char
    mode never case-folds — pinned by the replica-parity property
    test). ``re.ASCII`` makes Python's ``\\s`` exactly Java's
    ``[ \\t\\n\\x0B\\f\\r]``; first-occurrence dedup matches
    ``array_distinct``. Exact-integer path — no float semantics
    anywhere."""
    import re

    if not hasattr(py_shingles, "_ws"):
        py_shingles._ws = re.compile(r"\s+", re.ASCII)
    if word:
        toks = [t for t in py_shingles._ws.split(key) if t]
        if len(toks) >= n:
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        else:
            grams = [" ".join(toks)]
    else:
        grams = (
            [key[i : i + n] for i in range(len(key) - n + 1)]
            if len(key) >= n
            else [""]
        )
        if not grams:
            grams = [""]
    return list(dict.fromkeys(grams))


def _py_poly_hash(s: str, salt: int = 0) -> int:
    """Python replica of similarity.poly_hash (exact integers)."""
    acc = salt
    for ch in s:
        acc = (acc * 131 + ord(ch)) % MH_PRIME
    return acc


def py_minhash_cols(keys, num_hashes: int, shingle: int,
                    word: bool, memo: dict | None = None):
    """Arrow-batch replica of (minhash_signature, _shingles_nonempty)
    over key strings (JVM-lowercased in word mode, raw in char mode
    — see py_shingles): returns (signatures, shingle_lists).

    Why this exists: the per-row Column forms are higher-order-function
    trees (CodegenFallback, interpreted ~us per element-step) — the
    sf0.1 streaming-dedup drain measured 79s of its 85s INSIDE the
    stream-side signature expression, vs 0.56s for the whole batch
    twin. This replica is exact-INTEGER arithmetic (poly hash + affine
    min-hash), so bit-parity is by construction, not by float-order
    discipline; ``memo`` caches shingle hashes across rows (shingles
    repeat heavily in natural corpora)."""
    import numpy as np

    A = np.array(
        [(1 + i * MH_A_STEP) % MH_PRIME for i in range(num_hashes)],
        dtype=np.int64,
    )
    B = np.array(
        [(i * MH_B_STEP) % MH_PRIME for i in range(num_hashes)],
        dtype=np.int64,
    )
    memo = {} if memo is None else memo
    sigs, shs = [], []
    for s in keys:
        grams = py_shingles(s if s is not None else "", shingle, word)
        hs = np.empty(len(grams), dtype=np.int64)
        for j, g in enumerate(grams):
            h = memo.get(g)
            if h is None:
                h = _py_poly_hash(g)
                memo[g] = h
            hs[j] = h
        if len(grams):
            # a*h < 2^62 — no int64 overflow
            sig = ((A[:, None] * hs[None, :] + B[:, None]) % MH_PRIME).min(1)
        else:
            sig = np.full(num_hashes, MH_PRIME, dtype=np.int64)
        sigs.append(sig)
        shs.append(grams)
    return sigs, shs


def shingle_hashes64(text: Column, word: bool = True, shingle: int = 1) -> Column:
    """Array of 62-bit shingle hashes: two independent 31-bit poly
    hashes concatenated (portable integer arithmetic)."""
    sh = _shingles(text, shingle, word)
    return F.transform(
        sh,
        lambda g: S.poly_hash(g, salt=0) * F.lit(2147483648) + S.poly_hash(g, salt=1),
    )


def simhash64(hashes: Column, nbits: int = 62) -> Column:
    """Simhash fingerprint of a pre-materialized hash array column: bit
    j set iff sum over hashes of sign(bit j) >= 0. Materialize the hash
    array with ``shingle_hashes64`` FIRST (a separate projection) so
    whole-stage codegen computes it once, not 62 times."""
    bits = []
    for j in range(nbits):
        mask = 1 << j
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask)) != F.lit(0), F.lit(1)).otherwise(F.lit(-1)),
        )
        bits.append(F.when(votes >= 0, F.lit(mask)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def dedup_exact(df: DataFrame, on, id_col: str | None = None,
                deterministic_ids: bool = True) -> DataFrame:
    """Exact dedup on the serialized key, keeping the min-id row
    ("keep first" parity). groupBy-free: one window shuffle on the key."""
    on_list = [on] if isinstance(on, str) else list(on)
    work = with_row_id(df, id_col=id_col, deterministic=deterministic_ids)
    return min_id_first(work, on_list).select(*df.columns)


def dedup_exact_against(new: DataFrame, seen: DataFrame, on,
                        *, hash_keys: bool = True) -> DataFrame:
    """New-batch rows whose exact key does NOT appear in the seen
    corpus — the exact twin of :func:`dedup_against` (ingest-time
    filter; within-batch duplicates are untouched, chain
    :func:`dedup_exact` for those).

    With ``hash_keys=True`` the anti-join ships a pair of 64-bit
    xxhash64 digests of the key columns instead of the key text itself
    — same trick as the ExactSubstr span dedup (corpus.py): for
    document-length keys this cuts the shuffled bytes by roughly
    mean-key-length/16x. The two digests use DIFFERENT seed chains
    (the second salts a literal FIRST, so its seed when the key bytes
    arrive is H(1, seed=42) != 42) — Spark's multi-arg xxhash64 feeds
    the running hash forward as the next seed, so salting LAST would
    make digest 2 a pure function of digest 1 and buy no extra
    protection. With decorrelated chains a false drop needs a
    simultaneous collision in two independent 64-bit hashes
    (~n_new*n_seen/2^128 — negligible at any corpus size). Each key
    column is passed to xxhash64 as its own argument (structural
    chaining, no separator), so multi-column keys whose values contain
    the serializer's separator cannot be conflated — the per-column
    semantics match the raw path exactly. ``hash_keys=False`` joins on
    the raw key columns (the oracle formulation).

    ``on`` may name columns from either side as long as BOTH frames
    have them (the usual contract: same logical schema for batch and
    corpus)."""
    on_list = [on] if isinstance(on, str) else list(on)
    # null -> '' parity with the raw path (Spark's xxhash64 SKIPS null
    # args, which would conflate ('a', null) with just ('a')).
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in on_list]
    if not hash_keys:
        mk = [p.alias(f"_k{i}") for i, p in enumerate(parts)]
        nk = new.select("*", *mk)
        sk = seen.select(*mk)
        out = nk.join(sk, [f"_k{i}" for i in range(len(on_list))], "left_anti")
        return out.select(*new.columns)
    h = [F.xxhash64(*parts).alias("_h1"),
         F.xxhash64(F.lit(1), *parts).alias("_h2")]
    nk = new.select("*", *h)
    sk = seen.select(*h)
    return nk.join(sk, ["_h1", "_h2"], "left_anti").select(*new.columns)


# salt-cell encoding base: cell id = i * _SALT_BASE + j for sub-group
# pair (i, j), i <= j. Requires k = ceil(bucket/cap) < 2^20 — i.e. a
# single hot bucket up to cap * 1M rows, far past any sane corpus.
_SALT_BASE = 1 << 20


def _cap_buckets(
    banded: DataFrame,
    keys: list[str],
    cap: int | None,
    hot_bucket: str = "drop",
    id_col: str = "_id",
) -> DataFrame:
    """Skew guard for LSH buckets with more than ``cap`` members.

    A bucket of size m contributes m^2/2 candidate pairs — one
    pathological bucket (boilerplate text, empty docs, a hot band
    signature) can dominate the whole join at scale. No-op when cap is
    None. Two enforcement modes:

    ``hot_bucket='drop'`` — drop hot buckets entirely. Bounds
    per-bucket work at cap^2/2; rows lose only the candidates they
    would have found through the dropped bucket (their other bands
    still match), the standard recall trade in web-scale dedup. The
    loss is observable via :func:`bucket_cap_stats` (same sizes frame
    this cap builds).

    ``hot_bucket='salt'`` — recall-preserving two-phase join: split a
    hot bucket of m rows into k = ceil(m/cap) deterministic sub-groups
    (g = pmod(id*40503 + 12289, k)) and replicate each row into the k
    triangle cells {(g, j): j >= g} ∪ {(i, g): i < g}, encoded in two
    extra columns the caller must fold into its self-join condition
    via :func:`_salt_pair_cond`: ``_salt`` (cell id i*2^20 + j) and
    ``_sg`` (the row's own sub-group). A pair (a, b) with groups
    ga < gb shares exactly one cell (ga, gb); co-group pairs
    (ga == gb) share ALL of their k cells, so :func:`_salt_pair_cond`
    additionally requires cross-group endpoints in off-diagonal cells
    — with it, every pair is emitted exactly once and the salted
    self-join equals the uncapped candidate set: no duplicates, no
    losses, while each cell holds at most ~2*cap rows (two
    sub-groups), bounding per-task join work at ~2*cap^2. Cost:
    hot-bucket rows replicate k-fold (total m*ceil(m/cap) band rows
    per hot bucket); cold buckets get the single cell (0, 0).
    Self-join variants only — a two-sided (new-vs-seen) join would
    need a shared group space across frames.
    """
    if cap is None:
        return banded
    if cap < 1:
        # cap=0 would make ceil-div null (non-ANSI x DIV 0) -> null
        # salts -> explode(null) silently drops every banded row.
        raise ValueError(f"bucket cap must be >= 1, got {cap}")
    sizes = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bn"))
    if hot_bucket == "drop":
        ok = sizes.filter(F.col("_bn") <= cap).drop("_bn")
        return banded.join(ok, keys)
    if hot_bucket != "salt":
        raise ValueError(
            f"hot_bucket must be 'drop' or 'salt', got {hot_bucket!r}"
        )
    joined = banded.join(sizes, keys)
    k = F.expr(f"CAST((_bn + {cap} - 1) DIV {cap} AS BIGINT)")
    g = F.pmod(
        F.col(id_col) * F.lit(40503) + F.lit(12289), k
    ).cast("long")
    lo = F.when(
        g > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), g - 1),
            lambda i: i * _SALT_BASE + g,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    hi = F.transform(
        F.sequence(g, k - 1), lambda j: g * _SALT_BASE + j
    )
    return joined.select(
        *banded.columns,
        g.alias("_sg"),
        F.explode(F.concat(lo, hi)).alias("_salt"),
    )


def _salt_two_sided(
    lbanded: DataFrame,
    rbanded: DataFrame,
    keys: list[str],
    cap: int,
    id_col: str = "_id",
    rid_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Recall-preserving skew salt for a BIPARTITE bucket join (the
    new-vs-seen ingest shape): per bucket, split the left side into
    kL = ceil(nL/cap) sub-groups and the right into kR = ceil(nR/cap);
    a left row of group gL replicates into cells {(gL, j): j < kR},
    a right row of group gR into {(i, gR): i < kL}. Any cross pair
    (a, b) shares exactly ONE cell (gA, gB) — the equi-join on
    (keys..., _salt) emits exactly the uncapped candidate set while
    each cell holds at most ~cap rows per side (per-task join work
    <= cap^2). Replication: left rows x kR, right rows x kL — the
    grid-partitioned skew join, bounded by the HOT side's k only where
    buckets are actually hot (cold buckets get the single cell (0,0)).
    Buckets present on one side only still emit their rows (with
    k=1 for the absent side) and simply find no partner."""
    if cap < 1:
        raise ValueError(f"bucket cap must be >= 1, got {cap}")
    ls = lbanded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_lbn"))
    rs = rbanded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_rbn"))
    sizes = ls.join(rs, keys, "full").select(
        *keys,
        F.expr(f"CAST((coalesce(_lbn, 1) + {cap} - 1) DIV {cap} AS BIGINT)")
        .alias("_kl"),
        F.expr(f"CAST((coalesce(_rbn, 1) + {cap} - 1) DIV {cap} AS BIGINT)")
        .alias("_kr"),
    )
    def g(idc, k):  # shared group hash, parameterized per side
        return F.pmod(
            F.col(idc) * F.lit(40503) + F.lit(12289), k
        ).cast("long")

    lj = lbanded.join(sizes, keys)
    gl = g(id_col, F.col("_kl"))
    lout = lj.select(
        *lbanded.columns,
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("_kr") - 1),
                lambda j: gl * _SALT_BASE + j,
            )
        ).alias("_salt"),
    )
    rj = rbanded.join(sizes, keys)
    gr = g(rid_col or id_col, F.col("_kr"))
    rout = rj.select(
        *rbanded.columns,
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("_kl") - 1),
                lambda i: i * _SALT_BASE + gr,
            )
        ).alias("_salt"),
    )
    return lout, rout


def _salt_pair_cond(l: str = "l", r: str = "r") -> F.Column:
    """Join-condition fragment pairing :func:`_cap_buckets`'s salt
    mode: same cell, and — in off-diagonal cells — endpoints from the
    two DIFFERENT sub-groups (co-group pairs are counted once, in
    their diagonal cell, where group equality always holds)."""
    s = F.col(f"{l}._salt")
    diag = F.shiftright(s, 20) == s.bitwiseAND(F.lit(_SALT_BASE - 1))
    return (s == F.col(f"{r}._salt")) & (
        diag | (F.col(f"{l}._sg") != F.col(f"{r}._sg"))
    )


def bucket_cap_stats(
    banded: DataFrame, keys: list[str], cap: int
) -> DataFrame:
    """Observable for the ``hot_bucket='drop'`` recall trade: one
    summary row quantifying exactly what :func:`_cap_buckets` would
    drop at this ``cap`` — ``buckets_total``, ``buckets_dropped``
    (size > cap), ``rows_dropped`` (band-row memberships lost; a doc
    keeps its other bands), and ``pairs_dropped`` (sum of m*(m-1)/2
    over dropped buckets = candidate pairs never generated through
    those buckets; an upper bound on lost matches since other bands
    can still pair them). All exact integers — order-free, oracle-
    stable. Cost: the same groupBy sizes frame the cap itself builds,
    plus a 1-row global aggregate.
    """
    hot = F.col("_bn") > cap
    return (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .agg(
            F.count(F.lit(1)).alias("buckets_total"),
            F.sum(F.when(hot, 1).otherwise(0)).alias("buckets_dropped"),
            F.sum(F.when(hot, F.col("_bn")).otherwise(0)).alias(
                "rows_dropped"
            ),
            F.sum(
                F.when(
                    hot, F.expr("(_bn * (_bn - 1)) DIV 2")
                ).otherwise(0)
            ).alias("pairs_dropped"),
            # the OTHER side of the decision: what 'salt' would cost
            # instead — extra band rows from k-fold replication of hot
            # buckets (sum of m*ceil(m/cap) - m); 'drop' loses
            # pairs_dropped, 'salt' pays salt_extra_rows. Cold buckets
            # replicate 1x and contribute 0.
            F.sum(
                F.when(
                    hot,
                    F.col("_bn")
                    * F.expr(f"(_bn + {cap} - 1) DIV {cap}")
                    - F.col("_bn"),
                ).otherwise(0)
            ).alias("salt_extra_rows"),
        )
    )


def _minhash_banded_stage(
    df: DataFrame, on, id_col: str, num_hashes: int, bands: int,
    shingle: int, word: bool, id_out: str = "_id",
) -> DataFrame:
    """(id, band, band-signature) rows in ONE Arrow pass — the
    signature build (:func:`py_minhash_cols`) and the band slicing
    fused, so the per-row signature array is never materialized as a
    column: the ``explode(transform(sequence, slice))`` stage of
    :func:`_banded_from_sig` (evaluated once per consumer of the
    banded relation — three times in the salted self-join: the sizes
    aggregate and both join inputs) disappears from the plan, and the
    self-join checkpoint holds the band rows directly. Values are
    bit-identical to slicing the signature relationally: the same
    int64 signature array (exact-integer arithmetic — replica parity
    with the relational explode+min-agg build is property-pinned), cut
    at the same offsets. Word mode ships the JVM-lowercased key —
    lowercasing is the one Unicode-sensitive step, kept in the JVM so
    every path case-folds identically (guide §4.2: hand whole batches
    to vectorized native code)."""
    rows_per_band = num_hashes // bands
    on_list = [on] if isinstance(on, str) else list(on)
    key = serialize_columns(on_list, DEFAULT_SEP)
    src = KJ.ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias(id_out),
        (F.lower(key) if word else key).alias("_kl"),
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        memo = {}
        band_ids = np.arange(bands, dtype=np.int32)
        for pdf in batches:
            sigs, _ = py_minhash_cols(
                pdf["_kl"].tolist(), num_hashes, shingle, word, memo=memo
            )
            yield pd.DataFrame({
                id_out: np.repeat(pdf[id_out].to_numpy(), bands),
                "band": np.tile(band_ids, len(sigs)),
                "bsig": [
                    [int(x) for x in
                     s[b * rows_per_band:(b + 1) * rows_per_band]]
                    for s in sigs for b in range(bands)
                ],
            })

    return src.mapInPandas(
        gen, schema=f"{id_out} long, band int, bsig array<bigint>"
    )


def _banded_from_sig(
    sig: DataFrame, bands: int, rows_per_band: int,
    id_col: str = "_id", sig_col: str = "_sig",
) -> DataFrame:
    """(id, band, band-signature) rows from a signature relation —
    map-only explode; band rows carry ONLY the slice they join on."""
    return sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(
                        F.col(sig_col), b * rows_per_band + 1, rows_per_band
                    ).alias("bsig"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bsig").alias("bsig"))


def _minhash_base_banded(
    df: DataFrame,
    on,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle: int,
    word: bool,
    max_bucket_size: int | None,
    hot_bucket: str = "drop",
) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash build: returns (``base_kv`` = (_id, _key) — the
    raw serialized key relation the verify paths semi-join, NOT
    lineage-cut, and ``banded`` = (_id, band, bsig) — lineage-cut,
    ``bands`` rows per input row). The hash family is fixed
    module-level constants, so signatures built from two DIFFERENT
    DataFrames (e.g. a new batch vs an indexed corpus) are directly
    join-compatible — the property the incremental variant relies on.

    Band rows come from the fused Arrow pass
    (:func:`_minhash_banded_stage`): signature build and band slicing
    in one map-only stage, so neither the text column nor the full
    signature array is ever shuffled, joined, or checkpointed in the
    banded path (round 13 removed the text join/checkpoint, round 14
    the signature materialization + explode — the banded self-join and
    the sizes aggregate previously each re-evaluated the
    explode(transform(slice)) stage over the signature checkpoint)."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    on_list = [on] if isinstance(on, str) else list(on)
    key = serialize_columns(on_list, DEFAULT_SEP)

    # a single-file scan would run the whole verify shingler on one
    # core — fan out BEFORE the map-side work, not just at shuffles
    base_kv = KJ.ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("_id"),
        key.alias("_key"),
    )
    # the banded self-join consumes the band rows on BOTH sides; cut
    # lineage so the Arrow stage executes once, not twice (same
    # reasoning as the simhash fingerprint checkpoint below) — the
    # checkpoint holds (id, band, rows_per_band longs) per band row,
    # never the corpus text
    banded = _minhash_banded_stage(
        df, on, id_col, num_hashes, bands, shingle, word
    ).localCheckpoint(eager=False)
    banded = _cap_buckets(banded, ["band", "bsig"], max_bucket_size, hot_bucket)
    return base_kv, banded


def _hash_shingles(sh: Column) -> Column:
    """Distinct 64-bit fingerprints of a (distinct) shingle STRING
    array. Jaccard over the fingerprint sets equals Jaccard over the
    string sets unless two distinct shingles of a compared pair
    collide in xxhash64 (~|A|+|B| choose 2 in 2^64 per pair, ~1e-15 —
    the same uniqueness class the MinHash signatures already rely on).
    Why: the verify join's cost is dominated by array_intersect over
    ~100-element string arrays (hash + equality per element) and by
    shuffling those arrays; longs intersect ~2x faster and ship ~60%
    smaller (optimization guide §2.3 "narrower types"). Verified
    output-identical on every driver SF."""
    return F.array_distinct(F.transform(sh, lambda g: F.xxhash64(g)))


def _jaccard_tail(cand: DataFrame, threshold: float,
                  keep: tuple[str, str] = ("src", "dst")) -> DataFrame:
    """Shared finisher for the minhash verify joins: ``cand`` carries
    (``keep``..., sh_l, sh_r); compute jaccard ONCE, drop the arrays,
    then threshold-filter ABOVE a nondeterministic pin.

    Without the pin, Catalyst pushes the ``jaccard >= t`` filter back
    into the attach join's condition and re-materializes the full
    ``array_intersect`` expression there AND in the output projection
    — the dominant kernel of the whole dedup family evaluated 2x per
    surviving row (measured 6.1s -> 3.7s on the 1.13M-pair hot-clique
    verify when pinned; plans/r13/dedup_minhash_salted_skew_*.txt).
    The pin column is dropped and never affects output values."""
    inter = F.size(F.array_intersect("sh_l", "sh_r"))
    union = F.size("sh_l") + F.size("sh_r") - inter
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    pinned = cand.select(
        *keep, jac.alias("jaccard"),
        F.monotonically_increasing_id().alias("_pin"),
    )
    return (
        pinned.filter(F.col("jaccard") >= threshold)
        .select(*keep, "jaccard")
    )


# Candidate-id budget under which the verify joins BROADCAST the
# (id, shingle-fingerprints) relation instead of sort-merge-joining it
# onto the pair relation. The SMJ form shuffles the pair relation WITH
# both ~100-element fingerprint arrays attached (measured 1.13M pairs
# x ~2x800 B at the sf0.1 hot-clique shape — the dominant verify
# cost); the broadcast form ships each candidate's array once and the
# checkpointed pair relation never moves. At 64k ids x ~800 B the
# broadcast is ~50 MB — the deliberate §3.1 "broadcast the side that
# fits" call; above the budget the SMJ shape stands (a 100 TB
# candidate set must never be collected). The deciding count runs
# over the candidate CHECKPOINT — one bounded job, same pattern as
# the lev tier's pair budget.
VERIFY_BROADCAST_MAX_IDS_CONF = (
    "spark.linktransformer.dedup.verifyBroadcastMaxIds"
)
VERIFY_BROADCAST_MAX_IDS_DEFAULT = 65_536


def _verify_attach_shingles(
    cand: DataFrame, sh: DataFrame, n_ids: int,
) -> DataFrame:
    """Attach sh_l/sh_r fingerprint arrays to (src, dst) pairs.
    ``sh`` must be lineage-cut (it is evaluated for BOTH joins);
    ``n_ids`` (its exact row count — the caller already ran the job)
    picks the join shape: broadcast under the id budget, sort-merge
    above it."""
    spark = cand.sparkSession
    budget = int(
        spark.conf.get(
            VERIFY_BROADCAST_MAX_IDS_CONF,
            str(VERIFY_BROADCAST_MAX_IDS_DEFAULT),
        )
    )
    if n_ids <= budget:
        sh = F.broadcast(sh)
        # the broadcast shape has NO shuffle above the pair checkpoint,
        # which AQE typically coalesced to very few partitions (18 MB of
        # id pairs -> 1) — the per-pair intersect would run single-task.
        # The SMJ shape re-spreads through its own hash exchange.
        cand = KJ.ensure_parallelism(cand)
    cand = cand.join(
        sh.withColumnRenamed("_id", "src").withColumnRenamed("_sh", "sh_l"),
        "src",
    )
    return cand.join(
        sh.withColumnRenamed("_id", "dst").withColumnRenamed("_sh", "sh_r"),
        "dst",
    )


def _verify_jaccard(
    cand: DataFrame, bases: list[DataFrame], shingle: int, word: bool,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of (src, dst) candidates; shingle
    arrays are built ONLY for ids that collided (candidate set <<
    corpus), taken from whichever of ``bases`` holds them. The
    ARRAY-expression shingler is right here: per-doc arrays with no
    explode/window/groupBy — zero shuffles beyond the semi-joins; its
    interpreted per-gram cost is linear in candidate text volume.
    Arrays are compared as 64-bit fingerprints (:func:`_hash_shingles`)
    and the threshold filter is single-evaluation (:func:`_jaccard_tail`).
    The (id, fingerprints) relation is lineage-cut (it feeds both
    attach joins — un-cut, the whole scan+shingle subtree planned and
    ran TWICE) and broadcast when the candidate-id count fits the
    budget (see ``VERIFY_BROADCAST_MAX_IDS_CONF``)."""
    cand = cand.localCheckpoint(eager=False)
    cand_ids = (
        cand.select(F.col("src").alias("_id"))
        .unionByName(cand.select(F.col("dst").alias("_id")))
        .distinct()
    )
    # char mode: _shingle_rows explode_outer gives short docs one ""
    # row (that's what the signature hashed) — _shingles_nonempty
    # mirrors it here
    sh_expr = _hash_shingles(_shingles_nonempty(F.col("_key"), shingle, word))
    all_base = bases[0].select("_id", "_key")
    for b in bases[1:]:
        all_base = all_base.unionByName(b.select("_id", "_key"))
    sh = (
        all_base.join(cand_ids, "_id")
        .select("_id", sh_expr.alias("_sh"))
        .localCheckpoint(eager=False)
    )
    n_ids = sh.count()
    return _jaccard_tail(_verify_attach_shingles(cand, sh, n_ids), threshold)


def near_dup_pairs_minhash(
    df: DataFrame,
    on,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    max_bucket_size: int | None = None,
    hot_bucket: str = "drop",
) -> DataFrame:
    """Candidate pairs via MinHash-LSH banding, verified with EXACT
    Jaccard on the distinct shingle sets. Returns (src, dst, jaccard)
    with src < dst.

    Plan: signature is a map-only projection; banding explodes each row
    into ``bands`` rows; candidates come from an equi-join on
    (band, band_signature) — a hash shuffle whose size tracks the
    number of colliding rows. Verification is array_intersect /
    array_union on the (deduplicated) shingle arrays.
    ``max_bucket_size`` bounds per-bucket join fan-out — the skew
    guard for 100 TB corpora. ``hot_bucket`` picks the enforcement:
    ``'drop'`` (cheaper, loses the dropped buckets' candidates —
    quantify with :func:`minhash_cap_stats`) or ``'salt'``
    (recall-preserving triangle-salted join, identical output to the
    uncapped plan with per-task work still bounded at ~2*cap^2 — see
    ``_cap_buckets``).
    """
    base, banded = _minhash_base_banded(
        df, on, id_col, num_hashes, bands, shingle, word,
        max_bucket_size, hot_bucket,
    )
    l = banded.alias("l")
    r = banded.alias("r")
    cond = (
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bsig") == F.col("r.bsig"))
        & (F.col("l._id") < F.col("r._id"))
    )
    if "_salt" in banded.columns:
        cond = cond & _salt_pair_cond()
    cand = (
        l.join(r, cond)
        .select(F.col("l._id").alias("src"), F.col("r._id").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return _verify_jaccard(cand, [base], shingle, word, threshold)


def near_dup_pairs_minhash_against(
    new: DataFrame,
    seen: DataFrame,
    on,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    max_bucket_size: int | None = None,
    hot_bucket: str = "drop",
) -> DataFrame:
    """Incremental near-dup check: MinHash-LSH pairs between a NEW
    batch and an already-ingested corpus (``seen``). Returns
    (src=new id, dst=seen id, jaccard) — no new-vs-new or
    seen-vs-seen pairs (use :func:`near_dup_pairs_minhash` within a
    batch).

    ``max_bucket_size`` is the hot-bucket skew guard; ``hot_bucket``
    picks per-side bucket DROPS ('drop' — quantify with
    :func:`minhash_cap_stats` per side) or the recall-preserving
    bipartite grid salt ('salt' — :func:`_salt_two_sided`: output
    identical to the uncapped join, per-task work bounded at ~cap^2).
    Boilerplate buckets are exactly where ingest dedup matters most,
    which is why the salted mode exists here too.

    The batch-ingest shape at 100 TB: the seen side's signatures and
    band rows are recomputed here from text, but in a production
    pipeline they would be persisted once at ingest (they're plain
    columns — write ``banded`` out bucketed by (band, bsig) and the
    per-batch cost becomes |new| signature builds + an equi-join whose
    shuffle tracks collisions only, independent of |seen|'s text
    volume). Id spaces of the two tables are independent — pairs are
    keyed by side, not by id ordering."""
    salted = max_bucket_size is not None and hot_bucket == "salt"
    side_cap = None if salted else max_bucket_size
    nbase, nbanded = _minhash_base_banded(
        new, on, id_col, num_hashes, bands, shingle, word, side_cap
    )
    sbase, sbanded = _minhash_base_banded(
        seen, on, id_col, num_hashes, bands, shingle, word, side_cap
    )
    if salted:
        nbanded, sbanded = _salt_two_sided(
            nbanded, sbanded, ["band", "bsig"], max_bucket_size
        )
    elif max_bucket_size is not None and hot_bucket != "drop":
        raise ValueError(
            f"hot_bucket must be 'drop' or 'salt', got {hot_bucket!r}"
        )
    l = nbanded.alias("l")
    r = sbanded.alias("r")
    cond = (F.col("l.band") == F.col("r.band")) & (
        F.col("l.bsig") == F.col("r.bsig")
    )
    if salted:
        cond = cond & (F.col("l._salt") == F.col("r._salt"))
    cand = (
        l.join(r, cond)
        .select(F.col("l._id").alias("src"), F.col("r._id").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    # id spaces may overlap between the tables; verify arrays must come
    # from the correct side, so rename-join each base separately rather
    # than unioning them
    cand = cand.localCheckpoint(eager=False)
    sh_expr = _hash_shingles(_shingles_nonempty(F.col("_key"), shingle, word))
    n_ids = cand.select(F.col("src").alias("_id")).distinct()
    s_ids = cand.select(F.col("dst").alias("_id")).distinct()
    sh_n = nbase.join(n_ids, "_id").select(
        F.col("_id").alias("src"), sh_expr.alias("sh_l")
    ).localCheckpoint(eager=False)
    sh_s = sbase.join(s_ids, "_id").select(
        F.col("_id").alias("dst"), sh_expr.alias("sh_r")
    ).localCheckpoint(eager=False)
    # per-side broadcast under the id budget (see
    # VERIFY_BROADCAST_MAX_IDS_CONF): the pair relation then never
    # re-shuffles with fingerprint arrays attached
    budget = int(
        cand.sparkSession.conf.get(
            VERIFY_BROADCAST_MAX_IDS_CONF,
            str(VERIFY_BROADCAST_MAX_IDS_DEFAULT),
        )
    )
    bc_n = sh_n.count() <= budget
    bc_s = sh_s.count() <= budget
    if bc_n:
        sh_n = F.broadcast(sh_n)
    if bc_s:
        sh_s = F.broadcast(sh_s)
    if bc_n and bc_s:
        # no shuffle above the pair checkpoint in the all-broadcast
        # shape — re-spread it or the intersect runs on the few
        # AQE-coalesced partitions (see _verify_attach_shingles)
        cand = KJ.ensure_parallelism(cand)
    cand = cand.join(sh_n, "src").join(sh_s, "dst")
    return _jaccard_tail(cand, threshold)


def dedup_against(
    new: DataFrame,
    seen: DataFrame,
    on,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    max_bucket_size: int | None = None,
    hot_bucket: str = "drop",
) -> DataFrame:
    """New-batch rows that are NOT near-dups of the seen corpus (the
    ingest filter): anti-join of ``new`` against the matched src ids.
    Within-batch duplicates are intentionally untouched — chain
    :func:`dedup_minhash` on the survivors for that. ``hot_bucket``
    as in :func:`near_dup_pairs_minhash_against` ('drop' | 'salt')."""
    pairs = near_dup_pairs_minhash_against(
        new, seen, on, id_col, threshold, num_hashes, bands, shingle, word,
        max_bucket_size, hot_bucket,
    )
    matched = pairs.select(F.col("src").alias(id_col)).distinct()
    return new.join(matched, id_col, "left_anti")


def dedup_by_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    keep_by: Column | str | None = None,
) -> DataFrame:
    """Survivor selection over ANY near-dup pair relation ``(src, dst)``:
    connected components of the pair graph, then keep exactly one row
    per duplicate group —

    - ``keep_by=None``: the min-id row (reference keep-first parity,
      ``infer.py:481-482``);
    - ``keep_by=<col>``: the row maximizing ``keep_by`` (min-id
      tie-break) — the quality-aware policy corpus pipelines actually
      want (keep the longest / highest-scoring member of each
      duplicate cluster, e.g. ``keep_by=F.length("text")``).

    Rows appearing in no pair pass through untouched. The survivor pick
    is a hash aggregation per component (min present id, or
    ``max(struct(q, -id))``, both with map-side partial aggregation) +
    a left-semi equi-join — one shuffle keyed by component, no window
    over the full table. The survivor is always chosen among the rows
    PRESENT in ``df`` (an externally-supplied pair graph may name nodes
    ``df`` no longer contains — e.g. corpus-side ids from an
    against-index pair relation — and a component must still keep one
    of its surviving members).

    ``id_col`` must be integral (same contract as the rest of the dedup
    family — a string id would cast to null and silently drop rows)."""
    require_integral_id(df, id_col, "dedup_by_pairs")
    comp = connected_components(pairs.select("src", "dst"))
    joined = df.join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
    dup = joined.filter(F.col("component").isNotNull())
    if keep_by is None:
        surv = dup.groupBy("component").agg(
            F.min(F.col(id_col).cast("long")).alias("_keep_id")
        )
    else:
        q = F.col(keep_by) if isinstance(keep_by, str) else keep_by
        surv = (
            dup.groupBy("component")
            .agg(
                F.max(
                    F.struct(
                        q.cast("double").alias("q"),
                        (-F.col(id_col).cast("long")).alias("ni"),
                    )
                ).alias("_m")
            )
            .select((-F.col("_m.ni")).alias("_keep_id"))
        )
    kept = dup.join(
        surv.select("_keep_id"),
        F.col(id_col).cast("long") == F.col("_keep_id"),
        "left_semi",
    )
    return (
        joined.filter(F.col("component").isNull())
        .select(*df.columns)
        .unionByName(kept.select(*df.columns))
    )


def dedup_minhash(
    df: DataFrame,
    on,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    max_bucket_size: int | None = None,
    keep_by: Column | str | None = None,
    hot_bucket: str = "drop",
) -> DataFrame:
    """MinHash-LSH near-dedup: connected components of the verified
    near-dup pair graph, keep one row per component — min id by
    default, or the ``keep_by`` argmax (see :func:`dedup_by_pairs`).
    ``max_bucket_size`` = the hot-bucket skew guard and ``hot_bucket``
    its mode ('drop' | recall-preserving 'salt') — see
    near_dup_pairs_minhash."""
    pairs = near_dup_pairs_minhash(
        df, on, id_col, threshold, num_hashes, bands, shingle, word,
        max_bucket_size=max_bucket_size, hot_bucket=hot_bucket,
    )
    return dedup_by_pairs(df, pairs, id_col, keep_by=keep_by)


def near_dup_pairs_simhash(
    df: DataFrame,
    on,
    id_col: str,
    hamming_threshold: int = 3,
    word: bool = True,
    max_bucket_size: int | None = None,
    hot_bucket: str = "drop",
) -> DataFrame:
    """Candidate pairs with simhash hamming distance <= threshold.

    Pigeonhole: split the 64-bit fingerprint into (threshold+1) blocks;
    any pair within distance k agrees on >= 1 block -> equi-join per
    block, then verify with bit_count(xor). Returns (src, dst, hamming).
    ``max_bucket_size`` bounds per-block join fan-out and
    ``hot_bucket`` its mode ('drop' | recall-preserving 'salt') — see
    ``_cap_buckets``; quantify drop-mode losses with
    :func:`simhash_cap_stats`.
    """
    banded = _simhash_banded(df, on, id_col, hamming_threshold, word)
    banded = _cap_buckets(banded, ["blk", "bval"], max_bucket_size, hot_bucket)

    l = banded.alias("l")
    r = banded.alias("r")
    cond = (
        (F.col("l.blk") == F.col("r.blk"))
        & (F.col("l.bval") == F.col("r.bval"))
        & (F.col("l._id") < F.col("r._id"))
    )
    if "_salt" in banded.columns:
        cond = cond & _salt_pair_cond()
    cand = (
        l.join(r, cond)
        .select(
            F.col("l._id").alias("src"),
            F.col("r._id").alias("dst"),
            F.col("l._sim").alias("sim_l"),
            F.col("r._sim").alias("sim_r"),
        )
        .dropDuplicates(["src", "dst"])
    )
    ham = F.bit_count(F.col("sim_l").bitwiseXOR(F.col("sim_r")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= hamming_threshold
    ).select("src", "dst", "hamming")


def _simhash_banded(
    df: DataFrame, on, id_col: str, hamming_threshold: int, word: bool
) -> DataFrame:
    """Shared simhash build: (_id, _sim, blk, bval) pigeonhole block
    rows, UNCAPPED — consumed by the pair self-join (which applies the
    skew cap) and by :func:`simhash_cap_stats` (which quantifies it).
    """
    on_list = [on] if isinstance(on, str) else list(on)
    key = serialize_columns(on_list, DEFAULT_SEP)
    base = KJ.ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("_id"), key.alias("_key")
    )
    # relational simhash: DISTINCT shingle rows (codegen gram build),
    # 62-bit hash as a top-level projection (codegen unrolled
    # poly_hash), then 62 conditional-sum aggregates in one groupBy —
    # the array form (explode(shingle_hashes64)) evaluates the hash
    # inside an interpreted lambda per gram.
    # SQL-text expression forms (one F.expr parse instead of thousands
    # of py4j roundtrips — the node-by-node build of the two unrolled
    # poly_hashes + 62 vote aggregates + 62-term fingerprint cost ~3 s
    # of DRIVER time per query)
    ex = _distinct_shingle_rows(base, 1, word).select(
        "_id",
        (
            S.poly_hash("_g", salt=0) * F.lit(2147483648)
            + S.poly_hash("_g", salt=1)
        ).alias("_h"),
    )
    nbits = 62
    votes = ex.groupBy("_id").agg(
        *[
            F.expr(f"sum(CASE WHEN (_h & {1 << j}) != 0 THEN 1 ELSE -1 END)").alias(f"_v{j}")
            for j in range(nbits)
        ]
    )
    # empty hash list -> vote 0 -> bit set (parity with the
    # aggregate-over-empty-array semantics of simhash64); all-BIGINT
    # terms so the sum never switches int->long midway
    sim_sql = " + ".join(
        f"(CASE WHEN coalesce(_v{j}, 0) >= 0 THEN CAST({1 << j} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for j in range(nbits)
    )
    base = base.join(votes, "_id", "left").select("_id", F.expr(sim_sql).alias("_sim"))
    # both sides of the band self-join below consume this relation, and
    # Spark does not CSE common subplans across a self-join — without a
    # lineage cut the whole fingerprint stage (scan -> shingle ->
    # 62-vote aggregate) executes TWICE. The (_id, _sim) relation is 16
    # bytes/row, so materializing it is free at any scale.
    base = base.localCheckpoint(eager=False)

    nblocks = hamming_threshold + 1
    width = 64 // nblocks + (1 if 64 % nblocks else 0)
    # python-side block loop: shiftrightunsigned needs a literal int
    # shift, and nblocks is tiny and known
    blocks = F.array(
        *[
            F.struct(
                F.lit(bi).alias("blk"),
                F.shiftrightunsigned(F.col("_sim"), bi * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bval"),
            )
            for bi in range(nblocks)
        ]
    )
    return base.select(
        "_id", "_sim", F.explode(blocks).alias("bb")
    ).select("_id", "_sim", F.col("bb.blk").alias("blk"), F.col("bb.bval").alias("bval"))


def minhash_cap_stats(
    df: DataFrame,
    on,
    id_col: str,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Observable for :func:`near_dup_pairs_minhash`'s
    ``hot_bucket='drop'`` skew cap ("no silent caps"): one summary row
    of exactly what the cap drops at this corpus — see
    :func:`bucket_cap_stats` for the column contract. Run it before
    (or alongside) a capped dedup to decide between 'drop', 'salt',
    and a larger cap; ``pairs_dropped == 0`` means the cap is a
    no-op on this corpus."""
    _, banded = _minhash_base_banded(
        df, on, id_col, num_hashes, bands, shingle, word, None
    )
    return bucket_cap_stats(banded, ["band", "bsig"], max_bucket_size)


def simhash_cap_stats(
    df: DataFrame,
    on,
    id_col: str,
    hamming_threshold: int = 3,
    word: bool = True,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Observable for :func:`near_dup_pairs_simhash`'s
    ``hot_bucket='drop'`` skew cap — one summary row (see
    :func:`bucket_cap_stats`) quantifying the pigeonhole blocks the
    cap would drop."""
    banded = _simhash_banded(df, on, id_col, hamming_threshold, word)
    return bucket_cap_stats(banded, ["blk", "bval"], max_bucket_size)


def jaccard_cap_stats(
    df: DataFrame,
    on,
    id_col: str,
    shingle: int = 3,
    word: bool = True,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Observable for :func:`near_dup_pairs_jaccard`'s
    ``max_shingle_freq`` stopword cap: one summary row over the
    DISTINCT shingle df distribution — ``buckets_total`` (distinct
    shingles), ``buckets_dropped`` (df > cap), ``rows_dropped``
    (doc-shingle memberships excluded from the join), and
    ``pairs_dropped`` (sum df*(df-1)/2 over dropped shingles — the
    intersection contributions lost; reported jaccard stays an exact
    lower bound). Same column contract as :func:`bucket_cap_stats`;
    note the jaccard join deliberately has NO salt mode — an
    ultra-common shingle is a stopword, and excluding it is the
    POINT of the cap, not a memory compromise — so
    ``salt_extra_rows`` here is informational only."""
    on_list = [on] if isinstance(on, str) else list(on)
    key = serialize_columns(on_list, DEFAULT_SEP)
    base = df.select(F.col(id_col).cast("long").alias("_id"), key.alias("_key"))
    tok = _distinct_shingle_rows(base, shingle, word)
    return bucket_cap_stats(tok, ["_g"], max_shingle_freq)


def semdedup_cap_stats(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    n_cells: int | str = "auto",
    max_cell_size: int = 100_000,
) -> DataFrame:
    """Observable for :func:`near_dup_pairs_semdedup`'s hot-cell cap:
    one summary row (:func:`bucket_cap_stats` contract) over the SAME
    deterministic seeded-centroid cell assignment the operator uses —
    ``pairs_dropped`` counts the within-cell comparisons a
    ``hot_cell='drop'`` run would skip. A large value means the
    centroids failed to split the corpus: raise ``n_cells`` (the
    quadratic-work knob) before reaching for the cap."""
    from .ann import _assign_cells_declarative, ivf_seed_centroids, resolve_n_cells

    require_integral_id(df, id_col, "semdedup_cap_stats")
    n_cells = resolve_n_cells(n_cells, df.count)
    base = KJ.ensure_parallelism(
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            S.l2_normalize(F.col(vector_col)).alias("_v"),
        )
    )
    cent = ivf_seed_centroids(base, "_id", "_v", n_cells)
    assigned = _assign_cells_declarative(base, "_id", "_v", cent, 1)
    return bucket_cap_stats(assigned, ["cell"], max_cell_size)


def near_dup_pairs_jaccard(
    df: DataFrame,
    on,
    id_col: str,
    threshold: float = 0.8,
    shingle: int = 3,
    word: bool = True,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join via shingle explode.

    Relational plan: explode distinct shingles -> self equi-join on the
    shingle -> per-pair intersection count -> jaccard from set sizes.
    Cost scales with sum over shingles of (docs containing it)^2.
    ``max_shingle_freq`` drops shingles present in more than that many
    docs from the JOIN only (the stopword cap for web-scale corpora):
    set sizes keep every shingle, so reported jaccard values are exact
    lower bounds — pairs sharing only ultra-common shingles are the
    ones lost, the standard recall trade. None = fully exact.
    Returns (src, dst, jaccard), src < dst.
    """
    on_list = [on] if isinstance(on, str) else list(on)
    key = serialize_columns(on_list, DEFAULT_SEP)
    base = KJ.ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("_id"), key.alias("_key")
    )
    # distinct shingle rows, gram build in codegen; consumed three
    # times below (sizes + both sides of the self-join) — cut lineage
    # so the shingling subplan executes once
    tok = _distinct_shingle_rows(base, shingle, word).localCheckpoint(eager=False)
    sizes = tok.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    joinable = tok
    if max_shingle_freq is not None:
        freq = tok.groupBy("_g").agg(F.count(F.lit(1)).alias("_gf"))
        joinable = tok.join(
            freq.filter(F.col("_gf") <= max_shingle_freq).drop("_gf"), "_g"
        )
    l = joinable.alias("l")
    r = joinable.alias("r")
    inter = (
        l.join(r, (F.col("l._g") == F.col("r._g")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("src"), F.col("r._id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "src").withColumnRenamed("_n", "_nl"), "src")
        .join(sizes.withColumnRenamed("_id", "dst").withColumnRenamed("_n", "_nr"), "dst")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / F.greatest(F.col("_nl") + F.col("_nr") - F.col("_inter"), F.lit(1)).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("src", "dst", "jaccard")


def near_dup_pairs_embedding(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    threshold: float = 0.95,
    mode: str = "exact_cross",
) -> DataFrame:
    """Cosine near-dup pairs over a vector column. exact_cross for the
    oracle path; 'lsh' routes through BucketedRandomProjectionLSH for
    the 100 TB path. Returns (src, dst, cosine), src < dst."""
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        S.l2_normalize(F.col(vector_col)).alias("_v"),
    )
    if mode == "lsh":
        from . import knn_join as KJ

        l = base.select(F.col("_id").alias(KJ.LEFT_ID), F.col("_v").alias(KJ.LEFT_EMB))
        r = base.select(F.col("_id").alias(KJ.RIGHT_ID), F.col("_v").alias(KJ.RIGHT_EMB))
        scorer = type("O", (), {"needs_embeddings": True, "score_is_dot": True,
                                "score": staticmethod(lambda: S.dot(F.col(KJ.LEFT_EMB), F.col(KJ.RIGHT_EMB)))})()
        cand = KJ._lsh_candidates(l, r, scorer, threshold=threshold)
        return (
            cand.filter(F.col(KJ.LEFT_ID) < F.col(KJ.RIGHT_ID))
            .select(F.col(KJ.LEFT_ID).alias("src"), F.col(KJ.RIGHT_ID).alias("dst"),
                    F.col("score").alias("cosine"))
        )
    from . import knn_join as KJ

    l = KJ.ensure_parallelism(base).alias("l")
    r = base.alias("r")
    cos = S.dot(F.col("l._v"), F.col("r._v"))
    return (
        l.join(r, F.col("l._id") < F.col("r._id"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l._id").alias("src"), F.col("r._id").alias("dst"), "cosine")
    )


def dedup_embedding(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    threshold: float = 0.95,
    mode: str = "exact_cross",
    keep_by: Column | str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dedup: CC over near-dup pairs, keep min id
    (or the ``keep_by`` argmax — see :func:`dedup_by_pairs`)."""
    pairs = near_dup_pairs_embedding(df, vector_col, id_col, threshold, mode)
    return dedup_by_pairs(df, pairs, id_col, keep_by=keep_by)


def near_dup_pairs_semdedup(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_cells: int | str = "auto",
    max_cell_size: int | None = None,
    hot_cell: str = "drop",
) -> DataFrame:
    """SemDeDup-style candidate pairs (Abbas et al. 2023,
    arXiv:2303.09540): partition rows into IVF cells around
    deterministic seed centroids (the ``n_cells`` smallest-id vectors —
    same declarative single-probe assignment as
    ``operators/ann.ivf_topk_seeded``, so the whole stage is
    SQL-oracle-checkable), then emit within-cell pairs with cosine >=
    ``threshold``. Returns ``(src, dst, cell, cosine)`` with src < dst.

    Scale shape: the pair stage is an equi-join on ``cell`` — cost is
    sum(|cell|^2) over cells, never a global n^2 cross product, and the
    only broadcast is the n_cells-row centroid table. Pairs spanning two
    cells are deliberately never generated (the SemDeDup approximation);
    use :func:`near_dup_pairs_embedding` when global recall matters more
    than scale. ``max_cell_size`` is the hot-cell skew guard (same
    recall trade as the minhash family's ``max_bucket_size``): a cell
    the seeded centroids fail to split contributes |cell|^2/2 pairs, so
    at scale cap it — members of a dropped cell are simply not deduped
    (``hot_cell='drop'``), or pass ``hot_cell='salt'`` for the
    recall-preserving triangle-salted join (see ``_cap_buckets``).

    **Sizing n_cells**: per-cell work is quadratic, so ``n_cells`` must
    GROW with the corpus — target a few hundred rows per cell
    (n_cells ≈ n/256). Measured at 20k rows/local[32]: n_cells=16 →
    15.6s, 64 → 4.1s, 256 → 4.4s (past the sweet spot the centroid
    broadcast and assignment argmax start to dominate). At 100 TB this
    is the difference between a plan that finishes and one that
    doesn't; SemDeDup's own recipe is ~100k clusters for web-scale
    corpora. The default ``n_cells="auto"`` applies that rule for you
    (ceil(n/256) via a cheap count — see ``ann.resolve_n_cells``); pin
    an int when you need a byte-stable SQL mirror of the assignment.
    """
    from .ann import _assign_cells_declarative, ivf_seed_centroids, resolve_n_cells

    require_integral_id(df, id_col, "near_dup_pairs_semdedup")
    n_cells = resolve_n_cells(n_cells, df.count)
    base = KJ.ensure_parallelism(
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            S.l2_normalize(F.col(vector_col)).alias("_v"),
        )
    )
    cent = ivf_seed_centroids(base, "_id", "_v", n_cells)
    assigned_raw = _assign_cells_declarative(base, "_id", "_v", cent, 1)
    if max_cell_size is not None:
        # _cap_buckets consumes its input twice (bucket sizes + join
        # back) — cut lineage so the centroid-scoring subtree executes
        # once, not twice
        assigned_raw = assigned_raw.localCheckpoint(eager=False)
    # NOTE no lineage cut on the uncapped path: since the round-10
    # kernel rewrite the assignment has exactly ONE consumer (the
    # applyInPandas self-pair kernel below — the pair self-join this
    # used to feed is gone), so an unconditional localCheckpoint only
    # cost a full JVM re-plan of the centroid-scoring subtree at
    # construction (measured ~1.1s per query at sf0.1, round 14
    # §driver-floor) without saving any recompute.
    assigned = _cap_buckets(assigned_raw, ["cell"], max_cell_size, hot_cell)
    salted = "_salt" in assigned.columns
    if not salted:
        # within-cell pairs as the Arrow numpy self-cogroup (bit-equal
        # to the join + fold — knn_join.bucket_dot_self_pairs; the
        # round-10 interpreted-floor fix).
        return KJ.bucket_dot_self_pairs(
            assigned.select("cell", "_id", "_v"), "cell", "_id", "_v",
            threshold,
        ).select("src", "dst", "cell", "cosine")
    # salted twin (round-11): group by (cell, _salt) — the triangle
    # pair rule's two operands both live inside the salt cell, so the
    # group-local kernel evaluates it exactly (off-diagonal cells
    # require cross-_sg endpoints; every uncapped pair emitted once).
    # Measured on the hot 100k clustered corpus: the interpreted
    # salted join ran 87.7s vs 23.3s for drop mode; the kernel form
    # is the same Arrow fold the unsalted path moved to in round 10.
    return KJ.bucket_dot_self_pairs_salted(
        assigned.select("cell", "_id", "_v", "_salt", "_sg"),
        "cell", "_id", "_v", threshold, salt_base=_SALT_BASE,
    ).select("src", "dst", "cell", "cosine")


def semantic_dedup(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_cells: int | str = "auto",
    keep_by: Column | str | None = None,
    max_cell_size: int | None = None,
    hot_cell: str = "drop",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop all but one member of every
    within-cell cosine>=threshold duplicate group (min id by default,
    ``keep_by`` argmax otherwise — see :func:`dedup_by_pairs`).
    Connected components run over the within-cell pairs; since every
    row sits in exactly one cell, components never span cells, so the
    result equals per-cell grouping. With ``n_cells=1`` this reduces
    exactly to :func:`dedup_embedding` (global threshold dedup) —
    pinned in tests/test_dedup_ann.py."""
    pairs = near_dup_pairs_semdedup(
        df, vector_col, id_col, threshold, n_cells, max_cell_size, hot_cell
    )
    return dedup_by_pairs(df, pairs, id_col, keep_by=keep_by)


# ---------------------------------------------------------------------------
# Persistable MinHash index — the production ingest shape the
# near_dup_pairs_minhash_against docstring describes: pay the seen
# corpus's signature build ONCE at ingest, write the band rows +
# verify shingles as parquet, and every later batch joins against the
# files (per-batch cost = |new| signature builds + a collision-sized
# shuffle, independent of the seen corpus's text volume).
# ---------------------------------------------------------------------------

_INDEX_VERSION = 1


def save_minhash_index(
    df: DataFrame,
    path: str,
    on,
    id_col: str,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize the seen-corpus MinHash index at ``path``:
    ``bands/`` (_id, band, bsig) for candidate generation and
    ``shingles/`` (_id, _sh) for exact-jaccard verification, plus a
    one-row ``meta/`` json recording the family parameters — loading
    validates them, because signatures from different (num_hashes,
    bands, shingle, word) families must never be joined."""
    spark = df.sparkSession
    meta = {
        "version": _INDEX_VERSION,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle": shingle,
        "word": word,
    }
    existing = None
    if mode == "append":
        # an append must extend the SAME family — mixed-family band
        # rows would silently join incompatible signatures. The
        # pending-commit gate runs BEFORE the missing-meta fallback: a
        # torn index (failed-but-not-killed writer left the journal
        # pending with the lock released) must fail loudly here, not be
        # treated as "no existing index" — an append against it would
        # rewrite meta, and a later recover_index roll-forward would
        # rename staged relations over the appended rows, silently
        # dropping them. Same for a version-mismatch ValueError.
        from .txn import assert_no_pending_commit

        assert_no_pending_commit(spark, path)
        try:
            existing = _load_index_meta(spark, path)
        except AnalysisException:
            # no index at path yet — append degrades to a fresh build
            existing = None
        if existing is not None:
            for k in ("num_hashes", "bands", "shingle"):
                if int(existing[k]) != int(meta[k]):
                    raise ValueError(
                        f"cannot append to minhash index at {path}: existing "
                        f"{k}={existing[k]} != {meta[k]}"
                    )
            if bool(existing["word"]) != bool(meta["word"]):
                raise ValueError(
                    f"cannot append to minhash index at {path}: existing "
                    f"word={existing['word']} != {meta['word']}"
                )
    base, banded = _minhash_base_banded(
        df, on, id_col, num_hashes, bands, shingle, word, None
    )
    sh = base.select(
        "_id", _shingles_nonempty(F.col("_key"), shingle, word).alias("_sh")
    )
    from .tombstones import clear_tombstones, refresh_index_path

    from .txn import clear_commit_journal
    from .upsert import clear_writer_lock, index_write_lock

    if mode == "overwrite":
        # a rebuild must not inherit tombstones (appending never
        # resurrects a deleted id — see tombstones.py) nor a crashed
        # writer's stale lock marker
        clear_tombstones(spark, path)
        clear_writer_lock(spark, path)
        clear_commit_journal(spark, path)
        banded.write.mode(mode).parquet(f"{path}/bands")
        sh.write.mode(mode).parquet(f"{path}/shingles")
    else:
        # append mode is the minhash family's public append path —
        # locked (reentrant under upsert) like every append_to_*
        with index_write_lock(spark, path):
            banded.write.mode(mode).parquet(f"{path}/bands")
            sh.write.mode(mode).parquet(f"{path}/shingles")
    # meta is a single authoritative row. On an append to a validated
    # existing index the content is IDENTICAL (the family equality
    # check above), so skip the rewrite: an in-place overwrite of a
    # LIVE index's meta is delete-then-write — a crash in between
    # leaves the index unopenable for nothing.
    if existing is None:
        spark.createDataFrame(
            [tuple(meta[k] for k in sorted(meta))],
            ", ".join(
                f"{k} {'boolean' if k == 'word' else 'int'}"
                for k in sorted(meta)
            ),
        ).coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    # refresh LAST — after the meta overwrite, so a session that read
    # the previous meta cannot keep a stale listing for exactly the
    # relation this refresh covers
    refresh_index_path(spark, path)


def _load_index_meta(spark, path: str) -> dict:
    from .txn import assert_no_pending_commit

    assert_no_pending_commit(spark, path)
    row = spark.read.json(f"{path}/meta").collect()[0].asDict()
    if int(row["version"]) != _INDEX_VERSION:
        raise ValueError(
            f"minhash index at {path} has version {row['version']}, "
            f"this build reads version {_INDEX_VERSION}"
        )
    return row


def delete_from_minhash_index(
    ids: DataFrame,
    path: str,
    id_col: str,
) -> None:
    """Tombstone document ids in a :func:`save_minhash_index` directory
    (see :mod:`.tombstones`). Deleted documents stop generating
    candidates in :func:`near_dup_pairs_minhash_against_index`
    immediately — the anti-join masks their band rows BEFORE the
    bucket-size/salt accounting, so skew caps see the surviving bucket
    sizes, not the historical ones. No staleness: the index state is
    per-row (band signatures + verify shingles), so a tombstoned run
    equals one against a filtered rebuild. ``ids`` carries the
    original id column (``id_col`` — the index stores it as ``_id``);
    :func:`purge_minhash_index` rewrites the files when the masked
    rows' scan cost matters."""
    from .tombstones import refresh_index_path, write_tombstones

    spark = ids.sparkSession
    _load_index_meta(spark, path)  # version gate
    write_tombstones(ids, path, id_col, "_id", stored_rel="bands")
    refresh_index_path(spark, path)


def purge_minhash_index(spark, path: str, out_path: str) -> None:
    """Physically apply a MinHash index's tombstones: rewrite
    ``bands/`` and ``shingles/`` minus the deleted ids into a fresh
    index at ``out_path`` (family meta copied, tombstone set empty).
    Output-identical to the tombstoned view; I/O scales with the
    index. Same write-then-rename commit discipline as the other
    purge paths."""
    from .tombstones import (
        anti_tombstones, clear_tombstones, refresh_index_path,
        require_distinct_out,
    )

    require_distinct_out(path, out_path, "purge_minhash_index")
    _load_index_meta(spark, path)  # version gate
    clear_tombstones(spark, out_path)
    for part in ("bands", "shingles"):
        rel = spark.read.parquet(f"{path}/{part}")
        anti_tombstones(rel, spark, path, "_id", "_id").write.mode(
            "overwrite"
        ).parquet(f"{out_path}/{part}")
    spark.read.json(f"{path}/meta").coalesce(1).write.mode(
        "overwrite"
    ).json(f"{out_path}/meta")
    refresh_index_path(spark, out_path)


def near_dup_pairs_minhash_against_index(
    new: DataFrame,
    path: str,
    on,
    id_col: str,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
    hot_bucket: str = "drop",
) -> DataFrame:
    """:func:`near_dup_pairs_minhash_against` with the seen side read
    from a :func:`save_minhash_index` directory instead of rebuilt from
    text — row-for-row identical output (the family parameters come
    from the index metadata). Returns (src=new id, dst=indexed id,
    jaccard).

    ``max_bucket_size``/``hot_bucket`` are the same ingest-time skew
    guard as :func:`near_dup_pairs_minhash_against` — 'drop' caps each
    side by its own bucket sizes, 'salt' grid-partitions hot buckets
    (:func:`_salt_two_sided`) with output identical to uncapped. The
    per-batch sizes pass over the stored band relation is metadata-
    cheap next to the join it bounds."""
    spark = new.sparkSession
    meta = _load_index_meta(spark, path)
    num_hashes, bands = int(meta["num_hashes"]), int(meta["bands"])
    shingle, word = int(meta["shingle"]), bool(meta["word"])

    salted = max_bucket_size is not None and hot_bucket == "salt"
    side_cap = None if salted else max_bucket_size
    if max_bucket_size is not None and hot_bucket not in ("drop", "salt"):
        raise ValueError(
            f"hot_bucket must be 'drop' or 'salt', got {hot_bucket!r}"
        )
    nbase, nbanded = _minhash_base_banded(
        new, on, id_col, num_hashes, bands, shingle, word, side_cap
    )
    sbanded = spark.read.parquet(f"{path}/bands")
    ssh = spark.read.parquet(f"{path}/shingles")
    # tombstones mask the seen side BEFORE the cap/salt accounting, so
    # bucket sizes reflect survivors (no-op without deletes/)
    from .tombstones import anti_tombstones

    sbanded = anti_tombstones(sbanded, spark, path, "_id", "_id")
    ssh = anti_tombstones(ssh, spark, path, "_id", "_id")
    if salted:
        nbanded, sbanded = _salt_two_sided(
            nbanded, sbanded, ["band", "bsig"], max_bucket_size
        )
    elif side_cap is not None:
        sbanded = _cap_buckets(sbanded, ["band", "bsig"], side_cap)
    l = nbanded.alias("l")
    r = sbanded.alias("r")
    cond = (F.col("l.band") == F.col("r.band")) & (
        F.col("l.bsig") == F.col("r.bsig")
    )
    if salted:
        cond = cond & (F.col("l._salt") == F.col("r._salt"))
    cand = (
        l.join(r, cond)
        .select(F.col("l._id").alias("src"), F.col("r._id").alias("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=False)
    )
    sh_n = nbase.join(cand.select(F.col("src").alias("_id")).distinct(), "_id").select(
        F.col("_id").alias("src"),
        _hash_shingles(
            _shingles_nonempty(F.col("_key"), shingle, word)
        ).alias("sh_l"),
    ).localCheckpoint(eager=False)
    # the stored shingles/ relation keeps STRING arrays (index format
    # unchanged); fingerprint them at read, post-semi-join — both
    # sides of the intersect must use the same hash
    sh_s = ssh.join(cand.select(F.col("dst").alias("_id")).distinct(), "_id").select(
        F.col("_id").alias("dst"), _hash_shingles(F.col("_sh")).alias("sh_r")
    ).localCheckpoint(eager=False)
    # per-side broadcast under the id budget (VERIFY_BROADCAST_MAX_IDS)
    budget = int(
        spark.conf.get(
            VERIFY_BROADCAST_MAX_IDS_CONF,
            str(VERIFY_BROADCAST_MAX_IDS_DEFAULT),
        )
    )
    bc_n = sh_n.count() <= budget
    bc_s = sh_s.count() <= budget
    if bc_n:
        sh_n = F.broadcast(sh_n)
    if bc_s:
        sh_s = F.broadcast(sh_s)
    if bc_n and bc_s:
        # no shuffle above the pair checkpoint in the all-broadcast
        # shape — re-spread it or the intersect runs on the few
        # AQE-coalesced partitions (see _verify_attach_shingles)
        cand = KJ.ensure_parallelism(cand)
    cand = cand.join(sh_n, "src").join(sh_s, "dst")
    return _jaccard_tail(cand, threshold)


def containment_pairs(
    df: DataFrame,
    on,
    id_col: str,
    threshold: float = 0.8,
    shingle: int = 3,
    word: bool = True,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC containment join: ``|A ∩ B| / |A|`` over distinct
    n-gram shingle sets — the quote/subset detector symmetric Jaccard
    misses (a paragraph fully contained in a long document has
    containment ~1 but Jaccard ~|para|/|doc| ~ 0). The classic use is
    finding documents that EMBED training/benchmark text, or short
    boilerplate swallowed into aggregator pages.

    Same relational shape as :func:`near_dup_pairs_jaccard` (distinct
    shingle explode -> self equi-join -> per-pair intersection count),
    with the same ``max_shingle_freq`` stopword cap (containment values
    stay exact lower bounds under the cap). Emits BOTH directions when
    both clear the threshold: ``(src, dst, containment)`` means
    "containment of SRC's shingle set inside dst" — src is the
    (possibly) contained side. Pairs are src != dst, each direction
    scored with its own denominator.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    on_list = [on] if isinstance(on, str) else list(on)
    key = serialize_columns(on_list, DEFAULT_SEP)
    base = KJ.ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("_id"), key.alias("_key")
    )
    tok = _distinct_shingle_rows(base, shingle, word).localCheckpoint(eager=False)
    sizes = tok.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    joinable = tok
    if max_shingle_freq is not None:
        freq = tok.groupBy("_g").agg(F.count(F.lit(1)).alias("_gf"))
        joinable = tok.join(
            freq.filter(F.col("_gf") <= max_shingle_freq).drop("_gf"), "_g"
        )
    l = joinable.alias("l")
    r = joinable.alias("r")
    # strict < join halves the pair work; both directions emit from the
    # same intersection count with their own denominators
    inter = (
        l.join(r, (F.col("l._g") == F.col("r._g")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("_a"), F.col("r._id").alias("_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sized = (
        inter.join(
            sizes.withColumnRenamed("_id", "_a").withColumnRenamed("_n", "_na"), "_a"
        ).join(
            sizes.withColumnRenamed("_id", "_b").withColumnRenamed("_n", "_nb"), "_b"
        )
    )
    ab = sized.select(
        F.col("_a").alias("src"), F.col("_b").alias("dst"),
        (F.col("_inter").cast("double")
         / F.greatest(F.col("_na"), F.lit(1)).cast("double")).alias("containment"),
    )
    ba = sized.select(
        F.col("_b").alias("src"), F.col("_a").alias("dst"),
        (F.col("_inter").cast("double")
         / F.greatest(F.col("_nb"), F.lit(1)).cast("double")).alias("containment"),
    )
    return ab.unionByName(ba).filter(F.col("containment") >= threshold)
