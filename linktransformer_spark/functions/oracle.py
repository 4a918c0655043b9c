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


def sql_l2_normalize(a: str, clip: float = 1e-12) -> str:
    """Mirror of similarity.l2_normalize: x/max(||a||, clip) per element
    — use in a CTE so the norm isn't recomputed per pair. Spark's
    normalize-then-dot differs bit-wise from dot/(norm*norm); mirror
    WHICHEVER the Spark side uses."""
    return (
        f"list_transform({a}, x -> CAST(x AS DOUBLE) / "
        f"greatest({sql_l2_norm(a)}, {clip}))"
    )


# ---------------------------------------------------------------------------
# text-pipeline mirrors (operators/textpipe.py, operators/dedup.py).
# NOTE list_distinct returns elements in a different ORDER than Spark's
# array_distinct — every consumer below is order-insensitive (sizes,
# mins, set intersections).
# ---------------------------------------------------------------------------

def sql_hash_ngram_counts(s: str, dim: int = 64, n: int = 3, salt: int = 0) -> str:
    """DuckDB mirror of encoders.hash_ngram.HashNgramEncoder BEFORE
    normalization: the ``dim``-bucket char-``n``-gram count vector of
    expr ``s`` (exact small integers in double). Compose with
    ``sql_l2_normalize`` over a COLUMN REFERENCE in a second CTE stage
    — the count tree is wide, and normalizing inline would re-evaluate
    it three times per row. Bucket counts, the integer-square norm,
    and the final divisions are all exact/same-IEEE as the Spark
    relational encode and its numpy batch twin — bit-identical
    embeddings across engines."""
    buckets = (
        f"list_transform({sql_char_ngrams(s, n)}, "
        f"g -> {sql_poly_hash('g', salt)} % {dim})"
    )
    return (
        f"list_transform(range(0, {dim}), "
        f"j -> CAST(len(list_filter({buckets}, b -> b = j)) AS DOUBLE))"
    )


def sql_char_codes(s: str) -> str:
    return (
        f"list_transform(list_filter(string_split({s}, ''), ch -> ch <> ''), "
        f"ch -> CAST(ord(ch) AS BIGINT))"
    )


def sql_word_shingles(s: str, n: int) -> str:
    """Distinct word n-gram shingles (mirror of dedup._shingles word=True)."""
    toks = sql_word_tokens(s)
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(0, len({toks}) - {n} + 1), "
        f"i -> array_to_string(({toks})[i+1:i+{n}], ' ')) "
        f"ELSE [array_to_string({toks}, ' ')] END)"
    )


def sql_minhash_signature_from_hashes(hs: str, num_hashes: int) -> str:
    """List literal of minhash values over a PRE-HASHED list expr ``hs``
    (mirror of dedup.minhash_signature). Hash the shingles once in a
    subquery — inlining poly_hash into all num_hashes transforms would
    recompute it num_hashes times."""
    from ..operators.dedup import MH_A_STEP, MH_B_STEP, MH_PRIME

    parts = []
    for i in range(num_hashes):
        a = (1 + i * MH_A_STEP) % MH_PRIME
        b = (i * MH_B_STEP) % MH_PRIME
        parts.append(
            f"coalesce(list_min(list_transform({hs}, h -> "
            f"({a} * h + {b}) % {MH_PRIME})), {MH_PRIME})"
        )
    return "[" + ", ".join(parts) + "]"


def sql_simhash_from_hashes(hs: str, nbits: int = 62) -> str:
    """Mirror of dedup.simhash64 over a pre-materialized hash list."""
    bits = []
    for j in range(nbits):
        votes = (
            f"list_reduce(list_prepend(0, list_transform({hs}, "
            f"h -> CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE -1 END)), (a, x) -> a + x)"
        )
        bits.append(f"(CASE WHEN {votes} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def sql_shingle_hashes64(sh: str) -> str:
    """Mirror of dedup.shingle_hashes64 over a shingle-list expr."""
    return (
        f"list_transform({sh}, g -> {sql_poly_hash('g', 0)} * 2147483648 "
        f"+ {sql_poly_hash('g', 1)})"
    )


def sql_hyperplane_bucket(v: str, dim: int, n_planes: int) -> str:
    """Mirror of ann.hyperplane_bucket: sign-bit bucket of ``v`` against
    the deterministic Knuth-hash hyperplanes. Coefficients are exact
    doubles (k/2^31 - 0.5), emitted via repr() which round-trips; the
    dot is the same sequential fold as similarity.dot, so the sign —
    and hence the bucket id — is bit-identical across engines."""
    from ..operators.ann import hyperplane_component

    terms = []
    for h in range(n_planes):
        coeffs = "[" + ", ".join(
            repr(hyperplane_component(h, j)) for j in range(dim)
        ) + "]"
        terms.append(
            f"(CASE WHEN {sql_dot(v, coeffs)} >= 0 THEN {1 << h} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def sql_lang_id(s: str) -> str:
    """Mirror of textpipe.lang_id_expr (same profiles, same tie-break)."""
    from ..operators.textpipe import LANG_PROFILES

    toks = sql_word_tokens(s)
    cjk = (
        f"len(list_filter({sql_char_codes(s)}, "
        f"cp -> cp >= 19968 AND cp <= 40959))"
    )
    expr_lang, expr_hits = "'und'", "0"
    for lang in sorted(LANG_PROFILES):
        prof = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]"
        hits = f"len(list_filter({toks}, t -> list_contains({prof}, t)))"
        expr_lang = f"CASE WHEN {hits} > {expr_hits} THEN '{lang}' ELSE {expr_lang} END"
        expr_hits = f"CASE WHEN {hits} > {expr_hits} THEN {hits} ELSE {expr_hits} END"
    return (
        f"CASE WHEN CAST({cjk} AS DOUBLE) / greatest(length({s}), 1) > 0.3 "
        f"THEN 'zh' ELSE {expr_lang} END"
    )


def sql_quality_score(s: str) -> str:
    """Mirror of textpipe.quality_score_expr."""
    from ..operators.textpipe import LANG_PROFILES

    toks = sql_word_tokens(s)
    n_toks = f"greatest(len({toks}), 1)"
    n_chars = f"greatest(length({s}), 1)"
    length_ok = f"(CASE WHEN length({s}) >= 50 AND length({s}) <= 20000 THEN 1.0 ELSE 0.0 END)"
    alpha = (
        f"len(list_filter({sql_char_codes(s)}, cp -> "
        f"(cp >= 65 AND cp <= 90) OR (cp >= 97 AND cp <= 122) OR cp = 32))"
    )
    alpha_ratio = f"(CAST({alpha} AS DOUBLE) / {n_chars})"
    all_stop = "[" + ", ".join(
        f"'{w}'" for ws in LANG_PROFILES.values() for w in ws
    ) + "]"
    stop_ratio = (
        f"(CAST(len(list_filter({toks}, t -> list_contains({all_stop}, t))) AS DOUBLE) / {n_toks})"
    )
    stop_ok = f"(CASE WHEN {stop_ratio} >= 0.05 AND {stop_ratio} <= 0.6 THEN 1.0 ELSE 0.0 END)"
    mean_wlen = (
        f"(CAST(list_reduce(list_prepend(0, list_transform({toks}, t -> length(t))), "
        f"(a, x) -> a + x) AS DOUBLE) / {n_toks})"
    )
    wlen_ok = f"(CASE WHEN {mean_wlen} >= 2.0 AND {mean_wlen} <= 12.0 THEN 1.0 ELSE 0.0 END)"
    return f"(({length_ok} + {alpha_ratio} + {stop_ok} + {wlen_ok}) / 4.0)"


def sql_token_count(s: str) -> str:
    return f"len({sql_word_tokens(s)})"


def sql_subword_count(s: str) -> str:
    """Mirror of textpipe.subword_count_expr."""
    runs = f"list_filter(string_split_regex(lower({s}), '[^a-z0-9]+'), t -> t <> '')"
    alnum = (
        f"list_reduce(list_prepend(0, list_transform({runs}, "
        f"t -> CAST(ceil(length(t)/4.0) AS INT))), (a, x) -> a + x)"
    )
    punct = (
        f"len(list_filter({sql_char_codes(s)}, cp -> NOT ("
        f"(cp >= 48 AND cp <= 57) OR (cp >= 65 AND cp <= 90) "
        f"OR (cp >= 97 AND cp <= 122) OR cp = 32)))"
    )
    return f"CAST({alnum} + {punct} AS BIGINT)"


def sql_fingerprint(s: str) -> str:
    norm = f"regexp_replace(trim(lower({s})), '\\s+', ' ', 'g')"
    return sql_poly_hash(norm)


def sql_hyperplane_probes(dots: str, n_planes: int, n_extra: int) -> str:
    """Mirror of ann.hyperplane_probe_buckets' bucket LIST given a
    per-plane dot list expression ``dots`` (1-based): the exact bucket
    plus ``n_extra`` least-confident-bit flips. Confidence ranks use
    the same O(n_planes^2) counting comparison — integer arithmetic
    after the (bit-identical) dot folds, so probe sets match Spark
    exactly."""
    def d(h):
        return f"{dots}[{h + 1}]"

    b0 = " + ".join(
        f"(CASE WHEN {d(h)} >= 0 THEN {1 << h} ELSE 0 END)"
        for h in range(n_planes)
    )
    b0 = f"({b0})"
    ranks = []
    for h in range(n_planes):
        terms = []
        for k in range(n_planes):
            if k == h:
                continue
            tie = f"(abs({d(k)}) = abs({d(h)}) AND {int(k < h)} = 1)"
            terms.append(
                f"(CASE WHEN abs({d(k)}) < abs({d(h)}) OR {tie} "
                f"THEN 1 ELSE 0 END)"
            )
        ranks.append("(" + (" + ".join(terms) if terms else "0") + ")")
    probes = [b0]
    for r in range(n_extra):
        mask = " + ".join(
            f"({1 << h} * (CASE WHEN {ranks[h]} = {r} THEN 1 ELSE 0 END))"
            for h in range(n_planes)
        )
        probes.append(f"xor({b0}, ({mask}))")
    return "[" + ", ".join(probes) + "]"


def sql_phonetic_key(s: str) -> str:
    """Mirror of similarity.phonetic_key — the same
    regexp_replace/translate/substr pipeline, text for text."""
    from .similarity import _PHONETIC_CODES, _PHONETIC_LETTERS

    a = f"regexp_replace(upper(coalesce({s}, '')), '[^A-Z]', '', 'g')"
    t = f"translate({a}, '{_PHONETIC_LETTERS}', '{_PHONETIC_CODES}')"
    for d in range(7):
        t = f"regexp_replace({t}, '{d}{{2,}}', '{d}', 'g')"
    rest = f"regexp_replace(substr({t}, 2), '0', '', 'g')"
    return (
        f"CASE WHEN {a} = '' THEN '' ELSE "
        f"substr({a}, 1, 1) || substr({rest} || '000', 1, 3) END"
    )
