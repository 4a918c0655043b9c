"""Similarity / vector scalar functions — pure Catalyst expressions.

Everything here stays JVM-side (whole-stage codegen over higher-order
array functions); no Python UDFs. Integer-arithmetic hashes are defined
so a SQL oracle (DuckDB) can reproduce them bit-for-bit — see
``functions/oracle.py`` for the mirrored SQL text.

Reference kernels being re-expressed:
- L2 normalize: /root/reference/src/linktransformer/infer.py:141-142
  (clipped variant :815-816)
- row-wise cosine: /root/reference/src/linktransformer/utils.py:102-107
- all-pairs cosine: sklearn cosine_similarity at infer.py:537
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1, prime; all rolling-hash arithmetic stays < 2^39, exact in BIGINT
HASH_MOD = 2147483647
HASH_BASE = 131


def char_codes(s: Column) -> Column:
    """Array of unicode code points of ``s`` (empty array for '').
    Empty chars filtered: Spark split('', '') == [''] but DuckDB
    string_split('', '') differs — filtering makes both yield []."""
    return F.transform(
        F.filter(F.split(s, ""), lambda ch: ch != F.lit("")),
        lambda ch: F.ascii(ch).cast("long"),
    )


# chars of rolling hash unrolled into codegen arithmetic; the
# interpreted fold handles only the tail of longer strings
_POLY_UNROLL = 24


def ssql_poly_hash(s: str, salt: int = 0) -> str:
    """Spark-SQL TEXT of ``poly_hash`` over SQL expression ``s``.

    Generates the exact expression tree the Column form builds (same
    guards, same arithmetic, same fold tail), but as one string for a
    single ``F.expr`` parse. Building the unrolled form node-by-node
    through py4j costs ~240 driver roundtrips (~0.7 s per call site);
    parsing the equivalent text is ~10 ms. ``s`` is spliced verbatim
    O(_POLY_UNROLL) times — pass a (short) column reference, not a
    deep computed expression.
    """
    ln = f"length({s})"
    acc = f"CAST({salt} AS BIGINT)"
    for i in range(1, _POLY_UNROLL + 1):
        c_i = f"CAST(ascii(substring({s}, {i}, 1)) AS BIGINT)"
        mult = f"(CASE WHEN {ln} >= {i} THEN CAST({HASH_BASE} AS BIGINT) ELSE CAST(1 AS BIGINT) END)"
        add = f"(CASE WHEN {ln} >= {i} THEN {c_i} ELSE CAST(0 AS BIGINT) END)"
        acc = f"((({acc}) * {mult} + {add}) % {HASH_MOD})"
    tail = f"substring({s}, {_POLY_UNROLL + 1}, greatest({ln} - {_POLY_UNROLL}, 0))"
    codes = (
        f"transform(filter(split({tail}, ''), ch -> ch != ''), "
        f"ch -> CAST(ascii(ch) AS BIGINT))"
    )
    fold = f"aggregate({codes}, {acc}, (a, c) -> (a * {HASH_BASE} + c) % {HASH_MOD})"
    return f"(CASE WHEN {ln} <= {_POLY_UNROLL} THEN {acc} ELSE {fold} END)"


def poly_hash(s: Column | str, salt: int = 0) -> Column:
    """Deterministic polynomial rolling hash of a string, in [0, HASH_MOD).

    acc = (acc * 131 + code) % (2^31-1), seeded with ``salt``.
    Exact-integer and engine-portable (DuckDB mirror in oracle.py) —
    unlike Spark's murmur3 ``hash()`` which no other engine reproduces.

    ``s`` may be a Column or a SQL TEXT fragment; the text form routes
    through ``ssql_poly_hash`` + one ``F.expr`` parse (two orders of
    magnitude cheaper to construct — use it in operator hot paths).

    Execution shape: the first _POLY_UNROLL characters are hashed with
    unrolled per-position arithmetic (whole-stage codegen); only strings
    longer than that fall into an interpreted ``F.aggregate`` fold for
    the tail, seeded with the unrolled prefix hash. The pure-fold form
    is CodegenFallback and measured ~8us per character-step — it alone
    was ~40 CPU-s of the sf0.1 minhash pipeline. Values are identical
    in both shapes (each guarded step is a no-op past end-of-string).
    """
    if isinstance(s, str):
        return F.expr(ssql_poly_hash(s, salt))
    ln = F.length(s)
    acc: Column = F.lit(salt).cast("long")
    for i in range(1, _POLY_UNROLL + 1):
        # each step must reference acc exactly ONCE — Column trees are
        # copied, not shared, so when(c, f(acc)).otherwise(acc) doubles
        # the tree per step (2^24 nodes = planner OOM). Past-end steps
        # become the exact identity acc*1 + 0 (acc < HASH_MOD already).
        c = F.ascii(s.substr(F.lit(i), F.lit(1))).cast("long")
        mult = F.when(ln >= i, F.lit(HASH_BASE).cast("long")).otherwise(F.lit(1).cast("long"))
        add = F.when(ln >= i, c).otherwise(F.lit(0).cast("long"))
        acc = (acc * mult + add) % F.lit(HASH_MOD)
    tail = s.substr(F.lit(_POLY_UNROLL + 1), F.greatest(ln - F.lit(_POLY_UNROLL), F.lit(0)))
    return F.when(
        ln <= F.lit(_POLY_UNROLL), acc
    ).otherwise(
        F.aggregate(
            char_codes(tail),
            acc,
            lambda a, c: (a * HASH_BASE + c) % HASH_MOD,
        )
    )


def ssql_poly_hash_at(s: str, pos: str, n: int, salt: int = 0) -> str:
    """Spark-SQL TEXT of ``poly_hash_at`` (same tree, one parse)."""
    acc = f"CAST({salt} AS BIGINT)"
    for i in range(n):
        c_i = f"CAST(ascii(substring({s}, ({pos}) + {i}, 1)) AS BIGINT)"
        acc = f"((({acc}) * {HASH_BASE} + {c_i}) % {HASH_MOD})"
    return acc


def poly_hash_at(s: Column | str, pos: Column | str, n: int, salt: int = 0) -> Column:
    """``poly_hash(substr(s, pos, n), salt)`` for a FIXED ``n``, unrolled
    into plain arithmetic — no higher-order fold, so it stays inside
    whole-stage codegen (``F.aggregate`` is CodegenFallback; the
    interpreted fold measured ~1ms/key on the hash-ngram encode path).
    Bit-identical to the fold: acc stays < 2^31 after each mod, so
    acc*131 + c < 2^39 — exact in BIGINT, same as poly_hash. String
    args = SQL text fragments -> single F.expr parse (cheap build)."""
    if isinstance(s, str) and isinstance(pos, str):
        return F.expr(ssql_poly_hash_at(s, pos, n, salt))
    acc: Column = F.lit(salt).cast("long")
    for i in range(n):
        c = F.ascii(s.substr(pos + F.lit(i), F.lit(1))).cast("long")
        acc = (acc * F.lit(HASH_BASE) + c) % F.lit(HASH_MOD)
    return acc


def char_ngrams(s: Column, n: int) -> Column:
    """Array of all character n-grams of ``s`` (with multiplicity);
    empty array when len(s) < n. Guarded because sequence(1, 0) would
    produce a *descending* sequence in Spark, not an empty one."""
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_tokens(s: Column) -> Column:
    """Lowercased whitespace tokens, empties removed.

    Codegen form: trim the ASCII-``\\s`` edges with one regexp pass,
    split, and ``array_remove`` the lone ``''`` an all-whitespace
    string leaves behind — after edge-trimming, a ``\\s+`` split can
    produce no other empty token (every interior whitespace run is one
    separator), so the result equals ``filter(split(lower(s)), != '')``
    exactly, with NULL propagating identically. Single-reference tree
    (no when-guard that would duplicate the regexp), and ``filter`` —
    a CodegenFallback higher-order function — is off the per-row path.
    Parity pinned by test_codegen_text_exprs_equal_hof_forms."""
    return F.array_remove(
        F.split(F.regexp_replace(F.lower(s), r"^\s+|\s+$", ""), r"\s+"), ""
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays, accumulated in double,
    sequential left-to-right (parity with DuckDB list_dot_product on
    doubles).

    Measured dead end (round 7): unrolling the fold into a fixed-dim
    ``0.0 + a[1]*b[1] + ...`` element_at chain is bit-identical and
    LOOKS codegen-friendly, but in a per-pair join context it measured
    ~3x SLOWER than this fold (14.5s vs 5.4s on 661k 64-dim pairs) —
    the 64-term chain blows up the generated method past JIT limits.
    Keep the fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column, clip: float = 1e-12) -> Column:
    """a / max(||a||, clip) — the reference clips tiny norms
    (/root/reference/src/linktransformer/infer.py:815-816)."""
    nrm = F.greatest(l2_norm(a), F.lit(clip))
    return F.transform(a, lambda x: x.cast("double") / nrm)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two raw (unnormalized) numeric arrays."""
    return dot(a, b) / (
        F.greatest(l2_norm(a), F.lit(1e-12)) * F.greatest(l2_norm(b), F.lit(1e-12))
    )


def cosine_similarity_corresponding_pairs(a: Column, b: Column) -> Column:
    """Row-wise cosine of two vector columns — the reference's
    ``cosine_similarity_corresponding_pairs`` (utils.py:102-107), which
    takes two aligned embedding matrices; here the alignment is by row,
    as it must be in Spark (SURVEY §1.3)."""
    return cosine(a, b)


def lev_sim(a: Column, b: Column) -> Column:
    """Normalized Levenshtein similarity in [0,1]:
    1 - lev(a,b) / max(len(a), len(b), 1).

    Integer levenshtein + one double division -> bit-identical across
    Spark and DuckDB, which makes every similarity-join operator
    oracle-checkable without an embedding model.

    CAVEAT: DuckDB's levenshtein counts UTF-8 *bytes* while Spark counts
    code points, so cross-engine parity holds for ASCII inputs only —
    which covers all the TPC-H-ish name columns the oracle checks.
    """
    return F.lit(1.0) - F.levenshtein(a, b).cast("double") / F.greatest(
        F.length(a), F.length(b), F.lit(1)
    ).cast("double")


_PHONETIC_LETTERS = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_PHONETIC_CODES = "00000000111122222222334556"


def phonetic_key(s: Column) -> Column:
    """Simplified Soundex blocking key: first letter + the first three
    consonant-class digits (runs collapsed, vowels/H/W dropped, padded
    with '0'). A deterministic phonetic PARTITIONER for record-linkage
    blocking — spelling variants of the same spoken name usually share
    the key — not a claim of byte-compatibility with any particular
    library's Soundex (the fiddly H/W separator rules differ between
    implementations; a blocking key only needs to be deterministic and
    phonetically coarse). Entirely regexp_replace/translate/substr
    chains, so the DuckDB twin (functions/oracle.sql_phonetic_key) is
    the same pipeline text-for-text. Empty/non-alpha input -> ''.
    """
    a = F.regexp_replace(F.upper(F.coalesce(s, F.lit(""))), "[^A-Z]", "")
    t = F.translate(a, _PHONETIC_LETTERS, _PHONETIC_CODES)
    for d in range(7):
        t = F.regexp_replace(t, f"{d}{{2,}}", str(d))
    rest = F.regexp_replace(F.substring(t, 2, 2_000_000), "0", "")
    return F.when(
        a == F.lit(""), F.lit("")
    ).otherwise(
        F.concat(
            F.substring(a, 1, 1),
            F.substring(F.concat(rest, F.lit("000")), 1, 3),
        )
    )
