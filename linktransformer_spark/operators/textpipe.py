"""Text analysis for training-data pipelines (north-star extension):
language ID, quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions over the ``documents`` table schema
(doc_id, text, lang, source, n_chars) — map-only stages that fuse into
the parquet scan, with DuckDB mirrors for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as S

# tiny per-language stopword profiles (public common function words).
# Deliberately small: the operator contract is the scoring rule, not
# lexicon quality — swap in bigger lexicons for production.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
}


def _padded_join(toks: Column) -> Column:
    """The space-padded token join ``_token_hits`` scans. Callers that
    run several hit counts should materialize this once as a column
    and pass it via ``padded=`` (the join is the shared subtree)."""
    return F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))


def _token_hits(
    toks: Column, words: tuple[str, ...], padded: Column | None = None
) -> Column:
    """Occurrence count of tokens that appear in a FIXED word list —
    one codegen ``regexp_count`` pass over the space-padded token join,
    count-identical to ``size(filter(toks, array_contains(list, t)))``
    (which is an interpreted-per-element CodegenFallback HOF): each
    token sits between two spaces in the padded join, the lookarounds
    anchor whole-token matches, and a shorter alternative that is a
    prefix of a longer token fails its lookahead, so every listed-word
    token is counted exactly once. NULL propagates identically."""
    import re as _re

    pat = "(?<= )(?:" + "|".join(sorted({_re.escape(w) for w in words})) + ")(?= )"
    if padded is None:
        padded = _padded_join(toks)
    return F.regexp_count(padded, F.lit(pat))


def lang_id_expr(
    text: Column, toks: Column | None = None, padded: Column | None = None
) -> Column:
    """Heuristic language id: CJK codepoint share -> 'zh'; else the
    stopword profile with the highest token hit count (ties broken by
    language code ascending); no hits at all -> 'und'.

    ``toks``/``padded``: pass already-materialized COLUMNS (see
    annotate_quality_filter) so the tokenizer and the padded join do
    not re-run once per profile inside this expression."""
    if toks is None:
        toks = S.word_tokens(text)
    if padded is None:
        padded = _padded_join(toks)
    # CJK count as one codegen regex pass (length delta after removing
    # the block) — the per-char split/transform/filter lambda chain is
    # CodegenFallback and was the hottest expression in the quality
    # gate; counts are identical (BMP CJK block, surrogates untouched
    # by both forms)
    n_cjk = F.length(text) - F.length(
        F.regexp_replace(text, "[一-鿿]", "")
    )
    n_chars = F.greatest(F.length(text), F.lit(1))

    # arg-max over the profiles via ONE greatest() of (hits, -rank)
    # structs: max hits wins, ties go to the smallest language index
    # (asc lang code) — exactly the old fold's strict-> first-wins
    # chain, but each hits expression is referenced ONCE. The previous
    # when-chain embedded every earlier hits tree twice per step
    # (condition + carried value), duplicating the expensive leaves
    # exponentially in the number of profiles — the measured dominant
    # cost of the quality gate.
    langs_sorted = sorted(LANG_PROFILES)
    best = F.greatest(*[
        F.struct(
            _token_hits(toks, LANG_PROFILES[lang], padded=padded).alias("h"),
            F.lit(-i).alias("nr"),
        )
        for i, lang in enumerate(langs_sorted)
    ])
    # bind `best` ONCE via a single-element transform (the lambda's
    # argument is evaluated one time; every further use is the bound
    # variable) — referencing it per language in a when-chain would
    # re-embed the whole greatest() tree, hits and all, per reference
    lang_arr = F.array(*[F.lit(lang) for lang in langs_sorted])
    best_lang = F.element_at(
        F.transform(
            F.array(best),
            lambda b: F.when(
                b["h"] > 0, F.element_at(lang_arr, (-b["nr"]) + F.lit(1))
            ).otherwise(F.lit("und")),
        ),
        1,
    )

    return F.when(n_cjk.cast("double") / n_chars.cast("double") > 0.3, F.lit("zh")).otherwise(
        best_lang
    )


def quality_score_expr(
    text: Column, toks: Column | None = None, padded: Column | None = None
) -> Column:
    """Composite quality score in [0,1] from cheap signals:
    0.25*length_ok + 0.25*alpha_ratio + 0.25*stopword_signal +
    0.25*word_len_ok. Pure integer counts + fixed-point arithmetic.

    ``toks``/``padded``: pass already-materialized COLUMNS (see
    annotate_quality_filter) to keep the tokenizer and padded join out
    of the per-signal subtrees."""
    if toks is None:
        toks = S.word_tokens(text)
    if padded is None:
        padded = _padded_join(toks)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))

    length_ok = F.when((F.length(text) >= 50) & (F.length(text) <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))

    # one codegen regex pass (keep only [A-Za-z ], count what's left)
    # instead of the per-char split/transform/filter lambda chain
    # (CodegenFallback) — identical counts
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z ]", ""))
    alpha_ratio = alpha.cast("double") / n_chars.cast("double")

    stop_hits = _token_hits(
        toks, tuple(w for ws in LANG_PROFILES.values() for w in ws),
        padded=padded,
    )
    stop_ratio = stop_hits.cast("double") / n_toks.cast("double")
    # healthy text has SOME function words but isn't all function words
    stop_ok = F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))

    # sum of token lengths == length of the separator-less join (one
    # codegen pass; the per-token aggregate lambda was interpreted)
    mean_wlen = (
        F.length(F.array_join(toks, "")).cast("double")
        / n_toks.cast("double")
    )
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))

    return (length_ok + alpha_ratio + stop_ok + wlen_ok) / F.lit(4.0)


def token_count_expr(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(S.word_tokens(text))


def subword_count_expr(text: Column) -> Column:
    """BPE-ish token estimate: alnum runs count 1 per ceil(len/4) plus
    each non-alnum, non-space char counts 1 (a crude but deterministic
    stand-in for a real tokenizer; swap a pandas-UDF tokenizer in for
    production)."""
    # greedy {1,4} chunking consumes each maximal alnum run in blocks
    # of 4 plus one remainder match — exactly ceil(len/4) matches per
    # run, in one codegen regexp pass (the split + per-run aggregate
    # lambda chain it replaces was CodegenFallback)
    alnum_tokens = F.regexp_count(F.lower(text), F.lit("[a-z0-9]{1,4}"))
    # non-alnum-non-space count as one codegen regex pass (remove the
    # keep-set, count the remainder) — the per-char lambda chain this
    # replaces was CodegenFallback; identical counts
    punct = F.length(F.regexp_replace(text, "[0-9A-Za-z ]", ""))
    return (alnum_tokens + punct).cast("long")


def fingerprint_expr(text: Column | str) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash of the
    lowercased, whitespace-collapsed text (portable; see
    functions/oracle.sql_fingerprint). Pass a column NAME to build the
    whole expression as one SQL-text parse (cheap driver build)."""
    if isinstance(text, str):
        # SQL literal '\\s+' unescapes to the regex \s+ (same pattern
        # string the Column form passes verbatim)
        return S.poly_hash(f"regexp_replace(trim(lower(`{text}`)), '\\\\s+', ' ')")
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return S.poly_hash(norm)


def _pushdown_fence() -> Column:
    """Always-true, formally NONDETERMINISTIC predicate term (seeded
    rand — the value never affects results and the seed makes even a
    task retry reproducible). ANDed into a derived boolean column, it
    stops PushPredicateThroughNonJoin from pushing a caller's filter
    through the projection that computes the column: that pushdown
    SUBSTITUTES the intermediate alias definitions into the predicate,
    re-evaluating the tokenizer once per rule subtree inside the scan
    task — the guide-§4.4 duplication with pure JVM expressions
    (measured 4.2x on the quality gate: 0.46s as a projection vs 1.94s
    as a pushed filter, single task; codegen subexpression elimination
    cannot rescue it because conditional branches are excluded from
    CSE). At scale the gate still runs at scan speed — the fence only
    forbids relocating it INTO the scan predicate with its inputs
    inlined per rule.

    monotonically_increasing_id() is non-negative by construction, so
    the term is constant-true; it is the nondeterministic always-true
    expression Spark 4's optimizer does NOT fold away (a seeded
    rand() < 2.0 IS range-folded and the fence vanishes — measured)."""
    return F.monotonically_increasing_id() >= F.lit(0)


def annotate_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 50,
    max_chars: int = 20000,
    min_tokens: int = 10,
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """C4/Gopher-style document gate: appends ``keep`` (boolean) and
    ``drop_reason`` (first failing rule in a FIXED order: too_short,
    too_long, too_few_tokens, low_quality, lang; null when kept).

    Map-only — all rules are Catalyst expressions over the text column,
    fused into the scan like analyze_documents; at 100 TB this runs at
    scan speed. Rule thresholds mirror the quality_score signals but
    gate independently so a pipeline can distinguish WHY a doc fell
    out (the drop_reason histogram is the curation dashboard)."""
    from .knn_join import ensure_parallelism

    t = F.col(text_col)
    # the gate's per-row expression cost dominates its stage, and a
    # small parquet input arrives as ONE scan split (a single row
    # group cannot be split further) — spread rows to the cores first;
    # no-op at scale, where the scan already provides the parallelism
    # (measured: the sf0.1 gate ran single-task at ~340 µs/row)
    df = ensure_parallelism(df)
    # materialize the token array ONCE as an intermediate column: the
    # rules reference it ~8 times between them, and CollapseProject
    # refuses to merge projections when that would duplicate a
    # non-cheap producer expression — so the tokenizer runs once per
    # row instead of once per rule subtree (measured 2.6s -> 0.7s for
    # the gate stage at sf0.1)
    sig = df.withColumn("_lt_qf_toks", S.word_tokens(t)).withColumn(
        "_lt_qf_pad", _padded_join(F.col("_lt_qf_toks"))
    )
    tk, pad = F.col("_lt_qf_toks"), F.col("_lt_qf_pad")
    reason = (
        F.when(F.length(t) < min_chars, F.lit("too_short"))
        .when(F.length(t) > max_chars, F.lit("too_long"))
        .when(F.size(tk) < min_tokens, F.lit("too_few_tokens"))
        .when(
            quality_score_expr(t, toks=tk, padded=pad) < min_quality,
            F.lit("low_quality"),
        )
    )
    if langs is not None:
        reason = reason.when(
            ~lang_id_expr(t, toks=tk, padded=pad).isin(*langs), F.lit("lang")
        )
    reason = reason.otherwise(F.lit(None))
    # the fence keeps a caller's filter(keep) ABOVE this projection
    # (see _pushdown_fence); streaming plans skip it — nondeterministic
    # expressions are restricted there, and the micro-batch scan is not
    # the pushdown target the fence exists for
    keep = F.col("drop_reason").isNull()
    if not df.isStreaming:
        keep = keep & _pushdown_fence()
    return (
        sig.withColumn("drop_reason", reason)
        .withColumn("keep", keep)
        .drop("_lt_qf_toks", "_lt_qf_pad")
    )


def filter_documents(df: DataFrame, text_col: str = "text", **rules) -> DataFrame:
    """Rows surviving the quality gate (annotation columns dropped)."""
    return (
        annotate_quality_filter(df, text_col, **rules)
        .filter(F.col("keep"))
        .drop("keep", "drop_reason")
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection: lang_id, quality, token
    counts, fingerprint appended as columns. Map-only — fuses into the
    scan; column pruning keeps untouched columns out of the expression."""
    t = F.col(text_col)
    # same single-tokenization structure as annotate_quality_filter;
    # deliberately NOT spread (ensure_parallelism): analyze is the
    # documented map-only pass that fuses into the scan (plan pin:
    # test_text_analyze_is_map_only), and the spread measured no win
    # here — its consumers aggregate immediately, so the shuffle the
    # spread would add is the plan's first exchange anyway
    return (
        df.withColumn("_lt_an_toks", S.word_tokens(t))
        .withColumn("_lt_an_pad", _padded_join(F.col("_lt_an_toks")))
        .withColumn(
            "lang_id",
            lang_id_expr(t, toks=F.col("_lt_an_toks"), padded=F.col("_lt_an_pad")),
        )
        .withColumn(
            "quality",
            quality_score_expr(
                t, toks=F.col("_lt_an_toks"), padded=F.col("_lt_an_pad")
            ),
        )
        .withColumn("n_tokens", F.size(F.col("_lt_an_toks")).cast("long"))
        .withColumn("n_subwords", subword_count_expr(t))
        .withColumn("fingerprint", fingerprint_expr(text_col))
        .drop("_lt_an_toks", "_lt_an_pad")
    )


def _token_ngram_occurrences(df: DataFrame, text_col: str, id_col: str,
                             n: int) -> DataFrame:
    """(id, gram) OCCURRENCE rows (not distinct) from whitespace word
    tokens — explode start positions + slice, same codegen-friendly
    shape as the dedup/corpus gram builders (edge-trim regexp instead
    of the higher-order filter lambda, which is CodegenFallback; token
    values are identical since \\s+ splits can only produce empties at
    the ends). Docs with fewer than n tokens contribute no rows."""
    from .knn_join import ensure_parallelism

    cleaned = F.regexp_replace(F.lower(F.col(text_col)), r"^\s+|\s+$", "")
    base = (
        ensure_parallelism(df).select(
            F.col(id_col).alias("_lt_id"),
            F.split(cleaned, r"\s+").alias("_lt_toks"),
        )
        .filter(F.element_at("_lt_toks", 1) != F.lit(""))
        .filter(F.size("_lt_toks") >= n)
    )
    if n == 1:
        return base.select("_lt_id", F.explode("_lt_toks").alias("_lt_gram"))
    return base.select(
        "_lt_id",
        "_lt_toks",
        F.explode(F.sequence(F.lit(1), F.size("_lt_toks") - F.lit(n - 1))).alias("_lt_p"),
    ).select(
        "_lt_id",
        F.array_join(F.slice("_lt_toks", F.col("_lt_p"), n), " ").alias("_lt_gram"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition filters, Rae et al. 2021 appendix A1.1, token-based):

    - ``dup_token_frac``: 1 - distinct_tokens/n_tokens — how much of
      the doc is repeated vocabulary;
    - ``top_ngram_frac``: occurrences(most frequent ``top_n``-gram) *
      top_n / n_tokens — token share of the single hottest phrase;
    - ``dup_ngram_frac``: fraction of ``dup_n``-gram START POSITIONS
      whose gram occurs more than once in the doc — repeated-span
      density without the interval-union bookkeeping of the paper's
      character-coverage variant (documented simplification).

    Degenerate docs (fewer tokens than the gram width) score 0. All
    three are relational explode -> per-(doc, gram) count -> per-doc
    aggregate pipelines (two narrow shuffles per signal, no per-row
    lambdas, no doc-size quadratic anywhere). ``id_col`` must be
    unique (the signals join back on it).
    """
    ids = df.select(F.col(id_col))
    one = (
        _token_ngram_occurrences(df, text_col, id_col, 1)
        .groupBy("_lt_id", "_lt_gram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("_lt_id")
        .agg(
            F.sum("c").alias("_nt"),
            F.count(F.lit(1)).alias("_nd"),
        )
    )

    def gram_counts(n):
        return (
            _token_ngram_occurrences(df, text_col, id_col, n)
            .groupBy("_lt_id", "_lt_gram").agg(F.count(F.lit(1)).alias("c"))
        )

    top = gram_counts(top_n).groupBy("_lt_id").agg(F.max("c").alias("_mc"))
    dup = gram_counts(dup_n).groupBy("_lt_id").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("_dp"),
        F.sum("c").alias("_np"),
    )
    out = (
        ids.join(one.withColumnRenamed("_lt_id", id_col), id_col, "left")
        .join(top.withColumnRenamed("_lt_id", id_col), id_col, "left")
        .join(dup.withColumnRenamed("_lt_id", id_col), id_col, "left")
    )
    nt = F.coalesce(F.col("_nt"), F.lit(0))
    return out.select(
        id_col,
        nt.cast("long").alias("n_tokens"),
        F.when(
            nt > 0, F.lit(1.0) - F.col("_nd").cast("double") / nt.cast("double")
        ).otherwise(F.lit(0.0)).alias("dup_token_frac"),
        F.coalesce(
            (F.col("_mc") * top_n).cast("double") / nt.cast("double"), F.lit(0.0)
        ).alias("top_ngram_frac"),
        F.coalesce(
            F.col("_dp").cast("double") / F.col("_np").cast("double"), F.lit(0.0)
        ).alias("dup_ngram_frac"),
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
    ref_text_col: str | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet-style language-model quality signal (Wenzek et al. 2019,
    arXiv:1911.00359): score each document by its per-token cross-
    entropy under a unigram LM trained on ``reference`` (default: the
    corpus itself). CCNet ships KenLM 5-grams; that library isn't in
    this environment, so the model here is the add-``alpha``-smoothed
    unigram distribution — the plumbing (train counts on a reference,
    score every doc, filter/bucket by perplexity) is the same, and the
    whole pipeline stays relational and SQL-oracle-checkable.

    Returns ``(id_col, n_tokens, avg_neg_logprob, perplexity)``;
    ``avg_neg_logprob`` is nats/token, ``perplexity = exp(H)``. Lower =
    more typical of the reference. Rows with zero tokens are dropped
    (they have no defined entropy — gate them with
    ``annotate_quality_filter`` first).

    Scale shape: token counting is explode + groupBy with map-side
    partial aggregation (shuffle carries (doc, distinct-token) rows,
    not every token occurrence); the vocab attach is an equi-join on
    token (AQE broadcasts it while it fits — a unigram vocab is small
    even at 100 TB); the totals are a broadcast one-row aggregate; and
    the per-doc negative-log-likelihood folds token contributions in
    token sort order (order-pinned — a plain SUM of doubles is
    partial-aggregation-order dependent and would not be
    cross-engine-reproducible), while ``n_tokens`` is an integer sum,
    which commutes safely.
    """
    doc_toks = df.select(
        F.col(id_col), F.explode(S.word_tokens(F.col(text_col))).alias("_tok")
    )
    dtc = doc_toks.groupBy(id_col, "_tok").agg(F.count("*").alias("_n"))
    if reference is None:
        # self-trained model: derive the vocab from the per-doc counts
        # instead of a second scan+explode of the text; cut lineage so
        # the count relation executes once for both consumers
        dtc = dtc.localCheckpoint(eager=False)
        vocab = dtc.groupBy("_tok").agg(F.sum("_n").alias("_cnt"))
    else:
        rtc = ref_text_col if ref_text_col is not None else text_col
        ref_toks = reference.select(
            F.explode(S.word_tokens(F.col(rtc))).alias("_tok")
        )
        vocab = ref_toks.groupBy("_tok").agg(F.count("*").alias("_cnt"))
    totals = vocab.agg(
        F.sum("_cnt").alias("_T"), F.count("*").alias("_V")
    )
    per_tok = (
        dtc.join(vocab, "_tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "_tok",
            "_n",
            (
                F.col("_n").cast("double")
                * -F.log(
                    (F.coalesce(F.col("_cnt"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (F.col("_T").cast("double") + F.lit(alpha) * F.col("_V").cast("double"))
                )
            ).alias("_lp"),
        )
    )
    from ..functions.pinned import pinned_total, with_running_sum

    agg = (
        with_running_sum(per_tok, [id_col], "_tok", "_lp")
        .groupBy(id_col)
        .agg(
            F.sum("_n").alias("_ntok"),
            pinned_total("_tok").alias("_nll"),
        )
    )
    h = F.col("_nll") / F.col("_ntok").cast("double")
    return agg.select(
        id_col,
        F.col("_ntok").cast("long").alias("n_tokens"),
        h.alias("avg_neg_logprob"),
        F.exp(h).alias("perplexity"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The published Gopher/MassiveText document-quality rules (Rae et
    al. 2021, arXiv:2112.11446, Appendix A1.1), as one map-only pass:

    1. word count in [min_words, max_words];
    2. mean word length in [min_mean_word_len, max_mean_word_len];
    3. '#' / '...' symbol-to-word ratio <= max_symbol_ratio;
    4. < max_bullet_ratio of lines starting with a bullet;
    5. < max_ellipsis_ratio of lines ending with an ellipsis;
    6. >= min_alpha_ratio of words containing an alphabetic character;
    7. >= min_stop_hits distinct hits from the canonical 8-stopword
       list (the Gopher "stop word filter").

    Returns the id plus the raw signals (``n_words, mean_word_len,
    symbol_ratio, bullet_ratio, ellipsis_ratio, alpha_word_ratio,
    n_stop_hits``) and a ``keep`` boolean ANDing all seven rules —
    signals are kept so a pipeline can re-threshold without re-scanning.

    Everything is whole-stage-codegen expressions over the token array
    (zero shuffles, zero Python); divisions are single double ops over
    exact integers, so the DuckDB oracle reproduces them bitwise.
    Empty documents fail rule 1 and report zero ratios.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    toks = S.word_tokens(raw)
    nw = F.size(toks)
    nwd = F.when(nw > 0, nw.cast("double"))  # NULL-safe denominator
    char_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    lines = F.filter(
        F.transform(F.split(raw, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    nl = F.size(lines)
    nld = F.when(nl > 0, nl.cast("double"))
    bullets = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("•") | l.startswith("-") | l.startswith("*"),
        )
    )
    ell_ends = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    out = df.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        F.coalesce(char_sum / nwd, F.lit(0.0)).alias("mean_word_len"),
        F.coalesce((n_hash + n_ell) / nwd, F.lit(0.0)).alias("symbol_ratio"),
        F.coalesce(bullets / nld, F.lit(0.0)).alias("bullet_ratio"),
        F.coalesce(ell_ends / nld, F.lit(0.0)).alias("ellipsis_ratio"),
        F.coalesce(alpha / nwd, F.lit(0.0)).alias("alpha_word_ratio"),
        stop_hits.cast("long").alias("n_stop_hits"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_ratio") < max_bullet_ratio)
        & (F.col("ellipsis_ratio") < max_ellipsis_ratio)
        & (F.col("alpha_word_ratio") >= min_alpha_ratio)
        & (F.col("n_stop_hits") >= min_stop_hits),
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
    ref_text_col: str | None = None,
    alpha: float = 1.0,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram LM quality signal — one modeling step up
    from :func:`unigram_lm_score` toward CCNet's KenLM n-grams:
    transition ``i`` scores ``lam * P_bi(w_i | w_{i-1}) +
    (1 - lam) * P_uni(w_i)`` with add-``alpha`` smoothing
    (``P_bi = (c(prev, cur) + a) / (c(prev) + a * V)``), trained on
    ``reference`` (default: the corpus itself). Jelinek-Mercer
    interpolation keeps unseen bigrams from saturating at the
    uniform floor — a repeated-boilerplate doc now scores MUCH lower
    (more typical) than a unigram model can express, which is exactly
    the signal that separates templated spam from prose.

    Scores transitions only (positions 2..n); docs with < 2 tokens are
    dropped. Returns ``(id_col, n_transitions, avg_neg_logprob,
    perplexity)`` — nats per transition, lower = more reference-like.

    Scale shape: per-doc bigram counts via the position-slice explode
    (codegen, shuffle carries distinct (doc, prev, cur) rows); the
    model attaches through three vocab-sized equi-joins (bigram
    counts, prev-unigram for the bigram denominator, cur-unigram for
    the interpolation) — AQE broadcasts them while they fit; the
    totals ride a 1-row broadcast; the per-doc NLL folds in
    (prev, cur) order (order-pinned floats).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def _bi_rows(frame: DataFrame, tcol: str, with_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if with_id else []
        base = frame.select(
            *cols, S.word_tokens(F.col(tcol)).alias("_tk")
        ).filter(F.size("_tk") >= 2)
        return base.select(
            *cols,
            "_tk",
            F.explode(F.sequence(F.lit(1), F.size("_tk") - 1)).alias("_p"),
        ).select(
            *cols,
            F.element_at("_tk", F.col("_p")).alias("_prev"),
            F.element_at("_tk", F.col("_p") + 1).alias("_cur"),
        )

    doc_bi = (
        _bi_rows(df, text_col, True)
        .groupBy(id_col, "_prev", "_cur")
        .agg(F.count("*").alias("_m"))
    )
    if reference is None:
        doc_bi = doc_bi.localCheckpoint(eager=False)
        bi_counts = doc_bi.groupBy("_prev", "_cur").agg(
            F.sum("_m").alias("_cbi")
        ).localCheckpoint(eager=False)
        uni_from = df.select(
            F.explode(S.word_tokens(F.col(text_col))).alias("_tok")
        )
    else:
        rtc = ref_text_col if ref_text_col is not None else text_col
        ref_bi = _bi_rows(reference, rtc, False)
        bi_counts = ref_bi.groupBy("_prev", "_cur").agg(
            F.count("*").alias("_cbi")
        )
        uni_from = reference.select(
            F.explode(S.word_tokens(F.col(rtc))).alias("_tok")
        )
    uni = uni_from.groupBy("_tok").agg(F.count("*").alias("_cu")).localCheckpoint(
        eager=False
    )
    totals = uni.agg(F.sum("_cu").alias("_T"), F.count("*").alias("_V"))
    a = float(alpha)
    per_bi = (
        doc_bi.join(bi_counts, ["_prev", "_cur"], "left")
        .join(
            uni.select(F.col("_tok").alias("_prev"), F.col("_cu").alias("_cprev")),
            "_prev", "left",
        )
        .join(
            uni.select(F.col("_tok").alias("_cur"), F.col("_cu").alias("_ccur")),
            "_cur", "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "_prev",
            "_cur",
            "_m",
            (
                F.col("_m").cast("double")
                * -F.log(
                    F.lit(lam)
                    * (
                        (F.coalesce(F.col("_cbi"), F.lit(0)).cast("double") + F.lit(a))
                        / (
                            F.coalesce(F.col("_cprev"), F.lit(0)).cast("double")
                            + F.lit(a) * F.col("_V").cast("double")
                        )
                    )
                    + F.lit(1.0 - lam)
                    * (
                        (F.coalesce(F.col("_ccur"), F.lit(0)).cast("double") + F.lit(a))
                        / (
                            F.col("_T").cast("double")
                            + F.lit(a) * F.col("_V").cast("double")
                        )
                    )
                )
            ).alias("_nll"),
        )
    )
    from ..functions.pinned import pinned_total, with_running_sum

    bikey = F.struct(F.col("_prev").alias("p"), F.col("_cur").alias("c"))
    agg = (
        with_running_sum(per_bi, [id_col], bikey, "_nll")
        .groupBy(id_col)
        .agg(
            F.sum("_m").alias("_nt"),
            pinned_total(bikey).alias("_h"),
        )
    )
    h = F.col("_h") / F.col("_nt").cast("double")
    return agg.select(
        id_col,
        F.col("_nt").cast("long").alias("n_transitions"),
        h.alias("avg_neg_logprob"),
        F.exp(h).alias("perplexity"),
    )
