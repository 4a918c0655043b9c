"""Corpus-curation operators for LLM training-data pipelines
(north-star extension, alongside dedup/textpipe): C4-style duplicate
line removal, PII redaction, and train/benchmark contamination
detection.

These are the document-level siblings of the near-dup family in
operators/dedup.py: every candidate generator is an equi-join on a
derived key (the exploded line / n-gram), so shuffle volume scales
with corpus size + collision count, never |corpus|^2 — the same
100 TB design rule.

Public background: C4 (Raffel et al. 2020) removes duplicated
three-sentence spans keeping one occurrence; Gopher/MassiveText and
RefinedWeb document the boilerplate-line variant used here; benchmark
decontamination by exact n-gram overlap follows GPT-3 appendix C /
PaLM. (Algorithms from the papers; no reference-repo counterpart —
the linktransformer reference has no corpus ops.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d()\- ]{6,}\d"

# ordered: emails first (their digits must not feed the phone rule),
# then IPs (dots keep them out of PHONE_RE, but the order makes that
# non-load-bearing), then phones
DEFAULT_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = DEFAULT_PII_PATTERNS,
    out_col: str | None = None,
) -> DataFrame:
    """Replace PII-shaped substrings with typed placeholders.

    A chain of ``regexp_replace`` expressions applied in ``patterns``
    order — map-only, fuses into the scan, no shuffle. The default
    patterns stay inside the regex subset Java and RE2 share, so the
    same strings drive the DuckDB oracle.
    """
    expr = F.col(text_col)
    for pat, repl in patterns:
        expr = F.regexp_replace(expr, pat, repl)
    return df.withColumn(out_col or text_col, expr)


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-global duplicate-line removal (the C4/RefinedWeb
    boilerplate rule): split every document on ``sep``, keep only the
    FIRST occurrence (ordered by (id, line position)) of each
    non-blank trimmed line, keep blank lines as document structure,
    and reassemble. Documents whose every line is removed keep an
    empty string; null text is treated as empty.

    Plan: posexplode -> first-occurrence groupBy on the trimmed line
    (shuffle 1, keyed by line content: exact, no hash-collision risk)
    -> semi-equality join back (shuffle shares the same key) ->
    re-assembly groupBy on the id (shuffle 2). Line keys are skew-safe
    for real corpora (the hottest boilerplate line groups to one
    partitionful of (id, pos) pairs of which only the min survives —
    a map-side partial min keeps that cheap).
    """
    import re as _re

    other = [c for c in df.columns if c != text_col]
    # sep is treated as a LITERAL separator (Spark's split takes a
    # regex, so escape it; reassembly joins with the literal) — and the
    # exploded relation feeds three consumers (firsts, keep-join,
    # blank-line union), so cut its lineage to evaluate the split once
    from .knn_join import ensure_parallelism

    lines = ensure_parallelism(df).select(
        F.col(id_col).alias("_lt_did"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep), -1)
        ).alias("_lt_pos", "_lt_line"),
    ).localCheckpoint(eager=False)
    key = F.trim(F.col("_lt_line"))
    nonblank = lines.filter(key != F.lit(""))
    firsts = nonblank.groupBy(key.alias("_lt_key")).agg(
        F.min(F.struct("_lt_did", "_lt_pos")).alias("_lt_first")
    )
    kept_nonblank = (
        nonblank.join(firsts, key == F.col("_lt_key"))
        .filter(F.struct("_lt_did", "_lt_pos") == F.col("_lt_first"))
        .select("_lt_did", "_lt_pos", "_lt_line")
    )
    kept = kept_nonblank.unionByName(
        lines.filter(key == F.lit("")).select("_lt_did", "_lt_pos", "_lt_line")
    )
    assembled = kept.groupBy("_lt_did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_lt_pos", "_lt_line"))),
                lambda s: s["_lt_line"],
            ),
            sep,
        ).alias("_lt_text")
    )
    return (
        df.select(*other)
        .join(assembled, F.col(id_col) == F.col("_lt_did"), "left")
        .select(*other, F.coalesce(F.col("_lt_text"), F.lit("")).alias(text_col))
    )


def _ngram_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """DISTINCT (id, gram) rows: lowercase alnum tokens, space-joined
    n-grams. Docs with fewer than n tokens contribute nothing.

    Built as explode-start-positions + ``slice``/``array_join`` so the
    gram construction stays in whole-stage codegen — the
    ``transform``-lambda form is CodegenFallback, interpreted per row
    (same finding as operators/dedup.py::_shingle_rows). Tokenization
    avoids a higher-order ``filter`` too: with a ``+``-quantified
    delimiter split, empties can only appear at the ends, so one edge
    regexp_replace makes the split clean."""
    from .knn_join import ensure_parallelism

    cleaned = F.regexp_replace(
        F.lower(F.col(text_col)), "^[^a-z0-9]+|[^a-z0-9]+$", ""
    )
    base = (
        ensure_parallelism(df).select(
            F.col(id_col).alias("_lt_id"),
            F.split(cleaned, "[^a-z0-9]+").alias("_lt_toks"),
        )
        # null text -> null array (dropped); empty/cleaned-away text ->
        # [''] (dropped): real tokens are never the empty string
        .filter(F.element_at("_lt_toks", 1) != F.lit(""))
        .filter(F.size("_lt_toks") >= n)
    )
    return (
        base.select(
            "_lt_id",
            "_lt_toks",
            F.explode(
                F.sequence(F.lit(1), F.size("_lt_toks") - F.lit(n - 1))
            ).alias("_lt_p"),
        )
        .select(
            "_lt_id",
            F.array_join(F.slice("_lt_toks", F.col("_lt_p"), n), " ").alias("_lt_gram"),
        )
        .dropDuplicates(["_lt_id", "_lt_gram"])
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    on: str = "text",
    train_id: str = "doc_id",
    bench_id: str = "doc_id",
    n: int = 8,
    max_gram_doc_freq: int | None = None,
) -> DataFrame:
    """Benchmark-contamination detection (GPT-3 appendix C / PaLM
    style): for every (train doc, benchmark doc) pair sharing at least
    one exact ``n``-token n-gram, report how many distinct n-grams
    they share. Returns (train_id, bench_id, shared_ngrams).

    Plan: distinct n-gram explode on both sides -> equi-join on the
    gram -> pair-count groupBy. ``max_gram_doc_freq`` drops grams
    present in more than that many documents (counted over both sides
    together) from the join — the stopword/skew cap for web-scale
    corpora, same trade as near_dup_pairs_jaccard's cap.
    """
    tg = _ngram_rows(train, on, train_id, n)
    bg = _ngram_rows(bench, on, bench_id, n)
    if max_gram_doc_freq is not None:
        freq = (
            tg.select("_lt_gram")
            .unionAll(bg.select("_lt_gram"))
            .groupBy("_lt_gram")
            .agg(F.count(F.lit(1)).alias("_lt_gf"))
            .filter(F.col("_lt_gf") <= max_gram_doc_freq)
            .drop("_lt_gf")
        )
        tg = tg.join(freq, "_lt_gram")
        bg = bg.join(freq, "_lt_gram")
    t = tg.withColumnRenamed("_lt_id", "train_id")
    b = bg.withColumnRenamed("_lt_id", "bench_id")
    return (
        t.join(b, "_lt_gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket_width: int | None = 100_000,
    chunk_col: str = "chunk_id",
    pos_col: str = "chunk_pos",
    end_col: str = "end_chunk_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-2/T5 training-data
    layout): documents ordered by ``id_col`` ascending are laid
    head-to-tail on one token tape, which is cut every ``budget``
    tokens; each doc gets the chunk id + offset where it begins and
    the chunk where it ends (docs may straddle cuts — that is this
    packing's contract; use the chunk span to materialize examples).

    The tape offset is a running prefix sum. A single global window
    would serialize on one task, so it runs as the textbook two-phase
    scan: cumsum within ``bucket_width``-wide id buckets (parallel
    windows), plus per-bucket totals cumsum'd over the tiny
    #buckets-row relation and joined back — the only ordered global
    pass touches #buckets rows, not #docs. ``bucket_width=None``
    forces the single-window form (exact same result; useful under a
    SQL oracle or for small frames).

    ``id_col`` must be unique; determinism is total given ids.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window

    # null token counts pack as 0-length docs (same slot as their
    # predecessor) instead of poisoning every later offset with null
    tok = F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0))
    if bucket_width is None:
        w = Window.orderBy(F.col(id_col).asc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        off = F.coalesce(F.sum(tok).over(w), F.lit(0))
        work = df.withColumn("_lt_off", off)
    else:
        b = F.floor(F.col(id_col).cast("long") / F.lit(int(bucket_width)))
        win = (
            Window.partitionBy("_lt_b")
            .orderBy(F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        work = df.withColumn("_lt_b", b).withColumn(
            "_lt_in", F.coalesce(F.sum(tok).over(win), F.lit(0))
        )
        totals = work.groupBy("_lt_b").agg(F.sum(tok).alias("_lt_tot"))
        wb = Window.orderBy(F.col("_lt_b").asc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = totals.select(
            "_lt_b", F.coalesce(F.sum("_lt_tot").over(wb), F.lit(0)).alias("_lt_base")
        )
        work = (
            work.join(F.broadcast(offsets), "_lt_b")
            .withColumn("_lt_off", F.col("_lt_base") + F.col("_lt_in"))
            .drop("_lt_b", "_lt_in", "_lt_base")
        )
    bud = F.lit(int(budget))
    return (
        work.withColumn(chunk_col, F.floor(F.col("_lt_off") / bud))
        .withColumn(pos_col, F.col("_lt_off") % bud)
        .withColumn(
            end_col,
            F.floor(
                (F.col("_lt_off") + F.greatest(tok, F.lit(1)) - 1) / bud
            ),
        )
        .drop("_lt_off")
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
) -> DataFrame:
    """Exact duplicated-span removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — ExactSubstr, token
    form): every ``n``-token span whose lowercased form occurs more
    than once corpus-wide keeps only its GLOBAL FIRST occurrence
    (ordered by (id, position)); tokens covered by any non-first
    occurrence are removed and the remaining tokens are re-joined.

    Contract details (all deterministic, single-pass):
    - tokens are whitespace-split; matching is case-insensitive, the
      surviving text keeps original casing but is whitespace-NORMALIZED
      (single spaces) for every doc, including untouched ones;
    - overlapping duplicated spans union their coverage; the canonical
      first occurrence can still lose tokens to a different span's
      removal (the paper's self-overlap behavior);
    - no cascading re-scan: spans formed by a removal joining previously
      distant tokens are not re-deduplicated (run twice if needed);
    - docs with fewer than n tokens pass through (normalized); null
      text becomes ''.

    Plan: token posexplode (kept narrow for reassembly) + span
    occurrence rows -> global-first groupBy on the span (map-side
    partial min defuses boilerplate skew) -> marked occurrences explode
    their covered positions (bounded by n x duplicated-text volume,
    never by corpus size) -> anti-join + ordered reassembly. Every
    stage is an equi-join/aggregate on a derived key — no pairwise
    stage anywhere.

    Scale note: the span group key is a PAIR of independent 64-bit
    xxhash64 digests of the token slice, not the materialized n-token
    string — at the default n=50 the string key would ship ~50x the
    corpus text volume through the global-first shuffle; the hash pair
    ships 16 bytes/span. Two independent 64-bit digests make a
    cross-span collision astronomically unlikely (~n_spans^2 / 2^128);
    the DuckDB oracle twin still groups on the real span string, so the
    correctness gate doubles as a collision check.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    toks_arr = F.split(F.col(text_col), r"\s+")
    # consumed by both the token relation and the span relation — cut
    # lineage so tokenization runs once
    base = df.select(
        F.col(id_col).alias("_lt_did"),
        F.filter(toks_arr, lambda t: t != F.lit("")).alias("_lt_toks"),
    ).localCheckpoint(eager=False)
    toks = base.select(
        "_lt_did",
        F.posexplode("_lt_toks").alias("_lt_pos", "_lt_tok"),
    )
    occ = (
        base.filter(F.size("_lt_toks") >= n)
        .select(
            "_lt_did",
            F.transform("_lt_toks", lambda t: F.lower(t)).alias("_lt_low"),
            F.explode(
                F.sequence(F.lit(1), F.size("_lt_toks") - F.lit(n - 1))
            ).alias("_lt_p"),
        )
        .select(
            "_lt_did",
            (F.col("_lt_p") - 1).alias("_lt_pos"),  # 0-based like posexplode
            # xxhash64 hashes the array elements directly (whitespace
            # tokens can't collide under concatenation anyway). The
            # second digest salts a literal FIRST: multi-arg xxhash64
            # chains the running hash forward as the next seed, so a
            # trailing salt would leave _lt_h2 a pure function of
            # _lt_h1 (any h1 collision collides h2 too). Salting first
            # gives an independent seed chain — a false span-group
            # merge needs a simultaneous collision in both 64-bit
            # digests (~n_spans^2/2^128).
            F.xxhash64(F.slice("_lt_low", F.col("_lt_p"), n)).alias("_lt_h1"),
            F.xxhash64(
                F.lit(0x9E3779B9), F.slice("_lt_low", F.col("_lt_p"), n)
            ).alias("_lt_h2"),
        )
    )
    firsts = occ.groupBy("_lt_h1", "_lt_h2").agg(
        F.min(F.struct("_lt_did", "_lt_pos")).alias("_lt_first")
    )
    marked = (
        occ.join(firsts, ["_lt_h1", "_lt_h2"])
        .filter(F.struct("_lt_did", "_lt_pos") != F.col("_lt_first"))
        .select("_lt_did", "_lt_pos")
    )
    covered = marked.select(
        "_lt_did",
        F.explode(
            F.sequence(F.col("_lt_pos"), F.col("_lt_pos") + F.lit(n - 1))
        ).alias("_lt_pos"),
    ).distinct()
    kept = toks.join(covered, ["_lt_did", "_lt_pos"], "left_anti")
    assembled = kept.groupBy("_lt_did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_lt_pos", "_lt_tok"))),
                lambda s: s["_lt_tok"],
            ),
            " ",
        ).alias("_lt_text")
    )
    other = [c for c in df.columns if c != text_col]
    return (
        df.select(*other)
        .join(assembled, F.col(id_col) == F.col("_lt_did"), "left")
        .select(*other, F.coalesce(F.col("_lt_text"), F.lit("")).alias(text_col))
    )


def materialize_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    bucket_width: int | None = 100_000,
) -> DataFrame:
    """Emit the actual packed training chunks that
    :func:`pack_sequences` assigns: documents ordered by ``id_col`` are
    laid head-to-tail on the token tape, the tape is cut every
    ``budget`` tokens, and each chunk's tokens are re-joined with
    single spaces. Returns (chunk_id, n_tokens, text) — every chunk
    holds exactly ``budget`` tokens except the last.

    Same offset machinery as pack_sequences (two-phase distributed
    prefix sum over per-doc token counts — no corpus-global window);
    the chunk assembly is a single groupBy on the chunk id whose
    input is one row per TOKEN (the inherent cost of emitting chunk
    text; run it once at materialization time, not per experiment).
    """
    toks_arr = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("_lt_did"), toks_arr.alias("_lt_toks")
    ).localCheckpoint(eager=False)
    counts = base.select(
        F.col("_lt_did").alias("_lt_mc_id"),
        F.size("_lt_toks").cast("long").alias("_lt_n"),
    )
    packed = pack_sequences(
        counts, id_col="_lt_mc_id", n_tokens_col="_lt_n",
        budget=budget, bucket_width=bucket_width,
        chunk_col="_lt_c0", pos_col="_lt_p0", end_col="_lt_e0",
    ).select(
        "_lt_mc_id",
        (F.col("_lt_c0") * budget + F.col("_lt_p0")).alias("_lt_off"),
    )
    tok = base.join(
        packed, F.col("_lt_did") == F.col("_lt_mc_id")
    ).select(
        "_lt_off",
        F.posexplode("_lt_toks").alias("_lt_pos", "_lt_tok"),
    ).select(
        (F.col("_lt_off") + F.col("_lt_pos")).alias("_lt_gpos"), "_lt_tok"
    )
    bud = F.lit(int(budget))
    return (
        tok.groupBy(F.floor(F.col("_lt_gpos") / bud).alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_lt_gpos", "_lt_tok"))),
                    lambda s: s["_lt_tok"],
                ),
                " ",
            ).alias("text"),
        )
    )


def _gram_bucket_rows(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """Hashed n-gram OCCURRENCE rows ``(_id, _b)`` — word unigrams +
    bigrams, each mapped to ``poly_hash(gram) % n_buckets``. Reuses the
    codegen-friendly shingle explode from operators/dedup (positions +
    slice, shuffle-free) and the engine-portable polynomial hash.

    This is the RELATIONAL reference form — :func:`_gram_bucket_counts`
    is the Arrow-batch replica the hot path runs (parity pinned by
    test); this form remains the executable spec both are checked
    against."""
    from ..functions import similarity as S
    from .dedup import _shingle_rows

    rid = (
        F.col(id_col).cast("long") if id_col is not None else F.lit(0).cast("long")
    )
    base = df.select(
        rid.alias("_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_key"),
    )
    rows = _shingle_rows(base, 1, True).unionByName(_shingle_rows(base, 2, True))
    return rows.select(
        "_id", (S.poly_hash(F.col("_g")) % F.lit(n_buckets)).alias("_b")
    )


def _gram_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """Per-doc hashed-gram bucket COUNTS ``(_id, _b, _n)`` — the
    exact-integer Arrow-batch replica of
    ``_gram_bucket_rows(...).groupBy(_id, _b).count()``: one map-only
    pass, no occurrence explode, no counting shuffle (optimization
    guide §4.2). The unrolled per-gram poly_hash codegen chain was the
    measured floor of the relational form (the 24-step guarded
    arithmetic per character); here each DISTINCT gram is hashed once
    per task (memo) in plain integer Python. Tokenization parity with
    word_tokens: the JVM lowercases (the one Unicode-sensitive step)
    and the replica splits on ASCII ``\\s+`` — the same contract as
    dedup.py_shingles, and the n=1/n=2 short-doc fallback rows of
    ``_shingle_rows`` are reproduced exactly (empty doc: one ''
    unigram + one '' bigram; 1-token doc: the token counted twice)."""
    import re

    from .dedup import _py_poly_hash
    from .knn_join import ensure_parallelism

    rid = (
        F.col(id_col).cast("long") if id_col is not None else F.lit(0).cast("long")
    )
    src = ensure_parallelism(df).select(
        rid.alias("_id"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_kl"),
    )

    def gen(batches):
        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        memo: dict = {}
        for pdf in batches:
            out_i, out_b, out_n = [], [], []
            for _id, s in zip(pdf["_id"].tolist(), pdf["_kl"].tolist()):
                toks = [t for t in ws.split(s) if t]
                counts: dict = {}
                grams = toks if toks else [""]
                if len(toks) >= 2:
                    it = grams + [
                        toks[j] + " " + toks[j + 1]
                        for j in range(len(toks) - 1)
                    ]
                else:
                    it = grams + [" ".join(toks)]
                for g in it:
                    b = memo.get(g)
                    if b is None:
                        b = _py_poly_hash(g) % n_buckets
                        memo[g] = b
                    counts[b] = counts.get(b, 0) + 1
                for b, n in counts.items():
                    out_i.append(_id)
                    out_b.append(b)
                    out_n.append(n)
            yield pd.DataFrame({"_id": out_i, "_b": out_b, "_n": out_n})

    return src.mapInPandas(gen, schema="_id long, _b long, _n long")


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how target-like its hashed-n-gram
    profile is. Features are word unigram+bigram occurrences hashed
    into ``n_buckets``; the weight is
    ``log p_target(doc) - log p_raw(doc)`` under add-``alpha``-smoothed
    bucket distributions (target trained on ``target``, raw trained on
    ``df`` itself). Returns ``(id_col, n_grams, log_weight)`` — higher
    = more target-like; feed to :func:`dsir_select` or threshold.

    Scale shape: gram building is the shuffle-free position-explode
    from the dedup family; both distributions are single groupBys over
    bucket ids (at most ``n_buckets`` rows each, broadcast-joined back);
    the per-doc fold accumulates bucket contributions in bucket order
    (order-pinned — cross-engine-reproducible, unlike a plain double
    SUM); ``n_grams`` is an integer sum. Nothing touches Python workers.
    """
    from ..ids import require_integral_id

    require_integral_id(df, id_col, "dsir_log_weights")
    # checkpoint the per-doc bucket COUNTS, not the raw occurrence rows
    # (orders of magnitude smaller); counts come pre-grouped from the
    # Arrow-batch replica (no occurrence explode, no counting shuffle)
    docb = _gram_bucket_counts(df, text_col, id_col, n_buckets).localCheckpoint(
        eager=False
    )
    rawdist = docb.groupBy("_b").agg(F.sum("_n").alias("_cr"))
    # target id is irrelevant (only the gram distribution is used, and
    # the target corpus need not carry id_col at all)
    tgtb = _gram_bucket_counts(
        target, target_text_col or text_col, None, n_buckets
    )
    tgtdist = tgtb.groupBy("_b").agg(F.sum("_n").alias("_ct"))
    rtot = rawdist.agg(F.sum("_cr").alias("_tr"))
    ttot = tgtdist.agg(F.sum("_ct").alias("_tt"))
    a, k = float(alpha), float(n_buckets)
    ratio = (
        rawdist.join(tgtdist, "_b", "full_outer")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + F.lit(a))
                    / (F.col("_tt").cast("double") + F.lit(a) * F.lit(k))
                )
                - F.log(
                    (F.coalesce(F.col("_cr"), F.lit(0)).cast("double") + F.lit(a))
                    / (F.col("_tr").cast("double") + F.lit(a) * F.lit(k))
                )
            ).alias("_lr"),
        )
    )
    from ..functions.pinned import pinned_total, with_running_sum

    # ratio is at most n_buckets rows — broadcast it so docb is never
    # shuffled by bucket (the groupBy below shuffles by _id anyway)
    j = docb.join(F.broadcast(ratio), "_b").withColumn(
        "_w", F.col("_n").cast("double") * F.col("_lr")
    )
    agg = (
        with_running_sum(j, ["_id"], "_b", "_w")
        .groupBy("_id")
        .agg(
            F.sum("_n").alias("_ng"),
            pinned_total("_b").alias("log_weight"),
        )
    )
    return agg.select(
        F.col("_id").alias(id_col),
        F.col("_ng").cast("long").alias("n_grams"),
        "log_weight",
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Keep the ``k`` most target-like raw documents by DSIR weight
    (ties broken by min id — deterministic). Global top-k goes through
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), not a full sort."""
    w = dsir_log_weights(
        df, target, text_col, id_col, target_text_col, n_buckets, alpha
    )
    return (
        df.join(w, id_col)
        .orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Per-document SLIDING-WINDOW chunking — the RAG/embedding-index
    prep step (each chunk embeds separately; ``overlap`` keeps
    sentences split by a boundary retrievable from both sides).
    Contrast :func:`materialize_chunks`, which packs documents
    head-to-tail ACROSS doc boundaries for LM pretraining.

    Chunk i covers tokens ``[i*step, i*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``; start positions run while they
    still index a token, so every token lands in >= 1 chunk and final
    chunks may be short. Empty/whitespace-only docs yield no rows.
    Returns (``id_col``, ``chunk_idx`` 0-based, ``n_tokens``,
    ``text``) — map-only (tokenize -> position explode -> slice/join,
    all whole-stage codegen; no shuffle, no Python), so it fuses into
    the scan at any corpus size.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap
    toks_arr = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    # filter BEFORE the explode: sequence(0, -1) is a DESCENDING
    # sequence in Spark, not an empty one (same guard as char_ngrams)
    base = df.select(F.col(id_col), toks_arr.alias("_lt_toks")).filter(
        F.size("_lt_toks") > 0
    )
    n = F.size("_lt_toks")
    # number of chunks = ceil over starts: last start index i satisfies
    # i*step < n  ->  i_max = floor((n-1)/step)
    n_chunks = F.floor((n - F.lit(1)) / F.lit(step)) + 1
    out = base.select(
        id_col,
        "_lt_toks",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias(
            "chunk_idx"
        ),
    ).select(
        id_col,
        "chunk_idx",
        F.slice(
            "_lt_toks", F.col("chunk_idx") * step + 1, chunk_tokens
        ).alias("_lt_chunk"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.size("_lt_chunk").cast("long").alias("n_tokens"),
        F.array_join("_lt_chunk", " ").alias("text"),
    )
