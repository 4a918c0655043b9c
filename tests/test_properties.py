"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: the reference has no property testing). Each
property batches many generated values into ONE Spark job per example
and caps example counts, so the suite stays fast.

Covered invariants:
- poly_hash SQL-text form == Column form on arbitrary unicode strings
  (the bit-identical claim behind the F.expr fast build path)
- HashNgramEncoder.encode_batch (numpy mirror) == relational encode
  (the bit-identical claim behind the broadcast-kNN key-shipping path)
- pandas-suffix rules: suffix_plan == pandas.DataFrame.merge renaming
- serialize_columns null/sep contract vs plain string ops
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder
from linktransformer_spark.functions.similarity import poly_hash
from linktransformer_spark.plans.suffixes import suffix_plan

# printable-ish unicode incl. whitespace + CJK + accents; no surrogates
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFFF),
    max_size=80,
)

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(st.lists(TEXT, min_size=1, max_size=40), st.integers(0, 3))
def test_poly_hash_text_form_equals_column_form(spark, strings, salt):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    rows = df.select(
        poly_hash(F.col("s"), salt).alias("a"), poly_hash("s", salt).alias("b")
    ).collect()
    assert all(r.a == r.b for r in rows)
    assert all(0 <= r.a < 2147483647 for r in rows)


@SLOW
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_hash_ngram_batch_mirror_is_bit_identical(spark, strings):
    enc = HashNgramEncoder(dim=16, n=3)
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    rel = {
        r.s: r.emb
        for r in enc.encode(df, "s", "emb").collect()
    }
    mat = enc.encode_batch(strings)
    for s, vec in zip(strings, mat):
        assert rel[s] == list(vec), f"mismatch for {s!r}"


NAMES = st.lists(
    st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6),
    min_size=1, max_size=6, unique=True,
)


@settings(max_examples=50, deadline=None)
@given(NAMES, NAMES)
def test_suffix_plan_matches_pandas_merge_rules(lcols, rcols):
    lmap, rmap = suffix_plan(lcols, rcols, ("_x", "_y"))
    l_df = pd.DataFrame([[0] * len(lcols)], columns=lcols)
    r_df = pd.DataFrame([[0] * len(rcols)], columns=rcols)
    l_df["_k"] = 1
    r_df["_k"] = 1
    merged = l_df.merge(r_df, on="_k", suffixes=("_x", "_y"))
    expect = [c for c in merged.columns if c != "_k"]
    got = [lmap[c] for c in lcols] + [rmap[c] for c in rcols]
    assert sorted(got) == sorted(expect)


@SLOW
@given(st.lists(st.one_of(st.none(), TEXT), min_size=1, max_size=20))
def test_serialize_columns_null_contract(spark, values):
    from linktransformer_spark.functions.serialize import serialize_columns

    df = spark.createDataFrame([(v, "x") for v in values], "a string, b string")
    rows = df.select(serialize_columns(["a", "b"], " | ").alias("k"), "a").collect()
    for r in rows:
        # nulls serialize to '' (reference utils.py:174), sep joins cols
        assert r.k == f"{r.a or ''} | x"


ROWS = st.lists(
    st.tuples(st.one_of(st.none(), TEXT)), min_size=1, max_size=12
)


@SLOW
@given(ROWS, ROWS)
def test_merge_invariants_on_random_tables(spark, lrows, rrows):
    """Reference invariants on arbitrary inputs (nulls, unicode,
    duplicate keys): merge ≡ merge_knn(k=1); exactly one match per left
    row when the right side is non-empty; lev scores lie in [0, 1]."""
    import linktransformer_spark as lt

    l = spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(lrows)], "lid long, name string"
    )
    r = spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(rrows)], "rid long, name string"
    )
    kw = dict(left_on="name", right_on="name", model="levenshtein",
              left_id_col="lid", right_id_col="rid")
    m = lt.merge(l, r, **kw).collect()
    k1 = lt.merge_knn(l, r, k=1, **kw).collect()
    assert len(m) == len(lrows)
    assert sorted((x.lid, x.rid, round(x.score, 9)) for x in m) == sorted(
        (x.lid, x.rid, round(x.score, 9)) for x in k1
    )
    assert all(0.0 <= x.score <= 1.0 for x in m)


# ---------------------------------------------------------------------------
# merge_asof differential property: pandas.merge_asof IS the semantic
# model (SURVEY-style parity via an independent reference impl, not our
# own SQL mirror). Ids are unique per (key, ts) so the deterministic
# tie-break never has to fire and both engines agree exactly.
# ---------------------------------------------------------------------------

_ASOF_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),            # group key
        st.integers(0, 50),           # ts (int on-column)
        st.integers(-1000, 1000),     # payload
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(_ASOF_ROWS, _ASOF_ROWS, st.sampled_from(["backward", "forward"]),
       st.booleans())
def test_merge_asof_matches_pandas(spark, lrows, rrows, direction, exact):
    from linktransformer_spark.operators.asof import merge_asof

    # unique (key, ts) per side: pandas keeps the LAST of duplicates,
    # we keep max-id — dedupe so the differential compares semantics,
    # not tie policy
    l = pd.DataFrame(lrows, columns=["g", "x", "lv"]).drop_duplicates(
        ["g", "x"]).reset_index(drop=True)
    r = pd.DataFrame(rrows, columns=["g", "x", "rv"]).drop_duplicates(
        ["g", "x"]).reset_index(drop=True)
    l["lid"] = range(len(l))
    r["rid"] = range(len(r))

    want = pd.merge_asof(
        l.sort_values("x"), r.sort_values("x"), on="x", by="g",
        direction=direction, allow_exact_matches=exact,
    )
    want_map = {
        int(row.lid): (None if pd.isna(row.rv) else int(row.rv))
        for row in want.itertuples()
    }

    ldf = spark.createDataFrame(l[["g", "x", "lv", "lid"]])
    rdf = spark.createDataFrame(r[["g", "x", "rv", "rid"]])
    got = merge_asof(
        ldf, rdf, on="x", by="g", right_id_col="rid",
        direction=direction, allow_exact_matches=exact,
    )
    got_map = {int(row["lid"]): (None if row["rv"] is None else int(row["rv"]))
               for row in got.collect()}
    assert got_map == want_map


# lines for dedup_lines: include blanks, whitespace-only, repeats
LINE = st.one_of(
    st.sampled_from(["", " ", "  boiler  ", "boiler", "alpha", "beta b"]),
    st.text(alphabet="ab c", max_size=8),
)


@SLOW
@given(st.lists(st.lists(LINE, max_size=6), min_size=1, max_size=8))
def test_dedup_lines_invariants(spark, docs):
    """dedup_lines: (1) idempotent; (2) every surviving non-blank
    trimmed line appears exactly once corpus-wide; (3) per-doc output
    lines are a subsequence of the input lines."""
    import linktransformer_spark as lt

    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    once = lt.dedup_lines(df, id_col="id")
    twice = lt.dedup_lines(once, id_col="id")
    a = {r["id"]: r["text"] for r in once.collect()}
    b = {r["id"]: r["text"] for r in twice.collect()}
    assert a == b  # idempotent
    seen = []
    for i in sorted(a):
        out_lines = a[i].split("\n") if a[i] != "" else []
        in_lines = rows[i][1].split("\n")
        it = iter(in_lines)
        assert all(any(l == x for x in it) for l in out_lines)  # subsequence
        seen += [l.strip() for l in out_lines if l.strip() != ""]
    assert len(seen) == len(set(seen))  # global uniqueness


@SLOW
@given(st.lists(st.integers(0, 300), min_size=1, max_size=25),
       st.integers(1, 7))
def test_pack_sequences_invariants(spark, sizes, width_sel):
    """pack_sequences: chunk_pos < budget; offsets monotone in id;
    end >= start; total span equals the token sum; two-phase ==
    single-window for arbitrary bucket widths."""
    import linktransformer_spark as lt

    budget = 64
    rows = [(i * 3 + 1, n) for i, n in enumerate(sizes)]  # gappy ids
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    cols = ["doc_id", "n_tokens", "chunk_id", "chunk_pos", "end_chunk_id"]
    single = sorted(map(tuple,
        lt.pack_sequences(df, budget=budget, bucket_width=None)
        .select(cols).collect()))
    two = sorted(map(tuple,
        lt.pack_sequences(df, budget=budget, bucket_width=width_sel)
        .select(cols).collect()))
    assert single == two
    offs = []
    for _id, n, c, p, e in single:
        assert 0 <= p < budget and e >= c
        offs.append(c * budget + p)
    assert offs == sorted(offs)  # monotone tape layout
    # consecutive offsets differ by exactly the doc's token count
    for (o1, (_, n, *_)), o2 in zip(zip(offs, single), offs[1:]):
        assert o2 - o1 == n


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 5000),
                  st.sampled_from(["a", "b", "c", "d"])),
        min_size=2, max_size=60,
    )
)
def test_transition_matrix_invariants(spark, events):
    """p conditions: per from_type, sum of p over ALL outgoing rows
    (min_count=1) is 1 within rounding; n >= 1; no self-successor
    constraint assumed."""
    import datetime as dt

    from linktransformer_spark.operators.eventpipe import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(seconds=s), ty, i)
        for i, (u, s, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = transition_matrix(df, tiebreak_col="event_id").collect()
    by_from = {}
    for r in out:
        assert r["n"] >= 1
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["p"]
    for tot in by_from.values():
        assert abs(tot - 1.0) < 1e-4  # p rounded to 6dp per row


@SLOW
@given(
    st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=5, max_size=80),
    st.integers(1, 50),
)
def test_temperature_mixture_invariants(spark, groups, budget):
    """Output is a subset of the input; per-group counts respect both
    the group size and the floor apportionment target; total <= budget."""
    import math

    import linktransformer_spark as lt

    rows = [(g, f"t{i}") for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "src string, text string")
    out = lt.temperature_mixture(df, "src", budget=budget, key_cols="text")
    got = out.groupBy("src").count().collect()
    cnt = {g: groups.count(g) for g in set(groups)}
    # same fold order as the operator: group-sort order
    z = 0.0
    for g in sorted(cnt):
        z += math.sqrt(cnt[g])
    total = 0
    for r in got:
        g, n = r["src"], r["count"]
        target = min(cnt[g], math.floor(budget * math.sqrt(cnt[g]) / z))
        assert n == target
        total += n
    assert total <= budget


@SLOW
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 8)),
                min_size=1, max_size=30))
def test_pagerank_invariants(spark, pairs):
    """Ranks positive; total mass <= 1 (+eps); exactly 1 when no node
    is dangling."""
    import linktransformer_spark as lt

    df = spark.createDataFrame(pairs, "src long, dst long")
    rows = lt.pagerank(df, iterations=3).collect()
    total = sum(r["rank"] for r in rows)
    assert all(r["rank"] > 0 for r in rows)
    assert total <= 1.0 + 1e-9
    srcs = {s for s, _ in pairs}
    nodes = srcs | {d for _, d in pairs}
    if nodes <= srcs:  # every node has an out-edge -> mass conserved
        assert abs(total - 1.0) < 1e-9


@SLOW
@given(st.lists(st.text(alphabet="abcd ", min_size=0, max_size=30),
                min_size=2, max_size=12))
def test_containment_bounds_and_dominates_jaccard(spark, texts):
    """containment in (0, 1]; for any pair, max-direction containment
    >= jaccard (set identity: |I|/min(|A|,|B|) >= |I|/|A∪B|)."""
    import linktransformer_spark as lt

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    cont = {(r["src"], r["dst"]): r["containment"]
            for r in lt.containment_pairs(
                df, on="text", id_col="doc_id", threshold=1e-9,
                shingle=2).collect()}
    jac = {(r["src"], r["dst"]): r["jaccard"]
           for r in lt.near_dup_pairs_jaccard(
               df, on="text", id_col="doc_id", threshold=1e-9,
               shingle=2).collect()}
    for v in cont.values():
        assert 0.0 < v <= 1.0 + 1e-12
    for (a, b), j in jac.items():
        m = max(cont.get((a, b), 0.0), cont.get((b, a), 0.0))
        assert m >= j - 1e-9


# ---------------------------------------------------------------------------
# round 7: the enforced funnel cap is EXACT prefix truncation
# ---------------------------------------------------------------------------
_FUNNEL_EV = st.lists(
    st.tuples(
        st.integers(1, 3),            # user
        st.integers(0, 50),           # ts seconds
        st.sampled_from(["a", "b", "c", "x"]),  # event type (x = noise)
    ),
    min_size=1, max_size=40,
)


@SLOW
@given(_FUNNEL_EV, st.integers(1, 6))
def test_funnel_cap_is_exact_prefix_truncation(spark, events, cap):
    """For ANY event set and ANY cap: funnel(cap=N) == funnel(None) on
    each user's earliest-N funnel-step events (ties (ts, step) — the
    fold's own order)."""
    import datetime as dt

    from linktransformer_spark.operators.eventpipe import funnel_user_steps

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0 + dt.timedelta(seconds=s), t) for (u, s, t) in events]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["a", "b", "c"]
    capped = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
        for r in funnel_user_steps(
            df, steps, max_events_per_user=cap).collect()
    }
    # python-side truncation: per user keep earliest `cap` step events
    # ordered by (ts, step index)
    idx = {s: i for i, s in enumerate(steps)}
    per_user: dict = {}
    for (u, ts, t) in rows:
        if t in idx:
            per_user.setdefault(u, []).append((ts, idx[t], t))
    trunc_rows = []
    for u, evs in per_user.items():
        evs.sort()
        trunc_rows += [(u, ts, t) for (ts, _i, t) in evs[:cap]]
    if trunc_rows:
        tdf = spark.createDataFrame(trunc_rows, ["user_id", "ts", "event_type"])
        want = {
            r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
            for r in funnel_user_steps(
                tdf, steps, max_events_per_user=None).collect()
        }
    else:
        want = {}
    assert capped == want


# word-ish corpora with deliberate duplication pressure: a small word
# pool guarantees shared shingles and hot-ish buckets at tiny caps
_WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "spam", "ham", "eggs", "x", "y"]
)
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_DOC, min_size=2, max_size=40), st.integers(2, 5))
def test_salted_minhash_equals_uncapped_property(spark, docs, cap):
    """The round-8 invariant behind every salted skew join: for ANY
    corpus and ANY cap, hot_bucket='salt' emits exactly the uncapped
    pair set (triangle cells + diagonal-or-cross-group condition) —
    duplication-heavy corpora force multi-sub-group buckets."""
    from linktransformer_spark.operators.dedup import near_dup_pairs_minhash

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    kw = dict(on="text", id_col="doc_id", threshold=0.4,
              num_hashes=8, bands=4, shingle=2)
    unc = near_dup_pairs_minhash(df, **kw).collect()
    salt = near_dup_pairs_minhash(
        df, max_bucket_size=cap, hot_bucket="salt", **kw
    ).collect()
    key = lambda rs: sorted((r.src, r.dst, round(r.jaccard, 9)) for r in rs)
    assert key(salt) == key(unc)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_DOC, min_size=1, max_size=25),
       st.lists(_DOC, min_size=1, max_size=25), st.integers(1, 5))
def test_bipartite_salt_equals_uncapped_property(spark, new, seen, cap):
    """Grid-salt (_salt_two_sided) counterpart of the self-join salt
    property: for ANY (new, seen) pair of corpora and ANY cap, the
    bipartite new-vs-seen salted band join emits exactly the uncapped
    candidate pair set — each cross pair shares exactly ONE (gL, gR)
    grid cell, so no pair is lost and none duplicates."""
    from linktransformer_spark.operators.dedup import (
        near_dup_pairs_minhash_against,
    )

    ndf = spark.createDataFrame(
        list(enumerate(new)), "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(1000 + i, d) for i, d in enumerate(seen)],
        "doc_id long, text string",
    )
    kw = dict(on="text", id_col="doc_id", threshold=0.4,
              num_hashes=8, bands=4, shingle=2)
    unc = near_dup_pairs_minhash_against(ndf, sdf, **kw).collect()
    salt = near_dup_pairs_minhash_against(
        ndf, sdf, max_bucket_size=cap, hot_bucket="salt", **kw
    ).collect()
    key = lambda rs: sorted((r.src, r.dst, round(r.jaccard, 9)) for r in rs)
    assert key(salt) == key(unc)


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_DOC, min_size=1, max_size=20),
       st.lists(_DOC, min_size=1, max_size=20), st.integers(1, 4))
def test_index_salt_equals_uncapped_property(spark, tmp_path_factory, new, seen, cap):
    """Stored-index ingest salt: same invariant as the bipartite salt,
    but the seen side's bands come from a persisted minhash index —
    the salting must hold against ARBITRARY stored band distributions,
    not just the example fixture's."""
    from linktransformer_spark.operators.dedup import (
        near_dup_pairs_minhash_against_index,
        save_minhash_index,
    )

    path = str(tmp_path_factory.mktemp("mh_prop") / "idx")
    sdf = spark.createDataFrame(
        [(1000 + i, d) for i, d in enumerate(seen)],
        "doc_id long, text string",
    )
    save_minhash_index(sdf, path, on="text", id_col="doc_id",
                       num_hashes=8, bands=4, shingle=2)
    ndf = spark.createDataFrame(
        list(enumerate(new)), "doc_id long, text string"
    )
    kw = dict(on="text", id_col="doc_id", threshold=0.4)
    unc = near_dup_pairs_minhash_against_index(ndf, path, **kw).collect()
    salt = near_dup_pairs_minhash_against_index(
        ndf, path, max_bucket_size=cap, hot_bucket="salt", **kw
    ).collect()
    key = lambda rs: sorted((r.src, r.dst, round(r.jaccard, 9)) for r in rs)
    assert key(salt) == key(unc)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(TEXT, min_size=1, max_size=15),
       st.sampled_from([(8, 4, 2, True), (24, 8, 3, True), (12, 4, 3, False)]))
def test_py_minhash_replica_equals_column_forms(spark, texts, cfg):
    """The load-bearing parity behind the streaming-dedup fast path:
    dedup.py_minhash_cols (exact-integer Arrow replica) must equal the
    minhash_signature / _shingles_nonempty Column expressions for
    ARBITRARY unicode text — whitespace classes, case folding input
    (the replica receives JVM-lowercased text), empty and short docs,
    CJK, accents."""
    from linktransformer_spark.operators.dedup import (
        _shingles_nonempty,
        minhash_signature,
        py_minhash_cols,
    )

    num_hashes, _bands, shingle, word = cfg
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    # word mode: the replica receives the JVM-lowercased key (the
    # Unicode-sensitive step stays JVM-side); char mode: the RAW key
    # (char shingles never case-fold — this property pinned that)
    key = F.lower(F.col("t")) if word else F.col("t")
    rows = df.select(
        "id",
        key.alias("k"),
        minhash_signature(F.col("t"), num_hashes, shingle, word).alias("sig"),
        _shingles_nonempty(F.col("t"), shingle, word).alias("sh"),
    ).collect()
    sigs, shs = py_minhash_cols([r["k"] for r in rows], num_hashes,
                                shingle, word)
    for r, sig, sh in zip(rows, sigs, shs):
        assert list(map(int, sig)) == list(r["sig"]), (r["k"],)
        assert sorted(sh) == sorted(r["sh"]), (r["k"],)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_codegen_text_exprs_equal_hof_forms(spark, texts):
    """The round-13 codegen rewrites of the text expressions must equal
    the original higher-order-function forms for ARBITRARY unicode
    text: word_tokens (trim+split vs filter(split)), _token_hits
    (padded regexp_count vs size(filter(array_contains))), the summed
    token length (length(array_join) vs aggregate), and the subword
    alnum-run estimate ({1,4} greedy regexp_count vs per-run ceil
    aggregate)."""
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.operators.textpipe import (
        LANG_PROFILES,
        _token_hits,
        subword_count_expr,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    t = F.col("t")
    old_toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != F.lit(""))
    all_stop = tuple(w for ws in LANG_PROFILES.values() for w in ws)
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    old_runs = F.filter(
        F.split(F.lower(t), r"[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    rows = df.select(
        "id",
        S.word_tokens(t).alias("new_toks"),
        old_toks.alias("old_toks"),
        _token_hits(S.word_tokens(t), all_stop).alias("new_hits"),
        F.size(
            F.filter(old_toks, lambda x: F.array_contains(stop_arr, x))
        ).alias("old_hits"),
        F.length(F.array_join(S.word_tokens(t), "")).alias("new_wlen"),
        F.aggregate(
            old_toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("old_wlen"),
        subword_count_expr(t).alias("new_sub"),
        (
            F.aggregate(
                old_runs,
                F.lit(0),
                lambda acc, x: acc + F.ceil(F.length(x) / F.lit(4.0)).cast("int"),
            )
            + F.length(F.regexp_replace(t, "[0-9A-Za-z ]", ""))
        ).cast("long").alias("old_sub"),
    ).collect()
    for r in rows:
        assert r["new_toks"] == r["old_toks"], (texts[r["id"]],)
        assert r["new_hits"] == r["old_hits"], (texts[r["id"]],)
        assert r["new_wlen"] == r["old_wlen"], (texts[r["id"]],)
        assert r["new_sub"] == r["old_sub"], (texts[r["id"]],)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(TEXT, min_size=1, max_size=15),
       st.sampled_from([16, 64, 1024]))
def test_gram_bucket_counts_replica_equals_relational(spark, texts, n_buckets):
    """The parity behind the DSIR fast path: corpus._gram_bucket_counts
    (exact-integer Arrow replica, per-doc pre-grouped) must equal
    _gram_bucket_rows(...).groupBy(_id, _b).count() for ARBITRARY
    unicode text — empty docs, 1-token docs (whose token is counted
    twice: once as the unigram, once as the short-doc bigram
    fallback), whitespace classes, case folding, CJK."""
    from linktransformer_spark.operators.corpus import (
        _gram_bucket_counts,
        _gram_bucket_rows,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rel = (
        _gram_bucket_rows(df, "text", "doc_id", n_buckets)
        .groupBy("_id", "_b")
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    rep = _gram_bucket_counts(df, "text", "doc_id", n_buckets).collect()
    key = lambda r: (r["_id"], r["_b"])  # noqa: E731
    assert sorted(((r["_id"], r["_b"], r["_n"]) for r in rel)) == sorted(
        ((r["_id"], r["_b"], r["_n"]) for r in rep)
    ), texts


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_DOC, min_size=1, max_size=15),
       st.lists(_DOC, min_size=2, max_size=15),
       st.lists(st.integers(0, 14), min_size=0, max_size=8))
def test_index_tombstone_equals_filtered_rebuild_property(
    spark, tmp_path_factory, new, seen, dels
):
    """Round-9 delete invariant: for ANY (new, seen) corpora and ANY
    delete subset, running the new batch against a tombstoned index
    equals running it against an index rebuilt over the surviving seen
    docs — per-row index state means tombstones are exact filters,
    never approximations (the guarantee compliance deletion rests on)."""
    from linktransformer_spark.operators.dedup import (
        delete_from_minhash_index,
        near_dup_pairs_minhash_against_index,
        save_minhash_index,
    )

    base = str(tmp_path_factory.mktemp("mhdel"))
    ndf = spark.createDataFrame(
        list(enumerate(new)), "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(1000 + i, d) for i, d in enumerate(seen)],
        "doc_id long, text string",
    )
    del_ids = sorted({1000 + i for i in dels if i < len(seen)})
    kw = dict(on="text", id_col="doc_id", threshold=0.4)
    fam = dict(num_hashes=8, bands=4, shingle=2)

    tomb_path = f"{base}/tomb"
    save_minhash_index(sdf, tomb_path, on="text", id_col="doc_id", **fam)
    if del_ids:
        delete_from_minhash_index(
            spark.createDataFrame([(i,) for i in del_ids], "doc_id long"),
            tomb_path, id_col="doc_id",
        )
    got = near_dup_pairs_minhash_against_index(ndf, tomb_path, **kw).collect()

    ref_path = f"{base}/ref"
    survivors = sdf.filter(~F.col("doc_id").isin(del_ids)) if del_ids else sdf
    save_minhash_index(survivors, ref_path, on="text", id_col="doc_id", **fam)
    want = near_dup_pairs_minhash_against_index(ndf, ref_path, **kw).collect()

    key = lambda rs: sorted((r.src, r.dst, round(r.jaccard, 9)) for r in rs)
    assert key(got) == key(want)


# short name-ish keys with heavy collision pressure: small alphabet +
# lengths near each other force score ties and multi-member entities
_KEY = st.text(alphabet="abc", min_size=0, max_size=5)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_KEY, min_size=1, max_size=12),
       st.lists(st.tuples(st.integers(1, 5), _KEY), min_size=1, max_size=12))
def test_attach_to_entities_matches_python_argmax(spark, new_keys, registry):
    """attach_to_entities == a python argmax with the documented
    tie-break (score DESC, entity ASC, matched_key ASC) on ANY record
    batch and ANY registry — ties and unmatched rows included."""
    import linktransformer_spark as lt

    def lev(a, b):
        if a == b:
            return 1.0
        m, n = len(a), len(b)
        if m == 0 or n == 0:
            return 0.0 if max(m, n) else 1.0
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return 1.0 - prev[n] / max(m, n)

    T = 0.5
    new = spark.createDataFrame(
        list(enumerate(new_keys)), "rid long, name string"
    )
    reg = spark.createDataFrame(registry, "entity_id long, key string")
    got = {
        r["record_id"]: (r["entity_id"], r["matched_key"])
        for r in lt.attach_to_entities(
            new, reg, on="name", id_col="rid", sim_threshold=T
        ).collect()
    }
    for rid, name in enumerate(new_keys):
        cands = sorted(
            ((lev(name, k), e, k) for e, k in registry if lev(name, k) >= T),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        want = (cands[0][1], cands[0][2]) if cands else (None, None)
        assert got[rid] == want, (rid, name, got[rid], want)


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(-8, 8, allow_nan=False, width=32).map(float),
            min_size=6, max_size=6,
        ),
        min_size=1, max_size=12,
    ),
    st.lists(
        st.lists(
            st.floats(-8, 8, allow_nan=False, width=32).map(float),
            min_size=6, max_size=6,
        ),
        min_size=1, max_size=12,
    ),
    st.sampled_from([None, 0.0, 5.0, -5.0]),
    st.sampled_from([None, 1, 2]),
)
def test_bucket_dot_rescore_equals_column_fold(spark, lv, rv, thr, k):
    """bucket_dot_rescored_pairs (the Arrow numpy cogroup re-score of
    the LSH paths) is BIT-equal to the declarative join + S.dot fold
    on arbitrary vectors, thresholds, and k — the left-assoc per-
    dimension accumulation claim, plus: in-group top-k under the
    (score DESC, right_id ASC) order keeps exactly the rows a global
    row_number top-k over all candidates would keep per group."""
    from pyspark.sql import Window

    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.operators.knn_join import (
        bucket_dot_rescored_pairs,
    )

    # two buckets so the cogroup actually groups; uneven split
    lb = spark.createDataFrame(
        [(i % 2, i, v) for i, v in enumerate(lv)],
        "b int, lid long, lemb array<double>",
    )
    rb = spark.createDataFrame(
        [(j % 2, j, v) for j, v in enumerate(rv)],
        "b int, rid long, remb array<double>",
    )
    got = bucket_dot_rescored_pairs(
        lb, rb, ["b"], left_id="lid", right_id="rid",
        left_emb="lemb", right_emb="remb", threshold=thr, k=k,
    ).collect()

    ref = lb.join(rb, "b").withColumn(
        "score", S.dot(F.col("lemb"), F.col("remb"))
    )
    if k is not None:
        w = Window.partitionBy("lid", "b").orderBy(
            F.col("score").desc(), F.col("rid").asc()
        )
        ref = ref.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= k
        )
    if thr is not None:
        ref = ref.filter(F.col("score") >= F.lit(thr))
    want = ref.select("lid", "rid", "score").collect()

    # bit-equal: compare raw doubles, no rounding
    assert sorted((r.lid, r.rid, r.score) for r in got) == sorted(
        (r.lid, r.rid, r.score) for r in want
    )


@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.sets(st.integers(0, 63), max_size=12),   # ids to change in place
    st.sets(st.integers(0, 63), max_size=8),    # ids to tombstone first
    st.sets(st.integers(100, 140), max_size=6), # brand-new ids
)
def test_upsert_ivf_equals_recipe_property(
    spark, tmp_path_factory, changed, deleted, new_ids
):
    """upsert_ivf_index == the documented delete->purge->append recipe
    on ARBITRARY batch shapes: changed ids (overlapping or not with a
    prior tombstone batch), brand-new ids, empty pieces — the serve
    results and the stored cell relation must match the recipe twin
    exactly (same frozen centroids)."""
    import linktransformer_spark as lt

    batch_ids = sorted(changed | new_ids)
    if not batch_ids:
        return
    base = tmp_path_factory.mktemp("upsert_prop")
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
         for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 9 - 4) for j in range(8)])
         for i in batch_ids],
        "vec_id long, embedding array<double>",
    )
    dels = spark.createDataFrame(
        [(i,) for i in sorted(deleted)] or [(-1,)], "vec_id long"
    )

    p_up = str(base / "up")
    lt.save_ivf_index(emb, p_up, n_cells=4)
    lt.delete_from_ivf_index(dels, p_up)
    lt.upsert_ivf_index(batch, p_up)

    p_ref = str(base / "ref")
    lt.save_ivf_index(emb, p_ref, n_cells=4)
    lt.delete_from_ivf_index(dels, p_ref)
    lt.delete_from_ivf_index(batch.select("vec_id"), p_ref)
    p_ref2 = str(base / "ref2")
    lt.purge_ivf_index(spark, p_ref, p_ref2)
    lt.append_to_ivf_index(batch, p_ref2)
    # the recipe twin loses the NON-batch tombstones at purge time;
    # re-apply them so both sides mask the same surviving delete set
    still_deleted = sorted(deleted - set(batch_ids))
    if still_deleted:
        lt.delete_from_ivf_index(
            spark.createDataFrame([(i,) for i in still_deleted],
                                  "vec_id long"),
            p_ref2,
        )

    q = emb.limit(10)
    got = sorted(map(tuple, lt.ann_topk_ivf_indexed(
        spark, p_up, q, k=3, n_probe=2).collect()))
    want = sorted(map(tuple, lt.ann_topk_ivf_indexed(
        spark, p_ref2, q, k=3, n_probe=2).collect()))
    assert got == want
    # stored-relation twin check: upsert leaves NON-batch tombstoned
    # rows on disk (masked — that is the tombstone contract), while
    # the recipe's purge removed them physically; compare the upserted
    # cells minus that masked set
    def cells(path, skip=()):
        rows = spark.read.parquet(f"{path}/cells").select(
            "vec_id", "cell", "embedding"
        ).collect()
        return sorted(
            (r.vec_id, r.cell, tuple(r.embedding))
            for r in rows if r.vec_id not in set(skip)
        )

    assert cells(p_up, skip=still_deleted) == cells(p_ref2)


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # id — duplicates allowed on purpose
            st.lists(
                st.floats(-8, 8, allow_nan=False, width=32).map(float),
                min_size=5, max_size=5,
            ),
        ),
        min_size=1, max_size=14,
    ),
    st.sampled_from([0.0, 5.0, -5.0, 40.0]),
)
def test_bucket_dot_self_pairs_equals_join_fold(spark, rows, thr):
    """bucket_dot_self_pairs (the SemDeDup within-cell self-cogroup
    kernel) is BIT-equal to the declarative self-join on
    (cell, l.id < r.id) + the S.dot fold on arbitrary vectors and
    thresholds — including DUPLICATE ids, which must pair with
    nothing between themselves (the strict < contract) while still
    pairing with every other id in the cell."""
    from linktransformer_spark.functions import similarity as S
    from linktransformer_spark.operators.knn_join import (
        bucket_dot_self_pairs,
    )

    # two cells so the cogroup actually groups; uneven split
    df = spark.createDataFrame(
        [(i % 2, rid, v) for i, (rid, v) in enumerate(rows)],
        "cell int, _id long, _v array<double>",
    )
    got = bucket_dot_self_pairs(df, "cell", "_id", "_v", thr).collect()

    l, r = df.alias("l"), df.alias("r")
    cond = (F.col("l.cell") == F.col("r.cell")) & (
        F.col("l._id") < F.col("r._id")
    )
    want = (
        l.join(r, cond)
        .withColumn("cosine", S.dot(F.col("l._v"), F.col("r._v")))
        .filter(F.col("cosine") >= F.lit(thr))
        .select(
            F.col("l._id").alias("src"), F.col("r._id").alias("dst"),
            F.col("l.cell").alias("cell"), "cosine",
        )
        .collect()
    )

    # bit-equal: raw doubles, no rounding. The join form can emit the
    # same (src, dst) via DIFFERENT duplicate-id rows — both forms
    # must produce the identical multiset of (src, dst, cell, score).
    assert sorted((g.src, g.dst, g.cell, g.cosine) for g in got) == sorted(
        (w.src, w.dst, w.cell, w.cosine) for w in want
    )


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 500),
            st.lists(
                st.sampled_from([0.0, 0.5, -0.5, 1.0, 0.25]),
                min_size=6, max_size=6,
            ),
        ),
        min_size=2, max_size=30,
    ),
    st.integers(1, 6),
)
def test_salted_semdedup_kernel_equals_uncapped_property(spark, rows, cap):
    """Round-11 invariant behind the salt-cell cogroup kernel: for ANY
    vector corpus and ANY cap, hot_cell='salt' emits exactly the
    uncapped within-cell pair set (quantized vector pool forces exact
    duplicates -> hot cells -> multi-sub-group salting at tiny caps)."""
    from linktransformer_spark.operators.dedup import (
        near_dup_pairs_semdedup,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, (_, v) in enumerate(rows)],
        "vec_id long, emb array<double>",
    )
    kw = dict(threshold=0.3, n_cells=3)
    unc = near_dup_pairs_semdedup(df, "emb", "vec_id", **kw).collect()
    salt = near_dup_pairs_semdedup(
        df, "emb", "vec_id", max_cell_size=cap, hot_cell="salt", **kw
    ).collect()
    key = lambda rs: sorted((r.src, r.dst, r.cell, r.cosine) for r in rs)
    assert key(salt) == key(unc)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30),
                  st.sampled_from("abcdef"),
                  st.sampled_from([0.25, 0.5, 1.0, 2.0])),
        min_size=1, max_size=60, unique_by=lambda t: (t[0], t[1], t[2]),
    ),
    st.integers(1, 4),
)
def test_bm25_prune_preserves_final_topk_property(spark, rows, topn):
    """Round-11 invariant behind streaming prune_topk: for ANY
    contribution relation (unique (q, d, term) — the documented
    unique-query-id contract) and ANY prune width, the pruned drain's
    final top-k (k <= prune width) is IDENTICAL to the raw drain's —
    scores at full float precision, n_terms included. The quantized
    impact pool forces score TIES, exercising the (score DESC, doc
    ASC) boundary the prune must reproduce exactly."""
    from linktransformer_spark.streaming.ops import (
        _prune_bm25_contributions, final_bm25_topk,
    )

    contrib = spark.createDataFrame(
        [(q, d, t, c) for q, d, t, c in rows],
        "_q long, _d long, _tok string, _c double",
    )
    k = topn  # the widest legal finalizer
    raw = final_bm25_topk(contrib, k=k).collect()
    pruned_rel = _prune_bm25_contributions(contrib, topn)
    pruned = final_bm25_topk(pruned_rel, k=k).collect()
    key = lambda rs: sorted(
        (r.q_id, r.doc_id, r.rank, r.score, r.n_terms) for r in rs
    )
    assert key(pruned) == key(raw)
    # the prune's whole point: never more than topn docs per query
    n_docs = pruned_rel.select("_q", "_d").distinct().count()
    n_q = contrib.select("_q").distinct().count()
    assert n_docs <= n_q * topn


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 40),
                  st.sampled_from([0.1, 0.5, 0.9, -0.2])),
        min_size=1, max_size=80, unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(1, 5),
)
def test_ann_candidate_prune_preserves_final_topk_property(
    spark, rows, topn
):
    """Same invariant for the row-local-scored candidate prune
    (streaming IVF ANN): pruned final top-k == raw final top-k at full
    precision for ANY candidate relation and ANY prune width; the
    quantized score pool forces ties at the selection boundary."""
    from linktransformer_spark.streaming.ops import (
        _prune_candidate_topk, final_ann_topk,
    )

    cands = spark.createDataFrame(
        [(q, n, s) for q, n, s in rows],
        "query_id long, neighbor_id long, score double",
    )
    raw = final_ann_topk(cands, k=topn).collect()
    pruned_rel = _prune_candidate_topk(cands, topn)
    pruned = final_ann_topk(pruned_rel, k=topn).collect()
    key = lambda rs: sorted(
        (r.query_id, r.neighbor_id, r.rank, r.score) for r in rs
    )
    assert key(pruned) == key(raw)
    assert pruned_rel.count() <= cands.select(
        "query_id").distinct().count() * topn
