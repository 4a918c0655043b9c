#!/usr/bin/env python
"""Deterministic ~sf1 dataset generator for the scale-evidence sweep.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, seed 42, read-only);
measuring scaling exponents needs one more decade. This generator
extends the same protocol — identical schemas, value formats, and
distribution shapes as the shipped sf0.1 tables (vocab-token document
text with a near-dup tail, 5 event types over a 30-day window,
TPC-H-ish star dimensions), scaled 10x — into $OUT (default
/tmp/lt_scale/sf1). numpy seed 42; byte-deterministic across runs.

Usage: python tools/gen_scale_data.py [--sf 1.0] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"  # distribution reference (read-only)

LANG_VOCABS = {
    "en": ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
           "fast", "filter", "group", "hash", "join", "key", "line", "merge",
           "order", "part", "query", "row", "scan", "slow", "small", "sort",
           "spark", "stream", "table", "the", "value", "vector", "window"],
    "de": ["der", "die", "das", "tabelle", "spalte", "zeile", "schnell",
           "langsam", "gruppe", "wert", "daten", "strom", "fenster", "sortier",
           "misch", "filter", "schluessel", "anfrage", "ein", "und"],
    "fr": ["le", "la", "les", "table", "colonne", "ligne", "rapide", "lent",
           "groupe", "valeur", "donnees", "flux", "fenetre", "tri", "jointure",
           "filtre", "cle", "requete", "un", "et"],
    "es": ["el", "la", "los", "tabla", "columna", "fila", "rapido", "lento",
           "grupo", "valor", "datos", "flujo", "ventana", "orden", "union",
           "filtro", "clave", "consulta", "un", "y"],
    "zh": ["shu", "ju", "biao", "lie", "hang", "kuai", "man", "zu", "zhi",
           "liu", "chuang", "pai", "lian", "guo", "jian", "cha", "xun", "he"],
}
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.84, 0.04, 0.04, 0.04, 0.04]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "small", "hot", "cold", "blue", "red", "green", "dim",
         "bright", "heavy"]
P_NOUN = ["ring", "bolt", "clip", "wheel", "gear", "pin", "rod", "cap",
          "disk", "tube"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


# --------------------------------------------------------------- zipf
# Round-10 verdict item 6: the shipped documents' 31-word vocab makes
# every BM25 term a stopword (df ~ corpus, so term-postings joins look
# quadratic in the corpus) and TPC-H names differ only in digits (all
# non-digit n-grams collide — a near-worst LSH case). This generator
# writes a REALISTIC-VOCAB twin: >=10k distinct syllable-built terms
# drawn Zipf(s=1.07), plus a mid-frequency-band `title` key column for
# the merge/ER similarity paths. Seed-fixed, independent rng — the
# main tables' bytes are untouched.

_ZIPF_SEED = 911
_ZIPF_VOCAB = 12_000
_ZIPF_S = 1.07


def _zipf_vocab(rng: np.random.Generator, n_terms: int) -> list[str]:
    """n_terms unique pronounceable terms: 2-4 random consonant-vowel
    syllables (realistic char-n-gram overlap ACROSS different terms —
    what the hash-n-gram/LSH paths see in real text, unlike base-N
    codes or digit-suffixed names)."""
    cons = "bcdfghjklmnprstvwz"
    vow = "aeiou"
    sylls = [c + v for c in cons for v in vow]
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n_terms:
        k = int(rng.integers(2, 5))
        t = "".join(sylls[int(i)] for i in rng.integers(0, len(sylls), k))
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def gen_zipf_documents(n_docs: int, seed: int = _ZIPF_SEED) -> pa.Table:
    """documents_zipf: (doc_id, text, title, n_chars). ``text`` is
    20-120 tokens over the Zipf vocab (so df spans stopword-like head
    terms to near-unique tail terms — the distribution BM25's impact
    model exists for); ``title`` is 3-6 tokens from the mid-frequency
    band (ranks 100-3000) — entity-name-like keys for merge/ER."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_zipf_vocab(rng, _ZIPF_VOCAB))
    ranks = np.arange(1, _ZIPF_VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks ** _ZIPF_S
    p /= p.sum()
    lens = rng.integers(20, 121, n_docs)
    toks = rng.choice(_ZIPF_VOCAB, size=int(lens.sum()), p=p)
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(vocab[toks[pos:pos + ln]]))
        pos += ln
    mid = vocab[100:3000]
    tlens = rng.integers(3, 7, n_docs)
    ttoks = rng.integers(0, len(mid), int(tlens.sum()))
    titles = []
    pos = 0
    for ln in tlens:
        titles.append(" ".join(mid[ttoks[pos:pos + ln]]))
        pos += ln
    return pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "title": titles,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf
    out = args.out or f"/tmp/lt_scale/sf{sf:g}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # nation / region: fixed dimensions, copied verbatim
    for t in ("nation", "region"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"  {t}: copied")

    # customer / supplier
    ck = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in ck],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    sk = np.arange(n_supp, dtype=np.int64)
    _write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in sk],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    # part
    pk = np.arange(n_part, dtype=np.int64)
    adj = rng.integers(0, len(P_ADJ), n_part)
    noun = rng.integers(0, len(P_NOUN), n_part)
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(["LARGE", "SMALL", "ECONOMY", "STANDARD",
                            "PROMO"])[rng.integers(0, 5, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * pk.astype(np.float64), 2),
    }))

    # orders / lineitem (1995-2001 date window like the source)
    ok = np.arange(n_ord, dtype=np.int64)
    d0 = np.datetime64("1995-01-01")
    span_days = int((np.datetime64("2001-08-01") - d0)
                    / np.timedelta64(1, "D"))
    _write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": (d0 + rng.integers(0, span_days, n_ord)
                        .astype("timedelta64[D]")).astype("datetime64[us]"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": (d0 + rng.integers(0, span_days, n_li)
                       .astype("timedelta64[D]")).astype("datetime64[us]"),
    }))

    # events: 30-day window, ~uniform types, zipf-free user mix
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    month_us = 30 * 24 * 3600 * 1_000_000
    ev_ts = np.sort(rng.integers(0, month_us, n_ev))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": (t0 + ev_ts.astype("timedelta64[us]")),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 200, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: vocab-token text, 90% fresh + 10% near-dup mutations
    langs = np.array(LANGS)[rng.choice(5, n_docs, p=LANG_P)]
    sources = [f"src{i}" for i in rng.integers(0, 20, n_docs)]
    n_fresh = int(n_docs * 0.9)
    texts: list[str] = []
    for i in range(n_fresh):
        v = LANG_VOCABS[langs[i]]
        k = int(rng.integers(8, 97))
        texts.append(" ".join(np.array(v)[rng.integers(0, len(v), k)]))
    for i in range(n_fresh, n_docs):
        # near-dup tail: suffix-mutated copy of an earlier doc (what
        # keeps the dedup verify stage non-trivial at every scale)
        src = int(rng.integers(0, n_fresh))
        texts.append(texts[src] + " extra suffix words")
        langs[i] = langs[src]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 10 spherical clusters in 64-d (labelled), float32
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, 10, n_emb)
    vecs = centers[lab] + 0.35 * rng.normal(size=(n_emb, 64))
    vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": lab.astype(np.int32),
    }))
    # the realistic-vocab twin corpus (see gen_zipf_documents)
    _write(out, "documents_zipf", gen_zipf_documents(n_docs))
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
