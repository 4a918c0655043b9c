"""Structured Streaming operators (post-parity extension, SURVEY §2.8).

The reference is batch-only pandas; these are the streaming variants a
100 TB training-data pipeline needs, built on the idiomatic Spark
surface: ``readStream`` file source -> stateless/stateful transforms ->
``writeStream``. Every operator here is ALSO runnable as a finite
verification job: ``run_available_now`` drains the full input with
``trigger(availableNow=True)`` into a memory sink and returns the
result as a batch DataFrame — which is how the DuckDB oracle checks
streaming semantics against relational SQL.

Production notes (the part that matters at scale):
- watermarks bound state: ``withWatermark("ts", delay)`` lets Spark
  drop window/dedup state older than the delay. The verification path
  uses COMPLETE/append-with-drain so results are deterministic; a real
  deployment keeps the same plan and just changes the sink + trigger.
- ``session_window`` is the native stateful sessionizer (gap-merge
  implemented inside the state store, no driver state). Boundary
  semantics: an event exactly ``gap`` after the previous one starts a
  NEW session (window end is exclusive) — the batch lag/cumsum
  formulation must use ``diff >= gap`` to agree.
- streaming dedup: ``dropDuplicates(keys)`` keeps unbounded key state;
  ``dropDuplicatesWithinWatermark`` (the production variant) bounds it
  by the watermark.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream_table(spark: SparkSession, sf_dir: str, name: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a driver parquet table. The schema comes
    from a batch peek (file streams require an explicit schema)."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # ts encoding varies by driver round: TIMESTAMP(NANOS) needs the
        # legacy conf (reads as BIGINT nanos, rebuilt below), plain
        # TIMESTAMP(MICROS) reads directly (same rule as
        # sources.tables.read_table)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(path)
    schema = batch.schema
    # the file source wants a DIRECTORY; stream the sf dir with a glob
    # filter selecting this table's file(s)
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", f"{name}.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(sf_dir)
    if name == "events":
        ts_type = dict(batch.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            out = out.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
            )
        elif ts_type.startswith("timestamp_ntz"):
            out = out.withColumn("ts", F.to_timestamp("ts"))
    return out


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
    timeout_sec: int = 600,
) -> DataFrame:
    """Drain all available input through the streaming plan into a
    memory sink; return the materialized result as a batch DataFrame."""
    spark = sdf.sparkSession
    name = name or f"_lt_stream_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    # materialize and RELEASE the sink: a memory sink pins its rows in
    # the driver JVM for the session's lifetime, and a verification
    # session that drains dozens of streaming queries accumulates them
    # until a small driver OOMs. Rows round-trip as Row objects with
    # the explicit schema (type- and null-exact); the drained result is
    # small by this helper's contract.
    out = spark.table(name)
    rows = out.collect()
    schema = out.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema=schema)


def run_upsert_stream(
    stream_batch: DataFrame,
    index_path: str,
    family: str,
    timeout_sec: int = 600,
    **upsert_kwargs,
) -> int:
    """CDC-style index maintenance: drain a STREAM of upsert rows into
    a stored index, one :mod:`~linktransformer_spark.operators.upsert`
    call per micro-batch (``foreachBatch`` — the documented Structured
    Streaming recipe for sinks that need batch-only writers). Returns
    the number of non-empty micro-batches applied.

    ``family`` picks the index: ``'ivf'`` / ``'pq'`` / ``'bm25'`` /
    ``'minhash'``; ``upsert_kwargs`` pass through to that family's
    upsert (``vector_col=...``, ``text_col=...``, ...).

    Semantics: micro-batches apply SEQUENTIALLY in stream order
    (Structured Streaming runs one epoch at a time), each under the
    single-writer lock, each with the full upsert contract — in-batch
    duplicate/null/uncastable ids raise and kill the stream. An id
    upserted in two DIFFERENT micro-batches is well-defined: the later
    batch replaces the earlier version (exactly repeated one-call
    upserts). The final index state therefore equals ONE upsert of the
    stream's last-version-per-id rows — for unique-id streams, exactly
    the one-call upsert over the union, so the batch upsert oracles
    check this path end to end.

    Scale note: per-micro-batch work is the upsert's (bounded by the
    batch's affected partitions, never the index), so prefer FEWER,
    FATTER micro-batches — per-epoch fixed costs (lock, meta reads,
    staging swap) amortize over the batch. The trigger is availableNow
    (drain everything, then stop): a production continuous deployment
    would set its own trigger interval upstream; the upsert path is
    identical."""
    from ..operators import upsert as U

    fns = {
        "ivf": U.upsert_ivf_index,
        "pq": U.upsert_pq_index,
        "bm25": U.upsert_bm25_index,
        "minhash": U.upsert_minhash_index,
    }
    if family not in fns:
        raise ValueError(
            f"unknown index family {family!r} — one of {sorted(fns)}"
        )
    fn = fns[family]
    applied = {"n": 0}

    def apply_batch(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        fn(batch_df, index_path, **upsert_kwargs)
        applied["n"] += 1

    q = (
        stream_batch.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    if not finished:
        # unlike a timed-out READ drain (which just returns fewer
        # rows), a timed-out upsert drain has already COMMITTED a
        # prefix of the micro-batches — returning normally would
        # report a partially-applied CDC upsert as success
        raise TimeoutError(
            f"upsert stream did not drain within {timeout_sec}s — "
            f"{applied['n']} micro-batch(es) were already applied to "
            f"{index_path}; the remaining input is NOT applied, and "
            "the stop() may have interrupted an IN-FLIGHT micro-batch "
            "mid-upsert — check the index for a leftover "
            "._lt_upsert_tmp dir / pending-commit journal / stale "
            "._lt_writer_lock marker and repair per the upsert module "
            "docstring before re-running. Re-run with a larger "
            "timeout_sec (re-upserting the same ids is idempotent) or "
            "feed fewer, fatter micro-batches."
        )
    return applied["n"]


def streaming_hourly_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Windowed aggregation with watermark — the streaming twin of the
    batch events_hourly_agg query. Partial aggregation happens in the
    state store per (window, event_type); late rows beyond the
    watermark are dropped in a real run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """First-seen streaming dedup on ``keys``.

    within_watermark=True uses ``dropDuplicatesWithinWatermark`` —
    bounded state, the production setting (keys may re-emit after the
    watermark ages their state out). False = exact global dedup,
    unbounded state, equal to batch DISTINCT over the drained input.
    """
    out = events
    if watermark is not None:
        out = out.withWatermark("ts", watermark)
    if within_watermark:
        return out.dropDuplicatesWithinWatermark(keys).select(*keys)
    return out.dropDuplicates(keys).select(*keys)


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session aggregation via native ``session_window``.

    Output: (user_id, session_start [epoch us], n_events, sum_value).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            "n_events", "sum_value",
        )
    )


def streaming_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    extension seam for stateful logic Spark's built-ins can't express
    (the built-in stateful ops cover windows/sessions/dedup; anything
    else —
    running per-key aggregates with custom emission rules, decaying
    counters, CEP-ish patterns — lands here).

    Demonstrator semantics: per-user RUNNING totals. Each micro-batch
    updates (n_events, sum_value, last_seen_us) in the state store and
    emits the user's new running totals — so the sink sees one row per
    user per batch they appear in, monotonically increasing in
    n_events. ``final_user_stats`` extracts the last emission per user
    from a drained sink.

    Scale properties: state lives in the executor state stores keyed by
    user_id (shuffle on the grouping key, same as any streaming agg);
    the pandas function sees Arrow batches per key group. NoTimeout =
    state kept forever — a production deployment with unbounded key
    cardinality would use ProcessingTimeTimeout + state.remove() for
    idle keys (same function shape, one more branch).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("last_us", LongType()),
    ])

    def fn(key, pdfs, state: "GroupState"):
        n, s, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # sequential float accumulation in input order (pandas .sum
            # is pairwise — order-dependent across batch splits)
            for v in pdf["value"]:
                s += float(v)
            mx = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, mx)
        state.update((n, s, last_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s],
             "last_seen_us": [last_us]}
        )

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def final_user_stats(drained: DataFrame) -> DataFrame:
    """Last emission per user from a drained ``streaming_user_stats``
    sink: n_events is strictly monotone per user, so max_by on it is
    deterministic."""
    return drained.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
        F.max("last_seen_us").alias("last_seen_us"),
    )


def streaming_merge(
    stream_left: DataFrame,
    static_right: DataFrame,
    left_on=None,
    right_on=None,
    model="hash-ngram",
    k: int = 1,
    left_id_col: str | None = None,
    right_id_col: str | None = None,
    **kw,
) -> DataFrame:
    """Real-time semantic record linkage: a STREAM of left rows matched
    against a static reference table — ``lt.merge_knn`` under
    Structured Streaming.

    Plan: the static right side is embedded once and broadcast as a
    numpy index; each Arrow batch of the stream embeds + scores +
    top-k's inside a stateless ``mapInPandas`` stage, and the matched
    right rows re-attach via a stream-static broadcast join. Stateless
    end to end -> append mode, any trigger, no watermark needed. The
    stream must carry its own unique id (``left_id_col``) — a stream
    has no global order to derive one from.
    """
    from ..operators.merge import merge_knn

    return merge_knn(
        stream_left, static_right, left_on=left_on, right_on=right_on,
        model=model, k=k, mode="broadcast_knn",
        left_id_col=left_id_col, right_id_col=right_id_col, **kw,
    )


def _minhash_sig_shingle_stage(
    df: DataFrame, on, id_in: str, id_out: str, sig_out, sh_out: str,
    num_hashes: int, shingle: int, word: bool, with_sig: bool = True,
) -> DataFrame:
    """(id, JVM-lowercased key) -> (id, signature, shingles) via the
    exact-integer Arrow-batch replica (dedup.py_minhash_cols). The
    per-row Column forms are interpreted HOF trees — measured 79s of an
    85s sf0.1 drain; this stage is the same values at expression-free
    speed, and it works identically on streaming and batch frames.
    Word mode ships the JVM-lowercased key (the one Unicode-sensitive
    step — both join sides case-fold the same); char mode ships the
    RAW key, because _shingles char mode never case-folds (pinned by
    the replica-parity property)."""
    from ..functions.serialize import DEFAULT_SEP, serialize_columns
    from ..operators.dedup import py_minhash_cols

    key = serialize_columns([on] if isinstance(on, str) else list(on),
                            DEFAULT_SEP)
    src = df.select(
        F.col(id_in).cast("long").alias(id_out),
        (F.lower(key) if word else key).alias("_kl"),
    )
    cols = [id_out] + ([sig_out] if with_sig else []) + [sh_out]
    schema = ", ".join(
        f"{c} long" if c == id_out
        else f"{c} array<bigint>" if c == sig_out
        else f"{c} array<string>"
        for c in cols
    )

    def gen(batches):
        import pandas as pd

        memo = {}
        for pdf in batches:
            sigs, shs = py_minhash_cols(
                pdf["_kl"].tolist(), num_hashes, shingle, word,
                memo=memo,
            )
            out = {id_out: pdf[id_out].to_numpy()}
            if with_sig:
                out[sig_out] = [list(map(int, s)) for s in sigs]
            out[sh_out] = shs
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=schema)


def _stream_minhash_verify(
    stream_new: DataFrame, s_index: DataFrame, on, id_col: str,
    num_hashes: int, bands: int, shingle: int, word: bool,
    threshold: float,
) -> DataFrame:
    """The stream side + join tail shared by the in-memory and
    stored-index dedup-against forms. ``s_index`` carries one row per
    static band entry: (_dst, band, bsig, _sig_s, _sh_s).

    Stateless by construction: the stream side computes its signature
    with one Arrow-batch stage (no groupBy), bands explode map-only,
    candidates come from a stream-static equi-join on
    (band, band-signature), and the duplicate hit when a pair collides
    in several bands dies row-locally — both full signatures ride
    through the join, so each matched row checks "is my band the FIRST
    where the two signatures agree?" and only that row survives.
    Exact-Jaccard verification compares the two shingle arrays in the
    same row."""
    rows_per_band = num_hashes // bands
    n = _minhash_sig_shingle_stage(
        stream_new, on, id_col, "_src", "_sig_n", "_sh_n",
        num_hashes, shingle, word,
    )
    banded_n = n.select(
        "_src", "_sig_n", "_sh_n",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(F.col("_sig_n"), b * rows_per_band + 1,
                            rows_per_band).alias("bsig"),
                ),
            )
        ).alias("bb"),
    ).select(
        "_src", "_sig_n", "_sh_n",
        F.col("bb.band").alias("band"), F.col("bb.bsig").alias("bsig"),
    )

    hits = banded_n.join(s_index, ["band", "bsig"])
    # row-local de-dup across bands: survive only in the FIRST band
    # where the two signatures agree
    first_band = F.aggregate(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        F.lit(bands).cast("integer"),
        lambda acc, b: F.when(
            (acc < F.lit(bands))
            | ~(
                F.slice(F.col("_sig_n"), b * rows_per_band + 1, rows_per_band)
                == F.slice(F.col("_sig_s"), b * rows_per_band + 1, rows_per_band)
            ),
            acc,
        ).otherwise(b.cast("integer")),
    )
    hits = hits.filter(F.col("band") == first_band)

    inter = F.size(F.array_intersect("_sh_n", "_sh_s"))
    union = F.size("_sh_n") + F.size("_sh_s") - inter
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        hits.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("_src").alias("src"), F.col("_dst").alias("dst"), "jaccard"
        )
    )


def streaming_dedup_against(
    stream_new: DataFrame,
    static_seen: DataFrame,
    on: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 8,
    shingle: int = 3,
    word: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Real-time ingest near-dup alerts: a STREAM of new documents
    MinHash-checked against a static already-ingested corpus. Emits
    (src=new id, dst=seen id, jaccard) for every verified near-dup pair
    — STATELESS end to end (append mode, no watermark, no state store;
    see _stream_minhash_verify for the mechanism).

    Matches near_dup_pairs_minhash_against row-for-row on the same
    inputs (the batch oracle); the static index (bands + signature +
    shingles) is built once per query start and broadcast/scanned as a
    static relation. For a long-running deployment persist it with
    save_minhash_index and use :func:`streaming_dedup_against_index`
    instead — same semantics, no per-start signature rebuild, and
    tombstone deletes honored.
    """
    from ..operators.dedup import _banded_from_sig

    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")

    # static index: (band, bsig, dst id, dst signature, dst shingles).
    # Signatures AND verify shingle arrays come from ONE Arrow-batch
    # replica pass (it computes the shingles to build the signatures
    # anyway); band rows explode from the signature map-only — the
    # previous shape ran the relational signature build AND the Arrow
    # shingle stage (two corpus passes) plus an id join to marry them.
    # Char mode's empty shingle set becomes {''} on BOTH sides,
    # matching the batch _shingle_rows/_verify_jaccard paths row for
    # row (short/empty docs included).
    s_sh = _minhash_sig_shingle_stage(
        static_seen, on, id_col, "_dst", "_sig_s", "_sh_s",
        num_hashes, shingle, word,
    ).localCheckpoint(eager=False)
    sbanded = _banded_from_sig(
        s_sh, bands, num_hashes // bands, id_col="_dst", sig_col="_sig_s"
    ).withColumnRenamed("_dst", "_id")
    if max_bucket_size is not None:
        # static-side hot-bucket guard (drop mode): bounds the join
        # FAN-OUT of every stream row at max_bucket_size candidates per
        # band. Drop-only here — the recall-preserving salt needs both
        # sides' bucket sizes, and a micro-batch's are unknowable at
        # plan time; quantify the static side's loss with
        # dedup.minhash_cap_stats(static_seen, ...) before opting in.
        from ..operators.dedup import _cap_buckets

        sbanded = _cap_buckets(sbanded, ["band", "bsig"], max_bucket_size)
    s_index = sbanded.select(
        F.col("_id").alias("_dst"), "band", "bsig"
    ).join(s_sh, "_dst")
    return _stream_minhash_verify(
        stream_new, s_index, on, id_col, num_hashes, bands, shingle,
        word, threshold,
    )


def streaming_dedup_against_index(
    stream_new: DataFrame,
    index_path: str,
    on: str,
    id_col: str,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """:func:`streaming_dedup_against` with the static side read from a
    :func:`~..operators.dedup.save_minhash_index` directory — the
    long-running production shape: the seen corpus's signatures were
    paid once at ingest, a query (re)start costs only the parquet scan
    (no per-start re-tokenize/re-hash of the seen corpus), appends to
    the index show up at the next restart, and tombstone deletes
    (delete_from_minhash_index) are honored exactly as in the batch
    against-index path — masked before the cap accounting, rows
    identical to running against a filtered rebuild.

    Family parameters come from the index meta (signatures from
    different families must never join). The stored band relation
    carries each doc's per-band signature slices; the full signature
    the row-local first-band dedup needs is reconstructed once at plan
    time with one static-side groupBy (band-sorted flatten — exact,
    because bands partition the signature in band order). Emits
    (src=stream id, dst=indexed id, jaccard); stateless append mode.
    """
    from ..operators.dedup import _cap_buckets, _load_index_meta
    from ..operators.tombstones import anti_tombstones

    spark = stream_new.sparkSession
    meta = _load_index_meta(spark, index_path)
    num_hashes, bands = int(meta["num_hashes"]), int(meta["bands"])
    shingle, word = int(meta["shingle"]), bool(meta["word"])

    bands_rel = spark.read.parquet(f"{index_path}/bands")
    sh_rel = spark.read.parquet(f"{index_path}/shingles")
    # tombstones mask the seen side BEFORE signature reconstruction and
    # cap accounting (no-op without deletes/)
    bands_rel = anti_tombstones(bands_rel, spark, index_path, "_id", "_id")
    sh_rel = anti_tombstones(sh_rel, spark, index_path, "_id", "_id")

    # full signature from the UNCAPPED band rows (a capped doc keeps
    # its complete signature; the cap bounds only the join fan-out —
    # same stance as the in-memory form)
    s_sig = bands_rel.groupBy("_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("band"), F.col("bsig")))
                ),
                lambda x: x["bsig"],
            )
        ).alias("_sig_s")
    )
    s_sh = s_sig.select(F.col("_id").alias("_dst"), "_sig_s").join(
        sh_rel.select(F.col("_id").alias("_dst"), F.col("_sh").alias("_sh_s")),
        "_dst",
    )
    joined = bands_rel
    if max_bucket_size is not None:
        joined = _cap_buckets(joined, ["band", "bsig"], max_bucket_size)
    s_index = joined.select(
        F.col("_id").alias("_dst"), "band", "bsig"
    ).join(s_sh, "_dst")
    return _stream_minhash_verify(
        stream_new, s_index, on, id_col, num_hashes, bands, shingle,
        word, threshold,
    )


def streaming_contamination(
    stream_new: DataFrame,
    static_bench: DataFrame,
    on: str = "text",
    new_id: str = "doc_id",
    bench_id: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Ingest-time benchmark-contamination guard: a STREAM of candidate
    training documents checked for exact n-gram overlap against a
    static held-out benchmark corpus; emits
    (train_id, bench_id, shared_ngrams) per contaminated pair —
    STATELESS end to end (append mode, no state store).

    Execution shape — broadcast-static, join-free: the benchmark side
    is SMALL BY CONTRACT (a held-out eval suite vs a training firehose
    — the same bounded-static contract as broadcast_knn's right side),
    so its inverted gram index (gram -> bench ids) is collected once
    at query definition and closure-shipped; the stream side is ONE
    Arrow-batch Python stage per micro-batch that builds each doc's
    distinct gram set (exact replica of the _ngram_rows rule —
    lowercasing stays JVM-side, the regex classes are explicit ASCII
    sets identical across engines), probes the dict, and emits one
    (train_id, bench_id, shared_ngrams) row per contaminated pair. No
    state store, no shuffle, no join.

    Two earlier formulations were measured and rejected at sf1: a
    per-row Column gram build (interpreted-HOF cliff, 15s of an sf0.1
    drain) and a gram equi-join carrying both sides' full gram arrays
    on every exploded row (~5 KB x ~93 grams per doc through the
    shuffle — 138s at sf1 vs ~9s for the batch twin). This form
    measures ~linear with the stream.

    Matches contamination_pairs row-for-row on the same inputs (the
    batch oracle). The batch op's max_gram_doc_freq cap needs a corpus
    -wide frequency count and so has no stateless streaming form —
    pre-filter the static index instead for a long-running deployment.
    """
    import re as _re
    from collections import defaultdict

    from ..ids import require_integral_id
    from ..operators.corpus import _ngram_rows

    # the emitted schema pins both ids to long; a string id would
    # otherwise cast to null silently (batch contamination_pairs
    # preserves the caller's id types — fail loudly instead of
    # silently diverging from the twin)
    require_integral_id(stream_new, new_id, "streaming_contamination")
    require_integral_id(static_bench, bench_id, "streaming_contamination")

    # bounded collect: (gram, bench_id) rows of the benchmark corpus
    bidx: dict[str, list] = defaultdict(list)
    for r in _ngram_rows(static_bench, on, bench_id, n).collect():
        bidx[r["_lt_gram"]].append(r["_lt_id"])
    bidx = dict(bidx)

    strip_re = _re.compile(r"^[^a-z0-9]+|[^a-z0-9]+$")
    split_re = _re.compile(r"[^a-z0-9]+")
    nn = n

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, bids, cnts = [], [], []
            for tid, lowered in zip(pdf["train_id"], pdf["_kl"]):
                cleaned = strip_re.sub("", lowered or "")
                toks = split_re.split(cleaned)
                if not (toks and toks[0] != "" and len(toks) >= nn):
                    continue
                grams = dict.fromkeys(
                    " ".join(toks[i : i + nn])
                    for i in range(len(toks) - nn + 1)
                )
                shared: dict = {}
                for g in grams:
                    for b in bidx.get(g, ()):
                        shared[b] = shared.get(b, 0) + 1
                for b, c in shared.items():
                    ids.append(tid)
                    bids.append(b)
                    cnts.append(c)
            if ids:  # empty frames infer float64 columns Arrow rejects
                yield pd.DataFrame(
                    {
                        "train_id": ids,
                        "bench_id": bids,
                        "shared_ngrams": cnts,
                    }
                )

    return stream_new.select(
        F.col(new_id).cast("long").alias("train_id"),
        F.lower(F.col(on)).alias("_kl"),
    ).mapInPandas(
        gen, schema="train_id long, bench_id long, shared_ngrams long"
    )


def streaming_semdedup_against(
    stream_new: DataFrame,
    static_corpus: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_cells: int | str = "auto",
) -> DataFrame:
    """Ingest-time SEMANTIC near-dup alerts: a stream of new embedding
    rows checked against a static corpus, SemDeDup-style (cell-blocked
    cosine — see operators/dedup.near_dup_pairs_semdedup). Emits
    (src=new id, dst=corpus id, cell, cosine) per hit; STATELESS
    (append mode, no watermark, no state store).

    How it stays stateless: the corpus's seeded centroids are collected
    ONCE at query definition (bounded — n_cells rows) and the stream
    side's normalize + cell assignment run per Arrow batch in numpy
    with the SAME sequential-fold float order as the declarative
    S.l2_normalize/S.dot (dots accumulated dimension-by-dimension, no
    BLAS; first-max argmax == the batch window's `dot DESC, cell ASC`
    tie-break) — bit-identical cell choices and vector doubles. An
    earlier per-row Column formulation (array of n_cells fold dots) was
    an interpreted-HOF cliff: n_cells GROWS with the corpus under
    'auto', so per-row cost was O(n_cells * dim) interpreted steps —
    super-linear end to end (same cliff, same fix as the streaming
    minhash signature). Candidates come from a stream-static equi-join
    on `cell` against the corpus's precomputed single-probe assignment;
    the cosine filter is the row-local JVM fold (oracle-exact).
    Shuffle volume scales with cell collisions, never
    |stream| x |corpus|.
    """
    import numpy as np

    from ..functions import similarity as S
    from ..ids import require_integral_id
    from ..operators.ann import (
        _assign_cells_declarative, ivf_seed_centroids, resolve_n_cells,
    )

    # both sides' ids coerce to long (stream side numpy int64, static
    # side a non-ANSI Column cast) — a string id would error opaquely
    # on an executor or null out silently; fail loudly at definition
    require_integral_id(stream_new, id_col, "streaming_semdedup_against")
    require_integral_id(static_corpus, id_col,
                        "streaming_semdedup_against")
    c = static_corpus.select(
        F.col(id_col).cast("long").alias("_dst"),
        S.l2_normalize(F.col(vector_col)).alias("_cv"),
    )
    n_cells = resolve_n_cells(n_cells, static_corpus.count)
    cent_df = ivf_seed_centroids(c, "_dst", "_cv", n_cells)
    static_assigned = _assign_cells_declarative(c, "_dst", "_cv", cent_df, 1)
    cents = sorted(
        (r["cell"], list(r["_cent_emb"])) for r in cent_df.collect()
    )
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    # seeded centroid ids are 0..n_cells-1 in order, so numpy's
    # first-max argmax IS the (dot DESC, cell ASC) tie-break
    assert [cid for cid, _ in cents] == list(range(len(cents)))
    dim = cmat.shape[1]
    vc, ic = vector_col, id_col

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vc].tolist(), dtype=np.float64)
            acc = np.zeros(len(v))
            for i in range(dim):
                acc = acc + v[:, i] * v[:, i]
            nrm = np.maximum(np.sqrt(acc), 1e-12)
            vn = v / nrm[:, None]
            dots = np.zeros((len(v), len(cents)))
            for i in range(dim):
                dots = dots + vn[:, i : i + 1] * cmat[:, i][None, :]
            yield pd.DataFrame(
                {
                    "_src": pdf[ic].to_numpy(dtype=np.int64),
                    "cell": dots.argmax(1).astype(np.int32),
                    "_nv": list(vn),
                }
            )

    n = stream_new.select(ic, vc).mapInPandas(
        assign, schema="_src long, cell int, _nv array<double>"
    )
    hits = (
        n.join(static_assigned, "cell")
        .withColumn("cosine", S.dot(F.col("_nv"), F.col("_cv")))
        .filter(F.col("cosine") >= threshold)
    )
    return hits.select(
        F.col("_src").alias("src"), F.col("_dst").alias("dst"), "cell", "cosine"
    )


def streaming_trending(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming half of the trending dashboard: per-(tumbling window,
    event type) counts maintained in the state store, watermark-bounded
    (windows older than the watermark finalize and evict). Tumbling
    windows align to the epoch, so the buckets equal the batch
    ``trending`` operator's ``floor(epoch/W)`` buckets exactly.

    Emits (``window_start`` epoch-seconds bucket, ``event_type``,
    ``n``). Rank/lift need the final count of EVERY window, so they are
    a drain-time finalizer (:func:`final_trending`) — same split as
    ``streaming_user_stats`` / ``final_user_stats``. In production the
    counts stream feeds the dashboard store continuously and the
    finalizer runs over any time slice of it.
    """
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{window_seconds} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.unix_micros(F.col("w.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("_w_sec"),
            "event_type",
            "n",
        )
    )


def final_trending(
    drained: DataFrame, window_seconds: int = 3600, k: int = 5
) -> DataFrame:
    """Rank + lift over a drained :func:`streaming_trending` sink.
    Update-mode sinks emit a (window, type) row once per micro-batch it
    grew in; n is strictly monotone per key, so max() recovers the
    final count. Output matches the batch ``trending`` operator
    column-for-column."""
    from pyspark.sql import Window

    counts = drained.groupBy(
        F.col("_w_sec").alias("_wsec"), "event_type"
    ).agg(F.max("n").alias("n"))
    w = (F.col("_wsec") / F.lit(window_seconds)).cast("long")
    counts = counts.select(w.alias("_w"), "event_type", "n")
    lag_w = Window.partitionBy("event_type").orderBy(F.col("_w").asc())
    rank_w = Window.partitionBy("_w").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    prev = F.lag(F.struct(F.col("_w").alias("w"), F.col("n").alias("n"))).over(lag_w)
    return (
        counts.withColumn(
            "_lift",
            F.when(
                prev["w"] == F.col("_w") - 1,
                F.round(F.col("n").cast("double") / prev["n"].cast("double"), 6),
            ),
        )
        .withColumn("_r", F.row_number().over(rank_w))
        .filter(F.col("_r") <= k)
        .select(
            F.timestamp_seconds(F.col("_w") * window_seconds).alias("window_start"),
            "event_type",
            "n",
            F.col("_r").cast("int").alias("rank"),
            F.col("_lift").alias("lift"),
        )
    )


def final_volume_anomaly(
    drained: DataFrame,
    window_seconds: int = 3600,
    trailing: int = 24,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing z-score anomaly pass over a drained
    :func:`streaming_trending` counts sink — the streaming deployment
    of ``eventpipe.volume_anomaly``: the state store maintains the
    (window, type) counts continuously; this finalizer (or any
    downstream consumer of the counts stream) scores each window
    against its trailing history. Matches the batch operator
    column-for-column."""
    from ..operators.eventpipe import volume_anomaly  # noqa: F401  (contract)
    from pyspark.sql import Window

    counts = drained.groupBy(
        F.col("_w_sec").alias("_wsec"), "event_type"
    ).agg(F.max("n").alias("n"))
    w = (F.col("_wsec") / F.lit(window_seconds)).cast("long")
    counts = counts.select(w.alias("_w"), "event_type", "n")
    frame = (
        Window.partitionBy("event_type")
        .orderBy(F.col("_w").asc())
        .rowsBetween(-trailing, -1)
    )
    s1 = F.sum("n").over(frame)
    s2 = F.sum(F.col("n") * F.col("n")).over(frame)
    cnt = F.count("n").over(frame)
    mean = s1.cast("double") / cnt.cast("double")
    var = (
        s2.cast("double") - s1.cast("double") * s1.cast("double") / cnt.cast("double")
    ) / cnt.cast("double")
    z = F.when(
        (cnt >= 2) & (var > 0),
        (F.col("n").cast("double") - mean) / F.sqrt(var),
    )
    flat_dev = (cnt >= 2) & (var == F.lit(0.0)) & (
        F.col("n").cast("double") != mean
    )
    return (
        counts.withColumn("_c", cnt)
        .withColumn("mean_n", F.when(cnt >= 1, F.round(mean, 6)))
        .withColumn("z", F.round(z, 6))
        .withColumn("_flat_dev", flat_dev)
        .select(
            F.timestamp_seconds(F.col("_w") * window_seconds).alias("window_start"),
            "event_type",
            "n",
            "mean_n",
            "z",
            (
                F.coalesce(
                    F.abs(F.col("z")) > F.lit(float(z_threshold)), F.lit(False)
                )
                | F.coalesce(F.col("_flat_dev"), F.lit(False))
            ).alias("is_anomaly"),
        )
    )


def streaming_attach_candidates(
    stream_new: DataFrame,
    registry: DataFrame,
    on,
    id_col: str,
    sim_threshold: float,
    registry_key: str = "key",
    registry_entity: str = "entity_id",
    blocking_vars: list | None = None,
    model: str = "levenshtein",
    blocking: str = "exact",
    n_planes: int = 8,
    lsh_dim: int = 64,
    prune_topk: int | None = None,
) -> DataFrame:
    """Streaming incremental entity resolution, candidate stage: a
    STREAM of new records scored against a static entity registry
    (the :func:`~..operators.entity.attach_to_entities` ingest shape
    at streaming latency). Emits one row per (record, entity) match at
    or above ``sim_threshold`` — STATELESS (stream-static equi-join on
    the blocking key or LSH bucket + a row-local score filter; append
    mode, no state store).

    Picking the single BEST entity per record needs all of a record's
    candidates together — cross-row work a stateless append stream
    cannot do — so ranking happens post-drain with
    :func:`final_attach`, the same candidates-then-finalize split as
    :func:`streaming_ann_against_index` / :func:`final_ann_topk`.
    ``blocking='lsh'`` requires an explicit ``n_planes`` int here
    ('auto' sizes from a corpus count, and a stream has none).

    ``prune_topk`` bounds the drained sink at records x prune_topk
    rows: without it the sink is one row per (record, entity) match,
    so a HOT registry block (thousands of entities sharing a blocking
    key or LSH bucket) inflates the drain linearly in the block size
    (measured: tools/attach_fanout_sweep.py). The prune keeps each
    record's top rows under EXACTLY :func:`final_attach`'s selection
    order (score DESC, entity ASC, matched_key ASC), so the final
    best-entity pick is bit-identical for any ``prune_topk >= 1`` —
    the :func:`_prune_candidate_topk` contract with the attach
    tie-break. Same caveat as the other pruned serves: each record id
    must appear in ONE stream row."""
    from ..ids import require_integral_id
    from ..operators.entity import _norm_blocking, _sides

    if not -1.0 <= sim_threshold <= 1.0:
        raise ValueError("sim_threshold must be within [-1, 1]")
    # same guard as the batch twin: a string id would cast to null
    # (non-ANSI) and silently collapse records — schema-only check,
    # streaming-safe
    require_integral_id(stream_new, id_col, "streaming_attach_candidates")
    require_integral_id(registry, registry_entity,
                        "streaming_attach_candidates")
    if blocking not in ("exact", "lsh"):
        raise ValueError(f"unknown blocking {blocking!r}; use exact|lsh")
    if blocking == "lsh":
        if blocking_vars:
            raise ValueError(
                "blocking='lsh' and blocking_vars are mutually exclusive"
            )
        if not isinstance(n_planes, int) or n_planes < 1:
            raise ValueError(
                "streaming attach needs an explicit n_planes int "
                "(no corpus count to resolve 'auto' against)"
            )
    for lc, rc in _norm_blocking(blocking_vars):
        if lc not in stream_new.columns:
            raise ValueError(f"blocking var {lc!r} not in stream frame")
        if rc not in registry.columns:
            raise ValueError(f"blocking var {rc!r} not in registry frame")
    left, right = _sides(
        stream_new, registry, on, registry_key, id_col, registry_entity,
        blocking_vars,
    )
    need_emb = model == "hash-ngram" or blocking == "lsh"
    if need_emb:
        from ..encoders.hash_ngram import HashNgramEncoder

        enc = HashNgramEncoder(dim=lsh_dim)
        left = enc.encode(left, "_lkey", "_lemb")
        right = enc.encode(right, "_rkey", "_remb")
    if model == "levenshtein":
        from ..functions.similarity import lev_sim

        score = lev_sim(F.col("_lkey"), F.col("_rkey"))
    elif model == "hash-ngram":
        from ..functions.similarity import dot

        score = dot(F.col("_lemb"), F.col("_remb"))
    else:
        raise ValueError(f"unknown model {model!r}; use levenshtein|hash-ngram")
    if blocking == "lsh":
        from ..operators.ann import hyperplane_bucket

        left = left.withColumn(
            "_bkt", hyperplane_bucket("_lemb", lsh_dim, n_planes)
        )
        right = right.withColumn(
            "_bkt", hyperplane_bucket("_remb", lsh_dim, n_planes)
        )
        cand = left.join(right, "_bkt")
    elif blocking_vars:
        cand = left.join(
            right, [f"_b{i}" for i in range(len(blocking_vars))]
        )
    else:
        cand = left.crossJoin(right)
    out = (
        cand.withColumn("score", score)
        .filter(F.col("score") >= F.lit(sim_threshold))
        .select(
            F.col("_lid").alias("record_id"),
            F.col("_lkey").alias("key"),
            F.col("_rid").alias("entity_id"),
            F.col("_rkey").alias("matched_key"),
            "score",
        )
    )
    if prune_topk is None:
        return out
    return _prune_attach_topk(out, prune_topk)


def _prune_attach_topk(cands: DataFrame, topn: int) -> DataFrame:
    """:func:`_prune_candidate_topk`'s attach twin: per-record exact
    top-``topn`` under the :func:`final_attach` selection order
    (score DESC, entity ASC, matched_key ASC). The ``record_id``
    repartition co-locates each record's candidates, so the kept rows
    are the global top-``topn`` per record and the post-drain rank-1
    pick is bit-identical for any ``topn >= 1``. Pandas sort (stable
    mergesort over the full tie-break) instead of the ANN pruner's
    numpy lexsort because ``matched_key`` is a string column."""
    if topn < 1:
        raise ValueError("prune_topk must be >= 1")

    order_cols = ["record_id", "score", "entity_id", "matched_key"]
    ascending = [True, False, True, True]

    def prune(batches):
        import pandas as pd

        def topsel(df):
            # na_position='first' pins the matched_key tie-break to
            # final_attach's Spark window order (asc NULLS FIRST) —
            # pandas defaults NaN last, which would diverge the pruned
            # top-1 on a null-matched_key tie. Unreachable via the
            # equi-join/LSH paths today (keys non-null) but pinned so
            # the bit-identical contract holds for any candidate
            # source. score/entity_id are non-null by construction, so
            # the flag cannot reorder those columns.
            return (
                df.sort_values(order_cols, ascending=ascending,
                               kind="mergesort", na_position="first")
                .groupby("record_id", sort=False)
                .head(topn)
            )

        pieces = [topsel(pdf) for pdf in batches if len(pdf)]
        pieces = [p for p in pieces if len(p)]
        if pieces:
            out = topsel(pd.concat(pieces, ignore_index=True))
            if len(out):
                yield out

    return cands.repartition("record_id").mapInPandas(
        prune, schema=cands.schema
    )


def final_attach(drained: DataFrame, new_records: DataFrame,
                 on, id_col: str) -> DataFrame:
    """Rank a drained :func:`streaming_attach_candidates` sink to the
    batch :func:`~..operators.entity.attach_to_entities` output shape:
    one row per NEW record, best entity by (score DESC, entity ASC,
    matched_key ASC), NULLs for unmatched — ``new_records`` (the batch
    view of the streamed input) supplies the unmatched rows the
    candidate sink never saw."""
    from pyspark.sql import Window

    from ..functions.serialize import serialize_columns

    w = Window.partitionBy("record_id").orderBy(
        F.col("score").desc(), F.col("entity_id").asc(),
        F.col("matched_key").asc(),
    )
    best = (
        drained.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("record_id", "entity_id", "matched_key", "score")
    )
    base = new_records.select(
        F.col(id_col).cast("long").alias("record_id"),
        serialize_columns(
            [on] if isinstance(on, str) else list(on)
        ).alias("key"),
    )
    return base.join(best, "record_id", "left").select(
        "record_id", "key", "entity_id", "matched_key", "score"
    )


def _prune_candidate_topk(cands: DataFrame, topn: int) -> DataFrame:
    """Per-query exact top-``topn`` prune over a ROW-LOCAL-scored
    candidate relation (query_id, neighbor_id, score) — bounds a
    streaming serve's sink at queries x topn rows without changing any
    final top-k with k <= topn: selection order (score DESC,
    neighbor_id ASC) is exactly the drain finalizer's window order, so
    every dropped row has >= topn rows strictly preferred in its own
    scope and can never enter the global top-k. Scores pass through
    untouched (Arrow round-trip is exact), so the drain stays
    bit-identical. Per-Arrow-batch pre-prune + one partition-level
    reduce keeps the stage's memory at ~topn rows per query per
    partition (the PQ path's accumulate-pruned shape); the
    ``query_id`` repartition is the one stateless exchange, carrying
    narrow rows only."""
    if topn < 1:
        raise ValueError("prune_topk must be >= 1")

    def prune(batches):
        import numpy as np
        import pandas as pd

        def topsel(df):
            q = df["query_id"].to_numpy(dtype=np.int64)
            s = df["score"].to_numpy(dtype=np.float64)
            n_ = df["neighbor_id"].to_numpy()
            order = np.lexsort((n_, -s, q))
            qs_ = q[order]
            keep = []
            start = 0
            m = len(order)
            for i in range(1, m + 1):
                if i == m or qs_[i] != qs_[start]:
                    keep.append(order[start:start + min(topn, i - start)])
                    start = i
            if not keep:
                return df.iloc[:0]
            return df.iloc[np.concatenate(keep)]

        pieces = [topsel(pdf) for pdf in batches if len(pdf)]
        pieces = [p for p in pieces if len(p)]
        if pieces:
            out = topsel(pd.concat(pieces, ignore_index=True))
            if len(out):
                yield out

    return cands.repartition("query_id").mapInPandas(
        prune, schema=cands.schema
    )


def streaming_ann_against_index(
    spark: SparkSession,
    stream_queries: DataFrame,
    index_path: str,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    n_probe: int = 4,
    prune_topk: int | None = None,
) -> DataFrame:
    """Real-time semantic search: a STREAM of query vectors probed
    against a :func:`~linktransformer_spark.operators.ann.save_ivf_index`
    directory — scored candidates out, STATELESS end to end (append
    mode, no watermark, no state store).

    How it stays stateless: the batch path's cell assignment uses a
    rank window (unsupported on streams); here each Arrow batch
    assigns cells in numpy with the SAME sequential-fold float order
    as the declarative fold (dots accumulated dimension-by-dimension,
    ties (dot DESC, cell ASC) via exact sorting) — bit-identical cell
    choices, so the drained candidates + :func:`final_ann_topk` equal
    the batch ``ann_topk_ivf_indexed`` row for row, and the same SQL
    oracle checks both. Candidates come from a stream-static equi-join
    on cell; scoring is the usual expression dot.

    Scale note: a stream-static join re-reads the static side per
    micro-batch and cannot partition-prune on cells it has not seen —
    persist the cells relation hot (or restrict to a known cell
    domain) for high-frequency triggers.

    ``prune_topk`` bounds the drained sink at queries x prune_topk
    rows (instead of queries x probed-cell rows — linear in the corpus
    at a fixed probe fraction) via :func:`_prune_candidate_topk`; the
    final :func:`final_ann_topk` (k <= prune_topk) is bit-identical.
    Requires each query id to appear in ONE stream row (a duplicate
    would prune against partial candidate sets — the same documented
    contract as the BM25 and PQ serves). :func:`final_ann_topk`
    mitigates the un-pruned duplicate case by collapsing identical
    (query, neighbor, score) rows before ranking, so a duplicated id
    degrades to partial candidates, never duplicate ranks.
    """
    import numpy as np

    from ..functions import similarity as S
    from ..operators import knn_join as KJ
    from ..operators.ann import _read_ivf_meta

    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    meta = _read_ivf_meta(spark, index_path)
    cent_rows = sorted(
        (r["cell"], list(r["centroid"]))
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    )
    cmat = np.array([v for _, v in cent_rows], dtype=np.float64)
    cids = [c for c, _ in cent_rows]
    npb = min(n_probe, len(cids))
    dim = cmat.shape[1]

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("_qid", LongType()),
        StructField("cell", IntegerType()),
        StructField("_qv", ArrayType(DoubleType())),
    ])
    vc, qc = vector_col, query_id

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vc].tolist(), dtype=np.float64)
            # sequential-fold L2 norm + dots: same left-assoc float
            # order as S.l2_normalize / S.dot (no BLAS)
            acc = np.zeros(len(v))
            for i in range(dim):
                acc = acc + v[:, i] * v[:, i]
            nrm = np.maximum(np.sqrt(acc), 1e-12)
            vn = v / nrm[:, None]
            dots = np.zeros((len(v), len(cids)))
            for i in range(dim):
                dots = dots + vn[:, i : i + 1] * cmat[:, i][None, :]
            rows = {"_qid": [], "cell": [], "_qv": []}
            for r in range(len(v)):
                order = sorted(
                    range(len(cids)), key=lambda j: (-dots[r, j], cids[j])
                )[:npb]
                for j in order:
                    rows["_qid"].append(int(pdf[qc].iloc[r]))
                    rows["cell"].append(int(cids[j]))
                    rows["_qv"].append(list(vn[r]))
            yield pd.DataFrame(rows)

    assigned = stream_queries.select(query_id, vector_col).mapInPandas(
        assign, schema=out_schema
    )
    stored = spark.read.parquet(f"{index_path}/cells").select(
        "cell",
        F.col(str(meta["id_col"])).alias("neighbor_id"),
        F.col(str(meta["vector_col"])).alias("_cv"),
    )
    # honor the index's tombstones (delete_from_ivf_index), same as the
    # batch serve path — deleted vectors never become candidates
    from ..operators.tombstones import anti_tombstones

    stored = anti_tombstones(
        stored, spark, index_path, "neighbor_id", str(meta["id_col"])
    )
    cands = (
        assigned.join(stored, "cell")
        .withColumn("score", S.dot(F.col("_qv"), F.col("_cv")))
        .select(F.col("_qid").alias("query_id"), "neighbor_id", "score")
    )
    if prune_topk is None:
        return cands
    return _prune_candidate_topk(cands, prune_topk)


def final_ann_topk(drained: DataFrame, k: int = 10) -> DataFrame:
    """Top-k rank over a drained :func:`streaming_ann_against_index`
    candidate sink — (query_id, neighbor_id, rank, score), the batch
    ``ann_topk_ivf_indexed`` output shape.

    A query id arriving in TWO stream rows (same vector — different
    vectors raise upstream) drains its candidate set twice; without a
    dedup the identical rows would occupy multiple rank slots and
    corrupt that query's top-k. Identical (query, neighbor, score)
    triples collapse exactly (the ``final_bm25_topk`` stance); under
    ``prune_topk`` a duplicated id degrades to partial candidates
    rather than duplicate ranks."""
    from pyspark.sql import Window

    drained = drained.dropDuplicates(["query_id", "neighbor_id", "score"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        drained.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "score",
        )
    )


# "step not yet fired" sentinel for the streaming funnel's fire-time
# arrays: Spark's state/output row decoder rejects NULL array elements
# (EXPRESSION_DECODING_FAILED), so unreached steps carry this value
# inside the stream and convert to real NULLs at finalization. Far
# below any representable epoch-micros timestamp.
_FUNNEL_UNSET = -(1 << 62)


def streaming_funnel_steps(
    events: DataFrame,
    steps,
    *,
    within: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming strict-order funnel: per-user fire-time state via
    ``applyInPandasWithState`` — the real-time twin of the batch
    ``eventpipe.funnel_user_steps`` (same recursive-min-join
    semantics; the Python fold mirrors the JVM expression fold
    comparison-for-comparison on integer epoch-micros, so results are
    engine-exact, no floats anywhere).

    Each micro-batch updates (events-seen counter, array of k fire
    times) per user and emits the user's current row; fire times never
    change once set. ``final_funnel_users`` extracts the last emission
    per user from a drained sink.

    Ordering contract: events are folded in (ts, step) order WITHIN a
    batch (sorted here), and the incremental fold is exact when
    batches arrive in event-time order per user — the log-stream norm;
    a drain with ``availableNow`` over one file is a single batch and
    therefore always exact. An out-of-order event older than an
    already-folded one can fire a step later than the batch
    re-computation would — the same contract as every incremental
    funnel; replay/backfill through the batch operator when ingestion
    is not time-ordered.

    Scale: state is O(k) longs per user (no event buffering — the
    streaming state replaces the batch operator's capped collect); the
    shuffle is the standard state-store hash on the user key. Filter
    the stream to funnel step types upstream so the state store only
    sees funnel users.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType,
    )

    from ..operators.eventpipe import _validate_steps

    steps = _validate_steps(steps)
    k = len(steps)
    idx_map = {s: i for i, s in enumerate(steps)}
    within_us = None if within is None else int(round(within * 1_000_000))

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_seen", LongType()),
        StructField("fires", ArrayType(LongType())),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("fires", ArrayType(LongType())),
    ])
    tc, uc = type_col, ts_col
    unset = _FUNNEL_UNSET  # null array elements fail state-row decoding

    def fn(key, pdfs, state: "GroupState"):
        if state.exists:
            n, fires = state.get
            fires = list(fires)
        else:
            n, fires = 0, [unset] * k
        rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_us = pdf[uc].astype("int64") // 1000
            for t, et in zip(ts_us, pdf[tc]):
                si = idx_map.get(et)
                if si is not None:
                    rows.append((int(t), si))
        rows.sort()  # (ts, step) ascending — the batch fold's order
        for t, si in rows:
            if fires[si] != unset:
                continue
            if si > 0 and fires[si - 1] == unset:
                continue
            if within_us is not None and si > 0 and (
                fires[0] == unset or t > fires[0] + within_us
            ):
                continue
            fires[si] = t
        n += len(rows)
        state.update((n, fires))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_seen": [n], "fires": [fires]}
        )

    filtered = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"), F.col(ts_col), F.col(type_col)
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def final_funnel_users(drained: DataFrame, steps) -> DataFrame:
    """Batch ``funnel_user_steps`` shape from a drained
    :func:`streaming_funnel_steps` sink: last emission per user
    (``n_seen`` is strictly monotone), step-1 completers only,
    ``t_1..t_k`` timestamps."""
    k = len(list(steps))
    last = drained.groupBy("user_id").agg(
        F.max_by("fires", "n_seen").alias("_f")
    )
    fire = lambda i: F.when(  # noqa: E731 — sentinel -> NULL
        F.col("_f")[i] != F.lit(_FUNNEL_UNSET),
        F.timestamp_micros(F.col("_f")[i]),
    )
    return last.filter(F.col("_f")[0] != F.lit(_FUNNEL_UNSET)).select(
        "user_id",
        *[fire(i).alias(f"t_{i + 1}") for i in range(k)],
    )


def final_funnel_summary(drained: DataFrame, steps) -> DataFrame:
    """Batch ``funnel`` summary from a drained streaming funnel sink —
    the same summarize tail the batch operator uses."""
    from ..operators.eventpipe import summarize_funnel_users

    return summarize_funnel_users(final_funnel_users(drained, steps), steps)


def streaming_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming first-order Markov transitions: per-user O(1) state
    (the LAST event only) via ``applyInPandasWithState`` — the live
    "what do users do next" feed behind `transition_matrix`.

    Each micro-batch sorts the user's new events by (ts, tiebreak),
    prepends the stored last event, and emits one (from_type, to_type)
    row per consecutive pair — exactly the batch lead-window pairs
    when batches arrive in event-time order per user (the funnel's
    ordering contract; a single-batch drain is always exact).
    ``final_transitions`` aggregates a drained sink into the batch
    operator's (from_type, to_type, n, p) table.

    ``tiebreak_col`` must be an integral column (e.g. the event id):
    it rides the state row as a long and pins simultaneous events with
    the same numeric order the batch window uses.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StringType, StructField, StructType, LongType

    out_schema = StructType([
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
    ])
    state_schema = StructType([
        StructField("last_ts", LongType()),
        StructField("last_tb", LongType()),
        StructField("last_type", StringType()),
    ])
    tc, uc, bc = type_col, ts_col, tiebreak_col

    def fn(key, pdfs, state: "GroupState"):
        prev = state.get if state.exists else None
        rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_us = pdf[uc].astype("int64") // 1000
            for t, tb, et in zip(ts_us, pdf[bc], pdf[tc]):
                rows.append((int(t), int(tb), str(et)))
        rows.sort()
        if prev is not None:
            rows.insert(0, (int(prev[0]), int(prev[1]), str(prev[2])))
        if len(rows) >= 2:
            yield pd.DataFrame({
                "from_type": [a[2] for a in rows[:-1]],
                "to_type": [b[2] for b in rows[1:]],
            })
        last = rows[-1]
        state.update((last[0], last[1], last[2]))

    filtered = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
        F.col(tiebreak_col).cast("long").alias(tiebreak_col),
        F.col(type_col).cast("string").alias(type_col),
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def final_transitions(drained: DataFrame, min_count: int = 1) -> DataFrame:
    """Batch ``transition_matrix`` table from a drained
    :func:`streaming_transitions` pair sink: pair hash agg +
    conditional probability over the bounded |types|^2 relation."""
    from pyspark.sql import Window

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    counts = drained.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return (
        counts.withColumn("_t", F.sum("n").over(tot))
        .filter(F.col("n") >= min_count)
        .select(
            "from_type", "to_type", "n",
            F.round(
                F.col("n").cast("double") / F.col("_t").cast("double"), 6
            ).alias("p"),
        )
    )


def streaming_attribution(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types,
    model: str = "last_touch",
    lookback_seconds: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming conversion attribution: O(1) per-user state (the
    last touch and the first touch) via ``applyInPandasWithState`` —
    each conversion emits one credited ``touch_type`` row (null when
    unattributed under the model/lookback). Same models and semantics
    as the batch ``eventpipe.attribution`` (touches strictly before
    the conversion in (ts, tiebreak) order); exact batch parity under
    event-time-ordered arrival, always exact for a single-batch drain.
    ``final_attribution`` rolls a drained sink into the report."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    touches = list(touch_types)
    if not touches:
        raise ValueError("touch_types must be non-empty")
    if conversion_type in touches:
        raise ValueError("conversion_type cannot also be a touch type")
    if model not in ("last_touch", "first_touch"):
        raise ValueError(f"unknown model {model!r}; use last_touch|first_touch")
    if model == "first_touch" and lookback_seconds is not None:
        raise ValueError("first_touch has no lookback (original-source model)")
    lookback_us = (
        None if lookback_seconds is None
        else int(round(lookback_seconds * 1_000_000))
    )
    unset = _FUNNEL_UNSET

    out_schema = StructType([StructField("touch_type", StringType())])
    state_schema = StructType([
        StructField("tt", StringType()), StructField("tts", LongType()),
        StructField("ft", StringType()), StructField("fts", LongType()),
    ])
    tc, uc, bc = type_col, ts_col, tiebreak_col
    conv, touch_set = conversion_type, set(touches)

    def fn(key, pdfs, state: "GroupState"):
        if state.exists:
            tt, tts, ft, fts = state.get
        else:
            tt, tts, ft, fts = "", unset, "", unset
        rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_us = pdf[uc].astype("int64") // 1000
            for t, tb, et in zip(ts_us, pdf[bc], pdf[tc]):
                rows.append((int(t), int(tb), str(et)))
        rows.sort()
        credited = []
        for t, _tb, et in rows:
            if et == conv:
                c_t, c_ts = (tt, tts) if model == "last_touch" else (ft, fts)
                ok = c_ts != unset and (
                    lookback_us is None or t - c_ts <= lookback_us
                )
                credited.append(c_t if ok else None)
            elif et in touch_set:
                tt, tts = et, t
                if fts == unset:
                    ft, fts = et, t
        state.update((tt, tts, ft, fts))
        if credited:
            yield pd.DataFrame({"touch_type": credited})

    filtered = events.filter(
        F.col(type_col).isin(touches + [conversion_type])
    ).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
        F.col(tiebreak_col).cast("long").alias(tiebreak_col),
        F.col(type_col).cast("string").alias(type_col),
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def final_attribution(drained: DataFrame) -> DataFrame:
    """Attribution report from a drained :func:`streaming_attribution`
    sink — the batch operator's rollup tail (bounded touch-type
    domain, 1-row totals broadcast)."""
    rolled = drained.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )
    totals = rolled.agg(F.sum("n_conversions").cast("long").alias("_tot"))
    return rolled.crossJoin(F.broadcast(totals)).select(
        "touch_type",
        F.col("n_conversions").cast("long").alias("n_conversions"),
        F.round(
            F.col("n_conversions").cast("double") / F.col("_tot").cast("double"),
            6,
        ).alias("frac"),
    )


def streaming_retention_activity(
    events: DataFrame,
    *,
    period: str = "day",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming half of cohort retention: first-seen (user, period)
    activity rows via streaming dedup — the incremental upsert that
    makes retention maintainable on a live stream (the batch
    operator's DISTINCT, kept in the state store; every downstream
    retention quantity derives from this relation by a bounded
    rollup).

    Emits one append-mode row per NEW (user, period) pair. State is
    bounded by |users| x |periods| with exact dedup; pass
    ``watermark`` + ``within_watermark=True`` for watermark-bounded
    state in production (periods older than the delay age out — exact
    as long as events for a period arrive within it).
    ``final_retention`` rolls a drained sink into the cohort table.
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day|week|month")
    p = F.date_trunc(period, F.col(ts_col).cast("timestamp")).cast("date")
    out = events.select(F.col(user_col).alias("user_id"), p.alias("p"))
    if watermark is not None:
        # watermark attaches to the pre-projection ts; re-project after
        out = (
            events.withWatermark(ts_col, watermark)
            .select(F.col(user_col).alias("user_id"), p.alias("p"))
        )
    if within_watermark:
        if watermark is None:
            raise ValueError("within_watermark=True needs a watermark")
        return out.dropDuplicatesWithinWatermark(["user_id", "p"])
    return out.dropDuplicates(["user_id", "p"])


def final_retention(
    drained: DataFrame,
    *,
    period: str = "day",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention table from a drained
    :func:`streaming_retention_activity` sink — the batch
    ``eventpipe.retention`` tail over the (already-distinct) activity
    relation, column-for-column equal to the batch operator."""
    from ..operators.eventpipe import retention

    return retention(
        drained.select("user_id", F.col("p").cast("timestamp").alias("ts")),
        period=period, max_offset=max_offset,
    )


def streaming_ab_counts(
    events: DataFrame,
    *,
    variant_col: str,
    flag_col: str,
    by: str | None = None,
) -> DataFrame:
    """Streaming half of the A/B readout: per-(group, variant)
    exposure and conversion counts maintained in the state store —
    the experiment dashboard's live counters. Unwindowed running
    totals (no watermark: an experiment readout wants ALL exposures);
    state is bounded by |groups| x |variants|."""
    grp = ([F.col(by)] if by is not None else []) + [F.col(variant_col)]
    return events.groupBy(*grp).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(flag_col).cast("long")).alias("conv"),
    )


def final_ab_test(
    drained: DataFrame,
    *,
    variant_col: str,
    control: str,
    treatment: str,
    by: str | None = None,
    z_threshold: float = 1.959963984540054,
) -> DataFrame:
    """Two-proportion z readout over a drained
    :func:`streaming_ab_counts` sink (update mode re-emits a counter
    row per micro-batch it grew in; counts are monotone, so max
    recovers the final value). Matches the batch
    ``eventpipe.ab_test`` column for column."""
    grp = [F.col(by)] if by is not None else []
    counts = drained.groupBy(*grp, F.col(variant_col)).agg(
        F.max("n").alias("n"), F.max("conv").alias("conv")
    )
    is_c = F.col(variant_col) == F.lit(control)
    is_t = F.col(variant_col) == F.lit(treatment)
    agg = counts.filter(is_c | is_t).groupBy(*grp).agg(
        F.sum(F.when(is_c, F.col("n")).otherwise(0)).alias("n_c"),
        F.sum(F.when(is_c, F.col("conv")).otherwise(0)).alias("conv_c"),
        F.sum(F.when(is_t, F.col("n")).otherwise(0)).alias("n_t"),
        F.sum(F.when(is_t, F.col("conv")).otherwise(0)).alias("conv_t"),
    )
    rc = F.col("conv_c").cast("double") / F.col("n_c").cast("double")
    rt = F.col("conv_t").cast("double") / F.col("n_t").cast("double")
    pp = (F.col("conv_c") + F.col("conv_t")).cast("double") / (
        F.col("n_c") + F.col("n_t")
    ).cast("double")
    var = (
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_c").cast("double")
           + F.lit(1.0) / F.col("n_t").cast("double"))
    )
    z = F.when(
        (F.col("n_c") > 0) & (F.col("n_t") > 0) & (var > 0),
        (rt - rc) / F.sqrt(var),
    )
    both = (F.col("n_c") > 0) & (F.col("n_t") > 0)
    return agg.select(
        *([by] if by is not None else []),
        "n_c", "conv_c",
        F.when(F.col("n_c") > 0, F.round(rc, 6)).alias("rate_c"),
        "n_t", "conv_t",
        F.when(F.col("n_t") > 0, F.round(rt, 6)).alias("rate_t"),
        F.when(both & (rc > 0), F.round(rt / rc - F.lit(1.0), 6)).alias("lift"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            F.abs(F.round(z, 6)) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("significant"),
    )


# Pruner-fold residency model (round-12 measurement,
# tools/bm25_prune_residency.py at the sf1 decade): the pandas concat
# of a partition's contribution share came out at ~40 bytes/row (25M
# rows ~ 1 GB); 48 is the conservative planning constant. 64 MB is the
# per-partition AVERAGE the auto-width targets — hot-term skew can run
# the max partition ~3x over it (measured 6.5M max vs 2.4M mean rows at
# 256 partitions); ``max_df_ratio`` is the lever that removes exactly
# those hot terms.
_PRUNE_ROW_BYTES = 48
_PRUNE_TARGET_BYTES = 64 << 20
_PRUNE_MAX_PARTITIONS = 8192


def derive_bm25_prune_partitions(
    spark: SparkSession,
    index_path: str,
    max_df_ratio: float | None = None,
    expected_batch_queries: int = 1024,
    target_bytes: int = _PRUNE_TARGET_BYTES,
) -> int:
    """Width of the pruner's per-query exchange sized so a partition's
    pandas fold stays near ``target_bytes`` — the auto behind
    ``streaming_bm25_against_index(prune_partitions='auto')``.

    The estimate needs no queries: for a DOCUMENT-SHAPED query (the
    measured worst case — full texts streamed as queries, the round-12
    residency-cliff profile) term t appears with probability
    df_t/n_docs and joins df_t posting rows, so expected contribution
    rows per query = sum(df^2)/n_docs over the terms surviving
    ``max_df_ratio`` — all of it read from the vocab-sized ``dfreq/``
    relation in one tiny plan-time aggregation (same class of plan-time
    job as the LSH route's plane-count resolution). Keyword queries
    sit orders of magnitude below the estimate, which only means the
    exchange is wider than needed — never narrower.

    The result never narrows below the session's
    ``spark.sql.shuffle.partitions`` (the width the manual knob's
    ``None`` default already gets) and caps at 8192 tasks."""
    import math

    if expected_batch_queries < 1:
        raise ValueError("expected_batch_queries must be >= 1")
    dfreq = spark.read.parquet(f"{index_path}/dfreq")
    if max_df_ratio is not None:
        dfreq = dfreq.filter(
            F.col("df").cast("double")
            <= F.lit(max_df_ratio) * F.col("n_docs").cast("double")
        )
    row = dfreq.agg(
        F.sum(F.col("df").cast("double") * F.col("df").cast("double")
              ).alias("df2"),
        F.max(F.col("n_docs").cast("double")).alias("n"),
    ).first()
    session = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if row is None or not row["df2"] or not row["n"]:
        return session
    rows_per_query = row["df2"] / row["n"]
    est_bytes = expected_batch_queries * rows_per_query * _PRUNE_ROW_BYTES
    want = math.ceil(est_bytes / max(int(target_bytes), 1))
    return max(session, min(_PRUNE_MAX_PARTITIONS, want))


def streaming_bm25_against_index(
    spark: SparkSession,
    stream_queries: DataFrame,
    index_path: str,
    query_id: str = "q_id",
    query_col: str = "q_text",
    max_df_ratio: float | None = None,
    prune_topk: int | None = None,
    prune_partitions: int | str | None = "auto",
    expected_batch_queries: int = 1024,
) -> DataFrame:
    """Real-time keyword search: a STREAM of query texts scored
    against a :func:`~linktransformer_spark.operators.search.save_bm25_index`
    directory — per-term impact CONTRIBUTIONS out, STATELESS end to
    end (append mode, no watermark, no state store); rank with
    :func:`final_bm25_topk` at drain time, which equals the batch
    ``bm25_topk_indexed`` row for row (same order-pinned fold, same
    tie-break), so the same SQL oracle checks both.

    How it stays stateless: the batch path's per-(query, doc) score
    fold is an aggregation (stateful on a stream), so the stream emits
    the JOINED contributions instead — one row per (query, doc, term)
    with the stored impact — and the fold runs on the drained sink.
    The batch path's (query, term) distinct is global; here a query's
    tokens live in ONE stream row, so ``array_distinct`` per row is
    the identical set with no state. ``max_df_ratio`` stopword pruning
    stays a stream-static semi-join against the index's vocab-sized
    ``dfreq/`` relation.

    Scale note (same as :func:`streaming_ann_against_index`): a
    stream-static join re-reads the static side per micro-batch and
    cannot collect the batch path's query-bucket partition filter from
    a stream — persist the postings relation hot for high-frequency
    triggers, or route very fat query batches through the batch serve.

    DRAIN-VOLUME note: the emitted relation is one row per
    (query, doc, term) — the sum of the query terms' posting lists.
    On a heavy-tailed vocabulary that is dominated by the df~N head
    terms, which contribute near-zero BM25 signal but almost all the
    volume (measured: 500 queries against the degenerate 31-word
    bench corpus drain 13.7M contribution rows). Production streams
    should ALWAYS set ``max_df_ratio`` — it prunes exactly that head
    before the posting join, bounding drained volume by the tail
    terms' df.

    ``prune_topk`` bounds the drain SUB-LINEARLY in the corpus: with
    it set, the joined contributions co-locate per query (one
    stateless exchange) and an Arrow stage computes each (query, doc)
    score with the finalizer's EXACT order-pinned fold (token-sorted,
    left-assoc float64 from 0.0), then emits only the contribution
    rows of each query's top-``prune_topk`` docs (score DESC, doc ASC
    — the finalizer's tie-break). The emitted schema and the
    :func:`final_bm25_topk` contract are unchanged, and because the
    prune's scores are bit-equal to the drain fold, the final top-k
    (any ``k <= prune_topk``) is IDENTICAL row for row — the sink is
    just bounded at queries x prune_topk x |query terms| rows instead
    of the posting-list sum. Requires each query id's tokens to
    arrive in ONE stream row (the documented contract — a query
    split across rows would prune against partial scores). The
    score-then-shuffle trade is the PQ path's: the exchange carries
    the full contribution set once, but the partition-level fold must
    hold its partition's share in memory. ``prune_partitions`` is that
    exchange's width; the ``'auto'`` default (round 13) derives it
    from the index's df stats via
    :func:`derive_bm25_prune_partitions` — expected contribution rows
    per document-shaped query = sum(df^2)/n_docs, times
    ``expected_batch_queries``, targeting ~64 MB per fold partition —
    so a naive caller no longer needs to know the residency knobs to
    avoid the measured ~1 GB worst case. Pass an int to pin the
    width, ``None`` for the session's shuffle width; every width is
    row-identical (the pinned parity property — the exchange never
    changes WHAT survives the prune).

    Tombstones (:func:`~linktransformer_spark.operators.search.delete_from_bm25_index`)
    are honored exactly like the batch serve: deleted docs never emit
    contributions, so survivors take the freed rank slots at drain."""
    from ..functions import similarity as S
    from ..operators.search import _read_bm25_meta
    from ..operators.tombstones import anti_tombstones

    meta = _read_bm25_meta(spark, index_path)
    id_col = str(meta["id_col"])
    qterms = stream_queries.select(
        F.col(query_id).alias("_q"),
        F.explode(
            F.array_distinct(S.word_tokens(F.col(query_col)))
        ).alias("_tok"),
    )
    if max_df_ratio is not None:
        keep = (
            spark.read.parquet(f"{index_path}/dfreq")
            .filter(
                F.col("df").cast("double")
                <= F.lit(max_df_ratio) * F.col("n_docs").cast("double")
            )
            .select(F.col("term").alias("_tok"))
        )
        qterms = qterms.join(keep, "_tok", "left_semi")
    postings = spark.read.parquet(f"{index_path}/postings").select(
        F.col("term").alias("_tok"),
        F.col(id_col).alias("_d"),
        F.col("impact").alias("_c"),
    )
    postings = anti_tombstones(postings, spark, index_path, "_d", id_col)
    contrib = qterms.join(postings, "_tok").select("_q", "_d", "_tok", "_c")
    if prune_topk is None:
        return contrib
    if prune_topk < 1:
        raise ValueError("prune_topk must be >= 1")
    if prune_partitions == "auto":
        # round-13: width derived from the index's df stats so the
        # partition fold's measured ~1 GB worst-case residency
        # (PLANS.md round 12) is bounded by default instead of by two
        # knobs the caller must know. Row-identical to any other
        # width (the parity pin) — only the exchange changes.
        prune_partitions = derive_bm25_prune_partitions(
            spark, index_path, max_df_ratio=max_df_ratio,
            expected_batch_queries=expected_batch_queries,
        )
    elif isinstance(prune_partitions, str):
        raise ValueError(
            "prune_partitions must be an int, None, or 'auto'; got "
            f"{prune_partitions!r}"
        )
    return _prune_bm25_contributions(contrib, prune_topk, prune_partitions)


def _prune_bm25_contributions(contrib: DataFrame, prune_topk: int,
                              prune_partitions: int | None = None):
    """Per-query top-``prune_topk`` doc prune over a contribution
    relation, emitting the SURVIVING CONTRIBUTION ROWS unchanged (same
    schema — :func:`final_bm25_topk` runs unmodified on the sink).

    Exactness: each (query, doc) score is computed with the drain
    fold's bit-identical float order — rows sorted (query, doc, token)
    then accumulated left-assoc in float64 from 0.0, the
    ``F.aggregate(array_sort(...))`` order — and docs rank (score
    DESC, doc ASC), the finalizer's tie-break. Any doc pruned has
    ``prune_topk`` docs strictly preferred under that exact order, so
    it cannot appear in any final top-k with k <= prune_topk.

    Residency: the fold concatenates its partition's share of the
    joined contribution relation in pandas — exact fold order needs a
    (q, d) group's rows together, and a stateless stream cannot
    aggregate, so the floor is rows-per-partition. Measured at the sf1
    decade (PLANS.md round 12): FAT queries (full document texts, no
    stopword pruning) reach ~25M rows ~ 1 GB per partition at 1000
    queries — that profile is what ``prune_partitions`` (width of the
    per-query exchange, default spark.sql.shuffle.partitions) and
    ``max_df_ratio`` (drops the high-df terms that contribute most of
    the volume) exist for; short keyword queries stay orders of
    magnitude under it."""
    import numpy as np

    topn = prune_topk

    def prune(batches):
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        # token-sorted within (q, d): the finalizer's array_sort order
        df = df.sort_values(["_q", "_d", "_tok"],
                            kind="mergesort").reset_index(drop=True)
        q = df["_q"].to_numpy()
        d = df["_d"].to_numpy()
        c = df["_c"].to_numpy(dtype=np.float64)
        n = len(df)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (q[1:] != q[:-1]) | (d[1:] != d[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], n)
        sums = np.empty(len(starts), dtype=np.float64)
        for gi in range(len(starts)):
            acc = 0.0
            for j in range(starts[gi], ends[gi]):
                acc += c[j]
            sums[gi] = acc
        gdf = pd.DataFrame(
            {"q": q[starts], "d": d[starts], "s": sums}
        ).sort_values(["q", "s", "d"], ascending=[True, False, True],
                      kind="mergesort")
        keep_group = (gdf.groupby("q", sort=False).cumcount() < topn)
        flags = np.zeros(len(starts), dtype=bool)
        flags[gdf.index.to_numpy()[keep_group.to_numpy()]] = True
        mask = np.repeat(flags, ends - starts)
        out = df[mask]
        if len(out):
            yield out

    # one stateless exchange co-locates each query's contributions;
    # the shuffle still carries the full joined volume (distributed,
    # executor-to-executor) — what the prune bounds is the SINK, the
    # measured cliff (drained rows landing on the driver). The output
    # schema is the input's — the prune only drops rows.
    if prune_partitions is not None:
        if prune_partitions < 1:
            raise ValueError("prune_partitions must be >= 1")
        exchanged = contrib.repartition(int(prune_partitions), "_q")
    else:
        exchanged = contrib.repartition("_q")
    return exchanged.mapInPandas(prune, schema=contrib.schema)


def final_bm25_topk(
    drained: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drain-time finalizer for :func:`streaming_bm25_against_index`:
    the batch ``_retrieve`` tail over the drained contribution sink —
    order-pinned fold (terms in token order, left-assoc from 0.0),
    top-k rank window, the ``bm25_topk_indexed`` output shape
    (query, doc, rank, score, n_terms).

    The fold first dedupes ``(_q, _tok, _d)``: the batch path's
    (query, term) distinct is GLOBAL, while the stream dedupes tokens
    per stream row — so a query id arriving in more than one stream
    row would otherwise contribute each shared term twice and
    double-count the score. Duplicate contribution rows are fully
    identical (same stored impact), so any-winner dedupe restores the
    batch semantics exactly."""
    from pyspark.sql import Window

    drained = drained.dropDuplicates(["_q", "_tok", "_d"])
    scored = drained.groupBy("_q", "_d").agg(
        F.count("*").alias("_nt"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_tok").alias("t"), F.col("_c").alias("c"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("_score"),
    )
    w = Window.partitionBy("_q").orderBy(
        F.col("_score").desc(), F.col("_d").asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.col("_q").alias(query_id),
            F.col("_d").alias(id_col),
            F.col("_r").cast("int").alias("rank"),
            F.col("_score").alias("score"),
            F.col("_nt").cast("long").alias("n_terms"),
        )
    )


def final_hybrid_rrf(
    bm25_drained: DataFrame,
    ann_drained: DataFrame,
    k: int = 10,
    k_arm: int = 10,
    k_rrf: int = 60,
    query_id: str = "q_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drain-time hybrid fusion: rank each drained arm
    (:func:`final_bm25_topk` over the lexical contributions,
    :func:`final_ann_topk` over the semantic candidates) to its
    top-``k_arm`` and fuse by Reciprocal Rank Fusion — the streaming
    twin of
    :func:`~linktransformer_spark.operators.serving.hybrid_topk_indexed`:
    both arms stream STATELESSLY against their stored indexes
    (:func:`streaming_bm25_against_index`,
    :func:`streaming_ann_against_index`) and only the bounded
    k_arm-per-query lists meet at the drain. Arm order (lexical then
    semantic) pins the fusion fold's accumulation order, matching the
    batch operator."""
    from ..operators.search import rrf_fuse

    bm = final_bm25_topk(
        bm25_drained, k=k_arm, query_id=query_id, id_col=id_col
    ).select(query_id, id_col, "rank")
    an = final_ann_topk(ann_drained, k=k_arm).select(
        F.col("query_id").alias(query_id),
        F.col("neighbor_id").alias(id_col),
        "rank",
    )
    return rrf_fuse([bm, an], query_id=query_id, id_col=id_col,
                    k_rrf=k_rrf, k=k)


def streaming_pq_against_index(
    spark: SparkSession,
    stream_queries: DataFrame,
    index_path: str,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    n_probe: int | str = "auto",
    k: int = 10,
    retrieve_k: int | str = "auto",
) -> DataFrame:
    """Real-time semantic search against the r90 SERVING index
    (:func:`~linktransformer_spark.operators.serving.save_pq_index`):
    a stream of query vectors probed against the stored PQ codes —
    ADC-scored CANDIDATES out, STATELESS end to end; shortlist +
    exact re-rank happen at drain time (:func:`final_pq_topk`), which
    equals the batch ``ann_topk_pq_indexed`` row for row under the
    same knobs, so the same SQL oracle checks both.

    Plan shape: stage 1 normalizes each Arrow batch of queries and
    picks its ``n_probe`` cells with the serve path's own kernels
    (``_np_normalize`` / ``_np_probe_mask`` — left-assoc folds, tie
    (dot DESC, cell ASC)); the (query, cell) fan-out stream-static
    joins the stored code rows (tombstones anti-joined exactly like
    the batch serve); stage 2 ADC-scores the candidates with per-query
    lookup tables (cached per partition — a query's candidates arrive
    fragmented), folding the m subspace terms in subspace order —
    bit-equal to the declarative ivf_pq fold — and prunes each
    partition to its per-query top-``retrieve_k`` by (adc DESC,
    id ASC) BEFORE any exchange, so the ``_qid`` co-location shuffle
    carries ~24-byte rows instead of (qv, codes) candidates; a final
    per-query reduce bounds the sink at retrieve_k rows per query per
    micro-batch. Pruning is score-invariant and preserves the drain's
    global shortlist exactly: any dropped row had >= retrieve_k rows
    in its own scope strictly preferred, so its global rank exceeds
    retrieve_k — the batch serve's per-partition pruning argument.
    Measured (PLANS.md round-10 addendum 4): the naive probed-
    superset drain was 4M rows / 60.8s at sf0.1 and died at 10x; this
    plan drains queries x retrieve_k rows at 10.6s (sf0.1) / 26.4s
    (sf1) — 2.5x wall for 10x data, the batch serve's scaling class.
    Pass the SAME ``k``/``retrieve_k`` you will give
    :func:`final_pq_topk` — the finalizer's retrieve_k must not
    exceed the stream's pruning width.

    Scale note: as with every stream-static serve here, the static
    side re-reads per micro-batch and the batch path's probed-cell
    partition filter cannot be collected from a stream — keep the
    cells relation hot for high-frequency triggers.

    CONTRACT: query ids must be integral (checked at definition) and
    UNIQUE per stream — the per-partition LUT cache is keyed by id, so
    a duplicate id with a different vector would score against the
    wrong LUT. Duplicates are detected (same Arrow batch at assign
    time; same scoring partition at ADC time) and raise; a duplicate
    that never collides cannot be caught statelessly — dedupe the
    query stream upstream."""
    import numpy as np

    from ..ids import require_integral_id
    from ..operators.serving import (
        _load_pq_model, _np_normalize, _np_probe_mask, _read_pq_meta,
        resolve_serving_params,
    )
    from ..operators.tombstones import anti_tombstones

    # query ids ride the plan as numpy int64 — a string id would die
    # with an opaque executor error, a float id would TRUNCATE
    # silently; fail loudly at definition (same stance as the other
    # streaming ingest entries)
    require_integral_id(stream_queries, query_id,
                        "streaming_pq_against_index")
    meta = _read_pq_meta(spark, index_path)
    C, book = _load_pq_model(spark, index_path, meta)
    p = resolve_serving_params(
        int(meta["n_rows"]), int(meta["dim"]), k,
        n_cells=int(meta["n_cells"]), n_probe=n_probe,
        m=int(meta["m"]), n_codes=int(meta["n_codes"]),
        retrieve_k=retrieve_k,
    )
    npb = p["n_probe"]
    rk = p["retrieve_k"]
    bC = spark.sparkContext.broadcast(C)
    bB = spark.sparkContext.broadcast(book)
    vc, qc = vector_col, query_id

    def assign(batches):
        import pandas as pd

        Cm = bC.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # unique-query-id contract (the ADC stage's LUT cache is
            # keyed by id): duplicates inside one Arrow batch with
            # DIFFERENT vectors raise here deterministically; the ADC
            # stage re-checks across batches where candidates collide
            qn = pdf[qc].to_numpy(dtype=np.int64)
            uq0, cnt0 = np.unique(qn, return_counts=True)
            for dup in uq0[cnt0 > 1]:
                rows = pdf[vc][qn == dup].tolist()
                if any(list(v) != list(rows[0]) for v in rows[1:]):
                    raise ValueError(
                        f"streaming_pq_against_index: query id "
                        f"{int(dup)} arrived with two different "
                        "vectors — query ids must be unique per "
                        "stream"
                    )
            Q = _np_normalize(
                np.array(pdf[vc].tolist(), dtype=np.float64)
            )
            mask = _np_probe_mask(Q, Cm, npb)
            qi, ci = np.nonzero(mask)
            yield pd.DataFrame({
                "_qid": pdf[qc].to_numpy(dtype=np.int64)[qi],
                "cell": ci.astype("int32"),
                "_qv": [list(Q[r]) for r in qi],
            })

    assigned = stream_queries.select(query_id, vector_col).mapInPandas(
        assign, schema="_qid long, cell int, _qv array<double>"
    )
    # fan the TINY (query, cell) relation out to cluster parallelism
    # BEFORE the join: the stream-static join's output inherits the
    # stream side's partitioning (often a handful of source files per
    # micro-batch), which would run the candidate scoring stage on a
    # few cores; shuffling here moves |queries| x n_probe narrow rows
    # instead of the candidate fan-out (measured 2x serve wall)
    assigned = assigned.repartition(
        spark.sparkContext.defaultParallelism
    )
    id_col = str(meta["id_col"])
    stored = spark.read.parquet(f"{index_path}/cells").select(
        "cell",
        F.col(id_col).cast("long").alias("_cid"),
        F.col("codes").alias("_codes"),
    )
    stored = anti_tombstones(stored, spark, index_path, "_cid", id_col)
    joined = assigned.join(stored, "cell")

    def _topk_per_query(qids, cids, score):
        """Per-query top-rk indices by (adc DESC, id ASC)."""
        order = np.lexsort((cids, -score, qids))
        qs_ = qids[order]
        keep_parts = []
        start = 0
        n = len(order)
        for i in range(1, n + 1):
            if i == n or qs_[i] != qs_[start]:
                keep_parts.append(order[start:start + min(rk, i - start)])
                start = i
        if not keep_parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(keep_parts)

    def adc_local(batches):
        """Score + prune BEFORE any exchange: the wide (qv, codes)
        columns die here, so the shuffle below carries only ~24-byte
        rows. LUTs are CACHED per query id across the partition's
        Arrow batches (a query's candidates arrive fragmented — the
        cache bounds LUT work at one build per query per partition;
        memory m*n_codes doubles per distinct query, bounded by the
        query stream) and the pruned pieces accumulate to one
        partition-level top-rk emission.

        The cache is keyed by query id, so the stream contract is
        ONE vector per query id: a duplicate id carrying a DIFFERENT
        vector would otherwise silently ADC-score against the first
        arrival's LUT. Each batch compares its first-seen vector per
        cached id against the cached vector and raises on mismatch
        (cheap: dim-length compare per distinct query per batch)."""
        import pandas as pd

        bk = bB.value
        n_codes, m, ds = bk.shape
        lut_cache = {}
        qv_cache = {}
        acc_q, acc_c, acc_s = [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf["_qid"].to_numpy(dtype=np.int64)
            # numpy's fixed return order: values, indices, inverse,
            # counts (kwarg order does not matter)
            uq, first, inv, counts = np.unique(
                qids, return_index=True, return_inverse=True,
                return_counts=True,
            )
            for i, qv in enumerate(uq):
                ref = qv_cache.get(int(qv))
                if ref is None and counts[i] == 1:
                    continue
                if ref is None:
                    ref = np.asarray(pdf["_qv"].iloc[int(first[i])],
                                     dtype=np.float64)
                # check EVERY occurrence in this batch against the
                # reference vector — a duplicate id whose two versions
                # first meet inside one ADC Arrow batch (interleaved by
                # the round-robin fan-out) must raise here, not score
                # against the first version's LUT
                rows_i = (np.nonzero(qids == qv)[0]
                          if counts[i] > 1 else [int(first[i])])
                for ri in rows_i:
                    if not np.array_equal(
                        ref,
                        np.asarray(pdf["_qv"].iloc[int(ri)],
                                   dtype=np.float64),
                    ):
                        raise ValueError(
                            f"streaming_pq_against_index: query id "
                            f"{int(qv)} arrived with two different "
                            "vectors — query ids must be unique per "
                            "stream (the per-partition LUT cache is "
                            "keyed by id)"
                        )
            missing = [i for i, qv in enumerate(uq)
                       if int(qv) not in lut_cache]
            if missing:
                Qu = np.array(
                    [pdf["_qv"].iloc[int(first[i])] for i in missing],
                    dtype=np.float64,
                )
                # per-query LUT, left-assoc subvector dots
                lut_new = np.empty((len(missing), m, n_codes),
                                   dtype=np.float64)
                for sub in range(m):
                    a = np.zeros((len(missing), n_codes),
                                 dtype=np.float64)
                    Xs = Qu[:, sub * ds:(sub + 1) * ds]
                    Bs = bk[:, sub, :]
                    for t in range(ds):
                        a = a + Xs[:, t:t + 1] * Bs[None, :, t]
                    lut_new[:, sub, :] = a
                for j, i in enumerate(missing):
                    lut_cache[int(uq[i])] = lut_new[j]
                    qv_cache[int(uq[i])] = Qu[j]
            lut = np.stack([lut_cache[int(qv)] for qv in uq])
            codes = np.array(pdf["_codes"].tolist(), dtype=np.int64)
            score = np.zeros(len(pdf), dtype=np.float64)
            # fold the m subspace terms in subspace order (the
            # declarative ivf_pq fold's accumulation order)
            for sub in range(m):
                score = score + lut[inv, sub, codes[:, sub]]
            cids = pdf["_cid"].to_numpy(dtype=np.int64)
            keep = _topk_per_query(qids, cids, score)
            acc_q.append(qids[keep])
            acc_c.append(cids[keep])
            acc_s.append(score[keep])
        if acc_q:
            qids = np.concatenate(acc_q)
            cids = np.concatenate(acc_c)
            score = np.concatenate(acc_s)
            keep = _topk_per_query(qids, cids, score)
            yield pd.DataFrame({
                "_qid": qids[keep],
                "_cid": cids[keep],
                "_adc": score[keep],
            })

    def reduce_topk(batches):
        """After the _qid co-location: reduce each partition's pruned
        pieces to the per-query top-rk and emit ONCE — each query then
        adds at most rk rows per micro-batch to the sink."""
        import pandas as pd

        acc_q, acc_c, acc_s = [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc_q.append(pdf["_qid"].to_numpy(dtype=np.int64))
            acc_c.append(pdf["_cid"].to_numpy(dtype=np.int64))
            acc_s.append(pdf["_adc"].to_numpy(dtype=np.float64))
        if acc_q:
            qids = np.concatenate(acc_q)
            cids = np.concatenate(acc_c)
            score = np.concatenate(acc_s)
            keep = _topk_per_query(qids, cids, score)
            yield pd.DataFrame({
                "_qid": qids[keep],
                "_cid": cids[keep],
                "_adc": score[keep],
            })

    narrow = joined.mapInPandas(
        adc_local, schema="_qid long, _cid long, _adc double"
    )
    # co-locate each query's (already narrow, already batch-pruned)
    # candidates so the final reduce bounds its sink emission at rk
    # per query per micro-batch (one stateless exchange of ~24-byte
    # rows)
    return narrow.repartition("_qid").mapInPandas(
        reduce_topk, schema="_qid long, _cid long, _adc double"
    )


def final_pq_topk(
    spark: SparkSession,
    drained: DataFrame,
    index_path: str,
    queries: DataFrame,
    vector_col: str = "embedding",
    query_id: str = "vec_id",
    k: int = 10,
    retrieve_k: int | str = "auto",
) -> DataFrame:
    """Drain-time finalizer for :func:`streaming_pq_against_index`:
    global per-query top-``retrieve_k`` ADC shortlist, exact re-rank
    against the index's stored true vectors (tombstones anti-joined),
    final top-``k`` — the declarative ``_shortlist_and_rerank`` tail,
    i.e. the SQL-checkable twin of the batch serve."""
    from ..functions import similarity as S
    from ..operators.serving import (
        _read_pq_meta, _shortlist_and_rerank, resolve_serving_params,
    )
    from ..operators.tombstones import anti_tombstones

    meta = _read_pq_meta(spark, index_path)
    p = resolve_serving_params(
        int(meta["n_rows"]), int(meta["dim"]), k,
        n_cells=int(meta["n_cells"]), m=int(meta["m"]),
        n_codes=int(meta["n_codes"]), retrieve_k=retrieve_k,
    )
    id_col = str(meta["id_col"])
    vec_col = str(meta["vector_col"])
    qn = queries.select(
        F.col(query_id).cast("long").alias("_qid"),
        S.l2_normalize(F.col(vector_col)).alias("_qv"),
    )
    cn = spark.read.parquet(f"{index_path}/cells").select(
        F.col(id_col).cast("long").alias("_cid"),
        F.col(vec_col).alias("_cv"),  # stored normalized at build
    )
    cn = anti_tombstones(cn, spark, index_path, "_cid", id_col)
    cand = drained.select("_qid", "_cid", "_adc")
    return _shortlist_and_rerank(
        cand, F.broadcast(qn), cn, k, p["retrieve_k"]
    )
