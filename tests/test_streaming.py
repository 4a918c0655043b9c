"""Structured Streaming operators (streaming/ops.py).

The oracle-parity of the three streaming queries is covered by
test_oracle_queries; here we exercise the production-only variants and
invariants that have no SQL twin.
"""

from pyspark.sql import functions as F

from linktransformer_spark.streaming import (
    read_stream_table,
    run_available_now,
    streaming_dedup,
    streaming_sessionize,
)


def test_dedup_within_watermark_runs_and_bounds_state(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    out = run_available_now(
        streaming_dedup(ev, ["user_id"], watermark="1 hour", within_watermark=True),
        output_mode="append",
    )
    n_users = out.select("user_id").distinct().count()
    total = out.count()
    # within-watermark dedup may re-emit a key after its state ages out,
    # but never emits consecutive duplicates within the watermark; the
    # distinct key set must equal the batch distinct.
    batch_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    assert n_users == batch_users
    assert total >= n_users


def test_sessionize_counts_cover_all_events(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    out = run_available_now(
        streaming_sessionize(ev, gap="30 minutes"), output_mode="complete"
    )
    total_events = out.agg(F.sum("n_events")).first()[0]
    batch_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total_events == batch_total
