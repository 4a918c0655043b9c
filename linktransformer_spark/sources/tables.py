"""Table readers for the testdata star schema + general sources
(SURVEY §2.1: CSV/Excel scans -> spark.read; parquet is the engine
default).

``events.parquet`` has shipped with two different ``ts`` encodings
across driver rounds: TIMESTAMP(NANOS) (which Spark 4 refuses to read
unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, surfacing the
column as a BIGINT of nanos) and plain TIMESTAMP(MICROS) (reads
directly as a timestamp). We set the legacy conf, read, then inspect
the *actual* resolved dtype: only a long column gets the nanos->micros
rebuild (integer DIV — nanos exceed 2^53, float division would lose
precision; floor division matches DuckDB's truncation so oracle
comparisons agree). A timestamp column passes through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
            )
        elif ts_type.startswith("timestamp_ntz"):
            # normalize to session-tz timestamp so window/epoch funcs and
            # the DuckDB oracle (naive timestamps, UTC session) agree
            df = df.withColumn("ts", F.to_timestamp("ts"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV scan (reference pd.read_csv passthrough, preprocess.py:303-311)."""
    opts = {"header": "true", "inferSchema": "true"}
    opts.update({k: str(v) for k, v in options.items()})
    return spark.read.options(**opts).csv(path)


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """Excel scan (reference pd.read_excel, preprocess.py:306-307) —
    pandas shim -> createDataFrame; xlsx needs openpyxl (import-gated)."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet)
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "read_excel needs openpyxl/xlrd; convert to csv/parquet instead"
        ) from e
    return spark.createDataFrame(pdf)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED table: pre-hash-partitioned and sorted on
    ``bucket_by``, so every later equi-join or aggregation on that key
    skips its shuffle (Catalyst sees the bucketing as a satisfied
    hash distribution).

    The scale use-case: a curated reference table (the right side of
    merge/aggregate_rows) or a doc corpus that many pipelines join on
    the same key — pay the shuffle once at write time, never again.
    Bucketed tables must go through the catalog (saveAsTable), not raw
    parquet paths.
    """
    w = df.write.format("parquet").mode(mode)
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(num_buckets, bucket_by).sortBy(bucket_by).saveAsTable(table)


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet sink (`path/col=value/...`).

    The scale contract: queries filtering on the partition columns
    prune whole directories at PLANNING time (PartitionFilters in the
    scan, no file even listed) — the right layout for the big
    append-only tables a pipeline slices by date/lang/source. Choose
    low-cardinality columns: one directory (and >= 1 file) per value;
    a high-cardinality partition key is the classic small-files
    failure. Unlike bucketing this needs no catalog — path-based reads
    keep the pruning.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.partitionBy(*cols).mode(mode).parquet(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by ``save_bucketed`` (bucketing metadata
    comes from the catalog; a plain spark.read.parquet on the files
    would lose it)."""
    return spark.table(table)


def read_jsonl(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """JSON-lines corpus scan (the LLM training-data interchange
    format). Pass ``schema`` at scale: without one Spark runs a whole
    extra inference pass over the files before the real read; with one
    the scan is single-pass and column-prunable. Corrupt lines land in
    ``_corrupt_record`` under the default PERMISSIVE mode — pass
    mode='FAILFAST' to hard-error instead."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**{k: str(v) for k, v in options.items()}).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSON-lines corpus sink; optionally Hive-partitioned (same
    pruning contract as save_partitioned) and compressed (gzip default
    — universally readable; use zstd/None per downstream tooling)."""
    w = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
