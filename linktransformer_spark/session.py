"""SparkSession helper tuned for this engine.

Defaults chosen for correctness-vs-oracle (UTC timestamps, ANSI off to
match the reference's permissive pandas semantics) and for scale (AQE
on, skew-join handling on, Arrow for the pandas-UDF slow path).

On a real cluster the same builder is used — only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linktransformer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster leave it unset and let spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # shuffle sizing: ~#cores locally; AQE coalesces further at runtime
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDF / toPandas paths
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # oracle parity: duckdb timestamps are UTC-naive
        .config("spark.sql.session.timeZone", "UTC")
        # the reference is permissive pandas; ANSI strictness would
        # change null/overflow semantics vs the oracle
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
