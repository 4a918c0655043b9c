"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query definitions live in linktransformer_spark/oracle_queries.py —
one Spark callable + one DuckDB SQL string per implemented operator
from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: semantic 1-NN join of
    customers to suppliers (the engine's core operator)."""
    from linktransformer_spark.oracle_queries import QUERIES

    return QUERIES["merge_1nn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linktransformer_spark.oracle_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from linktransformer_spark.oracle_queries import ORACLE

    return dict(ORACLE)
