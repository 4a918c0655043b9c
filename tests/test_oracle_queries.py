"""Every declared driver query must hash-match its DuckDB oracle.

This is the local twin of the driver's t2 correctness gate — run it at
sf0.001 by default (LT_TEST_SF_DIR overrides, e.g. sf0.01 before a
round ends).
"""

import pytest

from linktransformer_spark.oracle_queries import ORACLE, QUERIES

from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLE[name])


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLE)
    # non-SQL-expressible ops may omit the oracle (driver runs a weaker
    # rows-only check); keep the list explicit so nothing slips silently.
    # ann_topk_ivf: IVF is approximate (float-average centroids) — no
    # SQL twin; recall gated in tests/test_dedup_ann.py instead.
    allowed_weak = {"ann_topk_ivf"}
    assert missing <= allowed_weak, f"queries missing oracle SQL: {missing}"
