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


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_output_dtypes_hashable(name, duck):
    # Dtype-fidelity gate (round-4 verdict item 2): DuckDB's sum() over
    # an integer column yields HUGEINT (int128), which the driver's
    # value-hash serializes differently from Spark's bigint even when
    # values are equal (the round-4 hash-red rows). Binding the relation
    # resolves output types without executing the query; any
    # HUGEINT/UHUGEINT/DECIMAL output column means the oracle SQL needs
    # an explicit CAST(... AS BIGINT/DOUBLE).
    rel = duck.sql(ORACLE[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))
    ]
    assert not bad, (
        f"oracle for {name!r} yields driver-hash-unsafe dtypes {bad}; "
        "wrap in CAST(... AS BIGINT) / CAST(... AS DOUBLE)"
    )


def test_every_query_has_oracle():
    # every registered query carries a full SQL oracle; genuinely
    # non-SQL-expressible ops (k-means IVF) are NOT registered — they
    # are recall-gated in pytest and covered by oracle-checkable twins
    # (ann_topk_ivf_seeded) instead of weak no-oracle driver rows.
    missing = set(QUERIES) - set(ORACLE)
    assert not missing, f"queries missing oracle SQL: {missing}"
