"""Schema contract over the driver-generated testdata: if a future
regeneration changes column names or drops a table, fail HERE with a
clear message instead of deep inside a query plan (the round-2 bench
crash was exactly a silent testdata re-encode)."""

import pytest

EXPECTED = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_type"},
    "orders": {"o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"},
    "lineitem": {
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_has_expected_columns(spark, sf_dir, table):
    # read through the engine's reader, not raw spark.read.parquet —
    # it handles the TIMESTAMP(NANOS) re-encode a regeneration can
    # introduce (the exact scenario this contract guards), so a schema
    # change fails with the message below, not a parquet-type error
    from linktransformer_spark.sources.tables import read_table

    cols = set(read_table(spark, sf_dir, table).columns)
    missing = EXPECTED[table] - cols
    assert not missing, (
        f"testdata table {table} lost columns {sorted(missing)} — the "
        "generator changed; update the queries that consume them"
    )
