"""Training wrappers (train.py): Spark-side prep contracts + the gated
torch step. Oracle parity of the relational prep is in
test_oracle_queries (clf_prep_train_split, transform_column_fold)."""

import pytest
from pyspark.sql import functions as F

import linktransformer_spark as lt


def test_train_model_linkage_prepare_only(spark, sf_dir):
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    data = supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"])
    out = lt.train_model(
        data, left_col_names="s_name", right_col_names="n_name",
        left_id_name="s_suppkey", right_id_name="s_nationkey",
        prepare_only=True,
    )
    tables = out["tables"]
    assert set(tables) >= {"train_clusters", "val_queries", "val_corpus", "val_relevant"}
    assert tables["train_clusters"].columns == ["cluster_assignment", "text"]
    assert out["config"]["loss_type"] == "supcon"


def test_train_model_gates_torch_step(spark, sf_dir):
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    data = supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"])
    with pytest.raises(NotImplementedError, match="prepare_only"):
        lt.train_model(
            data, left_col_names="s_name", right_col_names="n_name",
            left_id_name="s_suppkey", right_id_name="s_nationkey",
        )


def test_clf_splits_partition_the_data(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lt.train_clf_model(docs, on="text", label_col_name="lang", prepare_only=True)
    t = out["tables"]
    total = sum(t[k].count() for k in ("train", "val", "test"))
    assert total == docs.filter(F.col("lang").isNotNull()).count()
    n_labels = t["label_map"].count()
    assert n_labels == docs.select("lang").distinct().count()


def test_transform_column_contract(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def bad(batch, kw):
        return batch[:-1]  # wrong length

    with pytest.raises(Exception, match="wrong batch size"):
        lt.transform_column(docs, "text", bad).collect()

    def tag(batch, kw):
        return [f"{kw['prefix']}{s[:3]}" for s in batch]

    out = lt.transform_column(docs, "text", tag, fn_kwargs={"prefix": "X:"},
                              output_column="tagged")
    row = out.filter(~F.col("tagged").startswith("X:")).count()
    assert row == 0
    assert out.count() == docs.count()

    with pytest.raises(KeyError):
        lt.transform_column(docs, "nope", tag)


def test_save_prepared_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lt.train_clf_model(docs, on="text", label_col_name="lang",
                             prepare_only=True, save_dir=str(tmp_path))
    back = spark.read.parquet(str(tmp_path / "label_map"))
    assert back.count() == out["tables"]["label_map"].count()


def test_preprocess_any_data_dispatch(spark, sf_dir):
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    pairs = (
        supp.select(F.col("s_name").alias("ln"), F.upper("s_name").alias("rn"))
        .withColumn("label", (F.length("ln") % 2).cast("int"))
        .limit(60)
    )
    # label column -> paired path
    out = lt.preprocess_any_data(
        pairs, ["ln"], ["rn"], label_col_name="label", pairs_for_training=True
    )
    assert "train_pairs" in out and "val_pairs" in out
    # no label / no cluster -> linkage path
    out2 = lt.preprocess_any_data(pairs.drop("label"), ["ln"], ["rn"])
    assert "train_clusters" in out2 and "val_queries" in out2
    # cluster path
    clus = supp.select(
        F.col("s_name").alias("txt"), (F.col("s_suppkey") % 5).alias("cid")
    ).limit(60)
    out3 = lt.preprocess_any_data(
        clus, clus_text_col_names=["txt"], clus_id_col_name="cid"
    )
    assert "val_queries" in out3 and "val_corpus" in out3
    # mutual exclusion
    with pytest.raises(ValueError):
        lt.preprocess_any_data(pairs, ["ln"], ["rn"], label_col_name="label",
                               clus_id_col_name="cid")


def test_infer_embeddings_and_load_model(spark):
    df = spark.createDataFrame([("acme corp",), ("widget co",), (None,)], ["name"])
    out = lt.infer_embeddings(df, on="name")
    rows = out.collect()
    assert out.columns == ["name", "embedding"]
    assert all(len(r.embedding) == 64 for r in rows)
    from linktransformer_spark.encoders.hash_ngram import HashNgramEncoder
    assert isinstance(lt.load_model("hash-ngram"), HashNgramEncoder)
    assert isinstance(lt.load_model(None), HashNgramEncoder)
