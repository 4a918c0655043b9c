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


# ---------------------------------------------------------------------------
# TorchDistributor launch wiring (stubbed torch stack): everything up to
# the actual gradient steps — prep -> parquet persistence -> distributor
# construction -> worker fn -> dataset build -> fit/Trainer calls — runs
# for real; only the torch math is faked.
# ---------------------------------------------------------------------------


class FakeDistributor:
    """Stands in for pyspark.ml.torch.distributor.TorchDistributor:
    records construction kwargs and runs the train fn in-process."""

    last = None

    def __init__(self, num_processes, local_mode, use_gpu):
        FakeDistributor.last = self
        self.kwargs = dict(
            num_processes=num_processes, local_mode=local_mode, use_gpu=use_gpu
        )
        self.ran = None

    def run(self, fn, *args):
        self.ran = (fn, args)
        return fn(*args)


def _install_torch_stubs(monkeypatch, record):
    import math
    import sys
    import types

    torch = types.ModuleType("torch")
    tutils = types.ModuleType("torch.utils")
    tdata = types.ModuleType("torch.utils.data")

    class DataLoader:
        def __init__(self, dataset, shuffle=False, batch_size=1):
            record["loader"] = dict(
                n=len(dataset), batch_size=batch_size, shuffle=shuffle
            )
            self.dataset, self.batch_size = dataset, batch_size

        def __len__(self):
            return math.ceil(len(self.dataset) / self.batch_size)

    tdata.DataLoader = DataLoader
    tutils.data = tdata
    torch.utils = tutils
    monkeypatch.setitem(sys.modules, "torch", torch)
    monkeypatch.setitem(sys.modules, "torch.utils", tutils)
    monkeypatch.setitem(sys.modules, "torch.utils.data", tdata)

    st = types.ModuleType("sentence_transformers")
    losses = types.ModuleType("sentence_transformers.losses")

    class InputExample:
        def __init__(self, texts, label=0):
            self.texts, self.label = texts, label

    class SentenceTransformer:
        def __init__(self, path):
            record["model_path"] = path

        def fit(self, train_objectives, epochs, warmup_steps, output_path):
            record["fit"] = dict(
                objectives=train_objectives, epochs=epochs,
                warmup_steps=warmup_steps, output_path=output_path,
            )

    class SupConLoss:
        def __init__(self, model, **kw):
            record["loss"] = ("supcon", kw)

    class OnlineContrastiveLoss:
        def __init__(self, model, **kw):
            record["loss"] = ("onlinecontrastive", kw)

    losses.SupConLoss = SupConLoss
    losses.OnlineContrastiveLoss = OnlineContrastiveLoss
    st.InputExample = InputExample
    st.SentenceTransformer = SentenceTransformer
    st.losses = losses
    monkeypatch.setitem(sys.modules, "sentence_transformers", st)
    monkeypatch.setitem(sys.modules, "sentence_transformers.losses", losses)


def _install_hf_stubs(monkeypatch, record):
    import sys
    import types

    tr = types.ModuleType("transformers")

    class AutoTokenizer:
        @classmethod
        def from_pretrained(cls, m):
            record["tokenizer_model"] = m

            def tok(texts, padding=None, truncation=None):
                record.setdefault("tokenized_batches", 0)
                record["tokenized_batches"] += 1
                return {"input_ids": [[0]] * len(texts)}

            return tok

    class AutoModelForSequenceClassification:
        @classmethod
        def from_pretrained(cls, m, num_labels):
            record["num_labels"] = num_labels
            return cls()

    class TrainingArguments:
        def __init__(self, **kw):
            record["training_args"] = kw

    class Trainer:
        def __init__(self, model, args, train_dataset, eval_dataset):
            record["trainer_built"] = True

        def train(self):
            record["trained"] = True

        def save_model(self, out):
            record["saved"] = out

    tr.AutoTokenizer = AutoTokenizer
    tr.AutoModelForSequenceClassification = AutoModelForSequenceClassification
    tr.TrainingArguments = TrainingArguments
    tr.Trainer = Trainer
    monkeypatch.setitem(sys.modules, "transformers", tr)

    ds = types.ModuleType("datasets")

    class Dataset:
        def __init__(self, pdf):
            self.pdf = pdf

        @classmethod
        def from_pandas(cls, pdf):
            return cls(pdf)

        def map(self, fn, batched=False):
            fn({"text": list(self.pdf["text"].head(4))})
            return self

    ds.Dataset = Dataset
    monkeypatch.setitem(sys.modules, "datasets", ds)


def test_train_model_distributor_wiring(spark, sf_dir, tmp_path, monkeypatch):
    record = {}
    _install_torch_stubs(monkeypatch, record)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    data = supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"])
    out = lt.train_model(
        data, left_col_names="s_name", right_col_names="n_name",
        left_id_name="s_suppkey", right_id_name="s_nationkey",
        save_dir=str(tmp_path / "prep"),
        training_args={
            "num_epochs": 2, "train_batch_size": 8,
            "model_save_dir": str(tmp_path / "models"),
            "model_save_name": "bienc",
        },
        distributor_cls=FakeDistributor, num_processes=3,
    )
    # distributor constructed and run with the worker fn
    from linktransformer_spark.train import _biencoder_train_fn

    assert FakeDistributor.last.kwargs == dict(
        num_processes=3, local_mode=True, use_gpu=False
    )
    assert FakeDistributor.last.ran[0] is _biencoder_train_fn
    # worker read the persisted train_clusters parquet and built one
    # example per prepared row
    import pandas as pd

    n_train = len(pd.read_parquet(str(tmp_path / "prep" / "train_clusters")))
    assert record["loader"]["n"] == n_train > 0
    assert record["loader"]["batch_size"] == 8
    assert record["loss"][0] == "supcon"
    assert record["fit"]["epochs"] == 2
    assert out == str(tmp_path / "models" / "bienc")
    assert record["fit"]["output_path"] == out


def test_train_model_launch_requires_save_dir(spark, sf_dir, monkeypatch):
    record = {}
    _install_torch_stubs(monkeypatch, record)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    data = supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"])
    with pytest.raises(ValueError, match="save_dir"):
        lt.train_model(
            data, left_col_names="s_name", right_col_names="n_name",
            left_id_name="s_suppkey", right_id_name="s_nationkey",
            distributor_cls=FakeDistributor,
        )


def test_train_clf_model_distributor_wiring(spark, sf_dir, tmp_path, monkeypatch):
    record = {}
    _install_torch_stubs(monkeypatch, record)
    _install_hf_stubs(monkeypatch, record)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lt.train_clf_model(
        docs, on="text", label_col_name="lang",
        save_dir=str(tmp_path / "prep"),
        training_args={"model_save_dir": str(tmp_path / "models")},
        distributor_cls=FakeDistributor,
    )
    assert FakeDistributor.last.kwargs["num_processes"] == 1
    assert record["num_labels"] == docs.select("lang").distinct().count()
    assert record["trained"] and record["saved"] == out
    assert record["tokenized_batches"] >= 2  # train + val datasets built
    assert record["training_args"]["per_device_train_batch_size"] == 8
