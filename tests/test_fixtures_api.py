"""Reference-tutorial parity: the shipped fixture CSVs run through the
reference's public API names end-to-end (the switch-over smoke test)."""

import linktransformer_spark as lt


def test_data_dir_exports_fixture_csvs():
    import os

    names = os.listdir(lt.DATA_DIR_PATH)
    for f in ("toy_comp_1.csv", "toy_comp_2.csv", "fine.csv", "coarse.csv",
              "toy_pairs.csv", "company_clusters.csv"):
        assert f in names


def test_tutorial_merge_on_fixtures(spark):
    df1 = lt.read_csv(spark, f"{lt.DATA_DIR_PATH}/toy_comp_1.csv")
    df2 = lt.read_csv(spark, f"{lt.DATA_DIR_PATH}/toy_comp_2.csv")
    out = lt.merge(df1, df2, left_on="CompanyName", right_on="CompanyName",
                   model="hash-ngram")
    rows = out.collect()
    assert len(rows) == df1.count()  # 1-NN: one match per left row
    assert "score" in out.columns
    # suffix rules: overlapping cols get _x/_y
    assert "CompanyName_x" in out.columns and "CompanyName_y" in out.columns


def test_tutorial_aggregate_rows_on_fixtures(spark):
    fine = lt.read_csv(spark, f"{lt.DATA_DIR_PATH}/fine.csv")
    coarse = lt.read_csv(spark, f"{lt.DATA_DIR_PATH}/coarse.csv")
    out = lt.aggregate_rows(
        fine, coarse,
        left_on="Fine Category Name", right_on="Coarse Category Name",
        model="hash-ngram",
    )
    assert out.count() == fine.count()


def test_model_class_shims():
    m = lt.LinkTransformer("any-sbert-checkpoint")
    # usable as the model= argument (Encoder passthrough)
    from linktransformer_spark.encoders.base import Encoder, resolve_encoder

    assert isinstance(m, Encoder)
    assert resolve_encoder(m) is m

    clf = lt.LinkTransformerClassifier("some-checkpoint", num_labels=3)
    assert clf.num_labels == 3


def test_jsonl_round_trip_partitioned(spark, tmp_path):
    """read_jsonl/write_jsonl: schema-pinned round trip, Hive
    partitioning, and nested values survive the json encoding."""
    import linktransformer_spark as lt

    df = spark.createDataFrame(
        [(1, "en", "hello world", [0.1, 0.2]),
         (2, "de", "hallo welt", [0.3, 0.4]),
         (3, "en", 'quote " and \n newline', [0.0])],
        "doc_id long, lang string, text string, emb array<double>",
    )
    path = str(tmp_path / "corpus")
    lt.write_jsonl(df, path, partition_by="lang")
    back = lt.read_jsonl(
        spark, path,
        schema="doc_id long, text string, emb array<double>, lang string",
    )
    a = sorted(map(tuple, df.select("doc_id", "lang", "text", "emb").collect()))
    b = sorted(map(tuple, back.select("doc_id", "lang", "text", "emb").collect()))
    assert a == b
    # hive layout on disk -> partition pruning stays available
    import os
    assert sorted(d for d in os.listdir(path) if d.startswith("lang=")) == \
           ["lang=de", "lang=en"]
    # gzip default: json part files are compressed
    en = os.listdir(os.path.join(path, "lang=en"))
    assert any(f.endswith(".json.gz") for f in en)
