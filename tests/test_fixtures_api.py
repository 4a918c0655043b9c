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
