"""Multimodal plumbing (operators/multimodal.py). Value parity with the
oracle is covered in test_oracle_queries; here: schema/shape contracts
and the codec gate."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from linktransformer_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    frame_sample,
    payload_hash,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").limit(20)
    return attach_fake_media(docs, "doc_id")


def test_payload_is_binary_with_metadata(spark, sf_dir):
    m = _media(spark, sf_dir)
    assert isinstance(m.schema["payload"].dataType, BinaryType)
    row = m.select("media_type", "n_bytes", F.length("payload").alias("l")).first()
    assert row["media_type"] == "image"
    assert row["n_bytes"] == row["l"] > 8


def test_python_decode_matches_expression_twin(spark, sf_dir):
    """int.from_bytes header parse (mapInPandas) == payload_hash expr."""
    m = _media(spark, sf_dir)
    dec = decode_image(m).withColumn(
        "w_expr", (16 + payload_hash(F.col("payload")) % 240).cast("int")
    )
    assert dec.filter(F.col("width") != F.col("w_expr")).count() == 0


def test_frame_sample_shape(spark, sf_dir):
    m = _media(spark, sf_dir)
    frames = frame_sample(m, ["doc_id"], n_frames=3)
    assert frames.columns == ["doc_id", "frame_idx", "frame_ts_ms"]
    assert frames.count() == m.count() * 3
    # frame timestamps strictly increase within a doc
    bad = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("frame_ts_ms").alias("d"))
        .filter(F.col("n") != F.col("d"))
    )
    assert bad.count() == 0


def test_real_codecs_raise_not_implemented(spark, sf_dir):
    m = _media(spark, sf_dir)
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(m, codec="pillow")
    with pytest.raises(ValueError):
        decode_image(m, codec="nonsense")


def test_extract_features_feeds_embedding_family(spark):
    """Features from media payloads plug straight into semantic_dedup —
    the end-to-end media near-dup pipeline. Identical payloads (same
    header hash) must land in the same duplicate group."""
    import linktransformer_spark as lt
    from pyspark.sql import functions as F

    base = spark.range(0, 40).select(F.col("id").alias("mid"))
    media = lt.attach_fake_media(base, "mid", media_type="image")
    # duplicate payloads under new ids: same bytes as mid=0..4
    dup = lt.attach_fake_media(
        spark.range(0, 5).select(F.col("id").alias("mid")), "mid"
    ).withColumn("mid", F.col("mid") + 1000)
    allm = media.unionByName(dup)
    feats = lt.extract_features(allm, dim=8)
    assert feats.schema["features"].simpleString().startswith("features:array<double>")
    kept = lt.semantic_dedup(
        feats.select("mid", "features"), "features", "mid",
        threshold=1.0 - 1e-9, n_cells=4,
    )
    ids = {r["mid"] for r in kept.collect()}
    # the 5 duplicated payloads keep only their min-id copy (0..4)
    assert not ids & {1000, 1001, 1002, 1003, 1004}
    assert {0, 1, 2, 3, 4} <= ids and len(ids) == 40


def test_extract_features_dim_validation(spark):
    import linktransformer_spark as lt
    import pytest as _pytest

    m = lt.attach_fake_media(spark.range(3).withColumnRenamed("id", "mid"), "mid")
    with _pytest.raises(ValueError, match="dim"):
        lt.extract_features(m, dim=0)
    with _pytest.raises(NotImplementedError, match="codec"):
        lt.extract_features(m, codec="pillow")


def test_extract_features_exact_for_real_media_headers(spark):
    """A REAL media header (PNG magic, > int64 as unsigned big-endian)
    must produce the documented formula's values — the modular
    reduction happens in exact Python-int space, never a wrapping int64
    cast. Also: output_col collision raises at the API boundary."""
    import linktransformer_spark as lt
    from pyspark.sql import functions as F
    import pytest as _pytest

    png = bytes([0x89]) + b"PNG\r\n\x1a\n" + b"fakebody"
    df = spark.createDataFrame([(1, bytearray(png))], "mid long, payload binary")
    [row] = lt.extract_features(df, dim=4).collect()
    h = int.from_bytes(png[:8], "big")
    want = [((h * (2 * i + 1) + 7919 * i) % 104729) / 104729.0 - 0.5
            for i in range(4)]
    assert row["features"] == want

    m = lt.attach_fake_media(spark.range(2).withColumnRenamed("id", "mid"), "mid")
    with _pytest.raises(ValueError, match="output_col"):
        lt.extract_features(m, output_col="n_bytes")
