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
