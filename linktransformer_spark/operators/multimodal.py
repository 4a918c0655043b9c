"""Multimodal (image/audio/video) columns — Spark-side plumbing.

Design (north-star extension; the reference is text-only): media rides
as an opaque ``binary`` payload column plus typed metadata
(``media_type``, ``n_bytes``), and every transform is an Arrow-batched
``mapInPandas`` stage:

    decode_image   payload -> (width, height, aspect)
    resize_image   (width, height) -> fitted dims (pure metadata math)
    frame_sample   payload -> N (frame_idx, frame_ts_ms) rows (1->N UDTF shape)

The actual codec layer is STUBBED — this container has no image/audio
libraries. ``codec="fake"`` (default) is a deterministic decoder that
reads REAL bytes: the payload's first 8 bytes carry a portable
poly-hash of the media id (big-endian), and all derived metrics are
fixed functions of that value. The Spark plumbing — binary schema,
Arrow batch shape, UDF signatures, explode semantics, partitioning —
is therefore fully real and fully testable: a DuckDB oracle reproduces
every metric from the hash formula without touching bytes, so the
whole binary -> mapInPandas -> metrics pipeline is value-checked
end-to-end. ``codec="pillow"`` / ``codec="ffmpeg"`` raise
NotImplementedError with guidance until real libs are present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.similarity import poly_hash
from . import knn_join as KJ

_REAL_CODECS = ("pillow", "ffmpeg", "libav")


def _codec_guard(codec: str) -> None:
    if codec in _REAL_CODECS:
        raise NotImplementedError(
            f"codec={codec!r}: real media decoding needs the corresponding "
            "native library, which is not available in this environment. "
            "Use codec='fake' (deterministic stub) — the Spark plumbing is "
            "identical; only the per-batch decode body changes."
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")


def attach_fake_media(
    df: DataFrame, id_col: str, media_type: str = "image", filler_repeats: int = 4
) -> DataFrame:
    """Attach a deterministic binary ``payload`` + metadata columns.

    Payload layout: 8 bytes big-endian poly_hash(str(id)) header, then
    md5-hex filler — a stand-in for real encoded media bytes.
    """
    ph = poly_hash(F.col(id_col).cast("string"))
    header = F.unhex(F.lpad(F.hex(ph), 16, "0"))
    filler = F.unhex(F.repeat(F.md5(F.col(id_col).cast("string")), filler_repeats))
    payload = F.concat(header, filler).cast(BinaryType())
    return (
        df.withColumn("payload", payload)
        .withColumn("media_type", F.lit(media_type))
        .withColumn("n_bytes", F.length("payload").cast("long"))
    )


def payload_hash(payload: Column) -> Column:
    """The 8-byte header back out of a payload, as a long (expression
    twin of the Python-side ``int.from_bytes(b[:8], 'big')``)."""
    return F.conv(F.hex(F.substring(payload, 1, 8)), 16, 10).cast("long")


def _header_hashes(series):
    """8-byte big-endian header of each payload as arbitrary-precision
    Python ints (object dtype). Deliberately NOT to_numpy(int64): a
    REAL media header (e.g. the PNG magic) exceeds int64 and would wrap
    silently — all three stub decoders share this one exact
    extraction."""
    return series.map(lambda b: int.from_bytes(bytes(b)[:8], "big"))


def decode_image(
    df: DataFrame, payload_col: str = "payload", codec: str = "fake"
) -> DataFrame:
    """payload -> + (width, height, aspect). Arrow-batched mapInPandas;
    the fake codec derives dims from the real payload header bytes:
        width  = 16 + h % 240
        height = 16 + (h // 240) % 240
        aspect = width / height   (raw double; identical IEEE division
                                   in numpy and any SQL engine)
    """
    _codec_guard(codec)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("aspect", DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hs = _header_hashes(pdf[payload_col])
            w = (16 + hs % 240).astype("int32")
            h = (16 + (hs // 240) % 240).astype("int32")
            pdf = pdf.copy()
            pdf["width"] = w
            pdf["height"] = h
            pdf["aspect"] = w / h
            yield pdf

    return KJ.ensure_parallelism(df).mapInPandas(gen, out_schema)


def resize_image(
    df: DataFrame, target: int, width_col: str = "width", height_col: str = "height"
) -> DataFrame:
    """Fit-longest-side-to-target metadata math (the byte-level resample
    belongs to the codec layer; dims logic is engine-side and exact)."""
    w, h = F.col(width_col), F.col(height_col)
    scale = F.lit(target) / F.greatest(w, h)
    clamped = F.least(scale, F.lit(1.0))
    return df.withColumn(
        "out_width", F.greatest(F.round(w * clamped).cast("int"), F.lit(1))
    ).withColumn(
        "out_height", F.greatest(F.round(h * clamped).cast("int"), F.lit(1))
    )


def frame_sample(
    df: DataFrame,
    id_cols: list[str],
    n_frames: int = 4,
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """1 -> N frame expansion (video sampling shape): evenly spaced
    frame timestamps over the fake duration
        duration_ms = 1000 + h % 60000
        frame_ts_ms = floor(i * duration_ms / n_frames), i in [0, n)
    Returns (id_cols..., frame_idx, frame_ts_ms).
    """
    _codec_guard(codec)
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    fields = [df.schema[c] for c in id_cols]
    out_schema = StructType(
        list(fields)
        + [StructField("frame_idx", IntegerType()), StructField("frame_ts_ms", LongType())]
    )
    nf = n_frames

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            hs = _header_hashes(pdf[payload_col])
            dur = 1000 + hs % 60000
            base = pdf[id_cols].loc[pdf.index.repeat(nf)].reset_index(drop=True)
            idx = pd.Series(list(range(nf)) * len(pdf))
            base["frame_idx"] = idx.astype("int32")
            base["frame_ts_ms"] = (
                (idx * dur.loc[dur.index.repeat(nf)].reset_index(drop=True)) // nf
            ).astype("int64")
            yield base

    return KJ.ensure_parallelism(df).mapInPandas(gen, out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 16,
    codec: str = "fake",
    output_col: str = "features",
) -> DataFrame:
    """payload -> + ``output_col`` (array<double>, length ``dim``) — the
    media feature-extraction stage (CLIP/wav2vec embedding in a real
    deployment; here the same deterministic-stub contract as
    :func:`decode_image`). Features derive from the payload's real
    header hash by exact integer arithmetic,
        raw_i = (h*(2i+1) + 7919*i) % 104729,  f_i = raw_i/104729 - 0.5
    so a SQL oracle reproduces every value bit-for-bit, and the output
    column plugs directly into the embedding family (ann_topk,
    semantic_dedup, knn_classify) for an end-to-end media near-dup
    pipeline. Arrow-batched mapInPandas; the header hash is reduced
    mod 104729 in exact Python-int space FIRST (a real media header —
    PNG magic etc. — exceeds int64 and would wrap silently under a
    direct int64 cast; (h mod M)·k ≡ h·k (mod M) keeps the formula
    identical), then the per-dim math vectorizes in bounded int64
    (residue·(2·dim+1) < 2^37)."""
    _codec_guard(codec)
    if not 1 <= dim <= 512:
        raise ValueError("dim must be in [1, 512]")
    if output_col in df.columns:
        raise ValueError(
            f"output_col {output_col!r} already exists — mapInPandas would "
            "fail with an opaque Arrow schema mismatch; pick a fresh name"
        )
    from pyspark.sql.types import ArrayType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(output_col, ArrayType(DoubleType()))]
    )

    def gen(batches):
        import numpy as np

        i = np.arange(dim, dtype="int64")
        mul, add = (2 * i + 1), (7919 * i)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            res = (
                _header_hashes(pdf[payload_col])
                .map(lambda h: h % 104729)
                .to_numpy(dtype="int64")
            )
            raw = (res[:, None] * mul[None, :] + add[None, :]) % 104729
            feats = raw / 104729.0 - 0.5
            pdf = pdf.copy()
            pdf[output_col] = list(feats)
            yield pdf

    return KJ.ensure_parallelism(df).mapInPandas(gen, out_schema)
