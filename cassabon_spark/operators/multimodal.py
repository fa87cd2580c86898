"""Multimodal columns: opaque binary payloads with typed metadata, processed
via Arrow-batched mapInPandas (SURVEY §2 Part C).

The pattern for image/audio/video at 100 TB:
  * payloads live in a BinaryType column (or object-store URIs resolved
    inside the UDF), metadata in sibling typed columns
  * decode / feature-extract / resize / frame-sample run as mapInPandas over
    Arrow batches — one Python worker per partition, zero per-row overhead
  * partitioning is by content-size buckets so batches stay memory-bounded

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
`decode_image` is a clearly-marked stub: the Spark-side plumbing — schema,
batch iteration, output contract — is real and tested with a deterministic
fake decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Decode an image payload to (width, height, mode).

    STUB: real decoding needs an image codec library that is not available
    in this environment. Raises so callers must inject a decoder (tests use
    `fake_decoder`)."""
    raise NotImplementedError(
        "image codecs unavailable in this container; pass decoder= explicitly"
    )


def fake_decoder(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: derives a fake geometry from the payload bytes
    so the distributed plumbing is testable end-to-end."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, "RGB" if n % 2 == 0 else "L")


def decode_blobs(
    df: DataFrame,
    key_col: str = "key",
    blob_col: str = "blob",
    decoder=decode_image,
    batch_bucket_mb: int = 64,
) -> DataFrame:
    """df(key, blob BINARY) -> (key, n_bytes, width, height, mode).

    mapInPandas: the decoder runs once per Arrow batch over a plain pandas
    column — no per-row Python call overhead from Spark's side. Rows are
    pre-partitioned by size bucket so one huge payload can't blow a worker's
    batch memory.
    """
    sized = df.select(
        F.col(key_col).alias("key"),
        F.col(blob_col).alias("blob"),
        (F.octet_length(blob_col) / (batch_bucket_mb * 1024 * 1024)).cast("int").alias("_bucket"),
        # RANGE-partition by (size-class, key): classes stay contiguous —
        # every partition holds payloads of one (or two adjacent) size
        # classes, bounding Arrow batch memory — while the key spreads each
        # class across many tasks (hash repartition on the pair would mix
        # classes arbitrarily within a partition)
    ).repartitionByRange("_bucket", "key")

    def _decode(batches):
        for pdf in batches:
            out = pdf[["key"]].copy()
            out["n_bytes"] = pdf["blob"].map(len)
            geom = pdf["blob"].map(decoder)
            out["width"] = geom.map(lambda g: g[0])
            out["height"] = geom.map(lambda g: g[1])
            out["mode"] = geom.map(lambda g: g[2])
            yield out

    return sized.mapInPandas(_decode, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-index plan per payload
    (decode itself stubbed as above). Demonstrates the schema/partitioning
    contract: one row per sampled frame, co-partitioned by key."""
    return df.select(
        "key",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    ).repartition("key")


RESIZED_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    key_col: str = "key",
    blob_col: str = "blob",
    resizer=None,
) -> DataFrame:
    """df(key, blob BINARY) -> (key, width, height, resized BINARY).

    Same mapInPandas contract as decode_blobs. `resizer(payload, w, h) ->
    bytes` is injected (codecs not in this container); the default raises
    like decode_image. The deterministic fake used in tests truncates/pads
    the payload to w*h bytes — enough to verify batch shapes and the
    BinaryType round trip end-to-end."""
    if resizer is None:
        def resizer(payload, w, h):  # pragma: no cover - stub
            raise NotImplementedError(
                "image codecs unavailable in this container; pass resizer= explicitly"
            )

    def _resize(batches):
        for pdf in batches:
            out = pdf[[key_col]].rename(columns={key_col: "key"})
            out["width"] = target_w
            out["height"] = target_h
            out["resized"] = pdf[blob_col].map(lambda b: resizer(b, target_w, target_h))
            yield out

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_bytes", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    key_col: str = "key",
    blob_col: str = "blob",
    sample_rate: int = 16_000,
    decoder=None,
) -> DataFrame:
    """df(key, blob BINARY) -> (key, n_bytes, duration_s, rms, peak).

    `decoder(payload) -> np.ndarray[float]` of PCM samples is injected
    (audio codecs not in this container; the default raises). Feature math
    (duration/RMS/peak) runs vectorized in numpy over the Arrow batch —
    the shape real librosa-style extraction would take."""
    import numpy as np

    if decoder is None:
        def decoder(payload):  # pragma: no cover - stub
            raise NotImplementedError(
                "audio codecs unavailable in this container; pass decoder= explicitly"
            )

    def _features(batches):
        for pdf in batches:
            out = pdf[[key_col]].rename(columns={key_col: "key"})
            out["n_bytes"] = pdf[blob_col].map(len)
            samples = pdf[blob_col].map(decoder)
            out["duration_s"] = samples.map(lambda a: len(a) / sample_rate)
            out["rms"] = samples.map(
                lambda a: float(np.sqrt(np.mean(np.square(a)))) if len(a) else 0.0
            )
            out["peak"] = samples.map(
                lambda a: float(np.max(np.abs(a))) if len(a) else 0.0
            )
            yield out

    return df.mapInPandas(_features, AUDIO_FEATURES_SCHEMA)


def audio_chunk_plan(
    df: DataFrame, chunk_s: int = 30, stride_s: int = 25
) -> DataFrame:
    """Audio chunking plumbing (the ASR/feature-extraction windowing): one
    row per overlapping chunk window [start_s, end_s) per payload,
    co-partitioned by key — the schema/partitioning contract for a stubbed
    audio decoder, exactly like frame_sample_plan for video. df needs
    (key, duration_s INT); windows start every stride_s while start <
    duration, ends clipped to the duration."""
    start = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("duration_s") - 1, F.lit(0)),
            F.lit(stride_s),
        )
    ).alias("start_s")
    return (
        df.select("key", "duration_s", start)
        .withColumn("end_s", F.least(F.col("start_s") + chunk_s, F.col("duration_s")))
        .select("key", "start_s", "end_s")
        .repartition("key")
    )


def image_patch_plan(
    df: DataFrame, patch: int = 32, stride: int = 32
) -> DataFrame:
    """ViT-style image patch-grid plumbing: one row per (x0, y0) patch per
    image, right/bottom edge patches clipped — the schema/partitioning
    contract a patch-embedding or tiled-decode UDF plugs into, exactly like
    audio_chunk_plan for audio. df needs (key, width INT, height INT);
    patches start every `stride` px while the origin is inside the image.
    Pure Catalyst (two sequence explodes) — map-side fan-out, no shuffle
    until the consumer asks for one."""
    xs = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("width") - 1, F.lit(0)), F.lit(stride))
    ).alias("x0")
    ys = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("height") - 1, F.lit(0)), F.lit(stride))
    ).alias("y0")
    return (
        df.select("key", "width", "height", xs)
        .select("key", "width", "height", "x0", ys)
        .select(
            "key",
            "x0",
            "y0",
            F.least(F.lit(patch), F.col("width") - F.col("x0")).alias("pw"),
            F.least(F.lit(patch), F.col("height") - F.col("y0")).alias("ph"),
        )
        .repartition("key")
    )
