"""Multimodal column handling: image/audio/video as opaque binary columns.

The Spark-side plumbing is fully real — schema, partition sizing, Arrow
batch shape, mapInPandas signatures — while the codec step itself is stubbed
(image/audio libraries are not in this container): ``decode_image`` either
raises NotImplementedError (strict mode) or produces a deterministic fake
derived from the bytes, so the distributed pipeline around it is testable.

Scale notes: binary payloads dominate row size, so
- `spark.sql.files.maxPartitionBytes` governs scan parallelism (set in
  session.py);
- feature extraction uses ``mapInPandas`` (Arrow batches, one Python worker
  per core, streaming iterator — no full-partition materialization);
- metadata is a typed struct column so filters on width/height/duration
  prune parquet row groups WITHOUT touching the blob column (columnar wins).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried alongside every media blob.
MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),   # image|audio|video
        StructField("format", StringType()),       # png|jpeg|wav|mp4|...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("size_bytes", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", StringType()),      # md5 content digest
        StructField("n_bytes", LongType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ]
)

STRICT_DECODE = False  # flip to surface NotImplementedError instead of fakes


def decode_image(content: bytes) -> tuple[int, int]:
    """STUB: real decode needs an image library not present in this
    container. Deterministic fake: dimensions derived from the content hash
    so downstream logic (resize ratios, filters) is exercised realistically.
    """
    if STRICT_DECODE:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this environment"
        )
    h = hashlib.md5(content or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192  # (w, h) in [64, 256)


def attach_meta(df: DataFrame, content_col: str = "content", media_type: str = "image") -> DataFrame:
    """Attach the typed metadata struct (cheap fields computed JVM-side;
    decode-dependent fields left NULL until extract_features)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(content_col)).cast("long").alias("size_bytes"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over the blob column via mapInPandas.

    The iterator contract keeps memory at one Arrow batch regardless of
    partition size — the correct shape for multi-GB media partitions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            dims = [decode_image(c if c is not None else b"") for c in content]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "feature": [
                        hashlib.md5(c if c is not None else b"").hexdigest()
                        for c in content
                    ],
                    "n_bytes": [len(c) if c is not None else 0 for c in content],
                    "thumb_w": [d[0] for d in dims],
                    "thumb_h": [d[1] for d in dims],
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) to
    extract, derived from duration metadata — the distribution-side half of
    frame sampling, with the actual decode behind the same stub boundary."""
    return (
        df.select("media_id", F.col("meta.duration_ms").alias("dur"))
        .filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("dur") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
