"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video land as ``binary`` columns with a metadata struct; decode /
feature-extract run as Arrow-batched pandas functions over ``mapInPandas`` —
the ONLY place this engine leaves the JVM, and it does so in columnar
batches, never per-row Python (BASELINE.json input_hint mandate).

The decode step itself is STUBBED: the sandbox has no image/audio libs, so
``decode=fake`` produces deterministic md5-derived features and
``decode=real`` raises NotImplementedError with the integration point
documented. Everything AROUND the stub — schema, batch iteration, partition
sizing — is real and tested; swapping in PIL/torchaudio is a one-function
change at the marked site.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_fake_payloads(media: DataFrame) -> DataFrame:
    """Deterministic pseudo-binary payloads for the media dim (md5-expanded
    bytes; stands in for an object-store fetch, which at scale is a
    mapInPandas over a ref-partitioned frame so each task streams one
    object-store prefix)."""
    return media.select(
        "media_ref",
        "mime",
        F.to_binary(F.repeat(F.md5(F.col("media_ref")), 4), F.lit("hex")).alias("payload"),
        (F.pmod(F.xxhash64("media_ref"), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("media_ref", F.lit(1)), F.lit(64)) + 16).cast("int").alias("height"),
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic fake 'decoder': md5 of the payload's hex rendering →
    FEATURE_DIM floats in [0,1). Hashing the hex string (not the raw bytes)
    keeps the fake oracle-expressible in DuckDB (whose md5 is VARCHAR-only)
    while the operator still consumes the real binary column.

    REAL-DECODE INTEGRATION POINT: replace this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + pooling. Signature and the
    mapInPandas plumbing below stay unchanged."""
    h = hashlib.md5(bytes(payload or b"").hex().encode("ascii")).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_media_features(media_with_payload: DataFrame, decode: str = "fake") -> DataFrame:
    """(media_ref, mime, features: array<double>) via Arrow-batched
    mapInPandas. Batches arrive as pandas DataFrames sized by
    spark.sql.execution.arrow.maxRecordsPerBatch — decode cost is amortized
    per batch, and partition count (not row count) bounds Python overhead."""
    if decode == "real":
        raise NotImplementedError(
            "real media decode needs image/audio libs not present in this "
            "container; see _fake_decode_features for the integration point"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("mime", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "mime": pdf["mime"],
                    "features": pdf["payload"].map(_fake_decode_features),
                }
            )

    return media_with_payload.select("media_ref", "mime", "payload").mapInPandas(
        batches, out_schema
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_ref, frame_idx). Pure expression — the expensive decode stage
    consumes this plan via extract_media_features. Frame count is faked
    deterministically from the ref hash (a real pipeline reads it from
    container metadata)."""
    n_frames = (F.pmod(F.xxhash64("media_ref"), F.lit(300)) + 1).cast("int")
    return (
        media.where(F.col("mime") == "video/mp4")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
