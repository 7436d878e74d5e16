"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side schema, partitioning, Arrow batch
shape, and UDF signatures here are real and tested; the actual codec
work (JPEG decode, resampling, frame extraction) is STUBBED because the
sandbox has no image/audio libraries. Stubs are explicit:

- ``decode_image`` raises NotImplementedError unless
  ``deterministic_fake=True``, in which case it produces a seeded fake
  (pixel stats derived from xxhash of the bytes) so downstream plumbing
  (feature extraction, dedup on features) is testable end-to-end;
- swap the ``_fake_*`` functions for PIL/ffmpeg calls in production —
  the mapInPandas batch shape does not change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_DIM = 16


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stateless, partition-independent)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
            .cast("binary")
            .alias("payload"),
            F.struct(
                (F.pmod(F.xxhash64(F.lit(seed + 1), "id"), F.lit(1920)) + 16).cast("int").alias("width"),
                (F.pmod(F.xxhash64(F.lit(seed + 2), "id"), F.lit(1080)) + 16).cast("int").alias("height"),
                (F.pmod(F.xxhash64(F.lit(seed + 3), "id"), F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
                F.lit("application/x-fake").alias("mime"),
            ).alias("meta"),
        )
    )


def _fake_image_features(payload: bytes, dim: int = IMAGE_FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: hash-seeded unit
    vector. REPLACE with real decode (PIL -> resize -> model) in prod."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def extract_image_features(
    df: DataFrame, deterministic_fake: bool = False, dim: int = IMAGE_FEATURE_DIM
) -> DataFrame:
    """mapInPandas feature extraction over image payloads.

    Batch shape: input (media_id, payload), output (media_id,
    features array<float>). Partitioning is preserved — no shuffle;
    at scale the binary column is the IO bound, so repartition the
    source by file size before calling if batches skew."""

    def run(batches):
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decode requires PIL/cv2 (not in this sandbox); "
                    "pass deterministic_fake=True for the plumbing path"
                )
            feats = [
                _fake_image_features(p, dim).astype(np.float32).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    src = df.filter(F.col("kind") == "image").select("media_id", "payload")
    return src.mapInPandas(run, f"media_id long, features array<float>")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: computes the frame timestamps to
    extract per video from metadata (JVM-side); the actual pixel
    extraction is the stubbed decode step."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize geometry (scale factor + target dims) computed JVM-side;
    the pixel work is the stubbed decode step."""
    w, h = F.col("meta.width").cast("double"), F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_side)) / F.greatest(w, h), F.lit(1.0))
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        F.round(scale, 6).alias("scale"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
    )
