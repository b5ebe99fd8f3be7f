"""Multimodal columns: images/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the *decode* step is stubbed:
``decode_features`` computes a deterministic fake feature vector from the
payload bytes (sha256-seeded), clearly marked; ``real_decode=True`` raises
``NotImplementedError``. Everything Spark-side — schema, batch iteration,
partitioning, output shapes — is real and tested, so swapping in a real
codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int"
)

FEATURE_DIM = 32


def synth_media(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (payload = hash-derived bytes)."""
    df = spark.range(0, n, 1, partitions)
    kind = (
        F.when(F.pmod("id", F.lit(3)) == 0, "image")
        .when(F.pmod("id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    payload = F.unhex(
        F.concat(*[F.sha2(F.concat(F.lit(f"m{i}:"), F.col("id").cast("string")), 256) for i in range(4)])
    )  # 128 deterministic bytes
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (F.pmod("id", F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod("id", F.lit(480)) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        ((F.pmod("id", F.lit(900)) + 100) * 10).cast("int").alias("duration_ms"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: bytes ->
    FEATURE_DIM floats in [-1, 1) from a sha256 chain over the payload's
    lowercase-hex encoding (hex, not raw bytes, so the value-check oracle —
    DuckDB's sha256 only accepts VARCHAR — replicates it symbol-for-symbol)."""
    out: list[float] = []
    hexseed = payload.hex()
    while len(out) < FEATURE_DIM:
        hexseed = hashlib.sha256(hexseed.encode()).hexdigest()
        out.extend(int(hexseed[j : j + 2], 16) / 127.5 - 1.0 for j in range(0, 64, 2))
    return out[:FEATURE_DIM]


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """media -> (media_id, kind, features array<float>).

    STUB decode (see module docstring). The mapInPandas plumbing (Arrow
    batches in, bounded memory, no per-row Python at the Spark API level) is
    the real deliverable; the per-batch pandas map is where a vectorized
    decoder (PIL/torchaudio/decord) would slot in.
    """
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in this "
            "container; use real_decode=False for the deterministic stub"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(lambda b: _fake_features(bytes(b))),
                }
            )

    return media.mapInPandas(fn, schema="media_id long, kind string, features array<float>")


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning for image rows: computes target dims preserving aspect
    ratio (pure column math — the actual pixel resample is part of the
    stubbed decode). Non-images pass through untouched dims."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.withColumn(
        "target_width",
        F.when(F.col("kind") == "image", F.ceil(F.col("width") * scale)).otherwise(F.col("width")).cast("int"),
    ).withColumn(
        "target_height",
        F.when(F.col("kind") == "image", F.ceil(F.col("height") * scale)).otherwise(F.col("height")).cast("int"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp
    (explode of a generated sequence — no Python). Decode of each frame is
    the stubbed step."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return vids.select(
        "media_id", F.explode(ts).alias("frame_ts_ms")
    )
