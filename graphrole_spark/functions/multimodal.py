"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a small typed
metadata struct; decode / feature-extraction / resize / frame-sample run
as Arrow-batched ``mapInPandas`` operators so each executor processes
whole record batches.

The actual codec step is STUBBED: the decode libraries (Pillow,
ffmpeg, torchaudio, …) are not in this container, so ``decode_mode``
selects either ``"fake"`` (a deterministic, content-derived feature
vector — keeps the full pipeline testable end to end) or ``"strict"``
(raises ``NotImplementedError`` at the executor, marking exactly where
the real codec plugs in). The Spark-side contract — schemas, batch
iteration, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(60000)) + 100).cast("int").alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: bytes of
    the payload digest, scaled to [0, 1)."""
    digest = hashlib.sha256(payload or b"").digest()
    reps = (dim // len(digest)) + 1
    raw = (digest * reps)[:dim]
    return [b / 256.0 for b in raw]


def extract_media_features(
    media: DataFrame, decode_mode: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize each media row → (media_id, kind, feature array).

    ``decode_mode="strict"`` raises NotImplementedError where a real
    codec would run — the surrounding plan (Arrow batches, schema,
    partition preservation) is production-shaped either way.
    """
    if decode_mode not in ("fake", "strict"):
        raise ValueError("decode_mode must be 'fake' or 'strict'")

    out_schema = "media_id long, kind string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "media codecs unavailable in this environment; plug the "
                    "real decoder here (payload -> ndarray)"
                )
            feats = [
                _fake_features(p if isinstance(p, (bytes, bytearray)) else bytes(p or b""))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame timestamp
    (JVM-side sequence explode; the decode of each frame is the stubbed
    step above). Shows the fan-out shape a real video pipeline uses."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
