"""Multimodal column operators (north star; no reference analogue).

Images/audio/video ride as opaque ``binary`` columns with a typed
``meta`` struct (schemas.MEDIA_SCHEMA). The Spark-side plumbing —
schema, partition-friendly batch iteration, Arrow batch shapes, UDF
signatures — is real and tested; the actual codec work is stubbed
(image/audio libraries are not in this container) behind
``DecodeNotAvailableError`` plus a deterministic fake used by tests.

Scale design: decode/feature-extract runs via ``mapInPandas`` so each
task streams Arrow batches (bounded memory per batch regardless of blob
sizes); binary payloads never pass through a shuffle — extract features
first, shuffle the small feature vectors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.schemas import MEDIA_SCHEMA


class DecodeNotAvailableError(NotImplementedError):
    """Raised by the real-decoder slot: codec libraries (PIL/ffmpeg/
    librosa) are not available in this environment."""


def decode_image_real(content: bytes) -> np.ndarray:  # pragma: no cover
    raise DecodeNotAvailableError(
        "image decode requires PIL/cv2 — plug the real decoder in here; "
        "tests use decode_image_fake"
    )


def decode_image_fake(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixel grid seeded
    by the payload hash (stable across runs/processes)."""
    seed = np.frombuffer(content[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(max(1, height), max(1, width)), dtype=np.uint8)


def synthetic_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media fixture (binary payload + typed meta)."""
    rows = []
    for i in range(n):
        payload = bytes([(i * 7 + j) % 256 for j in range(128)])
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                (32 + i % 8, 16 + i % 4, 1000 * (1 + i % 5), 16000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_image_features(media: DataFrame, decoder=decode_image_fake) -> DataFrame:
    """Per-image features via ``mapInPandas``: mean/std of decoded
    pixels + payload size. One Arrow batch in, one (smaller) feature
    batch out — the pattern a real embedding extractor follows."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            if not len(imgs):
                continue
            feats = []
            for row in imgs.itertuples():
                w = row.meta["width"] if row.meta else 1
                h = row.meta["height"] if row.meta else 1
                px = decoder(bytes(row.content), int(w or 1), int(h or 1))
                feats.append(
                    (row.media_id, len(row.content), float(px.mean()), float(px.std()), px.shape[1], px.shape[0])
                )
            yield pd.DataFrame(
                feats, columns=["media_id", "n_bytes", "px_mean", "px_std", "width", "height"]
            )

    return media.mapInPandas(
        per_batch,
        schema="media_id long, n_bytes long, px_mean double, px_std double, width int, height int",
    )


@query("multimodal_image_features", oracle=None, tags=("multimodal", "udf"))
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star: image decode → feature extraction over mapInPandas.
    The decode is the deterministic fake (codec libs absent); the Arrow
    batch shape, schema, and partition-streaming plumbing are the real
    production pattern. Rows-only check (pixel stats come from the
    seeded fake decoder, not SQL-expressible)."""
    return extract_image_features(synthetic_media_df(spark))


@query(
    "multimodal_frame_sample",
    oracle="""
        SELECT CAST(i AS BIGINT) AS media_id,
               CAST(unnest(range(0, 1000 * (1 + i % 5) + 1, 500)) AS BIGINT) AS frame_ts_ms
        FROM range(64) t(i) WHERE i % 3 = 2
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star: video frame-timestamp sampling (every 500 ms) from
    the typed meta struct — JVM-side ``sequence``+``explode`` BEFORE any
    decode so frame tasks parallelize. The oracle re-derives the same
    frame grid from the synthetic fixture's arithmetic."""
    return sample_video_frames(synthetic_media_df(spark), every_ms=500)


def sample_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing: compute frame timestamps JVM-side from
    the meta struct (``sequence``), one row per sampled frame; the
    (stubbed) decode of each frame would ride the same mapInPandas
    pattern as images. The explode happens BEFORE decode so frame tasks
    parallelize."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
