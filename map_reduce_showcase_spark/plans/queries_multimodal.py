"""Multimodal-column queries: binary payload plumbing through
Arrow-batched ``mapInPandas`` (decode stage stubbed deterministically
— see ``multimodal/binary_cols.py``), oracle-checked because the
fake decode is a pure function of payload length/content that the
SQL replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_media_meta, extract_frames, to_media_frame
from .registry import register, t


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(64 + strlen(text) % 577 AS INT) AS width,
           CAST(64 + strlen(text) % 419 AS INT) AS height,
           1 AS n_frames,
           md5(text) AS content_md5
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed media metadata via mapInPandas (the
    real 1:1 decode shape; pixel decode stubbed). Oracle replays the
    deterministic fake from byte length + md5. Docs are ASCII so
    strlen == octet_length."""
    media = to_media_frame(t(spark, sf_dir, "documents"), media_type="image")
    return decode_media_meta(media)


@register(
    "multimodal_frame_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames,
           CAST(strlen(text) - (ceil(strlen(text) / 64.0) - 1) * 64 AS BIGINT)
             AS min_frame_bytes
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (1:N explode inside mapInPandas, 64-byte
    pseudo-frames) then per-media frame accounting — the video/audio
    windowing shape with bounded Arrow batches."""
    media = to_media_frame(t(spark, sf_dir, "documents"), media_type="video")
    frames = extract_frames(media, every_n_bytes=64)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        # every frame is 64 bytes except the trailing remainder, so
        # min == the last frame's size (== 64 on exact multiples)
        F.min(F.length(F.col("frame_bytes"))).cast("long").alias("min_frame_bytes"),
    )
