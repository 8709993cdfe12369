"""North-star multimodal queries: binary payload columns synthesized from
the documents fixture (UTF-8 bytes of the text stand in for media bytes —
the container has no codecs, and the plumbing is the tested surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.multimodal import ops
from etl_aws_spark.registry import load, query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payload = docs.withColumn("payload", F.encode("text", "UTF-8"))
    return ops.attach_media_metadata(payload, "doc_id", "payload", mime="application/octet-stream")


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           'application/octet-stream' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    category="multimodal",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column (size/digest/mime) —
    pure JVM expressions. (The oracle digests the text; the engine digests
    its UTF-8 bytes — identical for this corpus by construction.)"""
    return _media(spark, sf_dir).select("asset_id", "mime", "n_bytes", "digest")


@query("multimodal_feature_extract", oracle=None, category="multimodal")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode + feature extraction over Arrow batches (decode
    stubbed deterministically — no codecs in this container; see
    multimodal/ops.py). Rows-only: one feature row per asset, stable values."""
    return ops.extract_features(_media(spark, sf_dir))


@query("multimodal_frame_sample", oracle=None, category="multimodal")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (UDTF shape: rows expand per asset) through the same
    Arrow pipeline. Rows-only: ≤8 frames per asset, deterministic digests."""
    return ops.sample_frames(_media(spark, sf_dir))
