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


@query(
    "multimodal_feature_extract",
    # the deterministic decode stub derives features from the sha256 digest,
    # which DuckDB can replay byte-for-byte (ASCII corpus: sha256(text) ==
    # sha256(utf8 bytes)) — so even the STUB path gets a value-hash oracle;
    # a real PIL decode would fall back to rows-only.
    oracle="""
    SELECT doc_id AS asset_id,
           'application/octet-stream' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(32 + ('0x' || substr(sha256(text), 1, 2))::INT % 224 AS INT) AS width,
           CAST(32 + ('0x' || substr(sha256(text), 3, 2))::INT % 224 AS INT) AS height,
           3 AS n_channels,
           round(('0x' || substr(sha256(text), 5, 2))::INT / 255.0, 6) + 0.0
             AS mean_intensity
    FROM documents
    """,
    category="multimodal",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode + feature extraction over Arrow batches (decode
    stubbed deterministically — no codecs in this container; see
    multimodal/ops.py). The stub's hash-derived features are mirrored by
    the oracle, so the whole Arrow pipeline is value-checked."""
    out = ops.extract_features(_media(spark, sf_dir))
    return out.select(
        "asset_id", "mime", "n_bytes", "width", "height", "n_channels",
        (F.round(F.col("mean_intensity"), 6) + F.lit(0.0)).alias("mean_intensity"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id AS asset_id, text,
             least(8, greatest(1, octet_length(encode(text)) // 64)) AS n_frames
      FROM documents
    )
    SELECT asset_id, CAST(i AS INT) AS frame_idx,
           md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_digest
    FROM f CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) s
    WHERE i < n_frames
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (UDTF shape: rows expand per asset) through the same
    Arrow pipeline. The stub samples 64-byte windows; ASCII corpus means
    byte windows ≡ char windows, so DuckDB mirrors the digests exactly."""
    return ops.sample_frames(_media(spark, sf_dir))
