"""Binary-column operators: metadata, decode, feature extraction, resize,
frame sampling."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id bigint, payload binary, mime string, n_bytes bigint, digest string"
)

FEATURE_SCHEMA = (
    "asset_id bigint, mime string, n_bytes bigint, width int, height int, "
    "n_channels int, mean_intensity double"
)

FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_digest string"


def attach_media_metadata(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Derive the typed metadata columns every media table carries: byte
    size, content digest, mime tag. Pure expressions — metadata derivation
    never leaves the JVM."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(payload_col).cast("bigint").alias("n_bytes"),
        F.md5(payload_col).alias("digest"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decode (PIL absent here): derive
    (width, height, channels, mean_intensity) from the content hash, so the
    full pipeline — batching, schema, downstream aggregation — runs
    end-to-end with stable outputs."""
    h = hashlib.sha256(payload).digest()
    width = 32 + h[0] % 224
    height = 32 + h[1] % 224
    channels = 3
    mean_intensity = h[2] / 255.0
    return width, height, channels, mean_intensity


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract media payloads via ``mapInPandas``: Arrow
    batches of (asset_id, payload, …) stream through the Python worker; one
    output row per asset. Real decoders (PIL) plug into the same loop via
    the import-try; batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
    bounded by batch_size × max_asset_size."""
    try:  # pragma: no cover - not installed in this environment
        from PIL import Image  # noqa: F401
        import io

        def decode(payload: bytes):
            with Image.open(io.BytesIO(payload)) as im:
                import numpy as np

                arr = np.asarray(im.convert("RGB"), dtype="float64")
                return im.width, im.height, 3, float(arr.mean() / 255.0)

    except ImportError:
        decode = _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "mime": pdf["mime"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_intensity": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled
    frame (UDTF shape — rows expand). The stub samples byte windows; a real
    av/ffmpeg decoder plugs into the same mapInPandas loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                n = min(max_frames, max(1, len(data) // every_n_bytes))
                for i in range(n):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(aid)
                    idxs.append(i)
                    digs.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame_digest": digs})

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
