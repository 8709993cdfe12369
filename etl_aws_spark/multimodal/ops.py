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


def encode_bmp24(arr) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bpp BMP
    (BITMAPINFOHEADER, BI_RGB, bottom-up, 4-byte row padding) — pure
    numpy/struct, no imaging library. Used to synthesize a real decodable
    corpus in tests and queries."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    row = w * 3
    stride = (row + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row] = arr[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    pixels = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + dib + pixels


def decode_bmp24(payload: bytes):
    """Decode an uncompressed 24-bpp BI_RGB BMP to an (H, W, 3) uint8 RGB
    array — dependency-free (numpy slicing over the pixel buffer). Raises
    ValueError on anything that is not strictly this format, so callers can
    fall back; validation checks magic, header size, bpp, compression, and
    that the buffer really contains stride x height bytes (a text payload
    that happens to start with 'BM' cannot pass)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError("unsupported DIB header")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0 or w > 1 << 16 or abs(h) > 1 << 16:
        raise ValueError("not uncompressed 24-bpp")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(payload) or off < 54:
        raise ValueError("truncated pixel buffer")
    buf = np.frombuffer(payload, dtype=np.uint8, offset=off, count=stride * h)
    img = buf.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if bottom_up:
        img = img[::-1]
    return img


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

        def pil_decode(payload: bytes):
            with Image.open(io.BytesIO(payload)) as im:
                import numpy as np

                arr = np.asarray(im.convert("RGB"), dtype="float64")
                return im.width, im.height, 3, float(arr.mean() / 255.0)

    except ImportError:
        pil_decode = None

    def decode(payload: bytes):
        # Real pixel decode for the dependency-free format first: an
        # uncompressed 24-bpp BMP decodes from actual pixel data (mean
        # intensity as exact integer sum / (n*255), deterministic across
        # engines). Anything else goes to PIL when present, else the
        # declared deterministic stub.
        if payload[:2] == b"BM":
            try:
                img = decode_bmp24(payload)
                h, w = img.shape[0], img.shape[1]
                return w, h, 3, float(int(img.sum(dtype="int64"))) / (img.size * 255.0)
            except ValueError:
                pass
        if pil_decode is not None:  # pragma: no cover
            try:
                return pil_decode(payload)
            except Exception:
                pass
        return _decode_stub(payload)

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
