"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (north star).

Media rides as an opaque ``binary`` payload column plus a typed metadata
struct — the lakehouse-standard layout (one row per asset, bytes inline for
small assets, URI + bytes=null for large ones). Everything Spark-side is
real and tested: schema, partitioning, Arrow batch shape, mapInPandas
signatures, metadata derivation. The codec step itself (JPEG decode, audio
resample, video frame extraction) is stubbed behind an import-try —
PIL/torchaudio/av are not in this container — with a deterministic
hash-derived fake so the pipeline is end-to-end runnable and its outputs
are stable for tests and oracles.
"""
