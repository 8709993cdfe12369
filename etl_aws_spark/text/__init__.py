"""Text-corpus operators for training-data pipelines (SURVEY §2.13 + north
star): exact/near deduplication, fingerprinting, language ID, quality
scoring, token statistics.

Design rule: every operator is a **pure column-expression pipeline** built
from Spark SQL higher-order functions (`transform`/`aggregate`/`slice` over
token arrays) — no explode-per-token, no Python UDFs, no shuffle until the
final per-document aggregation. Token hashes are md5-based so the DuckDB
oracles can reproduce them bit-for-bit (`_dialect.py` renders the same
expression for both engines).

At 100 TB: per-row HOF expressions scale linearly with zero shuffle;
the only exchanges are the LSH band group-bys, which shuffle a narrow
(band_key, doc_id) projection, never the text itself.
"""
