"""etl_aws_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference ETL project (`ederray/etl-aws`, a B3 stock-market batch pipeline:
REST ingest -> partitioned parquet lake -> Spark refine job -> per-group
feature engineering / modeling), re-expressed Spark-first:

- declarative DataFrame/SQL plans optimized by Catalyst (no hand scheduling)
- built-in JVM expressions in the hot path; Arrow-batched ``applyInPandas``
  only where semantics genuinely require per-group imperative code
- partition-pruned scans, broadcast dimension joins, dynamic partition
  overwrite, single-action pipelines with ``observe()`` checkpoints
- extension operators for LLM-scale data pipelines: dedup (exact/minhash/
  simhash), similarity search, text analysis, multimodal column plumbing

Package layout mirrors SURVEY.md §2:
    sources/    scans + sinks (parquet / csv / rest-batch / streaming)
    functions/  scalar expression library (key-normalize, cyclic encode, ...)
    operators/  relational + window + null-handling + dedup operators
    ml/         per-group model ops (numpy-based; no sklearn dependency)
    text/       text analysis + dedup operators
    similarity/ embedding similarity / ANN
    plans/      composed pipelines (the refined-layer job)
    streaming/  structured-streaming ingest layer
    suite/      the query registry binding operators to the test tables
"""

__version__ = "0.1.0"

from etl_aws_spark.session import get_session  # noqa: F401
