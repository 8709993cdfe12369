"""Structured Streaming ingest layer (SURVEY §2.11).

The reference's "streaming" is an EventBridge→Lambda daily batch
micro-ingest (`src/lambda_predict/lambda_function.py:21-101`: fetch
yesterday's quotes, land one Hive partition, dedup on re-run). The
Spark-native equivalent:

- file-source ``readStream`` on the raw partition tree (schema enforced,
  ``AvailableNow`` trigger for catch-up ≡ the daily batch),
- event-time watermark for late quote corrections,
- stateful ``dropDuplicates`` within the watermark ≡ the re-run
  duplicate protection,
- ``foreachBatch`` merge into the refined layer with dynamic partition
  overwrite ≡ the Glue job's write, minus the clobbering.
"""
