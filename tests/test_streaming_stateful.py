"""applyInPandasWithState: incremental EWMA equals the batch fold, and
state persists across micro-batches (checkpoint-recovered restart)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("x", T.DoubleType()),
    ]
)


def _run_stream(spark, landing, ckpt, out_dir):
    from etl_aws_spark.streaming import stateful

    stream = spark.readStream.schema(SCHEMA).parquet(landing)
    ewma = stateful.ewma_stateful(stream, "k", "ts", "x", span=12)
    q = (
        ewma.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_ewma_matches_batch_fold(spark, tmp_path):
    landing, ckpt, out = (str(tmp_path / d) for d in ("in", "ck", "out"))
    os.makedirs(landing)
    rows = [
        (k, datetime.datetime(2024, 1, 1, 9, i), float(100 + 3 * i + k))
        for k in (1, 2)
        for i in range(10)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    _run_stream(spark, landing, ckpt, out)
    got = {
        (r.key, r.ts): r.ewma for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 20
    # batch fold reference (identical recurrence to operators/timeseries.macd)
    a, b = 2.0 / 13.0, 11.0 / 13.0
    for k in (1, 2):
        acc = None
        for i in range(10):
            x = float(100 + 3 * i + k)
            acc = x if acc is None else a * x + b * acc
            assert got[(k, datetime.datetime(2024, 1, 1, 9, i))] == pytest.approx(acc, rel=1e-12)

    # second batch: restart from the checkpoint — per-key state carries
    # over, so the accumulator continues from the first run (not reset)
    more = [
        (1, datetime.datetime(2024, 1, 1, 10, i), float(200 + i)) for i in range(3)
    ]
    spark.createDataFrame(more, SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    _run_stream(spark, landing, ckpt, out)
    got2 = {
        r.ts: r.ewma for r in spark.read.parquet(out).filter("key = 1").collect()
    }
    acc = None
    for i in range(10):
        x = float(100 + 3 * i + 1)
        acc = x if acc is None else a * x + b * acc
    for i in range(3):
        x = float(200 + i)
        acc = a * x + b * acc
        assert got2[datetime.datetime(2024, 1, 1, 10, i)] == pytest.approx(acc, rel=1e-12)
