"""Structured Streaming over the events stream (SURVEY §2 C5).

The stream applies the SAME `tumbling_agg` transformation the batch
query uses (queries/timeseries_queries.py:window_tumbling), so the
batch result is the streaming pipeline's oracle — one code path,
two execution modes. Watermarking bounds state for late data; at
scale the shuffle is on (window, event_type), the same key the
batch plan uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from icecube_spark.functions.parity import dsum
from icecube_spark.operators.timeseries import tumbling_agg

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ns ts → µs, as in
    catalog.load)."""
    # the file source wants a directory: stream the sf dir, globbed to
    # the events file
    sdf = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def tumbling_counts(df: DataFrame, watermark: str | None = "1 hour") -> DataFrame:
    """Windowed aggregation shared by batch and streaming."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    out = tumbling_agg(
        df,
        "ts",
        "1 hour",
        ["event_type"],
        {"n_events": F.count(F.lit(1)), "sum_value": dsum("value")},
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


def run_available_now(spark: SparkSession, sf_dir: str, table_name: str) -> None:
    """Drain the whole file source once (availableNow) into a memory
    sink — the streaming twin of the batch window_tumbling query.
    Complete output mode: windows finalize when the source drains.
    """
    sdf = read_events_stream(spark, sf_dir)
    q = (
        tumbling_counts(sdf, watermark="1 hour")
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
