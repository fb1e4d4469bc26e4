"""Streaming exactly-once ingestion dedup (SURVEY §2 C80s).

At-least-once delivery replays events; the ingest edge must drop the
replays without unbounded state. `streaming_ingest_dedup` is the
standard recipe — watermark bounds the dedup state to the late-data
horizon, `dropDuplicates` on the event key discards replays inside
it. The batch twin (`batch_ingest_dedup`) is plain DISTINCT over the
same union, so the streaming drain is exactly comparable: identical
surviving event sets.

At 100 TB the dedup state is a per-partition hash of keys within the
watermark horizon only — delivery-window-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_replay(events: DataFrame) -> DataFrame:
    """Union the stream with a deterministic replayed subset (every
    97th event re-delivered) — the at-least-once simulation."""
    replay = events.where(F.col("event_id") % 97 == 0)
    return events.unionAll(replay)


def streaming_ingest_dedup(events_stream: DataFrame) -> DataFrame:
    src = _with_replay(
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        src.withWatermark("ts", "1 day")
        .dropDuplicates(["event_id"])
        .select("event_id", "ts", "user_id", "event_type")
    )


def batch_ingest_dedup(events: DataFrame) -> DataFrame:
    src = _with_replay(events.withColumn("ts", F.col("ts").cast("timestamp")))
    return (
        src.groupBy("event_id")
        .agg(
            F.min("ts").alias("ts"),
            F.min("user_id").alias("user_id"),
            F.min("event_type").alias("event_type"),
        )
    )
