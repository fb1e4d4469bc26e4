"""Sessionization and windowed aggregation (SURVEY §2 C2-C4).

Session assignment is the classic lag+cumsum: one shuffle on the key,
one sort, no self-joins. Rolling aggregates keep their reductions in
decimal (see functions/parity.py) because window frames may be summed
in different associations by different engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from icecube_spark.functions.parity import dsum


def sessionize(
    df: DataFrame, ts_col: str, key_col: str, gap_minutes: int = 30
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap
    from the previous event exceeds `gap_minutes`.
    Adds `session_id` (1-based per key).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    new_session = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
        > gap_s
    )
    return df.withColumn(
        "session_id",
        F.sum(F.when(new_session | F.lag(ts_col).over(w).isNull(), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Tumbling-window aggregate, shared verbatim by the batch queries
    and the Structured Streaming pipeline (streaming/events.py) — the
    batch result is the streaming pipeline's oracle.
    """
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .withColumn("window_start", F.col("win.start"))
        .drop("win")
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    bucket: str = "day",
) -> DataFrame:
    """C10 — OHLC bars: open/high/low/close + volume per (group,
    time-bucket). Open/close are selected by min/max over a
    (ts, value) struct — lexicographic struct ordering makes the
    tiebreak on equal timestamps deterministic (min value wins for
    open, max for close), so the result is engine-independent and
    partial-aggregable: one shuffle on the group key, map-side
    combine does most of the work at scale.
    """
    s = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    return (
        df.groupBy(*group_cols, F.date_trunc(bucket, ts_col).alias("bucket"))
        .agg(
            F.min(s)["v"].alias("open"),
            F.max(F.col(value_col)).alias("high"),
            F.min(F.col(value_col)).alias("low"),
            F.max(s)["v"].alias("close"),
            dsum(value_col).alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def rolling_window_agg(
    df: DataFrame,
    order_num_col: str,
    value_col: str,
    preceding: int,
    partition_cols: list[str] = (),
) -> DataFrame:
    """Sliding RANGE-frame mean over the `preceding`+current range of
    `order_num_col`. The frame sum stays in decimal so the result is
    association-order independent (bit-exact vs any engine).
    Adds `rolling_avg` and `n_in_window`.
    """
    base = Window.partitionBy(*partition_cols).orderBy(F.col(order_num_col))
    w = base.rangeBetween(-preceding, 0)
    dec_sum = F.sum(F.col(value_col).cast("decimal(18,8)")).over(w).cast("double")
    n = F.count(value_col).over(w)
    return df.withColumn("rolling_avg", dec_sum / n).withColumn("n_in_window", n)
