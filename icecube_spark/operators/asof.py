"""Scalable as-of join (SURVEY §2 C1).

Generalizes the reference's time-axis alignment (layers matched to
the nearest acquisition date, sar_datacube.py:108-160) into the
standard time-series primitive: for each left row, attach the most
recent right row with right.ts <= left.ts per key.

Spark-first plan: UNION the two sides with a marker, one shuffle+sort
on (key, ts), then `last(value, ignorenulls=True)` over the ordered
window carries the latest right row forward onto every left row. No
per-row probe, no range self-join — wall-clock is one sort per key
partition, which survives a 100x scale-up (AQE splits skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_key: str,
    right_key: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join. Right columns arrive null when no right row
    precedes the left row. Ties on right_ts resolve to the largest
    `tiebreak` value (deterministic).
    """
    r_payload = [c for c in right.columns if c != right_key]
    l_payload = [c for c in left.columns if c not in (left_key, left_ts)]

    r = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c) for c in r_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
    )
    l = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in r_payload],
        *[F.col(c) for c in l_payload],
    )

    # Order: time, then right-before-left at equal time (<= semantics),
    # then tiebreak so the largest tiebreak among equal timestamps wins.
    order = [F.col("__t"), F.col("__is_left")]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = r.unionByName(l)
    carried = unioned.select(
        "__key",
        "__t",
        "__is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in r_payload],
        *l_payload,
    )
    return (
        carried.where(F.col("__is_left") == 1)
        .withColumnRenamed("__key", left_key)
        .withColumnRenamed("__t", left_ts)
        .drop("__is_left")
    )
