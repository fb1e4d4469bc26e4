"""Scalable as-of join (SURVEY §2 C1).

Generalizes the reference's time-axis alignment (layers matched to
the nearest acquisition date, sar_datacube.py:108-160) into the
standard time-series primitive: for each left row, attach the most
recent right row with right.ts <= left.ts per key (direction
"backward"), the earliest right row with right.ts >= left.ts
("forward"), or whichever is closer in time ("nearest", ties to
backward) — with an optional tolerance cutting off matches too far
away. Same surface as pandas merge_asof / kdb aj / QuestDB ASOF.

Spark-first plan: UNION the two sides with a marker, one shuffle on
the key, then `last(value, ignorenulls=True)` over the time-ordered
window carries the latest right row forward onto every left row. No
per-row probe, no range self-join — wall-clock is one sort per key
partition, which survives a 100x scale-up (AQE splits skewed keys).
"nearest" adds a second in-partition sort (descending) over the SAME
shuffle — still one exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _ticks(col: str, dtype) -> Column:
    """Exact integer ticks for time-distance math: microseconds for
    timestamps, days for dates, the raw value for numerics. Integer
    diffs are exact where double subtraction of epoch-scale values
    is not."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        # cast: unix_micros rejects TIMESTAMP_NTZ (how the harness
        # parquet loads); under the UTC session tz the cast is a pure
        # reinterpretation, so ticks are identical for both types.
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dtype, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01").cast("date")).cast("bigint")
    return F.col(col).cast("bigint")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_key: str,
    right_key: str,
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join. Right columns arrive null when no right row
    qualifies. Ties on right_ts resolve to the largest `tiebreak`
    value (deterministic); "nearest" resolves equal distances to the
    backward match. `tolerance` is in ticks: microseconds for
    timestamp axes, days for dates, plain units for numerics.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    r_payload = [c for c in right.columns if c != right_key]
    l_payload = [c for c in left.columns if c not in (left_key, left_ts)]
    ts_type = left.schema[left_ts].dataType

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
    unioned = r.unionByName(l).withColumn("__tick", _ticks("__t", ts_type))

    # Order: time, then right-before-left at equal time (<= / >=
    # semantics), then tiebreak so the largest tiebreak among equal
    # timestamps wins the carry. The forward window is the mirror:
    # descending time over the SAME key partitioning — one exchange
    # feeds both sorts.
    tb = [F.col(tiebreak).asc_nulls_first()] if tiebreak is not None else []
    wb = (
        Window.partitionBy("__key")
        .orderBy(F.col("__tick").asc(), F.col("__is_left").asc(), *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__key")
        .orderBy(F.col("__tick").desc(), F.col("__is_left").asc(), *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carried_cols(w, suffix: str) -> list[Column]:
        cols = [
            F.last(c, ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in r_payload
        ]
        cols.append(
            F.last(
                F.when(F.col("__is_left") == 0, F.col("__tick")), ignorenulls=True
            )
            .over(w)
            .alias(f"__rt{suffix}")
        )
        return cols

    def finish(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col("__is_left") == 1)
            .select("__key", "__t", *r_payload, *l_payload)
            .withColumnRenamed("__key", left_key)
            .withColumnRenamed("__t", left_ts)
        )

    if direction in ("backward", "forward"):
        w = wb if direction == "backward" else wf
        carried = unioned.select(
            "__key", "__t", "__is_left", "__tick",
            *carried_cols(w, "__x"),
            *l_payload,
        )
        dist = (
            F.col("__tick") - F.col("__rt__x")
            if direction == "backward"
            else F.col("__rt__x") - F.col("__tick")
        )
        ok = dist <= F.lit(tolerance) if tolerance is not None else F.lit(True)
        return finish(
            carried.select(
                "__key", "__t", "__is_left",
                *[F.when(ok, F.col(f"{c}__x")).alias(c) for c in r_payload],
                *l_payload,
            )
        )

    # nearest: both carries share the one exchange
    both = unioned.select(
        "__key", "__t", "__is_left", "__tick",
        *carried_cols(wb, "__b"),
        *carried_cols(wf, "__f"),
        *l_payload,
    )
    db = F.col("__tick") - F.col("__rt__b")
    df_ = F.col("__rt__f") - F.col("__tick")
    if tolerance is not None:
        db = F.when(db <= F.lit(tolerance), db)
        df_ = F.when(df_ <= F.lit(tolerance), df_)
    use_b = db.isNotNull() & (df_.isNull() | (db <= df_))
    return finish(
        both.select(
            "__key", "__t", "__is_left",
            *[
                F.when(use_b, F.col(f"{c}__b"))
                .when(df_.isNotNull(), F.col(f"{c}__f"))
                .alias(c)
                for c in r_payload
            ],
            *l_payload,
        )
    )
