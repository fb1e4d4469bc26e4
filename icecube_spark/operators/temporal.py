"""Temporal operators for time-stacked cubes (SURVEY §2 A2-A4).

Re-expresses the reference's pandas index manipulations
(icecube/bin/sar_cube/sar_datacube_metadata.py:168-255) as
shuffle-minimal DataFrame transformations. Every operator is
parameterized by column names so it runs over any time-keyed table
(acquisition catalogs, event streams, ...).

Scale notes: range filters push to the parquet scan; dedup and
bucketing shuffle once on (key, period); the resample grid is
generated per key with sequence()+explode — never on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400


def date_range_filter(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    """Keep rows with start <= ts <= end.

    Reference: select_requested_dates (sar_datacube_metadata.py:168-177).
    Pushed down to the scan as a min/max range predicate.
    """
    return df.where((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) <= F.lit(end)))


def value_range_filter(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Inclusive value-range filter.

    Reference: select_requested_angles (sar_datacube_metadata.py:179-186).
    """
    return df.where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))


def latest_per_period(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    period: Column | None = None,
    tiebreak: list[str] = (),
) -> DataFrame:
    """Within each (keys..., period) group keep the row with max ts.

    Reference: prune_temporal_overlap (sar_datacube_metadata.py:188-205)
    keeps the acquisition with the max acquisition_time per date. One
    shuffle on the group key; row_number avoids a self-join.
    """
    period = period if period is not None else F.to_date(F.col(ts_col))
    df = df.withColumn("__period", period)
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys, "__period").orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__period")
    )


def resample_to_grid(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    start,
    end,
    step_days: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Bucket rows onto a fixed N-day grid per key, keeping empty grid
    slots as gap rows (all-null aggregates, description='temporal_gap').

    Reference: set_temporal_resolution (sar_datacube_metadata.py:226-255)
    — asfreq to an N-day grid reindexed over [start, end], NaN rows for
    dates with no acquisition — plus the dummy-layer marker from
    get_dummy_data (sar_datacube_metadata.py:283-288).

    The grid is built distributed: distinct keys × an exploded
    sequence() of bucket timestamps, then one left join against the
    bucketed aggregates. Two shuffles total (agg + join), both on
    (key, bucket), and AQE broadcasts the grid side when small.
    """
    start_lit = F.lit(start).cast("timestamp")
    bucket_idx = F.floor(
        (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(start_lit))
        / (step_days * SECONDS_PER_DAY)
    ).cast("int")

    bucketed = (
        df.where((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) <= F.lit(end)))
        .withColumn("__bucket", bucket_idx)
        .groupBy(key_col, "__bucket")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[expr.alias(name) for name, expr in aggs.items()],
        )
    )

    grid = (
        df.select(key_col)
        .distinct()
        .crossJoin(
            df.sparkSession.range(1)
            .select(
                F.explode(
                    F.sequence(
                        start_lit,
                        F.lit(end).cast("timestamp"),
                        F.expr(f"INTERVAL {step_days} DAYS"),
                    )
                ).alias("bucket_start")
            )
            .withColumn(
                "__bucket",
                F.floor(
                    (F.unix_timestamp("bucket_start") - F.unix_timestamp(start_lit))
                    / (step_days * SECONDS_PER_DAY)
                ).cast("int"),
            )
        )
    )

    joined = grid.join(bucketed, [key_col, "__bucket"], "left")
    return (
        joined.withColumn(
            "description",
            F.when(F.col("__n").isNull(), F.lit("temporal_gap")).otherwise(
                F.lit("acquisition")
            ),
        )
        .drop("__bucket", "__n")
    )


def interpolate_grid(
    df: DataFrame, key_col: str, x_col: str, value_col: str
) -> DataFrame:
    """A4c — linear interpolation across gap slots of a resampled
    grid: each null value between two observations is replaced by the
    straight-line value at its x; leading/trailing gaps stay null
    (TimescaleDB ``interpolate()`` on top of the reference's NaN
    dummy layers, sar_datacube_metadata.py:226-255).

    Plan: one exchange on the key; the four IGNORE NULLS carries (prev
    and next observation value + x) share a single sort — Catalyst
    stacks the Window nodes on one exchange because the specs differ
    only in frame. Engine-exact: the interpolation formula is the same
    IEEE double expression in both engines, anchored on exact grid
    integers.
    """
    v = F.col(value_col)
    x = F.col(x_col)
    w = Window.partitionBy(key_col).orderBy(x_col)
    prev_w = w.rowsBetween(Window.unboundedPreceding, -1)
    next_w = w.rowsBetween(1, Window.unboundedFollowing)
    obs_v = F.when(v.isNotNull(), v)
    obs_x = F.when(v.isNotNull(), x)
    prev_v = F.last(obs_v, ignorenulls=True).over(prev_w)
    prev_x = F.last(obs_x, ignorenulls=True).over(prev_w)
    next_v = F.first(obs_v, ignorenulls=True).over(next_w)
    next_x = F.first(obs_x, ignorenulls=True).over(next_w)
    interp = prev_v + (next_v - prev_v) * (x - prev_x).cast("double") / (
        next_x - prev_x
    ).cast("double")
    return df.withColumn(
        "filled_value", F.coalesce(v, interp)
    ).withColumn(
        "fill_kind",
        F.when(v.isNotNull(), F.lit("observed"))
        .when(interp.isNotNull(), F.lit("interpolated"))
        .otherwise(F.lit("edge_gap")),
    )
