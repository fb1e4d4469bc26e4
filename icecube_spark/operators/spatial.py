"""Spatial overlap operators (SURVEY §2 A7).

Reference: select_overlapping_rasters
(icecube/bin/sar_cube/sar_datacube_metadata.py:207-224) keeps rasters
whose extent polygon intersects the extent of the earliest raster.

Spark-first form: the primary is selected with a global min (tiny —
one row), broadcast to every partition, and the intersection test is
a pure column predicate, so the big side never shuffles. Provided in
1-D (intervals) and 2-D (bounding boxes); real polygon predicates
would slot in the same broadcast shape via a geometry UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def overlap_with_primary_1d(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Keep rows whose [lo, hi] interval intersects the interval of the
    primary row = first row under `order_cols` ordering (the reference's
    "earliest acquisition"). Intervals [a,b],[c,d] intersect iff
    a <= d AND c <= b.
    """
    primary = (
        df.select(
            F.col(lo_col).alias("__p_lo"),
            F.col(hi_col).alias("__p_hi"),
            *[F.col(c) for c in order_cols],
        )
        .orderBy(*order_cols)
        .limit(1)
        .select("__p_lo", "__p_hi")
    )
    return (
        df.join(F.broadcast(primary))
        .where((F.col(lo_col) <= F.col("__p_hi")) & (F.col("__p_lo") <= F.col(hi_col)))
        .drop("__p_lo", "__p_hi")
    )


def bbox_intersects(
    xmin_a: Column, ymin_a: Column, xmax_a: Column, ymax_a: Column,
    xmin_b: Column, ymin_b: Column, xmax_b: Column, ymax_b: Column,
) -> Column:
    """2-D axis-aligned bounding-box intersection predicate."""
    return (
        (xmin_a <= xmax_b)
        & (xmin_b <= xmax_a)
        & (ymin_a <= ymax_b)
        & (ymin_b <= ymax_a)
    )
