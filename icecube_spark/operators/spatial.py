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


def bbox_join_grid(
    boxes: DataFrame,
    id_col: str,
    cell: int = 100,
) -> DataFrame:
    """A13 — all-pairs 2-D bbox intersection via grid bucketing: the
    distributed spatial join behind select_overlapping_rasters
    generalized from 1-vs-primary to all-pairs (which rasters can
    co-register with which).

    Expects integer columns xmin/ymin/xmax/ymax. Each box explodes to
    the grid cells it covers (bounded fanout: ceil(w/cell)+1 per
    axis); candidates equi-join on the cell — never a cross join. A
    pair sharing several cells is emitted ONCE without any DISTINCT
    shuffle via the reference-point trick: only the cell containing
    (max(xmin), max(ymin)) — a cell both boxes cover whenever they
    intersect — reports the pair. Overlap area is exact integer math.
    """
    cells = boxes.select(
        F.col(id_col),
        "xmin",
        "ymin",
        "xmax",
        "ymax",
        F.explode(
            F.sequence(F.floor(F.col("xmin") / cell), F.floor(F.col("xmax") / cell))
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("ymin") / cell), F.floor(F.col("ymax") / cell))
        ).alias("cy"),
    )
    a = cells.select(
        *[F.col(c).alias(f"{c}_a") for c in (id_col, "xmin", "ymin", "xmax", "ymax")],
        "cx",
        "cy",
    )
    b = cells.select(
        *[F.col(c).alias(f"{c}_b") for c in (id_col, "xmin", "ymin", "xmax", "ymax")],
        "cx",
        "cy",
    )
    ref_x = F.greatest("xmin_a", "xmin_b")
    ref_y = F.greatest("ymin_a", "ymin_b")
    pairs = (
        a.join(b, ["cx", "cy"])
        .where(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .where(
            (F.col("xmin_a") <= F.col("xmax_b"))
            & (F.col("xmin_b") <= F.col("xmax_a"))
            & (F.col("ymin_a") <= F.col("ymax_b"))
            & (F.col("ymin_b") <= F.col("ymax_a"))
        )
        .where(
            (F.floor(ref_x / cell) == F.col("cx"))
            & (F.floor(ref_y / cell) == F.col("cy"))
        )
    )
    return pairs.select(
        f"{id_col}_a",
        f"{id_col}_b",
        (
            (F.least("xmax_a", "xmax_b") - F.greatest("xmin_a", "xmin_b"))
            * (F.least("ymax_a", "ymax_b") - F.greatest("ymin_a", "ymin_b"))
        ).alias("overlap_area"),
    )
