"""Plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_once(df: DataFrame, cond: Column) -> DataFrame:
    """Filter on an expensive computed column WITHOUT Catalyst pushing
    the predicate below the projection that computes it.

    A threshold filter over a projected expression (a 64-term dot
    product, an array_intersect jaccard, ...) normally gets pushed
    into the join condition below, and the projection above recomputes
    the same expression for output — the expensive expression runs
    TWICE per row. A non-deterministic column between the projection
    and the filter is a pushdown barrier (Catalyst only reorders
    deterministic projects), so the expression is evaluated once and
    the filter reads the materialized column. The barrier column costs
    one long per row and is dropped immediately.
    """
    return (
        df.withColumn("__pd_barrier", F.monotonically_increasing_id())
        .where(cond)
        .drop("__pd_barrier")
    )
