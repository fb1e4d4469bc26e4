"""Skew-mitigation utilities for 100 TB joins/aggregations.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
at runtime; these utilities cover the cases AQE can't: skewed
aggregations and broadcast-infeasible skewed joins. Salting spreads a
hot key over `salt_buckets` sub-keys, aggregates partially per
sub-key, then merges — two small shuffles instead of one stuck
straggler task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    `aggs` maps output name -> (partial_agg_expr, merge_agg_expr),
    e.g. {"n": (F.count(F.lit(1)), F.sum("n")),
          "total": (F.sum("x"), F.sum("total"))}.
    Phase 1 groups on (keys..., salt) — hot keys split across
    `salt_buckets` tasks; phase 2 merges the per-salt partials. The
    salt derives from spark_partition_id so it is free (no hash of the
    row) and already aligned with input partitioning.
    """
    salted = df.withColumn(
        "__salt", F.spark_partition_id() % F.lit(salt_buckets)
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def replicated_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed inner equi-join without broadcast: salt the big side
    with a random-free partition-derived salt, replicate the small
    side across every salt bucket, join on (key, salt). Each hot key's
    rows land in `salt_buckets` tasks instead of one."""
    big_s = big.withColumn("__salt", F.spark_partition_id() % F.lit(salt_buckets))
    small_r = small.crossJoin(
        big.sparkSession.range(salt_buckets).select(
            F.col("id").cast("int").alias("__salt")
        )
    )
    return big_s.join(small_r, [key, "__salt"]).drop("__salt")
