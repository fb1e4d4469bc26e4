"""Bucketed co-located joins: the shuffle-free fact-fact join path.

At 100 TB, the lineitem⋈orders join is the dominant shuffle. Writing
both tables bucketed by the join key lets every subsequent join run
shuffle-free: SortMergeJoin directly on bucket-aligned scans.
"""

import pytest
from pyspark.sql import functions as F

from icecube_spark import catalog


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    # orphan managed-table dirs from a previous JVM (whose catalog is
    # gone) make saveAsTable fail with LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        catalog.load(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        catalog.load(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        orders = spark.table("ord_bucketed")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the join itself needs no Exchange
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, "bucketed join should not shuffle"
        # sanity: same result as the plain join
        plain = (
            catalog.load(spark, sf_dir, "lineitem")
            .join(
                catalog.load(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {r.o_orderpriority: r.n for r in joined.collect()}
        want = {r.o_orderpriority: r.n for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "32m")
