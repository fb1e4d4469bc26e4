"""Table catalog over the driver-generated parquet directories.

Mirrors the reference's metadata-crawler entry point
(icecube/utils/metadata_crawler.py:20) in spirit: given a directory,
expose its products as queryable tables. Here the products are
parquet files; `load` returns lazy DataFrames so Catalyst keeps
column pruning + predicate pushdown at the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Lazy: no IO until an action runs.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long which
    we truncate to microseconds — the same truncation DuckDB applies —
    so both engines see identical timestamps.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns epochs exceed 2^53, double math would round
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every known table as a dict of lazy DataFrames."""
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() workloads."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
