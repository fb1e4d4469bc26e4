"""Source connectors (SURVEY §2 group H).

Parquet is the primary format (catalog.py); these add CSV, JSON,
binary-file (raster payloads), and a partitioned parquet sink.
Everything returns lazy DataFrames; schemas are explicit where
inference would cost a pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # schema inference costs an extra pass; acceptable for small files
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raster ingestion boundary (reference
    icecube/utils/analytics_IO.py loads tiff/h5 per file): each file
    becomes a row (path, modificationTime, length, content) — the
    payload column feeds operators/multimodal.decode_stub. Files are
    distributed across executors; nothing routes through the driver.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned sink: downstream scans prune on partition_cols."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
