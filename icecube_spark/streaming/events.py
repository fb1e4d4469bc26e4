"""Structured Streaming over the events stream (SURVEY §2 C5).

The stream applies the SAME `tumbling_agg` transformation the batch
query uses (queries/timeseries_queries.py:window_tumbling), so the
batch result is the streaming pipeline's oracle — one code path,
two execution modes. Watermarking bounds state for late data; at
scale the shuffle is on (window, event_type), the same key the
batch plan uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from icecube_spark.functions.parity import dsum
from icecube_spark.operators.timeseries import tumbling_agg

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # parquet carries TIMESTAMP(MICROS, isAdjustedToUTC=false); a
        # mismatched declared type (e.g. long) makes the vectorized
        # reader return nulls silently, so this must track the files
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet."""
    # the file source wants a directory: stream the sf dir, globbed to
    # the events file; cast NTZ -> TIMESTAMP (pure reinterpretation
    # under the UTC session tz) so watermarks/windows work unchanged
    sdf = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return sdf.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(df: DataFrame, watermark: str | None = "1 hour") -> DataFrame:
    """Windowed aggregation shared by batch and streaming."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    out = tumbling_agg(
        df,
        "ts",
        "1 hour",
        ["event_type"],
        {"n_events": F.count(F.lit(1)), "sum_value": dsum("value")},
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


def run_available_now(spark: SparkSession, sf_dir: str, table_name: str) -> None:
    """Drain the whole file source once (availableNow) into a memory
    sink — the streaming twin of the batch window_tumbling query.
    Complete output mode: windows finalize when the source drains.
    """
    sdf = read_events_stream(spark, sf_dir)
    q = (
        tumbling_counts(sdf, watermark="1 hour")
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(df: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup twin (SURVEY §2 C8): drop replayed events
    by event_id. dropDuplicatesWithinWatermark bounds the dedup state
    to the watermark horizon — at 100 TB/day the state store holds
    one horizon of ids, not the full history (which an unbounded
    dropDuplicates would)."""
    if df.isStreaming:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return df.dropDuplicates(["event_id"])


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join (SURVEY §2 C9): each micro-batch
    hash-joins against the static dimension — Spark re-plans the
    static side per batch, so a broadcast dim never shuffles the
    stream. The same expression works in batch (the twin/oracle)."""
    from pyspark.sql import functions as F2

    return events.join(
        F2.broadcast(dim), events.user_id == dim.c_custkey, "left"
    ).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F2.coalesce("c_mktsegment", F2.lit("UNKNOWN")).alias("segment"),
    )


def run_upsert_stream(
    spark: SparkSession, source: DataFrame, base_path: str, key: str, version: str
) -> str:
    """Incremental snapshot maintenance (SURVEY §2 C13): foreachBatch
    merges each micro-batch into a keep-latest parquet snapshot via
    sources.readers.upsert_snapshot. Each batch writes a NEW versioned
    directory (atomic swap semantics — readers never see a half-written
    snapshot, and the previous version remains for time travel /
    rollback). Returns the final snapshot path. At scale the snapshot
    is partitioned on a stable hash of the key so successive upserts
    reuse the partitioning instead of reshuffling history.
    """
    from pyspark.sql import Window

    from icecube_spark.sources.readers import upsert_snapshot

    state = {"path": None}

    def apply(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(key).orderBy(F.desc(version))
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if state["path"] is None:
            merged = latest
        else:
            merged = upsert_snapshot(
                spark.read.parquet(state["path"]), latest, [key], version
            )
        out = f"{base_path}/v{batch_id}"
        merged.write.mode("overwrite").parquet(out)
        state["path"] = out

    q = (
        source.writeStream.foreachBatch(apply)
        .option("checkpointLocation", f"{base_path}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["path"]


def run_trending_stream(
    spark: SparkSession, sf_dir: str, table_name: str, k: int = 3
) -> None:
    """C14s — streaming trending top-k: per hourly window, the k most
    active event types by count. Windowed counts are the streaming
    aggregate; the top-k rank runs per finalized batch inside
    foreachBatch (complete-mode ranks over open windows would churn
    every trigger). The batch twin — tumbling counts + rank window —
    is the oracle in tests.

    Scale: state is bounded by |windows in watermark| × |types|; the
    rank works on the tiny aggregate only.
    """
    sdf = read_events_stream(spark, sf_dir)
    counts = tumbling_counts(sdf, watermark="1 hour")

    def rank_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        top = (
            batch.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
        )
        # the managed-table location may survive from a previous JVM
        # whose catalog is gone (LOCATION_ALREADY_EXISTS on a table the
        # current metastore has never heard of) — clear both sides.
        import shutil

        spark_b = batch.sparkSession
        spark_b.sql(f"DROP TABLE IF EXISTS {table_name}")
        wh = spark_b.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[len("file:") :]
        if wh:
            shutil.rmtree(f"{wh}/{table_name}", ignore_errors=True)
        top.write.mode("overwrite").saveAsTable(table_name)

    q = (
        counts.writeStream.foreachBatch(rank_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def conversion_join(events: DataFrame, horizon_days: int = 7) -> DataFrame:
    """C31s — stream-stream time-bounded join: every signup matched to
    the same user's purchases within `horizon_days`. ONE code path for
    batch and streaming (the batch run is the test oracle); when the
    input is a stream both sides get watermarks and Spark runs a true
    stream-stream inner join, buffering each side's state only up to
    watermark + horizon — the join state is bounded, the canonical
    production shape for attribution at scale.

    Scale: the join shuffles both sides on user_id; state per key is
    bounded by the time-range condition (Spark prunes buffered rows
    older than watermark - horizon automatically).
    """
    sig = events.where(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_id"),
    )
    pur = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        sig = sig.withWatermark("signup_ts", "1 hour")
        pur = pur.withWatermark("purchase_ts", "1 hour")
    return sig.join(
        pur,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon_days} DAYS")
        ),
    ).select(
        "user_id",
        "signup_id",
        "signup_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def session_window_counts(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session-window aggregation (SURVEY §2 C44s): Spark's
    built-in session_window merges events whose gaps are < `gap` into
    one window per user — the DECLARATIVE sessionizer (state store
    managed by the engine, watermark-evicted), complementing the
    custom applyInPandasWithState one (streaming/stateful.py) that
    exists to show arbitrary state logic. Identical expression runs
    in batch (the twin the test compares against).
    """
    if df.isStreaming:
        df = df.withWatermark("ts", "1 hour")
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
