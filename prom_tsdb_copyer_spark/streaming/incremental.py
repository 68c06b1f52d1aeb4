"""Continuous aggregates as Structured Streaming (SURVEY.md §2.9).

The reference is a one-shot batch CLI; the north rule's "continuous
aggregates" are primarily realized as incremental batch with the
checkpoint manifest (sources/manifest.py). This module provides the
genuinely-streaming variant for sources that arrive as files: a
`Trigger.AvailableNow`-style run that watches a transcripts directory,
maintains the 1m tier with watermarked late-data handling, and writes
through foreachBatch into the same partitioned tier layout -- so batch
and streaming paths share one storage contract.

Used with `format("parquet")` file streams locally; at cluster scale the
same query reads Kafka. Late data: watermark `delay` bounds state; rows
later than the watermark are handled by the batch recompute path
(deterministic overwrite of affected partitions -- the reference's
re-copy model), which is the standard lambda-ish repair story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_tier_1m(
    spark: SparkSession,
    source_dir: str,
    schema,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming 1m rollup (append-mode-safe aggregation).

    Uses F.window (epoch-aligned like the batch bucket column; the
    equality is fixture-tested) and emits the same aggregate set as the
    batch tier minus order-dependent first/last order keys, which
    streaming computes via min_by/max_by on the event time."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .load(source_dir)
    )
    ts = F.col(ts_col)
    val = F.col(value_col)
    stream = stream.withColumn("_ord", F.unix_micros(ts.cast("timestamp")))
    ord_key = F.col("_ord")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts, "1 minute").alias("win"), *series_cols)
        .agg(
            F.count(val).alias("cnt"),
            F.sum(val).alias("sum_val"),
            F.min(val).alias("min_val"),
            F.max(val).alias("max_val"),
            F.min_by(val, ord_key).alias("first_val"),
            F.max_by(val, ord_key).alias("last_val"),
            F.min(ord_key).alias("first_ord"),
            F.max(ord_key).alias("last_ord"),
        )
        .select(
            F.unix_millis(F.col("win.start")).alias("bucket_ms"),
            *series_cols,
            "cnt", "sum_val", "min_val", "max_val",
            "first_val", "last_val", "first_ord", "last_ord",
        )
    )


def streaming_sessions(
    spark: SparkSession,
    source_dir: str,
    schema,
    series_cols: list[str],
    gap: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via the native session_window: dynamic
    windows that extend while events arrive within `gap` and close when
    the watermark passes the gap -- the streaming twin of
    operators/sessionize.py (whose batch output is the oracle in
    tests)."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .load(source_dir)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *series_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 3).alias("sum_val"),
            F.min(F.unix_millis(F.col(ts_col).cast("timestamp"))).alias("start_ms"),
            F.max(F.unix_millis(F.col(ts_col).cast("timestamp"))).alias("end_ms"),
        )
        .select(*series_cols, "start_ms", "end_ms", "n_events", "sum_val")
    )


def run_available_now(
    tier_df: DataFrame, out_path: str, checkpoint: str
):
    """Drain everything currently available into the tier table and stop
    (Trigger.AvailableNow): the streaming twin of one ResumableRollup
    run. foreachBatch gives exactly-once-per-epoch parquet appends."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if "bucket_ms" in batch_df.columns:
            (
                batch_df.withColumn(
                    "part_day", F.to_date(F.timestamp_millis(F.col("bucket_ms")))
                )
                .write.mode("append")
                .partitionBy("part_day")
                .parquet(out_path)
            )
        else:  # session-shaped output: no fixed bucket grid to partition on
            batch_df.write.mode("append").parquet(out_path)

    return (
        tier_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
