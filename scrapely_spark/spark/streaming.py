"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.8) and the crawl loop
is deliberately iterative-batch (byte-identical ordering needs
batch-synchronous rounds), but the engine's event-side operators are also
available as streams: the same aggregations run over ``readStream`` with
watermarked event-time windows, so a deployment can tail a landing zone
(files / Kafka) instead of re-running batch jobs.

``available_now=True`` triggers process-everything-then-stop — which is
also how the parity test checks the streaming plan agrees with its batch
twin on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Tail a parquet landing zone of events (schema inferred from data)."""
    schema = spark.read.parquet(events_dir).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(events_dir))


def hourly_counts_stream(events: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts by event type.

    In append output mode the watermark bounds state and drops late
    rows; in complete mode (the drain-and-compare path) all windows are
    retained — see :func:`run_available_now`.
    """
    with_ts = events.withColumn("ets", F.col("ts").cast("timestamp"))
    return (with_ts
            .withWatermark("ets", watermark)
            .groupBy(F.window("ets", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .alias("total_value"))
            .select(F.col("win.start").alias("hour"), "event_type", "n",
                    "total_value"))


def run_available_now(stream_df: DataFrame, query_name: str,
                      checkpoint_dir: str, output_mode: str = "complete"):
    """Drain the stream into an in-memory sink; returns the query handle.

    ``complete`` (default here) is the drain-everything-then-compare mode
    used by the batch-parity test: note that under it the watermark does
    NOT evict state or drop late rows.  A continuous production tail
    should use ``append``, where only watermark-finalized windows emit
    and state stays bounded.
    """
    return (stream_df.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
