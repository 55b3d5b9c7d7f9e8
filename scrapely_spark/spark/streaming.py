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
    """Watermarked tumbling-window counts by event type (late data
    beyond the watermark is dropped, state is bounded)."""
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
                      checkpoint_dir: str):
    """Drain the stream into an in-memory sink; returns the query handle."""
    return (stream_df.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
