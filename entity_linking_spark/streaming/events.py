"""Structured Streaming operators (engine additions — the reference is
pure batch, SURVEY.md §2.8; these cover the streaming-ingest side a
web-scale corpus pipeline needs: continuous page/event arrival).

Batch/stream parity: every streaming query here has the same semantics as
its batch twin in __spark_entry__ (q_events_hourly), so tests verify the
stream output against the batch computation on the same files using the
availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str = "rollup"
):
    """Drain all available input with the availableNow trigger into an
    in-memory sink (complete mode) and return the finished query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
