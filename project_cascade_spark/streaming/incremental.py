"""Structured Streaming ingestion — the incremental-append analogue.

The reference is pure batch with date-windowed incremental pulls
(--data_from_date/--data_to_date, /root/reference/runfile.py:105-109;
SURVEY §2.9).  At 100 TB the same contract is better served by Structured
Streaming over the landing zone: new files are discovered incrementally,
watermarks bound state for late data, and exactly-once sinks come from
checkpointing.  Two streaming operators:

- windowed_event_counts: tumbling-window aggregation with a watermark —
  the streaming twin of queries.events_windowed_agg (same output schema,
  so the batch oracle validates the streaming path on a closed input).
- streaming_dedup: drop duplicate event_ids within the watermark horizon —
  the streaming face of the engine's dedup theme (state bounded by the
  watermark: ids older than the horizon are evicted).

Both are tested with trigger(availableNow=True) over a static parquet
directory (tests/test_streaming.py) — the batch-equivalence property is
exact on a closed input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts+sums per event_type, late rows beyond the
    watermark dropped.  Output columns mirror the batch oracle
    (events_windowed_agg) for closed-input equivalence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type", "n_events", "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once event stream: duplicates of (event_id) within the
    watermark horizon are dropped; state self-evicts past the horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain the full input with availableNow (batch-equivalent on closed
    input), results queryable as an in-memory table `query_name`.

    Aggregations use output_mode='complete' — in append mode a window only
    emits once the watermark passes it, so on a closed input the trailing
    windows would never appear.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
