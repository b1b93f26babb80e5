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
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
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


ASSIGN_OUT_SCHEMA = StructType([
    StructField("file_id", LongType()),
    StructField("content_hash", StringType()),
    StructField("rep_id", LongType()),
    StructField("is_dup", BooleanType()),
    StructField("n_seen", LongType()),
])
ASSIGN_STATE_SCHEMA = StructType([
    StructField("rep_id", LongType()),
    StructField("n_seen", LongType()),
])


def incremental_dedup_assign(
    files: DataFrame,
    watermark: str = "2 hours",
    state_ttl_ms: int = 2 * 3600 * 1000,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): incremental
    exact-dedup ASSIGNMENT.  Where streaming_dedup drops duplicate rows,
    this labels every arriving file with its content group's canonical
    representative — the streaming twin of the batch pipeline's exact-dedup
    stage (plans/pipeline.py), whose assignment table it reproduces
    incrementally.

    Per content_hash group state = (rep_id, n_seen): the representative is
    the first-seen file (min file_id within its arrival microbatch, so a
    closed input replayed with the same batch boundaries reproduces
    identical assignments), and it persists across microbatches — a
    duplicate arriving hours later still maps to the original rep without
    reprocessing history.  State self-evicts via event-time timeout once a
    group has been idle past the watermark horizon, so state size tracks the
    active window, not the corpus (the 100 TB requirement).

    Expects columns (file_id, content_hash, ts).  Output: one row per input
    row with (rep_id, is_dup, n_seen-after-this-row).
    """
    import pandas as pd

    def assign(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        (content_hash,) = key
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values("file_id")
        if state.exists:
            rep, n = state.get
        else:
            rep, n = int(rows["file_id"].min()), 0
        seen_after = n + pd.RangeIndex(1, len(rows) + 1)
        out = pd.DataFrame({
            "file_id": rows["file_id"].astype("int64").values,
            "content_hash": content_hash,
            "rep_id": rep,
            "is_dup": (rows["file_id"].astype("int64") != rep).values,
            "n_seen": seen_after.astype("int64"),
        })
        n += len(rows)
        state.update((int(rep), int(n)))
        # evict once the group has been idle past the horizon: timeout fires
        # when the WATERMARK (not wall clock) passes last-seen-ts + ttl
        last_ts_ms = int(rows["ts"].max().timestamp() * 1000)
        state.setTimeoutTimestamp(last_ts_ms + state_ttl_ms)
        yield out

    return (
        files.withWatermark("ts", watermark)
        .groupBy("content_hash")
        .applyInPandasWithState(
            assign,
            outputStructType=ASSIGN_OUT_SCHEMA,
            stateStructType=ASSIGN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
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
