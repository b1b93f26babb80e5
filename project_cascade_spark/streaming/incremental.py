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

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, LongType, StringType, StructField,
    StructType, TimestampType,
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


NEAR_OUT_SCHEMA = StructType([
    StructField("file_id", LongType()),
    StructField("band", StringType()),
    StructField("cand_id", LongType()),
    StructField("slot_frac", DoubleType()),
])
NEAR_STATE_SCHEMA = StructType([
    StructField("member_ids", ArrayType(LongType())),
    StructField("sigs_flat", ArrayType(LongType())),
])


def incremental_near_dup_assign(
    files: DataFrame,
    cfg,
    watermark: str = "2 hours",
    state_ttl_ms: int = 2 * 3600 * 1000,
    max_members_per_band: int = 8,
) -> DataFrame:
    """Streaming NEAR-dup candidates (round-3 verdict #6): per-LSH-band
    state of a CAPPED member list (file_id, minhash signature), so a file
    arriving in a later microbatch joins an existing near-dup cluster
    without any batch recompute.

    Expects (file_id, ts, minhash array<bigint>).  Each file explodes into
    its band keys; per band, arriving files are compared against the
    band's stored members by MinHash slot agreement (an unbiased Jaccard
    estimator: E[matching slots / num_perm] = J).  Output: one row per
    (file, band) with the band's best candidate member and its slot
    fraction — resolve_near_dup_reps reduces these to one rep per file.

    Scale bounds, mirroring the batch path's skew guards: state per band
    is capped at max_members_per_band (a boilerplate band cannot grow
    unbounded state — the streaming twin of cap_bucket_rows), and bands
    idle past watermark + ttl are evicted by event-time timeout.

    Semantics note: a file is assigned to the EARLIEST stored member that
    clears the threshold, which is the cluster's founding rep for clusters
    born inside the state horizon; exact transitive closure across
    chains (A~B~C where A,C share no band) remains the batch CC's job —
    run the batch pipeline as periodic compaction.
    """
    import pandas as pd

    from ..functions.hashing import band_keys

    num_perm = cfg.num_perm
    cap = max_members_per_band

    def probe(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values("file_id")
        if state.exists:
            member_ids, flat = state.get
            member_ids = [int(x) for x in member_ids]
            M = np.asarray(flat, dtype=np.int64).reshape(len(member_ids), num_perm)
        else:
            member_ids = []
            M = np.empty((0, num_perm), dtype=np.int64)
        out_fid, out_cand, out_frac = [], [], []
        for fid, sig in zip(rows["file_id"], rows["minhash"]):
            s = np.asarray(sig, dtype=np.int64)
            if member_ids:
                fracs = (M == s[None, :]).mean(axis=1)
                j = int(np.argmax(fracs))     # first max: earliest member wins ties
                out_cand.append(member_ids[j])
                out_frac.append(float(fracs[j]))
            else:
                out_cand.append(None)
                out_frac.append(0.0)
            out_fid.append(int(fid))
            if len(member_ids) < cap:
                member_ids.append(int(fid))
                M = np.vstack([M, s[None, :]])
        (band,) = key
        yield pd.DataFrame({
            "file_id": pd.array(out_fid, dtype="int64"),
            "band": band,
            "cand_id": pd.array(out_cand, dtype="Int64"),
            "slot_frac": out_frac,
        })
        state.update((member_ids, [int(x) for x in M.reshape(-1)]))
        last_ts_ms = int(rows["ts"].max().timestamp() * 1000)
        state.setTimeoutTimestamp(last_ts_ms + state_ttl_ms)

    bands = files.select(
        "file_id", "ts", "minhash",
        F.explode(band_keys(F.col("minhash"), cfg)).alias("band"),
    ).withColumn("band", F.col("band").cast("string"))
    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band")
        .applyInPandasWithState(
            probe,
            outputStructType=NEAR_OUT_SCHEMA,
            stateStructType=NEAR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def resolve_near_dup_reps(cands: DataFrame, threshold: float) -> DataFrame:
    """(file_id, rep_id) from the per-(file, band) candidate stream: the
    earliest (smallest-id) member clearing the slot-fraction threshold
    across any band, else the file itself.  Stateless — apply to the
    drained sink table or inside foreachBatch."""
    ok = F.when(F.col("slot_frac") >= threshold, F.col("cand_id"))
    return (
        cands.groupBy("file_id")
        .agg(F.min(ok).alias("_best"))
        .select("file_id", F.coalesce("_best", "file_id").alias("rep_id"))
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
