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
