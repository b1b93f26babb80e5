"""Benchmark harness (driver contract + scaling evidence).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pipeline": {"files": N, "files_per_sec_n8": ..., "files_per_sec_n32": ...,
                "scaling_efficiency_8_to_32": ...}}

Two parts:
1. headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. the end-to-end code_files dedup pipeline on a deterministic synthetic
   table, run at local[N] and local[4N] on identical input — the sandbox
   proxy for the BASELINE.json two-cluster-size scaling rule (throughput at
   both + efficiency = T_4N / (4 * T_N)).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PIPELINE_FILES = int(os.environ.get("CASCADE_BENCH_FILES", "6000"))
SMALL_N = max(CPUS // 4, 1)

HEADLINE = [
    "doc_near_dup_clusters",
    "doc_minhash_pairs",
    "doc_simhash_pairs",
    "doc_winnow_pairs",
    "doc_ngram_jaccard",
    "emb_topk",
    "match_stats",
    "cluster_sizes_window",
    "events_windowed_agg",
]


def _synth_parquet(path: str) -> None:
    """Materialize the synthetic code_files table once (datagen excluded
    from the timed pipeline)."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_cascade_spark.datagen import generate_code_files

    pdf, _ = generate_code_files(PIPELINE_FILES, seed=42)
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(path, "part-0.parquet"))
    open(os.path.join(path, "_SUCCESS"), "w").close()


def run_pipeline(master_n: int, input_path: str) -> tuple[int, float]:
    """(files, wall seconds) for one full pipeline run at local[N]."""
    from project_cascade_spark.config import CODE_CONFIG
    from project_cascade_spark.plans.pipeline import dedup_pipeline
    from project_cascade_spark.session import build_session
    from project_cascade_spark.sources.tables import load_code_files

    spark = build_session(
        f"cascade-bench-n{master_n}", master=f"local[{master_n}]",
        shuffle_partitions=max(master_n, 8),
    )
    df = load_code_files(spark, input_path)
    t0 = time.time()
    res = dedup_pipeline(df, CODE_CONFIG, store=None, with_substring_pass=True)
    n = res.assignments.count()
    _ = res.substring_pairs.count()
    wall = time.time() - t0
    spark.stop()
    return n, wall


def main() -> None:
    synth_path = f"/tmp/cascade_bench_input_{PIPELINE_FILES}"
    _synth_parquet(synth_path)

    # -- part 1: headline queries at SF_DIR --
    from project_cascade_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session("cascade-bench", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    # -- part 2: pipeline at N and 4N on identical input --
    n_files, wall_small = run_pipeline(SMALL_N, synth_path)
    _, wall_big = run_pipeline(CPUS, synth_path)
    tp_small = n_files / wall_small
    tp_big = n_files / wall_big
    eff = tp_big / ((CPUS / SMALL_N) * tp_small)

    total = round(sum(timings.values()) + wall_small + wall_big, 3)
    print(json.dumps({
        "metric": "end_to_end_dedup_bench",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pipeline": {
            "files": n_files,
            "wall_s_n%d" % SMALL_N: round(wall_small, 2),
            "wall_s_n%d" % CPUS: round(wall_big, 2),
            "files_per_sec_n%d" % SMALL_N: round(tp_small, 1),
            "files_per_sec_n%d" % CPUS: round(tp_big, 1),
            "scaling_efficiency_%d_to_%d" % (SMALL_N, CPUS): round(eff, 3),
        },
    }))


if __name__ == "__main__":
    main()
