"""Per-stage pipeline profiler (guide §1: measure first).

Runs dedup_pipeline on the bench corpus with the stage_times hook and a
noop-equivalent single action, printing one JSON line with per-stage walls
plus the final-action wall.  Not part of the frozen bench contract.

Usage: python tools/profile_pipeline.py <cores> <input_path> [--no-substring]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    input_path = sys.argv[2]
    with_sub = "--no-substring" not in sys.argv

    from pyspark.sql import functions as F

    from project_cascade_spark.config import CODE_CONFIG
    from project_cascade_spark.plans.pipeline import dedup_pipeline
    from project_cascade_spark.session import build_session
    from project_cascade_spark.sources.tables import load_code_files

    spark = build_session(
        f"cascade-profile-n{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(4 * cores, 16),
    )
    df = load_code_files(spark, input_path)
    stage_times: dict = {}
    t0 = time.time()
    res = dedup_pipeline(
        df, CODE_CONFIG, store=None, with_substring_pass=with_sub,
        stage_times=stage_times,
    )
    spark.sparkContext.setJobDescription("final: assignments count")
    t_a = time.time()
    n_files = res.assignments.agg(F.count(F.lit(1)).alias("n")).first()["n"]
    assign_s = time.time() - t_a
    n_sub = None
    sub_s = 0.0
    if with_sub:
        spark.sparkContext.setJobDescription("final: substring count")
        t_s = time.time()
        n_sub = res.substring_pairs.agg(F.count(F.lit(1)).alias("n")).first()["n"]
        sub_s = time.time() - t_s
    row = {"n_files": n_files, "n_sub": n_sub}
    wall = time.time() - t0
    out = {
        "cores": cores,
        "input": input_path,
        "wall_s": round(wall, 2),
        "n_files": row["n_files"],
        "n_sub": row["n_sub"] if with_sub else None,
        "final_action_s": round(wall - sum(stage_times.values()), 2),
        "final_assign_s": round(assign_s, 2),
        "final_substr_s": round(sub_s, 2),
        "stages": {k: round(v, 2) for k, v in stage_times.items()},
    }
    print("PROFILE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
