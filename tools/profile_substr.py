"""Sub-stage profiler for the long-substring side pass.

Usage: python tools/profile_substr.py <cores> <input_path>
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

    from pyspark.sql import functions as F

    from project_cascade_spark.config import CODE_CONFIG as cfg
    from project_cascade_spark.functions.text import normalize_code
    from project_cascade_spark.operators.suffix import (
        add_fingerprints_pos,
        fingerprint_anchor_pairs,
        verify_long_substring_anchored,
    )
    from project_cascade_spark.session import build_session
    from project_cascade_spark.sources.tables import load_code_files

    spark = build_session(
        f"cascade-substr-n{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(4 * cores, 16),
    )
    out: dict = {"cores": cores}
    src = load_code_files(spark, input_path)
    prepared = (
        src.select("file_id", "content")
        .withColumn("norm", normalize_code(F.col("content")))
        .select("file_id", "norm")
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    fps = add_fingerprints_pos(prepared, "norm", cfg).select(
        "file_id", "fps_pos"
    ).localCheckpoint(eager=True)
    out["fps_s"] = round(time.time() - t0, 2)
    out["n_prints"] = fps.select(F.sum(F.size("fps_pos"))).first()[0]

    spark.sparkContext.setJobDescription("substr: anchor pairs")
    t0 = time.time()
    cand = fingerprint_anchor_pairs(
        fps, "file_id", "fps_pos", cfg, template_filter=True
    ).localCheckpoint(eager=True)
    out["n_cand"] = cand.count()
    out["cand_s"] = round(time.time() - t0, 2)
    out["n_anchors"] = cand.select(F.sum(F.size("anchors"))).first()[0]

    spark.sparkContext.setJobDescription("substr: verify")
    t0 = time.time()
    ver = verify_long_substring_anchored(cand, prepared, "file_id", "norm", cfg)
    out["n_ver"] = ver.count()
    out["verify_s"] = round(time.time() - t0, 2)
    print("SUBSTR " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
