"""Sub-stage profiler for the edges stage and the final action
(guide §1: isolate the expensive operator with noop-style counts).

Usage: python tools/profile_edges.py <cores> <input_path>
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
    from project_cascade_spark.functions.kernels import (
        apply_minhash,
        char_shingle_hashes_kernel,
    )
    from project_cascade_spark.functions.text import normalize_code
    from project_cascade_spark.operators.dedup import add_content_hash
    from project_cascade_spark.operators.minhash_lsh import candidate_pairs
    from project_cascade_spark.operators.verify import jaccard_verify
    from project_cascade_spark.session import build_session
    from project_cascade_spark.sources.tables import load_code_files

    spark = build_session(
        f"cascade-edges-n{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(4 * cores, 16),
    )
    out: dict = {"cores": cores}
    src = load_code_files(spark, input_path)
    par = spark.sparkContext.defaultParallelism
    heavy_par = max(4 * par, 16)

    t0 = time.time()
    files = (
        add_content_hash(src, "content")
        .withColumn("_nmd5", F.md5(normalize_code(F.col("content"))))
        .select("file_id", "content_sha", "_nmd5")
    ).localCheckpoint(eager=True)
    norm_reps = files.groupBy("_nmd5").agg(F.min("file_id").alias("nrep_id")) \
        .localCheckpoint(eager=True)
    base = src.select("file_id", "content").join(
        norm_reps.select(F.col("nrep_id").alias("file_id")), "file_id"
    ).repartition(heavy_par, "file_id")
    base = base.withColumn("norm", normalize_code(F.col("content"))).select(
        "file_id", "norm"
    )
    sh = base.withColumn(
        "sh_hashes", char_shingle_hashes_kernel(F.col("norm"), cfg.char_shingle_k)
    ).withColumn("n_shingles", F.size("sh_hashes"))
    prepared = sh.select("file_id", "norm", "sh_hashes", "n_shingles") \
        .localCheckpoint(eager=True)
    signatures = prepared.withColumn(
        "minhash", apply_minhash(F.col("sh_hashes"), cfg)
    ).select("file_id", "n_shingles", "minhash").localCheckpoint(eager=True)
    out["prep_s"] = round(time.time() - t0, 2)

    # --- candidate generation alone (band explode + cap + join + filter)
    spark.sparkContext.setJobDescription("edges: candidates only")
    t0 = time.time()
    cand = candidate_pairs(
        signatures, "file_id", "minhash", cfg, cap_buckets=True,
        size_col="n_shingles", hash_bands=True, dedup=False,
    )
    out["n_cand_rows"] = cand.count()
    out["cand_s"] = round(time.time() - t0, 2)

    # --- + pair dedup (the groupBy the pipeline's verify stage pays)
    spark.sparkContext.setJobDescription("edges: candidates + dedup")
    t0 = time.time()
    dedup = cand.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("_m"))
    out["n_cand_pairs"] = dedup.count()
    out["cand_dedup_s"] = round(time.time() - t0, 2)

    # --- full verify (the two shuffle_hash joins + jaccard)
    spark.sparkContext.setJobDescription("edges: verify")
    t0 = time.time()
    dedup2 = cand.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("_m"))
    scored = jaccard_verify(dedup2, prepared, "file_id", "sh_hashes", cfg,
                            keep_below=True)
    out["n_scored"] = scored.filter(
        F.col("jaccard") >= cfg.jaccard_threshold
    ).count()
    out["verify_s"] = round(time.time() - t0, 2)
    print("EDGES " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
