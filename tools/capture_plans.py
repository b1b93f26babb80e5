"""Capture .explain('formatted') output for the queries/stages touched in
the optimization round.  Run with PYTHONPATH at the tree to capture (the
round-start worktree for *_before.txt, the current tree for *_after.txt).

Usage: python tools/capture_plans.py <outdir> <suffix>
  e.g. python tools/capture_plans.py plans/r06 after
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from project_cascade_spark.config import CODE_CONFIG
    from project_cascade_spark.datagen import generate_code_files
    from project_cascade_spark.plans.pipeline import dedup_pipeline
    from project_cascade_spark.queries import build_queries
    from project_cascade_spark.session import build_session
    from project_cascade_spark.sources.tables import load_code_files

    spark = build_session("capture-plans", master="local[4]")
    sf = "/root/testdata/sf0.001"

    def dump(name: str, df) -> None:
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print("wrote", path)

    qs = build_queries()
    for name in ("doc_minhash_pairs", "doc_near_dup_clusters", "link_pairs"):
        dump(name, qs[name](spark, sf))

    # pipeline stage plans on a small synth corpus.  store=None uses
    # localCheckpoint truncation, so capture the COMPOSED lazy plan of the
    # stages of interest by rebuilding them without eager checkpoints where
    # the plan shape matters.
    pdf, _ = generate_code_files(200, seed=42)
    df = load_code_files(spark, pdf)
    res = dedup_pipeline(df, CODE_CONFIG, store=None, with_substring_pass=True)
    dump("pipeline_assignments", res.assignments)
    dump("pipeline_substring_pairs", res.substring_pairs)

    # un-truncated views of the hot stages (prepared -> signatures ->
    # candidates -> verified edges), built from the same operators the
    # pipeline composes
    from project_cascade_spark.functions.text import normalize_code
    from project_cascade_spark.operators.dedup import add_content_hash
    from project_cascade_spark.operators.verify import jaccard_verify

    cfg = CODE_CONFIG
    src = df
    files = (
        add_content_hash(src, "content")
        .withColumn("_nmd5", F.md5(normalize_code(F.col("content"))))
        .select("file_id", "content_sha", "_nmd5")
    )
    norm_reps = files.groupBy("_nmd5").agg(F.min("file_id").alias("nrep_id"))
    base = src.select("file_id", "content").join(
        norm_reps.select(F.col("nrep_id").alias("file_id")), "file_id"
    )
    base = base.withColumn("norm", normalize_code(F.col("content"))).select(
        "file_id", "norm"
    )
    try:  # current tree
        from project_cascade_spark.functions.kernels import (
            char_shingle_hashes_kernel,
        )

        sh = base.withColumn(
            "sh_hashes",
            char_shingle_hashes_kernel(F.col("norm"), cfg.char_shingle_k),
        )
    except ImportError:  # round-start tree
        from project_cascade_spark.functions.hashing import fast_shingle_hashes
        from project_cascade_spark.functions.text import char_shingles

        sh = base.withColumn(
            "shingles", char_shingles(F.col("norm"), cfg.char_shingle_k)
        ).withColumn(
            "sh_hashes",
            F.array_distinct(
                fast_shingle_hashes(F.col("shingles"))
            ).cast("array<int>"),
        )
    prepared = sh.withColumn("n_shingles", F.size("sh_hashes")).select(
        "file_id", "norm", "sh_hashes", "n_shingles"
    )
    dump("pipeline_prepared", prepared)

    from project_cascade_spark.functions.kernels import apply_minhash
    from project_cascade_spark.operators.minhash_lsh import candidate_pairs

    signatures = prepared.withColumn(
        "minhash", apply_minhash(F.col("sh_hashes"), cfg)
    ).select("file_id", "n_shingles", "minhash")
    try:
        cand = candidate_pairs(
            signatures, "file_id", "minhash", cfg, cap_buckets=True,
            size_col="n_shingles", hash_bands=True, dedup=False,
        )
    except TypeError:  # round-start signature
        cand = candidate_pairs(
            signatures, "file_id", "minhash", cfg, cap_buckets=True,
            size_col="n_shingles",
        )
    dump("pipeline_lsh_candidates", cand)
    dedup = cand.groupBy("id_a", "id_b").agg(F.max(F.lit(1)).alias("_m"))
    scored = jaccard_verify(
        dedup, prepared, "file_id", "sh_hashes", cfg, keep_below=True
    )
    dump("pipeline_verify", scored)

    from project_cascade_spark.operators.suffix import (
        add_fingerprints_pos,
        fingerprint_anchor_pairs,
    )

    try:
        fps = add_fingerprints_pos(
            base, "norm", cfg, max_occ_per_doc=16
        ).select("file_id", "fps_pos")
        anch = fingerprint_anchor_pairs(
            fps, "file_id", "fps_pos", cfg, template_filter=True,
            max_occ_per_doc=0,
        )
    except TypeError:  # round-start signature
        fps = add_fingerprints_pos(base, "norm", cfg).select(
            "file_id", "fps_pos"
        )
        anch = fingerprint_anchor_pairs(
            fps, "file_id", "fps_pos", cfg, template_filter=True
        )
    dump("pipeline_anchor_pairs", anch)
    spark.stop()


if __name__ == "__main__":
    main()
