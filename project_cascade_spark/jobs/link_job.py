"""spark-submit entry point for two-table linkage (the reference's csvlink
source-vs-registry mode — its PRIMARY entry, runfile.py + Regional_Run_Files/
data_matching.py:146-198):

    spark-submit --py-files cascade.zip project_cascade_spark/jobs/link_job.py \
        --source <parquet path | synth:N> --registry <parquet path | synth:M> \
        --report

Matches every source file against the canonical registry through the same
band machinery as the dedup pipeline (cross-table collisions only) and
prints per-match rows or a one-line JSON report.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load(spark, spec: str):
    from project_cascade_spark.sources.tables import load_code_files

    if spec.startswith("synth:"):
        from project_cascade_spark.datagen import generate_code_files

        parts = spec.split(":")
        n = int(parts[1])
        seed = int(parts[2]) if len(parts) > 2 else 42
        pdf, _ = generate_code_files(n, seed=seed)
        return load_code_files(spark, pdf)
    return load_code_files(spark, spec)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="cascade two-table linkage")
    p.add_argument("--source", required=True,
                   help="parquet path or synth:<n>[:<seed>]")
    p.add_argument("--registry", required=True,
                   help="parquet path or synth:<n>[:<seed>]")
    p.add_argument("--master", default=None, help="spark master override")
    p.add_argument("--preset", default="code", choices=["code", "default"])
    p.add_argument("--output", default=None,
                   help="optional parquet path for the match table")
    p.add_argument("--report", action="store_true",
                   help="print a one-line JSON run report")
    args = p.parse_args(argv)

    from project_cascade_spark.config import CODE_CONFIG, DEFAULT_CONFIG
    from project_cascade_spark.plans.pipeline import link_tables
    from project_cascade_spark.session import build_session

    cfg = CODE_CONFIG if args.preset == "code" else DEFAULT_CONFIG
    spark = build_session("cascade-link", master=args.master)
    t0 = time.time()
    src = _load(spark, args.source)
    reg = _load(spark, args.registry)
    matches = link_tables(src, reg, cfg)

    if args.output:
        matches.write.mode("overwrite").parquet(args.output)
        n_matches = spark.read.parquet(args.output).count()
    else:
        n_matches = matches.count()
    wall = time.time() - t0
    if args.report:
        print(json.dumps({
            "matches": n_matches,
            "wall_s": round(wall, 2),
            "output": args.output,
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
