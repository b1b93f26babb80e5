"""Per-stage scaling profile: run the bench pipeline at local[N] for each N
given, print per-stage walls + the final-action wall.  Finds the serial
fraction (stages whose wall does NOT shrink with cores).

    python tools/profile_pipeline.py 2 8 [files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n: int, input_path: str) -> None:
    import time

    from project_cascade_spark.config import CODE_CONFIG
    from project_cascade_spark.plans.pipeline import dedup_pipeline
    from project_cascade_spark.session import build_session
    from project_cascade_spark.sources.tables import load_code_files

    spark = build_session(
        f"profile-n{n}", master=f"local[{n}]",
        shuffle_partitions=max(4 * n, 16),   # mirror bench.py
        extra_conf={
            "spark.sql.adaptive.enabled": os.environ.get("CASCADE_AQE", "true"),
        },
    )
    df = load_code_files(spark, input_path)
    times: dict = {}
    t0 = time.time()
    res = dedup_pipeline(df, CODE_CONFIG, store=None, with_substring_pass=True,
                         stage_times=times)
    t1 = time.time()
    # mirror bench.py: both outputs in ONE action
    from pyspark.sql import functions as F

    row = (
        res.assignments.agg(F.count(F.lit(1)).alias("n_assign"))
        .crossJoin(res.substring_pairs.agg(F.count(F.lit(1)).alias("n_sub")))
        .first()
    )
    n_assign, n_sub = row["n_assign"], row["n_sub"]
    t2 = time.time()
    times["09_counts_one_action"] = t2 - t1
    times["_total"] = t2 - t0
    times["_rows"] = {"assignments": n_assign, "substring_pairs": n_sub}
    print("PROFILE " + json.dumps({"n": n, "times": {k: (round(v, 2) if isinstance(v, float) else v) for k, v in times.items()}}))
    spark.stop()


def main() -> None:
    ns = [int(x) for x in sys.argv[1:3]] or [2, 8]
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 30000
    os.environ["CASCADE_BENCH_FILES"] = str(files)
    import bench

    synth = f"/tmp/cascade_bench_input_{files}_s500"
    bench.PIPELINE_FILES = files
    bench._synth_parquet(synth)
    results = {}
    for n in ns:
        out = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r}); "
             f"from tools.profile_pipeline import run_one; run_one({n}, {synth!r})"],
            capture_output=True, text=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("PROFILE "):
                rec = json.loads(line[len("PROFILE "):])
                results[rec["n"]] = rec["times"]
        if out.returncode != 0:
            print(out.stderr[-2000:])
            sys.exit(1)
    stages = [k for k in results[ns[0]] if not k.startswith("_")]
    print(f"\n{'stage':<24}" + "".join(f"n{n:<7}" for n in ns) + "ratio")
    for s in stages:
        vals = [results[n].get(s, 0.0) for n in ns]
        ratio = vals[0] / vals[-1] if vals[-1] else float("inf")
        print(f"{s:<24}" + "".join(f"{v:<8.1f}" for v in vals) + f"{ratio:.2f}")
    tot = [results[n]["_total"] for n in ns]
    print(f"{'TOTAL':<24}" + "".join(f"{v:<8.1f}" for v in tot) + f"{tot[0]/tot[-1]:.2f}")
    eff = (tot[0] / tot[-1]) / (ns[-1] / ns[0])
    print(f"scaling efficiency {ns[0]}->{ns[-1]}: {eff:.3f}")


if __name__ == "__main__":
    main()
