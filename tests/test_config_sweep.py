"""Config-file sweep — the reference's outermost loop (runfile.py:190-243
sweeps several config files per run and picks the best by stats via
match_filtering.py:158-191).  The job surface must run N band-configs over
the verified edges in one run, persist the per-config stats table through
the StageStore, and pick the planted-best config."""

import json
import os

from pyspark.sql import functions as F

from project_cascade_spark.operators.cascade_filter import (
    parse_band_config,
    sweep_band_configs,
)

STRICT = {
    "name": "strict",
    "bands": [
        {"char_counts": [0, 100], "min_match_score": 0.95},
        {"char_counts": [100, 1 << 30], "min_match_score": 0.9},
    ],
}
LAX = {
    "name": "lax",
    "bands": [
        {"char_counts": [0, 1 << 30], "min_match_score": 0.0},
    ],
}


def test_sweep_picks_planted_best(spark):
    """Two configs over a hand-built edge set: strict keeps only the
    high-jaccard edges, so its avg_score must win the argmax."""
    docs = spark.createDataFrame(
        [(i, "x" * (50 + 10 * i)) for i in range(6)], "file_id long, content string"
    )
    edges = spark.createDataFrame(
        [(0, 1, 0.99), (2, 3, 0.97), (4, 5, 0.60), (1, 2, 0.58)],
        "id_a long, id_b long, jaccard double",
    )
    configs = [parse_band_config(STRICT), parse_band_config(LAX)]
    stats, best = sweep_band_configs(
        edges, docs, "file_id", F.length("content"), configs
    )
    rows = {r["config"]: r for r in stats.collect()}
    assert rows["strict"]["n_scored"] == 2          # only the two >= 0.9 edges
    assert rows["lax"]["n_scored"] == 4
    assert rows["strict"]["avg_score"] > rows["lax"]["avg_score"]
    assert best.first()["best_config"] == "strict"


def test_sweep_cli_end_to_end(tmp_path):
    """Full job surface: --configs a.json,b.json over synth input with a
    workdir — the report names the planted-best config and the stats table
    lands in the StageStore (durable parquet + token)."""
    import glob
    import subprocess
    import sys

    for name, conf in (("strict", STRICT), ("lax", LAX)):
        with open(tmp_path / f"{name}.json", "w") as fh:
            json.dump(conf, fh)
    workdir = str(tmp_path / "work")
    out = subprocess.run(
        [
            sys.executable, "-m", "project_cascade_spark.jobs.dedup_job",
            "--input", "synth:400", "--workdir", workdir,
            "--master", "local[8]", "--no-substring-pass", "--report",
            "--configs",
            f"{tmp_path}/strict.json,{tmp_path}/lax.json",
        ],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    report = json.loads(out.stdout.strip().splitlines()[-1])
    sweep = report["config_sweep"]
    assert sweep["configs"] == ["strict", "lax"]
    assert sweep["best_config"] == "strict"
    by_cfg = {r["config"]: r for r in sweep["stats"]}
    assert by_cfg["lax"]["n_scored"] >= by_cfg["strict"]["n_scored"] > 0
    assert by_cfg["strict"]["avg_score"] > by_cfg["lax"]["avg_score"]
    # durable: the sweep stage parquet + token exist under the workdir
    stage_dirs = glob.glob(os.path.join(workdir, "09_config_sweep_*"))
    assert stage_dirs and os.path.exists(
        os.path.join(stage_dirs[0], "_cascade_token")
    )
