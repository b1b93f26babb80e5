"""Checkpointed stage sinks with validated resume + per-partition lineage.

Reference semantics: every stage writes its output and is skipped on re-run
if the output exists (os.path.exists guards,
Regional_Run_Files/data_matching.py:47-73, data_processing.py:168,274 —
SURVEY S9), and checkpoints are INVALIDATED when their inputs change (the
reference's ClearFiles, setup.py:57-98).  Here the same contract,
Spark-shaped:

- each stage writes atomically to <root>/<stage>/ as parquet (Iceberg
  `createOrReplace` when the runtime jar is present — not in this sandbox);
- resume is token-validated, not existence-only: every stage dir carries a
  `_cascade_token` = sha256 chain of (pipeline fingerprint → every upstream
  stage name).  Re-running with a different --input or config changes the
  fingerprint, so every stage recomputes instead of silently serving stale
  data; deleting one stage dir recomputes exactly that stage (the
  deterministic recompute re-produces the same token, so downstream stages
  stay valid);
- a `_state` parquet table records (stage, n_rows, wall_s) per completed
  stage — the `_pipeline_state` analogue;
- a `_lineage` parquet table records per-output-file row counts per stage
  (north_rule: "per-partition lineage + metrics").  Counts come from the
  parquet FOOTERS of the just-written files — metadata only, zero data
  re-scan (the previous implementation re-scanned each stage output twice;
  at 100 TB that triples stage I/O).

Resume contract is pytest-covered: tests/test_resume.py (unit) and the
subprocess spark-submit round trip in tests/test_resume.py::test_job_resume.
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession


class StageStore:
    def __init__(self, spark: SparkSession, root: str, fingerprint: str = ""):
        self.spark = spark
        self.root = root.rstrip("/")
        # chain starts at the pipeline fingerprint (input identity + config);
        # each run() advances it by the stage name, so a stage's expected
        # token encodes everything upstream of it.
        self._chain = hashlib.sha256(fingerprint.encode()).hexdigest()
        self.computed: list[str] = []   # stages computed (not resumed) this run
        os.makedirs(self.root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def _token_path(self, stage: str) -> str:
        return os.path.join(self._path(stage), "_cascade_token")

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def _valid(self, stage: str, expected: str) -> bool:
        """Stage output present AND produced under the same upstream chain."""
        if not self.exists(stage):
            return False
        try:
            with open(self._token_path(stage)) as f:
                return f.read().strip() == expected
        except OSError:
            return False

    def _footer_counts(self, path: str) -> list[tuple[str, int]]:
        """(file, n_rows) per output part from parquet footers — metadata
        only.  Falls back to one Spark scan for non-local filesystems."""
        try:
            import pyarrow.parquet as pq

            out = []
            for name in sorted(os.listdir(path)):
                if name.endswith(".parquet"):
                    out.append(
                        (name, pq.ParquetFile(os.path.join(path, name)).metadata.num_rows)
                    )
            return out
        except (OSError, ImportError):
            from pyspark.sql import functions as F

            rows = (
                self.spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .count()
                .collect()
            )
            return [(r["f"], r["count"]) for r in rows]

    def write(self, stage: str, df: DataFrame, token: str | None = None) -> DataFrame:
        t0 = time.time()
        path = self._path(stage)
        df.write.mode("overwrite").parquet(path)
        per_file = self._footer_counts(path)
        n = sum(c for _, c in per_file)
        lineage = self.spark.createDataFrame(
            [(stage, f, c) for f, c in per_file],
            "stage string, part string, n_rows long",
        )
        lineage.write.mode("append").parquet(f"{self.root}/_lineage")
        state = self.spark.createDataFrame(
            [(stage, n, time.time() - t0)], "stage string, n_rows long, wall_s double"
        )
        state.write.mode("append").parquet(f"{self.root}/_state")
        if token is not None:
            with open(self._token_path(stage), "w") as f:
                f.write(token)
        return self.spark.read.parquet(path)

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def run(self, stage: str, fn) -> DataFrame:
        """Compute-or-resume with invalidation: resume only when the stage's
        recorded token matches the current chain (same fingerprint, same
        upstream stages); otherwise recompute and overwrite."""
        expected = hashlib.sha256(f"{self._chain}:{stage}".encode()).hexdigest()
        self._chain = expected
        if self._valid(stage, expected):
            return self.read(stage)
        self.computed.append(stage)
        return self.write(stage, fn(), token=expected)

    def state(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/_state")

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/_lineage")
