"""Schema-pinned readers.

The reference pins dtypes on every read (settings.py:20-29 passed to each
pd.read_csv — SURVEY §1.3); we do the same with explicit StructTypes so a
malformed input fails at plan time, not mid-shuffle.

`code_files` is specified by BASELINE.json input_hint as an Iceberg table;
the Iceberg runtime jar is not bundled in this sandbox, so the reader
accepts (a) an Iceberg table name when the catalog is configured, else
(b) a parquet path, else (c) an in-memory pandas frame from datagen.  Row
identity: the table has no id column, so file_id = xxhash64(repo, path,
commit) — deterministic, collision-safe at 10^12 rows (64-bit, birthday
bound ~2^32 fine with the sha256 exact-dup stage ahead of anything
identity-critical).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CODE_FILES_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def with_file_id(df: DataFrame) -> DataFrame:
    return df.withColumn("file_id", F.xxhash64("repo", "path", "commit"))


def load_code_files(
    spark: SparkSession,
    source: str | pd.DataFrame,
) -> DataFrame:
    """source: Iceberg table name ('cat.db.code_files'), parquet path, or a
    pandas frame (tests/bench)."""
    if isinstance(source, pd.DataFrame):
        df = spark.createDataFrame(source, schema=CODE_FILES_SCHEMA)
    elif source.endswith(".parquet") or "/" in source:
        df = spark.read.schema(CODE_FILES_SCHEMA).parquet(source)
    else:
        df = spark.read.table(source)
    return with_file_id(df)


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One of the driver's parquet tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
