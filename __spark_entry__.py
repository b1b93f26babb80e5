"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship near-dup clustering query on sf0.001.
queries()      — one callable per implemented operator family
                 (project_cascade_spark/queries.py).
oracle_sql()   — DuckDB twins generated from the same config constants
                 (project_cascade_spark/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_cascade_spark.queries import (
    build_oracles,
    build_queries,
    doc_near_dup_clusters,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash/LSH near-dup detection + connected-components
    clustering over the documents table at sf0.001."""
    return doc_near_dup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
