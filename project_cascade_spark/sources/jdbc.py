"""Optional JDBC source/sink — the reference's Postgres round trip
(Regional_Run_Files/db_calls.py:16-141 psycopg2 reads, 159-278 uploads)
re-expressed as Spark JDBC with partitioned parallel reads.

Exercised at runtime against Apache Derby embedded (whose driver ships in
Spark's own jars): tests/test_jdbc.py runs the full write → read →
partitioned-read → predicate-pushdown round trip through these exact
functions.  A Postgres run only swaps the URL and `--jars postgresql.jar`.

Scale shape:
- reads are PARTITIONED on a numeric column (partition_col + bounds +
  num_partitions) so a 10^9-row table arrives as num_partitions parallel
  range scans, not one serial cursor (the reference reads everything
  through a single psycopg2 cursor);
- `predicate` goes into the pushed-down WHERE of every partition query
  (db_calls.py builds the same WHERE strings by hand);
- writes batch through `batchsize`; `truncate` avoids re-creating the
  table on overwrite (the reference's upload_assigned_matches TRUNCATE +
  COPY, db_calls.py:127-141).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_scan_options(
    url: str,
    table: str,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    predicate: str | None = None,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """The scan declaration as a plain option dict (unit-testable without a
    driver jar).

    `table` may be a table name or a pushdown subquery alias:
    '(SELECT ... WHERE ...) AS t' — the reference's query-shaped reads
    (db_calls.py:62-105).
    """
    if predicate:
        # alias must not start with '_' — Derby (and the SQL standard)
        # reject leading-underscore identifiers
        table = f"(SELECT * FROM {table} WHERE {predicate}) AS pushed_scan"
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_col is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_col,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(properties or {})
    return opts


def jdbc_reader(spark: SparkSession, url: str, table: str, **kw) -> DataFrameReader:
    """Configured JDBC reader (call .load() to execute)."""
    return spark.read.format("jdbc").options(**jdbc_scan_options(url, table, **kw))


def read_jdbc(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    return jdbc_reader(spark, url, table, **kw).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    truncate: bool = False,
    properties: dict[str, str] | None = None,
) -> None:
    """Bulk upload (reference upload_assigned_matches, db_calls.py:127-141).
    mode='append' is the INSERT path; mode='overwrite' with truncate=True
    is the TRUNCATE+COPY path."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", str(truncate).lower())
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        w = w.option(k, v)
    w.save()
