"""JDBC source/sink (S3/S7 — reference db_calls.py).

Two layers:
- declaration: reader options (partitioned range scan, predicate pushdown)
  land in the plan exactly as configured, and misuse fails fast — testable
  against any dialect (the Postgres URL below never connects);
- RUNTIME: a full write -> read -> partitioned-read -> pushdown round trip
  against Apache Derby embedded, whose driver ships in Spark's own jars —
  the same read_jdbc/write_jdbc code paths a Postgres cluster run uses,
  executed for real.
"""

import pytest

from project_cascade_spark.sources.jdbc import (
    jdbc_reader,
    jdbc_scan_options,
    read_jdbc,
    write_jdbc,
)

URL = "jdbc:postgresql://localhost:5432/ocds"
DERBY_DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_partitioned_scan_requires_bounds():
    with pytest.raises(ValueError, match="bounds"):
        jdbc_scan_options(URL, "matching.assigned_matches", partition_col="id")


def test_scan_declares_partitioned_pushdown():
    opts = jdbc_scan_options(
        URL, "matching.assigned_matches",
        partition_col="id", lower_bound=0, upper_bound=1_000_000,
        num_partitions=16, predicate="match_date >= '2020-01-01'",
    )
    assert opts["numPartitions"] == "16"
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert "match_date >= '2020-01-01'" in opts["dbtable"]
    assert opts["dbtable"].startswith("(SELECT * FROM matching.assigned_matches")


def test_reader_load_without_driver_jar_fails_cleanly(spark):
    """Executing without a driver jar must raise (documented skip: the
    sandbox bundles no postgresql.jar; on a real cluster pass --jars)."""
    r = jdbc_reader(spark, URL, "t")
    with pytest.raises(Exception):
        r.load()


# ------------------------- runtime round trip (Derby) -------------------------

@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "cascadedb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def derby_table(spark, derby_url):
    """100 rows written through write_jdbc (the bulk-upload sink,
    db_calls.py:127-141 analogue) — the fixture IS the S7 runtime test."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("org-"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 7).alias("bucket"),
    )
    write_jdbc(df, derby_url, "matches", mode="overwrite", batchsize=25,
               properties=DERBY_DRIVER)
    return "matches"


def test_jdbc_write_read_round_trip(spark, derby_url, derby_table):
    got = read_jdbc(spark, derby_url, derby_table, properties=DERBY_DRIVER)
    assert got.count() == 100
    rows = {r["ID"] if "ID" in got.columns else r["id"]: r for r in got.collect()}
    assert len(rows) == 100


def test_jdbc_partitioned_read_executes(spark, derby_url, derby_table):
    """S3 runtime: the partitioned range scan arrives as num_partitions
    parallel JDBC partitions and returns the same data."""
    got = read_jdbc(
        spark, derby_url, derby_table,
        partition_col="id", lower_bound=0, upper_bound=100, num_partitions=4,
        properties=DERBY_DRIVER,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 100


def test_jdbc_predicate_pushdown_executes(spark, derby_url, derby_table):
    # quoted column: Spark's JDBC writer creates case-exact quoted columns,
    # and Derby folds unquoted identifiers to upper case
    got = read_jdbc(
        spark, derby_url, derby_table, predicate='"id" < 10',
        properties=DERBY_DRIVER,
    )
    assert got.count() == 10


def test_jdbc_append_then_read(spark, derby_url, derby_table):
    from pyspark.sql import functions as F

    extra = spark.range(100, 110).select(
        F.col("id"),
        F.concat(F.lit("org-"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 7).alias("bucket"),
    )
    write_jdbc(extra, derby_url, derby_table, mode="append",
               properties=DERBY_DRIVER)
    got = read_jdbc(spark, derby_url, derby_table, properties=DERBY_DRIVER)
    assert got.count() == 110
