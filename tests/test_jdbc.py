"""JDBC source/sink declaration (S3/S7 tail — reference db_calls.py).

No JDBC driver jar ships in this sandbox, so execution is skipped by
design; what IS testable is the declaration layer: reader options
(partitioned range scan, predicate pushdown) land in the plan exactly as
configured, and misuse fails fast.
"""

import pytest

from project_cascade_spark.sources.jdbc import jdbc_reader, jdbc_scan_options

URL = "jdbc:postgresql://localhost:5432/ocds"


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
