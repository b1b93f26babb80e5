"""F2 (html unescape pandas UDF), F4 (and/& variant rows), F9 (leven ratio)."""

import pyspark.sql.functions as F

from project_cascade_spark.functions.text import (
    and_amp_variants,
    html_unescape_udf,
    leven_ratio,
)


def test_html_unescape(spark):
    df = spark.createDataFrame(
        [("Smith &amp; Sons",), ("A &lt;B&gt;",), (None,)], "s string"
    )
    out = [r["u"] for r in df.select(html_unescape_udf()(F.col("s")).alias("u")).collect()]
    assert out == ["Smith & Sons", "A <B>", None]


def test_and_amp_variants(spark):
    df = spark.createDataFrame(
        [(1, "smith and sons"), (2, "a & b"), (3, "plain")], "id long, name string"
    )
    out = {(r["id"], r["name"]) for r in and_amp_variants(df, "name").collect()}
    assert out == {
        (1, "smith and sons"), (1, "smith & sons"),
        (2, "a & b"), (2, "a and b"),
        (3, "plain"),
    }


def test_leven_ratio_golden(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("abc", "xyz")], "a string, b string"
    )
    out = [r["r"] for r in df.select(leven_ratio(F.col("a"), F.col("b")).alias("r")).collect()]
    assert out == [57, 100, 0]
