"""Unit tests in the reference's own style: parametrized golden values
(reference: tests/test_data_processing.py:18-33)."""

import pyspark.sql.functions as F
import pytest

from project_cascade_spark.functions import text


def _one(spark, col_builder, value):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(col_builder(F.col("s")).alias("out")).first()["out"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        # the reference's own golden value (tests/test_data_processing.py:18-24)
        (
            "Ditta ABBOTT  VASCULAR Knoll-Ravizza S.p.A.",
            "ditta abbott vascular knollravizza spa",
        ),
        ("A & B Consulting!!", "a & b consulting"),
    ],
)
def test_remv_punct(spark, raw, expected):
    assert _one(spark, text.remv_punct, raw) == expected


def test_normalize_ws(spark):
    assert _one(spark, text.normalize_ws, "  Foo\t\tBar\n Baz  ") == "foo bar baz"


def test_std_org_suffixes(spark):
    out = _one(
        spark,
        lambda c: text.std_org_suffixes(text.remv_punct(c)),
        "ACME Holdings Limited",
    )
    assert out == "acme holdings ltd"


def test_strip_digits(spark):
    assert _one(spark, text.strip_digits, "12 High Street 99") == "High Street"


def test_normalize_code_strips_comments(spark):
    code = "def f(a):\n    # a comment\n    x = 1  // tail\n    return x"
    out = _one(spark, text.normalize_code, code)
    assert "comment" not in out and "tail" not in out
    assert "def f(a): x = 1 return x" == out


def test_word_shingles(spark):
    out = _one(spark, lambda c: text.word_shingles(c, 3), "a b c d")
    assert out == ["a b c", "b c d"]
    # shorter than k → whole string, never empty
    out = _one(spark, lambda c: text.word_shingles(c, 3), "a b")
    assert out == ["a b"]


def test_char_shingles(spark):
    out = _one(spark, lambda c: text.char_shingles(c, 3), "abcd")
    assert out == ["abc", "bcd"]
    out = _one(spark, lambda c: text.char_shingles(c, 9), "ab")
    assert out == ["ab"]
