"""Manual-verification loop (O6/F12/F13/F17) + shorten_name (F8) goldens.

Reference analogues: match_filtering.py:193-225 (seeded shuffle),
data_matching.py:294 (match_date stamp), db_calls.py:110-122 (UPPER join),
convert_training.py:33-57 (labelled-pair JSON), data_processing.py:121-137
(shortenName — golden values from the reference's own
tests/test_data_processing.py:27-33).
"""

import datetime as dt
import json

import pyspark.sql.functions as F

from project_cascade_spark.functions.text import shorten_name, std_org_suffixes
from project_cascade_spark.operators.manual_review import (
    review_sample,
    seeded_shuffle,
    stamp_match_date,
    training_export,
    upper_key_join,
)


def test_shorten_name_reference_goldens(spark):
    df = spark.createDataFrame(
        [
            ("ditta abbott vascular knollravizza ltd",),
            ("test-org plc",),
            ("test llp org",),
        ],
        "s string",
    )
    out = [r["o"] for r in df.select(shorten_name(F.col("s")).alias("o")).collect()]
    assert out == [
        "ditta abbott vascular knollravizza",
        "test org",
        "test org",
    ]


def test_std_org_suffixes_full_reference_dict(spark):
    """Every long form of the reference org_suffixes_dict standardises."""
    cases = {
        "acme limited liability partnership": "acme llp",
        "acme public limited company": "acme plc",
        "acme limited": "acme ltd",
        "acme l.l.p": "acme llp",
        "acme l l p": "acme llp",
        "leeds nhs foundation trust": "leeds nft",
        "leeds nhs trust": "leeds nft",
        "leeds nhs ft": "leeds nft",
        "leeds n f t": "leeds nft",
        "acme incorporated": "acme inc",
    }
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    out = [r["o"] for r in df.select(std_org_suffixes(F.col("s")).alias("o")).collect()]
    assert out == list(cases.values())


def test_review_sample_deterministic_and_partition_independent(spark):
    df = spark.createDataFrame([(i, f"name{i}") for i in range(500)], "id long, name string")
    s1 = [r["id"] for r in review_sample(df, "id", 20, seed=7).collect()]
    s8 = [r["id"] for r in review_sample(df.repartition(8), "id", 20, seed=7).collect()]
    assert s1 == s8 and len(s1) == 20          # same sample under any partitioning
    s_other = [r["id"] for r in review_sample(df, "id", 20, seed=8).collect()]
    assert s1 != s_other                        # seed actually changes the sample
    assert sorted(s1) != s1                     # it is shuffled, not sorted


def test_seeded_shuffle_covers_all_rows(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    out = [r["id"] for r in seeded_shuffle(df, seed=3).collect()]
    assert sorted(out) == list(range(100))


def test_stamp_match_date_iso(spark):
    df = spark.createDataFrame([(1,)], "id long")
    row = stamp_match_date(df).collect()[0]
    stamped = dt.datetime.fromisoformat(row["match_date"])
    now = dt.datetime.now(dt.timezone.utc)
    assert abs((now - stamped).total_seconds()) < 600
    assert row["match_by"] == " "


def test_upper_key_join_matches_only_via_upper(spark):
    left = spark.createDataFrame([(1, "Acme Ltd"), (2, "NoMatch")], "id long, name string")
    right = spark.createDataFrame([("ACME LTD", 10)], "org_string string, lookup long")
    out = upper_key_join(left, right, "name", "org_string", "inner").collect()
    assert [(r["id"], r["lookup"]) for r in out] == [(1, 10)]


def test_training_export_json_roundtrip(spark):
    df = spark.createDataFrame(
        [("src a", "reg a", "match"), ('q "x"', "r", "distinct")],
        "s string, r string, l string",
    )
    out = [r["training_json"] for r in training_export(df, "s", "r", "l").collect()]
    parsed = [json.loads(j) for j in out]
    assert parsed[0] == {"src_name": "src a", "reg_name": "reg a", "label": "match"}
    assert parsed[1]["src_name"] == 'q "x"' and parsed[1]["label"] == "distinct"
