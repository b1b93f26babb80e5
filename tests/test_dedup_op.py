"""exact_dedup operator contract (SURVEY A11/J5): representatives = min-id
member per hash group; mapping covers every row; rep of a rep is itself."""

from project_cascade_spark.operators.dedup import add_content_hash, exact_dedup


def test_exact_dedup_reps_and_mapping(spark):
    df = add_content_hash(
        spark.createDataFrame(
            [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "ccc"), (5, "bbb")],
            "file_id long, content string",
        ),
        "content",
    )
    reps, mapping = exact_dedup(df, "file_id")
    rep_ids = sorted(r["file_id"] for r in reps.collect())
    assert rep_ids == [1, 3, 4]
    m = {r["id"]: r["rep_id"] for r in mapping.collect()}
    assert m == {1: 1, 2: 1, 3: 3, 4: 4, 5: 3}
