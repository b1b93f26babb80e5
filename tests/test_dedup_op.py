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


def test_jaccard_verify_plan_is_shuffled_not_broadcast(spark):
    """The verify joins must stay shuffled: AQE broadcasting the
    pairs-with-arrays intermediate funnels a single-partition broadcast
    build (measured ~11s serial at 30k files), and at corpus scale
    neither side fits in a broadcast anyway."""
    import pyspark.sql.functions as F

    from project_cascade_spark.config import DEFAULT_CONFIG
    from project_cascade_spark.operators.verify import jaccard_verify

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.array(F.col("id").cast("int"), (F.col("id") + 1).cast("int")).alias("sh"),
    )
    pairs = spark.range(50).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = jaccard_verify(pairs, docs, "doc_id", "sh", DEFAULT_CONFIG,
                         keep_below=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
