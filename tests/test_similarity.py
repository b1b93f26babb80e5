"""ANN operators: brute-force exactness + SRP-LSH recall on real testdata."""

import pyspark.sql.functions as F

from project_cascade_spark.operators.similarity import (
    add_srp_buckets,
    brute_force_topk,
    srp_lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return df.withColumn("embedding", F.col("embedding").cast("array<double>"))


def test_srp_buckets_deterministic(spark):
    emb = _emb(spark)
    a = add_srp_buckets(emb, "embedding", dim=64, n_planes=8, seed=1)
    b = add_srp_buckets(emb, "embedding", dim=64, n_planes=8, seed=1)
    assert a.select("vec_id", "srp_bucket").exceptAll(
        b.select("vec_id", "srp_bucket")
    ).count() == 0


def test_srp_lsh_recall_vs_brute_force(spark):
    emb = _emb(spark).limit(200)
    truth = brute_force_topk(emb, emb, "vec_id", "embedding", k=1).filter(
        F.col("rank") == 1
    )
    approx = srp_lsh_topk(
        emb, "vec_id", "embedding", dim=64, k=1, n_planes=4, n_tables=8
    )
    t = {(r["q_id"], r["n_id"]) for r in truth.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.filter(F.col("rank") == 1).collect()}
    # this testdata's top-1 neighbors sit at ~72° (cosine ~0.3) — the hard
    # case for SRP; 4 planes x 8 tables gives expected recall ~0.64
    assert len(a) > 0
    assert len(t & a) / len(t) >= 0.45
