"""The expression forms and the Arrow-kernel forms must agree bit-for-bit —
this is what lets the DuckDB oracle (which mirrors the expression form)
validate the kernel-powered pipeline."""

import pyspark.sql.functions as F

from project_cascade_spark.config import CascadeConfig
from project_cascade_spark.functions.hashing import (
    minhash_expr,
    shingle_hashes,
    simhash_expr,
    token_hashes,
)
from project_cascade_spark.functions.kernels import apply_minhash, apply_simhash

CFG = CascadeConfig(num_perm=16, lsh_bands=4, lsh_rows=4)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "a b",
    "xyzzy",
    "the quick brown fox jumps over the lazy dog again and again and again",
]


def _df(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "s string")
    toks = F.split("s", " ")
    return df.withColumn("toks", toks).withColumn(
        "hashes", shingle_hashes(F.col("toks"))
    ).withColumn("tok_hashes", token_hashes(F.col("toks")))


def test_minhash_kernel_matches_expr(spark):
    df = _df(spark)
    out = df.select(
        minhash_expr(F.col("hashes"), CFG).alias("expr_sig"),
        apply_minhash(F.col("hashes"), CFG).alias("kern_sig"),
    ).collect()
    for row in out:
        assert list(row["expr_sig"]) == list(row["kern_sig"])


def test_simhash_kernel_matches_expr(spark):
    df = _df(spark)
    out = df.select(
        simhash_expr(F.col("tok_hashes"), CFG).alias("expr_sim"),
        apply_simhash(F.col("tok_hashes"), CFG).alias("kern_sim"),
    ).collect()
    for row in out:
        assert row["expr_sim"] == row["kern_sim"]


def test_simhash_kernel_null_empty_parity(spark):
    """Empty token array → all bits set (every vote sum is 0 >= 0); null
    array → null.  Kernel must match the expression form on both (the
    'bit-identical twin' contract includes the degenerate inputs)."""
    df = spark.createDataFrame(
        [(1, []), (2, None), (3, [12345, 67890])],
        "id long, tok_hashes array<long>",
    )
    out = {
        r["id"]: (r["expr_sim"], r["kern_sim"])
        for r in df.select(
            "id",
            simhash_expr(F.col("tok_hashes"), CFG).alias("expr_sim"),
            apply_simhash(F.col("tok_hashes"), CFG).alias("kern_sim"),
        ).collect()
    }
    assert out[1][0] == out[1][1] == (1 << CFG.simhash_bits) - 1
    assert out[2][0] is None and out[2][1] is None
    assert out[3][0] == out[3][1]


def test_minhash_similar_texts_share_bands(spark):
    """Sanity: near-identical token streams collide on most signature slots."""
    df = _df(spark)
    sigs = [list(r["sig"]) for r in df.select(apply_minhash(F.col("hashes"), CFG).alias("sig")).collect()]
    same = sum(1 for a, b in zip(sigs[0], sigs[4]) if a == b)
    assert same >= CFG.num_perm // 2  # texts 0 and 4 share most shingles
    diff = sum(1 for a, b in zip(sigs[0], sigs[3]) if a == b)
    assert diff <= 2  # unrelated texts share ~0 slots
