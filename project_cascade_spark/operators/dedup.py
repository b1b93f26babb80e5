"""Deduplication operators beyond the LSH core: exact, n-gram Jaccard,
embedding near-dup.

- exact_dedup: hash groupBy → (representatives, mapping).  The standalone
  exact-dedup operator (any hash column: sha256, md5(norm), payload sha).
  The dedup pipeline applies the same move inline on md5(norm) (one groupBy
  subsumes both the byte-identical and the normalized-identical level) so
  identical content collapses before MinHash/LSH — the dominant cost saving
  on real corpora and the primary LSH skew guard.  Reference analogue:
  drop_duplicates after union (Regional_Run_Files/data_matching.py:125,197,
  SURVEY A11).
- ngram_jaccard_pairs: exact all-pairs Jaccard via an inverted index
  (explode shingle → join → count) — the non-approximate baseline used to
  validate MinHash recall, and a correctness-gate query in its own right.
- embedding_near_dup: cosine >= τ pairs over an embedding column with
  built-in higher-order functions (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_content_hash(df: DataFrame, content_col: str, out_col: str = "content_sha") -> DataFrame:
    """sha2-256 of content — also the per-row invariant the input_hint
    requires preserved end-to-end (BASELINE.json)."""
    return df.withColumn(out_col, F.sha2(F.col(content_col), 256))


def exact_dedup(
    df: DataFrame, id_col: str, hash_col: str = "content_sha"
) -> tuple[DataFrame, DataFrame]:
    """(representatives, mapping).

    representatives: one row per distinct hash (the min-id member) — LSH
    runs on these only.
    mapping: (id, rep_id) for every row, so exact-dup groups re-attach to
    whatever cluster their representative lands in.
    """
    reps = df.groupBy(hash_col).agg(F.min(id_col).alias("rep_id"))
    mapping = df.select(id_col, hash_col).join(reps, hash_col).select(
        F.col(id_col).alias("id"), "rep_id"
    )
    representatives = df.join(
        reps.withColumnRenamed("rep_id", id_col), [hash_col, id_col], "inner"
    )
    return representatives, mapping


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, shingles_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted-index join.

    |A ∩ B| from the shingle-equality join counts; |A ∪ B| = |A|+|B|-|A∩B|.
    Shingle arrays must be distinct.  Cost is Σ bucket², so this is the
    small/medium-scale exact baseline; LSH is the scale path.
    """
    sized = df.select(
        F.col(id_col), F.col(shingles_col), F.size(shingles_col).alias("n_sh")
    )
    inv = sized.select(
        F.col(id_col), F.col("n_sh"), F.explode(shingles_col).alias("shingle")
    )
    left = inv.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    right = inv.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_dup(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Cosine-similarity >= threshold pairs, brute force, no UDF.

    Dot product / norms via aggregate+zip_with (JVM higher-order fns).
    Brute force is the correctness baseline; similarity.py carries the
    LSH-bucketed scale path.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, z: acc + z * z)
    )
    cos = dot / (norm("va") * norm("vb"))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
