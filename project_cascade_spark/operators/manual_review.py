"""Manual-verification loop operators — the reference's human-in-the-loop
tail re-expressed over DataFrames.

Reference analogues (SURVEY O6/F12/F13/F17):
- manualMatching iterates the best-filtered matches *shuffled*
  (``best_filtered.sample(frac=1)``, match_filtering.py:193-225) so the
  reviewer doesn't only see the best-scored rows first → seeded_shuffle /
  review_sample.
- the assigned-matches upload stamps ``match_date`` with an ISO timestamp
  and a blank ``match_by`` column (data_matching.py:285-299) →
  stamp_match_date.
- the verified-matches round trip joins on upper-cased name keys
  (``UPPER(t1.src_name) = UPPER(ol.org_string)``, db_calls.py:110-122) →
  upper_key_join.
- convert_training.py:25-85 turns reviewed pairs into labelled JSON
  training records → training_export (to_json(struct(...)) — one JSON
  string per pair, written by any sink).

Scale notes: seeded_shuffle's rand(seed) is partition-dependent in Spark —
fine for "show me rows in random order", wrong for a reproducible audit
sample.  review_sample therefore orders by a *content-derived* key
(md5(id:seed)): deterministic under any partitioning, cross-engine
reproducible (the DuckDB oracle computes the same key), and a bounded
LIMIT keeps the global sort a cheap top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seeded_shuffle(df: DataFrame, seed: int = 42) -> DataFrame:
    """Random-order rows with a fixed seed — the reference's
    ``sample(frac=1)`` (match_filtering.py:205, SURVEY O6).

    NOTE: rand(seed) is reproducible only for a fixed partitioning; use
    review_sample for a partition-independent, oracle-checkable sample.
    """
    return df.orderBy(F.rand(seed))


def shuffle_key(col: Column, seed: int = 42) -> Column:
    """Deterministic per-row shuffle key: md5 of the id salted with the
    seed.  Identical in DuckDB (md5(id::VARCHAR || ':seed')), stable under
    repartitioning — the scale-safe seeded shuffle."""
    return F.md5(F.concat(col.cast("string"), F.lit(f":{seed}")))


def review_sample(
    df: DataFrame, id_col: str, n: int, seed: int = 42
) -> DataFrame:
    """First n rows of the deterministic shuffle — the manual-review batch.
    orderBy+limit is planned as a distributed top-k (TakeOrderedAndProject),
    not a global sort."""
    return (
        df.withColumn("shuffle_key", shuffle_key(F.col(id_col), seed))
        .orderBy("shuffle_key")
        .limit(n)
    )


def stamp_match_date(df: DataFrame) -> DataFrame:
    """Stamp the upload frame: ISO match_date + blank match_by
    (data_matching.py:294-298, SURVEY F12).  current_timestamp() is
    evaluated once per query by Catalyst, so every row of one run carries
    the same stamp — same as the reference's single datetime.now() call."""
    return df.withColumn(
        "match_date",
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
    ).withColumn("match_by", F.lit(" "))


def upper_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "left",
) -> DataFrame:
    """Case-insensitive key join — UPPER() both sides, the reference's
    orgs_lookup round trip (db_calls.py:110-122, SURVEY F13)."""
    return left.join(
        right, F.upper(left[left_key]) == F.upper(right[right_key]), how
    )


def training_export(
    df: DataFrame,
    src_col: str,
    reg_col: str,
    label_col: str,
    out_col: str = "training_json",
) -> DataFrame:
    """One labelled JSON training record per reviewed pair —
    to_json(struct(src_name, reg_name, label)) (convert_training.py:33-57,
    SURVEY F17).  Field order is struct order; Spark's and DuckDB's JSON
    serializers agree byte-for-byte on string fields."""
    return df.withColumn(
        out_col,
        F.to_json(
            F.struct(
                F.col(src_col).alias("src_name"),
                F.col(reg_col).alias("reg_name"),
                F.col(label_col).alias("label"),
            )
        ),
    )
