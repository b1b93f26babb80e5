"""Salted hot-bucket cap (north_rule: explicit skew salting).

Plants one giant band (>> max_bucket_size) and asserts:
- the cap window partitions by (bucket, salt), never by the bare bucket —
  no single task sorts the degenerate bucket (plan inspection);
- total kept rows per bucket <= max_bucket_size;
- the kept set is deterministic and partition-independent (content-derived
  xxhash64 salt, not a physical-partition artifact);
- candidate_pairs with cap_buckets=True stays bounded on the planted band.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_cascade_spark.config import CascadeConfig
from project_cascade_spark.operators.minhash_lsh import cap_bucket_rows

GIANT = 5000
CAP = 100
SALTS = 16


@pytest.fixture(scope="module")
def giant_band(spark):
    # one degenerate band with GIANT members + a small healthy band
    rows = [(i, "hot") for i in range(GIANT)] + [(GIANT + i, "cold") for i in range(5)]
    return spark.createDataFrame(rows, "id long, band string")


def test_cap_total_per_bucket(giant_band):
    capped = cap_bucket_rows(giant_band, "band", "id", CAP, n_salts=SALTS)
    per_band = {r["band"]: r["n"] for r in
                capped.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_band["hot"] <= CAP
    # every salt partition of the hot band is saturated -> exactly S * (CAP//S)
    assert per_band["hot"] == SALTS * (CAP // SALTS)
    assert per_band["cold"] == 5  # under-cap buckets pass through untouched


def test_cap_window_is_salted_not_bare(giant_band):
    """The window partition spec must include the salt column — a bare
    partitionBy(band) would funnel the whole hot band through one task."""
    capped = cap_bucket_rows(giant_band, "band", "id", CAP, n_salts=SALTS)
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "_cap_salt" in plan
    # the salt is part of the window partition spec itself
    assert "windowspecdefinition(band" in plan.replace("#", "(").split(
        "windowspecdefinition"
    )[0] or "_cap_salt" in plan[plan.index("windowspecdefinition"):]


def test_cap_partition_independent(giant_band):
    """Content-derived salt: identical kept set under any physical layout."""
    a = cap_bucket_rows(giant_band.repartition(1), "band", "id", CAP, n_salts=SALTS)
    b = cap_bucket_rows(giant_band.repartition(13), "band", "id", CAP, n_salts=SALTS)
    ids_a = sorted(r["id"] for r in a.collect())
    ids_b = sorted(r["id"] for r in b.collect())
    assert ids_a == ids_b


def test_no_salt_partition_exceeds_per_salt_share(giant_band):
    """Each (bucket, salt) window partition holds at most the per-salt cap
    after filtering — the sort a single task performs is bounded by the
    salt fan-out, not the bucket size."""
    per_salt = CAP // SALTS
    capped = cap_bucket_rows(giant_band, "band", "id", CAP, n_salts=SALTS)
    counts = (
        capped.withColumn("_s", F.pmod(F.xxhash64("id"), F.lit(SALTS)))
        .groupBy("band", "_s").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx")).first()["mx"]
    )
    assert counts <= per_salt


def test_candidate_pairs_bounded_on_giant_band(spark):
    """End-to-end: identical signatures (one giant LSH bucket) stay bounded
    by the cap, so the pair join cannot go quadratic."""
    cfg = CascadeConfig(max_bucket_size=CAP, cap_salts=SALTS)
    n = 2000
    sig = [7] * cfg.num_perm
    df = spark.createDataFrame(
        [(i, sig) for i in range(n)], "file_id long, minhash array<long>"
    )
    from project_cascade_spark.operators.minhash_lsh import candidate_pairs

    pairs = candidate_pairs(df, "file_id", "minhash", cfg, cap_buckets=True)
    kept = SALTS * (CAP // SALTS)
    assert pairs.count() <= kept * (kept - 1) // 2
