"""Iceberg-backed StageStore (north_rule: metrics checkpointed to Iceberg).

The sandbox bundles no iceberg-spark-runtime jar, so the end-to-end test
skips here with a reason; it executes wherever the jar is present
(`spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...`).
The jar-absent behavior (clean refusal, no silent parquet fallback when an
Iceberg catalog was explicitly requested) is asserted unconditionally.
"""

from __future__ import annotations

import pytest

from project_cascade_spark.session import enable_iceberg_catalog, iceberg_available
from project_cascade_spark.sources.sinks import StageStore


def test_iceberg_gate_refuses_without_jar(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("runtime jar present — covered by the e2e test below")
    assert enable_iceberg_catalog(spark, "cascade", str(tmp_path / "wh")) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        StageStore(spark, str(tmp_path / "run"), fingerprint="f",
                   iceberg_catalog="cascade")


def test_iceberg_stage_store_end_to_end(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar on the classpath (sandbox); "
                    "runs wherever the jar is supplied")
    assert enable_iceberg_catalog(spark, "cascade", str(tmp_path / "wh"))
    store = StageStore(spark, str(tmp_path / "run"), fingerprint="f",
                       iceberg_catalog="cascade")
    df = spark.range(10).withColumnRenamed("id", "x")
    out = store.run("s1", lambda: df)
    assert out.count() == 10
    # snapshot id recorded in _state; lineage from Iceberg .files metadata
    st = store.state().filter("stage = 's1'").first()
    assert st["snapshot_id"] is not None
    assert store.lineage().filter("stage = 's1'").count() >= 1
    # token-validated resume: same fingerprint -> stage NOT recomputed
    store2 = StageStore(spark, str(tmp_path / "run"), fingerprint="f",
                        iceberg_catalog="cascade")
    out2 = store2.run("s1", lambda: (_ for _ in ()).throw(AssertionError("recomputed")))
    assert out2.count() == 10 and store2.computed == []
    # createOrReplace is an atomic snapshot swap: replacing the table
    # advances the snapshot, and a changed fingerprint forces it
    store3 = StageStore(spark, str(tmp_path / "run"), fingerprint="OTHER",
                        iceberg_catalog="cascade")
    store3.run("s1", lambda: df.withColumn("x", df.x * 2))
    assert store3.computed == ["s1"]
    snaps = spark.sql(
        "SELECT count(*) AS n FROM cascade.cascade_stages.s1.snapshots"
    ).first()["n"]
    assert snaps >= 2
