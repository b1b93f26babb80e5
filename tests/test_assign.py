"""Window re-expressions of the reference's cluster-assignment loops
(SURVEY A2/A3/W1/W2; reference data_processing.py:342-381,
data_matching.py:234-276)."""

import pyspark.sql.functions as F

from project_cascade_spark.operators.assign import (
    add_cluster_sizes,
    attach_clusters,
    propagate_best,
    renumber_singletons,
    renumber_singletons_scalable,
)


def test_attach_clusters_singletons_get_own_id(spark):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "file_id long")
    assign = spark.createDataFrame([(1, 1), (2, 1)], "id long, cluster_id long")
    got = {
        r["file_id"]: r["cluster_id"]
        for r in attach_clusters(nodes, assign, "file_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 3}


def test_propagate_best_fills_nulls_from_best_scored_row(spark):
    # cluster 1: best-scored row (id=2, score .9) carries reg='R2';
    # null-payload rows inherit it; non-null payloads are kept.
    df = spark.createDataFrame(
        [
            (1, 1, 0.5, None),
            (2, 1, 0.9, "R2"),
            (3, 1, 0.7, "R3"),
            (4, 2, 0.1, None),
        ],
        "id long, cluster_id long, score double, reg string",
    )
    got = {
        r["id"]: r["reg"]
        for r in propagate_best(df, "cluster_id", "score", ["reg"], "id").collect()
    }
    assert got == {1: "R2", 2: "R2", 3: "R3", 4: None}


def test_cluster_sizes_window(spark):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 11)], "id long, cluster_id long")
    got = {r["id"]: r["cluster_size"] for r in add_cluster_sizes(df).collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_renumber_singletons_groups_by_exact_key(spark):
    # clusters: {1,2} real; 3,4 singletons sharing key 'x' -> same new id;
    # 5 singleton with key 'y' -> different new id, all above max_clust
    df = spark.createDataFrame(
        [
            (1, 100, "a"),
            (2, 100, "b"),
            (3, 101, "x"),
            (4, 102, "x"),
            (5, 103, "y"),
        ],
        "id long, cluster_id long, key string",
    )
    out = renumber_singletons(df, "key").collect()
    got = {r["id"]: r["cluster_id"] for r in out}
    assert got[1] == got[2] == 100
    assert got[3] == got[4] and got[3] > 103
    assert got[5] != got[3] and got[5] > 103


def test_renumber_singletons_scalable_same_contract(spark):
    """Scale path (no unpartitioned window): same grouping contract as the
    dense_rank form — equal keys share a fresh id above max(cluster_id);
    ids need not be dense."""
    df = spark.createDataFrame(
        [
            (1, 100, "a"),
            (2, 100, "b"),
            (3, 101, "x"),
            (4, 102, "x"),
            (5, 103, "y"),
        ],
        "id long, cluster_id long, key string",
    )
    out = renumber_singletons_scalable(df, "key")
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got[1] == got[2] == 100
    assert got[3] == got[4] and got[3] > 103
    assert got[5] != got[3] and got[5] > 103
