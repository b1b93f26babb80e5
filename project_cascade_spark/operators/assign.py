"""Cluster assignment + in-cluster propagation — window re-expressions of
the reference's Python group loops.

Reference analogues:
- assignmatcheswithinclusters / getMaxId: per-cluster argmax on
  Confidence_Score, copy the best row's registry columns onto the rest
  (Regional_Run_Files/data_processing.py:342-381) → here a single window
  with first(..., ignorenulls) over a full-partition frame (SURVEY W1/A2).
- cluster size annotation (data_matching.py:253-264) → count window (W2).
- singleton re-grouping by exact key: groupby().ngroup() + max_clust
  (data_matching.py:269-273) → dense_rank + offset (A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attach_clusters(
    nodes: DataFrame, assignments: DataFrame, id_col: str
) -> DataFrame:
    """Left-join cluster ids onto the full table; rows not in any dup
    cluster become their own singleton cluster (cluster_id = own id).

    Reference analogue: the right-outer add-back of unmatched rows
    (data_matching.py:130-144, SURVEY J2).
    """
    joined = nodes.join(
        assignments.withColumnRenamed("id", id_col), id_col, "left"
    )
    return joined.withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )


def add_cluster_sizes(df: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """count(*) over (partition by cluster) — no join needed (SURVEY W2)."""
    w = Window.partitionBy(cluster_col)
    return df.withColumn("cluster_size", F.count(F.lit(1)).over(w))


def propagate_best(
    df: DataFrame,
    cluster_col: str,
    score_col: str,
    payload_cols: list[str],
    id_col: str,
) -> DataFrame:
    """For each cluster, find the highest-score row whose payload is set and
    copy its payload onto rows with null payload (SURVEY A2/W1).

    One window, full-partition frame, first(ignorenulls) — replaces the
    reference's groupby().progress_apply(getMaxId) Python loop.
    """
    w = (
        Window.partitionBy(cluster_col)
        .orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = df
    for c in payload_cols:
        best = F.first(F.col(c), ignorenulls=True).over(w)
        out = out.withColumn(c, F.coalesce(F.col(c), best))
    return out


def renumber_singletons(
    df: DataFrame, key_col: str, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Reference 'manual clustering': rows left in size-1 clusters are
    re-grouped by exact key and given fresh cluster ids above the current
    max (data_matching.py:234-276).

    dense_rank over the key gives the group number; a global max is a cheap
    scalar agg.  NOTE: the unpartitioned dense_rank window puts singleton
    rows through one reducer — kept ONLY for oracle parity with the
    reference's dense ngroup() numbering (q:singleton_renumber).  In a real
    corpus singletons are the majority, so any pipeline path must use
    renumber_singletons_scalable below instead.
    """
    sized = add_cluster_sizes(df, cluster_col)
    singles = sized.filter(F.col("cluster_size") == 1).drop("cluster_size")
    grouped = sized.filter(F.col("cluster_size") > 1).drop("cluster_size")
    max_clust = df.agg(F.max(cluster_col)).first()[0] or 0
    w = Window.orderBy(key_col)
    renum = singles.withColumn(
        cluster_col, F.dense_rank().over(w) + F.lit(max_clust)
    )
    return grouped.unionByName(renum)


def renumber_singletons_scalable(
    df: DataFrame, key_col: str, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Scale path for renumber_singletons: same contract (size-1 clusters
    re-grouped by exact key, fresh ids strictly above the current max, equal
    keys share an id), but NO unpartitioned window anywhere.

    Ids come from monotonically_increasing_id() over the DISTINCT keys
    (partition-offset encoding: distinct, parallel, not dense) offset past
    max(cluster_id).  Rows then join their key's new id back — a shuffle on
    the key, same as any groupBy.
    """
    sized = add_cluster_sizes(df, cluster_col)
    singles = sized.filter(F.col("cluster_size") == 1).drop("cluster_size")
    grouped = sized.filter(F.col("cluster_size") > 1).drop("cluster_size")
    max_clust = df.agg(F.max(cluster_col)).first()[0] or 0
    key_ids = (
        singles.select(key_col)
        .distinct()
        .withColumn("_new_id", F.monotonically_increasing_id() + F.lit(max_clust + 1))
        # pinned: monotonically_increasing_id is partition-dependent, so an
        # unpersisted plan could hand the same key a different id on each
        # action (count vs write).  localCheckpoint materializes the mapping
        # once; every downstream action reads the same ids.
        .localCheckpoint(eager=True)
    )
    renum = (
        singles.drop(cluster_col)
        .join(key_ids, key_col)
        .withColumnRenamed("_new_id", cluster_col)
        .select(*singles.columns)
    )
    return grouped.unionByName(renum)
