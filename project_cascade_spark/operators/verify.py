"""Jaccard verification of candidate pairs.

Reference analogue: the threshold step of dedupe.io's scoring
(recall_weight=1 thresholding, evidence /root/reference/info.log:17-18) and
the reference's own Levenshtein-ratio quality score
(Regional_Run_Files/data_processing.py:139-149).  Here the verify metric is
exact Jaccard over distinct shingle sets (north_rule), computed with
built-in array expressions — no Python in the loop.

Scale: the two id-equi-joins below shuffle the shingle arrays once each;
pairs were deduped upstream so no array travels twice for the same pair.
At cluster scale you'd bucket `docs` by id so these joins are shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CascadeConfig


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    shingles_col: str,
    cfg: CascadeConfig,
    keep_below: bool = False,
    docs_b: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, *extra pair columns, jaccard) for pairs with
    jaccard >= cfg.jaccard_threshold.  Any columns on `pairs` beyond the
    two ids ride through unchanged (the pipeline tags candidates with
    their blocking method and verifies all of them in ONE pass).

    Shingle arrays must already be distinct (word_shingles/char_shingles
    emit array_distinct output).

    docs_b: feature table for the id_b side when verifying TWO-TABLE
    linkage candidates (id spaces may overlap across tables, so each side
    must resolve against its own table); default is self-dedup (both
    sides from `docs`).
    """
    # SHUFFLE_HASH pinned on the array side: at corpus scale neither the
    # pair set nor the shingle arrays are broadcastable, and letting AQE
    # broadcast the intermediate (pairs ⋈ sh_a, arrays attached) funnels a
    # single-partition build task (~11 s serial at 30k files, measured) —
    # the shuffled plan runs the same join fully parallel.
    #
    # Build-memory caveat: a shuffled hash join builds its per-partition
    # hash map in memory and CANNOT spill it, so the docs side must fit
    # |docs arrays| / shuffle_partitions per task.  That is the operating
    # envelope here (shuffle partitions scale with cluster size, and the
    # capped candidate set bounds how many distinct ids reach the build),
    # but on a corpus where per-partition arrays outgrow executor memory,
    # swap the hint for "merge" (sort-merge spills) — same shuffled,
    # no-serial-broadcast plan shape, just spillable.
    a = docs.select(F.col(id_col).alias("id_a"), F.col(shingles_col).alias("sh_a"))
    b = (docs_b if docs_b is not None else docs).select(
        F.col(id_col).alias("id_b"), F.col(shingles_col).alias("sh_b")
    )
    extra = [c for c in pairs.columns if c not in ("id_a", "id_b")]
    joined = pairs.join(a.hint("shuffle_hash"), "id_a").join(
        b.hint("shuffle_hash"), "id_b"
    )
    # |A ∪ B| = |A| + |B| - |A ∩ B| for the (distinct) shingle arrays —
    # identical integers to size(array_union(...)), at one O(n) array op
    # per pair instead of two (array_union built a second hash set per
    # pair; this halves the per-pair verify work, measured on the edges
    # stage).  size() on the already-joined arrays is O(1) metadata.
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    scored = joined.select(
        "id_a", "id_b", *extra, (inter / union).alias("jaccard")
    )
    if keep_below:
        return scored
    return scored.filter(F.col("jaccard") >= cfg.jaccard_threshold)
