"""End-to-end pipeline on the planted-truth generator: the golden
cluster-assignment test, modeled on the reference's fixture pair
(tests/OLDtests/test_data/test_clustered.csv →
test_clustered_assigned.csv, reference tests/test_data_processing.py:44-50).

Recall target: every planted intra-group pair (kinds near/short/exact) in
one cluster, >= 0.99 overall (BASELINE.json).  Precision guard: planted
'block' pairs (shared long substring, NOT near-dups) must stay in separate
clusters but appear in the substring side output.  Plus the sha256
invariant: output content is byte-identical to input content per row.
"""

import itertools

import pyspark.sql.functions as F
import pytest

from project_cascade_spark.config import CODE_CONFIG
from project_cascade_spark.datagen import generate_code_files
from project_cascade_spark.plans.pipeline import dedup_pipeline
from project_cascade_spark.sources.tables import load_code_files

CFG = CODE_CONFIG


@pytest.fixture(scope="module")
def result(spark):
    pdf, truth = generate_code_files(400, seed=7)
    df = load_code_files(spark, pdf)
    res = dedup_pipeline(df, CFG, store=None, with_substring_pass=True)
    assigned = res.assignments.select(
        "repo", "path", "commit", "file_id", "cluster_id", "content", "content_sha"
    ).toPandas()
    truth = truth.merge(assigned, on=["repo", "path", "commit"], validate="1:1")
    subs = res.substring_pairs.toPandas()
    return pdf, truth, subs


def _pair_recall(truth, kinds):
    t = truth[truth["kind"].isin(kinds)]
    total, hit = 0, 0
    for _gid, grp in t.groupby("group_id"):
        ids = list(zip(grp["file_id"], grp["cluster_id"]))
        for (ia, ca), (ib, cb) in itertools.combinations(ids, 2):
            total += 1
            hit += int(ca == cb)
    return hit, total


def test_dup_pair_recall(result):
    _pdf, truth, _subs = result
    hit, total = _pair_recall(truth, ["near", "short", "exact"])
    assert total > 50
    assert hit / total >= 0.99, f"recall {hit}/{total}"


def test_no_cross_group_merges(result):
    """Precision: clusters never span planted groups of different kinds
    ('block' pairs share text but are not near-dups; 'uniq' are singletons)."""
    _pdf, truth, _subs = result
    multi = truth.groupby("cluster_id")["group_id"].nunique()
    merged = multi[multi > 1]
    assert len(merged) == 0, f"clusters merging distinct groups: {merged}"


def test_block_pairs_in_substring_output_not_clusters(result):
    _pdf, truth, subs = result
    t = truth[truth["kind"] == "block"]
    sub_pairs = {tuple(sorted(p)) for p in zip(subs["id_a"], subs["id_b"])}
    found, total = 0, 0
    for _gid, grp in t.groupby("group_id"):
        ids = sorted(grp["file_id"])
        for a, b in itertools.combinations(ids, 2):
            total += 1
            found += int(tuple(sorted((a, b))) in sub_pairs)
    assert total > 0
    assert found / total >= 0.99, f"substring recall {found}/{total}"


def test_sha256_invariant(result):
    """content rides through the pipeline untouched (input_hint)."""
    pdf, truth, _subs = result
    import hashlib

    orig = {
        (r, p, c): hashlib.sha256(t.encode()).hexdigest()
        for r, p, c, t in zip(pdf["repo"], pdf["path"], pdf["commit"], pdf["content"])
    }
    for _i, row in truth.iterrows():
        key = (row["repo"], row["path"], row["commit"])
        assert hashlib.sha256(row["content"].encode()).hexdigest() == orig[key]
        assert row["content_sha"] == orig[key]


def test_exact_dups_share_cluster_even_if_unverified(result):
    _pdf, truth, _subs = result
    t = truth[truth["kind"] == "exact"]
    for _gid, grp in t.groupby("group_id"):
        assert grp["cluster_id"].nunique() == 1
