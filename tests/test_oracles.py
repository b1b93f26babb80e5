"""Fast subset of the driver's correctness gate (full sweep:
tools/check_oracles.py).  Compares Spark queries against their DuckDB
oracle twins at sf0.001 — exact values after canonical rounding."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from project_cascade_spark.sources.tables import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "doc_near_dup_clusters",   # flagship: minhash→LSH→jaccard→CC
    "doc_simhash_pairs",
    "doc_exact_dedup",
    "match_stats",
    "emb_topk",
    "events_windowed_agg",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    got = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _canon(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_query_has_oracle():
    # round 3: emb_ann_lsh gained an exact DuckDB twin (materialized SRP
    # planes + identical bucket arithmetic), so EVERY query now has one.
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) == set(qs), "every query needs an oracle twin"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
