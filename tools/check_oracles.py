"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB over
the same parquet tables, compares row count, schema (column names), and
order-insensitive values.  Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from project_cascade_spark.session import build_session  # noqa: E402
from project_cascade_spark.sources.tables import TESTDATA_TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # data-derived oracle literals (the trained IVF centroids) must come
    # from the SAME tables the Spark side reads, or emb_ann_ivf diverges
    # whenever this mirror runs at a different scale than the driver's gate
    os.environ.setdefault("SPARK_GRAFT_GATE_SF_DIR", sf_dir)
    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error {exc}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows, {t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            want = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(exc)[:300]}")
            continue
        t_duck = time.time() - t0
        g, w = canon(got), canon(want)
        status = "ok"
        if list(g.columns) != list(w.columns):
            status = f"SCHEMA MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            status = f"ROWCOUNT MISMATCH spark={len(g)} duck={len(w)}"
        elif not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            idx = neq.any(axis=1)
            status = (
                f"VALUE MISMATCH cols={bad_cols} rows={int(idx.sum())}/{len(g)}\n"
                f"  spark:\n{g[idx].head(3)}\n  duck:\n{w[idx].head(3)}"
            )
        tag = "OK  " if status == "ok" else "FAIL"
        if status != "ok":
            failures.append(name)
        print(f"{tag} {name}: {len(g)} rows (spark {t_spark:.1f}s, duck {t_duck:.1f}s)"
              + ("" if status == "ok" else f" {status}"))

    spark.stop()
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
