"""Headline-query profiler mirroring bench.py's methodology (fresh
session, sequential .count() at $SPARK_GRAFT_SF_DIR), with optional reps.

Usage: python tools/profile_queries.py [reps] [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "doc_near_dup_clusters",
    "doc_minhash_pairs",
    "doc_simhash_pairs",
    "emb_topk",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "match_stats",
    "cluster_sizes_window",
    "events_windowed_agg",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod

    from project_cascade_spark.session import build_session

    spark = build_session("cascade-qprof", master=f"local[{cpus}]")
    qs = entrymod.queries()
    out: dict = {}
    for name in names:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"q: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
    print("QUERIES " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
