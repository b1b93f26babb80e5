"""Focused tests for the batched rolling-hash text kernels (round-6
optimization): char-shingle hashing and fused positional winnowing.

The kernels replace the JVM substring+xxhash64-per-position chains on the
pipeline-internal paths.  Contracts pinned here:

- shingle-set CARDINALITY equals the expression chain's distinct-gram count
  (values differ by design — rolling hash vs xxhash64 — but the set
  structure driving MinHash/Jaccard must be identical);
- hash values are content-local: the same text yields the same shingle set
  regardless of batch neighbors or position in the batch;
- values match an independent pure-Python polynomial-hash reference;
- the fused winnow kernel preserves the MOSS alignment guarantee (a shared
  block ≥ k + w - 1 chars yields an ALIGNED (fp, pos) anchor);
- the in-kernel occurrence cap equals the row_number-window form.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from project_cascade_spark.config import MERSENNE31, CascadeConfig
from project_cascade_spark.functions.kernels import (
    char_shingle_hashes_kernel,
    make_winnow_pos_text_udf,
)
from project_cascade_spark.functions.text import char_shingles

CFG = CascadeConfig(winnow_k=8, winnow_w=9, min_common_substring=16,
                    max_bucket_size=50)

TEXTS = [
    "def foo(): return 1",
    "a" * 5,
    "",
    "short",
    "x y z " * 40,
    "The quick brown fox jumps over the lazy dog. " * 10,
    "ab",
]


def _ref_shingle_hashes(text: str, k: int) -> list[int]:
    """Independent reference: polynomial rolling hash mod 2^64 with the
    kernel's constants, splitmix64 finalizer, mod MERSENNE31, distinct."""
    B = 0x9E3779B97F4A7C15
    M = 1 << 64

    def h(gram: str) -> int:
        acc = 0
        for j, ch in enumerate(gram):
            acc = (acc + (ord(ch) + 1) * pow(B, j, M)) % M
        z = acc
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
        return (z ^ (z >> 31)) % MERSENNE31

    grams = (
        [text[i : i + k] for i in range(len(text) - k + 1)]
        if len(text) >= k else [text]
    )
    return sorted({h(g) for g in grams})


@pytest.mark.parametrize("k", [3, 9])
def test_shingle_kernel_matches_reference_and_cardinality(spark, k):
    df = spark.createDataFrame([(t,) for t in TEXTS], "norm string")
    rows = df.select(
        "norm",
        char_shingle_hashes_kernel(F.col("norm"), k).alias("kern"),
        F.size(F.array_distinct(char_shingles(F.col("norm"), k))).alias("n_expr"),
    ).collect()
    for r in rows:
        want = _ref_shingle_hashes(r["norm"], k)
        assert sorted(r["kern"]) == want, r["norm"][:40]
        # distinct-gram cardinality equals the expression chain's (no
        # collisions on these inputs)
        assert len(r["kern"]) == r["n_expr"], r["norm"][:40]


def test_shingle_kernel_content_local(spark):
    """Same text in different batch contexts → identical shingle set (the
    prefix-table renormalization must make window hashes position-free)."""
    probe = "position independence probe text 123"
    ctx_a = [("pad-" + "x" * i,) for i in range(5)] + [(probe,)]
    ctx_b = [(probe,)] + [("other " * j,) for j in range(7)]
    k = 9

    def get(rows):
        df = spark.createDataFrame(rows, "norm string")
        out = df.filter(F.col("norm") == probe).select(
            char_shingle_hashes_kernel(F.col("norm"), k).alias("sh")
        ).collect()
        return sorted(out[0]["sh"])

    assert get(ctx_a) == get(ctx_b)


def test_winnow_pos_kernel_alignment_guarantee(spark):
    """A shared block of length >= winnow_k + winnow_w - 1 must yield at
    least one anchor (fp, pos_a)/(fp, pos_b) whose k-grams truly align."""
    rng = random.Random(11)
    block = "GUARANTEED COMMON RUN OF TEXT " * 3   # 90 chars >= 8 + 9 - 1

    def body(n):
        return "".join(rng.choice("abcdefgh ") for _ in range(n))

    da = body(150) + block + body(60)
    db = body(90) + block + body(120)
    df = spark.createDataFrame([(1, da), (2, db)], "id long, norm string")
    rows = df.select(
        "id", make_winnow_pos_text_udf(CFG)(F.col("norm")).alias("fps")
    ).collect()
    prints = {r["id"]: [(p["fp"], p["pos"]) for p in r["fps"]] for r in rows}
    aligned = any(
        fa == fb and da[pa : pa + CFG.winnow_k] == db[pb : pb + CFG.winnow_k]
        for fa, pa in prints[1]
        for fb, pb in prints[2]
    )
    assert aligned


def test_winnow_kernel_cap_equals_window_cap(spark):
    """In-kernel occurrence cap == the row_number window cap of
    fingerprint_anchor_pairs (earliest positions per (doc, print))."""
    from project_cascade_spark.operators.suffix import (
        add_fingerprints_pos,
        fingerprint_anchor_pairs,
    )

    rng = random.Random(5)
    run = "q" * 60                       # one gram repeated ~53x per doc

    def body():
        return "".join(rng.choice("abcdefg ") for _ in range(120))

    rows = [(i, body() + run + body()) for i in range(8)]
    docs = spark.createDataFrame(rows, "id long, norm string")

    def anchors(fps, occ):
        out = {}
        for r in fingerprint_anchor_pairs(
            fps, "id", "fps_pos", CFG, template_filter=True,
            max_occ_per_doc=occ,
        ).collect():
            out[(r["id_a"], r["id_b"])] = sorted(
                (p["pos_a"], p["pos_b"]) for p in r["anchors"]
            )
        return out

    via_window = anchors(add_fingerprints_pos(docs, "norm", CFG), 4)
    via_kernel = anchors(
        add_fingerprints_pos(docs, "norm", CFG, max_occ_per_doc=4), 0
    )
    assert via_window == via_kernel
    assert via_window  # non-vacuous
