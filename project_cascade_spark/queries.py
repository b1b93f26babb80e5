"""Driver-contract queries: one callable per implemented operator family.

Each function takes (spark, sf_dir) and returns a DataFrame whose column
names, types and (rounded) values match the DuckDB oracle twin in oracle.py
— the driver compares them via order-insensitive value hash.  Keep both
sides in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .config import CascadeConfig, DEFAULT_CONFIG
from .functions.hashing import hash60
from .functions.text import normalize_ws
from .operators import textstats
from .operators.assign import attach_clusters
from .operators.connected_components import connected_components
from .operators.dedup import embedding_near_dup, ngram_jaccard_pairs
from .operators.minhash_lsh import candidate_pairs
from .operators.simhash import add_simhash, simhash_candidate_pairs
from .operators.suffix import add_fingerprints, fingerprint_candidate_pairs
from .operators.verify import jaccard_verify
from .sources.tables import load_testdata

DOC_CFG = DEFAULT_CONFIG                     # word 3-shingles, 64 perm, 16x4, τ=0.8
DOC_WINNOW_CFG = CascadeConfig(winnow_k=16, winnow_w=16)
EMB_DIM = 64
EMB_TOPK = 5
EMB_QUERIES = 25
EMB_NEAR_DUP_T = 0.4  # data-driven: max pairwise cosine in testdata is ~0.51
EMB_ANN_PLANES = 4    # SRP geometry shared by the Spark query and its oracle
EMB_ANN_TABLES = 8
EMB_ANN_SEED = 42
EMB_IVF_CELLS = 16    # IVF geometry shared by the Spark query and its oracle
EMB_IVF_PROBE = 4
EMB_IVF_TRAIN_SAMPLE = 512  # quantizer trains on the this-many smallest ids
EMB_IVF_TRAIN_ITERS = 8


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a SMALL single-file scan across cores: the testdata
    tables are one parquet file each, so every per-row stage downstream
    (shingling, hashing kernels, vector scoring) would otherwise run in ONE
    task regardless of core count — measured as the dominant wall of the
    doc/embedding queries at sf0.1.  The shuffle moves only the raw rows
    (a few MB) and changes no result (everything downstream is
    content-derived, partition-independent)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(max(par, 8))


def _docs_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT persisted here: the LSH queries persist the SIGNATURE frame (which
    # carries the shingles) and reference it from every subtree — caching
    # both levels would store the shingle-string arrays twice.
    #
    # Shingling + md5 hashing run in the C-speed kernel
    # (make_word_shingles_md5_udf — bit-identical to
    # word_shingles/shingle_hashes, see its docstring): the JVM expression
    # chain's generated code executes cold exactly once per bench query and
    # was ~80% warm-up.  `_sh_hs` carries the hashed shingles so
    # add_minhash(hashes_col=...) skips the JVM md5 pass.
    from .functions.kernels import make_word_shingles_md5_udf

    docs = _spread(load_testdata(spark, sf_dir, "documents"))
    shg = make_word_shingles_md5_udf(DOC_CFG.shingle_k)
    return (
        docs.withColumn("norm", normalize_ws(F.col("text")))
        .withColumn("_shg", shg(F.col("norm")))
        .withColumn("shingles", F.col("_shg.sh"))
        .withColumn("_sh_hs", F.col("_shg.hs"))
        .drop("_shg")
    )


def _docs_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingles + MinHash signature for the LSH queries via the FUSED
    kernel (one Python evaluation node — see
    kernels.make_word_shingles_sig_udf), materialized EAGERLY: the
    downstream self-join + verify DAG launches its leaf stages
    concurrently, and each would otherwise first-touch the unmaterialized
    frame and recompute the whole chain."""
    from .functions.kernels import make_word_shingles_sig_udf

    docs = _spread(load_testdata(spark, sf_dir, "documents"))
    f = make_word_shingles_sig_udf(DOC_CFG)
    return (
        docs.withColumn("norm", normalize_ws(F.col("text")))
        .withColumn("_t", f(F.col("norm")))
        .withColumn("shingles", F.col("_t.sh"))
        .withColumn("minhash", F.col("_t.minhash"))
        .drop("_t")
        .localCheckpoint(eager=True)
    )


def doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _docs_sig(spark, sf_dir)
    cand = candidate_pairs(sig, "doc_id", "minhash", DOC_CFG)
    # verify against sig (it carries the shingles): one materialized table
    # serves the band self-join AND both verify sides
    ver = jaccard_verify(cand, sig, "doc_id", "shingles", DOC_CFG)
    return ver.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def doc_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _docs_sig(spark, sf_dir)
    cand = candidate_pairs(sig, "doc_id", "minhash", DOC_CFG)
    edges = jaccard_verify(cand, sig, "doc_id", "shingles", DOC_CFG)
    cc = connected_components(edges, "id_a", "id_b")
    return attach_clusters(sig.select("doc_id"), cc, "doc_id").select(
        "doc_id", "cluster_id"
    )


def link_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table linkage (the reference's csvlink source-vs-registry mode,
    data_matching.py:146-198): even doc_ids play the source table, odd
    doc_ids the registry; candidates from cross-table band collisions only
    (candidate_pairs_linkage), verified at the same Jaccard threshold."""
    from .operators.minhash_lsh import candidate_pairs_linkage

    sig = _docs_sig(spark, sf_dir)
    left = sig.filter(F.col("doc_id") % 2 == 0)
    right = sig.filter(F.col("doc_id") % 2 == 1)
    cand = candidate_pairs_linkage(left, right, "doc_id", "minhash", DOC_CFG)
    ver = jaccard_verify(cand, sig, "doc_id", "shingles", DOC_CFG)
    return ver.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _docs_shingled(spark, sf_dir)
    pairs = ngram_jaccard_pairs(sh, "doc_id", "shingles", DOC_CFG.jaccard_threshold)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    norm = docs.withColumn("norm", normalize_ws(F.col("text")))
    return norm.groupBy(F.md5("norm").alias("text_md5")).agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("rep_id")
    )


def doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_testdata(spark, sf_dir, "documents"))
    toks = docs.withColumn("tokens", F.split(normalize_ws(F.col("text")), " "))
    # persist: the chunk equi-join references the simhash column from both
    # sides — unpersisted, the token hashing + simhash kernel run twice
    sim = add_simhash(toks, "tokens", DOC_CFG,
                      use_kernel=True).localCheckpoint(eager=True)
    pairs = simhash_candidate_pairs(sim, "doc_id", "simhash", DOC_CFG)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    norm = docs.withColumn("norm", normalize_ws(F.col("text")))
    fps = add_fingerprints(norm, "norm", DOC_WINNOW_CFG, use_kernel=True)
    return fingerprint_candidate_pairs(fps, "doc_id", "fingerprints", DOC_WINNOW_CFG)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", hash60(normalize_ws(F.col("text"))).alias("doc_fp")
    )


def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return textstats.token_counts(docs, "text").select(
        "doc_id", "ws_tokens", "bpe_tokens"
    )


def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return textstats.language_id(docs, "text").select("doc_id", "lang_pred")


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return textstats.quality_features(docs, "text").select(
        "doc_id", "n_chars_calc", "n_tokens", "stop_ratio", "punct_ratio",
        "mean_tok_len", "quality_score",
    )


def cascade_band_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    band = (
        F.when(F.col("n_chars") <= 150, 0)
        .when(F.col("n_chars") <= 300, 1)
        .otherwise(2)
        .cast("long")
    )
    alpha = (
        F.length(F.regexp_replace(F.col("text"), "[^a-z ]", ""))
        / F.greatest(F.length("text"), F.lit(1))
    )
    feat = docs.select(
        "doc_id", band.alias("band"), alpha.alias("alpha_ratio")
    )
    thr = (
        F.when(F.col("band") == 0, 0.97)
        .when(F.col("band") == 1, 0.95)
        .otherwise(0.90)
    )
    return feat.filter(F.col("alpha_ratio") >= thr).select(
        "doc_id", "band", F.round("alpha_ratio", 6).alias("alpha_ratio")
    )


def _emb(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    # spread=False for the cheap brute-force queries: their scoring is
    # trivial at dim 64 and the broadcast crossJoin parallelizes off the
    # scan, so the spreading shuffle would be pure overhead there
    emb = load_testdata(spark, sf_dir, "embeddings")
    if spread:
        emb = _spread(emb)
    # float64 arithmetic so values match the oracle exactly
    return emb.withColumn("embedding", F.col("embedding").cast("array<double>"))


def emb_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir, spread=False)
    queries = emb.filter(F.col("vec_id") < EMB_QUERIES)
    out = brute_force_topk(emb, queries, "vec_id", "embedding", EMB_TOPK)
    return out.select("q_id", "n_id", "cosine", F.col("rank").cast("long").alias("rank"))


def emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    pairs = embedding_near_dup(emb, "vec_id", "embedding", EMB_NEAR_DUP_T)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: multi-table SRP-LSH top-k.  Approximate vs
    brute force by design, but DETERMINISTIC given the seed — the DuckDB
    oracle regenerates the same hyperplanes and computes identical buckets,
    candidates, and rankings (oracle.emb_ann_lsh_sql), so the driver gate
    checks it exactly.  Recall vs brute force is bounded separately in
    tests/test_similarity.py."""
    from .operators.similarity import srp_lsh_topk

    emb = _emb(spark, sf_dir)
    # use_kernel: one Arrow scan buckets all L tables (bit-identical to the
    # per-table expression scans — tests/test_kernels_parity.py — and ~3x
    # faster wall even at dim 64, measured both ways at sf0.1)
    out = srp_lsh_topk(
        emb, "vec_id", "embedding", dim=EMB_DIM, k=EMB_TOPK,
        n_planes=EMB_ANN_PLANES, n_tables=EMB_ANN_TABLES, seed=EMB_ANN_SEED,
        use_kernel=True,
        # scoring sides skip the _spread shuffle: broadcast-built here,
        # join-shuffled at scale — the balancing layout helps only the
        # per-row bucketing kernel scan
        scoring_corpus=_emb(spark, sf_dir, spread=False),
    )
    return out.select(
        "q_id", "n_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


def _trained_ivf_centroids_spark(spark: SparkSession, sf_dir: str):
    """Deterministic k-means centroids from the sf_dir data itself: sample =
    the EMB_IVF_TRAIN_SAMPLE smallest vec_ids in id order, trained by
    similarity.train_ivf_centroids (pure numpy, farthest-point init).  The
    oracle generator (_trained_ivf_centroids_gate) runs the SAME function on
    the SAME sample read straight from parquet, so both sides hold
    bit-identical centroids — the data-derived analogue of the SRP oracle's
    regenerated hyperplanes."""
    import numpy as np

    from .operators.similarity import train_ivf_centroids

    rows = (
        # spread=False: the training sample is a 512-row pushed-down scan
        # filter — the _spread repartition would shuffle the whole table
        # before dropping all but the sample
        _emb(spark, sf_dir, spread=False)
        .filter(F.col("vec_id") < EMB_IVF_TRAIN_SAMPLE)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    sample = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return train_ivf_centroids(sample, EMB_IVF_CELLS, EMB_IVF_TRAIN_ITERS)


def _trained_ivf_centroids_gate():
    """The oracle-side twin of _trained_ivf_centroids_spark, reading the
    correctness-gate scale factor's parquet directly (the driver runs the
    oracle SQL at sf0.01; float32→float64 widening is exact in both engines,
    so the sample — and therefore the trained centroids — are bit-identical
    to the Spark side's)."""
    import os

    import duckdb
    import numpy as np

    from .operators.similarity import train_ivf_centroids

    gate = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT embedding FROM '{gate}/embeddings.parquet' "
        f"WHERE vec_id < {EMB_IVF_TRAIN_SAMPLE} ORDER BY vec_id"
    ).fetchall()
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    return train_ivf_centroids(sample, EMB_IVF_CELLS, EMB_IVF_TRAIN_ITERS)


def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-probed ANN: IVF with a TRAINED deterministic coarse quantizer
    (seeded sampled spherical k-means — round-3 verdict replaced the
    id-prefix placeholder).  Approximate vs brute force by design but fully
    deterministic, so the DuckDB oracle (oracle.emb_ann_ivf_sql) retrains
    the identical centroids and reproduces cells, candidates, and rankings
    exactly.  Recall vs brute force — and the trained quantizer's recall
    gain over id-prefix — are measured in tests/test_similarity.py."""
    from .operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    # use_kernel: Arrow matmul assignment (bit-identical to the literal-
    # centroid expression folds — tests/test_kernels_parity.py — and ~1.5x
    # faster wall at sf0.1's dim-64 geometry, more at realistic dims)
    out = ivf_topk(
        emb, "vec_id", "embedding", dim=EMB_DIM, k=EMB_TOPK,
        n_cells=EMB_IVF_CELLS, n_probe=EMB_IVF_PROBE,
        centroids=_trained_ivf_centroids_spark(spark, sf_dir),
        use_kernel=True,
        # see emb_ann_lsh: the spread layout helps only the assignment
        # kernel scan; the scoring sides re-read the table unspread
        scoring_corpus=_emb(spark, sf_dir, spread=False),
    )
    return out.select(
        "q_id", "n_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


# --------------------------- TPC-H-ish operators ---------------------------

def match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_testdata(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.sum(F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)).alias("n_high_disc"),
    )


def cluster_sizes_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


def propagate_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.first("o_orderpriority").over(w).alias("best_priority"),
    )


def blacklist_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_testdata(spark, sf_dir, "customer")
    n = load_testdata(spark, sf_dir, "nation")
    r = load_testdata(spark, sf_dir, "region")
    blacklist = n.join(r, n.n_regionkey == r.r_regionkey).filter(
        F.col("r_regionkey") == 0
    ).select("n_nationkey")
    return c.join(
        F.broadcast(blacklist), c.c_nationkey == blacklist.n_nationkey, "left_anti"
    ).select("c_custkey", "c_name")


def addback_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_testdata(spark, sf_dir, "customer")
    o = load_testdata(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return a.unionByName(b).dropDuplicates()


def singleton_renumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_testdata(spark, sf_dir, "customer")
    w = Window.orderBy("c_name")
    return c.select(
        "c_custkey", F.dense_rank().over(w).cast("long").alias("new_cluster_id")
    )


def best_config_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_testdata(spark, sf_dir, "customer")
    stats = c.groupBy("c_mktsegment").agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )
    return stats.agg(
        F.max_by(F.col("c_mktsegment"), F.col("avg_bal")).alias("best_config")
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_testdata(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_testdata(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


LEVEN_THRESHOLD = 80
LEVEN_LEN_BUCKET = 4  # width of the length-bucket join key


def _blocked_name_pairs(c: DataFrame) -> DataFrame:
    """Same-nation candidate name pairs with a (nation, length-bucket)
    equi-join key — sub-quadratic pair enumeration for the Levenshtein
    scorers (id_a, id_b, n_a, n_b, len_a, len_b).

    Lossless: ratio >= T requires dist <= (1 - T/100) * max_len, and
    dist >= |len_a - len_b| always, so a qualifying partner's length lies
    in [T/100 * len_a, len_a / (T/100)].  The left side explodes to every
    length bucket that range covers (bounds widened by one to floor/ceil
    safely), the right side carries its single bucket, and the join runs
    on (nk, len_bucket) — pair ROWS now materialize per (nation, similar
    length) block instead of per nation.  The original length-band
    predicate is re-applied after the join, so the output is provably
    identical to the unblocked form (oracle unchanged)."""
    t = LEVEN_THRESHOLD / 100.0
    a = c.select(F.col("c_custkey").alias("id_a"), F.col("c_name").alias("n_a"),
                 F.col("c_nationkey").alias("nk"),
                 F.length("c_name").alias("len_a"))
    b = c.select(F.col("c_custkey").alias("id_b"), F.col("c_name").alias("n_b"),
                 F.col("c_nationkey").alias("nk"),
                 F.length("c_name").alias("len_b"))
    lo_bucket = F.floor(F.floor(F.col("len_a") * t) / LEVEN_LEN_BUCKET)
    hi_bucket = F.floor(F.ceil(F.col("len_a") / t) / LEVEN_LEN_BUCKET)
    a = a.withColumn("len_bucket", F.explode(F.sequence(lo_bucket, hi_bucket)))
    b = b.withColumn(
        "len_bucket", F.floor(F.col("len_b") / LEVEN_LEN_BUCKET).cast("long")
    )
    len_band = (
        F.abs(F.col("len_a") - F.col("len_b"))
        <= (1 - t) * F.greatest("len_a", "len_b")
    )
    return (
        a.join(b, ["nk", "len_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(len_band)
        .drop("len_bucket")
    )


def leven_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: Levenshtein-ratio scoring (short-string fallback metric) over
    length-blocked same-nation pairs (_blocked_name_pairs)."""
    from .functions.text import leven_ratio

    c = load_testdata(spark, sf_dir, "customer")
    pairs = _blocked_name_pairs(c)
    scored = pairs.select(
        "id_a", "id_b", leven_ratio(F.col("n_a"), F.col("n_b")).alias("leven_ratio")
    )
    return scored.filter(F.col("leven_ratio") >= LEVEN_THRESHOLD)


# ----------------- manual-review loop (O6 / F12 / F13 / F17) -----------------

REVIEW_SEED = 42
REVIEW_N = 100


def manual_review_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: seeded-shuffle review batch (match_filtering.py:205).  The
    shuffle key is content-derived (md5(id:seed)) so the sample is
    partition-independent and oracle-exact."""
    from .operators.manual_review import review_sample

    c = load_testdata(spark, sf_dir, "customer")
    return review_sample(
        c.select("c_custkey", "c_name"), "c_custkey", REVIEW_N, REVIEW_SEED
    ).select("c_custkey", "c_name", "shuffle_key")


def stamped_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: match_date stamping on the upload frame (data_matching.py:294).
    The oracle-facing column is day-granular (both engines evaluate their
    clock during the same run); the full ISO-timestamp stamp is
    operators.manual_review.stamp_match_date, pytest-covered."""
    c = load_testdata(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.date_format(F.current_date(), "yyyy-MM-dd").alias("match_date"),
        F.lit(" ").alias("match_by"),
    )


def upper_key_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: UPPER-key join back to a lookup whose keys differ in case
    (db_calls.py:110-122) — matches exist only because of UPPER()."""
    from .operators.manual_review import upper_key_join

    c = load_testdata(spark, sf_dir, "customer")
    lookup = c.select(
        F.lower(F.col("c_name")).alias("org_string"),
        F.col("c_custkey").alias("lookup_key"),
    )
    joined = upper_key_join(
        c.select("c_custkey", "c_name"), F.broadcast(lookup),
        "c_name", "org_string", "inner",
    )
    return joined.select("c_custkey", "lookup_key")


TRAIN_MATCH_RATIO = 90


def training_export_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: labelled-pair JSON training records (convert_training.py:33-57).
    Pairs come from the blocked Levenshtein scorer; label 'match' at
    ratio >= 90 else 'distinct'."""
    from .functions.text import leven_ratio
    from .operators.manual_review import training_export

    c = load_testdata(spark, sf_dir, "customer")
    pairs = (
        _blocked_name_pairs(c)
        .withColumn("leven_ratio", leven_ratio(F.col("n_a"), F.col("n_b")))
        .filter(F.col("leven_ratio") >= LEVEN_THRESHOLD)
    )
    labelled = pairs.withColumn(
        "label",
        F.when(F.col("leven_ratio") >= TRAIN_MATCH_RATIO, "match").otherwise("distinct"),
    )
    return training_export(labelled, "n_a", "n_b", "label").select(
        "id_a", "id_b", "training_json"
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", k.alias("k")).filter(F.col("k") > 50)


def build_queries() -> dict:
    return {
        "doc_minhash_pairs": doc_minhash_pairs,
        "link_pairs": link_pairs,
        "doc_near_dup_clusters": doc_near_dup_clusters,
        "doc_ngram_jaccard": doc_ngram_jaccard,
        "doc_exact_dedup": doc_exact_dedup,
        "doc_simhash_pairs": doc_simhash_pairs,
        "doc_winnow_pairs": doc_winnow_pairs,
        "doc_fingerprint": doc_fingerprint,
        "doc_token_counts": doc_token_counts,
        "doc_language_id": doc_language_id,
        "doc_quality": doc_quality,
        "cascade_band_filter": cascade_band_filter_docs,
        "emb_topk": emb_topk,
        "emb_near_dup": emb_near_dup,
        "emb_ann_lsh": emb_ann_lsh,
        "emb_ann_ivf": emb_ann_ivf,
        "match_stats": match_stats,
        "cluster_sizes_window": cluster_sizes_window,
        "distinct_on": distinct_on,
        "propagate_best": propagate_best,
        "blacklist_anti_join": blacklist_anti_join,
        "addback_right_outer": addback_right_outer,
        "union_dedup": union_dedup,
        "singleton_renumber": singleton_renumber,
        "best_config_argmax": best_config_argmax,
        "topk_orders": topk_orders,
        "leven_name_pairs": leven_name_pairs,
        "events_windowed_agg": events_windowed_agg,
        "events_json_extract": events_json_extract,
        "manual_review_sample": manual_review_sample,
        "stamped_matches": stamped_matches,
        "upper_key_matches": upper_key_matches,
        "training_export_pairs": training_export_pairs,
    }


def build_oracles() -> dict:
    from . import oracle as o

    return {
        "doc_minhash_pairs": o.doc_minhash_pairs_sql(DOC_CFG),
        "link_pairs": o.link_pairs_sql(DOC_CFG),
        "doc_near_dup_clusters": o.doc_near_dup_clusters_sql(DOC_CFG),
        "doc_ngram_jaccard": o.doc_ngram_jaccard_pairs_sql(DOC_CFG),
        "doc_exact_dedup": o.doc_exact_dedup_sql(),
        "doc_simhash_pairs": o.doc_simhash_pairs_sql(DOC_CFG),
        "doc_winnow_pairs": o.doc_winnow_pairs_sql(DOC_WINNOW_CFG),
        "doc_fingerprint": o.doc_fingerprint_sql(),
        "doc_token_counts": o.doc_token_counts_sql(),
        "doc_language_id": o.doc_language_id_sql(),
        "doc_quality": o.doc_quality_sql(),
        "cascade_band_filter": o.cascade_band_filter_sql(),
        "emb_topk": o.emb_topk_sql(EMB_TOPK, EMB_QUERIES, EMB_DIM),
        "emb_ann_lsh": o.emb_ann_lsh_sql(
            EMB_TOPK, EMB_DIM, EMB_ANN_PLANES, EMB_ANN_TABLES, EMB_ANN_SEED
        ),
        "emb_ann_ivf": o.emb_ann_ivf_sql(
            EMB_TOPK, EMB_DIM, EMB_IVF_PROBE, _trained_ivf_centroids_gate()
        ),
        "emb_near_dup": o.emb_near_dup_sql(EMB_NEAR_DUP_T, EMB_DIM),
        "match_stats": o.match_stats_sql(),
        "cluster_sizes_window": o.cluster_sizes_window_sql(),
        "distinct_on": o.distinct_on_sql(),
        "propagate_best": o.propagate_best_sql(),
        "blacklist_anti_join": o.blacklist_anti_join_sql(),
        "addback_right_outer": o.addback_right_outer_sql(),
        "union_dedup": o.union_dedup_sql(),
        "singleton_renumber": o.singleton_renumber_sql(),
        "best_config_argmax": o.best_config_argmax_sql(),
        "topk_orders": o.topk_orders_sql(),
        "leven_name_pairs": o.leven_name_pairs_sql(LEVEN_THRESHOLD),
        "events_windowed_agg": o.events_windowed_agg_sql(),
        "events_json_extract": o.events_json_extract_sql(),
        "manual_review_sample": o.manual_review_sample_sql(REVIEW_N, REVIEW_SEED),
        "stamped_matches": o.stamped_matches_sql(),
        "upper_key_matches": o.upper_key_matches_sql(),
        "training_export_pairs": o.training_export_pairs_sql(
            LEVEN_THRESHOLD, TRAIN_MATCH_RATIO
        ),
    }
