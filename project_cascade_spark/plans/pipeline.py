"""End-to-end dedup pipeline: clean → block → verify → cluster → assign.

The Spark re-expression of the reference's run_main flow
(/root/reference/runfile.py:171-254 → SURVEY §3.1/§3.2), over
code_files(repo, path, commit, lang, content):

  1. identity+invariant   file_id = xxhash64(keys); content_sha = sha2(content)
  2. exact dedup          sha groupBy → representatives + mapping
                          (skew guard AND the dominant real-corpus saving)
  3. normalize+shingle    comment/whitespace-insensitive char shingles
  4. MinHash/LSH          candidate pairs on representatives
  5. SimHash              Hamming-ball candidates for short files
  6. verify               Jaccard >= τ (LSH), Hamming + relaxed Jaccard (short)
  7. connected components large-star/small-star to fixpoint
  8. assign               map reps→clusters→all files; singletons own id
  9. (side output)        long-common-substring pairs via winnowing +
                          per-pair suffix array — NOT merged into clusters

Every stage can be checkpointed through a StageStore (resume semantics);
pass store=None for a single fused run (small scale / benchmarks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CascadeConfig
from ..functions.text import char_shingles, normalize_code
from ..operators.connected_components import connected_components
from ..operators.dedup import add_content_hash, exact_dedup
from ..operators.minhash_lsh import add_minhash, candidate_pairs
from ..operators.simhash import add_simhash, simhash_candidate_pairs
from ..operators.suffix import (
    add_fingerprints,
    fingerprint_candidate_pairs,
    verify_long_substring,
)
from ..operators.verify import jaccard_verify
from ..sources.sinks import StageStore

SHORT_JACCARD = 0.5  # relaxed verify for SimHash path (hamming is primary)


@dataclass
class PipelineResult:
    assignments: DataFrame        # file_id, repo, path, commit, lang, content,
                                  # content_sha, cluster_id
    edges: DataFrame              # verified rep-level edges (id_a, id_b, jaccard, method)
    substring_pairs: DataFrame | None  # long-common-substring side output


def dedup_pipeline(
    code_files: DataFrame,
    cfg: CascadeConfig,
    store: StageStore | None = None,
    with_substring_pass: bool = True,
    use_kernel: bool = True,
) -> PipelineResult:
    # With a store, every stage is durable parquet (resume semantics).
    # Without one, only MULTI-CONSUMER stages are localCheckpoint'ed (so the
    # UDF stages compute exactly once); single-consumer stages stay lazy and
    # fuse into their consumer — fewer actions, less fixed overhead.
    if store:
        def run(stage, fn, persist=True):  # noqa: ARG001
            return store.run(stage, fn)
    else:
        def run(stage, fn, persist=True):
            return fn().localCheckpoint(eager=True) if persist else fn()

    # spread the input across cores before any per-row work: a single
    # parquet file (or a pandas-sourced frame) arrives as 1 partition and
    # would serialize sha256 + normalization
    par = code_files.sparkSession.sparkContext.defaultParallelism
    files = run(
        "00_input",
        lambda: add_content_hash(
            code_files.repartition(max(par, 8)), "content"
        ),
    )

    # level-1 exact dedup: byte-identical content (sha256)
    reps, mapping = exact_dedup(files, "file_id", "content_sha")
    reps = run("01_reps", lambda: reps, persist=False)
    mapping = run("01_mapping", lambda: mapping, persist=False)

    # level-2 exact dedup: identical AFTER normalization (the reference's
    # clean-then-drop_duplicates move, data_matching.py:197) — whitespace/
    # comment variants collapse here and never reach LSH
    def _normed() -> DataFrame:
        return reps.withColumn("norm", normalize_code(F.col("content"))).select(
            "file_id", "norm"
        )

    # persisted: three consumers (norm_reps_df, norm_mapping, prepared) —
    # lazy would run the normalization regexes three times
    normed = run("01b_normed", _normed)
    norm_reps_df = run(
        "01c_norm_reps",
        lambda: normed.groupBy(F.md5("norm").alias("_nmd5")).agg(
            F.min("file_id").alias("nrep_id")
        ),
    )
    norm_mapping = run(
        "01c_norm_mapping",
        lambda: normed.select("file_id", F.md5("norm").alias("_nmd5"))
        .join(norm_reps_df, "_nmd5")
        .select(F.col("file_id").alias("rep_id"), "nrep_id"),
        persist=False,
    )

    def _prepared() -> DataFrame:
        base = normed.join(
            norm_reps_df.withColumnRenamed("nrep_id", "file_id").select("file_id"),
            "file_id",
        )
        # Explicit repartition: AQE coalesces this small-byte table to 1-2
        # partitions, which would serialize every downstream per-row stage
        # (shingle hashing, minhash kernel, winnowing) onto 1-2 cores —
        # measured as 3 × ~50s stages at 8k files.  Heavy per-row work needs
        # partitions ∝ cores regardless of byte size.
        base = base.repartition(max(par, 8), "file_id")
        # verify runs on HASHED shingles (array<long>) — 8B per element in
        # the pair join instead of 9-char strings; set semantics preserved
        # via array_distinct (31-bit hash collisions shift Jaccard by <1e-3).
        # xxhash64 per shingle (the md5 primitive costs ~7µs/call and is
        # only needed where DuckDB parity matters).
        sh = base.withColumn(
            "shingles", char_shingles(F.col("norm"), cfg.char_shingle_k)
        )
        from ..functions.hashing import fast_shingle_hashes  # local to avoid cycle

        sh = sh.withColumn(
            "sh_hashes", F.array_distinct(fast_shingle_hashes(F.col("shingles")))
        )
        sh = sh.withColumn("n_tokens", F.size(F.split(F.col("norm"), " "))).withColumn(
            "n_shingles", F.size("sh_hashes")
        )
        return sh.select("file_id", "norm", "sh_hashes", "n_tokens", "n_shingles")

    prepared = run("02_prepared", _prepared)

    def _signatures() -> DataFrame:
        # persisted: candidate_pairs self-joins the band table, so an
        # unpersisted signature column would run the minhash kernel TWICE
        # (once per join side) — measured as the dominant stage at 30k files
        if use_kernel:
            from ..functions.kernels import apply_minhash

            sig = apply_minhash(F.col("sh_hashes"), cfg)
        else:
            from ..functions.hashing import minhash_expr

            sig = minhash_expr(F.col("sh_hashes"), cfg)
        return prepared.withColumn("minhash", sig).select(
            "file_id", "n_shingles", "minhash"
        )

    signatures = run("03a_signatures", _signatures)

    lsh_pairs = run(
        "03_lsh_pairs",
        lambda: candidate_pairs(
            signatures, "file_id", "minhash", cfg, cap_buckets=True,
            size_col="n_shingles",
        ),
        persist=False,
    )

    def _short_sim() -> DataFrame:
        short = prepared.filter(F.col("n_tokens") <= cfg.short_doc_max_tokens)
        short = short.withColumn("tokens", F.split(F.col("norm"), " "))
        return add_simhash(short, "tokens", cfg, use_kernel=use_kernel).select(
            "file_id", "simhash"
        )

    short_sim = run("04a_simhash", _short_sim)

    short_pairs = run(
        "04_short_pairs",
        lambda: simhash_candidate_pairs(short_sim, "file_id", "simhash", cfg).select(
            "id_a", "id_b"
        ),
        persist=False,
    )

    def _edges() -> DataFrame:
        lsh_verified = jaccard_verify(lsh_pairs, prepared, "file_id", "sh_hashes", cfg)
        lsh_verified = lsh_verified.withColumn("method", F.lit("minhash_lsh"))
        short_cfg = CascadeConfig(jaccard_threshold=SHORT_JACCARD)
        short_verified = jaccard_verify(
            short_pairs, prepared, "file_id", "sh_hashes", short_cfg
        ).withColumn("method", F.lit("simhash"))
        return (
            lsh_verified.unionByName(short_verified)
            .groupBy("id_a", "id_b")
            .agg(F.max("jaccard").alias("jaccard"), F.min("method").alias("method"))
        )

    edges = run("05_edges", _edges)

    def _clusters() -> DataFrame:
        return connected_components(edges, "id_a", "id_b")

    rep_clusters = run("06_clusters", _clusters, persist=False)

    def _assign() -> DataFrame:
        # cluster(file) resolves through both dedup levels:
        # file → sha-rep (mapping) → norm-rep (norm_mapping) → cluster.
        # Fallbacks: norm-rep id (normalization-identical groups still
        # merge), then sha-rep id, then own file_id.  Content rides along
        # untouched — the sha256 invariant is testable on the output.
        nm = norm_mapping.join(
            rep_clusters.withColumnRenamed("id", "nrep_id"), "nrep_id", "left"
        ).select(
            "rep_id",
            F.coalesce(F.col("cluster_id"), F.col("nrep_id")).alias("cluster_id"),
        )
        m = mapping.join(nm, "rep_id", "left").select(
            F.col("id").alias("file_id"),
            F.coalesce(F.col("cluster_id"), F.col("rep_id")).alias("cluster_id"),
        )
        return files.join(m, "file_id", "left").withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("file_id"))
        )

    assignments = run("07_assignments", _assign, persist=False)

    substring_pairs = None
    if with_substring_pass:

        # persisted for the same self-join reason as the signatures
        fps = run(
            "08a_fingerprints",
            lambda: add_fingerprints(
                prepared.select("file_id", "norm"), "norm", cfg, fast_hash=True
            ).select("file_id", "fingerprints"),
        )

        def _substr() -> DataFrame:
            cand = fingerprint_candidate_pairs(
                fps, "file_id", "fingerprints", cfg, template_filter=True
            )
            # long-substring pairs that are ALSO near-dups are already edges;
            # the side output reports the rest (shared-block detection).
            fresh = cand.join(edges.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
            return verify_long_substring(fresh, prepared, "file_id", "norm", cfg)

        substring_pairs = run("08_substring_pairs", _substr, persist=False)

    return PipelineResult(assignments, edges, substring_pairs)
