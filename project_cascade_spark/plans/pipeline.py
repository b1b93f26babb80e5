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
    # With a store, stages are durable parquet (resume semantics); without,
    # stages are eagerly localCheckpoint'ed — each stage computes exactly
    # once and downstream lineage starts from materialized partitions
    # (otherwise the multi-consumer DAG recomputes the UDF stages per use).
    if store:
        run = lambda stage, fn: store.run(stage, fn)  # noqa: E731
    else:
        run = lambda stage, fn: fn().localCheckpoint(eager=True)  # noqa: E731

    files = run(
        "00_input",
        lambda: add_content_hash(code_files, "content"),
    )

    reps, mapping = exact_dedup(files, "file_id", "content_sha")
    reps = run("01_reps", lambda: reps)
    mapping = run("01_mapping", lambda: mapping)

    def _prepared() -> DataFrame:
        norm = reps.withColumn("norm", normalize_code(F.col("content")))
        sh = norm.withColumn(
            "shingles", char_shingles(F.col("norm"), cfg.char_shingle_k)
        ).withColumn("tokens", F.split(F.col("norm"), " "))
        sh = sh.withColumn("n_tokens", F.size("tokens"))
        return sh.select(
            "file_id", "norm", "shingles", "tokens", "n_tokens"
        )

    prepared = run("02_prepared", _prepared)

    def _lsh_pairs() -> DataFrame:
        with_sig = add_minhash(prepared, "shingles", cfg, use_kernel=use_kernel)
        return candidate_pairs(with_sig, "file_id", "minhash", cfg, cap_buckets=True)

    lsh_pairs = run("03_lsh_pairs", _lsh_pairs)

    def _short_pairs() -> DataFrame:
        short = prepared.filter(F.col("n_tokens") <= cfg.short_doc_max_tokens)
        with_sim = add_simhash(short, "tokens", cfg, use_kernel=use_kernel)
        return simhash_candidate_pairs(with_sim, "file_id", "simhash", cfg).select(
            "id_a", "id_b"
        )

    short_pairs = run("04_short_pairs", _short_pairs)

    def _edges() -> DataFrame:
        lsh_verified = jaccard_verify(lsh_pairs, prepared, "file_id", "shingles", cfg)
        lsh_verified = lsh_verified.withColumn("method", F.lit("minhash_lsh"))
        short_cfg = CascadeConfig(
            jaccard_threshold=SHORT_JACCARD,
            num_perm=cfg.num_perm, lsh_bands=cfg.lsh_bands, lsh_rows=cfg.lsh_rows,
        )
        short_verified = jaccard_verify(
            short_pairs, prepared, "file_id", "shingles", short_cfg
        ).withColumn("method", F.lit("simhash"))
        return (
            lsh_verified.unionByName(short_verified)
            .groupBy("id_a", "id_b")
            .agg(F.max("jaccard").alias("jaccard"), F.min("method").alias("method"))
        )

    edges = run("05_edges", _edges)

    def _clusters() -> DataFrame:
        return connected_components(edges, "id_a", "id_b")

    rep_clusters = run("06_clusters", _clusters)

    def _assign() -> DataFrame:
        # rep cluster → every member of the exact-dup group; files whose rep
        # is unclustered fall back to rep_id (exact-dup groups still merge),
        # then to own file_id.  Content column rides along untouched —
        # the sha256 invariant is testable on the output.
        m = mapping.join(
            rep_clusters.withColumnRenamed("id", "rep_id"), "rep_id", "left"
        ).select(
            F.col("id").alias("file_id"),
            F.coalesce(F.col("cluster_id"), F.col("rep_id")).alias("cluster_id"),
        )
        return files.join(m, "file_id", "left").withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("file_id"))
        )

    assignments = run("07_assignments", _assign)

    substring_pairs = None
    if with_substring_pass:

        def _substr() -> DataFrame:
            fps = add_fingerprints(prepared, "norm", cfg)
            cand = fingerprint_candidate_pairs(
                fps, "file_id", "fingerprints", cfg, template_filter=True
            )
            # long-substring pairs that are ALSO near-dups are already edges;
            # the side output reports the rest (shared-block detection).
            fresh = cand.join(edges.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
            return verify_long_substring(fresh, prepared, "file_id", "norm", cfg)

        substring_pairs = run("08_substring_pairs", _substr)

    return PipelineResult(assignments, edges, substring_pairs)
