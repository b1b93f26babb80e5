"""Incremental batch append (plans/append.py): assignments after folding a
batch into a base run must EQUAL a from-scratch run over base ∪ batch —
label-exact, not just partition-equal — and re-appending is a no-op."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

from project_cascade_spark.config import CODE_CONFIG
from project_cascade_spark.datagen import generate_code_files
from project_cascade_spark.plans.append import append_batch, current_epoch
from project_cascade_spark.plans.pipeline import dedup_pipeline
from project_cascade_spark.sources.sinks import StageStore
from project_cascade_spark.sources.tables import load_code_files

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _split(pdf):
    """Interleaved split so planted dup groups straddle the boundary —
    batch files must JOIN existing clusters, BRIDGE old clusters, and form
    new ones, not just append singletons."""
    idx = np.arange(len(pdf))
    return pdf[idx % 3 != 0].reset_index(drop=True), pdf[idx % 3 == 0].reset_index(drop=True)


def _assign_pdf(df):
    return (
        df.select("file_id", "cluster_id").toPandas()
        .sort_values("file_id").reset_index(drop=True)
    )


def test_append_matches_full_run(spark, tmp_path):
    pdf, _truth = generate_code_files(320)
    a, b = _split(pdf)
    wd = str(tmp_path / "wd")

    full = _assign_pdf(
        dedup_pipeline(
            load_code_files(spark, pdf), CODE_CONFIG, with_substring_pass=False
        ).assignments
    )

    store = StageStore(spark, wd, fingerprint="base-a")
    dedup_pipeline(
        load_code_files(spark, a), CODE_CONFIG, store=store,
        with_substring_pass=False,
    ).assignments.count()

    res = append_batch(load_code_files(spark, b), CODE_CONFIG, wd)
    assert res.epoch == 1 and current_epoch(wd) == 1
    assert res.n_new == len(b) and res.n_skipped == 0
    inc = _assign_pdf(res.assignments)

    # label-exact equality with the from-scratch run over the union
    assert len(inc) == len(full) == len(pdf)
    assert (inc["file_id"].values == full["file_id"].values).all()
    assert (inc["cluster_id"].values == full["cluster_id"].values).all()

    # the batch actually interacted with the base: some new edges touch
    # an old rep (joined/bridged clusters), not only new×new
    old_ids = set(
        r["file_id"] for r in
        load_code_files(spark, a).select("file_id").collect()
    )
    ne = res.new_edges.select("id_a", "id_b").collect()
    assert len(ne) > 0
    assert any(r["id_a"] in old_ids or r["id_b"] in old_ids for r in ne)


def test_append_idempotent_and_resumable(spark, tmp_path):
    pdf, _ = generate_code_files(150)
    a, b = _split(pdf)
    wd = str(tmp_path / "wd")
    store = StageStore(spark, wd, fingerprint="base-a")
    dedup_pipeline(
        load_code_files(spark, a), CODE_CONFIG, store=store,
        with_substring_pass=False,
    ).assignments.count()

    r1 = append_batch(load_code_files(spark, b), CODE_CONFIG, wd)
    # re-appending the same batch: no new files, epoch unchanged, and the
    # assignments served are the promoted epoch's
    r2 = append_batch(load_code_files(spark, b), CODE_CONFIG, wd)
    assert r2.n_new == 0 and r2.n_skipped == len(b)
    assert r2.epoch == r1.epoch == current_epoch(wd)
    assert _assign_pdf(r2.assignments).equals(_assign_pdf(r1.assignments))


def test_append_job_cli(tmp_path):
    """The spark-submit surface: base run, then --append with a second
    batch over the same workdir."""
    pdf, _ = generate_code_files(180)
    a, b = _split(pdf)
    a_path, b_path = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.to_parquet(a_path), b.to_parquet(b_path)
    wd = str(tmp_path / "wd")

    def run(*extra):
        out = subprocess.run(
            [sys.executable, "-m", "project_cascade_spark.jobs.dedup_job",
             "--master", "local[4]", "--workdir", wd, "--report",
             "--no-substring-pass", *extra],
            capture_output=True, text=True, check=True, cwd=REPO, timeout=600,
        )
        return json.loads(
            [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        )

    base = run("--input", a_path)
    assert base["files"] == len(a)
    inc = run("--input", b_path, "--append")
    assert inc["files"] == len(pdf)
    assert inc["new_files"] == len(b) and inc["skipped_existing"] == 0
    assert inc["epoch"] == 1

    # compaction surface: no --input, source untouched, dst at epoch 0
    rep = run("--compact-to", str(tmp_path / "wd2"))
    assert rep["epochs_compacted"] == 1 and rep["files"] == len(pdf)
    from project_cascade_spark.plans.append import current_epoch as ce

    assert ce(str(tmp_path / "wd2")) == 0 and ce(wd) == 1


def test_compact_then_append_matches_full_run(spark, tmp_path):
    """Chain base → append → COMPACT → append; the final assignments must
    still equal a from-scratch run over all three slices, and the
    compacted dir must serve appends exactly like the delta-chained one."""
    from project_cascade_spark.plans.append import compact

    pdf, _ = generate_code_files(300)
    idx = np.arange(len(pdf))
    a = pdf[idx % 3 == 0].reset_index(drop=True)
    b = pdf[idx % 3 == 1].reset_index(drop=True)
    c = pdf[idx % 3 == 2].reset_index(drop=True)
    wd, wd2 = str(tmp_path / "wd"), str(tmp_path / "wd_compacted")

    full = _assign_pdf(
        dedup_pipeline(
            load_code_files(spark, pdf), CODE_CONFIG, with_substring_pass=False
        ).assignments
    )

    store = StageStore(spark, wd, fingerprint="base-a")
    dedup_pipeline(
        load_code_files(spark, a), CODE_CONFIG, store=store,
        with_substring_pass=False,
    ).assignments.count()
    append_batch(load_code_files(spark, b), CODE_CONFIG, wd)

    rep = compact(spark, wd, wd2)
    assert rep["epochs_compacted"] == 1
    assert rep["files"] == len(a) + len(b)
    assert current_epoch(wd2) == 0

    res = append_batch(load_code_files(spark, c), CODE_CONFIG, wd2)
    assert res.epoch == 1
    inc = _assign_pdf(res.assignments)
    assert len(inc) == len(full) == len(pdf)
    assert (inc["file_id"].values == full["file_id"].values).all()
    assert (inc["cluster_id"].values == full["cluster_id"].values).all()


def test_append_substring_pass_matches_full_run(spark, tmp_path):
    """When the base run maintains the long-substring side pass, an append
    maintains it too, and the merged side output equals the from-scratch
    pass over the union."""
    pdf, _ = generate_code_files(240)
    a, b = _split(pdf)
    wd = str(tmp_path / "wd")

    def _sub_pdf(df):
        return (
            df.select("id_a", "id_b", "lcs_len").toPandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )

    full_res = dedup_pipeline(
        load_code_files(spark, pdf), CODE_CONFIG, with_substring_pass=True
    )
    full_sub = _sub_pdf(full_res.substring_pairs)

    store = StageStore(spark, wd, fingerprint="base-a")
    dedup_pipeline(
        load_code_files(spark, a), CODE_CONFIG, store=store,
        with_substring_pass=True,
    ).assignments.count()

    res = append_batch(load_code_files(spark, b), CODE_CONFIG, wd)
    assert res.substring_pairs is not None
    inc_sub = _sub_pdf(res.substring_pairs)

    assert len(full_sub) > 0  # datagen plants shared-block groups
    assert inc_sub.equals(full_sub)

    # assignments stay label-exact with the pass enabled too
    assert _assign_pdf(res.assignments).equals(_assign_pdf(full_res.assignments))
