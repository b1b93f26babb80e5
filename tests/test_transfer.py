"""S8 archive round trip (reference AWS_calls.py zip/upload/download):
stage dir -> zip -> push(file://) -> fetch -> unpack -> Spark reads it back
byte-equal, and the unpacked dir still resumes in a StageStore."""

from __future__ import annotations

import os

import pytest

from project_cascade_spark.sources.sinks import StageStore
from project_cascade_spark.sources.transfer import fetch, push, zip_stage


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("xfer_run")
    store = StageStore(spark, str(root), fingerprint="xfer")
    df = spark.range(500).selectExpr("id", "id * 2 AS doubled")
    store.run("05_edges", lambda: df)
    return root


def test_zip_push_fetch_round_trip(spark, staged, tmp_path):
    zp = zip_stage(str(staged / "05_edges"))
    archive = tmp_path / "archive"
    dest = push(zp, f"file://{archive}")
    assert os.path.exists(dest)
    out_dir = fetch(dest, str(tmp_path / "dl"))
    got = spark.read.parquet(out_dir)
    assert got.count() == 500
    assert sorted(got.columns) == ["doubled", "id"]
    # resume token survived the round trip — an unpacked archive is a
    # valid resume target
    assert os.path.exists(os.path.join(out_dir, "_cascade_token"))
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))


def test_s3_round_trip_mocked(spark, staged, tmp_path, monkeypatch):
    """The s3:// branch through real boto3 against a moto mock — the same
    upload_file/download_file calls a credentialed cluster run makes."""
    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")
    for k in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"):
        monkeypatch.setenv(k, "testing")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    with moto.mock_aws():
        boto3.client("s3").create_bucket(Bucket="cascade-archive")
        zp = zip_stage(str(staged / "05_edges"), str(tmp_path))
        uri = push(zp, "s3://cascade-archive/runs/r3")
        assert uri == "s3://cascade-archive/runs/r3/05_edges.zip"
        out_dir = fetch(uri, str(tmp_path / "dl_s3"))
        got = spark.read.parquet(out_dir)
        assert got.count() == 500


def test_unknown_scheme_rejected(tmp_path, staged):
    zp = zip_stage(str(staged / "05_edges"), str(tmp_path))
    with pytest.raises(ValueError, match="scheme"):
        push(zp, "ftp://host/x")
