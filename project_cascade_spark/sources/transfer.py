"""S8: archive bundling + object-store transfer of stage outputs.

Reference analogue: AwsTransfers — upload unverified matches, download
verified files, zip the run's outputs into an archive bucket
(/root/reference/Regions/UK_entities/Regional_Run_Files/AWS_calls.py:27-76
upload/transfer, 78-172 download/process, 174-196 zip+archive).

Spark-side split of responsibilities:
- TABLE data needs no custom S3 code at all: every reader/writer in this
  repo takes an `s3a://` URI directly (Hadoop S3A committer) — that is the
  scale path for 100 TB and the reason this module stays small.
- What the reference additionally does — bundle a finished stage directory
  into ONE zip and park it in an archive location, later fetch + unpack —
  is a driver-side utility over the checkpoint directories, not a
  distributed op.  That round trip is implemented here: local and file://
  destinations run everywhere (tests exercise them end to end); s3://
  destinations go through boto3, gated behind an import-try because the
  sandbox bundles no AWS SDK (and no credentials), mirroring the jar-gated
  Iceberg branch in sinks.py.
"""

from __future__ import annotations

import os
import shutil
import zipfile
from urllib.parse import urlparse


def _boto3():
    try:
        import boto3  # type: ignore

        return boto3
    except ImportError as exc:  # pragma: no cover - sandbox has no boto3
        raise RuntimeError(
            "s3:// transfer requested but boto3 is not installed; "
            "table-level reads/writes should use s3a:// URIs instead"
        ) from exc


def zip_stage(stage_dir: str, out_dir: str | None = None) -> str:
    """Bundle one stage's output directory into <stage>.zip (the
    reference's all_files_zipped move, AWS_calls.py:174-196).  Skips Spark
    temp/CRC droppings; keeps _SUCCESS and the resume token so an
    unpacked archive is a valid resume target."""
    stage_dir = stage_dir.rstrip("/")
    out = os.path.join(out_dir or os.path.dirname(stage_dir),
                       os.path.basename(stage_dir) + ".zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, names in sorted(os.walk(stage_dir)):
            for name in sorted(names):
                if name.endswith(".crc") or name.startswith("."):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, stage_dir))
    return out


def push(local_path: str, dest_uri: str) -> str:
    """Copy an archive to its destination.  file:// and bare paths are
    handled with the filesystem (exercised in tests); s3:// uses boto3
    when available."""
    u = urlparse(dest_uri)
    if u.scheme in ("", "file"):
        dest = os.path.join(u.path, os.path.basename(local_path))
        os.makedirs(u.path, exist_ok=True)
        shutil.copyfile(local_path, dest)
        return dest
    if u.scheme == "s3":
        key = u.path.lstrip("/") + "/" + os.path.basename(local_path)
        _boto3().client("s3").upload_file(local_path, u.netloc, key)
        return f"s3://{u.netloc}/{key}"
    raise ValueError(f"unsupported destination scheme: {u.scheme}")


def fetch(uri: str, workdir: str) -> str:
    """Fetch an archive and unpack it; returns the extracted directory —
    readable by spark.read.parquet and valid for StageStore resume
    (reference download-verified flow, AWS_calls.py:78-124)."""
    u = urlparse(uri)
    os.makedirs(workdir, exist_ok=True)
    local = os.path.join(workdir, os.path.basename(u.path))
    if u.scheme in ("", "file"):
        shutil.copyfile(u.path, local)
    elif u.scheme == "s3":
        _boto3().client("s3").download_file(u.netloc, u.path.lstrip("/"), local)
    else:
        raise ValueError(f"unsupported source scheme: {u.scheme}")
    out_dir = os.path.join(workdir, os.path.basename(local).removesuffix(".zip"))
    with zipfile.ZipFile(local) as zf:
        zf.extractall(out_dir)
    return out_dir
