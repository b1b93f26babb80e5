"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, mapInPandas batch shape,
UDF signatures — is real and tested; the codec work itself is STUBBED
(this container ships no image/audio libraries): `_decode_real` raises
NotImplementedError, and the default path is `_decode_fake`, a clearly
labeled deterministic stand-in (byte-level statistics + a 60-bit
perceptual-hash-shaped fingerprint) so downstream dedup/join logic is
exercised end-to-end.  Swapping in PIL/ffmpeg happens inside one function
per modality without touching any plan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), True),      # opaque encoded bytes
    StructField("meta", StructType([
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]), True),
])


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque payloads (md5-chained bytes) + plausible meta."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = b"".join(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).digest() for j in range(32)
        )
        meta = {
            "width": 64 + (i % 8) * 32 if kind != "audio" else None,
            "height": 64 + (i % 5) * 32 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 37 if kind != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, bytearray(blob), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_real(payload: bytes, codec: str) -> np.ndarray:
    raise NotImplementedError(
        "real decoders (PIL/soundfile/ffmpeg) are not available in this "
        "container; wire them here — the Spark plan is decoder-agnostic"
    )


def _decode_fake(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode: bytes → pseudo-sample array."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Per-item features via mapInPandas: mean/std of decoded samples plus a
    60-bit fingerprint over 60 equal payload segments (the perceptual-hash
    shape: bit j = segment j above the global mean).  Identical payloads ⇒
    identical fingerprints, so this column feeds the same dedup machinery
    as text (exact groupBy, Hamming-ball joins)."""

    def batches(it):
        for pdf in it:
            out = {"media_id": [], "kind": [], "n_bytes": [],
                   "mean_val": [], "std_val": [], "fp60": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    continue
                x = (_decode_real(bytes(payload), "?") if use_real_decoder
                     else _decode_fake(bytes(payload)))
                segs = np.array_split(x, 60)
                means = np.array([s.mean() if len(s) else 0.0 for s in segs])
                bits = (means > x.mean()).astype(np.int64)
                fp = int((bits << np.arange(60, dtype=np.int64)).sum())
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(x))
                out["mean_val"].append(round(float(x.mean()), 6))
                out["std_val"].append(round(float(x.std()), 6))
                out["fp60"].append(fp)
            yield pd.DataFrame(out)

    schema = ("media_id long, kind string, n_bytes long, "
              "mean_val double, std_val double, fp60 long")
    par = media.sparkSession.sparkContext.defaultParallelism
    return media.repartition(max(par, 8)).mapInPandas(batches, schema)


def frame_sample(video: DataFrame, every_n: int = 4) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, frame_payload).

    Real path would demux with ffmpeg; the stub slices the payload into
    fixed 'frames' — the explode shape, schema, and partitioning are what
    downstream (per-frame features → frame-level dedup) consumes."""

    def batches(it):
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                frame_size = max(len(b) // 16, 1)
                for k, start in enumerate(range(0, len(b), frame_size)):
                    if k % every_n:
                        continue
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["frame_payload"].append(bytearray(b[start:start + frame_size]))
            yield pd.DataFrame(rows)

    return video.filter(F.col("kind") == "video").mapInPandas(
        batches, "media_id long, frame_idx long, frame_payload binary"
    )


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Payload-level exact dedup — same sha2 groupBy as the text pipeline."""
    return (
        media.withColumn("payload_sha", F.sha2("payload", 256))
        .groupBy("payload_sha")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("media_id").alias("rep_id"))
    )
