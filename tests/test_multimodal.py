"""Multimodal plumbing: schema, batch shapes, determinism, stub gating."""

import pytest

from project_cascade_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    media_exact_dedup,
    synth_media,
)


def test_feature_extraction_deterministic(spark):
    m = synth_media(spark, 30)
    a = extract_features(m).toPandas().sort_values("media_id").reset_index(drop=True)
    b = extract_features(m).toPandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 30
    assert set(a.columns) == {"media_id", "kind", "n_bytes", "mean_val", "std_val", "fp60"}
    assert (a["fp60"] >= 0).all()


def test_real_decoder_is_gated(spark):
    m = synth_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|decoders"):
        extract_features(m, use_real_decoder=True).collect()


def test_frame_sampling_shape(spark):
    m = synth_media(spark, 12)  # every 3rd item is video
    frames = frame_sample(m, every_n=4).toPandas()
    assert set(frames.columns) == {"media_id", "frame_idx", "frame_payload"}
    assert (frames["frame_idx"] % 4 == 0).all()
    assert frames["media_id"].nunique() == 4  # 12 items / 3 kinds


def test_media_exact_dedup_counts(spark):
    m = synth_media(spark, 10)
    dup = m.union(m.limit(4))  # 4 exact dup payloads
    out = media_exact_dedup(dup).toPandas()
    assert out["n_dups"].sum() == 14
    assert (out["n_dups"] > 1).sum() == 4
