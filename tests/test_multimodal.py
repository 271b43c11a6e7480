"""Multimodal plumbing: binary media columns through actor-pool decode /
resize / frame-sample stages (decode stubbed — deterministic digest
pixels; the Ray-side schema/batching/actor shape is what's under test)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.multimodal import (
    DecodeFeatureStage,
    FrameSampleStage,
    ResizeStage,
    decode_features,
    synth_media_table,
)


def test_decode_features_deterministic_and_shaped():
    media = rd.from_arrow(synth_media_table(24))
    out1 = decode_features(media, feature_dim=16, concurrency=2).take_all()
    out2 = decode_features(media, feature_dim=16, concurrency=4).take_all()
    assert len(out1) == 24
    by_id1 = {r["media_id"]: r for r in out1}
    by_id2 = {r["media_id"]: r for r in out2}
    for i in by_id1:
        assert len(by_id1[i]["feature"]) == 16
        assert by_id1[i]["feature"] == by_id2[i]["feature"]  # actor count moot
        assert 0.0 <= by_id1[i]["mean"] <= 1.0
    # distinct payloads → distinct features
    assert by_id1[0]["feature"] != by_id1[1]["feature"]


def test_real_decoder_is_an_explicit_stub():
    stage = DecodeFeatureStage(decoder="real")
    with pytest.raises(NotImplementedError):
        stage(synth_media_table(1))


def test_resize_stage():
    media = rd.from_arrow(synth_media_table(6))
    out = media.map_batches(
        ResizeStage, fn_constructor_kwargs={"out_w": 4, "out_h": 3},
        batch_format="pyarrow", batch_size=4, concurrency=(1, 2),
    ).take_all()
    assert len(out) == 6
    assert all(len(r["thumb"]) == 12 for r in out)


def test_frame_sample_stage():
    t = synth_media_table(5, kind="video")
    out = rd.from_arrow(t).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every_k": 10},
        batch_format="pyarrow", concurrency=(1, 2),
    ).take_all()
    # 30 frames, every 10th → indices 0, 10, 20 per video
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 10, 20] for v in per.values())
    assert set(per) == set(range(5))
