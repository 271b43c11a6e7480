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


def test_real_decoder_contract_per_format():
    """PNG now has a REAL decoder (pngc) — a fake payload tagged "png"
    must fail its signature check LOUDLY (ValueError), never silently
    produce features; formats with no codec library (mp4) stay an
    explicit NotImplementedError stub."""
    import pyarrow as pa

    stage = DecodeFeatureStage(decoder="real")
    with pytest.raises(ValueError, match="signature"):
        stage(synth_media_table(1))  # fake bytes tagged "png"
    mp4 = synth_media_table(1)
    i = mp4.schema.get_field_index("format")
    mp4 = mp4.set_column(i, "format", pa.array(["mp4"]))
    with pytest.raises(NotImplementedError):
        stage(mp4)


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


def test_sobel_stage_matches_brute_force():
    from essentials_rd.multimodal import (SobelStage, decode_netpbm,
                                          encode_ppm, synth_coded_media)

    media = synth_coded_media(8, kind="image", seed=3)
    out = rd.from_arrow(media).map_batches(
        SobelStage, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
    ).take_all()
    out.sort(key=lambda r: r["media_id"])
    assert len(out) == 8
    for r in out:
        img = decode_netpbm(
            media.column("payload")[r["media_id"]].as_py()
        ).astype(np.int64)
        h, w, _ = img.shape
        lum = img[:, :, 0] + 2 * img[:, :, 1] + img[:, :, 2]
        # explicit double-loop brute force (the stage is vectorized)
        gsum = gmax = 0
        n_int = 0
        kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
        ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]])
        for rr in range(1, h - 1):
            for cc in range(1, w - 1):
                win = lum[rr - 1:rr + 2, cc - 1:cc + 2]
                g = abs(int((win * kx).sum())) + abs(int((win * ky).sum()))
                gsum += g
                gmax = max(gmax, g)
                n_int += 1
        assert r["n_interior"] == n_int == (w - 2) * (h - 2)
        assert r["grad_sum"] == gsum
        assert r["grad_max"] == gmax

    # a flat image has zero gradient everywhere
    flat = np.full((6, 9, 3), 77, np.uint8)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_ppm(flat)], pa.large_binary()),
    })
    res = SobelStage()(t)
    assert res.column("grad_sum")[0].as_py() == 0
    assert res.column("n_interior")[0].as_py() == 4 * 7


def test_hadamard_stage_parseval_and_brute_force():
    from essentials_rd.multimodal import (HadamardStage, decode_wav_pcm16,
                                          synth_coded_media)

    media = synth_coded_media(6, kind="audio", seed=5)
    out = rd.from_arrow(media).map_batches(
        HadamardStage, batch_format="pyarrow", batch_size=3,
        concurrency=(1, 2),
    ).take_all()
    out.sort(key=lambda r: r["media_id"])
    for r in out:
        s, _ = decode_wav_pcm16(
            media.column("payload")[r["media_id"]].as_py())
        s = s[:64].astype(np.int64)
        # brute-force coefficients via explicit popcount
        c = np.array([
            sum(int(s[j]) * (1 - 2 * (bin(j & k).count("1") % 2))
                for j in range(64))
            for k in range(64)
        ], dtype=np.int64)
        assert r["dc"] == int(c[0]) == int(s.sum())
        assert r["e_low"] == int((c[:32] ** 2).sum())
        assert r["e_high"] == int((c[32:] ** 2).sum())
        # Parseval for the ±1 WHT: sum c_k^2 == 64 * sum s_j^2
        assert r["e_low"] + r["e_high"] == 64 * int((s ** 2).sum())


def test_rawvid_round_trip_and_motion():
    from essentials_rd.multimodal import (VideoMotionStage, decode_rawvid,
                                          encode_rawvid, synth_coded_video)

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (5, 4, 6, 3)).astype(np.uint8)
    assert (decode_rawvid(encode_rawvid(frames)) == frames).all()

    # corrupt magic / truncation raise
    buf = encode_rawvid(frames)
    with pytest.raises(ValueError):
        decode_rawvid(b"XXXX" + buf[4:])
    with pytest.raises(ValueError):
        decode_rawvid(buf[:-7])

    media = synth_coded_video(7, seed=4)
    out = rd.from_arrow(media).map_batches(
        VideoMotionStage, batch_format="pyarrow", batch_size=3,
        concurrency=(1, 2),
    ).take_all()
    out.sort(key=lambda r: r["media_id"])
    for r in out:
        v = decode_rawvid(
            media.column("payload")[r["media_id"]].as_py()).astype(np.int64)
        # brute-force double loop over frame pairs
        mot = 0
        for f in range(1, v.shape[0]):
            mot += int(np.abs(v[f] - v[f - 1]).sum())
        assert r["motion_sum"] == mot
        assert r["frame0_sum"] == int(v[0].sum())
        assert r["n_frames"] == v.shape[0]

    # a static video (repeated frame) has zero motion
    static = np.repeat(frames[:1], 4, axis=0)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_rawvid(static)], pa.large_binary()),
    })
    res = VideoMotionStage()(t)
    assert res.column("motion_sum")[0].as_py() == 0
