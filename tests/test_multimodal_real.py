"""Real lib-free media decode: netpbm (P5/P6) and RIFF WAV PCM16.

Pins exact encode→decode round trips, header robustness (comments,
truncation, wrong magic, stereo), the MediaStatsStage actor pool on a
Ray dataset (values vs a direct NumPy fold), and block-layout
invariance of the stats query surface.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.multimodal import (
    DecodeFeatureStage,
    MediaStatsStage,
    decode_netpbm,
    decode_wav_pcm16,
    encode_pgm,
    encode_ppm,
    encode_wav_pcm16,
    media_stats,
    synth_coded_media,
)


def test_ppm_pgm_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (11, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_ppm(img)), img)
    gray = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_pgm(gray)), gray)


def test_netpbm_header_comments_and_errors():
    gray = np.arange(35, dtype=np.uint8).reshape(5, 7)
    buf = b"P5 # trailing\n# full comment line\n 7\t5\n255\n" + gray.tobytes()
    assert np.array_equal(decode_netpbm(buf), gray)
    with pytest.raises(ValueError, match="netpbm"):
        decode_netpbm(b"P4\n1 1\n255\n\x00")  # bitmap magic unsupported
    with pytest.raises(ValueError, match="truncated"):
        decode_netpbm(encode_pgm(gray)[:-3])
    with pytest.raises(ValueError, match="maxval"):
        decode_netpbm(b"P5\n1 1\n65535\n\x00\x00")


def test_wav_roundtrip_and_errors():
    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32768, 777).astype(np.int16)  # odd len: pad path
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, 22050))
    assert rate == 22050 and np.array_equal(out, s)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)
    # stereo fmt chunk rejected
    fmt = (np.array([1, 2], np.uint16).tobytes()
           + np.array([8000, 32000], np.uint32).tobytes()
           + np.array([4, 16], np.uint16).tobytes())
    buf = (b"RIFF" + np.uint32(28).tobytes() + b"WAVE"
           + b"fmt " + np.uint32(16).tobytes() + fmt
           + b"data" + np.uint32(0).tobytes())
    with pytest.raises(ValueError, match="channel"):
        decode_wav_pcm16(buf)


def _local_stats(tbl: pa.Table) -> dict:
    out = {}
    for i in range(tbl.num_rows):
        buf = tbl.column("payload")[i].as_py()
        fmt = tbl.column("format")[i].as_py()
        if fmt == "wav":
            vals = decode_wav_pcm16(buf)[0].astype(np.int64)
        else:
            vals = decode_netpbm(buf).ravel().astype(np.int64)
        mid = tbl.column("media_id")[i].as_py()
        out[mid] = (len(vals), int(vals.sum()), int(vals.min()),
                    int(vals.max()))
    return out


@pytest.mark.parametrize("kind", ["image", "audio"])
def test_media_stats_stage_matches_local(ray_session, kind):
    tbl = synth_coded_media(20, kind=kind, seed=11)
    ref = _local_stats(tbl)
    got = media_stats(rd.from_arrow(tbl).repartition(5),
                      batch_size=4).take_all()
    assert len(got) == 20
    for r in got:
        assert ref[r["media_id"]] == (
            r["n_vals"], r["val_sum"], r["val_min"], r["val_max"])
    if kind == "audio":
        rates = {r["media_id"]: r["sample_rate"] for r in got}
        for i in range(20):
            assert rates[i] == 8000 + 4000 * (i % 3)


def test_decode_feature_stage_real_decoder(ray_session):
    tbl = synth_coded_media(8, kind="image", seed=5)
    ds = rd.from_arrow(tbl).map_batches(
        DecodeFeatureStage,
        fn_constructor_kwargs={"feature_dim": 16, "decoder": "real"},
        batch_format="pyarrow", batch_size=4, concurrency=(1, 2),
        num_cpus=1, max_restarts=0)
    rows = {r["media_id"]: r for r in ds.take_all()}
    assert len(rows) == 8
    for i in range(8):
        px = decode_netpbm(
            tbl.column("payload")[i].as_py()).ravel() / 256.0
        r = rows[i]
        assert len(r["feature"]) == 16
        assert abs(r["mean"] - px.mean()) < 1e-12
        assert abs(r["std"] - px.std()) < 1e-12
        # first pooled feature == mean of the first bin
        bound = (1 * len(px)) // 16
        assert abs(r["feature"][0] - px[:bound].mean()) < 1e-12


def test_media_stats_layout_invariance(ray_session):
    tbl = synth_coded_media(15, kind="audio", seed=9)
    a = sorted(
        tuple(r.values())
        for r in media_stats(rd.from_arrow(tbl)).take_all())
    b = sorted(
        tuple(r.values())
        for r in media_stats(
            rd.from_arrow(tbl).repartition(7), batch_size=2).take_all())
    assert a == b


def test_resize_nearest_matches_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.multimodal import (
        decode_netpbm, media_resize, synth_coded_media,
    )

    media = synth_coded_media(12, kind="image", seed=3)
    rows = media_resize(rd.from_arrow(media)).take_all()
    rows.sort(key=lambda r: r["media_id"])
    for r in rows:
        buf = media.column("payload")[r["media_id"]].as_py()
        img = decode_netpbm(buf)
        small = img[::2, ::2, :]
        vals = small.ravel().astype(np.int64)
        assert (r["out_h"], r["out_w"]) == small.shape[:2]
        assert r["n_vals"] == len(vals)
        assert r["val_sum"] == int(vals.sum())
        assert r["val_min"] == int(vals.min())
        assert r["val_max"] == int(vals.max())
    # odd dims keep the extra row/col: 13x9 -> 7x5
    from essentials_rd.multimodal import coded_img_dims
    for i in range(12):
        w, h = coded_img_dims(i)
        r = rows[i]
        assert r["out_w"] == (w + 1) // 2 and r["out_h"] == (h + 1) // 2


def test_wav_features_match_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.multimodal import (
        decode_wav_pcm16, synth_coded_media, wav_features,
    )

    media = synth_coded_media(10, kind="audio", seed=5)
    rows = wav_features(rd.from_arrow(media)).take_all()
    rows.sort(key=lambda r: r["media_id"])
    for r in rows:
        buf = media.column("payload")[r["media_id"]].as_py()
        s, _ = decode_wav_pcm16(buf)
        s = s.astype(np.int64)
        assert r["n_samples"] == len(s)
        assert r["zero_crossings"] == int((s[:-1] * s[1:] < 0).sum())
        assert r["abs_peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] > 0  # coded stream oscillates
