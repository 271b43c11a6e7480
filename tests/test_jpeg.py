"""Pure-NumPy baseline JPEG codec (essentials_rd.jpegc): the encoder
emits both bytes and its exact expected reconstruction; the decoder
must reproduce that array bit-for-bit (the lossy-codec exactness
contract), plus error paths and the Ray actor-pool verify stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.jpegc import decode_jpeg, encode_jpeg, quality_tables


def _noise(h, w, c, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("h,w,c", [
    (8, 8, 1), (16, 24, 1), (37, 53, 1), (1, 1, 1),
    (8, 8, 3), (24, 31, 3), (9, 50, 3),
])
@pytest.mark.parametrize("q", [5, 50, 95, 100])
def test_roundtrip_exact_contract(h, w, c, q):
    img = _noise(h, w, c, seed=h * 1000 + w * 10 + c)
    buf, expected = encode_jpeg(img, quality=q)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    got = decode_jpeg(buf)
    assert got.shape == img.shape
    assert got.dtype == np.uint8
    assert np.array_equal(got, expected)


def test_quality_monotonic_on_smooth_image():
    y = np.clip(
        128 + 60 * np.sin(np.arange(64) / 9.0)[None, :]
        + 40 * np.cos(np.arange(48) / 7.0)[:, None],
        0, 255,
    ).astype(np.uint8)
    sizes, errs = [], []
    for q in (10, 50, 90):
        buf, _ = encode_jpeg(y, quality=q)
        got = decode_jpeg(buf)
        sizes.append(len(buf))
        errs.append(np.abs(got.astype(int) - y.astype(int)).mean())
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]
    # high quality reconstructs a smooth image nearly losslessly
    assert errs[2] < 1.0


def test_quality_tables_scale_and_clip():
    lo_l, lo_c = quality_tables(1)
    hi_l, hi_c = quality_tables(100)
    assert (hi_l == 1).all() and (hi_c == 1).all()
    assert lo_l.max() == 255 and lo_l.min() >= 1
    mid_l, _ = quality_tables(50)
    assert (lo_l >= mid_l).all()


def test_flat_image_compresses_to_dc_only():
    img = np.full((32, 32), 77, np.uint8)
    buf, expected = encode_jpeg(img, quality=75)
    got = decode_jpeg(buf)
    assert np.array_equal(got, expected)
    assert np.abs(got.astype(int) - 77).max() <= 1
    # 16 blocks of pure DC + EOB: the scan is tiny
    assert len(buf) < 700


def test_decode_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    buf, _ = encode_jpeg(_noise(16, 16, 1, 3), quality=50)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(buf[: len(buf) // 2])


def test_corrupted_entropy_bit_breaks_contract():
    """Flipping one bit mid-scan must not silently reproduce the
    expected reconstruction — the contract has teeth."""
    img = _noise(24, 24, 1, 11)
    buf, expected = encode_jpeg(img, quality=75)
    b = bytearray(buf)
    # flip a bit ~25% into the entropy segment (past all headers)
    k = len(b) - (len(b) - b.index(0xDA)) // 2
    if b[k] == 0xFF or b[k - 1] == 0xFF:
        k += 2
    b[k] ^= 0x10
    try:
        got = decode_jpeg(bytes(b))
        assert not np.array_equal(got, expected)
    except ValueError:
        pass  # desync detected outright is also acceptable


def test_jpeg_verify_stage_pipeline():
    from essentials_rd.multimodal import jpeg_roundtrip, synth_coded_jpeg

    tab = synth_coded_jpeg(10, seed=7)
    out = jpeg_roundtrip(
        rd.from_arrow(tab), concurrency=2, batch_size=4
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(out) == 10
    for i in range(10):
        assert out.loc[i, "width"] == 9 + (i % 5) * 7
        assert out.loc[i, "height"] == 10 + (i % 4) * 9
        assert out.loc[i, "n_components"] == (1 if i % 2 == 0 else 3)


def test_jpeg_verify_stage_raises_on_tampered_payload():
    from essentials_rd.multimodal import JpegVerifyStage, synth_coded_jpeg

    tab = synth_coded_jpeg(2, seed=7)
    payload = bytearray(tab.column("payload")[0].as_py())
    payload[-20] ^= 0x08  # corrupt the entropy tail
    tampered = tab.set_column(
        tab.schema.get_field_index("payload"), "payload",
        pa.array([bytes(payload), tab.column("payload")[1].as_py()],
                 pa.binary()),
    )
    stage = JpegVerifyStage()
    with pytest.raises((AssertionError, ValueError)):
        stage(tampered)


def test_probe_quality_all_factors():
    from essentials_rd.jpegc import parse_quant_tables, probe_quality

    img = _noise(16, 16, 1, 42)
    for q in (1, 7, 35, 49, 50, 65, 95, 99, 100):
        buf, _ = encode_jpeg(img, quality=q)
        assert probe_quality(buf) == q
        tabs = parse_quant_tables(buf)
        assert 0 in tabs and len(tabs[0]) == 64
    # color stream carries both tables
    bufc, _ = encode_jpeg(_noise(8, 8, 3, 1), quality=80)
    tabs = parse_quant_tables(bufc)
    assert set(tabs) == {0, 1}
    # foreign table -> -1
    b = bytearray(bufc)
    dqt = b.index(0xDB, 2) + 4  # first DQT payload byte (after id)
    b[dqt + 1] ^= 0x01
    assert probe_quality(bytes(b)) == -1


@pytest.mark.parametrize("h,w", [(16, 16), (17, 23), (8, 8), (33, 50),
                                 (1, 1)])
@pytest.mark.parametrize("q", [30, 75, 100])
def test_420_roundtrip_exact_contract(h, w, q):
    img = _noise(h, w, 3, seed=h * 100 + w + q)
    buf, expected = encode_jpeg(img, quality=q, subsampling="420")
    got = decode_jpeg(buf)
    assert got.shape == img.shape
    assert np.array_equal(got, expected)


def test_420_shrinks_bytes_and_stays_close_on_smooth():
    sm = np.clip(
        128 + 60 * np.sin(np.arange(96) / 9.0)[None, :, None]
        + 40 * np.cos(np.arange(64) / 7.0)[:, None, None]
        + np.array([0, 10, 20])[None, None, :],
        0, 255,
    ).astype(np.uint8)
    b4, _ = encode_jpeg(sm, 85, "444")
    b2, e2 = encode_jpeg(sm, 85, "420")
    got = decode_jpeg(b2)
    assert np.array_equal(got, e2)
    assert len(b2) < len(b4)
    assert np.abs(got.astype(int) - sm.astype(int)).mean() < 2.0


def test_420_sampling_factors_in_sof():
    buf, _ = encode_jpeg(_noise(16, 16, 3, 5), quality=75,
                         subsampling="420")
    sof = buf.index(b"\xff\xc0")
    ncomp = buf[sof + 9]
    assert ncomp == 3
    assert buf[sof + 11] == 0x22  # Y 2x2
    assert buf[sof + 14] == 0x11 and buf[sof + 17] == 0x11


@pytest.mark.parametrize("c,sub,ri", [(1, "444", 2), (3, "444", 3),
                                      (3, "420", 1), (1, "444", 7)])
def test_restart_interval_roundtrip(c, sub, ri):
    img = _noise(32, 48, c, seed=ri * 10 + c)
    buf, expected = encode_jpeg(img, quality=75, subsampling=sub,
                                restart_interval=ri)
    assert b"\xff\xdd" in buf  # DRI segment present
    got = decode_jpeg(buf)
    assert np.array_equal(got, expected)
    # without restart_interval the stream carries no DRI
    buf0, _ = encode_jpeg(img, quality=75, subsampling=sub)
    assert b"\xff\xdd" not in buf0


def test_restart_marker_resyncs_dc():
    """Restart intervals reset DC predictors: the streams differ from
    the non-restart encoding but reconstruct identically."""
    img = _noise(40, 40, 1, 3)
    b0, e0 = encode_jpeg(img, quality=60)
    b1, e1 = encode_jpeg(img, quality=60, restart_interval=2)
    assert b0 != b1
    assert np.array_equal(e0, e1)  # same quantized coefficients
    assert np.array_equal(decode_jpeg(b0), decode_jpeg(b1))


def test_missing_restart_marker_detected():
    img = _noise(32, 32, 1, 8)
    buf, _ = encode_jpeg(img, quality=75, restart_interval=1)
    # excise the first RST marker: the reader must notice desync
    for m in range(8):
        k = buf.find(bytes([0xFF, 0xD0 + m]))
        if k > 0:
            broken = buf[:k] + buf[k + 2:]
            with pytest.raises((ValueError, IndexError)):
                decode_jpeg(broken)
            break
