"""PNG codec tests: lossless roundtrip, all five defilters against an
independent forward-filter implementation, palette expansion, CRC and
truncation rejection, and interop with stdlib zlib at every level."""

import struct
import zlib
from binascii import crc32

import numpy as np
import pytest

from essentials_rd.pngc import _SIG, decode_png, encode_png


def _img(h, w, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


# ------------------------------------------------- roundtrip contract


@pytest.mark.parametrize("c", [None, 2, 3, 4])
@pytest.mark.parametrize("hw", [(1, 1), (7, 5), (16, 33)])
def test_roundtrip_bit_exact(c, hw):
    img = _img(*hw, c)
    out = decode_png(encode_png(img))
    assert out.dtype == np.uint8
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_any_zlib_level_decodes(level):
    img = _img(9, 13, 3, seed=level)
    out = decode_png(encode_png(img, level=level))
    assert np.array_equal(out, img)


# ------------------------------------------- forward-filtered streams
#
# The encoder only emits filter 0, so the Sub/Up/Average/Paeth decode
# paths are pinned against an INDEPENDENT forward filter written
# straight from the RFC 2083 definitions (different formulation from
# the decoder's reversal).


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(img, ftype, bpp):
    h, stride = img.shape
    out = np.zeros((h, stride + 1), np.uint8)
    out[:, 0] = ftype
    for y in range(h):
        for x in range(stride):
            raw = int(img[y, x])
            left = int(img[y, x - bpp]) if x >= bpp else 0
            up = int(img[y - 1, x]) if y > 0 else 0
            ul = int(img[y - 1, x - bpp]) if (y > 0 and x >= bpp) else 0
            if ftype == 0:
                v = raw
            elif ftype == 1:
                v = raw - left
            elif ftype == 2:
                v = raw - up
            elif ftype == 3:
                v = raw - ((left + up) >> 1)
            else:
                v = raw - _paeth_ref(left, up, ul)
            out[y, x + 1] = v & 0xFF
    return out


def _chunk(ctype, payload):
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", crc32(ctype + payload) & 0xFFFFFFFF))


def _png_from_rows(rows, w, h, ctype_):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [None, 3])
def test_each_filter_type_reverses(ftype, c):
    img = _img(11, 6, c, seed=ftype + 10)
    bpp = 1 if c is None else c
    flat = img.reshape(11, 6 * bpp)
    rows = _forward_filter(flat, ftype, bpp)
    data = _png_from_rows(rows, 6, 11, 0 if c is None else 2)
    assert np.array_equal(decode_png(data), img)


def test_mixed_filters_per_row():
    img = _img(10, 8, 3, seed=99)
    flat = img.reshape(10, 24)
    rows = np.zeros((10, 25), np.uint8)
    for y in range(10):
        f = y % 5
        # forward-filter row y against the RAW previous row (per spec)
        sub = _forward_filter(flat[max(0, y - 1):y + 1], f, 3)
        rows[y] = sub[-1]
    data = _png_from_rows(rows, 8, 10, 2)
    assert np.array_equal(decode_png(data), img)


# ----------------------------------------------------- palette + meta


def test_palette_expansion():
    plte = _img(5, 3, seed=4).reshape(5, 3)  # 5 RGB entries
    idx = np.array([[0, 1, 2], [3, 4, 0]], np.uint8)
    rows = np.zeros((2, 4), np.uint8)
    rows[:, 1:] = idx
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte.tobytes())
            + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + _chunk(b"IEND", b""))
    out = decode_png(data)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, plte[idx])


def test_palette_index_out_of_range_raises():
    plte = np.zeros((2, 3), np.uint8)
    rows = np.zeros((1, 2), np.uint8)
    rows[0, 1] = 7  # index 7, palette has 2 entries
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte.tobytes())
            + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(data)


# --------------------------------------------------------- rejections


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG" + b"\x00" * 40)


def test_crc_mismatch_rejected():
    data = bytearray(encode_png(_img(4, 4)))
    data[40] ^= 0xFF  # flip a byte inside a chunk payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_truncated_stream_rejected():
    data = encode_png(_img(8, 8, 3))
    with pytest.raises(ValueError):
        decode_png(data[:len(data) // 2])


def test_16bit_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 18))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(data)


def test_interlace_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 6))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(data)


def test_idat_length_mismatch_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 7))  # want 20
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length"):
        decode_png(data)


# ------------------------------------------------- stage integration


def test_decode_feature_stage_handles_png():
    import pyarrow as pa

    from essentials_rd.multimodal import DecodeFeatureStage

    img = _img(12, 10, 3, seed=1)
    payload = encode_png(img)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "format": pa.array(["png"], pa.string()),
        "kind": pa.array(["image"], pa.string()),
    })
    stage = DecodeFeatureStage(feature_dim=8, decoder="real")
    out = stage(batch)
    feats = np.asarray(out.column("f0").to_pylist() if "f0" in
                       out.column_names else [])
    # mean matches the decoded pixels exactly
    mean = out.column("mean")[0].as_py()
    assert abs(mean - img.astype(np.float64).mean() / 256.0) < 1e-12
