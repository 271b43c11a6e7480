"""Pure-Python/NumPy PNG (RFC 2083 / ISO 15948) codec.

Closes the container's last multimodal stub (multimodal.py previously
raised ``NotImplementedError`` for PNG): no image codec library exists
in this environment, so the engine carries its own baseline PNG
implementation built from the public specification — real chunk
parsing with CRC-32 verification, the zlib stream via the Python
STDLIB ``zlib`` module (stdlib, not an external codec dependency; the
JPEG codec had no such luxury and carries its own Huffman), and the
five scanline defilters (None/Sub/Up/Average/Paeth) in NumPy.

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), non-interlaced.  16-bit and Adam7 streams
raise ``ValueError``.

Exactness contract: PNG is lossless — ``decode_png(encode_png(img))``
must reproduce ``img`` BIT-FOR-BIT, and a stream whose IDAT was
produced by any conformant deflate (stdlib ``zlib.compress`` at any
level) must decode to the same pixels.  CRC mismatches and truncated
streams raise, never return garbage.

The reference (a graph library) has no image codecs; this supports the
multimodal pipeline surface (SURVEY.md §2 multimodal rows).
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ------------------------------------------------------------ decoding


def _chunks(data: bytes):
    """Yield (type, payload) for every chunk, verifying each CRC-32."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG stream (bad signature)")
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        payload = data[pos + 8:end]
        (crc,) = struct.unpack(">I", data[end:end + 4])
        if crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in chunk {ctype!r}")
        yield ctype, payload
        pos = end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def _defilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters.  Returns (h, w*bpp) uint8.

    Up is fully vectorized; Sub/Average/Paeth have horizontal
    dependencies — Sub uses a stride-wise cumsum, Average/Paeth fall
    back to a per-pixel loop on just the rows that use them (encoders
    we produce emit filter 0, so the hot roundtrip path never loops).
    """
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decompressed IDAT length {len(raw)} != expected "
            f"{h * (stride + 1)} (h={h}, stride={stride})"
        )
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    out = np.zeros((h, stride), np.uint16)  # u16 scratch, mod-256 at end
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f = int(ftypes[y])
        line = arr[y, 1:].astype(np.uint16)
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for s in range(bpp):  # cumsum along each byte lane
                cur[s::bpp] = np.cumsum(cur[s::bpp], dtype=np.uint64) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = np.zeros(stride, np.uint16)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = np.zeros(stride, np.uint16)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f} on row {y}")
        out[y] = cur & 0xFF
        prev = out[y]
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for grayscale, (h, w, c) else.

    Palette images (color type 3) are expanded through their PLTE to
    (h, w, 3) RGB.  Raises ``ValueError`` on 16-bit depth, interlace,
    bad CRC, truncation, or a decompressed-length mismatch.
    """
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, payload in _chunks(bytes(data)):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(payload)
    if ihdr is None:
        raise ValueError("PNG stream has no IHDR")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if ctype_ not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_}")
    if comp != 0 or filt != 0:
        raise ValueError("non-standard compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _CHANNELS[ctype_]
    raw = zlib.decompress(bytes(idat))
    px = _defilter(raw, h, w, bpp)
    if ctype_ == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = px.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]  # (h, w, 3)
    if bpp == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, bpp)


# ------------------------------------------------------------ encoding


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", crc32(ctype + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, *, level: int = 6) -> bytes:
    """uint8 array → PNG bytes.  (h, w) → grayscale; (h, w, 2) →
    gray+alpha; (h, w, 3) → RGB; (h, w, 4) → RGBA.  Scanlines use
    filter 0 (None) — PNG is lossless regardless of filter choice, and
    the decode side pins the roundtrip bit-for-bit."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {a.dtype}")
    if a.ndim == 2:
        ctype_, bpp = 0, 1
        flat = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        ctype_ = {2: 4, 3: 2, 4: 6}[a.shape[2]]
        bpp = a.shape[2]
        flat = a
    else:
        raise ValueError(f"unsupported image shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    rows = np.zeros((h, w * bpp + 1), np.uint8)
    rows[:, 1:] = flat.reshape(h, w * bpp)
    idat = zlib.compress(rows.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))
