"""Pure-NumPy baseline JPEG (ITU-T T.81 / ISO 10918-1) codec.

Closes the container's last multimodal stub honestly: no codec library
exists in this environment, so the engine carries its own baseline
sequential-DCT implementation — real marker parsing, real canonical
Huffman entropy coding with byte stuffing, real dequant + IDCT — built
entirely from the public JPEG specification (Annex K tables, JFIF
colorspace).  Scope: 8-bit baseline SOF0 — grayscale (1 component),
YCbCr 4:4:4 and 4:2:0 (2×2 chroma subsampling with MCU interleave),
and DRI/RSTn restart intervals on both encode and decode;
progressive (SOF2) and arithmetic-coded streams raise ``ValueError``.

Exactness contract (how a lossy codec is still exactly testable):
``encode_jpeg`` returns BOTH the compressed bytes and the expected
reconstruction — quantized coefficients → dequantize → IDCT → level
shift → round/clip, the same arithmetic path the decoder runs.
``decode_jpeg(bytes)`` must reproduce that array BIT-FOR-BIT (same
float64 kernels on both sides), which pins the entire entropy-coding
round trip: one wrong Huffman bit anywhere desynchronizes the stream
and scrambles every later block.

The reference has no image codecs (graph library); this supports the
multimodal pipeline surface (SURVEY.md §2 multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants

# scan position k -> row-major block index (T.81 Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (luminance / chrominance)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: coeffs = M @ block @ M.T,
    block = M.T @ coeffs @ M (T.81 A.3.3 with the 1/2·C(u) scaling)."""
    x = np.arange(8, dtype=np.float64)
    m = 0.5 * np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the conventional quality formula
    (5000/q below 50, 200−2q above), clipped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (QT_LUM, QT_CHROM):
        s = (t * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------- huffman spec


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) and ((length, code) -> symbol) maps
    for a canonical T.81 table (C.2 code assignment order)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for a DC diff / AC coefficient
    (T.81 F.1.2.1): category = bit length of |v|, negatives stored as
    v + 2^s − 1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)
        return bytes(self.out)

    def restart_marker(self, m: int) -> None:
        """Pad to the byte boundary and emit RSTm (raw, unstuffed —
        markers live outside the entropy byte stream)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out.append(0xFF)
        self.out.append(0xD0 + m)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a marker inside the scan = truncated/foreign stream
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            s = dec.get((length, code))
            if s is not None:
                return s
        raise ValueError("invalid Huffman code in scan")

    def restart(self, m: int) -> None:
        """Consume an RSTm marker at a restart boundary (E.1.4): drop
        padding bits to the byte boundary, then the two marker bytes."""
        self.acc = 0
        self.nbits = 0
        if self.d[self.pos] != 0xFF or self.d[self.pos + 1] != 0xD0 + m:
            raise ValueError(
                f"expected RST{m} at restart boundary, got "
                f"0x{self.d[self.pos]:02X}{self.d[self.pos + 1]:02X}")
        self.pos += 2


# -------------------------------------------------------------- encoder


def _block_split(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate pad to 8-multiples, return (nby*nbx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.empty((ph, pw), np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:h, w:] = p[:h, w - 1: w]
    p[h:, w:] = p[h - 1, w - 1]
    nby, nbx = ph // 8, pw // 8
    blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, nby, nbx


def _encode_plane_coeffs(plane: np.ndarray, qt: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Quantized zigzag coefficients (nblocks, 64) of one component."""
    blocks, nby, nbx = _block_split(plane.astype(np.float64) - 128.0)
    coefs = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    q = np.rint(coefs.reshape(-1, 64) / qt.astype(np.float64)).astype(np.int64)
    return q[:, ZIGZAG], nby, nbx


def _reconstruct_plane(zz: np.ndarray, qt: np.ndarray, nby: int, nbx: int,
                       h: int, w: int) -> np.ndarray:
    """Dequantize + IDCT + level shift — the decoder's exact arithmetic,
    shared so the encoder can emit the expected reconstruction."""
    deq = (zz[:, UNZIGZAG] * qt).astype(np.float64).reshape(-1, 8, 8)
    px = np.einsum("xu,nuv,yv->nxy", _DCT_M.T, deq, _DCT_M.T)
    px = px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return np.clip(np.rint(px + 128.0), 0, 255)[:h, :w]


def _huff_encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                       dc_enc, ac_enc) -> int:
    dc = int(zz[0])
    s, v = _magnitude(dc - pred)
    code, ln = dc_enc[s]
    w.put(code, ln)
    w.put(v, s)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        c = int(zz[k])
        if c == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s, v = _magnitude(c)
        code, ln = ac_enc[(run << 4) | s]
        w.put(code, ln)
        w.put(v, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]  # EOB
        w.put(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _pad_plane(plane: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad both dims to multiples of ``mult``."""
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    p = np.empty((ph, pw), np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:h, w:] = p[:h, w - 1: w]
    p[h:, w:] = p[h - 1, w - 1]
    return p


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsampling: str = "444",
                restart_interval: int = 0) -> tuple[bytes, np.ndarray]:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG.  ``subsampling``: "444" (every component full
    resolution) or "420" (chroma box-averaged 2×2, Y sampling factors
    2×2 — the dominant real-world mode; ignored for grayscale).
    ``restart_interval`` > 0 emits a DRI segment and an RSTm marker
    every N MCUs (DC predictors reset, byte-aligned — E.1.4), the
    resync mechanism real-world encoders use against corruption.
    Returns ``(jpeg_bytes, expected)`` where ``expected`` is the exact
    array ``decode_jpeg(jpeg_bytes)`` must produce (see module
    docstring)."""
    img = np.asarray(img)
    assert img.dtype == np.uint8 and img.ndim in (2, 3)
    assert subsampling in ("444", "420")
    color = img.ndim == 3
    sub420 = color and subsampling == "420"
    h, w = img.shape[:2]
    qt_l, qt_c = quality_tables(quality)

    if color:
        y, cb, cr = _rgb_to_ycbcr(img)
        if sub420:
            yp = _pad_plane(y, 16)
            cbp = _pad_plane(cb, 16)
            crp = _pad_plane(cr, 16)
            ph, pw = cbp.shape
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [yp, cb, cr]
        else:
            planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]
        samps = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * 3
    else:
        planes = [img.astype(np.float64)]
        qts = [qt_l]
        samps = [(1, 1)]

    coeffs, geom = [], []
    for pl, qt in zip(planes, qts):
        zz, nby, nbx = _encode_plane_coeffs(pl, qt)
        coeffs.append(zz)
        geom.append((nby, nbx))

    dc_l_enc, _ = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l_enc, _ = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c_enc, _ = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_c_enc, _ = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    enc_tabs = ([(dc_l_enc, ac_l_enc)]
                + [(dc_c_enc, ac_c_enc)] * (len(planes) - 1))
    # interleaved MCUs: per MCU each component contributes h_i×v_i
    # blocks in raster order (B.2.3)
    maxh = max(s[0] for s in samps)
    maxv = max(s[1] for s in samps)
    nmy, nmx = geom[0][0] // samps[0][1], geom[0][1] // samps[0][0]
    mcu_idx = 0
    rst = 0
    for mr in range(nmy):
        for mc in range(nmx):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                bw.restart_marker(rst)
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, (hs, vs) in enumerate(samps):
                nbx_c = geom[ci][1]
                for vy in range(vs):
                    for vx in range(hs):
                        b = (mr * vs + vy) * nbx_c + (mc * hs + vx)
                        preds[ci] = _huff_encode_block(
                            bw, coeffs[ci][b], preds[ci], *enc_tabs[ci]
                        )
            mcu_idx += 1
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].tolist()))
    if color:
        out += _seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].tolist()))
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if color:
        out += _dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)
        out += _dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI

    rec = []
    for ci, (zz, qt, (nby_, nbx_)) in enumerate(zip(coeffs, qts, geom)):
        hs, vs = samps[ci]
        full = _reconstruct_plane(zz, qt, nby_, nbx_,
                                  nby_ * 8, nbx_ * 8)
        if (hs, vs) != (maxh, maxv):  # upsample chroma to Y resolution
            full = np.repeat(np.repeat(full, maxv // vs, axis=0),
                             maxh // hs, axis=1)
        rec.append(full[:h, :w])
    if color:
        expected = _ycbcr_to_rgb(*rec)
    else:
        expected = rec[0].astype(np.uint8)
    return bytes(out), expected


# -------------------------------------------------------------- decoder


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG produced by any conforming encoder within
    this codec's scope (SOF0, 1 or 3 components, 4:4:4/grayscale or
    4:2:0 sampling, restart intervals honored).  Returns (h, w) or
    (h, w, 3) uint8."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    dri = 0
    while True:
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        ln = struct.unpack(">H", buf[pos: pos + 2])[0]
        seg = buf[pos + 2: pos + ln]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(
                    seg[sp + 1: sp + 65], np.uint8
                ).astype(np.int64)
                qts[tq] = tab[UNZIGZAG]
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1: sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17: sp + 17 + nv])
                _, dec = _canonical_codes(bits, vals)
                huff[(tc, th)] = dec
                sp += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "tq": tq,
                              "h": samp >> 4, "v": samp & 0xF})
            maxh = max(c["h"] for c in comps)
            maxv = max(c["v"] for c in comps)
            factors = sorted({(c["h"], c["v"]) for c in comps})
            if not (factors == [(1, 1)]
                    or (comps[0]["h"], comps[0]["v"]) == (2, 2)
                    and all((c["h"], c["v"]) == (1, 1)
                            for c in comps[1:])):
                raise ValueError(
                    "unsupported sampling (4:4:4/grayscale/4:2:0 only)")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} "
                             "(baseline sequential only)")
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            order = []
            for si in range(ns):
                cs, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
                order.append(comp)
            br = _BitReader(buf, pos + ln)
            # MCU grid from the max sampling factors (B.2.3); each
            # component's block grid scales by its own factors
            nmy = -(-h // (8 * maxv))
            nmx = -(-w // (8 * maxh))
            geo = [(nmy * c["v"], nmx * c["h"]) for c in order]
            zzs = [np.zeros((gy * gx, 64), np.int64) for gy, gx in geo]
            preds = [0] * len(order)
            mcu_idx = 0
            rst = 0
            for mr in range(nmy):
                for mc in range(nmx):
                    if dri and mcu_idx and mcu_idx % dri == 0:
                        br.restart(rst)
                        rst = (rst + 1) % 8
                        preds = [0] * len(order)
                    mcu_idx += 1
                    for ci, comp in enumerate(order):
                        dc_dec = huff[(0, comp["td"])]
                        ac_dec = huff[(1, comp["ta"])]
                        for vy in range(comp["v"]):
                            for vx in range(comp["h"]):
                                b = ((mr * comp["v"] + vy) * geo[ci][1]
                                     + (mc * comp["h"] + vx))
                                zz = zzs[ci][b]
                                s = br.symbol(dc_dec)
                                diff = br.bits(s)
                                if s and diff < (1 << (s - 1)):
                                    diff -= (1 << s) - 1
                                preds[ci] += diff
                                zz[0] = preds[ci]
                                k = 1
                                while k <= 63:
                                    rs = br.symbol(ac_dec)
                                    r, s = rs >> 4, rs & 0xF
                                    if s == 0:
                                        if r == 15:  # ZRL
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError(
                                            "AC run past block end")
                                    v = br.bits(s)
                                    if v < (1 << (s - 1)):
                                        v -= (1 << s) - 1
                                    zz[k] = v
                                    k += 1
            planes = []
            for ci, comp in enumerate(order):
                gy, gx = geo[ci]
                full = _reconstruct_plane(
                    zzs[ci], qts[comp["tq"]], gy, gx, gy * 8, gx * 8)
                if (comp["h"], comp["v"]) != (maxh, maxv):
                    full = np.repeat(
                        np.repeat(full, maxv // comp["v"], axis=0),
                        maxh // comp["h"], axis=1)
                planes.append(full[:h, :w])
            if len(planes) == 1:
                return planes[0].astype(np.uint8)
            if len(planes) == 3:
                return _ycbcr_to_rgb(*planes)
            raise ValueError(f"{len(planes)}-component scans unsupported")
        pos += ln


def parse_quant_tables(buf: bytes) -> dict[int, np.ndarray]:
    """Marker-walk a JPEG and return its quantization tables
    (id → row-major 64-int array) without entropy-decoding — the
    header-forensics path (quality probing, encoder fingerprinting)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    out: dict[int, np.ndarray] = {}
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        ln = struct.unpack(">H", buf[pos: pos + 2])[0]
        seg = buf[pos + 2: pos + ln]
        if marker == 0xDB:
            sp = 0
            while sp < len(seg):
                pq_, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq_ != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(
                    seg[sp + 1: sp + 65], np.uint8
                ).astype(np.int64)
                out[tq] = tab[UNZIGZAG]
                sp += 65
        elif marker == 0xDA:
            break  # headers end at the scan
        pos += ln
    return out


def probe_quality(buf: bytes) -> int:
    """Recover the conventional quality factor from a JPEG's stored
    luminance quantization table: the smallest q in 1..100 whose
    Annex-K scaling reproduces the stored table exactly (scales are
    injective across the two quality regimes, so a match is the
    encoder's q).  Returns -1 if no q matches (foreign quant tables)."""
    tabs = parse_quant_tables(buf)
    if 0 not in tabs:
        return -1
    stored = tabs[0]
    for q in range(1, 101):
        lum, _ = quality_tables(q)
        if np.array_equal(lum, stored):
            return q
    return -1
