"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with actor-pool decode / feature-extract / resize /
frame-sample stages.

Decode is REAL for the lib-free uncompressed formats — binary netpbm
images (P6 PPM color / P5 PGM grayscale) and RIFF WAV PCM16 mono audio
decode in pure NumPy (``decode_netpbm`` / ``decode_wav_pcm16``), with
matching encoders so tests pin exact round trips — and REAL for
baseline JPEG via the pure-NumPy T.81 codec in ``jpegc`` (markers,
canonical Huffman entropy coding, dequant + IDCT; see that module's
exactness contract), and REAL for PNG via the RFC-2083 codec in
``pngc`` (chunk CRCs, stdlib-zlib inflate, the five scanline
defilters).  The remaining compressed formats (mp3/mp4)
need codec libraries (ffmpeg) that are NOT
in this container, so for those the decode step stays STUBBED: pass
``decoder="fake"`` for a deterministic, seed-free fake decoder that
derives pixel/sample statistics from a hash of the payload bytes — the
Ray-side plumbing (schema, batch sizing, actor signature, zero-copy
binary handling, output layout) is identical either way, and swapping a
real codec in is a one-branch change in ``_decode_real``.

Design notes for 100 TB:
- media payloads are LARGE (MBs/row): stages run with small
  ``batch_size`` (default 16) so batch × concurrency fits worker heap,
  and Arrow ``large_binary`` avoids 2 GB offset overflow in a block;
- decode models/codec contexts load once per actor (``__init__``), not
  per batch — the actor-pool pattern (SURVEY.md §2.5);
- outputs carry fixed-size feature vectors / thumbnails, orders of
  magnitude smaller than inputs, so downstream stages re-batch freely.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("format", pa.string()),  # e.g. "png", "wav", "mp4"
        ("width", pa.int32()),  # images/video; -1 if unknown
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio; -1 otherwise
        ("n_frames", pa.int32()),  # video; -1 otherwise
    ]
)


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded bytes) for
    tests/benches — no external data, no ambient randomness."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, 4096 + 64 * i, dtype=np.uint8).tobytes()
                for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "format": pa.array(["png" if kind == "image" else "wav"] * n),
            "width": pa.array(np.full(n, 64, np.int32), pa.int32()),
            "height": pa.array(np.full(n, 48, np.int32), pa.int32()),
            "sample_rate": pa.array(
                np.full(n, 16000 if kind == "audio" else -1, np.int32), pa.int32()
            ),
            "n_frames": pa.array(
                np.full(n, 30 if kind == "video" else -1, np.int32), pa.int32()
            ),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Real lib-free codecs: binary netpbm (P5/P6) and RIFF WAV PCM16 mono.
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 array."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    assert px.ndim == 3 and px.shape[2] == 3, "PPM needs (h, w, 3)"
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """Binary PGM (P5, maxval 255) from an (h, w) uint8 array."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    assert px.ndim == 2, "PGM needs (h, w)"
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_netpbm(buf: bytes) -> np.ndarray:
    """Decode binary netpbm bytes: P6 → (h, w, 3) uint8, P5 → (h, w).

    A real parser per the netpbm spec: header tokens (width, height,
    maxval) are whitespace-separated with ``#``-to-newline comments
    allowed between them; exactly one whitespace byte follows maxval,
    then the raw raster.  Raises ValueError on anything malformed —
    wrong magic, maxval ≠ 255 (the 2-byte-sample variant is out of
    scope), or a truncated raster.
    """
    if len(buf) < 2 or buf[0:1] != b"P" or buf[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary netpbm payload (P5/P6)")
    channels = 3 if buf[1:2] == b"6" else 1
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(buf) and buf[pos] in b" \t\r\n":
            pos += 1
        if pos >= len(buf):
            raise ValueError("truncated netpbm header")
        if buf[pos] in b"#":
            while pos < len(buf) and buf[pos] not in b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and buf[pos] not in b" \t\r\n#":
            pos += 1
        tok = buf[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad netpbm header token {tok!r}")
        toks.append(int(tok))
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    pos += 1  # exactly one whitespace byte after maxval
    n = w * h * channels
    raster = buf[pos:pos + n]
    if len(raster) != n:
        raise ValueError(f"netpbm raster truncated: {len(raster)} != {n}")
    arr = np.frombuffer(raster, np.uint8)
    return arr.reshape(h, w, 3) if channels == 3 else arr.reshape(h, w)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """RIFF WAV, PCM16 mono, from a 1-D int16 array."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    assert s.ndim == 1, "mono PCM needs a 1-D array"
    data = s.tobytes()
    fmt = (
        np.array([1, 1], np.uint16).tobytes()           # PCM, 1 channel
        + np.array([sample_rate, sample_rate * 2], np.uint32).tobytes()
        + np.array([2, 16], np.uint16).tobytes()        # block align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + np.uint32(len(fmt)).tobytes() + fmt
        + b"data" + np.uint32(len(data)).tobytes() + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + np.uint32(len(body)).tobytes() + body


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF WAV PCM16 mono → (int16 samples, sample_rate).

    Walks the chunk list (chunks are even-padded per RIFF) rather than
    assuming a fixed layout, so encoders that emit extra chunks (LIST,
    fact) still parse.  Raises ValueError for non-PCM, non-16-bit,
    non-mono or truncated payloads.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = int(np.frombuffer(buf[pos + 4:pos + 8], np.uint32)[0])
        chunk = buf[pos + 8:pos + 8 + size]
        if len(chunk) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, nch = np.frombuffer(chunk[0:4], np.uint16)
            rate = int(np.frombuffer(chunk[4:8], np.uint32)[0])
            bits = int(np.frombuffer(chunk[14:16], np.uint16)[0])
            if audio_fmt != 1:
                raise ValueError(f"not PCM (format {audio_fmt})")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16 or int(nch) != 1:
        raise ValueError(f"unsupported WAV: {bits}-bit, {nch} channel(s)")
    return np.frombuffer(data, np.int16), rate


# Deterministic coded-media factory: value stream j of media i is
# splitmix64(i·2³² + j + seed·golden) folded to the sample domain — a
# pure function of (media_id, j), so the DuckDB oracle replays the
# exact pixel/sample stream via the shared _sm64_ctes chain without
# ever parsing a payload, and the query certifies encode→decode is
# bit-exact end to end.
_MEDIA_ID_SHIFT = np.uint64(1) << np.uint64(32)


def _coded_values(media_id: int, n: int, seed: int) -> np.ndarray:
    from .util import hash64, _GOLDEN

    with np.errstate(over="ignore"):
        key = (
            np.uint64(media_id) * _MEDIA_ID_SHIFT
            + np.arange(n, dtype=np.uint64)
            + np.uint64(seed) * _GOLDEN
        )
    return hash64(key)


def coded_img_dims(i: int) -> tuple[int, int]:
    """(w, h) of coded image i — small closed forms the SQL twin repeats."""
    return 12 + (i % 5) * 2, 8 + (i % 3) * 3


def coded_wav_params(i: int) -> tuple[int, int]:
    """(n_samples, sample_rate) of coded wav i."""
    return 400 + 61 * (i % 7), 8000 + 4000 * (i % 3)


def synth_coded_media(n: int, kind: str = "image", seed: int = 7) -> pa.Table:
    """n REAL-encoded media rows (PPM images or WAV audio) whose decoded
    value stream is the splitmix64 chain above — test/oracle fixture."""
    rows = []
    for i in range(n):
        if kind == "image":
            w, h = coded_img_dims(i)
            px = (_coded_values(i, w * h * 3, seed) % np.uint64(256)).astype(
                np.uint8
            )
            rows.append((encode_ppm(px.reshape(h, w, 3)), "ppm", w, h, -1))
        else:
            ns, rate = coded_wav_params(i)
            s = (
                _coded_values(i, ns, seed) % np.uint64(65536)
            ).astype(np.int64) - 32768
            rows.append((encode_wav_pcm16(s.astype(np.int16), rate),
                         "wav", -1, -1, rate))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array([r[0] for r in rows], pa.large_binary()),
            "format": pa.array([r[1] for r in rows], pa.string()),
            "width": pa.array([r[2] for r in rows], pa.int32()),
            "height": pa.array([r[3] for r in rows], pa.int32()),
            "sample_rate": pa.array([r[4] for r in rows], pa.int32()),
            "n_frames": pa.array([-1] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _payload_digest_floats(payload: bytes, k: int) -> np.ndarray:
    """Deterministic pseudo-decode: k floats in [0,1) from the payload's
    sha256 stream (same bytes → same 'pixels', any bytes accepted)."""
    out = np.empty(k, np.float64)
    h = hashlib.sha256(payload).digest()
    buf = b""
    while len(buf) < 8 * k:
        h = hashlib.sha256(h).digest()
        buf += h
    arr = np.frombuffer(buf[: 8 * k], dtype=np.uint64)
    out[:] = arr / float(2**64)
    return out


class DecodeFeatureStage:
    """Actor-pool stage: decode each media payload and emit a fixed-size
    feature vector + basic stats.  ``decoder="fake"`` (deterministic
    stub) or ``"real"`` (NotImplementedError until codec libs exist).

    Use as::

        media.map_batches(DecodeFeatureStage,
                          fn_constructor_kwargs={"feature_dim": 64},
                          batch_format="pyarrow", batch_size=16,
                          concurrency=(1, 8), num_cpus=1)
    """

    def __init__(self, feature_dim: int = 64, decoder: str = "fake"):
        # once-per-actor setup: a real impl loads the codec/model here
        assert decoder in ("fake", "real")
        self.k = int(feature_dim)
        self.decoder = decoder

    def _decode_real(self, payload: bytes, fmt: str) -> np.ndarray:
        """Decode to a flat float array in [0, 1).  Real for the
        lib-free formats (ppm/pgm/wav); compressed formats need codec
        libraries absent from this container."""
        if fmt in ("ppm", "pgm"):
            return decode_netpbm(payload).ravel() / 256.0
        if fmt == "wav":
            samples, _ = decode_wav_pcm16(payload)
            return (samples.astype(np.float64) + 32768.0) / 65536.0
        if fmt in ("jpg", "jpeg"):
            from .jpegc import decode_jpeg

            return decode_jpeg(payload).ravel() / 256.0
        if fmt == "png":
            from .pngc import decode_png

            return decode_png(payload).astype(np.float64).ravel() / 256.0
        raise NotImplementedError(
            f"decoding {fmt!r} requires codec libraries not present in "
            "this environment (ppm/pgm/wav/jpeg/png decode natively; use "
            "decoder='fake' for the plumbing path otherwise)"
        )

    def _pool(self, vals: np.ndarray) -> np.ndarray:
        """Mean-pool an arbitrary-length value stream into k features
        (contiguous nearly-equal bins; short streams tile first)."""
        if len(vals) < self.k:
            vals = np.tile(vals, -(-self.k // len(vals)))[: self.k]
        bounds = (np.arange(self.k, dtype=np.int64) * len(vals)) // self.k
        sums = np.add.reduceat(vals, bounds)
        counts = np.diff(np.append(bounds, len(vals)))
        return sums / counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        n = batch.num_rows
        feats = np.empty((n, self.k))
        means = np.empty(n)
        stds = np.empty(n)
        sizes = np.empty(n, np.int64)
        for i in range(n):  # per ROW is unavoidable: codecs are per-file
            buf = payloads[i].as_py()
            sizes[i] = len(buf)
            if self.decoder == "fake":
                px = _payload_digest_floats(buf, self.k)
                feats[i] = px
            else:
                px = self._decode_real(buf, str(batch.column("format")[i]))
                feats[i] = self._pool(px)
            means[i] = float(px.mean())
            stds[i] = float(px.std())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload_bytes": pa.array(sizes, pa.int64()),
                "feature": pa.array(feats.tolist(), pa.list_(pa.float64())),
                "mean": pa.array(means, pa.float64()),
                "std": pa.array(stds, pa.float64()),
            }
        )


class ResizeStage:
    """Actor-pool stage: thumbnail/resize for images (stubbed decode —
    emits a deterministic (out_w × out_h) grid derived from the payload
    digest; a real impl swaps the grid for actual resampled pixels)."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = int(out_w), int(out_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.out_w * self.out_h
        payloads = batch.column("payload")
        thumbs = [
            _payload_digest_floats(payloads[i].as_py(), k).tolist()
            for i in range(batch.num_rows)
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(
                    np.full(batch.num_rows, self.out_w, np.int32), pa.int32()
                ),
                "height": pa.array(
                    np.full(batch.num_rows, self.out_h, np.int32), pa.int32()
                ),
                "thumb": pa.array(thumbs, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: sample ``every_k``-th frame index from videos
    (metadata-only — real frame extraction is codec work; the emitted
    (media_id, frame_idx) rows are the scale-correct fan-out shape)."""

    def __init__(self, every_k: int = 10):
        self.every_k = int(every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        nf = batch.column("n_frames").to_numpy()
        nf = np.maximum(nf, 0)
        counts = (nf + self.every_k - 1) // self.every_k
        rep = np.repeat(np.arange(len(ids)), counts)
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int32()),
                }
            )
        starts = np.zeros(len(ids), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        local = np.arange(total) - starts[rep]
        return pa.table(
            {
                "media_id": pa.array(ids[rep], pa.int64()),
                "frame_idx": pa.array((local * self.every_k).astype(np.int32),
                                      pa.int32()),
            }
        )


class MediaStatsStage:
    """Actor-pool stage: REAL-decode each payload (netpbm image or WAV
    PCM16 audio) and emit exact integer stats over the decoded value
    stream — (count, sum, min, max) as int64 — the oracle-checkable
    face of the decode path.  Pixel domain is [0, 256); audio domain is
    [-32768, 32768).  Per-row iteration is inherent (codecs are
    per-file); every stat is a NumPy fold over the decoded array."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        fmts = batch.column("format").to_pylist()
        n = batch.num_rows
        nv = np.empty(n, np.int64)
        vsum = np.empty(n, np.int64)
        vmin = np.empty(n, np.int64)
        vmax = np.empty(n, np.int64)
        rates = np.full(n, -1, np.int64)
        for i in range(n):
            buf = payloads[i].as_py()
            if fmts[i] in ("ppm", "pgm"):
                vals = decode_netpbm(buf).ravel().astype(np.int64)
            elif fmts[i] == "wav":
                s, rates[i] = decode_wav_pcm16(buf)
                vals = s.astype(np.int64)
            else:
                raise NotImplementedError(f"no native codec for {fmts[i]!r}")
            nv[i] = len(vals)
            vsum[i] = int(vals.sum())
            vmin[i] = int(vals.min())
            vmax[i] = int(vals.max())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_vals": pa.array(nv, pa.int64()),
                "val_sum": pa.array(vsum, pa.int64()),
                "val_min": pa.array(vmin, pa.int64()),
                "val_max": pa.array(vmax, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
            }
        )


def media_stats(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 16
) -> rd.Dataset:
    """Real decode → exact integer stats, actor-pool sized for large
    binary payloads (small batches × bounded concurrency)."""
    return media.map_batches(
        MediaStatsStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


def decode_features(
    media: rd.Dataset,
    feature_dim: int = 64,
    concurrency: int = 8,
    batch_size: int = 16,
) -> rd.Dataset:
    """The full decode→feature pipeline stage with scale-aware sizing."""
    return media.map_batches(
        DecodeFeatureStage,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


class ResizeStatsStage:
    """Actor-pool stage: REAL-decode each netpbm payload, downsample
    2× by nearest neighbor (keep every even row/column — exactly the
    floor-index rule floor(r·H/ceil(H/2)) reduces to at factor 2), and
    emit exact integer stats over the RESIZED pixel stream plus the
    output dims — the decode→transform→stat shape every image
    preprocessing pipeline runs, with the transform itself
    oracle-checkable because the kept pixels are a pure index subset
    of the coded stream."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        n = batch.num_rows
        ow = np.empty(n, np.int64)
        oh = np.empty(n, np.int64)
        nv = np.empty(n, np.int64)
        vsum = np.empty(n, np.int64)
        vmin = np.empty(n, np.int64)
        vmax = np.empty(n, np.int64)
        for i in range(n):
            img = decode_netpbm(payloads[i].as_py())
            small = img[::2, ::2, :]
            vals = small.ravel().astype(np.int64)
            oh[i], ow[i] = small.shape[0], small.shape[1]
            nv[i] = len(vals)
            vsum[i] = int(vals.sum())
            vmin[i] = int(vals.min())
            vmax[i] = int(vals.max())
        return pa.table({
            "media_id": batch.column("media_id"),
            "out_w": pa.array(ow, pa.int64()),
            "out_h": pa.array(oh, pa.int64()),
            "n_vals": pa.array(nv, pa.int64()),
            "val_sum": pa.array(vsum, pa.int64()),
            "val_min": pa.array(vmin, pa.int64()),
            "val_max": pa.array(vmax, pa.int64()),
        })


def media_resize(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 16
) -> rd.Dataset:
    """Real decode → 2× nearest-neighbor downsample → exact stats."""
    return media.map_batches(
        ResizeStatsStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


class WavFeatureStage:
    """Actor-pool stage: REAL WAV PCM16 decode → time-domain feature
    extraction — zero-crossing count (adjacent sample product < 0, the
    classic voiced/unvoiced + pitch proxy) and absolute peak — exact
    integers over the decoded stream."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        n = batch.num_rows
        zc = np.empty(n, np.int64)
        pk = np.empty(n, np.int64)
        ns = np.empty(n, np.int64)
        for i in range(n):
            s, _rate = decode_wav_pcm16(payloads[i].as_py())
            s = s.astype(np.int64)
            zc[i] = int((s[:-1] * s[1:] < 0).sum())
            pk[i] = int(np.abs(s).max())
            ns[i] = len(s)
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_samples": pa.array(ns, pa.int64()),
            "zero_crossings": pa.array(zc, pa.int64()),
            "abs_peak": pa.array(pk, pa.int64()),
        })


def wav_features(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 16
) -> rd.Dataset:
    """Real decode → time-domain audio features, actor-pool sized."""
    return media.map_batches(
        WavFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


class SobelStage:
    """Actor-pool stage: REAL-decode each netpbm payload and run an
    integer Sobel edge detector over the luma plane — the first real
    CONVOLUTION through the media path (decode → pointwise luma →
    3×3 stencil → stat), all exact int64 so the result is
    oracle-checkable bit-for-bit.  luma = r + 2g + b (integer BT.601
    shape without the float weights); Gx/Gy are the classic Sobel
    kernels evaluated on interior pixels only (no padding invented at
    the border), and the per-image stats are over |Gx| + |Gy|."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        n = batch.num_rows
        ni = np.empty(n, np.int64)
        gs = np.empty(n, np.int64)
        gm = np.empty(n, np.int64)
        for i in range(n):
            img = decode_netpbm(payloads[i].as_py()).astype(np.int64)
            lum = img[:, :, 0] + 2 * img[:, :, 1] + img[:, :, 2]
            gx = ((lum[:-2, 2:] - lum[:-2, :-2])
                  + 2 * (lum[1:-1, 2:] - lum[1:-1, :-2])
                  + (lum[2:, 2:] - lum[2:, :-2]))
            gy = ((lum[2:, :-2] - lum[:-2, :-2])
                  + 2 * (lum[2:, 1:-1] - lum[:-2, 1:-1])
                  + (lum[2:, 2:] - lum[:-2, 2:]))
            grad = np.abs(gx) + np.abs(gy)
            ni[i] = grad.size
            gs[i] = int(grad.sum())
            gm[i] = int(grad.max()) if grad.size else 0
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_interior": pa.array(ni, pa.int64()),
            "grad_sum": pa.array(gs, pa.int64()),
            "grad_max": pa.array(gm, pa.int64()),
        })


def media_sobel(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 16
) -> rd.Dataset:
    """Real decode → integer Sobel gradient stats per image."""
    return media.map_batches(
        SobelStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


class HadamardStage:
    """Actor-pool stage: REAL WAV PCM16 decode → Walsh–Hadamard
    transform of the first 64 samples — a real ±1 spectral transform
    that stays EXACT integer end to end (unlike a float DFT), so the
    sequency-band energy split is oracle-reproducible.  The 64×64
    sign matrix H[k,j] = (−1)^popcount(k & j) is built ONCE per actor
    in __init__ (stateful setup, vectorized bit-parity), and each
    clip's coefficients are one int64 matvec.  Emits the DC
    coefficient plus low-sequency (k < 32) and high-sequency
    (k ≥ 32) energies."""

    WHT_N = 64

    def __init__(self) -> None:
        n = self.WHT_N
        k = np.arange(n, dtype=np.int64)
        x = k[:, None] & k[None, :]
        par = np.zeros_like(x)
        b = 1
        while b < n:
            par ^= (x // b) & 1
            b <<= 1
        self.H = (1 - 2 * par).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        n = batch.num_rows
        dc = np.empty(n, np.int64)
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        for i in range(n):
            s, _rate = decode_wav_pcm16(payloads[i].as_py())
            s = s[: self.WHT_N].astype(np.int64)
            if len(s) < self.WHT_N:
                s = np.pad(s, (0, self.WHT_N - len(s)))
            c = self.H @ s
            dc[i] = int(c[0])
            e = c * c
            lo[i] = int(e[: self.WHT_N // 2].sum())
            hi[i] = int(e[self.WHT_N // 2:].sum())
        return pa.table({
            "media_id": batch.column("media_id"),
            "dc": pa.array(dc, pa.int64()),
            "e_low": pa.array(lo, pa.int64()),
            "e_high": pa.array(hi, pa.int64()),
        })


def wav_hadamard(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 16
) -> rd.Dataset:
    """Real decode → exact integer Walsh–Hadamard sequency energies."""
    return media.map_batches(
        HadamardStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


# ---------------------------------------------------------------- video

_RVID_MAGIC = b"RVID"


def encode_rawvid(frames: np.ndarray) -> bytes:
    """REAL (if homegrown) uncompressed video container: ``RVID`` magic
    + big-endian u32 (w, h, f) header + f frames of h×w×3 RGB bytes.
    Compressed containers (mp4 etc.) need codec libs absent here; this
    keeps the decode step genuinely byte-parsing real data."""
    import struct

    f, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return (_RVID_MAGIC + struct.pack(">III", w, h, f)
            + frames.tobytes())


def decode_rawvid(buf: bytes) -> np.ndarray:
    """Parse an RVID container → (f, h, w, 3) uint8 array."""
    import struct

    if buf[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    w, h, f = struct.unpack(">III", buf[4:16])
    if len(buf) < 16 + f * h * w * 3:
        raise ValueError("truncated RVID payload")
    body = np.frombuffer(buf, np.uint8, count=f * h * w * 3, offset=16)
    return body.reshape(f, h, w, 3)


def coded_vid_dims(i: int) -> tuple[int, int, int]:
    """(w, h, f) of coded video i — closed forms the SQL twin repeats."""
    return 8 + (i % 4) * 2, 6 + (i % 3) * 2, 4 + (i % 5)


def synth_coded_video(n: int, seed: int = 7) -> pa.Table:
    """n REAL-encoded RVID rows whose frame-major pixel stream is the
    shared splitmix64 chain — the video leg of synth_coded_media."""
    rows = []
    for i in range(n):
        w, h, f = coded_vid_dims(i)
        px = (_coded_values(i, f * h * w * 3, seed) % np.uint64(256)).astype(
            np.uint8
        )
        rows.append((encode_rawvid(px.reshape(f, h, w, 3)), w, h, f))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array([r[0] for r in rows], pa.large_binary()),
            "format": pa.array(["rvid"] * n, pa.string()),
            "width": pa.array([r[1] for r in rows], pa.int32()),
            "height": pa.array([r[2] for r in rows], pa.int32()),
            "sample_rate": pa.array([-1] * n, pa.int32()),
            "n_frames": pa.array([r[3] for r in rows], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class VideoMotionStage:
    """Actor-pool stage: REAL RVID decode → temporal-difference motion
    energy, the frame-to-frame |Δ| sum every shot-boundary / motion
    detector starts from — exact int64 over the decoded stream (first
    frame's value sum doubles as the static audit column)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        n = batch.num_rows
        nf = np.empty(n, np.int64)
        mo = np.empty(n, np.int64)
        f0 = np.empty(n, np.int64)
        for i in range(n):
            v = decode_rawvid(payloads[i].as_py()).astype(np.int64)
            nf[i] = v.shape[0]
            f0[i] = int(v[0].sum())
            mo[i] = int(np.abs(v[1:] - v[:-1]).sum()) if v.shape[0] > 1 else 0
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": pa.array(nf, pa.int64()),
            "motion_sum": pa.array(mo, pa.int64()),
            "frame0_sum": pa.array(f0, pa.int64()),
        })


def video_motion(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 16
) -> rd.Dataset:
    """Real container decode → exact temporal-difference motion energy."""
    return media.map_batches(
        VideoMotionStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


# ------------------------------------------------- baseline JPEG (jpegc)


def coded_jpeg_dims(i: int) -> tuple[int, int]:
    """(w, h) of coded JPEG i — closed forms the SQL twin repeats.
    Deliberately not multiples of 8 so edge-replication padding is
    exercised."""
    return 9 + (i % 5) * 7, 10 + (i % 4) * 9


def coded_jpeg_quality(i: int) -> int:
    return 35 + (i % 3) * 30


def synth_coded_jpeg(n: int, seed: int = 7) -> pa.Table:
    """n REAL baseline-JPEG rows (jpegc.encode_jpeg — pure-NumPy T.81
    encoder): pixels are the shared splitmix64 chain mod 256, grayscale
    for even ids / RGB for odd (4:2:0 chroma subsampling when
    i % 4 == 3, else 4:4:4 — both real-world modes exercised).  Each
    row carries the compressed payload, the encoder's exact expected
    reconstruction (the decoder contract — see jpegc docstring) and the
    coded-pixel sum the SQL twin replays through ``_sm64_ctes``."""
    from .jpegc import encode_jpeg

    rows = []
    for i in range(n):
        w, h = coded_jpeg_dims(i)
        ncomp = 1 if i % 2 == 0 else 3
        px = (_coded_values(i, w * h * ncomp, seed) % np.uint64(256)).astype(
            np.uint8
        )
        img = px.reshape((h, w) if ncomp == 1 else (h, w, ncomp))
        sub = "420" if i % 4 == 3 else "444"
        buf, expected = encode_jpeg(img, quality=coded_jpeg_quality(i),
                                    subsampling=sub)
        rows.append((i, "jpeg", w, h, ncomp, coded_jpeg_quality(i),
                     buf, expected.tobytes(), int(px.sum())))
    cols = list(zip(*rows)) if rows else [[]] * 9
    return pa.table({
        "media_id": pa.array(cols[0], pa.int64()),
        "format": pa.array(cols[1], pa.string()),
        "width": pa.array(cols[2], pa.int64()),
        "height": pa.array(cols[3], pa.int64()),
        "n_components": pa.array(cols[4], pa.int64()),
        "quality": pa.array(cols[5], pa.int64()),
        "payload": pa.array(cols[6], pa.binary()),
        "expected": pa.array(cols[7], pa.binary()),
        "coded_sum": pa.array(cols[8], pa.int64()),
    })


def coded_png_dims(i: int) -> tuple[int, int]:
    """(w, h) of coded PNG i — closed forms the SQL twin repeats."""
    return 6 + (i % 6) * 5, 7 + (i % 5) * 6


def coded_png_channels(i: int) -> int:
    """1 gray / 2 gray+alpha / 3 RGB / 4 RGBA, cycling — all four
    supported PNG color types exercised."""
    return 1 + (i % 4)


def synth_coded_png(n: int, seed: int = 7) -> pa.Table:
    """n REAL PNG rows (pngc.encode_png — chunk CRCs, stdlib-zlib
    deflate): pixels are the shared splitmix64 chain mod 256; zlib
    level cycles 0/6/9 so stored, fixed- and dynamic-Huffman deflate
    blocks are all exercised.  PNG is lossless, so the decode contract
    is equality with the ORIGINAL pixels (stronger than JPEG's shipped
    reconstruction) and the pixel sum the SQL twin replays through
    ``_sm64_ctes`` is the sum of the DECODED bytes."""
    from .pngc import encode_png

    rows = []
    for i in range(n):
        w, h = coded_png_dims(i)
        c = coded_png_channels(i)
        px = (_coded_values(i, w * h * c, seed) % np.uint64(256)).astype(
            np.uint8
        )
        img = px.reshape((h, w) if c == 1 else (h, w, c))
        buf = encode_png(img, level=(0, 6, 9)[i % 3])
        rows.append((i, "png", w, h, c, buf, px.tobytes(), int(px.sum())))
    cols = list(zip(*rows)) if rows else [[]] * 8
    return pa.table({
        "media_id": pa.array(cols[0], pa.int64()),
        "format": pa.array(cols[1], pa.string()),
        "width": pa.array(cols[2], pa.int64()),
        "height": pa.array(cols[3], pa.int64()),
        "n_channels": pa.array(cols[4], pa.int64()),
        "payload": pa.array(cols[5], pa.binary()),
        "expected": pa.array(cols[6], pa.binary()),
        "pixel_sum": pa.array(cols[7], pa.int64()),
    })


class PngVerifyStage:
    """Actor-pool stage: decode each payload with the real PNG decoder
    and ASSERT losslessness (decoded array bit-equal to the original
    pixels).  Emits header facts + the DECODED-pixel sum — the SQL twin
    replays that sum from the shared splitmix chain, so a silent decode
    corruption fails the oracle, not just the in-stage assert."""

    def __init__(self) -> None:
        from .pngc import decode_png  # import once per actor

        self._decode = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        got_w = np.empty(n, np.int64)
        got_h = np.empty(n, np.int64)
        got_c = np.empty(n, np.int64)
        dec_sum = np.empty(n, np.int64)
        payloads = batch.column("payload")
        expected = batch.column("expected")
        for i in range(n):  # per ROW is unavoidable: codecs are per-file
            img = self._decode(payloads[i].as_py())
            exp = np.frombuffer(expected[i].as_py(), np.uint8)
            if not np.array_equal(img.ravel(), exp):
                raise AssertionError(
                    f"PNG decode mismatch for media_id="
                    f"{batch.column('media_id')[i].as_py()}"
                )
            got_h[i] = img.shape[0]
            got_w[i] = img.shape[1]
            got_c[i] = 1 if img.ndim == 2 else img.shape[2]
            dec_sum[i] = int(img.sum(dtype=np.int64))
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array(got_w, pa.int64()),
            "height": pa.array(got_h, pa.int64()),
            "n_channels": pa.array(got_c, pa.int64()),
            "decoded_sum": pa.array(dec_sum, pa.int64()),
        })


def png_roundtrip(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 8
) -> rd.Dataset:
    """Real PNG decode + losslessness verification as an actor pool."""
    return media.map_batches(
        PngVerifyStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )


class JpegVerifyStage:
    """Actor-pool stage: decode each payload with the real pure-NumPy
    baseline-JPEG decoder and ASSERT the encoder's exactness contract
    (decoded array bit-equal to the shipped expected reconstruction —
    one wrong entropy bit scrambles every later block, so equality pins
    the whole Huffman/DCT round trip).  Emits the header facts + the
    decoded-pixel sum."""

    def __init__(self) -> None:
        from .jpegc import decode_jpeg  # import once per actor

        self._decode = decode_jpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        got_w = np.empty(n, np.int64)
        got_h = np.empty(n, np.int64)
        got_c = np.empty(n, np.int64)
        dec_sum = np.empty(n, np.int64)
        payloads = batch.column("payload")
        expected = batch.column("expected")
        for i in range(n):  # per ROW is unavoidable: codecs are per-file
            img = self._decode(payloads[i].as_py())
            exp = np.frombuffer(expected[i].as_py(), np.uint8)
            if not np.array_equal(img.ravel(), exp):
                raise AssertionError(
                    f"JPEG decode mismatch for media_id="
                    f"{batch.column('media_id')[i].as_py()}"
                )
            got_h[i] = img.shape[0]
            got_w[i] = img.shape[1]
            got_c[i] = 1 if img.ndim == 2 else img.shape[2]
            dec_sum[i] = int(img.sum(dtype=np.int64))
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array(got_w, pa.int64()),
            "height": pa.array(got_h, pa.int64()),
            "n_components": pa.array(got_c, pa.int64()),
            "quality": batch.column("quality"),
            "coded_sum": batch.column("coded_sum"),
        })


def jpeg_roundtrip(
    media: rd.Dataset, concurrency: int = 8, batch_size: int = 8
) -> rd.Dataset:
    """Real JPEG decode + contract verification as an actor-pool stage."""
    return media.map_batches(
        JpegVerifyStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        max_restarts=0,
    )
