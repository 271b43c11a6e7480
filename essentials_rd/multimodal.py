"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with actor-pool decode / feature-extract / resize /
frame-sample stages.

The real decode kernels need codec libraries (Pillow, ffmpeg, torchcodec)
that are NOT in this container, so the decode step is STUBBED: pass
``decoder="fake"`` (default) for a deterministic, seed-free fake decoder
that derives pixel/sample statistics from a hash of the payload bytes —
the Ray-side plumbing (schema, batch sizing, actor signature, zero-copy
binary handling, output layout) is real and tested, and swapping in a
real codec is a one-method change (``_decode_real`` raises
NotImplementedError until then).

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
        raise NotImplementedError(
            "real media decode requires codec libraries not present in "
            "this environment; use decoder='fake' for the plumbing path"
        )

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
            else:
                px = self._decode_real(buf, str(batch.column("format")[i]))
            feats[i] = px
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
