"""Multimodal (opaque binary) column plumbing — decode stages for image/audio.

The engine treats media exactly as it treats ``html``: an opaque ``binary``
column with typed metadata, transformed by actor-pool ``map_batches`` stages.
``require_real=True`` decodes for REAL: PNG and WAV need no optional deps
(``functions.codecs`` is a pure-stdlib decoder pair); PIL / soundfile extend
coverage to other formats when installed, and undecodable payloads fail
loudly. ``require_real=False`` keeps the deterministic hash/byte-derived
stub — useful for exercising the Ray-side contract (schema, small batch
sizes for wide binary rows, actor signatures, zero-copy Arrow access) on
arbitrary junk bytes.

Scale notes: binary payloads dominate block size — callers should read with
``columns=`` pruning and pass a small ``batch_size`` (e.g. 64) so
batch x concurrency stays inside the worker heap; Arrow keeps the payload
zero-copy from the object store (never convert these columns to pandas).
The stub feature paths are vectorized over the Arrow buffers directly (no
per-row Python over payload bytes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64

try:  # pragma: no cover - not installed in this container
    from PIL import Image

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # pragma: no cover - not installed in this container
    import soundfile

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

_BIG = 1 << 40  # explicit stop for binary_slice (it requires one)


def _as_binary_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def _flat_bytes(col: pa.Array):
    """Zero-copy (data, start_offsets, lengths) view of a binary column."""
    col = col.cast(pa.large_binary()) if pa.types.is_binary(col.type) else col
    if not pa.types.is_large_binary(col.type):
        col = col.cast(pa.large_binary())
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8) if col.buffers()[2] else np.empty(0, np.uint8)
    return data, offsets[:-1], np.diff(offsets)


class ImageFeatures:
    """Actor-pool callable: binary image -> (width, height, feature vector).

    ``require_real=True``: REAL decode — PNG via the pure-stdlib
    ``functions.codecs`` decoder (PIL for other formats when installed);
    true dimensions plus a mean-pooled 4x4 grayscale grid feature.
    ``require_real=False``: deterministic hash-derived fake for arbitrary
    bytes (vectorized — only the first 64 payload bytes are touched).
    """

    FEATURE_DIM = 16

    def __init__(self, bin_col: str = "payload", require_real: bool = False):
        self.bin_col = bin_col
        # real decode needs no optional deps for PNG (functions.codecs is a
        # pure-stdlib decoder); PIL extends coverage to other formats when
        # installed. Undecodable payloads fail loudly in real mode.
        self.real = require_real

    def _real_decode(self, col: pa.Array):
        import io

        from ..functions.codecs import PNG_MAGIC, decode_png

        widths = np.empty(len(col), dtype=np.int32)
        heights = np.empty(len(col), dtype=np.int32)
        feats = np.zeros((len(col), self.FEATURE_DIM), dtype=np.float32)
        g = int(np.sqrt(self.FEATURE_DIM))
        bufs = col.to_pylist()  # one loop per IMAGE (decode is per-payload by
        # nature); all pixel math inside is numpy/zlib, no per-pixel Python
        for i, buf in enumerate(bufs):
            buf = buf or b""
            if buf[:8] == PNG_MAGIC:
                img = decode_png(buf)
                if img.ndim == 3:
                    # color channels only: 2 channels is gray+alpha (color
                    # type 4) — averaging alpha into luminance would corrupt
                    # the feature; 3/4 channels use the plain RGB mean (the
                    # engine's documented gray formula, also applied on the
                    # PIL limb below so both paths agree)
                    nch = 1 if img.shape[2] == 2 else 3
                    gray = img[..., :nch].mean(axis=2).astype(np.float64)
                else:
                    gray = img.astype(np.float64)
            elif _HAVE_PIL:  # pragma: no cover - PIL not in this container
                pim = Image.open(io.BytesIO(buf)).convert("RGB")
                gray = np.asarray(pim, dtype=np.float64).mean(axis=2)
            else:
                raise ValueError(
                    f"cannot decode image payload (row {i}): not PNG and PIL unavailable"
                )
            h0, w0 = gray.shape
            widths[i], heights[i] = w0, h0
            # mean-pool to a g x g grid via bin-index scatter-add
            yb = np.arange(h0, dtype=np.int64) * g // h0
            xb = np.arange(w0, dtype=np.int64) * g // w0
            grid = np.zeros((g, g))
            cnt = np.zeros((g, g))
            np.add.at(grid, (yb[:, None], xb[None, :]), gray)
            np.add.at(cnt, (yb[:, None], xb[None, :]), 1.0)
            feats[i] = (grid / np.maximum(cnt, 1.0)).ravel() / 255.0
        return widths, heights, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _as_binary_array(batch[self.bin_col])
        n = len(col)
        if self.real:
            widths, heights, feats = self._real_decode(col)
        else:
            # deterministic stub: hash of the first 64 payload bytes drives
            # pseudo-dims and a 16-dim feature — all vectorized
            heads = pc.binary_slice(col, 0, 64).to_pylist()
            h = hash64([x or b"" for x in heads])
            widths = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
            heights = ((h >> np.uint64(11)) % np.uint64(1080) + np.uint64(16)).astype(np.int32)
            mults = (np.arange(self.FEATURE_DIM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)) * np.uint64(
                0x9E3779B97F4A7C15
            )
            mixed = h[:, None] * mults[None, :]
            feats = (((mixed >> np.uint64(24)) & np.uint64(0xFFFF)).astype(np.float32) / 65535.0) - 0.5
        feat = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.FEATURE_DIM
        )
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("image_feat", feat)
        )


class FrameSampler:
    """Actor-pool callable: binary "video" -> k deterministic frame offsets.

    Real frame decode is stubbed (no av libs); offset selection — the part
    that matters for batch layout — is real: evenly spaced byte offsets,
    vectorized from the Arrow length buffer.
    """

    def __init__(self, bin_col: str = "payload", k: int = 4):
        self.bin_col = bin_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _as_binary_array(batch[self.bin_col])
        sizes = pc.binary_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        frac = np.linspace(0.0, 1.0, self.k)
        offs = (np.maximum(sizes - 1, 0)[:, None] * frac[None, :]).astype(np.int64)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(offs.ravel(), pa.int64()), self.k)
        return batch.append_column("frame_offsets", arr)


def image_pipeline(ds, bin_col: str = "payload", concurrency=(1, 4), batch_size: int = 64,
                   require_real: bool = False):
    """Standard decode stage wiring: small batches, actor pool, arrow-only."""
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"bin_col": bin_col, "require_real": require_real},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeatures:
    """Actor-pool callable: binary audio -> (n_samples, k-bin energy profile).

    ``require_real=True``: REAL decode — WAV via the stdlib ``wave`` decoder
    in ``functions.codecs`` (soundfile for other formats when installed);
    RMS energy over true samples. ``require_real=False``:
    the profile is computed over the RAW bytes in k equal windows — one
    vectorized ``np.add.reduceat`` over the column's flat Arrow data buffer,
    no per-row Python.
    """

    BINS = 8

    def __init__(self, bin_col: str = "payload", require_real: bool = False):
        self.bin_col = bin_col
        # WAV decodes with the pure-stdlib functions.codecs decoder;
        # soundfile extends coverage to other formats when installed
        self.real = require_real

    def _real_decode(self, col: pa.Array):
        import io

        from ..functions.codecs import WAV_MAGIC, decode_wav

        n = len(col)
        feats = np.zeros((n, self.BINS), dtype=np.float32)
        sizes = np.zeros(n, dtype=np.int64)
        for i in range(n):
            buf = col[i].as_py() or b""
            if buf[:4] == WAV_MAGIC:
                samples, _sr = decode_wav(buf)
            elif _HAVE_SOUNDFILE:  # pragma: no cover - not in this container
                samples, _sr = soundfile.read(io.BytesIO(buf), dtype="float32")
            else:
                raise ValueError(
                    f"cannot decode audio payload (row {i}): not WAV and soundfile unavailable"
                )
            if samples.ndim > 1:
                samples = samples.mean(axis=1)
            sizes[i] = len(samples)
            bounds = np.linspace(0, len(samples), self.BINS + 1).astype(np.int64)
            for j in range(self.BINS):
                seg = samples[bounds[j] : bounds[j + 1]]
                feats[i, j] = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
        return sizes, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _as_binary_array(batch[self.bin_col])
        n = len(col)
        if self.real:
            sizes, feats = self._real_decode(col)
        else:
            data, starts, sizes = _flat_bytes(col)
            end = int(starts[-1] + sizes[-1]) if n else 0
            sq = data[:end].astype(np.float32) ** 2  # trim buffer slack past the last row
            # per-row k-bin boundaries into the flat buffer; rows are
            # consecutive so the flattened boundary list is monotonic
            frac = np.linspace(0.0, 1.0, self.BINS + 1)
            bounds = (starts[:, None] + sizes[:, None] * frac[None, :]).astype(np.int64)
            lo = bounds[:, :-1].ravel()
            hi = bounds[:, 1:].ravel()
            counts = (hi - lo).astype(np.float32)
            if len(sq):
                sums = np.add.reduceat(sq, np.minimum(lo, len(sq) - 1))
                sums[counts.ravel() == 0] = 0.0
            else:
                sums = np.zeros(len(lo), dtype=np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                feats = np.sqrt(sums / np.maximum(counts, 1.0)).reshape(n, self.BINS).astype(np.float32)
        feat = pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel(), pa.float32()), self.BINS)
        return (
            batch.append_column("n_bytes", pa.array(np.asarray(sizes, dtype=np.int64), pa.int64()))
            .append_column("audio_energy", feat)
        )


def resize_images(ds, bin_col: str = "payload", width: int = 224, height: int = 224,
                  concurrency=(1, 4), batch_size: int = 64):
    """Resize stage wiring (decode+resize stubbed behind ImageFeatures'
    pseudo-dims): emits the target (width, height) plus the feature column —
    the schema/batch contract a real resize stage satisfies."""

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column(
            "resized_to", pa.array([[width, height]] * n, pa.list_(pa.int32(), 2))
        )

    return image_pipeline(ds, bin_col=bin_col, concurrency=concurrency, batch_size=batch_size).map_batches(
        tag, batch_format="pyarrow"
    )
