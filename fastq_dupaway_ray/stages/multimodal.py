"""Multimodal (opaque binary) column plumbing — decode stages for image/audio.

The engine treats media exactly as it treats ``html``: an opaque ``binary``
column with typed metadata, transformed by actor-pool ``map_batches`` stages.
Real decode paths exist behind optional imports (PIL for images, soundfile
for audio — neither ships in this container); without the libs a
clearly-marked deterministic stub computes hash/byte-derived features so the
Ray-side contract — schema, small batch sizes for wide binary rows, actor
signatures, zero-copy Arrow access — is fully exercised end-to-end. Pass
``require_real=True`` to fail loudly instead of faking.

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

    With PIL available (and ``require_real=True``) images are decoded for
    real: true dimensions plus a mean-pooled 4x4 grayscale grid feature.
    Without it, a deterministic hash-derived fake keeps the pipeline shape
    testable (vectorized — only the first 64 payload bytes are touched).
    """

    FEATURE_DIM = 16

    def __init__(self, bin_col: str = "payload", require_real: bool = False):
        self.bin_col = bin_col
        if require_real and not _HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, which is not available here; "
                "run with require_real=False for the deterministic stub"
            )
        self.real = _HAVE_PIL and require_real

    def _real_decode(self, col: pa.Array):  # pragma: no cover - needs PIL
        import io

        widths = np.empty(len(col), dtype=np.int32)
        heights = np.empty(len(col), dtype=np.int32)
        feats = np.zeros((len(col), self.FEATURE_DIM), dtype=np.float32)
        g = int(np.sqrt(self.FEATURE_DIM))
        for i in range(len(col)):
            img = Image.open(io.BytesIO(col[i].as_py())).convert("L")
            widths[i], heights[i] = img.size
            small = np.asarray(img.resize((g, g)), dtype=np.float32) / 255.0
            feats[i] = small.ravel()
        return widths, heights, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = _as_binary_array(batch[self.bin_col])
        n = len(col)
        if self.real:  # pragma: no cover - needs PIL
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


def image_pipeline(ds, bin_col: str = "payload", concurrency=(1, 4), batch_size: int = 64):
    """Standard decode stage wiring: small batches, actor pool, arrow-only."""
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"bin_col": bin_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeatures:
    """Actor-pool callable: binary audio -> (n_samples, k-bin energy profile).

    With soundfile available (and ``require_real=True``) the payload is
    decoded and an RMS energy profile computed over real samples. Without it,
    the profile is computed over the RAW bytes in k equal windows — one
    vectorized ``np.add.reduceat`` over the column's flat Arrow data buffer,
    no per-row Python.
    """

    BINS = 8

    def __init__(self, bin_col: str = "payload", require_real: bool = False):
        self.bin_col = bin_col
        if require_real and not _HAVE_SOUNDFILE:
            raise NotImplementedError(
                "real audio decode requires soundfile, which is not available here; "
                "run with require_real=False for the byte-window stub"
            )
        self.real = _HAVE_SOUNDFILE and require_real

    def _real_decode(self, col: pa.Array):  # pragma: no cover - needs soundfile
        import io

        n = len(col)
        feats = np.zeros((n, self.BINS), dtype=np.float32)
        sizes = np.zeros(n, dtype=np.int64)
        for i in range(n):
            samples, _sr = soundfile.read(io.BytesIO(col[i].as_py()), dtype="float32")
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
        if self.real:  # pragma: no cover - needs soundfile
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
