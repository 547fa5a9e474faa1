"""Multimodal (opaque binary) column plumbing — decode stages for image/audio.

The engine treats media exactly as it treats ``html``: an opaque ``binary``
column with typed metadata, transformed by actor-pool ``map_batches`` stages.
The decode kernels themselves are STUBBED (no image/audio libs in this
container — guarded behind import-try); everything Ray-side is real and
tested: schema contracts, small batch sizes for wide binary rows, actor
signatures, deterministic fallback features so downstream stages are
exercisable end-to-end.

Scale notes: binary payloads dominate block size — callers should read with
``columns=`` pruning and pass a small ``batch_size`` (e.g. 64) so
batch x concurrency stays inside the worker heap; Arrow keeps the payload
zero-copy from the object store (never convert these columns to pandas).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


class ImageFeatures:
    """Actor-pool callable: binary image -> (width, height, feature vector).

    With PIL present this would decode for real; without it, a clearly-marked
    deterministic fake derives pseudo-dimensions and a 16-dim feature from the
    payload hash so the pipeline shape is fully testable. Set
    ``require_real=True`` to fail loudly instead of faking.
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.bin_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if self.real:  # pragma: no cover
            raise NotImplementedError("real decode path intentionally unimplemented in sandbox")
        payloads = [col[i].as_py() or b"" for i in range(n)]
        h = hash64([p[:64] for p in payloads])
        widths = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        heights = ((h >> np.uint64(11)) % np.uint64(1080) + np.uint64(16)).astype(np.int32)
        rng_feats = np.empty((n, self.FEATURE_DIM), dtype=np.float32)
        for i in range(n):
            rs = np.random.RandomState(int(h[i] & np.uint64(0x7FFFFFFF)))
            rng_feats[i] = rs.normal(size=self.FEATURE_DIM).astype(np.float32)
        feat = pa.FixedSizeListArray.from_arrays(
            pa.array(rng_feats.ravel(), pa.float32()), self.FEATURE_DIM
        )
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("image_feat", feat)
        )


class FrameSampler:
    """Actor-pool callable: binary "video" -> k deterministic frame offsets.

    Real frame decode is stubbed (no av libs); offset selection — the part
    that matters for batch layout — is real: evenly spaced byte offsets.
    """

    def __init__(self, bin_col: str = "payload", k: int = 4):
        self.bin_col = bin_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.bin_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sizes = np.array([len(col[i].as_py() or b"") for i in range(len(col))], dtype=np.int64)
        offs = np.stack(
            [np.linspace(0, max(0, s - 1), self.k).astype(np.int64) for s in sizes]
        )
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

    Real decode is stubbed (no audio libs in this container); the profile is
    computed over the RAW bytes in k equal windows — deterministic, cheap,
    and exercises the exact batch/schema path a real spectrogram stage uses.
    """

    BINS = 8

    def __init__(self, bin_col: str = "payload", require_real: bool = False):
        self.bin_col = bin_col
        if require_real:
            raise NotImplementedError(
                "real audio decode requires an audio lib not available here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.bin_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        feats = np.zeros((n, self.BINS), dtype=np.float32)
        sizes = np.zeros(n, dtype=np.int64)
        for i in range(n):
            b = col[i].as_py() or b""
            sizes[i] = len(b)
            if not b:
                continue
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
            bounds = np.linspace(0, len(arr), self.BINS + 1).astype(np.int64)
            for j in range(self.BINS):
                seg = arr[bounds[j] : bounds[j + 1]]
                feats[i, j] = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
        feat = pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel(), pa.float32()), self.BINS)
        return (
            batch.append_column("n_bytes", pa.array(sizes, pa.int64()))
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
