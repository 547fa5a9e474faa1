"""HTML -> text extraction stage (reference record-parser analogue, SURVEY.md S5).

The reference parses raw 4-line records into views and validates them at read
time (/root/reference/src/fastqview.cpp:89-119). The web engine's equivalent is
extracting text from the raw html payload. The extractor MUST be pure and
deterministic — the per-row invariant vs the reference is byte-identical
extracted text per url, and Ray task retries must reproduce identical blocks.

The corpus wraps text in a fixed template (corpus.HTML_PREFIX/SUFFIX); real
deployments would swap in a pinned-version extractor behind the same stage
signature. Extraction is vectorized (Arrow kernels + numpy offset surgery) —
no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import HTML_PREFIX, HTML_SUFFIX

_BIG = 1 << 40  # "no stop" sentinel for binary_slice (requires an explicit stop)


def _strip_fixed_suffix(arr: pa.Array, suf: int) -> pa.Array:
    """Drop the last ``suf`` bytes of every element of a binary array.

    Arrow's binary_slice can't take per-row stop offsets, so rebuild the value
    buffer with a vectorized np.delete of each row's tail byte indices.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=int(offsets[-1]))
    lengths = np.diff(offsets)
    cut = np.minimum(lengths, suf)  # rows shorter than the suffix lose everything they have
    # byte indices of every deleted tail byte, fully vectorized
    del_idx = (offsets[1:][:, None] - np.arange(1, suf + 1)[None, :]).ravel()
    keep_floor = (offsets[1:] - cut).repeat(suf)
    del_idx = del_idx[del_idx >= keep_floor]
    out = np.delete(data, del_idx)
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths - cut, out=new_offsets[1:])
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(new_offsets.tobytes()), pa.py_buffer(out.tobytes())],
    ).cast(pa.binary())


def extract_text_batch(
    batch: pa.Table, html_col: str = "html", out_col: str = "extracted_text"
) -> pa.Table:
    """Strip the fixed template wrapper from ``html`` -> utf8 ``out_col``.

    Rows not matching the template yield null (quarantine-able), mirroring the
    reference's parse-error surface (err_invalid_start,
    /root/reference/src/fastqview.cpp:121-126) without aborting the run.
    """
    html = batch[html_col]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    pre, suf = len(HTML_PREFIX), len(HTML_SUFFIX)
    n = pc.binary_length(html)
    ok = pc.and_(
        pc.greater_equal(n, pre + suf),
        pc.and_(
            pc.equal(pc.binary_slice(html, 0, pre), pa.scalar(HTML_PREFIX, pa.binary())),
            pc.equal(pc.binary_slice(html, -suf, _BIG), pa.scalar(HTML_SUFFIX, pa.binary())),
        ),
    )
    body = _strip_fixed_suffix(pc.binary_slice(html, pre, _BIG), suf)
    text = pc.if_else(ok, body.cast(pa.string()), pa.scalar(None, pa.string()))
    return batch.append_column(out_col, text)


def verify_extraction_batch(batch: pa.Table) -> pa.Table:
    """Check extract(html) == text byte-identically per url (the invariant).

    Emits (url, matches) — consumed by a tiny count aggregate in tests/metrics.
    """
    extracted = extract_text_batch(batch)["extracted_text"]
    matches = pc.equal(extracted, batch["text"])
    return pa.table({"url": batch["url"], "matches": pc.fill_null(matches, False)})
