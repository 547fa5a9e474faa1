"""Pages-table source: schema-validated Parquet read (reference S1-S3, S5 analogue).

The reference validates records at parse time and aborts on malformed input
(/root/reference/src/fastqview.cpp:121-138). Here ingest validation is a
stateless zero-copy map_batches over Arrow: rows violating the schema/invariant
are routed to a quarantine column-set rather than aborting the whole run
(SURVEY.md M9 — web-scale inputs always contain garbage).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def read_pages(path, columns=None) -> ray.data.Dataset:
    """Read a pages Parquet directory with column pruning at the scan.

    Pass ``columns`` whenever downstream stages don't need the heavy ``html``
    payload — at 100 TB the html column dominates the table and must not leave
    storage unless a stage actually decodes it.
    """
    return ray.data.read_parquet(path, columns=columns)


def validate_pages_batch(batch: pa.Table) -> pa.Table:
    """Stateless ingest validation: append an ``_valid`` bool column.

    Invariants (per FIXTURES.md / input_hint): url non-empty, text non-null,
    warc_ts non-null. Invalid rows are flagged, not dropped — callers either
    filter them into the main flow or write them to a quarantine sink.
    """
    ok = pc.and_(
        pc.and_(
            pc.greater(pc.utf8_length(pc.coalesce(batch["url"], pa.scalar(""))), 0),
            pc.is_valid(batch["text"]),
        ),
        pc.is_valid(batch["warc_ts"]),
    )
    return batch.append_column("_valid", ok)


def split_quarantine(ds: ray.data.Dataset):
    """Validated main flow + quarantine flow (both lazy)."""
    flagged = ds.map_batches(validate_pages_batch, batch_format="pyarrow")
    good = flagged.map_batches(
        lambda t: t.filter(t["_valid"]).drop_columns(["_valid"]), batch_format="pyarrow"
    )
    bad = flagged.map_batches(
        lambda t: t.filter(pc.invert(t["_valid"])).drop_columns(["_valid"]),
        batch_format="pyarrow",
    )
    return good, bad
