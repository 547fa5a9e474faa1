"""Native FASTA/FASTQ(.gz) source + sink — the reference's actual file formats.

Reference behavior reproduced (not ported):
* record shapes — FASTQ is four lines ``@id / seq / +junk / qual`` with
  ``len(qual) == len(seq)`` enforced (/root/reference/src/fastqview.cpp:89-119),
  FASTA is two lines ``>id / seq`` (/root/reference/src/fastaview.cpp:70-95);
* gzip is selected purely by the ``.gz`` extension
  (/root/reference/src/file_utils.cpp:71-79);
* the format is caller-selected (``--format fasta|fastq``,
  /root/reference/src/main.cpp:112-120), with extension-based inference added
  for convenience.

Engine mapping (SURVEY.md S1-S3/S5): each record lifts to the pages schema —
``url`` = id line (marker stripped), ``text`` = sequence, ``warc_ts`` = file
order (epoch + record index, so keep-first-by-order == the reference's
keep-first-in-file-order), ``html`` = the raw record bytes (round-trip
payload), ``lang`` = "". Malformed records are routed to quarantine columns
via the standard ``_valid`` flag rather than aborting (M9: web-scale inputs
always contain garbage; the reference aborts, its serial prerogative).

Scale model: the parallelism unit is the FILE (one task per shard), matching
how web-crawl and sequencing corpora actually ship — thousands of shard
files. A single multi-GB ``.fastq.gz`` parses in one task (gzip is not
splittable; the reference itself streams one file serially) — reshard first
if that is the bottleneck.
"""

from __future__ import annotations

import datetime
import glob
import gzip
import os

import numpy as np
import pyarrow as pa
import ray.data

_EPOCH = datetime.datetime(2000, 1, 1)

FASTX_EXTS = (".fa", ".fasta", ".fna", ".fq", ".fastq")


def infer_format(path: str) -> str | None:
    """"fasta" / "fastq" from the file extension (``.gz`` stripped first),
    None if not a fastx path."""
    base = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(base)[1].lower()
    if ext in (".fa", ".fasta", ".fna"):
        return "fasta"
    if ext in (".fq", ".fastq"):
        return "fastq"
    return None


def is_fastx_path(path: str) -> bool:
    return infer_format(path) is not None


def dir_has_fastx(path: str) -> bool:
    return os.path.isdir(path) and any(
        is_fastx_path(f) for f in glob.glob(os.path.join(path, "*"))
    )


def _file_bytes(path: str) -> bytes:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def parse_fastx_bytes(data: bytes, fmt: str) -> pa.Table:
    """Parse one file's bytes into a pages-schema Arrow table (+ ``_valid``).

    Vectorized over the line array (numpy slicing per field position); no
    per-record Python beyond the initial line split.
    """
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    arr = np.array(lines, dtype=object)
    per = 4 if fmt == "fastq" else 2
    marker = b"@" if fmt == "fastq" else b">"
    n = len(arr) // per
    tail = len(arr) - n * per  # trailing partial record -> one invalid row
    ids = arr[0 : n * per : per]
    seqs = arr[1 : n * per : per]
    ok = np.array([i[:1] == marker for i in ids], dtype=bool)
    if fmt == "fastq":
        quals = arr[3 : n * per : per]
        ok &= np.array([len(q) == len(s) for q, s in zip(quals, seqs)], dtype=bool)
    raw = [b"\n".join(arr[i * per : (i + 1) * per]) + b"\n" for i in range(n)]
    urls = [i[1:].decode("utf-8", "replace") for i in ids]
    texts = [s.decode("utf-8", "replace") for s in seqs]
    ts = [_EPOCH + datetime.timedelta(microseconds=int(i)) for i in range(n)]
    valid = ok.tolist()
    if tail:
        urls.append("")
        texts.append("")
        ts.append(_EPOCH + datetime.timedelta(microseconds=n))
        raw = raw + [b"\n".join(arr[n * per :]) + b"\n"]
        valid.append(False)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(raw, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([""] * len(urls), pa.string()),
            "_valid": pa.array(valid, pa.bool_()),
        }
    )


def read_fastx(path, fmt: str | None = None) -> ray.data.Dataset:
    """FASTA/FASTQ(.gz) -> pages-schema Dataset (with ``_valid`` column).

    ``path``: a file, a directory (every fastx file inside), or a list.
    Callers split the quarantine flow exactly like the parquet source
    (``sources.pages.split_quarantine`` works unchanged on the output).
    """
    if isinstance(path, (list, tuple)):
        files = [str(p) for p in path]
    elif os.path.isdir(path):
        files = sorted(
            f
            for f in glob.glob(os.path.join(path, "*"))
            if is_fastx_path(f)
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no FASTA/FASTQ files under {path!r}")
    fmts = {}
    for f in files:
        got = fmt or infer_format(f)
        if got is None:
            raise ValueError(f"cannot infer fasta/fastq format of {f!r}; pass fmt=")
        fmts[f] = got

    # one task per file: whole-file shards are the parallel unit (gzip is not
    # splittable). Offsetting each file's warc_ts by its position keeps a
    # global arrival order across shards, like concatenated reference inputs.
    items = [{"path": f, "shard": i} for i, f in enumerate(files)]

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for p, shard in zip(batch["path"].to_pylist(), batch["shard"].to_pylist()):
            t = parse_fastx_bytes(_file_bytes(p), fmts[p])
            # shard-offset the timestamps so later files sort after earlier
            off = pa.compute.add(
                t["warc_ts"].cast(pa.int64()), np.int64(shard) << np.int64(40)
            )
            t = t.set_column(
                t.schema.get_field_index("warc_ts"),
                "warc_ts",
                off.cast(pa.timestamp("us")),
            )
            out.append(t)
        return pa.concat_tables(out)

    return ray.data.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


def write_clusters_reference_format(
    clusters: ray.data.Dataset, path: str, fmt: str = "fasta"
) -> int:
    """Clusters table -> the reference's ``.clusters`` byte format
    (/root/reference/src/file_utils.cpp:98-112): the head's id line, then a
    ``--``-prefixed id line per duplicate member. The id line carries the
    format marker exactly as the reference's record view does (its id span
    starts at ``>``/``@``). Clusters and members are emitted in sorted-id
    order (deterministic; the reference emits in scan order — same content,
    diff after ``sort`` if comparing files). Returns clusters written.
    The clusters table is the small side by design (duplicates only), so a
    driver-side serial writer is appropriate — the parquet clusters sink is
    the parallel path."""
    marker = "@" if fmt == "fastq" else ">"
    cdf = clusters.to_pandas()
    n = 0
    with open(path, "w") as f:
        for head, grp in sorted(cdf.groupby("cluster_id"), key=lambda kv: kv[0]):
            f.write(f"{marker}{head}\n")
            for m in sorted(grp.loc[~grp["is_representative"], "member"]):
                f.write(f"--{marker}{m}\n")
            n += 1
    return n


def write_fastx(ds: ray.data.Dataset, path: str, fmt: str | None = None) -> int:
    """Kept pages -> one FASTA/FASTQ(.gz) file, in ``warc_ts`` order — the
    reference's byte-format output (its single-file sink,
    /root/reference/src/file_utils.cpp:80-96). Rows stream to the (serial)
    sink via iter_batches; records are the stored raw ``html`` bytes, so a
    read -> dedup -> write round trip is byte-identical on kept records.
    Returns the number of records written. For the parallel 100-TB sink use
    ``write_parquet`` (partitioned, resumable) — this writer exists for
    drop-in reference parity.
    """
    fmt = fmt or infer_format(path)
    gz = path.endswith(".gz")
    opener = gzip.open if gz else open
    n = 0
    with opener(path, "wb") as f:
        for batch in ds.sort("warc_ts").iter_batches(batch_format="pyarrow"):
            for rec in batch["html"].to_pylist():
                f.write(rec)
                n += 1
    return n
