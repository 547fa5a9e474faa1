"""Direct parity with the reference's OWN golden fixtures: its test inputs
(/root/reference/test/inputs/*.fa) run through this engine must keep exactly
the records its expected outputs (/root/reference/test/expected/*.fa) keep —
the reference's test strategy (test/test_seq.py, test/test_fast.py) executed
against the Ray engine instead of the binary.

Semantics mapping: a FASTA record (id, seq) becomes a page row (url=id,
text=seq, warc_ts=file position); the reference compares sequence bytes with
the trailing newline excluded, which is exactly our text compare; keep-first
in file order = keep-first by warc_ts.
"""

import os

import pandas as pd
import pytest

import ray.data as rd

REF = "/root/reference/test"


def _read_fasta(path):
    rows = []
    with open(path) as f:
        rid = None
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                rid = line[1:]
            elif rid is not None:
                rows.append((rid, line))
                rid = None
    return rows


def _pages(rows):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "url": [r[0] for r in rows],
                "warc_ts": range(len(rows)),
                "text": [r[1] for r in rows],
            }
        )
    )


def _pages_engine(path):
    """The ENGINE's native fastx source (sources.fastx) — the reference's own
    .fa fixture flows through the real ingest path, not test scaffolding."""
    from fastq_dupaway_ray.sources.fastx import read_fastx

    return read_fastx(path).map_batches(
        lambda t: t.filter(t["_valid"]).drop_columns(["_valid"]),
        batch_format="pyarrow",
    )


def _expected_ids(name):
    return sorted(r[0] for r in _read_fasta(os.path.join(REF, "expected", name)))


@pytest.mark.parametrize(
    "fixture,mode,distance",
    [
        ("single_tight.fa", "tight", 0),
        ("single_loose.fa", "loose", 0),
        ("single_hamming.fa", "hamming", 1),
    ],
)
def test_reference_seq_goldens(ray_session, fixture, mode, distance):
    """The reference's sequence-mode golden runs (test/test_seq.py:7-38)."""
    from fastq_dupaway_ray.stages.adjacency import dedup_adjacency

    res = dedup_adjacency(
        _pages_engine(os.path.join(REF, "inputs", fixture)),
        mode=mode, distance=distance, order_cols=("warc_ts", "url"),
    )
    got = sorted(res.kept.to_pandas()["url"])
    assert got == _expected_ids(fixture), fixture


def test_reference_fast_golden(ray_session):
    """The reference's fast-mode golden run (test/test_fast.py single-end)."""
    from fastq_dupaway_ray.stages.dedup_exact import dedup_exact

    kept = dedup_exact(
        _pages_engine(os.path.join(REF, "inputs", "single_fast.fa")),
        key_cols=("text",), order_cols=("warc_ts", "url"),
    ).to_pandas()
    assert sorted(kept["url"]) == _expected_ids("single_fast.fa")


def test_reference_paired_tight_golden(ray_session):
    """The reference's paired tight golden (test/test_seq.py:41-75): both
    mates must match; pair-lexicographic sort."""
    from fastq_dupaway_ray.stages.adjacency import dedup_adjacency

    r1 = _read_fasta(os.path.join(REF, "inputs", "paired_tight_r1.fa"))
    r2 = _read_fasta(os.path.join(REF, "inputs", "paired_tight_r2.fa"))
    assert [a[0] for a in r1] == [b[0] for b in r2]
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [a[0] for a in r1],
                "warc_ts": range(len(r1)),
                "text_1": [a[1] for a in r1],
                "text_2": [b[1] for b in r2],
            }
        )
    )
    res = dedup_adjacency(
        ds, mode="tight", text_cols=("text_1", "text_2"), order_cols=("warc_ts", "url")
    )
    got = sorted(res.kept.to_pandas()["url"])
    assert got == _expected_ids("paired_tight_r1.fa")
    assert got == _expected_ids("paired_tight_r2.fa")


def test_reference_paired_fast_golden(ray_session):
    """The reference's paired fast-mode golden (test/test_fast.py PE):
    composite (left, right) exact keep-first."""
    from fastq_dupaway_ray.stages.dedup_exact import dedup_exact

    r1 = _read_fasta(os.path.join(REF, "inputs", "paired_fast_r1.fa"))
    r2 = _read_fasta(os.path.join(REF, "inputs", "paired_fast_r2.fa"))
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [a[0] for a in r1],
                "warc_ts": range(len(r1)),
                "text_1": [a[1] for a in r1],
                "text_2": [b[1] for b in r2],
            }
        )
    )
    kept = dedup_exact(
        ds, key_cols=("text_1", "text_2"), order_cols=("warc_ts", "url")
    ).to_pandas()
    assert sorted(kept["url"]) == _expected_ids("paired_fast_r1.fa")


@pytest.mark.parametrize(
    "scenario", ["shuffled", "skewed", "deletion", "interleaved", "not_overlapped"]
)
def test_reference_unordered_goldens(ray_session, scenario):
    """The reference's five paired --fast --unordered goldens
    (test/test_unordered.py): id-join both files, composite keep-first in
    id-sorted order (the reference dedups while merging the id-sorted
    streams)."""
    from fastq_dupaway_ray.stages.dedup_exact import dedup_exact
    from fastq_dupaway_ray.stages.join import join_unordered

    r1 = _read_fasta(os.path.join(REF, "inputs", f"unordered_{scenario}_r1.fa"))
    r2 = _read_fasta(os.path.join(REF, "inputs", f"unordered_{scenario}_r2.fa"))
    jr = join_unordered(_pages(r1), _pages(r2), key="url", order_cols=("warc_ts",))
    if jr.matched == 0:
        got = []
    else:
        kept = dedup_exact(
            jr.pairs, key_cols=("text_l", "text_r"), order_cols=("url",)
        ).to_pandas()
        got = sorted(kept["url"])
    assert got == _expected_ids(f"unordered_{scenario}_r1.fa"), scenario
