"""Unordered-join scenarios mirroring /root/reference/test/test_unordered.py:10-19
(shuffled, skewed, deletion, interleaved, not_overlapped)."""

import pandas as pd
import pytest

import ray.data as rd

from fastq_dupaway_ray import refmodel
from fastq_dupaway_ray.stages.join import join_unordered


@pytest.fixture(scope="module")
def frame(ray_session, pages_rows):
    return pd.DataFrame(pages_rows)


def _run(left: pd.DataFrame, right: pd.DataFrame):
    res = join_unordered(rd.from_pandas(left), rd.from_pandas(right), key="url")
    ref_pairs, ref_unmatched = refmodel.join_unordered(
        left.to_dict("records"), right.to_dict("records"), key="url"
    )
    assert res.matched == len(ref_pairs)
    assert res.unmatched == ref_unmatched
    got_keys = sorted(res.pairs.to_pandas()["url"])
    assert got_keys == sorted(l["url"] for l, _ in ref_pairs)


def test_shuffled(frame):
    _run(frame, frame.sample(frac=1.0, random_state=1))


def test_skewed(frame):
    _run(frame.iloc[:150], frame.iloc[100:])


def test_deletion(frame):
    _run(frame, frame.drop(frame.index[::3]))


def test_interleaved(frame):
    _run(frame.iloc[::2], frame.iloc[1::2].iloc[:5]._append(frame.iloc[::2].iloc[:40]))


def test_not_overlapped(frame):
    left = frame.iloc[:50].copy()
    right = frame.iloc[50:100].copy()
    res = join_unordered(rd.from_pandas(left), rd.from_pandas(right), key="url")
    assert res.matched == 0
    assert res.unmatched == 100


def test_tied_order_duplicates_keep_exactly_one(ray_session):
    """Advice r2: when duplicate keys TIE on every order column, the broadcast
    drop-filter cannot name the loser — the key must still keep exactly one
    row (shuffle fallback), not vanish from the output."""
    import datetime

    from fastq_dupaway_ray.stages.join import _first_per_key

    ts = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(100):
        for _ in range(2):  # two rows per key, identical warc_ts (tie)
            rows.append({"url": f"u{i:03d}", "warc_ts": ts, "text": f"t{i}"})
    out = _first_per_key(
        rd.from_pandas(pd.DataFrame(rows)), "url", ("warc_ts", "url")
    ).to_pandas()
    assert sorted(out["url"]) == sorted(f"u{i:03d}" for i in range(100))


def test_tied_order_duplicates_through_join(ray_session):
    """End-to-end: the tied-duplicate left side still joins every key."""
    import datetime

    ts = datetime.datetime(2025, 1, 1)
    left = pd.DataFrame(
        [{"url": f"u{i}", "warc_ts": ts, "text": f"l{i}"} for i in range(20)] * 2
    )
    right = pd.DataFrame(
        [{"url": f"u{i}", "warc_ts": ts, "text": f"r{i}"} for i in range(20)]
    )
    res = join_unordered(rd.from_pandas(left), rd.from_pandas(right), key="url")
    assert res.matched == 20
    assert res.unmatched == 0
