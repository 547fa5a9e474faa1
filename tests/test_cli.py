"""CLI surface mirroring the reference's flags (main.cpp:43-96), run in-process
against the shared Ray session."""

import json
import os

import pyarrow.parquet as pq
import pytest

from fastq_dupaway_ray.__main__ import main


@pytest.fixture()
def paths(pages_corpus, tmp_path):
    src, _ = pages_corpus
    return src, str(tmp_path / "out")


def test_cli_fast_mode(paths, capsys, ray_session):
    src, out = paths
    assert main(["-i", src, "-o", out, "--fast", "--verbose"]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["mode"] == "exact"
    assert metrics["kept"] + metrics["duplicates"] == metrics["total"]
    t = pq.read_table(out)
    assert t.num_rows == metrics["kept"]


def test_cli_loose_with_clusters(paths, ray_session):
    src, out = paths
    assert main(["-i", src, "-o", out, "--compare-seq", "loose", "--write-clusters"]) == 0
    clusters = pq.read_table(out.rstrip("/") + ".clusters")
    assert {"cluster_id", "member", "is_representative"} <= set(clusters.column_names)


def test_cli_flag_validation(paths, ray_session):
    src, out = paths
    # reference errors reproduced (main.cpp:154,161-163,143)
    assert main(["-i", src, "-o", out, "--fast", "--compare-seq", "loose"]) == 2
    assert main(["-i", src, "-o", out, "--unordered"]) == 2
    assert main(["-i", src, "-o", out, "--fast", "-m", "100"]) == 2
