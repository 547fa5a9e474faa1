"""Deterministic synthetic web-page corpus generator (FIXTURES.md `pages` table).

Produces the engine's primary input shape from BASELINE.json input_hint:

    (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

with planted duplicate classes mirroring the reference's conformance fixtures
(/root/reference/test/inputs/): exact copies (single_tight.fa), prefix/containment
chains (single_loose.fa), k-mismatch near-copies (single_hamming.fa), plus
north-rule near-dup classes at fixed Jaccard levels for MinHash-LSH recall tests.

`html` is a fixed template wrapper so that extract(html) == text byte-identically
(the per-row invariant the driver checks). Everything is seeded — same seed, same
bytes — so Ray retries and re-runs reproduce identical corpora.
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "data web page crawl text dedup cluster shingle band signature token corpus "
    "model train index quality language score filter stream block batch arrow ray "
    "actor shuffle partition hash prefix suffix sample record archive snapshot "
    "content extract parse render link anchor title body header footer section"
).split()

HTML_PREFIX = b"<html><head><title>fdr</title></head><body><main>"
HTML_SUFFIX = b"</main></body></html>"

_EPOCH = _dt.datetime(2025, 1, 1)


@dataclass
class CorpusSpec:
    n_base: int = 400  # unique base documents
    exact_dup_rate: float = 0.15  # fraction of base docs that get an exact copy
    prefix_chain_rate: float = 0.08  # base docs growing a 2-3 long containment chain
    hamming_rate: float = 0.08  # base docs with k-substitution near-copies (k in 1..3)
    jaccard_levels: tuple = (0.95, 0.8, 0.5)  # token-edit near-dups for MinHash recall
    jaccard_rate: float = 0.06  # per level
    words_per_doc: tuple = (30, 120)
    seed: int = 42
    langs: tuple = ("en", "en", "en", "en", "de", "fr")
    url_prefix: str = ""  # disambiguates urls when composing sub-corpora


def _mk_text(rng: np.random.RandomState, spec: CorpusSpec) -> str:
    n = rng.randint(*spec.words_per_doc)
    return " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n))


def render_html(text: str) -> bytes:
    return HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX


def generate_pages(spec: CorpusSpec = CorpusSpec()) -> pa.Table:
    """Build the pages table with planted duplicates; returns a pyarrow Table.

    Also returns (via table metadata b'dup_classes') nothing — ground truth is
    recomputable from urls: duplicates carry the base row's index in their url
    (`.../dup/<class>/<base_idx>/<copy>`), so tests can derive expected clusters.
    """
    rng = np.random.RandomState(spec.seed)
    rows = []  # (url, ts_offset_us, text, lang)
    serial = 0

    def emit(url, text, lang):
        nonlocal serial
        ts = _EPOCH + _dt.timedelta(seconds=serial * 13 + int(rng.randint(0, 7)))
        rows.append((url, ts, text, lang))
        serial += 1

    base_texts = []
    for i in range(spec.n_base):
        text = _mk_text(rng, spec)
        lang = spec.langs[rng.randint(0, len(spec.langs))]
        base_texts.append((i, text, lang))
        emit(f"https://{spec.url_prefix}site{i % 23}.example/p/{i}", text, lang)

    def pick(rate):
        k = max(1, int(spec.n_base * rate))
        return rng.choice(spec.n_base, size=k, replace=False)

    for i in pick(spec.exact_dup_rate):
        _, text, lang = base_texts[i]
        emit(f"https://{spec.url_prefix}mirror.example/dup/exact/{i}/1", text, lang)

    for i in pick(spec.prefix_chain_rate):
        _, text, lang = base_texts[i]
        chain_len = 2 + int(rng.randint(0, 2))
        cur = text
        for c in range(chain_len):
            extra = " " + _mk_text(rng, spec)
            cur = cur + extra
            emit(f"https://{spec.url_prefix}site{i % 23}.example/dup/prefix/{i}/{c + 1}", cur, lang)

    for i in pick(spec.hamming_rate):
        _, text, lang = base_texts[i]
        k = 1 + int(rng.randint(0, 3))
        chars = np.array(list(text))
        # substitute k alphabetic positions deterministically (never a space —
        # keeps token structure; same length, hamming distance exactly k)
        alpha_pos = np.array([j for j, ch in enumerate(text) if ch.isalpha()])
        if len(alpha_pos) >= k:
            pos = rng.choice(alpha_pos, size=k, replace=False)
            for p in pos:
                chars[p] = "z" if chars[p] != "z" else "q"
            emit(f"https://{spec.url_prefix}site{i % 23}.example/dup/ham{k}/{i}/1", "".join(chars), lang)

    for lvl in spec.jaccard_levels:
        for i in pick(spec.jaccard_rate):
            _, text, lang = base_texts[i]
            toks = text.split()
            # replace a fraction of tokens so char-shingle overlap lands near lvl
            n_swap = max(1, int(len(toks) * (1 - lvl)))
            pos = rng.choice(len(toks), size=min(n_swap, len(toks)), replace=False)
            for p in pos:
                toks[p] = _WORDS[rng.randint(0, len(_WORDS))] + "x"
            tag = str(lvl).replace(".", "")
            emit(f"https://{spec.url_prefix}site{i % 23}.example/dup/jac{tag}/{i}/1", " ".join(toks), lang)

    urls = [r[0] for r in rows]
    ts = [r[1] for r in rows]
    texts = [r[2] for r in rows]
    langs = [r[3] for r in rows]
    html = [render_html(t) for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(path: str, spec: CorpusSpec = CorpusSpec(), shards: int = 4) -> str:
    """Write the pages corpus as a sharded Parquet directory; returns the path.

    Sharded so ray.data.read_parquet gets natural input parallelism. Idempotent
    per (path exists + _SPEC matches) — cheap resume for tests/bench.
    """
    spec_tag = repr(spec)
    marker = os.path.join(path, "_SPEC")
    if os.path.isdir(path) and os.path.exists(marker):
        with open(marker) as f:
            if f.read() == spec_tag:
                return path
    os.makedirs(path, exist_ok=True)
    table = generate_pages(spec)
    n = table.num_rows
    step = -(-n // shards)
    for s in range(shards):
        pq.write_table(table.slice(s * step, step), os.path.join(path, f"part-{s:05d}.parquet"))
    with open(marker, "w") as f:
        f.write(spec_tag)
    return path


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Deterministically lift the driver's documents table into the pages shape.

    Used by queries()/bench so pages-shaped pipelines can run over driver
    testdata without synthesizing new content: url <- doc_id, warc_ts <- doc_id
    as micros offset, html <- template(text). Bijective and seed-free.
    """
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_id = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    urls = [f"https://docs.example/d/{i}" for i in doc_id]
    ts = [(_EPOCH + _dt.timedelta(microseconds=int(i))) for i in doc_id]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array([render_html(x) for x in texts], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": t["lang"].cast(pa.string()).combine_chunks(),
        }
    )
