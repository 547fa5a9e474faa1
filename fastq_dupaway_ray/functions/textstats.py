"""Text-analysis scalar functions for training-data pipelines (vectorized, no Ray).

These extend the engine beyond the reference's dedup surface: token counting,
quality scoring, language ID, normalization. All operate on pyarrow arrays /
tables so stages can stay in zero-copy ``batch_format="pyarrow"``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# whitespace tokenization used consistently by token_count / the SQL oracle
_WS_RE = re.compile(r"\s+")
# BPE-ish word/number/punct splitter for token estimates
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# tiny per-language stopword inventories for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
}


def normalize_text(arr: pa.Array) -> pa.Array:
    """Canonical text normalization: lowercase + whitespace collapse + trim.

    Pure Arrow kernels; deterministic — the hash of the normalized text is the
    exact-dedup key (reference strips only the trailing newline,
    /root/reference/src/hash_dup_remover.hpp:124; web text needs more).
    """
    x = pc.utf8_lower(arr)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def token_count_ws(arr: pa.Array) -> pa.Array:
    """Whitespace token count per string (0 for empty/blank), as int64.

    Matches the SQL oracle: len(regexp_split_to_array(trim(text), '\\s+')).
    """
    trimmed = pc.utf8_trim_whitespace(arr)
    # count whitespace runs + 1, except empty string -> 0
    ws_runs = pc.count_substring_regex(trimmed, r"\s+")
    n = pc.add(ws_runs, 1)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int64()), pc.cast(n, pa.int64()))


_TIKTOKEN_ENC = None
_TIKTOKEN_TRIED = False


def _tiktoken_encoding():
    """Lazy, guarded ``tiktoken`` load (optional dep; absent in this
    container). Caching the encoder per process keeps the BPE merge table a
    once-per-worker cost, per the actor-pool setup discipline."""
    global _TIKTOKEN_ENC, _TIKTOKEN_TRIED
    if not _TIKTOKEN_TRIED:
        _TIKTOKEN_TRIED = True
        try:  # pragma: no cover - exercised only where tiktoken is installed
            import tiktoken

            _TIKTOKEN_ENC = tiktoken.get_encoding("cl100k_base")
        except Exception:
            _TIKTOKEN_ENC = None
    return _TIKTOKEN_ENC


def token_count_bpe(texts: np.ndarray, tokenizer: str = "heuristic") -> np.ndarray:
    """Token counts per text.

    ``tokenizer``:
    * ``"heuristic"`` (default) — the regex estimate (words + numbers +
      punctuation marks). Deterministic, dependency-free, and the
      SQL-oracle-checked semantics (``token_counts_bpe_docs``).
    * ``"tiktoken"`` — real BPE counts via the optional ``tiktoken`` dep
      (cl100k_base, batch ``encode_ordinary_batch``); raises ImportError
      when the dep is absent.
    * ``"auto"`` — tiktoken when importable, else the heuristic.
    """
    if tokenizer not in ("heuristic", "tiktoken", "auto"):
        raise ValueError(f"token_count_bpe: unknown tokenizer {tokenizer!r}")
    enc = _tiktoken_encoding() if tokenizer in ("tiktoken", "auto") else None
    if tokenizer == "tiktoken" and enc is None:
        raise ImportError(
            "token_count_bpe(tokenizer='tiktoken') needs the optional "
            "tiktoken package; use 'auto' or 'heuristic' for the fallback"
        )
    if enc is not None:  # pragma: no cover - exercised only with the dep
        return np.array(
            [len(ids) for ids in enc.encode_ordinary_batch([t or "" for t in texts])],
            dtype=np.int64,
        )
    return np.fromiter((len(_BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts))


def quality_features(table: pa.Table, text_col: str = "text") -> pa.Table:
    """Append vectorized quality-scoring columns.

    * n_chars      — utf8 length
    * n_tokens     — whitespace token count
    * mean_token_len
    * punct_ratio  — punctuation chars / chars
    * digit_ratio  — digit chars / chars
    * upper_ratio  — uppercase chars / chars
    * stopword_ratio (en) — en stopword tokens / tokens
    """
    arr = table[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_chars = pc.cast(pc.utf8_length(arr), pa.int64())
    n_tokens = token_count_ws(arr)
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    safe_toks = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))

    def ratio(pattern: str) -> pa.Array:
        cnt = pc.cast(pc.count_substring_regex(arr, pattern), pa.int64())
        return pc.divide(pc.cast(cnt, pa.float64()), pc.cast(safe_chars, pa.float64()))

    punct = ratio(r"[\.,;:!\?\-'\"()\[\]]")
    digit = ratio(r"[0-9]")
    upper = ratio(r"[A-Z]")
    mean_tok = pc.divide(pc.cast(n_chars, pa.float64()), pc.cast(safe_toks, pa.float64()))
    stop = pc.cast(
        pc.count_substring_regex(
            pc.utf8_lower(arr), r"\b(" + "|".join(sorted(_LANG_STOPWORDS["en"])) + r")\b"
        ),
        pa.float64(),
    )
    stop_ratio = pc.divide(stop, pc.cast(safe_toks, pa.float64()))
    return (
        table.append_column("n_chars", n_chars)
        .append_column("n_tokens", n_tokens)
        .append_column("mean_token_len", mean_tok)
        .append_column("punct_ratio", punct)
        .append_column("digit_ratio", digit)
        .append_column("upper_ratio", upper)
        .append_column("stopword_ratio", stop_ratio)
    )


def language_id(texts: np.ndarray) -> np.ndarray:
    """Stopword-vote language heuristic -> array of lang codes ('und' if no vote).

    Deterministic tie-break: highest vote count, then lexicographic code.
    """
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        toks = set(_WS_RE.split(t.lower())) if t else set()
        best_lang, best_n = "und", 0
        for lang in sorted(_LANG_STOPWORDS):
            n = len(toks & _LANG_STOPWORDS[lang])
            if n > best_n:
                best_lang, best_n = lang, n
        out[i] = best_lang
    return out

def dup_trigram_stats(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc duplicate word-trigram repetition signal (the Gopher /
    RefinedWeb "dup n-gram fraction" quality rule): returns
    ``(n_trigrams, dup_trigram_frac)`` where the fraction is
    ``1 - distinct/total`` (0.0 for docs with fewer than 3 tokens).

    Vectorized across the whole batch: one token flatten, one 64-bit hash
    pass, trigram keys by shifted-index mixing, distinct counts via a single
    (doc, key) lexsort — no per-document Python in the counting path.
    """
    import pandas as pd

    n = len(texts)
    total = np.zeros(n, dtype=np.int64)
    frac = np.zeros(n, dtype=np.float64)
    if n == 0:
        return total, frac
    toks = pd.Series(texts, dtype=object).fillna("").str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = np.maximum(lens - 2, 0)
    if lens.sum() == 0 or total.sum() == 0:
        return total, frac
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks.to_numpy()])
    h = pd.util.hash_array(flat)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    ends = np.cumsum(lens)
    idx = np.arange(len(flat), dtype=np.int64)
    # trigram start positions: i, i+1, i+2 all inside the same doc
    valid = idx <= ends[doc] - 3
    p = idx[valid]
    m1 = np.uint64(0x9E3779B97F4A7C15)
    m2 = np.uint64(0xC2B2AE3D27D4EB4F)
    th = (h[p] * m1) ^ (h[p + 1] * m2) ^ (h[p + 2] + m1)
    tdoc = doc[p]
    order = np.lexsort((th, tdoc))
    st, td = th[order], tdoc[order]
    new = np.ones(len(st), dtype=bool)
    new[1:] = (st[1:] != st[:-1]) | (td[1:] != td[:-1])
    distinct = np.bincount(td[new], minlength=n).astype(np.int64)
    # no rounding: the fraction is one IEEE division + subtraction, bit-equal
    # to the SQL oracle's arithmetic (numpy round is half-even, DuckDB's is
    # half-away — rounding would DIVERGE on dyadic ties like 1/128)
    has = total > 0
    frac[has] = 1.0 - distinct[has] / total[has]
    return total, frac

def flatten_lines(texts, sep: str):
    """Split a string column on ``sep`` into (flat pieces, doc index,
    position-within-doc, per-doc counts) — all-Arrow/numpy (one
    ``split_pattern``; the ListArray offsets give counts and positions).
    Shared by :func:`dup_line_stats` and stages.paradedup (the stat and the
    removal twin must split identically)."""
    arr = texts
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(np.asarray(texts, dtype=object), pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    la = pc.split_pattern(pc.fill_null(arr, ""), pattern=sep)
    offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pos = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], counts)
    return la.flatten(), doc_idx, pos, counts


def dup_line_stats(
    texts, sep: str = "\n"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc duplicate-line repetition signal (the Gopher line-level
    quality rule, companion to :func:`dup_trigram_stats`): returns
    ``(n_lines, dup_line_frac, dup_line_char_frac)`` where a duplicate is a
    line whose exact text already appeared EARLIER IN THE SAME DOCUMENT, the
    first fraction is duplicates/total lines, and the second is the
    characters inside duplicate occurrences over the doc's total line
    characters (0.0 when the doc has zero line characters).

    Vectorized across the batch: one Arrow ``split_pattern``, one hash-table
    duplicated pass over (doc, line) pairs (exact string equality — pandas'
    C hashtable, not a hash-only shortcut), bincount reductions per doc.
    """
    import pandas as pd

    n = len(texts)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.astype(np.float64), z.astype(np.float64)
    flat, doc, _pos, counts = flatten_lines(texts, sep)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    dup = pd.DataFrame(
        {"d": doc, "l": flat.to_numpy(zero_copy_only=False)}
    ).duplicated().to_numpy()
    dup_cnt = np.bincount(doc[dup], minlength=n).astype(np.int64)
    tot_chars = np.bincount(doc, weights=lens, minlength=n)
    dup_chars = np.bincount(doc[dup], weights=lens[dup], minlength=n)
    # plain IEEE divisions, bit-equal to the SQL oracle's arithmetic
    frac = dup_cnt / np.maximum(counts, 1)
    char_frac = np.where(tot_chars > 0, dup_chars / np.maximum(tot_chars, 1), 0.0)
    return counts, frac, char_frac


# PII patterns shared by redact_pii and its SQL oracle — RE2 semantics in
# BOTH engines (pyarrow and DuckDB bundle RE2), so replacement parity is
# exact, not approximate
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"


def redact_pii(arr: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(clean_text, n_pii) — emails then phones replaced with typed tags
    (the PII-scrub stage of a web-text curation pipeline), all vectorized
    RE2 kernels. n_pii counts matches BEFORE replacement."""
    n = pc.add(
        pc.count_substring_regex(arr, PII_EMAIL_RE),
        pc.count_substring_regex(arr, PII_PHONE_RE),
    )
    clean = pc.replace_substring_regex(arr, pattern=PII_EMAIL_RE, replacement="<EMAIL>")
    clean = pc.replace_substring_regex(clean, pattern=PII_PHONE_RE, replacement="<PHONE>")
    return clean, pc.cast(n, pa.int64())
