"""Serial reference-semantics mirror (test oracle only — NOT the engine).

A tiny, obviously-correct Python model of the reference's dedup semantics,
used by the test suite to generate golden outputs that the distributed Ray
pipelines must reproduce (the reference's own test strategy is end-to-end
golden comparison, /root/reference/test/test_seq.py — we mirror that with
this model instead of shipping its binary).

Semantics mirrored (behavior only, no code ported):

* tight  — duplicate iff same length AND byte-equal
           (/root/reference/src/comparator.cpp:45-58)
* loose  — duplicate iff the shorter text is a prefix of the longer; on a
           longer duplicate the *comparison state* advances to the longer
           text while the kept head row stays the first
           (/root/reference/src/comparator.cpp:60-74,
            /root/reference/src/seq_dup_remover.hpp:91-102)
* hamming — duplicate iff same length AND hamming <= d, compared only
           against the current head in sorted order (order-dependent,
           acknowledged approximation /root/reference/doc/algorithm.md:38)
* hash   — exact keep-first in arrival order
           (/root/reference/src/hash_dup_remover.hpp:105-148)
* unordered join — inner join on id; unmatched rows dropped + counted
           (/root/reference/src/hash_dup_remover.hpp:257-347)

Scan order is by (text, order_key); arrival order is by order_key — the
deterministic tie-break this engine defines as (warc_ts, url).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DedupResult:
    kept: list  # rows (dicts) kept, in scan order
    clusters: dict  # head key -> [member keys] (including head first)
    total: int = 0
    duplicates: int = 0
    unmatched: int = 0


def _hamming(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def _is_dup(mode: str, state: str, text: str, distance: int) -> bool:
    if mode == "tight":
        return state == text
    if mode == "loose":
        short, long_ = (state, text) if len(state) <= len(text) else (text, state)
        return long_.startswith(short)
    if mode == "hamming":
        return len(state) == len(text) and _hamming(state, text) <= distance
    raise ValueError(mode)


def _prefix_compat(a: str, b: str) -> bool:
    """The reference loose predicate per side: strncmp over min(len) chars
    (/root/reference/src/comparator.cpp:60-63, newline-adjusted away)."""
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    return long_.startswith(short)


def _is_dup_paired(mode: str, state: tuple, cur: tuple, distance: int) -> bool:
    """Paired (both-mates) duplicate predicate, mirroring
    /root/reference/src/comparator.cpp:51-58 (tight), :65-74 (loose incl. the
    same-sided-overlap rule), :84-91 (hamming)."""
    if mode == "tight":
        return state == cur
    if mode == "loose":
        if not all(_prefix_compat(s, c) for s, c in zip(state, cur)):
            return False
        # both overlaps must be same-sided (/root/reference/src/comparator.cpp:73)
        le = all(len(s) <= len(c) for s, c in zip(state, cur))
        gt = all(len(s) > len(c) for s, c in zip(state, cur))
        return le or gt
    if mode == "hamming":
        return all(
            len(s) == len(c) and _hamming(s, c) <= distance for s, c in zip(state, cur)
        )
    raise ValueError(mode)


def dedup_sorted_paired(rows, mode: str, distance: int = 2, key="url",
                        text_cols=("text_1", "text_2"), order=None):
    """Paired sorted-adjacency dedup (reference EP3,
    /root/reference/src/seq_dup_remover.hpp:131-218): pair-lexicographic sort
    (/root/reference/src/paired_external_sort.hpp:20-33), both-mates duplicate
    predicate, loose head advance only when BOTH mates are longer-or-equal
    (/root/reference/src/seq_dup_remover.hpp:194-202)."""
    if order is None:
        order = _default_order
    text_cols = list(text_cols)
    indexed = sorted(rows, key=lambda r: (*[r[c] for c in text_cols], order(r)))
    res = DedupResult(kept=[], clusters={})
    head_key = None
    state = None
    for r in indexed:
        cur = tuple(r[c] for c in text_cols)
        if state is not None and _is_dup_paired(mode, state, cur, distance):
            res.clusters[head_key].append(r[key])
            res.duplicates += 1
            if mode == "loose" and all(len(s) <= len(c) for s, c in zip(state, cur)):
                state = cur  # comparison state advances; kept head row does not
        else:
            head_key = r[key]
            state = cur
            res.kept.append(r)
            res.clusters[head_key] = [head_key]
        res.total += 1
    return res


def dedup_sorted(rows, mode: str, distance: int = 2, key="url", text_col="text", order=None):
    """Sorted-adjacency dedup (reference seq mode). ``rows``: list of dicts.

    Returns DedupResult. ``order``: callable row -> sortable arrival key
    (defaults to (warc_ts, url) when present, else input index).
    """
    if order is None:
        order = _default_order
    indexed = sorted(rows, key=lambda r: (r[text_col], order(r)))
    res = DedupResult(kept=[], clusters={})
    head_key = None
    state = None
    for r in indexed:
        t = r[text_col]
        if state is not None and _is_dup(mode, state, t, distance):
            res.clusters[head_key].append(r[key])
            res.duplicates += 1
            if mode == "loose" and len(t) > len(state):
                state = t  # comparison state advances; kept head row does not
        else:
            head_key = r[key]
            state = t
            res.kept.append(r)
            res.clusters[head_key] = [head_key]
        res.total += 1
    return res


def dedup_hash(rows, keys=("text",), key="url", order=None):
    """Exact keep-first dedup in arrival order (reference --fast mode).

    ``keys``: columns forming the composite identity (paired mode = several).
    """
    if order is None:
        order = _default_order
    res = DedupResult(kept=[], clusters={})
    seen = {}
    for r in sorted(rows, key=order):
        k = tuple((len(r[c]), r[c]) for c in keys)  # length folded in, like setRecord
        if k in seen:
            res.clusters[seen[k]].append(r[key])
            res.duplicates += 1
        else:
            seen[k] = r[key]
            res.kept.append(r)
            res.clusters[r[key]] = [r[key]]
        res.total += 1
    return res


def join_unordered(left, right, key="url"):
    """Inner join on ``key``; returns (pairs, unmatched_count).

    pairs: list of (left_row, right_row) for ids present on both sides (first
    occurrence per side wins if an id repeats); unmatched = rows whose id has
    no partner on the other side, summed over both sides.
    """
    li = {}
    for r in left:
        li.setdefault(r[key], r)
    ri = {}
    for r in right:
        ri.setdefault(r[key], r)
    common = sorted(set(li) & set(ri))
    pairs = [(li[k], ri[k]) for k in common]
    unmatched = (len(left) - sum(1 for r in left if r[key] in ri)) + (
        len(right) - sum(1 for r in right if r[key] in li)
    )
    return pairs, unmatched


def _default_order(r):
    if "warc_ts" in r:
        return (r["warc_ts"], r.get("url", ""))
    if "doc_id" in r:
        return r["doc_id"]
    return r.get("url", "")


def union_find_components(edges):
    """Driver-side union-find over (a, b) edges -> {node: root_min_label}.

    The correctness oracle for the distributed min-label-propagation
    components stage.
    """
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    # path-compress to min label: roots are already the min of their merge chain
    out = {}
    for node in list(parent):
        root = find(node)
        out[node] = root
    # ensure root label is the true min of each component
    comp_min = {}
    for node, root in out.items():
        comp_min[root] = min(comp_min.get(root, node), node)
    return {node: comp_min[root] for node, root in out.items()}
