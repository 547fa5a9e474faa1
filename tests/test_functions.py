"""Pure-function layer tests (no Ray)."""

import numpy as np
import pyarrow as pa
import pytest

from fastq_dupaway_ray.functions.hashing import (
    char_ngram_hashes,
    combine_hash64,
    containment,
    hamming64,
    hash64,
    jaccard,
    popcount64,
    rolling_fingerprint,
    word_ngram_hashes,
)
from fastq_dupaway_ray.functions.sketches import (
    MinHasher,
    MinHashParams,
    minhash_jaccard_estimate,
    simhash64,
    simhash_chunks,
)
from fastq_dupaway_ray.functions.textstats import (
    language_id,
    normalize_text,
    quality_features,
    token_count_bpe,
    token_count_ws,
)


def test_hash64_deterministic_and_distinct():
    a = hash64(["alpha", "beta", "alpha"])
    assert a.dtype == np.uint64
    assert a[0] == a[2] != a[1]
    assert (hash64(["alpha"]) == a[0]).all()  # cross-call stability


def test_combine_hash64_order_and_composite():
    x = hash64(["a", "b"])
    y = hash64(["c", "d"])
    c1 = combine_hash64(x, y)
    c2 = combine_hash64(y, x)
    assert c1[0] != c2[0]  # order-sensitive (left/right mates differ)
    assert len(np.unique(c1)) == 2


def test_popcount_and_hamming():
    x = np.array([0, 0xFF, 1 << 63], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 8, 1]
    a = np.array([0b1010], dtype=np.uint64)
    b = np.array([0b0110], dtype=np.uint64)
    assert hamming64(a, b)[0] == 2


def test_char_ngram_hashes_props():
    s = char_ngram_hashes("abcdefgh", 4)
    assert len(s) == 5  # 8-4+1 windows, all distinct here
    assert len(char_ngram_hashes("", 4)) == 0
    assert len(char_ngram_hashes("ab", 4)) == 1  # short doc -> whole-text shingle
    # identical text => identical shingles
    assert (char_ngram_hashes("same text", 4) == char_ngram_hashes("same text", 4)).all()


def test_jaccard_and_containment():
    a = char_ngram_hashes("the quick brown fox", 4)
    assert jaccard(a, a) == 1.0
    sup = char_ngram_hashes("the quick brown fox jumps over", 4)
    assert containment(a, sup) == 1.0  # prefix fully contained
    assert jaccard(a, sup) < 1.0


def test_rolling_fingerprint_deterministic():
    assert rolling_fingerprint("hello world " * 20) == rolling_fingerprint("hello world " * 20)
    assert rolling_fingerprint("hello") != rolling_fingerprint("hellp")
    assert rolling_fingerprint("") == 0


def test_minhash_estimates_jaccard():
    mh = MinHasher(MinHashParams(num_perms=128, shingle_k=5, bands=16, rows_per_band=8))
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "hazy")
    far = "entirely different content with no overlap whatsoever " * 5
    sa, sb, sc = mh.sign_text(base), mh.sign_text(near), mh.sign_text(far)
    true_ab = jaccard(char_ngram_hashes(base, 5), char_ngram_hashes(near, 5))
    est_ab = minhash_jaccard_estimate(sa, sb)
    assert abs(est_ab - true_ab) < 0.15
    assert minhash_jaccard_estimate(sa, sc) < 0.1
    assert minhash_jaccard_estimate(sa, mh.sign_text(base)) == 1.0


def test_band_keys_fold_band_index():
    mh = MinHasher()
    sig = mh.sign_text("some document text here")
    keys = mh.band_keys(sig)
    assert len(keys) == mh.params.bands
    assert len(np.unique(keys)) == len(keys)  # same rows, different band index


def test_minhash_params_validation():
    with pytest.raises(ValueError):
        MinHashParams(num_perms=100, bands=16, rows_per_band=8)


def test_simhash_near_far():
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("dog", "cat")
    far = "completely unrelated quarterly fiscal report content " * 3
    s = np.array([simhash64(base), simhash64(near), simhash64(far)], dtype=np.uint64)
    d_near = hamming64(s[:1], s[1:2])[0]
    d_far = hamming64(s[:1], s[2:3])[0]
    assert d_near < d_far
    assert simhash64(base) == simhash64(base)


def test_simhash_chunks_pigeonhole():
    # two sigs within distance d MUST share at least one chunk key
    rng = np.random.RandomState(0)
    for d in (1, 2, 3):
        for _ in range(50):
            a = rng.randint(0, 1 << 63, dtype=np.uint64)
            flip = rng.choice(64, size=d, replace=False)
            b = a
            for f in flip:
                b = np.uint64(b) ^ (np.uint64(1) << np.uint64(f))
            ka = simhash_chunks(np.array([a], dtype=np.uint64), d)[0]
            kb = simhash_chunks(np.array([b], dtype=np.uint64), d)[0]
            assert (ka == kb).any()


def test_token_counts():
    arr = pa.array(["a b c", "", "   ", "one", "x  y"])
    assert token_count_ws(arr).to_pylist() == [3, 0, 0, 1, 2]
    assert token_count_bpe(np.array(["hello, world 42"], dtype=object))[0] == 4


def test_normalize_text():
    out = normalize_text(pa.array(["  Hello   WORLD \t x "]))
    assert out[0].as_py() == "hello world x"


def test_quality_features_columns():
    t = quality_features(pa.table({"text": ["Hello, World! 42", ""]}))
    for c in ("n_chars", "n_tokens", "mean_token_len", "punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio"):
        assert c in t.schema.names
    assert t["n_chars"][1].as_py() == 0


def test_language_id():
    out = language_id(
        np.array(
            ["the cat and the dog of it to a in", "der hund und die katze ist nicht", "zzz qqq"],
            dtype=object,
        )
    )
    assert list(out) == ["en", "de", "und"]


def test_word_ngram_hashes():
    assert len(word_ngram_hashes("a b c d", 2)) == 3
    assert len(word_ngram_hashes("", 2)) == 0
    assert len(word_ngram_hashes("one", 3)) == 1


def test_png_codec_roundtrip():
    import numpy as np

    from fastq_dupaway_ray.functions.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (13, 21), dtype=np.uint8)
    assert (decode_png(encode_png(gray)) == gray).all()
    rgb = rng.randint(0, 256, (8, 5, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()


def test_png_decode_all_filters():
    """Decoder handles Sub/Up/Average/Paeth scanlines (spec §9), not just the
    filter-0 rows our encoder writes."""
    import struct
    import zlib

    import numpy as np

    from fastq_dupaway_ray.functions.codecs import PNG_MAGIC, decode_png

    h, w = 5, 6
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    # re-filter each row with a different filter type (bpp=1)
    rows = []
    prev = np.zeros(w, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].astype(np.int64)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - np.concatenate([[0], cur[:-1]])
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.concatenate([[0], cur[:-1]])
            enc = cur - (left + prev) // 2
        else:
            left = np.concatenate([[0], cur[:-1]])
            ul = np.concatenate([[0], prev[:-1]])
            p = left + prev - ul
            pred = np.where(
                (abs(p - left) <= abs(p - prev)) & (abs(p - left) <= abs(p - ul)),
                left,
                np.where(abs(p - prev) <= abs(p - ul), prev, ul),
            )
            enc = cur - pred
        rows.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(rows)

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    blob = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(blob) == img).all()


def test_wav_codec_roundtrip():
    import numpy as np

    from fastq_dupaway_ray.functions.codecs import decode_wav, encode_wav

    x = np.sin(np.linspace(0, 20, 1000)) * 0.5
    got, rate = decode_wav(encode_wav(x, rate=8000))
    assert rate == 8000
    assert len(got) == 1000
    assert np.abs(got - x).max() < 1e-4


def test_char_ngram_hashes_batch_matches_per_doc():
    """The batched shingling pass (one gather over the concatenated batch)
    must agree with per-doc char_ngram_hashes on every doc shape: long,
    exactly-k, shorter-than-k, empty, unicode."""
    from fastq_dupaway_ray.functions.hashing import char_ngram_hashes, char_ngram_hashes_batch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "", "short", "exactly8", "1234567", "ünïcødé — текст 漢字",
        "aaaaaaaaaaaaaaaa", None, "x",
    ]
    values, starts, counts = char_ngram_hashes_batch(texts, k=8)
    for i, t in enumerate(texts):
        got = values[starts[i] : starts[i] + counts[i]]
        want = char_ngram_hashes(t or "", k=8, unique=False)
        assert np.array_equal(got, want), (i, t)


def test_oph_batch_signatures_bit_identical():
    """signatures_oph_batch (flat scatter-min + batched densification) must be
    bit-identical to the per-doc signature_oph path — the oracle-checked LSH
    keys derive from these bits."""
    from fastq_dupaway_ray.functions.sketches import MinHasher, MinHashParams

    p = MinHashParams(scheme="oph")
    h = MinHasher(p)
    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "", "short", "the quick brown fox jumps over the lazy dog " * 4,
        "tiny", "a" * 7, "b" * 8, "common prefix with divergent tails A",
        "common prefix with divergent tails B",
    ]
    batch = h.signatures_oph_batch(texts)
    for i, t in enumerate(texts):
        per = h.sign_text(t or "")
        assert np.array_equal(batch[i], per), (i, t)
    # dispatch: signatures_batch routes char-shingle OPH through the batch path
    assert np.array_equal(h.signatures_batch(texts), batch)


def test_classic_batch_signatures_bit_identical():
    """signatures_classic_batch (lexsort-unique + per-perm reduceat) must be
    bit-identical to the per-doc signature(shingles_of(text)) path, incl.
    empty docs, sub-shingle docs, exact dups and a chunk-boundary batch."""
    from fastq_dupaway_ray.functions.sketches import MinHasher, MinHashParams

    p = MinHashParams()  # classic scheme, char shingles
    h = MinHasher(p)
    base = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "", "short", "the quick brown fox jumps over the lazy dog " * 4,
        "tiny", "a" * 7, "b" * 8, "common prefix with divergent tails A",
        "common prefix with divergent tails B", None,
    ]
    # exceed CLASSIC_CHUNK_DOCS so the chunked recursion seam is exercised
    texts = (base * ((h.CLASSIC_CHUNK_DOCS // len(base)) + 2))[: h.CLASSIC_CHUNK_DOCS + 7]
    batch = h.signatures_classic_batch(texts)
    for i, t in enumerate(texts):
        per = h.signature(p.shingles_of(t or ""))
        assert np.array_equal(batch[i], per), (i, t)
    assert np.array_equal(h.signatures_batch(texts), batch)


def test_redact_pii_kernel():
    import pyarrow as pa

    from fastq_dupaway_ray.functions.textstats import redact_pii

    clean, n = redact_pii(
        pa.array(
            [
                "write a.b+c@x-y.org today",
                "call 555-123-4567 or 555 987 6543",
                "nothing here",
                "",
                "two mails a@b.co c@d.io and 123-456-7890",
            ]
        )
    )
    assert clean.to_pylist() == [
        "write <EMAIL> today",
        "call <PHONE> or <PHONE>",
        "nothing here",
        "",
        "two mails <EMAIL> <EMAIL> and <PHONE>",
    ]
    assert n.to_pylist() == [1, 2, 0, 0, 3]


def test_token_count_bpe_tokenizer_modes():
    """Optional-dep contract: 'heuristic' is the oracle path; 'auto' equals
    tiktoken when importable else the heuristic; 'tiktoken' raises without
    the dep. Runs meaningfully in BOTH environments (no skip)."""
    import numpy as np
    import pytest

    from fastq_dupaway_ray.functions import textstats

    texts = np.array(["hello, world 42!", "", "a b  c"], dtype=object)
    heur = textstats.token_count_bpe(texts)  # default = heuristic
    assert heur.tolist() == [5, 0, 3]  # hello , world 42 !
    auto = textstats.token_count_bpe(texts, tokenizer="auto")
    if textstats._tiktoken_encoding() is None:
        assert auto.tolist() == heur.tolist()
        with pytest.raises(ImportError, match="tiktoken"):
            textstats.token_count_bpe(texts, tokenizer="tiktoken")
    else:  # pragma: no cover - container has no tiktoken
        real = textstats.token_count_bpe(texts, tokenizer="tiktoken")
        assert auto.tolist() == real.tolist()
        assert real[1] == 0 and (real[:1] > 0).all()
    with pytest.raises(ValueError, match="unknown tokenizer"):
        textstats.token_count_bpe(texts, tokenizer="gpt5")


def test_stratified_sample_deterministic_and_rate_accurate(ray_session):
    import hashlib

    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from fastq_dupaway_ray.stages.sampling import (
        fraction_threshold_hex,
        stratified_sample,
    )

    n = 20_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": np.where(np.arange(n) % 3 == 0, "en", "xx"),
        }
    )
    out1 = stratified_sample(
        rd.from_pandas(df).repartition(5), "lang", {"en": 0.5}, default=0.1
    ).to_pandas()
    out2 = stratified_sample(
        rd.from_pandas(df).repartition(13), "lang", {"en": 0.5}, default=0.1
    ).to_pandas()
    # identical verdicts at any partitioning
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    # rates within ~2% at 20k rows
    en = (df["lang"] == "en").sum()
    got_en = (out1["lang"] == "en").sum()
    assert abs(got_en / en - 0.5) < 0.02
    assert abs((len(out1) - got_en) / (n - en) - 0.1) < 0.02
    # the verdict matches the serial md5 rule exactly
    for row in out1.head(50).itertuples():
        frac = 0.5 if row.lang == "en" else 0.1
        assert hashlib.md5(str(row.doc_id).encode()).hexdigest()[:8] < fraction_threshold_hex(frac)
    # boundary fractions
    all_kept = stratified_sample(rd.from_pandas(df), "lang", {}, default=1.0).to_pandas()
    assert len(all_kept) == n
    none_kept = stratified_sample(rd.from_pandas(df), "lang", {}, default=0.0).to_pandas()
    assert len(none_kept) == 0
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(rd.from_pandas(df), "lang", {"en": 1.5})


def test_stratified_sample_null_strata_take_default(ray_session):
    """An entirely-null strata batch must not crash (factorize returns empty
    uniques) and null strata always sample at the default rate."""
    import pandas as pd
    import ray.data as rd

    from fastq_dupaway_ray.stages.sampling import stratified_sample

    all_null = pd.DataFrame({"doc_id": range(200), "lang": [None] * 200})
    kept = stratified_sample(
        rd.from_pandas(all_null), "lang", {"en": 0.0}, default=1.0
    ).to_pandas()
    assert len(kept) == 200  # default=1.0 keeps every null-stratum row
    dropped = stratified_sample(
        rd.from_pandas(all_null), "lang", {"en": 1.0}, default=0.0
    ).to_pandas()
    assert len(dropped) == 0
    # mixed batch: nulls at default, 'en' at its configured rate
    mixed = pd.DataFrame(
        {"doc_id": range(400), "lang": ["en", None] * 200}
    )
    out = stratified_sample(
        rd.from_pandas(mixed), "lang", {"en": 1.0}, default=0.0
    ).to_pandas()
    assert len(out) == 200 and (out["lang"] == "en").all()


def test_url_normalization_kernel_and_sql_parity():
    """normalize_urls and sql_normalize_expr are the SAME RE2 rule chain:
    byte-identical outputs, order-insensitive tracking-param removal,
    case/port/fragment canonicalization, non-URL passthrough."""
    import duckdb
    import pyarrow as pa

    from fastq_dupaway_ray.functions.urlnorm import (
        normalize_urls,
        sql_normalize_expr,
    )

    urls = [
        "HTTPS://WWW.Example.COM:443/Path?a=1&utm_source=x&b=2#frag",
        "http://example.com:80/?utm_campaign=z",
        "https://e.com/p?utm_a=1&utm_b=2&x=3",
        "https://e.com/p?x=3&utm_a=1&utm_b=2",
        "https://e.com/p?utm_a=1&utm_b=2",
        "https://e.com/p?gclid=g&fbclid=f",
        "ftp://Weird.Host/X",
        "no-scheme/path?utm_medium=m",
        "http://example.com:8080/keep-port",
        "https://example.com/CaseSensitive/Path",
        "",
    ]
    got = normalize_urls(pa.array(urls)).to_pylist()
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {sql_normalize_expr('u')} FROM (SELECT unnest($u::VARCHAR[]) AS u)",
            params={"u": urls},
        ).fetchall()
    ]
    assert got == want
    assert got[0] == "https://www.example.com/Path?a=1&b=2"
    assert got[2] == got[3] == "https://e.com/p?x=3"  # order-insensitive
    assert got[4] == got[5] == "https://e.com/p"
    assert got[8] == "http://example.com:8080/keep-port"  # non-default port kept
    assert got[9] == "https://example.com/CaseSensitive/Path"  # path case kept
