"""The vectorized hash primitives must equal their pure-Python
references exactly (determinism is what makes the dedup family's
loop oracles meaningful)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from podcast_audio_feature_extraction_ray import hashing as H

TEXTS = [
    "hello world foo bar",
    "  lead  trail  ",
    "",
    "one",
    "a b",
    "x y z w v",
    None,
    "unicode żółć ünïcode test words here",
]


def test_word_hashes_match_reference():
    wh, toff = H.hash_words(pa.array(TEXTS))
    for i, t in enumerate(TEXTS):
        words = (t or "").split()
        assert [int(x) for x in wh[toff[i] : toff[i + 1]]] == [
            H.word_hash(w) for w in words
        ]


def test_ngram_hashes_match_reference():
    wh, toff = H.hash_words(pa.array(TEXTS))
    for n in (2, 3, 5):
        gh, goff = H.ngram_hashes(wh, toff, n)
        for i, t in enumerate(TEXTS):
            words = (t or "").split()
            whs = [H.word_hash(w) for w in words]
            if not words:
                ref = []
            elif len(words) < n:
                ref = [H.combine_hashes(whs)]
            else:
                ref = [
                    H.combine_hashes(whs[j : j + n])
                    for j in range(len(words) - n + 1)
                ]
            assert [int(x) for x in gh[goff[i] : goff[i + 1]]] == ref
        # winnowing rule: short texts yield nothing
        gh2, goff2 = H.ngram_hashes(wh, toff, n, short_gram=False)
        for i, t in enumerate(TEXTS):
            W = len((t or "").split())
            assert goff2[i + 1] - goff2[i] == (W - n + 1 if W >= n else 0)


def test_minhash_and_bands_match_reference():
    rng = np.random.default_rng(1717)
    a = (rng.integers(0, 1 << 63, size=16, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 1 << 64, size=16, dtype=np.uint64)
    wh, toff = H.hash_words(pa.array(TEXTS))
    gh, goff = H.ngram_hashes(wh, toff, 3)
    sig = H.minhash_sigs(gh, goff, a, b, chunk_grams=4)  # tiny chunks
    for i in range(len(TEXTS)):
        g = gh[goff[i] : goff[i + 1]]
        if len(g) == 0:
            ref = np.full(16, H.EMPTY_SENTINEL, np.uint64)
        else:
            ref = (a[:, None] * g[None, :] + b[:, None]).min(axis=1)
        np.testing.assert_array_equal(sig[i], ref)
    bh = H.band_hashes(sig, 4)
    for i in range(len(TEXTS)):
        for bi in range(4):
            assert int(bh[i, bi]) == H.combine_hashes(sig[i, bi * 4 : (bi + 1) * 4])


def test_simhash_and_popcount_match_reference():
    from podcast_audio_feature_extraction_ray.stages.dedup import simhash64

    wh, toff = H.hash_words(pa.array(TEXTS))
    sh = H.simhash_batch(wh, toff)
    for i, t in enumerate(TEXTS):
        assert int(sh[i]) == simhash64(t or "")
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 64, size=257, dtype=np.uint64)
    np.testing.assert_array_equal(
        H.popcount64(x), [bin(int(v)).count("1") for v in x]
    )


def test_hash_words_property_random_texts():
    """Property: vectorized path equals the per-row reference on random
    unicode-ish texts (hypothesis-style generation, fixed seed)."""
    import random

    rng = random.Random(1234)
    alphabet = "abc ABC żó 0123 \t\n  .!?"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ]
    wh, toff = H.hash_words(pa.array(texts))
    for i, t in enumerate(texts):
        assert [int(x) for x in wh[toff[i] : toff[i + 1]]] == [
            H.word_hash(w) for w in t.split()
        ], repr(t)
    # simhash + minhash consistency on the same corpus
    from podcast_audio_feature_extraction_ray.stages import dedup

    a, b = dedup._perm_params(32)
    gh, goff = H.ngram_hashes(wh, toff, 2)
    sig = H.minhash_sigs(gh, goff, a, b)
    sh = H.simhash_batch(wh, toff)
    for i in rng.sample(range(len(texts)), 40):
        np.testing.assert_array_equal(
            sig[i], dedup.minhash_signature(texts[i], 32, 2, a, b)
        )
        assert int(sh[i]) == dedup.simhash64(texts[i])


def test_hash_words_large_string_offsets():
    """Ray Data can promote string columns to large_string (int64
    offsets); hash_words must read the right offset width (round-2
    ADVICE: silent hash corruption otherwise)."""
    small = pa.array(TEXTS, type=pa.string())
    large = pa.array(TEXTS, type=pa.large_string())
    wh_s, off_s = H.hash_words(small)
    wh_l, off_l = H.hash_words(large)
    assert np.array_equal(off_s, off_l)
    assert np.array_equal(wh_s, wh_l)


def test_pow_table_no_overflow_warning():
    """Intentional uint64 wraparound must not emit RuntimeWarning or
    trip np.errstate(over='raise')."""
    import podcast_audio_feature_extraction_ray.hashing as hh

    hh._POW_CACHE = np.array([1], dtype=np.uint64)  # force regrow
    with np.errstate(over="raise"):
        t = hh._pow_table(70)
    assert t[0] == 1 and len(t) >= 71


def test_combined_key_hash_no_equal_column_collapse():
    """The rotate-XOR combine must NOT collapse keys whose columns hold
    equal values (plain XOR maps every (x, x) to 0 — one hot bucket)."""
    import pandas as pd

    from podcast_audio_feature_extraction_ray.hashing import combined_key_hash

    vals = [f"k{i:04d}" for i in range(256)]
    h = combined_key_hash([pd.Series(vals), pd.Series(vals)])
    assert len(np.unique(h)) > 200  # distinct (x, x) keys stay distinct
    # deterministic across calls (process-stable bucketing contract)
    h2 = combined_key_hash([pd.Series(vals), pd.Series(vals)])
    assert np.array_equal(h, h2)
    # single-column form equals the underlying pandas row hash
    one = combined_key_hash([pd.Series(vals)])
    want = pd.util.hash_pandas_object(pd.Series(vals), index=False).to_numpy(
        dtype=np.uint64
    )
    assert np.array_equal(one, want)


def test_content_hash128_matches_reference():
    """Vectorized 128-bit content hash == per-row loop reference, across
    plain/large string arrays, slices (nonzero offsets), nulls, unicode,
    and randomized strings."""
    rng = np.random.default_rng(99)
    alphabet = list("abc déf\t中文🙂\n")
    texts = ["", "a", "x" * 4096, None] + [
        "".join(rng.choice(alphabet, size=rng.integers(0, 60)))
        for _ in range(120)
    ]
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(texts, type=typ)
        lo, hi = H.content_hash128(arr)
        for t, l, h in zip(texts, lo, hi):
            wl, wh = H.content_hash128_py(t or "")
            assert (int(l), int(h)) == (wl, wh)
        s = arr.slice(3, 50)
        lo2, hi2 = H.content_hash128(s)
        assert np.array_equal(lo2, lo[3:53]) and np.array_equal(hi2, hi[3:53])
    # the two 64-bit halves are decorrelated: no (lo == hi) coincidences
    arr = pa.array([t for t in texts if t], type=pa.string())
    lo, hi = H.content_hash128(arr)
    assert not (lo == hi).any()
    assert len(np.unique(lo)) == len(set(t for t in texts if t))


def test_exact_dedup_fast128_groups_like_md5():
    """exact_dedup(digest="fast128") produces the SAME grouping (dup
    counts + kept ids) as the md5 oracle path — only the key encoding
    differs."""
    import pandas as pd
    import ray.data as rd

    from podcast_audio_feature_extraction_ray.stages.dedup import exact_dedup

    rng = np.random.default_rng(5)
    base = [f"document body {i}" for i in range(40)]
    texts = [base[rng.integers(0, 40)] for _ in range(300)] + ["", None]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df).repartition(5)

    md5_out = exact_dedup(ds).to_pandas()
    fast_out = exact_dedup(ds, digest="fast128").to_pandas()
    assert set(fast_out.columns) == {"h_lo", "h_hi", "n_dups", "keep_doc_id"}
    # same group structure: compare (n_dups, keep_doc_id) multisets and
    # per-kept-id dup counts (kept id identifies the group content)
    a = md5_out.sort_values("keep_doc_id")[["keep_doc_id", "n_dups"]].reset_index(drop=True)
    b = fast_out.sort_values("keep_doc_id")[["keep_doc_id", "n_dups"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # "" and null land in the SAME group on both paths
    null_group = fast_out[fast_out.keep_doc_id == 300]
    assert len(null_group) == 1 and int(null_group.n_dups.iloc[0]) == 2
