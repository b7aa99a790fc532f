"""Bloom-filter sketch conformance: no false negatives, near-theory
false-positive rate, byte-identical filter on any block layout, and the
between-snapshot dedup gate semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from podcast_audio_feature_extraction_ray.stages import bloom

M_BITS = 1 << 16
K = 5


def _ids(batch: pa.Table) -> np.ndarray:
    return batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)


def _mk(keys: np.ndarray, parts: int) -> "rd.Dataset":
    return rd.from_pandas(pd.DataFrame({"key": keys.astype(np.int64)})).repartition(
        parts
    )


def test_no_false_negatives_and_fpr_near_theory():
    rng = np.random.default_rng(21)
    inserted = rng.choice(1 << 40, size=3_000, replace=False).astype(np.uint64)
    filt = bloom.bloom_build(_mk(inserted, 7), _ids, m_bits=M_BITS, k=K)

    got = bloom.bloom_probe(_mk(inserted, 3), filt, _ids).to_pandas()
    assert got.might_contain.all()  # the structural guarantee

    fresh = (rng.choice(1 << 40, size=20_000, replace=False) + (1 << 41)).astype(
        np.uint64
    )
    fp = bloom.bloom_probe(_mk(fresh, 5), filt, _ids).to_pandas().might_contain.mean()
    theory = (1 - np.exp(-K * len(inserted) / M_BITS)) ** K
    assert fp < 3 * theory + 0.01, (fp, theory)


def test_filter_is_layout_invariant():
    keys = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
    a = bloom.bloom_build(_mk(keys, 1), _ids, m_bits=M_BITS, k=K)
    rng = np.random.default_rng(4)
    b = bloom.bloom_build(
        _mk(rng.permutation(keys), 11), _ids, m_bits=M_BITS, k=K
    )
    assert a.k == b.k and np.array_equal(a.words, b.words)
    # loop-oracle: the same filter built by naive per-key insertion
    want = np.zeros(M_BITS // 64, dtype=np.uint64)
    pos = bloom._positions(keys, K, M_BITS)
    for p in pos.ravel():
        want[int(p) >> 6] |= np.uint64(1) << (p & np.uint64(63))
    assert np.array_equal(a.words, want)


def test_snapshot_dedup_gate():
    """bloom_filter_new drops EVERY previously-seen key and keeps ~all
    genuinely-new ones."""
    old = np.arange(2_000, dtype=np.uint64)
    new = np.arange(2_000, 4_000, dtype=np.uint64)
    filt = bloom.bloom_build(_mk(old, 4), _ids, m_bits=M_BITS, k=K)
    out = bloom.bloom_filter_new(
        _mk(np.concatenate([old, new]), 6), filt, _ids
    ).to_pandas()
    kept = set(out.key.astype(np.uint64))
    assert kept.isdisjoint(set(old))  # no seen key survives
    assert len(kept) > 0.97 * len(new)  # ~FPR sliver of new keys lost
    assert kept <= set(new)


def test_empty_and_guard():
    import pytest

    empty = _mk(np.array([], dtype=np.uint64), 1)
    filt = bloom.bloom_build(empty, _ids, m_bits=M_BITS, k=K)
    assert not filt.words.any()
    probed = bloom.bloom_probe(_mk(np.arange(5, dtype=np.uint64), 1), filt, _ids)
    assert not probed.to_pandas().might_contain.any()
    with pytest.raises(ValueError):
        bloom.bloom_build(empty, _ids, m_bits=100)
