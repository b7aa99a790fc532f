"""Bloom-filter membership sketch (the cross-snapshot dedup primitive).

Public basis: Bloom 1970; Kirsch–Mitzenmacher 2006 double hashing; the
"seen-before" URL/document filter public LLM-data pipelines run between
crawl snapshots (e.g. Dolma's bloom-filter dedup pass) — probabilistic
membership with NO false negatives and a tunable false-positive rate
(~ (1 - e^{-k·n/m})^k).

Scale shape (the HyperLogLog twin, ``stages/sketch.py``): per-batch
partials are SPARSE ``(word, bits)`` rows — at most ``min(k·rows,
m/64)`` per batch regardless of input size — and ONE groupby with an
associative/commutative bitwise-OR aggregate merges them, so any block
layout / cluster size yields the byte-IDENTICAL filter. The finished
filter is a fixed ``uint64[m/64]`` array (1 MiB at m = 2^23), broadcast
once via ``ray.put`` for the streaming probe pass.

Hashing is deterministic double hashing from two splitmix64 passes:
``pos_i = (h1 + i·h2) mod m`` with ``h2`` forced odd — stable across
runs, machines and cluster sizes (no seeds, no process salt).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pyarrow as pa
import ray

from podcast_audio_feature_extraction_ray import hashing

_BLOOM_TWEAK = np.uint64(0x2545F4914F6CDD1D)  # xorshift* multiplier (public)


class BloomFilter(NamedTuple):
    words: np.ndarray  # uint64[m/64] bit words
    k: int  # number of hash probes

    @property
    def m_bits(self) -> int:
        return len(self.words) * 64


def _positions(keys: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """``uint64[n, k]`` bit positions via double hashing (h2 odd)."""
    h = np.ascontiguousarray(keys, dtype=np.uint64)
    h1 = hashing.mix64(h)
    h2 = hashing.mix64(h1 ^ _BLOOM_TWEAK) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def bloom_build(ds, value_fn, m_bits: int = 1 << 23, k: int = 7) -> BloomFilter:
    """Build the filter over a Dataset.

    ``value_fn(batch: pa.Table) -> uint64-ish ndarray`` yields the keys
    to insert (pre-hash domain — id hashes, ``hashing.hash_words``
    output, ``content_hash128`` halves). ``m_bits`` must be a multiple
    of 64. The groupby shuffle carries sparse or-ed words, never keys.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(value_fn(batch), dtype=np.uint64)
        if len(keys) == 0:
            return pa.table(
                {"word": pa.array([], pa.int64()), "bits": pa.array([], pa.int64())}
            )
        pos = _positions(keys, k, m_bits).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        order = np.argsort(word, kind="stable")
        w, b = word[order], bit[order]
        starts = np.flatnonzero(np.concatenate([[True], w[1:] != w[:-1]]))
        return pa.table(
            {
                "word": pa.array(w[starts]),
                "bits": pa.array(np.bitwise_or.reduceat(b, starts).view(np.int64)),
            }
        )

    def acc_block(a: int, blk) -> int:
        # accumulator stays a SIGNED-int64-range Python int (two's
        # complement OR is sign-consistent), so the result column round-
        # trips through Arrow int64 without overflow
        col = blk["bits"]
        arr = col.to_numpy() if hasattr(col, "to_numpy") else np.asarray(col)
        return a | (int(np.bitwise_or.reduce(arr.view(np.int64))) if len(arr) else 0)

    from ray.data.aggregate import AggregateFn

    agg = AggregateFn(
        init=lambda _k: 0,
        merge=lambda a, b: a | b,
        accumulate_block=acc_block,
        name="bits_or",
    )
    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(agg)
        .to_pandas()  # bounded: <= m_bits/64 rows (1 MiB words at 2^23 bits)
    )
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(rows):
        words[rows["word"].to_numpy()] = (
            rows["bits_or"].to_numpy().astype(np.int64).view(np.uint64)
        )
    return BloomFilter(words=words, k=k)


def bloom_probe(ds, filt: BloomFilter, value_fn, out_col: str = "might_contain"):
    """Append a boolean ``out_col``: True iff the row's key MIGHT be in
    the filter (never false for inserted keys). One stateless
    map_batches; the filter ships once via ``ray.put``."""
    m_bits, k = filt.m_bits, filt.k
    ref = ray.put(np.ascontiguousarray(filt.words, dtype=np.uint64))

    def fn(batch: pa.Table) -> pa.Table:
        words = ray.get(ref)  # zero-copy plasma view, shared across tasks
        keys = np.asarray(value_fn(batch), dtype=np.uint64)
        if len(keys) == 0:
            hit = np.zeros(0, dtype=bool)
        else:
            pos = _positions(keys, k, m_bits)
            w = (pos >> np.uint64(6)).astype(np.int64)
            b = np.uint64(1) << (pos & np.uint64(63))
            hit = ((words[w] & b) != 0).all(axis=1)
        return batch.append_column(out_col, pa.array(hit))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bloom_filter_new(ds, filt: BloomFilter, value_fn):
    """Keep only rows whose key is definitely NOT in the filter — the
    between-snapshot dedup gate (drops all previously-seen keys plus an
    ~FPR sliver of genuinely-new ones; never resurfaces a seen key)."""
    probed = bloom_probe(ds, filt, value_fn, out_col="__seen")

    def drop(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(batch["__seen"])).drop_columns(["__seen"])

    return probed.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
