"""Cardinality sketch: distributed HyperLogLog.

The exact-distinct path (``distinct_values``) shuffles every distinct
value once; at open-domain 100-TB scale the right operator is a SKETCH
whose merge is a tiny fixed-size register max — per-batch partials are
``m`` registers per key regardless of input size, the ONE groupby moves
``m x keys x batches`` small ints, and merge is associative/commutative
(any partition layout gives the identical estimate; Flajolet et al.
2007). splitmix64 hashing keeps the sketch deterministic across runs,
machines and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from podcast_audio_feature_extraction_ray import hashing

# leading zeros per byte value (8 for 0)
_CLZ8 = np.array([8] + [8 - v.bit_length() for v in range(1, 256)], dtype=np.int64)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (byte-LUT passes)."""
    clz = np.full(x.shape, 64, dtype=np.int64)
    found = np.zeros(x.shape, dtype=bool)
    for i in range(8):  # top byte first
        b = ((x >> np.uint64(56 - 8 * i)) & np.uint64(0xFF)).astype(np.int64)
        nz = ~found & (b > 0)
        clz[nz] = 8 * i + _CLZ8[b[nz]]
        found |= b > 0
    return clz


def hll_distinct(ds, value_fn, key_col: str = "source", p: int = 8):
    """HyperLogLog distinct-count per ``key_col``.

    ``value_fn(batch) -> (values_uint64ish, key_idx)``: the flat values
    to count (pre-hash domain, any ints) and, per value, the row index
    into the batch's key column. ``p`` register bits (m = 2^p).

    Returns a small pandas DataFrame (one row per key):
    ``key, est_distinct (float), registers_nonzero``.
    """
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        vals, row_idx = value_fn(batch)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return pa.table(
                {key_col: pa.array([], pa.string()),
                 "reg": pa.array([], pa.int64()),
                 "r": pa.array([], pa.int64())}
            )
        h = hashing.mix64(np.asarray(vals, dtype=np.uint64))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)  # remaining 64-p bits, top-aligned
        rank = np.minimum(_clz64(w) + 1, 64 - p + 1)
        ku, kc = np.unique(keys[row_idx], return_inverse=True)
        regs = np.zeros(len(ku) * m, dtype=np.int64)
        np.maximum.at(regs, kc * m + reg, rank)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                key_col: pa.array(ku[nz // m], pa.string()),
                "reg": pa.array(nz % m),
                "r": pa.array(regs[nz]),
            }
        )

    from ray.data.aggregate import Max

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "reg"])
        .aggregate(Max("r", alias_name="r"))
        .to_pandas()  # bounded: m x n_keys rows
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rows = []
    for key, g in merged.groupby(key_col, sort=True):
        regs = np.zeros(m, dtype=np.int64)
        regs[g["reg"].to_numpy()] = g["r"].to_numpy()
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros > 0:  # small-range linear counting
            est = m * np.log(m / zeros)
        rows.append((key, float(est), int(m - zeros)))
    import pandas as pd

    return pd.DataFrame(rows, columns=[key_col, "est_distinct", "registers_nonzero"])
