"""Text analysis stages: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All per-doc computations are Arrow-vectorized (``pyarrow.compute`` string
kernels + numpy reduceat over list offsets) — no Python loop over rows in
``lang_quality``/``token_count``. The fingerprint stage is loop-per-doc
(rolling hash is inherently sequential per doc) but vectorized across
the window minimum (winnowing) per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on with as at by"
).split()

MERSENNE61 = (1 << 61) - 1
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def lang_quality(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Quality/language heuristics per document.

    Columns (names shared with the SQL oracle): n_words, n_stop,
    stop_ratio (= n_stop/n_words, identical single division in SQL),
    n_alpha, mean_word_len, is_en (stop_ratio > 0.09).
    """
    stop_set = pa.array(STOPWORDS, type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        words = pc.split_pattern(pc.utf8_lower(txt), " ")
        offsets = words.offsets.to_numpy().astype(np.int64)
        flat = words.values
        lens = np.diff(offsets)  # always >= 1: split("") -> [""]

        def per_row_sum(flat_arr) -> np.ndarray:
            arr = flat_arr.to_numpy(zero_copy_only=False)[: offsets[-1]]
            return np.add.reduceat(arr, offsets[:-1], dtype=np.int64)

        n_stop = per_row_sum(pc.is_in(flat, value_set=stop_set))
        n_alpha = per_row_sum(pc.match_substring_regex(flat, r"^[a-z]+$"))
        sum_len = per_row_sum(pc.utf8_length(flat))
        n_words = lens.astype(np.int64)
        stop_ratio = n_stop / n_words  # n_words >= 1 (split of "" -> [""])
        mean_word_len = sum_len / n_words
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "n_stop": pa.array(n_stop),
                "stop_ratio": pa.array(stop_ratio),
                "n_alpha": pa.array(n_alpha),
                "mean_word_len": pa.array(mean_word_len),
                "is_en": pa.array(stop_ratio > 0.09),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_count(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Whitespace + BPE-ish regex token counts (reference G2 analog,
    ``src/search/index.py:33-36``). Columns: n_ws_tokens, n_re_tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ws = pc.list_value_length(pc.split_pattern(txt, " ")).cast(pa.int64())
        re_n = pc.count_substring_regex(txt, TOKEN_RE).cast(pa.int64())
        return pa.table(
            {id_col: batch[id_col], "n_ws_tokens": ws, "n_re_tokens": re_n}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def rolling_fingerprints(words: list[str], k: int = 5, w: int = 8) -> list[int]:
    """Winnowing: k-gram rolling polynomial hashes, min per window of w.

    Deterministic; returns the sorted distinct selected fingerprints."""
    B = 1315423911
    hs = []
    for i in range(len(words) - k + 1):
        h = 0
        for wd in words[i : i + k]:
            for ch in wd.encode("utf-8"):
                h = (h * B + ch) % MERSENNE61
            h = (h * B + 0x1F) % MERSENNE61
        hs.append(h)
    if not hs:
        return []
    hs = np.array(hs, dtype=np.uint64)
    if len(hs) <= w:
        return [int(hs.min())]
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(hs, w).min(axis=1)
    return sorted({int(x) for x in mins})


def doc_fingerprint(ds, id_col: str = "doc_id", text_col: str = "text", k: int = 5, w: int = 8):
    """Per-doc winnowing fingerprint set + compact signature."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        fps = [rolling_fingerprints(t.split(), k, w) for t in batch[text_col].to_pylist()]
        sig = [int(min(f)) if f else -1 for f in fps]
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_fingerprints": pa.array([len(f) for f in fps], type=pa.int64()),
                "min_fingerprint": pa.array(sig, type=pa.int64()),
                "fingerprints": pa.array(
                    [[x & 0x7FFFFFFFFFFFFFFF for x in f] for f in fps],
                    type=pa.list_(pa.int64()),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def train_test_split(ds, id_col: str = "doc_id", test_hex: str = "012"):
    """Deterministic split by content-stable hash of the id: docs whose
    ``md5(id)`` first hex digit falls in ``test_hex`` go to 'test'
    (~len(test_hex)/16 fraction). Stable across runs/machines/cluster
    sizes — the property a training pipeline needs from its split."""
    import hashlib

    import pyarrow as pa

    tset = set(test_hex)

    def fn(batch: pa.Table) -> pa.Table:
        ids = [str(x) for x in batch[id_col].to_pylist()]
        lab = [
            "test" if hashlib.md5(i.encode()).hexdigest()[0] in tset else "train"
            for i in ids
        ]
        return pa.table({id_col: batch[id_col], "split": pa.array(lab)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
