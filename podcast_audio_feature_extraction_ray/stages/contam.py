"""Eval-set contamination check (training-data hygiene, SURVEY §2-beyond).

For each TRAIN document, count its distinct word n-grams and how many of
them appear in ANY document of a small EVAL set — the benchmark
decontamination primitive a large-scale training pipeline runs before
training (the n-gram-overlap rule of GPT-3 appendix C / C4: a train doc
sharing n-grams with an eval benchmark leaks test data).

Ray-Data-first shape (the broadcast small-side pattern, same as the
reference's metadata-DF-in-``Searcher`` analog
``src/search/search.py:55-89``):

- the EVAL side is tiny by construction (benchmarks are a vanishing
  fraction of a 100 TB corpus), so its DISTINCT gram-hash set is reduced
  per batch (``np.unique``), collected once, and broadcast via
  ``ray.put`` — never re-shipped per batch;
- the TRAIN side streams through one ``map_batches``: vectorized word
  hashing (``hashing.hash_words`` — zero Python row loops), n-gram
  combination, per-doc distinct counting by one lexsort, and membership
  by one ``searchsorted`` against the broadcast set.

Counts are over 64-bit gram hashes; equality with a string-based oracle
assumes no 64-bit collisions (p ~ n^2 / 2^64 — negligible below ~10^9
distinct grams per doc/set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from podcast_audio_feature_extraction_ray import hashing


def _doc_grams(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(gram_hashes uint64[G], gram_offsets int64[rows+1]) per text.

    Winnowing rule (``short_gram=False``): texts with fewer than ``n``
    words yield NO grams — mirrors a SQL sliding window ``i+n-1 <=
    len(words)``."""
    wh, toff = hashing.hash_words(texts)
    return hashing.ngram_hashes(wh, toff, n, short_gram=False)


def eval_gram_hashes(eval_docs, n: int = 3, text_col: str = "text") -> np.ndarray:
    """Sorted distinct gram-hash set of the eval Dataset.

    Per-batch ``np.unique`` partials stream; only the DISTINCT hashes of
    the (small) eval side reach the driver — bounded by benchmark size,
    independent of train-corpus size."""

    def partial(batch: pa.Table) -> pa.Table:
        gh, _ = _doc_grams(batch[text_col], n)
        return pa.table({"g": pa.array(np.unique(gh).view(np.int64))})

    parts = eval_docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return np.unique(parts["g"].to_numpy().view(np.uint64))


def contamination_check(
    train_docs,
    eval_grams: np.ndarray,
    n: int = 3,
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
):
    """Per-train-doc ``(id_cols..., n_grams, n_contam)`` where
    ``n_grams`` = distinct word n-grams of the doc and ``n_contam`` =
    how many of those appear in ``eval_grams``. Docs with zero grams
    (fewer than ``n`` words) are dropped, mirroring the SQL GROUP BY
    over an exploded gram list."""
    ev_sorted = np.sort(np.asarray(eval_grams, dtype=np.uint64))
    ref = ray.put(ev_sorted)

    def fn(batch: pa.Table) -> pa.Table:
        gh, goff = _doc_grams(batch[text_col], n)
        d = len(goff) - 1
        per_doc = np.diff(goff)
        doc_idx = np.repeat(np.arange(d, dtype=np.int64), per_doc)
        order = np.lexsort((gh, doc_idx))
        gs, di = gh[order], doc_idx[order]
        first = np.ones(len(gs), dtype=bool)
        if len(gs) > 1:
            first[1:] = (di[1:] != di[:-1]) | (gs[1:] != gs[:-1])
        n_grams = np.bincount(di[first], minlength=d)
        ev = ray.get(ref)  # zero-copy plasma view, shared across tasks
        dg, dd = gs[first], di[first]
        pos = np.searchsorted(ev, dg)
        hit = np.zeros(len(dg), dtype=bool)
        if len(ev):
            safe = np.minimum(pos, len(ev) - 1)
            hit = (pos < len(ev)) & (ev[safe] == dg)
        n_contam = np.bincount(dd[hit], minlength=d)
        keep = n_grams > 0
        cols = {c: batch[c].filter(pa.array(keep)) for c in id_cols}
        cols["n_grams"] = pa.array(n_grams[keep].astype(np.int64))
        cols["n_contam"] = pa.array(n_contam[keep].astype(np.int64))
        return pa.table(cols)

    return train_docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
