"""DSIR-style importance resampling (training-data selection).

Public basis: Xie et al., *Data Selection for Language Models via
Importance Resampling* (NeurIPS 2023): featurize documents as hashed
n-gram bag counts (unigrams + bigrams into ``m`` buckets), fit two
add-k-smoothed categorical distributions — ``p`` from a small TARGET
corpus (the domain to select for), ``q`` from the RAW corpus — and
score each raw document with the bag importance log-weight

    log w(x) = sum over grams g of x:  log p(bucket(g)) - log q(bucket(g))

then keep the top-k raw documents by weight (the deterministic variant
of the paper's Gumbel resampling: same selected SET whenever weights
are distinct, and reproducible on any cluster size / shard layout,
which the sampled variant is not without a seed-per-doc contract).

Ray-Data-first shape (no reference analog — the reference has no data
selection; this extends the engine's curation family next to
``mix_sample``, ``unigram_nll_scores`` and ``contamination_check``):

- both distributions reduce to ONE dense ``m``-vector (m ~ 8k => 64 KB)
  via per-batch ``bincount`` partials + a tiny groupby — the shuffle
  moves at most ``m`` rows per batch (the ``vocab_topk`` bound), never
  grams;
- the per-bucket log-ratio table is computed ONCE on the driver,
  QUANTIZED to 2^-28 units (int64) and broadcast via ``ray.put``:
  per-doc sums are then exact integers — order-independent,
  layout-invariant, reproducible by the pytest loop oracle (the
  ``unigram_nll_scores`` idiom).  |lr_q| < 64 * 2^28 < 2^34, so int64
  cumsums stay exact up to ~2^29 grams per batch;
- scoring is one stateless ``map_batches``: vectorized hashing
  (``hashing.hash_words`` / ``ngram_hashes``), ``bucket = hash mod m``,
  per-doc sums by cumsum-diff.  Zero Python row loops, zero shuffle.

Like ``bm25_topk`` this is a two-pass design over the raw corpus (one
stats scan for ``q``, one scoring scan); the target side is small by
construction (a benchmark / curated-domain sample) and never leaves its
one partial-reduce.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray

from podcast_audio_feature_extraction_ray import hashing
from podcast_audio_feature_extraction_ray.arrow_utils import typed_empty_table
from podcast_audio_feature_extraction_ray.stages import topk

DSIR_SCALE = 2 ** 28  # log-ratio quantization grid (exact int64 doc sums)


def _gram_levels(texts, ngram_max: int):
    """[(gram_hashes uint64[G_n], offsets int64[rows+1]) for n=1..ngram_max].

    Every level (including unigrams) goes through ``ngram_hashes`` so a
    level-n gram hash is ``combine_hashes([word_hash(w) for w in gram])``
    — one uniform rule the loop oracle replays.  Winnowing rule
    (``short_gram=False``): texts shorter than ``n`` words contribute no
    level-n grams."""
    wh, toff = hashing.hash_words(texts)
    return [
        hashing.ngram_hashes(wh, toff, n, short_gram=False)
        for n in range(1, ngram_max + 1)
    ]


def hashed_bucket_counts(
    ds, m: int = 8192, text_col: str = "text", ngram_max: int = 2
) -> np.ndarray:
    """Dense ``int64[m]`` hashed-gram bucket counts over a Dataset.

    Per-batch partials emit at most ``m`` (bucket, n) rows regardless of
    batch token volume; one small groupby sums them and the bounded
    result lands on the driver as a single dense vector."""

    mm = np.uint64(m)

    def partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(m, dtype=np.int64)
        for gh, _ in _gram_levels(batch[text_col], ngram_max):
            if len(gh):
                counts += np.bincount((gh % mm).astype(np.int64), minlength=m)
        nz = np.flatnonzero(counts)
        if len(nz) == 0:
            return typed_empty_table({"bucket": pa.int64(), "n": pa.int64()})
        return pa.table({"bucket": pa.array(nz), "n": pa.array(counts[nz])})

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: <= m rows
    )
    out = np.zeros(m, dtype=np.int64)
    if len(agg):
        out[agg["bucket"].to_numpy()] = agg["n"].to_numpy()
    return out


def dsir_log_ratio(
    target_counts: np.ndarray, raw_counts: np.ndarray, k_smooth: int = 1
) -> np.ndarray:
    """Quantized per-bucket log-ratio table ``int64[m]`` in 2^-28 units:
    ``round((log p_target(b) - log q_raw(b)) * 2^28)`` with add-k
    smoothing on both sides.  Driver-side once over the tiny table; the
    per-bucket loop mirrors the loop oracle exactly (libm ``log`` on
    identical doubles)."""
    m = len(target_counts)
    if len(raw_counts) != m:
        raise ValueError(f"bucket-count length mismatch: {m} vs {len(raw_counts)}")
    t_tot = int(target_counts.sum()) + k_smooth * m
    r_tot = int(raw_counts.sum()) + k_smooth * m
    lr = np.empty(m, dtype=np.int64)
    for b in range(m):
        p = (int(target_counts[b]) + k_smooth) / t_tot
        q = (int(raw_counts[b]) + k_smooth) / r_tot
        lr[b] = round((math.log(p) - math.log(q)) * DSIR_SCALE)
    return lr


def dsir_weights(
    ds,
    lr_q: np.ndarray,
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
    ngram_max: int = 2,
):
    """Per-doc ``(id_cols..., n_grams, logw_q, logw)``.

    ``logw_q`` = exact int64 sum of the doc's grams' quantized
    log-ratios (layout-invariant); ``logw = logw_q / 2^28`` for human
    use.  Docs with zero grams score 0 (the empty bag)."""
    m = len(lr_q)
    mm = np.uint64(m)
    ref = ray.put(np.ascontiguousarray(lr_q, dtype=np.int64))

    def fn(batch: pa.Table) -> pa.Table:
        lr = ray.get(ref)  # zero-copy plasma view, shared across tasks
        nt = batch.num_rows
        s = np.zeros(nt, dtype=np.int64)
        g = np.zeros(nt, dtype=np.int64)
        for gh, goff in _gram_levels(batch[text_col], ngram_max):
            contrib = lr[(gh % mm).astype(np.int64)]
            csum = np.zeros(len(contrib) + 1, dtype=np.int64)
            np.cumsum(contrib, out=csum[1:])
            s += csum[goff[1:]] - csum[goff[:-1]]
            g += np.diff(goff)
        cols = {c: batch[c] for c in id_cols}
        cols["n_grams"] = pa.array(g)
        cols["logw_q"] = pa.array(s)
        cols["logw"] = pa.array(s.astype(np.float64) / DSIR_SCALE)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def dsir_select(
    raw_ds,
    target_ds,
    k: int,
    m: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_max: int = 2,
    k_smooth: int = 1,
):
    """End-to-end DSIR selection: top-k raw docs by importance weight
    (ties broken ascending on ``id_col`` — fully deterministic).

    Two scans of ``raw_ds`` (stats, then scoring — the ``bm25_topk``
    two-pass shape) plus one scan of the small ``target_ds``."""
    t_counts = hashed_bucket_counts(target_ds, m, text_col, ngram_max)
    r_counts = hashed_bucket_counts(raw_ds, m, text_col, ngram_max)
    lr_q = dsir_log_ratio(t_counts, r_counts, k_smooth)
    w = dsir_weights(raw_ds, lr_q, text_col, (id_col,), ngram_max)
    return topk.top_k(w, "logw_q", k, tiebreak=[id_col])
