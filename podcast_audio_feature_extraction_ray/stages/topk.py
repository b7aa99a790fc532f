"""Ranking / sampling operators (SURVEY §2.7 T1/T2/T4).

- ``top_k``           — global top-k by score (reference
  ``src/search/search.py:355-358``): per-batch partial top-k inside
  ``map_batches`` (prunes the sort input), then a small global
  ``sort + limit``. At scale the all-to-all sort only ever sees
  ``k × num_batches`` rows.
- ``top_k_backfill``  — filter by predicate, take top-k; if fewer than k
  survive, BACKFILL the remainder from the rejected rows in rank order —
  ordered union of two ranked lists (reference mood rerankers,
  ``src/search/search.py:360-455``). Implemented as one pass: rank by
  (predicate DESC, score DESC) and take k — identical output, no second
  scan.
- ``stride_sample``   — every-j-th-row-within-first-m per entity slice
  (reference ``create_vggish_features.py:27`` ``[:6000:5]``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def top_k(ds, score_col: str, k: int, tiebreak: list[str] | None = None, descending: bool = True):
    keys = [(score_col, "descending" if descending else "ascending")] + [
        (c, "ascending") for c in (tiebreak or [])
    ]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.select_k_unstable(batch, k=k, sort_keys=keys)
        return batch.take(idx)

    pruned = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = pruned.sort(
        [score_col] + (tiebreak or []),
        descending=[descending] + [False] * len(tiebreak or []),
    ).limit(k)
    return out


def top_k_backfill(ds, score_col: str, k: int, predicate, tiebreak: list[str] | None = None):
    """Filter→top-k with rank-ordered backfill from the rejects.

    ``predicate(batch: pa.Table) -> BooleanArray``. Equivalent to the
    reference's "accepted then rerank_topical remainder" ordered union
    (``src/search/search.py:360-384``), expressed as a single ranking:
    sort by (pass DESC, score DESC, tiebreak) and take k.
    """

    def add_pass(batch: pa.Table) -> pa.Table:
        m = predicate(batch)
        return batch.append_column("__pass", pc.cast(m, pa.int8()))

    keys = [("__pass", "descending"), (score_col, "descending")] + [
        (c, "ascending") for c in (tiebreak or [])
    ]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        return batch.take(pc.select_k_unstable(batch, k=k, sort_keys=keys))

    tagged = ds.map_batches(add_pass, batch_format="pyarrow", zero_copy_batch=True)
    pruned = tagged.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        pruned.sort(
            ["__pass", score_col] + (tiebreak or []),
            descending=[True, True] + [False] * len(tiebreak or []),
        )
        .limit(k)
        .drop_columns(["__pass"])
    )
    return out


def stride_sample(
    ds,
    entity_key=("doc_id",),
    order_key=("seq_no",),
    first: int = 6000,
    step: int = 5,
    num_buckets: int = 64,
):
    """Per-entity ``[:first:step]`` row slice (T4/M5 analog).

    Bucketed vectorized: entities hash into O(cores) buckets; each bucket
    block is sorted once and ALL its entities are sliced in one numpy
    pass (position-in-run modulo mask) — Python overhead is
    O(num_buckets), not O(num_entities)."""
    from podcast_audio_feature_extraction_ray.stages.sessionize import (
        _entity_runs,
        _tag_buckets,
    )

    ek, ok = tuple(entity_key), tuple(order_key)

    def per_bucket(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group.select([*ek, *ok]),
            sort_keys=[(c, "ascending") for c in (*ek, *ok)],
        )
        g = group.take(order).drop_columns(["__bucket"])
        n = g.num_rows
        if n == 0:
            return g
        change = _entity_runs(g, ek)
        starts = np.flatnonzero(change)
        runs = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, runs)
        keep = (pos < first) & (pos % step == 0)
        return g.take(pa.array(np.flatnonzero(keep)))

    return (
        _tag_buckets(ds, ek, num_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_top_k(ds, key_cols: list[str], score_col: str, k: int,
                  tiebreak: list[str] | None = None):
    """Per-GROUP top-k (T1's global ranking, partitioned): the top ``k``
    rows by ``score_col`` desc (+ ``tiebreak`` asc) within each
    ``key_cols`` group, with a dense 1-based ``rank`` column.

    Scale shape: every batch is pruned to <= k rows PER KEY PRESENT
    (vectorized lexsort + segmented rank, no per-key Python loop)
    before the one hash shuffle, so the exchange carries at most
    ``k x n_keys x n_batches`` rows — quota selection ("best k docs per
    source") over an arbitrarily large corpus. Final per-group rank via
    ``groupby().map_groups`` on the pruned residue.
    """
    tb = list(tiebreak or [])

    def _rank_within(batch: pa.Table) -> np.ndarray:
        # vectorized rank-within-key: lexsort by (keys asc, score desc,
        # tiebreak asc), then position minus segment start
        cols = []
        for c in reversed(tb):
            cols.append(batch[c].to_numpy(zero_copy_only=False))
        score = batch[score_col].to_numpy(zero_copy_only=False)
        cols.append(-score if score.dtype.kind in "if" else np.negative(score.astype(np.int64)))
        keys = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
        # string keys: factorize for lexsort (grouping only needs
        # contiguity of equal keys, not a global key order)
        keys = [
            np.unique(kk, return_inverse=True)[1] if kk.dtype == object else kk
            for kk in keys
        ]
        for kk in keys:
            cols.append(kk)
        order = np.lexsort(tuple(cols))
        kcols = [kk[order] for kk in keys]
        chg = np.zeros(len(order), dtype=bool)
        if len(order):
            chg[0] = True
            for kk in kcols:
                chg[1:] |= kk[1:] != kk[:-1]
        seg_id = np.cumsum(chg) - 1
        seg_start = np.flatnonzero(chg)
        pos = np.arange(len(order)) - seg_start[seg_id]
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = pos + 1
        return rank

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        rank = _rank_within(batch)
        return batch.filter(pa.array(rank <= k))

    def final(group: pa.Table) -> pa.Table:
        rank = _rank_within(group)
        keep = rank <= k
        out = group.filter(pa.array(keep))
        return out.append_column("rank", pa.array(rank[keep]))

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.groupby(key_cols).map_groups(final, batch_format="pyarrow")


def global_order_index(ds, sort_keys: list[tuple], seq_col: str = "seq"):
    """Deterministic GLOBAL row index after a distributed sort (the
    zipWithIndex / ordered-export op a reproducible training run needs:
    every row gets the same sequence number on any cluster size).

    Shape: ``ds.sort`` (the one range exchange) -> materialize -> the
    sorted blocks' row counts come back as metadata-sized ray tasks ->
    driver prefix-sums the tiny count list -> one stateless task per
    block attaches ``offset + arange``. No data leaves the object store
    a second time; the driver holds one int per block.
    """
    import ray
    import ray.data as rd

    sorted_ds = ds.sort(
        [k for k, _ in sort_keys],
        descending=[d == "descending" for _, d in sort_keys],
    ).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)))

    @ray.remote
    def _attach(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(
            seq_col, pa.array(off + np.arange(t.num_rows, dtype=np.int64))
        )

    out_refs = [
        _attach.remote(r, int(offsets[i])) for i, r in enumerate(refs)
    ]
    return rd.from_arrow_refs(out_refs)
