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
