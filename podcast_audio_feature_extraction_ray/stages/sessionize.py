"""Sessionization stages (SURVEY §7.1 step 1 + streaming-shaped events).

Two flavors:

- ``assemble_sessions`` — token-table sessionize: order each
  ``(doc_id, source)``'s rows by ``seq_no`` and concatenate into one
  stream row ``(key..., tokens, n_tok, n_rows)``. The analog of reading
  one episode's audio stream whole (reference
  ``src/features/YAMNetExtractor.py:69``). Usually you want the FUSED
  ``segment.segment_sessions`` instead (never materializes the stream in
  the output); this standalone stage exists for pipelines that need the
  raw session stream.

- ``sessionize_events`` — gap-based session ids over a timestamped
  event log: within each entity, a new session starts when the gap to
  the previous event exceeds ``gap``.

Both use the BUCKETED vectorized pattern (hash entities into O(cores)
buckets, sort each bucket block once, adjacent-key change detection,
one numpy pass per bucket) — Python overhead is O(num_buckets), not
O(num_entities) (round-1 VERDICT "What's wrong" #5; the pattern is
``segment._segment_sorted_block``'s).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from podcast_audio_feature_extraction_ray import hashing
from podcast_audio_feature_extraction_ray.arrow_utils import list_array, list_buffers


def _tag_buckets(ds, key_cols: tuple, num_buckets: int):
    """Append ``__bucket`` = stable hash of the key columns mod buckets
    (the shared rotate-XOR combine — see ``hashing.combined_key_hash``)."""

    def tag(batch: pa.Table) -> pa.Table:
        h = hashing.combined_key_hash(batch[c].to_pandas() for c in key_cols)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _entity_runs(block: pa.Table, key_cols: tuple) -> np.ndarray:
    """Boolean entity-change marks for a block sorted by key_cols."""
    n = block.num_rows
    change = np.zeros(n, dtype=bool)
    if n:
        change[0] = True
        for c in key_cols:
            col = block[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            neq = pa.compute.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            change[1:] |= neq.astype(bool)
    return change


def assemble_sessions(
    ds, session_key=("doc_id", "source"), order_key=("seq_no",), num_buckets: int = 64
):
    sk, ok = tuple(session_key), tuple(order_key)

    def per_bucket(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group.select([*sk, *ok]),
            sort_keys=[(c, "ascending") for c in (*sk, *ok)],
        )
        g = group.take(order).drop_columns(["__bucket"])
        n = g.num_rows
        change = _entity_runs(g, sk)
        first_rows = np.flatnonzero(change)
        # take() compacts list rows contiguously -> each session's stream
        # is one span of the child values buffer
        values, offsets = list_buffers(g["tokens"])
        bounds = np.append(first_rows, n)
        sess_off = offsets[bounds] - offsets[0]
        cols = {c: g[c].take(pa.array(first_rows)) for c in sk}
        cols["tokens"] = list_array(values[offsets[0] : offsets[-1]], sess_off)
        cols["n_tok"] = pa.array(np.diff(sess_off), type=pa.int64())
        cols["n_rows"] = pa.array(np.diff(bounds), type=pa.int64())
        return pa.table(cols)

    return (
        _tag_buckets(ds, sk, num_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sessionize_events(
    ds,
    entity_key=("user_id",),
    ts_col: str = "ts",
    gap=None,
    num_buckets: int = 64,
):
    """Assign ``session_no`` (0-based per entity) by inactivity gap.

    ``gap`` must be in the ts column's units (e.g. ``np.timedelta64(30, "m")``
    for timestamp columns, an int for tick columns). Ordering assumption:
    ts ascending within entity after the in-block sort; equal-ts ties
    break arbitrarily-but-deterministically per sort.
    """
    ek = tuple(entity_key)

    def per_bucket(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group.select([*ek, ts_col]),
            sort_keys=[(c, "ascending") for c in (*ek, ts_col)],
        )
        g = group.take(order).drop_columns(["__bucket"])
        n = g.num_rows
        if n == 0:
            return g.append_column("session_no", pa.array([], type=pa.int64()))
        change = _entity_runs(g, ek)
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        brk = np.zeros(n, dtype=np.int64)
        brk[1:] = ((ts[1:] - ts[:-1]) > gap) & ~change[1:]
        cs = np.cumsum(brk)
        starts = np.flatnonzero(change)
        runs = np.diff(np.append(starts, n))
        session_no = cs - np.repeat(cs[starts], runs)
        return g.append_column("session_no", pa.array(session_no, type=pa.int64()))

    return (
        _tag_buckets(ds, ek, num_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
