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
  the previous event exceeds ``gap``. The classic streaming sessionize,
  expressed as ``groupby(entity).map_groups`` over ts-sorted groups.
  Ordering assumption: ts sorted ASCENDING within entity after the
  in-group sort; ties keep input order (mergesort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from podcast_audio_feature_extraction_ray.arrow_utils import list_array, list_buffers
from podcast_audio_feature_extraction_ray.kernels import concat_ranges


def assemble_sessions(ds, session_key=("doc_id", "source"), order_key=("seq_no",)):
    sk, ok = tuple(session_key), tuple(order_key)

    def fn(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group.select(list(ok)), sort_keys=[(c, "ascending") for c in ok]
        )
        g = group.take(order)
        values, offsets = list_buffers(g["tokens"])
        idx, _ = concat_ranges(offsets[:-1], np.diff(offsets))
        stream = values[idx]
        cols = {c: g[c].slice(0, 1) for c in sk}
        cols["tokens"] = list_array(stream, np.array([0, len(stream)], dtype=np.int64))
        cols["n_tok"] = pa.array([len(stream)], type=pa.int64())
        cols["n_rows"] = pa.array([g.num_rows], type=pa.int64())
        return pa.table(cols)

    return ds.groupby(list(sk)).map_groups(fn, batch_format="pyarrow")


def sessionize_events(
    ds,
    entity_key=("user_id",),
    ts_col: str = "ts",
    gap=None,
):
    """Assign ``session_no`` (0-based per entity) by inactivity gap.

    ``gap`` must be in the ts column's units (e.g. ``np.timedelta64(30, "m")``
    for timestamp columns, an int for tick columns).
    """
    ek = tuple(entity_key)

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="mergesort").copy()
        ts = g[ts_col]
        brk = (ts - ts.shift(1)) > gap
        g["session_no"] = brk.fillna(False).astype(np.int64).cumsum()
        return g

    return ds.groupby(list(ek)).map_groups(fn, batch_format="pandas")
