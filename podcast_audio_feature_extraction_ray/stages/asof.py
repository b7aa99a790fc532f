"""Point-in-time as-of / backfill join stages (SURVEY §2.5 J2/J3).

Semantics — the point-in-time rule distilled from the reference's
start-time-only window membership (``src/search/index.py:84-89``) and
per-segment score attach (``src/search/search.py:112-116``): for each
window, attach the LAST event value whose ``ts`` is at-or-before the
window's cutoff (``ts_end - 1``, the last tick the window may read).
Null before the first event. Zero temporal leakage: the joined event's
``ts`` never exceeds the cutoff (tested as a property).

Two strategies:

- ``backfill_broadcast`` — the small-side lookup pattern: the event
  table is ``ray.put`` ONCE and read by every actor in ``__init__``
  (never re-shipped per batch); per batch a vectorized
  ``np.searchsorted`` per distinct key. Right when events fit in one
  worker's heap (the reference's metadata-DF-in-``Searcher`` analog,
  ``src/search/search.py:55-89``).

- ``backfill_join`` — the scale path: MERGE-PATH as-of join. Both sides
  map to a common schema, union, ONE hash groupby by key; per group a
  (t, event-first) sort + ``maximum.accumulate`` forward-fill attaches
  the last event to every window row. No cross product; list payloads
  ride the shuffle untouched (Arrow's hash join can't carry them).

Plus ``range_count_broadcast`` — the RANGE-JOIN recipe (interval
predicate): broadcast sorted timestamps + two searchsorteds per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _searchsorted_attach(
    cutoffs: np.ndarray,
    ev_ts: np.ndarray,
    ev_val: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For each cutoff, index of last event with ts <= cutoff.

    Returns (values, ts, valid_mask)."""
    pos = np.searchsorted(ev_ts, cutoffs, side="right") - 1
    valid = pos >= 0
    safe = np.where(valid, pos, 0)
    return ev_val[safe], ev_ts[safe], valid


class _BroadcastBackfill:
    """Actor-pool stage: event index fetched ONCE per actor (A1-A5 pattern,
    reference ``src/features/OpenSmileExtractor.py:21-27``) and compiled to
    a single composite-key sorted array, so each batch is resolved with ONE
    ``np.searchsorted`` — no per-key loop."""

    _BIG = np.int64(1) << 42  # event/window ticks < 2^42

    def __init__(self, events_ref, key_cols, ts_col, value_col, cutoff_from):
        ev: pd.DataFrame = ray.get(events_ref)
        self.key_cols = tuple(key_cols)
        self.cutoff_from = cutoff_from
        ev = ev.sort_values([*key_cols, ts_col], kind="mergesort")
        keys = pd.MultiIndex.from_frame(ev[list(key_cols)])
        codes, uniques = pd.factorize(keys)
        self.key_index = pd.Index(uniques)
        self.ev_ts = ev[ts_col].to_numpy(dtype=np.int64)
        self.ev_val = ev[value_col].to_numpy(dtype=np.float64)
        self.ev_comp = codes.astype(np.int64) * self._BIG + self.ev_ts
        # per-code start offsets to validate hits stay inside the key's span
        self.code_start = np.searchsorted(
            codes.astype(np.int64), np.arange(len(uniques), dtype=np.int64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cutoff = np.asarray(self.cutoff_from(batch), dtype=np.int64)
        keys = pd.MultiIndex.from_arrays([batch[c].to_pandas() for c in self.key_cols])
        code = self.key_index.get_indexer(keys).astype(np.int64)  # -1 = unknown key
        target = code * self._BIG + np.minimum(cutoff, self._BIG - 1)
        pos = np.searchsorted(self.ev_comp, target, side="right") - 1
        known = code >= 0
        safe_code = np.where(known, code, 0)
        valid = known & (pos >= 0) & (pos >= self.code_start[safe_code])
        safe = np.where(valid, pos, 0)
        cols = {c: batch[c] for c in batch.column_names}
        cols["bf_value"] = pa.array(self.ev_val[safe], mask=~valid)
        cols["bf_ts"] = pa.array(self.ev_ts[safe], mask=~valid)
        return pa.table(cols)


def _default_cutoff(batch: pa.Table) -> np.ndarray:
    return batch["ts_end"].to_numpy().astype(np.int64) - 1


def backfill_broadcast(
    windows_ds,
    events: "pd.DataFrame | pa.Table",
    key=("doc_id", "source"),
    ts_col: str = "ts",
    value_col: str = "value",
    cutoff_from=_default_cutoff,
    concurrency: int = 4,
    batch_size: int = 8192,
):
    """Attach bf_value/bf_ts to each window via a broadcast event index."""
    if isinstance(events, pa.Table):
        events = events.to_pandas()
    ref = ray.put(events)
    return windows_ds.map_batches(
        _BroadcastBackfill,
        fn_constructor_args=(ref, tuple(key), ts_col, value_col, cutoff_from),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def backfill_join(
    windows_ds,
    events_ds,
    key=("doc_id", "source"),
    ts_col: str = "ts",
    value_col: str = "value",
    batch_size: int = 8192,
    cutoff_col: str | None = None,
):
    """Scale path: MERGE-PATH as-of join via tagged union + ONE hash shuffle.

    Arrow's hash join cannot carry list-typed payload columns (Ray 2.49 /
    pyarrow 16 limitation), so instead both sides are mapped to a common
    schema (events get null window-payload columns), unioned, hash-grouped
    by key, and per group sorted by ``(t, event-first)``; a vectorized
    ``maximum.accumulate`` forward-fills the last event onto every window
    row. This is the north rule's "merge-path as-of join over
    timestamp-sorted partitions": each key's rows meet exactly once, no
    cross-product, list payloads ride the groupby shuffle untouched.

    Partitioning assumption: one key's windows+events fit in one group
    task (hot keys: pre-split windows by tick range and re-union — the
    events side is sparse by construction, F3).
    """
    key = tuple(key)
    win_schema = windows_ds.schema()
    payload_cols = [
        (n, t)
        for n, t in zip(win_schema.names, win_schema.types)
        if n not in key
    ]

    def tag_windows(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in key}
        if cutoff_col is not None:
            cols["__t"] = batch[cutoff_col].cast(pa.int64())
        else:
            cols["__t"] = pa.array(_default_cutoff(batch), type=pa.int64())
        cols["__is_ev"] = pa.array(np.zeros(batch.num_rows, dtype=bool))
        cols["__v"] = pa.nulls(batch.num_rows, type=pa.float64())
        for n_, t_ in payload_cols:
            cols[n_] = batch[n_].cast(t_) if batch[n_].type != t_ else batch[n_]
        return pa.table(cols)

    def tag_events(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in key}
        cols["__t"] = batch[ts_col].cast(pa.int64())
        cols["__is_ev"] = pa.array(np.ones(batch.num_rows, dtype=bool))
        cols["__v"] = batch[value_col].cast(pa.float64())
        for n_, t_ in payload_cols:
            cols[n_] = pa.nulls(batch.num_rows, type=t_)
        return pa.table(cols)

    tagged = windows_ds.map_batches(
        tag_windows, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    ).union(
        events_ds.map_batches(
            tag_events, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
    )

    def merge(group: pa.Table) -> pa.Table:
        # events sort BEFORE windows at equal t (ts <= cutoff is inclusive)
        order = pa.compute.sort_indices(
            group.select(["__t", "__is_ev"]),
            sort_keys=[("__t", "ascending"), ("__is_ev", "descending")],
        )
        g = group.take(order)
        isev = g["__is_ev"].to_numpy(zero_copy_only=False)
        t = g["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["__v"].to_numpy(zero_copy_only=False)
        n = len(t)
        ev_idx = np.where(isev, np.arange(n, dtype=np.int64), -1)
        last = np.maximum.accumulate(ev_idx)
        win_mask = ~isev
        last_w = last[win_mask]
        ok = last_w >= 0
        safe = np.where(ok, last_w, 0)
        out = g.filter(pa.array(win_mask)).drop_columns(["__is_ev", "__v"])
        out = out.rename_columns(
            ["ts_cutoff" if c == "__t" else c for c in out.column_names]
        )
        out = out.append_column("bf_value", pa.array(v[safe], mask=~ok))
        out = out.append_column("bf_ts", pa.array(t[safe], mask=~ok))
        return out

    return tagged.groupby(list(key)).map_groups(merge, batch_format="pyarrow")


def range_count_broadcast(
    left_ds,
    events: "pd.DataFrame | pa.Table",
    ts_col: str = "ts_us",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    out_col: str = "n_in_range",
    concurrency: int = 2,
):
    """RANGE JOIN (count form): for each left row, the number of events
    with ``lo <= ts < hi`` — two vectorized searchsorteds against a
    broadcast sorted timestamp array. The custom-operator recipe for
    interval predicates Ray Data lacks natively: when one side is small,
    broadcast + binary search; when both are large, bucket by coarse time
    range and merge per bucket (documented partitioning assumption).
    """
    if isinstance(events, pa.Table):
        events = events.to_pandas()
    ts_sorted = np.sort(events[ts_col].to_numpy(dtype=np.int64))
    ref = ray.put(ts_sorted)

    class Counter:
        def __init__(self):
            self.ts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lo = batch[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = batch[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
            n = np.searchsorted(self.ts, hi, side="left") - np.searchsorted(
                self.ts, lo, side="left"
            )
            return batch.append_column(out_col, pa.array(n.astype(np.int64)))

    return left_ds.map_batches(Counter, batch_format="pyarrow", concurrency=concurrency)
