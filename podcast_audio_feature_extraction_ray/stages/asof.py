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
import pyarrow.compute as pc
import ray

from podcast_audio_feature_extraction_ray import hashing


class _EventIndex:
    """Event table compiled to a single composite-key sorted array, so a
    batch is resolved with ONE ``np.searchsorted`` — no per-key loop.

    Key resolution is per-COLUMN ``pyarrow.compute.index_in`` against the
    event side's column dictionaries, combined mixed-radix, then densified
    with one searchsorted over the unique combined codes. A
    ``pd.MultiIndex.get_indexer`` here hashes a Python tuple per row and
    measured ~10x slower than the whole rest of the stage (8.8M windows:
    21 s -> 2 s at 4 cpus)."""

    _BIG = np.int64(1) << 42  # event/window ticks < 2^42

    def __init__(self, ev: "pd.DataFrame", key_cols, ts_col, value_col):
        ev = ev.sort_values([*key_cols, ts_col], kind="mergesort")
        self.key_cols = tuple(key_cols)
        # events with a NULL key column match NOTHING (the SQL/ASOF
        # NULL-never-equals rule, and what _key_codes already does for
        # null WINDOW keys); factorize would code them -1, which breaks
        # the mixed-radix injectivity (a*r - 1 == (a-1)*r + (r-1)) and
        # leaks the null event's value onto a REAL key's windows
        if len(ev):
            notnull = np.ones(len(ev), dtype=bool)
            for c in key_cols:
                notnull &= ev[c].notna().to_numpy()
            if not notnull.all():
                ev = ev[notnull]
        # per-column dictionaries + mixed-radix combined key code
        self.col_uniq: list[pa.Array] = []
        self.radices: list[int] = []
        comb = np.zeros(len(ev), dtype=np.int64)
        for c in key_cols:
            col_codes, uniques = pd.factorize(ev[c])
            r = max(1, len(uniques))
            # events are the broadcast SMALL side: the mixed-radix product
            # stays far below 2^41 (n_keys < 2^21 is already required by
            # the composite ts trick below)
            self.col_uniq.append(pa.array(uniques))
            self.radices.append(r)
            comb = comb * r + col_codes.astype(np.int64)
        self.comb_uniq = np.unique(comb)
        n_keys = len(self.comb_uniq)
        if n_keys >= (1 << 21) or np.prod(
            np.array(self.radices, dtype=np.float64)
        ) >= float(1 << 41):
            raise ValueError(
                f"backfill_broadcast event side has {n_keys} distinct keys "
                f"(radices {self.radices}) — too large for the broadcast "
                "composite index; use backfill_join (the merge-path scale "
                "strategy) instead"
            )
        codes = np.searchsorted(self.comb_uniq, comb)
        # factorize codes follow FIRST APPEARANCE, not sort order: with
        # >= 2 key columns a later key group can code below an earlier
        # one, leaving ev_comp UNSORTED and every searchsorted below
        # wrong. Re-sort rows by dense code (stable: each key tuple's
        # rows are one contiguous ts-ascending span in the key-sorted
        # frame, so within-key order — including the duplicate-ts
        # last-wins tie-break — is preserved).
        order = np.argsort(codes, kind="stable")
        codes = codes[order]
        self.ev_ts = ev[ts_col].to_numpy(dtype=np.int64)[order]
        self.ev_val = ev[value_col].to_numpy(dtype=np.float64)[order]
        self.ev_comp = codes * self._BIG + self.ev_ts
        # per-code start offsets to validate hits stay inside the key's span
        self.code_start = np.searchsorted(codes, np.arange(n_keys, dtype=np.int64))

    def _key_codes(self, batch: pa.Table) -> np.ndarray:
        """Dense event-key code per row (-1 = key absent from events)."""
        comb = np.zeros(batch.num_rows, dtype=np.int64)
        unknown = np.zeros(batch.num_rows, dtype=bool)
        for c, uniq, r in zip(self.key_cols, self.col_uniq, self.radices):
            col = batch[c]
            if col.type != uniq.type:
                col = col.cast(uniq.type)
            idx = pc.fill_null(pc.index_in(col, value_set=uniq), -1)
            idx = np.asarray(idx.combine_chunks() if hasattr(idx, "combine_chunks") else idx).astype(np.int64)
            unknown |= idx < 0
            comb = comb * r + np.where(idx < 0, 0, idx)
        pos = np.searchsorted(self.comb_uniq, comb)
        safe = np.minimum(pos, len(self.comb_uniq) - 1)
        hit = (~unknown) & (self.comb_uniq[safe] == comb)
        return np.where(hit, safe, -1)

    def attach(self, batch: pa.Table, cutoff_from) -> pa.Table:
        if not len(self.ev_comp):
            # empty event table: every window backfills null (the
            # searchsorted path would index into empty arrays)
            cols = {c: batch[c] for c in batch.column_names}
            cols["bf_value"] = pa.nulls(batch.num_rows, type=pa.float64())
            cols["bf_ts"] = pa.nulls(batch.num_rows, type=pa.int64())
            return pa.table(cols)
        cutoff = np.asarray(cutoff_from(batch), dtype=np.int64)
        code = self._key_codes(batch)  # -1 = unknown key
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


class _BroadcastBackfill:
    """Actor-pool stage: event index fetched ONCE per actor (A1-A5 pattern,
    reference ``src/features/OpenSmileExtractor.py:21-27``)."""

    def __init__(self, events_ref, key_cols, ts_col, value_col, cutoff_from):
        self.idx = _EventIndex(ray.get(events_ref), key_cols, ts_col, value_col)
        self.cutoff_from = cutoff_from

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.idx.attach(batch, self.cutoff_from)


# per-worker-process compiled-index cache for the task-pool mode
_TASK_IDX_CACHE: dict = {}


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
    mode: str = "actors",
):
    """Attach bf_value/bf_ts to each window via a broadcast event index.

    ``mode="actors"`` (default): the A1 actor-pool pattern — index built
    once per actor in ``__init__``. ``mode="tasks"``: plain task pool
    with the compiled index cached per WORKER PROCESS (same build-once
    property, workers are reused across tasks) — use when the pool's CPU
    reservation would starve the upstream read (an actor pool at
    ``num_cpus=1`` reserves the only CPU and the pipeline livelocks;
    tasks schedule elastically at any cluster size).
    """
    if isinstance(events, pa.Table):
        events = events.to_pandas()
    ref = ray.put(events)
    key = tuple(key)
    if mode == "tasks":

        def fn(batch: pa.Table) -> pa.Table:
            k = ref.hex()
            idx = _TASK_IDX_CACHE.get(k)
            if idx is None:
                idx = _EventIndex(ray.get(ref), key, ts_col, value_col)
                # bounded, NOT single-slot: two broadcast stages sharing
                # a worker would otherwise thrash each other's compiled
                # index and rebuild it per batch (evict oldest first)
                while len(_TASK_IDX_CACHE) >= 4:
                    _TASK_IDX_CACHE.pop(next(iter(_TASK_IDX_CACHE)))
                _TASK_IDX_CACHE[k] = idx
            return idx.attach(batch, cutoff_from)

        return windows_ds.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
    return windows_ds.map_batches(
        _BroadcastBackfill,
        fn_constructor_args=(ref, key, ts_col, value_col, cutoff_from),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def _discover_hot_asof(
    windows_ds, key, cutoff_col, hot_threshold: int, sketch_buckets: int = 1 << 16
):
    """Per-key (window count, max cutoff) for keys above ``hot_threshold``
    windows, via the segmenter's bucketed counting-sketch prefilter
    (``segment.py`` hot-session discovery): pass 1 folds per-block
    ``(bucket, count)`` partials — driver memory bounded by
    ``sketch_buckets``, never by distinct keys — and pass 2 computes
    exact per-key partials ONLY for rows whose key hashes into a
    candidate bucket (actual hot keys + rare collisions). Callers at
    corpus scale can still precompute this (e.g. from the session
    metadata) and pass ``hot_index`` to skip both passes."""
    from podcast_audio_feature_extraction_ray.stages.segment import _sum_runs

    NB = sketch_buckets

    def _buckets(batch: pa.Table) -> np.ndarray:
        h = hashing.combined_key_hash(batch[c].to_pandas() for c in key)
        return (h % np.uint64(NB)).astype(np.int64)

    def sketch(batch: pa.Table) -> pa.Table:
        b, n = _sum_runs(_buckets(batch), np.ones(batch.num_rows, dtype=np.int64))
        return pa.table({"bucket": pa.array(b), "n": pa.array(n)})

    cols = list(key) + ([cutoff_col] if cutoff_col is not None else [])
    meta = windows_ds.select_columns(
        [c for c in windows_ds.schema().names if c in cols or c == "ts_end"]
    )
    bb = np.empty(0, dtype=np.int64)
    nn = np.empty(0, dtype=np.int64)
    for part in meta.map_batches(
        sketch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        bb, nn = _sum_runs(
            np.concatenate([bb, part["bucket"].to_numpy(zero_copy_only=False)]),
            np.concatenate([nn, part["n"].to_numpy(zero_copy_only=False)]),
        )
    cand = np.sort(bb[nn > hot_threshold])
    if not len(cand):
        return {}
    cand_ref = ray.put(cand)

    def partial(batch: pa.Table) -> pa.Table:
        cand_s = ray.get(cand_ref)
        b = _buckets(batch)
        pos = np.clip(np.searchsorted(cand_s, b), 0, max(len(cand_s) - 1, 0))
        m = cand_s[pos] == b
        sel = pa.array(m)
        df = pd.DataFrame({c: batch[c].filter(sel).to_pandas() for c in key})
        if cutoff_col is not None:
            t = batch[cutoff_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            t = _default_cutoff(batch)
        df["__t"] = t[m]
        g = df.groupby(list(key), sort=False)["__t"].agg(["count", "max"]).reset_index()
        # explicit types so empty and populated partials share one schema
        out = {c: pa.array(g[c], type=batch.schema.field(c).type) for c in key}
        out["count"] = pa.array(g["count"].to_numpy(dtype=np.int64, na_value=0))
        out["max"] = pa.array(g["max"].to_numpy(dtype=np.int64, na_value=0))
        return pa.table(out)

    parts = meta.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    g = parts.groupby(list(key)).agg(count=("count", "sum"), mx=("max", "max"))
    g = g[g["count"] > hot_threshold]
    return {
        (k if isinstance(k, tuple) else (k,)): (int(c), int(m))
        for k, c, m in zip(g.index, g["count"], g["mx"])
    }


def backfill_join(
    windows_ds,
    events_ds,
    key=("doc_id", "source"),
    ts_col: str = "ts",
    value_col: str = "value",
    batch_size: int = 8192,
    cutoff_col: str | None = None,
    hot_threshold: int | None = None,
    hot_index: "dict | None" = None,
    chunk_rows: int = 65_536,
    merge_buckets: int | None = None,
    payload: str = "inline",
):
    """Scale path: MERGE-PATH as-of join via tagged union + ONE hash shuffle.

    Arrow's hash join cannot carry list-typed payload columns (Ray 2.49 /
    pyarrow 16 limitation), so instead both sides are mapped to a common
    schema (events get null window-payload columns), unioned, hash-grouped
    into ``merge_buckets`` KEY BUCKETS (Python cost O(buckets), never
    O(keys) — ``map_groups`` per key would serialize on many-key
    corpora), and per bucket sorted by ``(key…, t, event-first)``; a
    segmented ``maximum.accumulate`` forward-fills the last event onto
    every window row, with carried-over events from a neighboring key
    automatically invalidated because their global sort position
    precedes the key's first row. This is the north rule's "merge-path
    as-of join over timestamp-sorted partitions": each key's rows meet
    exactly once, no cross-product, list payloads ride the groupby
    shuffle untouched.

    Hot-key splitting (the segmenter's tick-chunk pattern,
    ``segment.py``): keys whose window count exceeds ``hot_threshold``
    (or any key in an explicit ``hot_index`` of ``key_tuple -> (n_rows,
    max_cutoff)``) are SPLIT by cutoff tick range into chunks of
    ~``chunk_rows`` windows; each of that key's (sparse) events is
    duplicated into its own chunk and every later one, so chunk ``c``
    holds exactly the events any of its windows can legally read. The
    group key becomes ``(key..., chunk)`` — a Zipf-hot key no longer
    serializes one group task. Cold keys ride chunk ``-1`` untouched.
    Auto-discovery (``hot_threshold``) costs one extra metadata pass over
    ``windows_ds``; at corpus scale pass a precomputed ``hot_index``.

    ``merge_buckets`` defaults to 4x the cluster's CPUs (>= 64) so merge
    parallelism tracks cluster size instead of idling extra cores; a
    bucket's task still materializes ~1/merge_buckets of the unioned
    rows, so corpus-scale callers should size it explicitly as
    ~``total_rows / rows_per_task`` for their memory budget.

    ``payload="blockref"`` (the segmenter's zero-copy exchange pattern,
    ``segment.py``): when windows carry WIDE payload columns (e.g.
    ``seg_tokens`` lists), the inline path ships them through the merge
    shuffle. Blockref instead materializes the window blocks once, runs
    the merge over a pointer table of ``(key…, cutoff, block, row)``
    (~48 B/row), and re-attaches ``bf_value``/``bf_ts`` to the pinned
    blocks zero-copy — two narrow exchanges replace one wide one. Same
    plasma-pinning trade as the segmenter's blockref: the window blocks
    stay pinned for the stage; a killed worker mid-exchange is survived
    by task retry (plasma outlives workers — kill-tested for THIS path in
    ``tests/test_blockref_recovery.py::test_asof_blockref_survives_worker_kill``,
    bit-identical output through three SIGKILLed workers), and on
    node loss the blocks re-derive from read-task lineage (multi-node
    only, untestable on the single-node sandbox). Honest measurement
    (BASELINE.md): on ONE node the two modes
    tie (~3.1 vs ~3.3 s warm on 2.2M windows x 384 B payload) because
    plasma is shared memory; the mode exists for multi-node clusters,
    where the inline exchange moves the payload across the network twice
    (shuffle write + read) and blockref moves it at most once, at block
    granularity, with locality scheduling often avoiding even that.
    """
    import ray as _ray

    if payload not in ("inline", "blockref"):
        # a typo'd mode must not silently ship the wide payload inline —
        # and must raise BEFORE any Ray side effect (cluster_resources)
        raise ValueError(f"unknown payload mode {payload!r}; use 'inline' or 'blockref'")
    if merge_buckets is None:
        merge_buckets = max(64, 4 * int(_ray.cluster_resources().get("CPU", 16)))
    if payload == "blockref":
        return _backfill_join_blockref(
            windows_ds, events_ds, key=key, ts_col=ts_col, value_col=value_col,
            batch_size=batch_size, cutoff_col=cutoff_col,
            hot_threshold=hot_threshold, hot_index=hot_index,
            chunk_rows=chunk_rows, merge_buckets=merge_buckets,
        )
    key = tuple(key)
    win_schema = windows_ds.schema()
    payload_cols = [
        (n, t)
        for n, t in zip(win_schema.names, win_schema.types)
        if n not in key
    ]

    if hot_index is None and hot_threshold is not None:
        hot_index = _discover_hot_asof(windows_ds, key, cutoff_col, hot_threshold)
    hot_ref = None
    if hot_index:
        hot_keys = list(hot_index)
        # vectorized tuple matching (no per-row MultiIndex.get_indexer —
        # the exact per-row-Python pattern _EventIndex's docstring
        # measured 10x slower than the rest of the stage)
        hot_matcher = hashing.key_matcher(hot_keys, len(key))
        nch = np.array(
            [max(1, -(-hot_index[k][0] // chunk_rows)) for k in hot_keys],
            dtype=np.int64,
        )
        # C * n_chunks >= max_t + 1, so every in-range tick maps to a chunk
        C_arr = np.array(
            [
                max(1, -(-(hot_index[k][1] + 1) // int(n)))
                for k, n in zip(hot_keys, nch)
            ],
            dtype=np.int64,
        )
        hot_ref = _ray.put((hot_matcher, C_arr, nch))

    def _chunk_of(batch: pa.Table, t: np.ndarray) -> np.ndarray:
        """Window-side chunk id per row (-1 = cold key)."""
        matcher_, C_, nch_ = _ray.get(hot_ref)
        pos = hashing.match_key_ordinals(batch, key, matcher_)
        hotr = pos >= 0
        safe = np.where(hotr, pos, 0)
        # clamp to the LAST chunk: a caller-supplied hot_index with an
        # understated max cutoff would otherwise map windows past every
        # event-duplicated chunk and silently null their backfill; the
        # last chunk always holds every event copy (tag_events clamps
        # its own-chunk the same way)
        ch = np.minimum(t // C_[safe], nch_[safe] - 1)
        return np.where(hotr, ch, -1).astype(np.int64)

    def _key_bucket(out: pa.Table) -> pa.Array:
        h = hashing.combined_key_hash(out[c].to_pandas() for c in key)
        if hot_ref is not None:
            # hot chunks must land in different buckets or the split
            # buys nothing; mix the chunk id in
            h ^= out["__c"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(
                0x9E3779B97F4A7C15
            )
        return pa.array((h % np.uint64(merge_buckets)).astype(np.int64))

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
        out = pa.table(cols)
        if hot_ref is not None:
            t = np.asarray(out["__t"].to_numpy(zero_copy_only=False), dtype=np.int64)
            out = out.append_column("__c", pa.array(_chunk_of(batch, t)))
        return out.append_column("__b", _key_bucket(out))

    def tag_events(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in key}
        cols["__t"] = batch[ts_col].cast(pa.int64())
        cols["__is_ev"] = pa.array(np.ones(batch.num_rows, dtype=bool))
        cols["__v"] = batch[value_col].cast(pa.float64())
        for n_, t_ in payload_cols:
            cols[n_] = pa.nulls(batch.num_rows, type=t_)
        out = pa.table(cols)
        if hot_ref is None:
            return out.append_column("__b", _key_bucket(out))
        # duplicate each hot event into its own chunk and every later
        # chunk (events are the sparse side); cold events ride chunk -1
        matcher_, C_, nch_ = _ray.get(hot_ref)
        pos = hashing.match_key_ordinals(batch, key, matcher_)
        t = out["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        hotr = pos >= 0
        safe = np.where(hotr, pos, 0)
        # clamp into the last chunk (the _chunk_of rule): under a stale
        # hot_index a past-range event still lands one copy where the
        # past-range windows were clamped to; with an accurate index the
        # extra copy attaches nothing (events past every cutoff)
        own = np.minimum(t // np.maximum(C_[safe], 1), nch_[safe] - 1)
        reps = np.where(hotr, np.maximum(nch_[safe] - own, 1), 1).astype(np.int64)
        idx = np.repeat(np.arange(out.num_rows, dtype=np.int64), reps)
        within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        ch = np.where(
            np.repeat(hotr, reps), np.repeat(own, reps) + within, -1
        ).astype(np.int64)
        out = out.take(pa.array(idx))
        out = out.append_column("__c", pa.array(ch))
        return out.append_column("__b", _key_bucket(out))

    tagged = windows_ds.map_batches(
        tag_windows, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    ).union(
        events_ds.map_batches(
            tag_events, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
    )

    seg_cols = list(key) + (["__c"] if hot_ref is not None else [])

    def merge(group: pa.Table) -> pa.Table:
        # ONE bucket holds many keys: sort by (key…, t, event-first) —
        # events sort BEFORE windows at equal t (ts <= cutoff inclusive).
        # "__v" is a DETERMINISTIC tie-break among duplicate (key, ts)
        # EVENT rows: without it the winner depends on union block
        # arrival order (run-to-run nondeterminism); with it the
        # largest value wins. Note the broadcast path keeps the event
        # TABLE's last row under stable sort instead — on inputs with
        # duplicate (key, ts, differing value) events the two paths can
        # legitimately disagree; dedupe upstream if a specific winner
        # matters.
        order = pa.compute.sort_indices(
            group.select([*seg_cols, "__t", "__is_ev", "__v"]),
            sort_keys=[(c, "ascending") for c in seg_cols]
            + [("__t", "ascending"), ("__is_ev", "descending"),
               ("__v", "ascending")],
        )
        g = group.take(order)
        isev = g["__is_ev"].to_numpy(zero_copy_only=False)
        t = g["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["__v"].to_numpy(zero_copy_only=False)
        n = len(t)
        # key-segment boundaries via factorized codes (C-speed, works
        # for string keys too)
        neq = np.zeros(max(n - 1, 0), dtype=bool)
        for c in seg_cols:
            codes, _ = pd.factorize(g[c].to_pandas(), sort=False)
            neq |= codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(np.concatenate([[True], neq]))
        seg_id = np.zeros(n, dtype=np.int64)
        seg_id[seg_first[1:]] = 1
        np.cumsum(seg_id, out=seg_id)
        seg_start_row = seg_first[seg_id]
        # global cummax of event positions; an event carried over from a
        # previous key sorts before this key's first row, so the
        # `last >= segment start` check invalidates it for free
        ev_idx = np.where(isev, np.arange(n, dtype=np.int64), -1)
        last = np.maximum.accumulate(ev_idx)
        win_mask = ~isev
        last_w = last[win_mask]
        ok = last_w >= seg_start_row[win_mask]
        safe = np.where(ok, last_w, 0)
        drop = ["__is_ev", "__v", "__b"] + (["__c"] if hot_ref is not None else [])
        out = g.filter(pa.array(win_mask)).drop_columns(drop)
        out = out.rename_columns(
            ["ts_cutoff" if c == "__t" else c for c in out.column_names]
        )
        out = out.append_column("bf_value", pa.array(v[safe], mask=~ok))
        out = out.append_column("bf_ts", pa.array(t[safe], mask=~ok))
        return out

    return tagged.groupby("__b").map_groups(merge, batch_format="pyarrow")


def _backfill_join_blockref(
    windows_ds,
    events_ds,
    key,
    ts_col,
    value_col,
    batch_size,
    cutoff_col,
    hot_threshold,
    hot_index,
    chunk_rows,
    merge_buckets,
):
    """``backfill_join(payload="blockref")``: merge over a pointer table,
    attach results to the pinned window blocks (see the caller's
    docstring). Output column set and values are identical to inline
    mode; only the exchange payload differs. The per-task closure holds
    one ObjectRef per window block (~100 B each); past
    ``TOKWIN_ASOF_REGISTRY_MIN`` blocks (default 10,000) the list moves
    behind the segmenter's ``_BufRegistry`` actor and each attach task
    fetches only ITS block's ref — one num_cpus=0 actor RPC per block
    instead of O(n_blocks) refs serialized into every task closure
    (O(n_blocks²) total).
    """
    import ray as _ray
    import ray.data as _rd

    key = tuple(key)
    cut_src = cutoff_col if cutoff_col is not None else "ts_end"
    # materialize FIRST: .schema() on the lazy dataset would execute part
    # of the upstream plan only to discard it
    mat = windows_ds.materialize()
    win_schema = mat.schema()
    types = dict(zip(win_schema.names, win_schema.types))
    block_refs = mat.to_arrow_refs()
    from podcast_audio_feature_extraction_ray.arrow_utils import typed_empty_table

    if not block_refs:
        # zero-block dataset: same empty result inline mode produces
        out_types = {c: types[c] for c in win_schema.names}
        out_types.update(
            {"ts_cutoff": pa.int64(), "bf_value": pa.float64(), "bf_ts": pa.int64()}
        )
        return _rd.from_arrow(typed_empty_table(out_types))
    meta_types = {c: types[c] for c in (*key, cut_src)}

    @_ray.remote
    def meta_of(tbl: pa.Table, i: int) -> pa.Table:
        if tbl.num_rows == 0:
            # zero-row blocks arrive schema-less; emit a TYPED empty
            # pointer block so downstream union/groupby keeps one schema
            return typed_empty_table(
                {**meta_types, "__blk": pa.int64(), "__row": pa.int64()}
            )
        missing = [c for c in meta_types if c not in tbl.column_names]
        if missing:
            # rows WITHOUT the key/cutoff columns must fail loudly —
            # returning empty here would silently drop this block's
            # windows from the join output
            raise KeyError(f"window block {i} missing columns {missing}")
        cols = {c: tbl[c] for c in meta_types}
        n = tbl.num_rows
        cols["__blk"] = pa.array(np.full(n, i, dtype=np.int64))
        cols["__row"] = pa.array(np.arange(n, dtype=np.int64))
        return pa.table(cols)

    import os as _os

    registry = None
    registry_min = int(_os.environ.get("TOKWIN_ASOF_REGISTRY_MIN") or 10_000)
    if len(block_refs) > registry_min:
        # small block counts capture the ref list directly (zero extra
        # RPCs); past the threshold every attach task would serialize
        # O(n_blocks) refs — O(n_blocks²) total — so park the list on a
        # bookkeeping actor and let each task fetch its ONE ref. The
        # handle in the closure also keeps the actor (and its pins)
        # alive exactly as long as the plan's closures.
        from podcast_audio_feature_extraction_ray.stages.segment import _BufRegistry

        registry = _ray.remote(num_cpus=0)(_BufRegistry).remote()
        _ray.get(
            registry.register_many.remote(
                list(range(len(block_refs))), [[r] for r in block_refs]
            )
        )
    meta = _rd.from_arrow_refs(
        [meta_of.remote(r, i) for i, r in enumerate(block_refs)]
    )
    res = backfill_join(
        meta, events_ds, key=key, ts_col=ts_col, value_col=value_col,
        batch_size=batch_size, cutoff_col=cutoff_col,
        hot_threshold=hot_threshold, hot_index=hot_index,
        chunk_rows=chunk_rows, merge_buckets=merge_buckets,
    )

    refs_capture = block_refs if registry is None else None

    def attach(group: pa.Table) -> pa.Table:
        # every window row survives the merge exactly once, so the
        # sorted row ids ARE the block's original row order — append the
        # bf columns without gathering the (wide) block at all
        blk = int(group["__blk"][0].as_py())
        order = pa.compute.sort_indices(group["__row"])
        g = group.take(order)
        if refs_capture is not None:
            ref = refs_capture[blk]
        else:
            ref = _ray.get(registry.fetch.remote([blk]))[0]
        tbl: pa.Table = _ray.get(ref)
        if g.num_rows != tbl.num_rows:  # pragma: no cover — invariant
            raise AssertionError(
                f"blockref attach: {g.num_rows} merge rows for a "
                f"{tbl.num_rows}-row window block"
            )
        for c in ("ts_cutoff", "bf_value", "bf_ts"):
            tbl = tbl.append_column(c, g[c])
        return tbl

    return res.groupby("__blk").map_groups(attach, batch_format="pyarrow")


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
