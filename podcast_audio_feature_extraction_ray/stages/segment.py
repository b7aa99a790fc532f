"""Fixed-stride window segmentation stages (SURVEY §2.3 W1/W2/W3).

Three execution paths over the same numpy kernel
(``kernels.plan_windows`` / ``gather_windows``):

1. ``segment_rows``     — each input row IS a complete session (the
   dominant 10^12-sequence training-data case: independent pre-tokenized
   sequences). Stateless ``map_batches`` over zero-copy Arrow; NO shuffle.
   Analog of per-episode openSMILE frames
   (reference ``src/features/OpenSmileExtractor.py:40-56``).

2. ``segment_sessions`` — sessions span multiple rows keyed by
   ``session_key`` ordered by ``order_key``. ONE hash shuffle
   (``groupby .map_groups``); windows never cross sessions so no further
   exchange. Analog of the transcript segmenter loop
   (reference ``src/search/index.py:55-110``).

3. ``segment_sessions`` with ``chunk_ticks`` — same output, but inside
   each group the session stream is processed chunk-by-chunk with a
   bounded lookahead of ``spec.lookahead`` ticks, constant kernel memory
   per session regardless of session length. Chunk cuts are aligned to
   multiples of ``hop`` so lookahead is exact — the token analog of the
   YAMNet 300s/0.47s chunk loop (reference
   ``src/features/YAMNetExtractor.py:78-95``; 300s = 625 hops).

Scale notes (100 TB): path 1 streams with zero shuffle. Path 2's shuffle
moves each token once; skewed hot sessions are bounded by ``chunk_ticks``
kernel memory but still land in one group — the range-partition +
overlap-duplication plan for splitting a single monster session across
tasks is documented in SURVEY §7.4 and relies on precomputed per-row
start offsets (metadata-only prefix-sum pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from podcast_audio_feature_extraction_ray.arrow_utils import list_array, list_buffers
from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray import hashing, kernels


def _emit_windows(
    batch: pa.Table,
    key_cols: list[str],
    values: np.ndarray,
    row_value_start: np.ndarray,
    row_value_len: np.ndarray,
    row_base_tick: np.ndarray,
    spec: WindowSpec,
    *,
    is_final: np.ndarray | None = None,
    avail_len: np.ndarray | None = None,
    lag_avail: np.ndarray | None = None,
    with_aggregates: bool = False,
    emit_tokens: bool = True,
    lag: int = 0,
    lead: int = 0,
    gt_threshold: int = 25_000,
    match_token: int = 13,
    functionals: bool = False,
) -> pa.Table:
    """Shared window-emission: plan, (optionally) gather, aggregate.

    ``emit_tokens=False`` skips materializing the ``seg_tokens`` list
    column — the features-only mode matching the reference's output shape
    (features, not raw windows; ``OpenSmileExtractor.py:47-54``) — and
    aggregates are then computed with zero window gather.
    """
    row_idx, win_id, ts_start, slice_len = kernels.plan_windows(
        row_value_len, spec, base_tick=row_base_tick, is_final=is_final, avail_len=avail_len
    )
    cols: dict[str, object] = {}
    take_idx = pa.array(row_idx)
    for c in key_cols:
        col = batch[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[c] = col.take(take_idx)
    cols["win_id"] = pa.array(win_id, type=pa.int64())
    cols["ts_start"] = pa.array(ts_start, type=pa.int64())
    cols["ts_end"] = pa.array(ts_start + slice_len, type=pa.int64())
    if emit_tokens:
        seg_values, seg_offsets = kernels.gather_windows(
            values, row_value_start, row_base_tick, row_idx, ts_start, slice_len
        )
        cols["seg_tokens"] = list_array(seg_values, seg_offsets)
    if with_aggregates:
        n_rows = len(row_value_len)
        # rows must tile the buffer contiguously in ascending order — true
        # for all three segmenter paths (Arrow list rows share offsets).
        buf_len = avail_len if avail_len is not None else row_value_len
        sess_bounds = np.empty(n_rows + 1, dtype=np.int64)
        sess_bounds[:-1] = row_value_start
        sess_bounds[-1] = (
            row_value_start[-1] + np.asarray(buf_len, dtype=np.int64)[-1]
            if n_rows
            else 0
        )
        n_per_row = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
        win_offset = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(n_per_row[:-1], out=win_offset[1:])
        first_k = np.zeros(n_rows, dtype=np.int64)
        has = n_per_row > 0
        first_k[has] = win_id[win_offset[has]]
        width = spec.window if spec.mode == "frame" else spec.window + 1
        aggs = kernels.window_features_stream(
            values,
            sess_bounds=sess_bounds,
            sess_base_tick=np.asarray(row_base_tick, dtype=np.int64),
            win_sess=row_idx,
            ts_start=ts_start,
            slice_len=slice_len,
            win_k=win_id,
            first_k=first_k,
            win_offset=win_offset,
            width=width,
            hop=spec.hop,
            gt_threshold=gt_threshold,
            match_token=match_token,
            functionals=functionals,
        )
        for name, arr in aggs.items():
            cols[name] = pa.array(arr)
    if lag or lead:
        lv, lo, rv, ro = kernels.lag_lead_windows(
            values, row_value_start, row_value_len, row_base_tick,
            row_idx, ts_start, slice_len, lag, lead,
            lag_avail=lag_avail, lead_avail=avail_len,
        )
        if lag:
            cols["lag_tokens"] = list_array(lv, lo)
        if lead:
            cols["lead_tokens"] = list_array(rv, ro)
    return pa.table(cols)


def segment_batch(
    batch: pa.Table,
    spec: WindowSpec,
    key_cols=("doc_id", "source"),
    tokens_col: str = "tokens",
    **opts,
) -> pa.Table:
    """Segment a batch where every row is a complete session (path 1)."""
    values, offsets = list_buffers(batch[tokens_col])
    row_value_start = offsets[:-1]
    row_value_len = np.diff(offsets)
    base = np.zeros(batch.num_rows, dtype=np.int64)
    return _emit_windows(
        batch, list(key_cols), values, row_value_start, row_value_len, base, spec, **opts
    )


def segment_rows(ds, spec: WindowSpec, key_cols=("doc_id", "source"), batch_size: int = 4096, **opts):
    """Stateless row-per-session segmenter: zero-shuffle map_batches."""
    return ds.map_batches(
        lambda b: segment_batch(b, spec, key_cols=key_cols, **opts),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def _session_group_fn(
    group: pa.Table,
    spec: WindowSpec,
    session_key: tuple,
    order_key: tuple,
    chunk_ticks: int | None,
    opts: dict,
) -> pa.Table:
    """Segment one session group: sort by order_key, stream the chunks.

    ``map_groups`` hands one (session_key) group at a time. The token
    stream is never materialized beyond ``chunk_ticks + lookahead`` when
    chunking is on.
    """
    order_idx = pa.compute.sort_indices(
        group.select(list(order_key)),
        sort_keys=[(c, "ascending") for c in order_key],
    )
    group = group.take(order_idx)
    values, offsets = list_buffers(group["tokens"])
    row_start, row_len = offsets[:-1], np.diff(offsets)
    # assemble the contiguous session stream (values may be shared child
    # buffer with gaps after take(); rebuild contiguous)
    idx, _ = kernels.concat_ranges(row_start, row_len)
    stream = values[idx]
    L = len(stream)
    key_tbl = group.select(list(session_key)).slice(0, 1)

    H = spec.hop
    lag = int(opts.get("lag") or 0)
    lead = int(opts.get("lead") or 0)
    # chunk lookahead must cover the last owned window PLUS its lead
    la = spec.lookahead + (1 if spec.mode == "segment" else 0) + lead
    if chunk_ticks is None or L <= chunk_ticks + la:
        chunks = [(0, L, L)]
    else:
        C = max(H, (chunk_ticks // H) * H)  # align cuts to hop multiples
        chunks = []
        for a in range(0, L, C):
            owned = min(C, L - a)
            avail = min(owned + la, L - a)
            chunks.append((a, owned, avail))
    outs = []
    for a, owned, avail in chunks:
        hist = min(a, lag)  # lookbehind ring-buffer analog across the cut
        sub = stream[a - hist : a + avail]
        out = _emit_windows(
            key_tbl,
            list(session_key),
            sub,
            row_value_start=np.array([hist], dtype=np.int64),
            row_value_len=np.array([owned], dtype=np.int64),
            row_base_tick=np.array([a], dtype=np.int64),
            spec=spec,
            is_final=np.array([a + owned >= L]),
            avail_len=np.array([avail], dtype=np.int64),
            lag_avail=np.array([hist], dtype=np.int64),
            **opts,
        )
        outs.append(out)
    return pa.concat_tables(outs)


def _segment_sorted_block(
    block: pa.Table,
    spec: WindowSpec,
    session_key: tuple,
    opts: dict,
    buffers: tuple | None = None,
) -> pa.Table:
    """Segment EVERY session in a key-sorted block with one vectorized pass.

    Sessions are detected by adjacent-key change; each session's token
    stream must be a contiguous span of the values buffer — true for
    Arrow list rows (default: read from ``block["tokens"]``) and for the
    side-channel gather (pass ``buffers=(values, row_start, row_len)``,
    spans contiguous within each session). No per-session loop.
    """
    n = block.num_rows
    if n == 0:
        return _emit_windows(
            block, list(session_key),
            np.empty(0, np.int32), np.empty(0, np.int64),
            np.empty(0, np.int64), np.empty(0, np.int64), spec, **opts,
        )
    start = np.zeros(n, dtype=bool)
    start[0] = True
    for c in session_key:
        col = block[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        start[1:] |= _null_safe_change(col, n)
    first_rows = np.flatnonzero(start)
    if buffers is None:
        values, offsets = list_buffers(block["tokens"])
        row_start, row_len = offsets[:-1], np.diff(offsets)
    else:
        values, row_start, row_len = buffers
    sess_val_start = row_start[first_rows]
    bounds = np.append(first_rows, n)
    cs = np.concatenate([[0], np.cumsum(row_len, dtype=np.int64)])
    sess_len = cs[bounds[1:]] - cs[bounds[:-1]]
    key_tbl = block.select(list(session_key)).take(pa.array(first_rows))
    return _emit_windows(
        key_tbl, list(session_key), values,
        row_value_start=sess_val_start,
        row_value_len=sess_len,
        row_base_tick=np.zeros(len(first_rows), dtype=np.int64),
        spec=spec,
        **opts,
    )


# worker-process-global payload cache for the side-channel exchange
# (see per_bucket in segment_sessions) — maps uid -> zero-copy values
# array; entries are shared-memory views, not copies
_worker_payload_cache: dict = {}


def _null_safe_change(col, n: int) -> np.ndarray:
    """``bool[n-1]``: consecutive rows DIFFER under SQL IS DISTINCT FROM
    — null vs null compares EQUAL (nulls sort together and form ONE
    session, the GROUP BY rule), null vs value DIFFERENT. Plain
    ``not_equal`` yields null in both cases, which ``astype(bool)`` on
    the masked numpy view would read as "same session" and silently
    merge a null-keyed row into its real-keyed neighbor."""
    a, b = col.slice(1), col.slice(0, n - 1)
    neq = pa.compute.fill_null(pa.compute.not_equal(a, b), False).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    na = pa.compute.is_null(a).to_numpy(zero_copy_only=False)
    nb = pa.compute.is_null(b).to_numpy(zero_copy_only=False)
    return neq | (na ^ nb)

# blockref payload uids are CHUNK-granular: the registry stores the block
# ref under an aligned base uid and chunk j of that block is uid base + j.
# Chunk granularity matters because a block column is a ChunkedArray and
# ``combine_chunks`` COPIES (even for one chunk — measured 1.5 s per
# 800 MB block, paid per reduce worker per block); raw chunk buffers
# (.offsets respects the slice, .values is the full child) are zero-copy.
_UID_CHUNK_BITS = 24
_UID_BLOCK_MASK = ~((1 << _UID_CHUNK_BITS) - 1)
# every blockref base uid this DRIVER process ever issued: masked bases
# carry 39 random bits, so cross-run collisions against a worker's
# still-cached uid are unlikely but not impossible — tracking issued
# bases driver-side makes reuse impossible within the process whose
# workers hold those caches (worker caches die with the Ray session,
# which dies with the driver)
_issued_uid_bases: set = set()


def _chunk_pointers(col, uid_base: int):
    """Per-row (voff, vlen, uid) pointer arrays for a list column's raw
    chunks — no combine, no copy of values. ``voff`` indexes each chunk's
    FULL child buffer (valid for sliced chunks)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    assert len(chunks) < (1 << _UID_CHUNK_BITS)
    if not chunks:  # typed 0-row column with ZERO chunks (filtered block)
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    voffs, vlens, uids = [], [], []
    for j, ch in enumerate(chunks):
        off = ch.offsets.to_numpy().astype(np.int64, copy=False)
        voffs.append(off[:-1])
        vlens.append(np.diff(off))
        uids.append(np.full(len(off) - 1, uid_base + j, dtype=np.int64))
    return (
        np.concatenate(voffs) if len(voffs) > 1 else voffs[0].copy(),
        np.concatenate(vlens) if len(vlens) > 1 else vlens[0],
        np.concatenate(uids) if len(uids) > 1 else uids[0],
    )


def _chunk_values(col) -> list[np.ndarray]:
    """Zero-copy FULL child values buffer of each raw chunk."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    return [ch.values.to_numpy(zero_copy_only=False) for ch in chunks]


class _BufRegistry:
    """Tiny bookkeeping actor for the side-channel payload exchange: maps
    ``uid -> ObjectRef`` of a tag task's token-values array (payload
    ``"sidechannel"``) or of a whole materialized READ BLOCK (payload
    ``"blockref"`` — the values are extracted zero-copy on first use by
    each reduce worker). Holding the refs pins the objects until the
    registry (and the Dataset plan whose closures hold its handle) is
    garbage-collected. ``num_cpus=0``."""

    def __init__(self):
        self._refs: dict = {}

    def register(self, uid: int, ref_list) -> None:
        # ref wrapped in a list so Ray does NOT auto-dereference it
        self._refs[uid] = ref_list[0]

    def register_many(self, uids, ref_lists) -> None:
        for u, rl in zip(uids, ref_lists):
            self._refs[u] = rl[0]

    def fetch(self, uids):
        return [self._refs[u] for u in uids]  # KeyError -> caller retries


def _gather_payload(
    arrs: dict, uid: np.ndarray, voff: np.ndarray, vlen: np.ndarray, key: str = "gp"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather per-row token spans from side-channel arrays into ONE dense
    buffer in row order. Returns (values, row_start, row_len): row ``j``
    is ``values[row_start[j] : row_start[j]+row_len[j]]`` and consecutive
    rows tile the buffer.

    One global-index gather: the source arrays are laid end-to-end once
    (sequential memcpy), per-row global starts are ``base[code] + voff``,
    and a single ``np.take(..., out=)`` fills the output. All large
    temporaries live in the per-worker arena (``out=`` ufuncs into warm
    pages) — fresh pages cost 40x on this host (``arena.py``), and the
    naive per-uid fancy-indexed scatter measured SLOWER than the inline
    exchange it replaced."""
    from podcast_audio_feature_extraction_ray.arena import ARENA

    vlen = np.asarray(vlen, dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(vlen)])
    total = int(cs[-1])
    voff = np.asarray(voff, dtype=np.int64)
    n = len(vlen)
    out = ARENA.get(key + "_out", total, np.int32)
    if n == 0:
        return out, cs[:-1], vlen
    # Row-RUN memcpy gather: consecutive rows reading adjacent spans of
    # the same source array merge into one slice copy (destination is
    # always adjacent — dense tiling). Each iteration is a C-level
    # memcpy of a whole run, so the Python loop is bounded by run count
    # (<= rows, COLLAPSES for doc-contiguous inputs), never tokens.
    # Measured fastest here by a wide margin: a per-element fancy gather
    # pays one cache miss per token, and Arrow's chunked list `take`
    # concatenates the full source chunks per task.
    brk = np.ones(n, dtype=bool)
    if n > 1:
        brk[1:] = (uid[1:] != uid[:-1]) | (voff[:-1] + vlen[:-1] != voff[1:])
    run_starts = np.flatnonzero(brk)
    run_rows = np.diff(np.append(run_starts, n))
    ends = run_starts + run_rows - 1
    r_src = voff[run_starts].tolist()
    r_dst = cs[run_starts].tolist()
    r_len = ((voff[ends] + vlen[ends]) - voff[run_starts]).tolist()
    r_uid = uid[run_starts].tolist()
    for s_, d_, l_, u_ in zip(r_src, r_dst, r_len, r_uid):
        out[d_ : d_ + l_] = arrs[u_][s_ : s_ + l_]
    return out, cs[:-1], vlen


def _sum_runs(b: np.ndarray, n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group-sum int pairs by sorting + run cumsum (no Python per key)."""
    if len(b) == 0:
        # the run-start bootstrap below indexes element 0
        return b.astype(np.int64, copy=False), n.astype(np.int64, copy=False)
    order = np.argsort(b, kind="stable")
    bs, ns = b[order], n[order]
    starts = np.flatnonzero(np.concatenate([[True], bs[1:] != bs[:-1]]))
    cs = np.concatenate([[0], np.cumsum(ns)])
    bounds = np.append(starts, len(bs))
    return bs[starts], cs[bounds[1:]] - cs[bounds[:-1]]


def _hot_session_index(
    ds,
    sk,
    ok,
    threshold_ticks: int,
    meta_ds=None,
    sketch_buckets: int = 1 << 20,
    driver_collect_limit: int = 5_000_000,
):
    """Metadata-only pass: per-row start ticks for sessions larger than
    ``threshold_ticks``. Only tiny columns (keys + n_tok) are shuffled —
    the hot-key index this returns is broadcast, never re-shipped per
    batch (SURVEY §7.4.3 hot-doc splitting).

    Hot-key DISCOVERY is a counting-sketch prefilter, not a full
    groupby: per-batch tick sums land in ``sketch_buckets`` hash
    buckets (pure int pairs — key strings never shuffle), bucket totals
    are combined by a bounded repartition tree (level-1 blocks emit at
    most ``sketch_buckets`` pairs each, level 2 is one block), and a
    bucket is a CANDIDATE iff its total exceeds the threshold — no
    false negatives, since a bucket's total >= any member key's total.
    Only candidate-bucket rows are then collected for exact per-key
    totals. Sizing rule: ``sketch_buckets`` should be >= ~100x
    total_ticks / threshold_ticks so cold buckets don't aggregate past
    the threshold; if more than 1/64 of buckets trip (sketch saturated),
    we fall back to an exact distributed ``groupby().sum`` so the driver
    still never materializes per-key totals.
    """
    import pandas as pd
    import ray as _ray_

    meta = meta_ds if meta_ds is not None else ds.select_columns([*sk, *ok, "n_tok"])
    thr = int(threshold_ticks)
    NB = int(sketch_buckets)

    def _key_buckets(batch: pa.Table) -> np.ndarray:
        h = hashing.combined_key_hash(batch[c].to_pandas() for c in sk)
        return (h % np.uint64(NB)).astype(np.int64)

    # ONE metadata scan: per-row sketch buckets ride along as ``__kb`` and
    # the blocks are pinned in the object store, so the candidate-filter
    # pass below re-reads the (tiny) materialized blocks instead of
    # re-scanning + re-hashing the input. Meta is 3-4 narrow columns
    # (~1-2% of the data); the streaming executor spills if it must —
    # this is the SURVEY §7.4.3 "metadata-only pre-pass" made literal.
    def add_kb(batch: pa.Table) -> pa.Table:
        return batch.append_column("__kb", pa.array(_key_buckets(batch)))

    kb_refs = (
        meta.map_batches(add_kb, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
        .to_arrow_refs()
    )

    @_ray_.remote
    def _block_sketch(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            # zero-row blocks come through schema-less ("new schema: ."),
            # so the column lookup itself would KeyError
            from podcast_audio_feature_extraction_ray.arrow_utils import typed_empty_table

            return typed_empty_table({"bucket": pa.int64(), "n": pa.int64()})
        if "__kb" not in tbl.column_names:
            raise KeyError("meta block with rows but no __kb tag column")
        b, s = _sum_runs(
            tbl["__kb"].to_numpy(zero_copy_only=False),
            tbl["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"bucket": pa.array(b), "n": pa.array(s)})

    # bucket totals: per-block (bucket, n) partials are bounded by
    # min(block_rows, sketch_buckets) pairs each. Combine driver-side in
    # a STREAMING pass (memory bounded by distinct buckets, <= NB, never
    # by total pairs); above ``tree_blocks`` blocks the pair volume
    # through the driver would dominate, so fall back to the bounded
    # repartition tree over the already-materialized partials (no
    # re-scan either way).
    pair_refs = [_block_sketch.remote(r) for r in kb_refs]
    tree_blocks = 256
    if len(pair_refs) <= tree_blocks:
        # true streaming fold: each block's partial is already run-summed
        # (<= NB distinct buckets), so the running accumulator stays <= NB
        # pairs no matter how many blocks arrive
        bb = np.empty(0, dtype=np.int64)
        nn = np.empty(0, dtype=np.int64)
        for r in pair_refs:
            t = _ray_.get(r)
            bb, nn = _sum_runs(
                np.concatenate([bb, t["bucket"].to_numpy(zero_copy_only=False)]),
                np.concatenate([nn, t["n"].to_numpy(zero_copy_only=False)]),
            )
        cand_arr = bb[nn > thr]
    else:  # pragma: no cover — >256-block inputs (cluster scale)
        import ray.data as _rd

        def combine(batch: pa.Table) -> pa.Table:
            b, s = _sum_runs(
                batch["bucket"].to_numpy(zero_copy_only=False),
                batch["n"].to_numpy(zero_copy_only=False),
            )
            return pa.table({"bucket": pa.array(b), "n": pa.array(s)})

        pairs = _rd.from_arrow_refs(pair_refs)
        totals = (
            pairs.repartition(8)
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
            .repartition(1)
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
        )
        cand_pd = totals.map_batches(
            lambda t: t.filter(pa.compute.greater(t["n"], pa.scalar(thr))),
            batch_format="pyarrow",
        ).to_pandas()
        cand_arr = cand_pd["bucket"].to_numpy()
    if not len(cand_arr):
        return {}

    if len(cand_arr) > NB // 64:  # saturated sketch
        # exact path: combiner partials + distributed groupby + filter;
        # the driver still only collects the hot tail
        def partial_totals(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({c: batch[c].to_pandas() for c in sk})
            df["n"] = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
            g = df.groupby(list(sk), sort=False)["n"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        hot_keys = (
            meta.map_batches(
                partial_totals, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            )
            .groupby(list(sk))
            .sum("n")
            .map_batches(
                lambda t: t.filter(pa.compute.greater(t["sum(n)"], pa.scalar(thr))),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        if not len(hot_keys):
            return {}
        # vectorized tuple matching (shared hashing.key_matcher — a
        # pd.MultiIndex.isin here hashes a Python tuple per meta row)
        hot_matcher = hashing.key_matcher(
            [tuple(r) for r in hot_keys[list(sk)].itertuples(index=False)],
            len(sk),
        )

        def only_hot_tbl(tbl: pa.Table) -> pa.Table:
            pos = hashing.match_key_ordinals(tbl, sk, hot_matcher)
            return tbl.filter(pa.array(pos >= 0)).drop_columns(["__kb"])

    else:
        cand_set = np.sort(cand_arr)

        def only_hot_tbl(tbl: pa.Table) -> pa.Table:
            kb = tbl["__kb"].to_numpy(zero_copy_only=False)
            return tbl.filter(pa.array(np.isin(kb, cand_set))).drop_columns(["__kb"])

    # candidate filter runs as tasks over the pinned meta blocks (the
    # buckets were computed once in the scan pass); metadata rows of hot
    # sessions are small relative to their token counts, so combine on
    # the driver below ``driver_collect_limit`` rows, else compute the
    # per-session prefix sums distributed
    @_ray_.remote(num_returns=2)
    def _filter_hot(tbl: pa.Table):
        if tbl.num_rows == 0:
            # zero-row blocks arrive schema-less (same reality the
            # sketch pass guards); they're dropped by count below
            return tbl, 0
        if "__kb" not in tbl.column_names:
            # rows without the tag would silently skip hot detection
            # (the Zipf straggler the index exists to prevent)
            raise KeyError("meta block with rows but no __kb tag column")
        out = only_hot_tbl(tbl)
        return out, out.num_rows

    hot_refs = []
    cnt_refs = []
    for r in kb_refs:
        tref, cref = _filter_hot.remote(r)
        hot_refs.append(tref)
        cnt_refs.append(cref)
    cnts = _ray_.get(cnt_refs)
    n_hot = int(sum(cnts))
    # drop empty (possibly schema-less) outputs before any concat/union
    hot_refs = [t for t, c in zip(hot_refs, cnts) if c > 0]
    del kb_refs, pair_refs  # unpin the meta blocks
    if n_hot > driver_collect_limit:  # 10^12-scale path

        def per_session(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(list(ok), kind="mergesort").copy()
            g["start_tick"] = np.concatenate(
                [[0], np.cumsum(g["n_tok"].to_numpy(dtype=np.int64))[:-1]]
            )
            return g[[*sk, *ok, "n_tok", "start_tick"]]

        import ray.data as _rd

        hot = (
            _rd.from_arrow_refs(hot_refs)
            .groupby(list(sk)).map_groups(per_session, batch_format="pandas")
            .to_pandas()
        )
        index: dict = {}
        for key, g in hot.groupby(list(sk), sort=False):
            key = key if isinstance(key, tuple) else (key,)
            # rows within a group arrive contiguous and ok-sorted from
            # per_session (map_groups emits each group whole)
            seqs = g[list(ok)[0]].to_numpy(dtype=np.int64)
            starts = g["start_tick"].to_numpy(dtype=np.int64)
            total = int(starts[-1]) + int(g["n_tok"].to_numpy(dtype=np.int64)[-1])
            if total > thr:  # drop sketch-collision keys (false positives)
                index[key] = (seqs, starts, total)
        return index

    # common path: Arrow-native driver combine — a pandas
    # sort_values/groupby over ~1M string-keyed rows costs >1s of serial
    # driver time at every parallelism level (pure scaling overhead)
    index = {}
    if n_hot == 0:
        return index
    hot_tbl = pa.concat_tables(
        _ray_.get(hot_refs), promote_options="permissive"
    )
    order = pa.compute.sort_indices(
        hot_tbl.select([*sk, *ok]),
        sort_keys=[(c, "ascending") for c in (*sk, *ok)],
    )
    hot_tbl = hot_tbl.take(order)
    m = hot_tbl.num_rows
    n = hot_tbl["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(n)[:-1]])
    key_change = np.zeros(m, dtype=bool)
    key_change[0] = True
    for c in sk:
        col = hot_tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        key_change[1:] |= _null_safe_change(col, m)
    # restart the running sum at each session boundary
    sess_base = np.maximum.accumulate(np.where(key_change, cum, -1))
    starts_all = cum - sess_base
    seqs_all = hot_tbl[ok[0]].to_numpy(zero_copy_only=False).astype(np.int64)
    first_rows = np.flatnonzero(key_change)
    bounds = np.append(first_rows, m)
    key_rows = hot_tbl.select(list(sk)).take(pa.array(first_rows)).to_pylist()
    for i, kd in enumerate(key_rows):
        s, e = int(bounds[i]), int(bounds[i + 1])
        total = int(starts_all[e - 1]) + int(n[e - 1])
        if total > thr:  # drop sketch-collision keys (false positives)
            index[tuple(kd[c] for c in sk)] = (
                seqs_all[s:e], starts_all[s:e], total,
            )
    return index


def segment_sessions(
    ds,
    spec: WindowSpec,
    session_key=("doc_id", "source"),
    order_key=("seq_no",),
    chunk_ticks: int | None = 1_048_576,
    num_buckets: int = 128,
    impl: str = "bucket",
    split_ticks: int | None = None,
    meta_ds=None,
    payload: str = "inline",
    **opts,
):
    """Multi-row sessionize + segment: one hash shuffle, two impls.

    - ``impl="bucket"`` (default, the scale path): hash each session key
      into one of ``num_buckets`` buckets, shuffle by bucket, sort each
      bucket block by ``(session_key..., order_key...)`` and run ONE
      vectorized kernel over all its sessions. Python overhead is
      O(num_buckets), not O(num_sessions).
    - ``impl="groups"``: one task per session with the chunked streaming
      loop (bounded ``chunk_ticks + lookahead`` kernel memory — the W2
      analog for monster sessions; reference
      ``src/features/YAMNetExtractor.py:78-95``).

    Hot-key splitting (bucket impl): sessions bigger than ``split_ticks``
    (default ``4 * 48 * 4096`` ticks, hop-aligned) are SPLIT across
    buckets by tick-chunk, with boundary rows duplicated into the
    preceding chunk so every window's tokens are local; window ownership
    by start tick keeps emission exactly-once (SURVEY §7.4.2-3). A
    Zipf-hot doc no longer serializes one task. Requires a cheap
    metadata-only prefix-sum pre-pass. Lag history and lead are carried
    across cuts by widening the duplication range by ``lag``/``lead``.

    ``payload="sidechannel"`` (bucket impl): the ZERO-COPY exchange.
    Token values never ride the sort — each tag task ``ray.put``s its
    batch's values array once and ships only ``(uid, offset, len)``
    pointers (~40 B/row vs ~1 KB/row); per-bucket tasks read the arrays
    straight from the object store (shared-memory, not copied) and
    gather each session's stream in one vectorized scatter. This removes
    two full materializations of the token bytes (Ray's SortReduce
    concat-sort-take and the per-bucket ``take``), measured >2x on the
    sessions pipeline. Trade-off (why it is opt-in): the payload objects
    are owned by the map workers, so a lost worker makes its uids
    unrecoverable mid-run — a retried reduce task cannot re-derive them
    (lineage stops at ``ray.put``). Use for throughput on healthy
    clusters; default ``inline`` keeps full task-lineage recovery.

    ``payload="blockref"``: sidechannel minus the ``ray.put`` copy. The
    token values already sit in the object store as the read tasks'
    output blocks, so the stage materializes the read once
    (``to_arrow_refs``), registers each BLOCK's ObjectRef, and tag tasks
    ship pointers into those blocks; reduce workers extract the values
    child buffer zero-copy on first touch. One full plasma write of the
    corpus (and one read of it) disappears vs ``sidechannel``, and the
    same materialized blocks feed hot-key discovery — exactly one scan
    of the input for the whole stage. Recovery is strictly better than
    ``sidechannel``: a killed WORKER mid-exchange is survived with
    bit-identical output (task retry re-reads the still-registered
    blocks — proven by ``tests/test_blockref_recovery.py``, which
    SIGKILLs busy workers mid-run), and on whole-NODE loss the blocks
    re-derive from read-task lineage where a ``ray.put`` cannot (this
    multi-node case is by design untestable on the single-node sandbox
    — plasma outlives workers, only node loss evicts it). Cost: losing
    read→tag streaming overlap (tag is pointer math, so the overlap was
    worth little). Memory profile matches ``sidechannel``: the exchange
    pins the payload either way.
    """
    sk, ok = tuple(session_key), tuple(order_key)
    if payload not in ("inline", "sidechannel", "blockref"):
        raise ValueError(
            f"payload must be 'inline', 'sidechannel' or 'blockref', got "
            f"{payload!r}"  # a typo silently losing the zero-copy exchange
        )
    if impl not in ("bucket", "groups"):
        raise ValueError(f"impl must be 'bucket' or 'groups', got {impl!r}")
    blockref = payload == "blockref" and impl == "bucket"
    sidechannel = (payload == "sidechannel" or blockref) and impl == "bucket"

    if impl == "groups":
        ct = chunk_ticks

        def fn(group: pa.Table) -> pa.Table:
            return _session_group_fn(group, spec, sk, ok, ct, opts)

        return ds.groupby(list(sk)).map_groups(fn, batch_format="pyarrow")

    import pandas as pd
    import ray as _ray

    registry = None
    if sidechannel:
        registry = _ray.remote(num_cpus=0)(_BufRegistry).remote()

    block_refs = None
    if blockref:
        # ``payload="blockref"``: the token values ALREADY live in the
        # object store as the read tasks' output blocks — re-``ray.put``
        # ing them per tag task (payload="sidechannel") writes one full
        # extra copy of the corpus through plasma. Materialize the read
        # once, register each block's ObjectRef under a run-unique uid,
        # and ship only (uid, offset, len) pointers; reduce workers
        # extract the values child buffer zero-copy on first touch.
        # Memory profile is unchanged vs sidechannel (the exchange pins
        # payload objects either way); recovery is BETTER: a lost block
        # re-derives from its read task's lineage, a lost ray.put does
        # not. The same materialized blocks feed hot-key discovery, so
        # the stage scans the input exactly once.
        import ray.data as _rd

        block_refs = ds.to_arrow_refs()
        if meta_ds is None:
            meta_ds = _rd.from_arrow_refs(block_refs).select_columns(
                [*sk, *ok, "n_tok"]
            )

    lag_n = int(opts.get("lag") or 0)
    lead_n = int(opts.get("lead") or 0)
    # duplication range covers the window lookahead past a chunk cut plus
    # lead — the SAME formula as _session_group_fn, kept on the shared
    # spec.lookahead property so the two sites cannot drift
    la = spec.lookahead + (1 if spec.mode == "segment" else 0) + lead_n
    # hot splitting maps rows to ticks via (hot-key ordinal, ok[0]) —
    # with a MULTI-column order key, duplicate ok[0] values inside a hot
    # session would resolve to the wrong start tick (silently wrong
    # windows), so splitting is disabled: sessions stay unsplit and
    # correct (use impl="groups" to chunk composite-ordered sessions).
    # split_ticks=0 (or negative) disables splitting explicitly.
    if split_ticks is None:
        split_ticks = ((48 * 4096) // spec.hop) * spec.hop * 4
    want_split = split_ticks > 0 and len(ok) == 1
    C = max(spec.hop, (max(split_ticks, 1) // 4 // spec.hop) * spec.hop)
    width = spec.window if spec.mode == "frame" else spec.window + 1

    hot_ref = None
    if want_split:
        # meta_ds: optional column-pruned metadata read (select_columns on
        # an arbitrary Dataset does NOT push the projection into the scan;
        # callers reading parquet should pass read_parquet(columns=[...]))
        hot = _hot_session_index(ds, sk, ok, split_ticks, meta_ds=meta_ds)
        if hot:
            # flat broadcast layout: per-COLUMN value dictionaries +
            # mixed-radix composite codes, so the tagger resolves every
            # row with per-column ``pc.index_in`` (C++ hash over the raw
            # column) + one searchsorted — the asof ``_EventIndex``
            # pattern. A ``pd.MultiIndex.get_indexer`` here hashed a
            # Python tuple per row and dominated the tag task.
            hot_keys = list(hot)
            col_uniq: list[pa.Array] = []
            radices: list[int] = []
            key_codes = np.zeros(len(hot_keys), dtype=np.int64)
            for ci in range(len(sk)):
                vals = list(dict.fromkeys(k[ci] for k in hot_keys))
                lut = {v: i for i, v in enumerate(vals)}
                r = max(1, len(vals))
                col_uniq.append(pa.array(vals))
                radices.append(r)
                key_codes = key_codes * r + np.array(
                    [lut[k[ci]] for k in hot_keys], dtype=np.int64
                )
            code_order = np.argsort(key_codes)
            matcher = (
                col_uniq,
                radices,
                key_codes[code_order],  # sorted composite codes
                code_order.astype(np.int64),  # -> ordinal in hot_keys order
            )
            all_seqs = np.concatenate([hot[k][0] for k in hot_keys])
            all_starts = np.concatenate([hot[k][1] for k in hot_keys])
            counts = np.array([len(hot[k][0]) for k in hot_keys], dtype=np.int64)
            comp_key = np.repeat(np.arange(len(hot_keys), dtype=np.int64), counts)
            _SEQ_BIG = np.int64(1) << 42  # seq_no < 2^42
            # composite (key ordinal, seq) must stay a sorted int64 —
            # wrap would make searchsorted return WRONG start ticks
            # silently, so both bounds fail loudly instead
            if len(hot_keys) >= (1 << 21):
                raise ValueError(
                    f"{len(hot_keys)} hot sessions exceed the 2^21 composite "
                    "bound; raise split_ticks so fewer sessions qualify"
                )
            if len(all_seqs) and (
                int(all_seqs.min()) < 0 or int(all_seqs.max()) >= int(_SEQ_BIG)
            ):
                raise ValueError(
                    "order-key values outside [0, 2^42) corrupt the hot-split "
                    "composite ordering"
                )
            comp_all = comp_key * _SEQ_BIG + all_seqs
            hot_ref = _ray.put((hot, matcher, comp_all, all_starts, _SEQ_BIG))

    def _bucket_of(
        keys_df: "pd.DataFrame", extra: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(key_hash uint64, bucket id). The key hash also rides the
        exchange as ``__h`` so the per-bucket sort compares ints first
        and touches the key strings only to break hash collisions."""
        h = hashing.combined_key_hash(keys_df[c] for c in keys_df.columns)
        hb = h
        if extra is not None:
            hb = h ^ (
                (extra.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
                * np.uint64(0xBF58476D1CE4E5B9)
            )
        return h, (hb % np.uint64(num_buckets)).astype(np.int64)

    def tag(batch: pa.Table, _pre=None) -> pa.Table:
        """Tag one block with (bucket, hash, chunk[, payload pointers]).

        ``_pre``: blockref path — ``(voff, vlen, n_tok_np, uid)`` already
        extracted from the registered read block (tokens/n_tok dropped by
        the caller); no ray.put happens in that mode."""
        voff = vlen = None
        uid_row = None
        if sidechannel and _pre is not None:
            voff, vlen, uid_row, n_tok_np = _pre
        elif sidechannel:
            # payload stays OUT of the exchange: values go to the object
            # store once; rows carry only (uid, offset, len) pointers
            values_all, offsets_all = list_buffers(batch["tokens"])
            voff = offsets_all[:-1].astype(np.int64, copy=True)
            vlen = np.diff(offsets_all)
            n_tok_np = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.drop_columns(
                [c for c in ("tokens", "n_tok") if c in batch.column_names]
            )
        kdf = pd.DataFrame({c: batch[c].to_pandas() for c in sk})
        chunk = np.full(batch.num_rows, -1, dtype=np.int64)
        if hot_ref is not None:
            _hot_idx, matcher, comp_all, all_starts, SEQ_BIG = _ray.get(hot_ref)
            if sidechannel:
                n_tok = n_tok_np
            else:
                n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
            seq = batch[ok[0]].to_numpy(zero_copy_only=False).astype(np.int64)
            # vectorized hot-key lookup: per-column index_in + composite
            col_uniq_, radices_, hot_comb_, hot_ord_ = matcher
            comb = np.zeros(batch.num_rows, dtype=np.int64)
            unknown = np.zeros(batch.num_rows, dtype=bool)
            for c, uniq, r in zip(sk, col_uniq_, radices_):
                col = batch[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if col.type != uniq.type:
                    col = col.cast(uniq.type)
                idx = pa.compute.fill_null(
                    pa.compute.index_in(col, value_set=uniq), -1
                )
                idx = np.asarray(idx).astype(np.int64)
                unknown |= idx < 0
                comb = comb * r + np.where(idx < 0, 0, idx)
            p_ = np.searchsorted(hot_comb_, comb)
            safe_ = np.minimum(p_, len(hot_comb_) - 1)
            hit = (~unknown) & (hot_comb_[safe_] == comb)
            pos = np.where(hit, hot_ord_[safe_], -1)
            hot_rows = pos >= 0
            if hot_rows.any():
                ridx = np.flatnonzero(hot_rows)
                # composite searchsorted: (hot key ordinal, seq_no) ->
                # the row's session start tick
                target = pos[ridx].astype(np.int64) * SEQ_BIG + seq[ridx]
                t0 = all_starts[np.searchsorted(comp_all, target)]
                t1 = t0 + n_tok[ridx]
                c_lo = np.maximum((t0 - la) // C, 0)
                # +lag_n: trailing rows also serve following chunks' lookbehind
                c_hi = np.maximum(-(-(t1 + lag_n) // C) - 1, c_lo)
                reps = (c_hi - c_lo + 1).astype(np.int64)
                dup_idx = np.repeat(ridx, reps)
                cum = np.concatenate([[0], np.cumsum(reps)])
                ch = np.arange(int(reps.sum()), dtype=np.int64)
                ch -= np.repeat(cum[:-1], reps)
                ch += np.repeat(c_lo, reps)
                normal_idx = np.flatnonzero(~hot_rows)
                all_idx = np.concatenate([normal_idx, dup_idx])
                all_chunk = np.concatenate(
                    [np.full(len(normal_idx), -1, dtype=np.int64), ch]
                )
                batch = batch.take(pa.array(all_idx))
                kdf = kdf.iloc[all_idx].reset_index(drop=True)
                chunk = all_chunk
                if sidechannel:
                    # duplication copies 16 bytes of pointers, not tokens
                    voff, vlen = voff[all_idx], vlen[all_idx]
                    if uid_row is not None:
                        uid_row = uid_row[all_idx]
        h, bucket = _bucket_of(kdf, np.maximum(chunk, 0))
        if sidechannel:
            import os as _os

            if uid_row is None:
                uid = int.from_bytes(_os.urandom(8), "little") >> 1
                ref = _ray.put(np.ascontiguousarray(values_all))
                # synchronous register: the uid is resolvable before this
                # tag task's output block exists, so per_bucket can never
                # miss it
                _ray.get(registry.register.remote(uid, [ref]))
                uid_row = np.full(batch.num_rows, uid, dtype=np.int64)
            batch = batch.append_column("__uid", pa.array(uid_row))
            batch = batch.append_column("__voff", pa.array(voff))
            batch = batch.append_column("__vlen", pa.array(vlen))
        batch = batch.append_column("__h", pa.array(h.view(np.int64)))
        batch = batch.append_column("__chunk", pa.array(chunk))
        return batch.append_column("__bucket", pa.array(bucket))

    def per_bucket(group: pa.Table) -> pa.Table:
        # __h leads the sort: int comparisons resolve almost every pair;
        # sessions stay contiguous because (__h, sk...) still clusters
        # every row of a key
        order = pa.compute.sort_indices(
            group.select(["__h", *sk, "__chunk", *ok]),
            sort_keys=[(c, "ascending") for c in ("__h", *sk, "__chunk", *ok)],
        )
        block = group.take(order).drop_columns(["__bucket", "__h"])
        uid = voff = vlen = arrs = None
        if sidechannel:
            uid = block["__uid"].to_numpy(zero_copy_only=False)
            voff = block["__voff"].to_numpy(zero_copy_only=False)
            vlen = block["__vlen"].to_numpy(zero_copy_only=False)
            uniq = [int(u) for u in np.unique(uid)]
            # per-worker uid -> values cache: one registry RPC per uid per
            # WORKER, not per group — with fine-grained buckets (hundreds
            # of map_groups calls) the per-call round-trip would dominate.
            # sidechannel uids carry 63 random bits; blockref base uids
            # carry 39 random bits but the DRIVER tracks every base it
            # ever issued (_issued_uid_bases), so a later run in the same
            # session can never re-issue a uid a worker still caches.
            # Cap the cache so a long-lived worker can't pin unbounded
            # payload objects.
            cache = _worker_payload_cache
            miss = [u for u in uniq if u not in cache]
            if miss and blockref:
                # uid -> (block base, chunk): fetch each missing BLOCK
                # once and cache every chunk's raw values buffer
                # (zero-copy plasma views — combine_chunks would copy)
                blks = sorted({u & _UID_BLOCK_MASK for u in miss})
                tbls = _ray.get(_ray.get(registry.fetch.remote(blks)))
                for bu, tb in zip(blks, tbls):
                    for j, v in enumerate(_chunk_values(tb.column("tokens"))):
                        cache[bu + j] = v
            elif miss:
                refs = _ray.get(registry.fetch.remote(miss))
                for u, arr in zip(miss, _ray.get(refs)):
                    cache[u] = arr
            arrs = {u: cache[u] for u in uniq}
            if len(cache) > 4096:  # pragma: no cover — huge runs
                # evict AFTER building arrs (a needed uid must survive)
                # and skip this group's uids; insertion order is oldest
                # first, and blockref chunk uids of one block were
                # inserted contiguously so whole blocks unpin together
                keep = set(uniq)
                for u in list(cache):
                    if len(cache) <= 4096:
                        break
                    if u not in keep:
                        del cache[u]
            block = block.drop_columns(["__uid", "__voff", "__vlen"])
        chunk_col = block["__chunk"].to_numpy(zero_copy_only=False)
        normal_mask = chunk_col < 0
        outs = []
        normal = block.filter(pa.array(normal_mask)).drop_columns(["__chunk"])
        if normal.num_rows:
            bufs = None
            if sidechannel:
                nm = np.flatnonzero(normal_mask)
                bufs = _gather_payload(arrs, uid[nm], voff[nm], vlen[nm], key="gp_n")
            outs.append(_segment_sorted_block(normal, spec, sk, opts, buffers=bufs))
        if not normal_mask.all():
            hot_idx = _ray.get(hot_ref)[0]
            hot_part = block.filter(pa.array(~normal_mask))
            hp = pd.DataFrame({c: hot_part[c].to_pandas() for c in sk})
            hp["__chunk"] = hot_part["__chunk"].to_numpy(zero_copy_only=False)
            if sidechannel:
                hm = np.flatnonzero(~normal_mask)
                values, row_start, row_len_all = _gather_payload(
                    arrs, uid[hm], voff[hm], vlen[hm], key="gp_h"
                )
            else:
                values, offsets = list_buffers(hot_part["tokens"])
                row_start, row_len_all = offsets[:-1], np.diff(offsets)
            seq = hot_part[ok[0]].to_numpy(zero_copy_only=False).astype(np.int64)
            for key_and_chunk, g in hp.groupby([*sk, "__chunk"], sort=True):
                key = tuple(key_and_chunk[:-1])
                c = int(key_and_chunk[-1])
                ridx = g.index.to_numpy()
                seqs, starts, sess_len = hot_idx[key]
                t0 = starts[np.searchsorted(seqs, seq[ridx])]
                out = _emit_hot_chunk(
                    hot_part, ridx, sk, values, row_start, row_len_all, t0, c, C,
                    sess_len, spec, opts,
                )
                if out is not None:
                    outs.append(out)
        if not outs:
            empty = block.drop_columns(["__chunk"]).slice(0, 0)
            return _segment_sorted_block(empty, spec, sk, opts)
        return pa.concat_tables(outs)

    # exchange: sort-based groupby. (A keyed-repartition hash exchange was
    # measured under DataContext HASH_SHUFFLE and was strictly slower on
    # this Ray version — the sort path stays.)
    if blockref and block_refs:
        import os as _os

        import ray.data as _rd

        # run-unique RANDOM base uid per block (aligned so chunk j of the
        # block is base + j — see _UID_CHUNK_BITS): reduce workers cache
        # uid -> values across Dataset runs in one Ray session, so block
        # INDICES alone would alias a previous run's payloads
        uids: list[int] = []
        while len(uids) < len(block_refs):
            u = (int.from_bytes(_os.urandom(8), "little") >> 1) & _UID_BLOCK_MASK
            if u not in _issued_uid_bases:
                _issued_uid_bases.add(u)
                uids.append(u)
        # register BEFORE tagging: every uid resolves before any tagged
        # block can reach a reduce task (and the registry pins the blocks
        # for the lifetime of the exchange)
        _ray.get(
            registry.register_many.remote(uids, [[r] for r in block_refs])
        )

        @_ray.remote
        def _tag_block(tbl: pa.Table, uid_base_: int) -> pa.Table:
            if tbl.num_rows == 0 and "tokens" not in tbl.column_names:
                # zero-row blocks from to_arrow_refs can arrive
                # SCHEMA-LESS ("new schema: ." — the _block_sketch /
                # _filter_hot guard); emit a zero-column empty so the
                # exchange unifies it away instead of KeyError-ing here
                return pa.table({})
            # pointers only — token values never leave the block; raw
            # chunk offsets, NO combine_chunks (it copies, even for a
            # single chunk)
            voff, vlen, uid_row = _chunk_pointers(tbl.column("tokens"), uid_base_)
            n_tok_np = tbl["n_tok"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            tbl = tbl.drop_columns(
                [c for c in ("tokens", "n_tok") if c in tbl.column_names]
            )
            return tag(tbl, _pre=(voff, vlen, uid_row, n_tok_np))

        tagged = _rd.from_arrow_refs(
            [_tag_block.remote(r, u) for r, u in zip(block_refs, uids)]
        )
    else:
        # batch_size=None: one tag call per BLOCK. The default 1024-row
        # batch would pay the side-channel ray.put + sync registry
        # round-trip (and the hot-key lookup setup) ~rows/1024 times
        # instead of once per block — measured as the tag stage
        # anti-scaling at higher parallelism.
        tagged = ds.map_batches(
            tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    if sidechannel:
        # the tagged stream is now ~40 B/row metadata; its block count sets
        # the sort's reduce fan-out. 2 tasks per core, not 4: measured at
        # 32 cpus, 64 parts runs the reduce ~30% faster than 128 (fewer,
        # bigger tasks keep per-worker arenas warm and stop the extra
        # wave from thrashing the shared memory bus); 64 also flattens
        # the per-bucket tail at 8 cpus (BASELINE.md scaling knobs)
        try:
            ncpu = int(_ray.cluster_resources().get("CPU", 8))
        except Exception:  # pragma: no cover — not initialised
            ncpu = 8
        import os as _os

        parts = int(
            _os.environ.get("TOKWIN_EXCHANGE_PARTS") or "0"
        ) or min(num_buckets, max(8, 2 * ncpu))
        tagged = tagged.repartition(parts)
    return tagged.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def _emit_hot_chunk(
    hot_part, ridx, sk, values, row_start, row_len_all, t0, c, C, sess_len, spec, opts
):
    """Emit the windows OWNED by tick-chunk ``c`` of one hot session.

    ``ridx`` are the (contiguous, seq-ordered) row positions of this
    chunk's buffer in ``hot_part`` — the chunk's rows plus the duplicated
    boundary rows. The chunk's rows must be contiguous in ``values``
    (true for Arrow list child buffers and for the side-channel gather),
    so the buffer stream is one span. Window ownership: start tick in
    ``[c*C, min((c+1)*C, sess_len))`` — exactly-once across chunks
    (SURVEY §7.4.2).
    """
    row_len = row_len_all[ridx]
    buf_start_tick = int(t0[0])
    v0 = int(row_start[ridx[0]])
    buf_end_tick = int(t0[-1] + row_len[-1])
    own_start = c * C
    own_end = min((c + 1) * C, sess_len)
    owned = own_end - own_start
    if owned <= 0 or own_start < buf_start_tick or own_start >= buf_end_tick:
        return None
    v_own = v0 + (own_start - buf_start_tick)
    avail = buf_end_tick - own_start
    key_tbl = hot_part.select(list(sk)).take(pa.array(ridx[:1]))
    return _emit_windows(
        key_tbl,
        list(sk),
        values,
        row_value_start=np.array([v_own], dtype=np.int64),
        row_value_len=np.array([owned], dtype=np.int64),
        row_base_tick=np.array([own_start], dtype=np.int64),
        spec=spec,
        is_final=np.array([own_end >= sess_len]),
        avail_len=np.array([avail], dtype=np.int64),
        lag_avail=np.array([own_start - buf_start_tick], dtype=np.int64),
        **opts,
    )
