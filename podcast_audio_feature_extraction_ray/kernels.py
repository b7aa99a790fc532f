"""Pure-numpy window kernels — the vectorized heart of the engine.

These functions operate on the flat ``(values, offsets)`` representation
of an Arrow ``list<int32>`` column (zero-copy views of the Arrow buffers)
and are shared by:

- the stateless row-segmenter stage (each row is a complete session),
- the grouped sessionize+segment stage (rows concatenated per session),
- the chunked streaming segmenter (bounded-lookahead, W2 analog),
- the conformance oracle in tests (which deliberately uses a separate,
  loop-based reimplementation in ``oracle.py`` — these kernels are the
  ENGINE, not the oracle).

Window semantics (see ``config.WindowSpec``) replicate the reference's
boundary arithmetic token-for-token:
- frame mode:   reference ``data/custom_FrameModeFunctionals.conf.inc:8-11``
- segment mode: reference ``src/search/index.py:76-89`` (``math.ceil``
  loop bound, inclusive-both-ends membership by start tick only)

No Python loops over rows or windows: window planning, token gather and
per-window aggregates are all O(total_tokens) vectorized numpy.
"""

from __future__ import annotations

import numpy as np

from podcast_audio_feature_extraction_ray.config import WindowSpec

__all__ = [
    "plan_windows",
    "concat_ranges",
    "gather_windows",
    "window_aggregates",
    "lag_lead_windows",
]


def plan_windows(
    lengths: np.ndarray,
    spec: WindowSpec,
    base_tick: np.ndarray | None = None,
    is_final: np.ndarray | None = None,
    avail_len: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Plan all windows for a batch of sessions (or session chunks).

    Args:
        lengths: int64[n_rows] — OWNED token count of each row (chunk
            ticks, excluding any lookahead tokens carried in the buffer).
        spec: window geometry.
        base_tick: optional int64[n_rows] global tick of each row's first
            owned token (chunked processing of one long session). Window
            starts are always aligned to the GLOBAL stream origin
            (multiples of ``hop`` from tick 0); a row owns exactly the
            windows whose start tick falls inside
            ``[base_tick, base_tick + length)`` (window ownership by start
            tick — SURVEY §7.4.2), so each window is emitted exactly once
            across chunk cuts. Chunk cuts MUST be aligned to multiples of
            ``hop`` so the required lookahead is bounded by
            ``spec.lookahead`` (the reference's 300s chunk is exactly 625
            hops — ``src/features/YAMNetExtractor.py:78``).
        is_final: optional bool[n_rows] — whether the row contains the END
            of its session (default: all True). Affects only segment mode,
            whose loop bound is ``ceil(last_tick) = L - 1``.
        avail_len: optional int64[n_rows] — tokens actually present in the
            row's buffer from ``base_tick`` on (owned + lookahead). Slices
            are clipped to this. Default: ``lengths``.

    Returns:
        (row_idx, win_id, ts_start, slice_len) — one entry per window.
        ``ts_start`` is the global start tick, ``win_id = ts_start // hop``.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    H, W = spec.hop, spec.window
    if base_tick is None:
        base_tick = np.zeros(n, dtype=np.int64)
    else:
        base_tick = np.asarray(base_tick, dtype=np.int64)
    if is_final is None:
        is_final = np.ones(n, dtype=bool)
    if avail_len is None:
        avail_len = lengths
    chunk_end = base_tick + lengths

    if spec.mode == "frame":
        # windows at k*H while k*H < L (half-open [kH, kH+W))
        own_end = chunk_end
    else:
        # windows at s in range(0, ceil(last_tick), H): s < L - 1;
        # the -1 applies only where the session actually ends.
        own_end = chunk_end - is_final.astype(np.int64)

    # first window owned by each row: smallest k*H >= base_tick
    first_k = -(-base_tick // H)  # ceil div
    n_wins = np.maximum(-(-(own_end - first_k * H) // H), 0)
    n_wins = np.where(lengths > 0, n_wins, 0)

    total = int(n_wins.sum())
    row_idx = np.repeat(np.arange(n, dtype=np.int64), n_wins)
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_wins, out=cum[1:])
    k = np.arange(total, dtype=np.int64) - cum[:-1][row_idx] + first_k[row_idx]
    ts_start = k * H

    width = W if spec.mode == "frame" else W + 1  # inclusive [s, s+W]
    clip = (base_tick + np.asarray(avail_len, dtype=np.int64))[row_idx]
    end_excl = np.minimum(ts_start + width, clip)
    slice_len = end_excl - ts_start
    return row_idx, k, ts_start, slice_len


def concat_ranges(starts: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized concatenation of integer ranges.

    Returns (flat_indices, out_offsets) where
    ``flat_indices = concatenate([arange(s, s+l) for s, l in zip(starts, lens)])``
    and ``out_offsets`` is the int64[n+1] offsets array of the result.
    """
    lens = np.asarray(lens, dtype=np.int64)
    out_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offsets[1:])
    total = int(out_offsets[-1])
    idx = np.arange(total, dtype=np.int64)
    idx += np.repeat(np.asarray(starts, dtype=np.int64) - out_offsets[:-1], lens)
    return idx, out_offsets


def gather_windows(
    values: np.ndarray,
    row_value_start: np.ndarray,
    row_base_tick: np.ndarray,
    row_idx: np.ndarray,
    ts_start: np.ndarray,
    slice_len: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Gather window token slices from the flat values buffer.

    ``row_value_start[i]`` is the index into ``values`` of row i's first
    token; ``row_base_tick[i]`` the global tick of that token.
    Returns (seg_values, seg_offsets) in Arrow list layout.
    """
    starts = row_value_start[row_idx] + (ts_start - row_base_tick[row_idx])
    idx, seg_offsets = concat_ranges(starts, slice_len)
    return values[idx], seg_offsets


def _check_functional_bounds(
    n_max: int, v_absmax: int, buf_len: int | None = None
) -> None:
    """Exact-int64 safety for the slope intermediates: ``den =
    n²(n²-1)/12`` (overflows near n ~ 102k regardless of values) and
    ``|num| <= 2·n³·max|v|`` (overflows earlier for large tokens). The
    Python/SQL oracles compute these in exact bigints, so a wrapped
    int64 here would be a WRONG slope, not an error — raise instead.
    ``v_absmax`` must be the max ABSOLUTE value: an all-negative window
    has tok_max <= 0 but the same |num| magnitude (callers pass
    max(|tok_min|, |tok_max|)). Checked in exact Python ints; ~50k-token
    windows with 32-bit values are safe, real window widths are orders
    of magnitude below.

    ``buf_len``: the STREAM path only — its Σ(i·v) uses buffer-indexed
    positions (``reduceat(pos·v) - start·Σv``), so the intermediates
    scale with the session-buffer length m, not the window length:
    ``|reduceat(pos·v)| <= n·m·max|v|`` and ``|start·Σv| <= m·n·max|v|``.
    A ~20M-token buffer of near-2^31 values would wrap these silently;
    raise so the caller shrinks the batch instead. The gathered path
    uses window-local indices and needs no such bound."""
    n = int(n_max)
    mv = max(int(v_absmax), 1)
    if n * n * (n * n - 1) // 12 >= 2**63 or 2 * n**3 * mv >= 2**63:
        raise ValueError(
            f"functional slope would overflow exact int64: window length {n} "
            f"with max token value {mv}; shorten windows or disable functionals"
        )
    if buf_len is not None and n * int(buf_len) * mv >= 2**63:
        raise ValueError(
            f"stream-path slope would overflow exact int64: window length {n} "
            f"x buffer length {buf_len} x max token value {mv} >= 2^63; "
            "reduce the batch/chunk size or token magnitude"
        )


def window_features_stream(
    values: np.ndarray,
    sess_bounds: np.ndarray,
    sess_base_tick: np.ndarray,
    win_sess: np.ndarray,
    ts_start: np.ndarray,
    slice_len: np.ndarray,
    win_k: np.ndarray,
    first_k: np.ndarray,
    win_offset: np.ndarray,
    width: int,
    hop: int,
    gt_threshold: int = 25_000,
    match_token: int = 13,
    functionals: bool = False,
) -> dict[str, np.ndarray]:
    """Per-window aggregate family computed DIRECTLY on the session value
    buffer — no window gather, minimal memory traffic.

    Args:
        values: flat token buffer; sessions tile ``[sess_bounds[0],
            sess_bounds[-1])`` contiguously in ascending order.
        sess_bounds: int64[n_sess+1] value-index boundaries per session.
        sess_base_tick: global tick of each session's first buffered token.
        win_sess / ts_start / slice_len / win_k: one entry per window, in
            (session, k) order (``plan_windows`` output).
        first_k: per session, the k of its first owned window.
        win_offset: per session, index of its first window in the window
            arrays (cumulative window counts).
        width: ticks a full window covers (W for frame, W+1 for segment).
        hop: H.

    Sums/maxes use interleaved-pairs ``reduceat`` (each window reduced in
    place over the stream). Distinct counts use the previous-occurrence
    trick: token position ``i`` is a first-occurrence within window
    ``[s, e)`` iff ``prev[i] < s`` where ``prev`` is the last earlier
    position holding the same value; each position then contributes +1 to
    the contiguous run of windows ``k`` with ``k*H <= tick(i) < k*H+width``
    and ``k*H > tick(prev)``, accumulated with two bincounts.

    With ``functionals=True`` the G1 functional family is appended
    (reference eGeMAPS percentile/slope functionals,
    ``src/features/OpenSmileExtractor.py:21-27`` consumed by
    ``src/search/metrics.py:33-57``), all integer-exact so SQL oracles
    match bit-for-bit:
    - ``tok_p20/p50/p80``: sorted-window element at zero-based index
      ``floor((n-1)*q)`` (discrete quantile, int64);
    - ``tok_slope``: least-squares slope of value vs in-window position,
      emitted as ONE double division of two exact int64s
      (``num = n*Σ(i·v) - Σi·Σv``, ``den = n*Σi² - (Σi)²``; 0.0 when
      ``n == 1``). Slope is gather-free (two extra reduceats);
      percentiles gather window values once and do a single composite
      ``(win << 32) | value`` int64 sort.
    """
    n_win = len(ts_start)
    out: dict[str, np.ndarray] = {"n_tokens": slice_len.astype(np.int64)}
    if n_win == 0:
        # column order must match the populated branch exactly
        z64 = np.zeros(0, dtype=np.int64)
        zf = np.zeros(0, dtype=np.float64)
        out["tok_sum"] = z64.copy()
        out["tok_max"] = z64.copy()
        out["tok_min"] = z64.copy()
        out["tok_mean"] = zf
        out["tok_std"] = zf.copy()
        out["freq_gt"] = z64.copy()
        out["match_count"] = z64.copy()
        if functionals:
            out["tok_p20"] = z64.copy()
            out["tok_p50"] = z64.copy()
            out["tok_p80"] = z64.copy()
            out["tok_slope"] = zf.copy()
        out["n_distinct"] = z64.copy()
        return out

    from podcast_audio_feature_extraction_ray.arena import ARENA

    lo, hi = int(sess_bounds[0]), int(sess_bounds[-1])
    v = values[lo:hi]
    m = len(v)
    rel_bounds = sess_bounds - lo
    starts = sess_bounds[win_sess] + (ts_start - sess_base_tick[win_sess]) - lo
    assert slice_len.min() > 0, "empty window emitted — kernel invariant broken"

    # sentinel so reduceat pair-ends may equal len(v); all big scratch is
    # arena-reused (fresh pages cost 40x here, see arena.py)
    v_s = ARENA.get("vs", m + 1, v.dtype)
    np.copyto(v_s[:-1], v)
    v_s[-1] = 0
    inter = ARENA.get("inter", 2 * n_win, np.int64)
    inter[0::2] = starts
    inter[1::2] = starts + slice_len

    out["tok_sum"] = np.add.reduceat(v_s, inter, dtype=np.int64)[::2]
    out["tok_max"] = np.maximum.reduceat(v_s, inter)[::2].astype(np.int64)
    out["tok_min"] = np.minimum.reduceat(v_s, inter)[::2].astype(np.int64)
    a64 = ARENA.get("a64", m + 1, np.int64)
    np.copyto(a64, v_s, casting="unsafe")
    np.multiply(a64, a64, out=a64)  # square in int64 (int32*int32 overflows)
    sqsum = np.add.reduceat(a64, inter)[::2]
    mean = out["tok_sum"] / out["n_tokens"]
    out["tok_mean"] = mean
    out["tok_std"] = np.sqrt(np.maximum(sqsum / out["n_tokens"] - mean * mean, 0.0))
    bmask = ARENA.get("bmask", m + 1, bool)
    np.greater(v_s, gt_threshold, out=bmask)
    out["freq_gt"] = np.add.reduceat(bmask, inter, dtype=np.int64)[::2]
    np.equal(v_s, match_token, out=bmask)
    out["match_count"] = np.add.reduceat(bmask, inter, dtype=np.int64)[::2]

    if functionals:
        n_ = out["n_tokens"]
        s0 = out["tok_sum"]
        _check_functional_bounds(
            n_.max(),
            max(int(out["tok_max"].max()), -int(out["tok_min"].min())),
            buf_len=m,
        )
        # percentile composite (win << 32) + value requires values in
        # [0, 2^32) — negative or wider values would corrupt the sort
        # and the mask-extracted p20/p50/p80 silently
        if int(out["tok_min"].min()) < 0 or int(out["tok_max"].max()) >= (1 << 32):
            raise ValueError(
                "stream percentile encoding requires token values in [0, 2^32)"
            )
        # slope, gather-free: Σ(i·v) over a window = reduceat(pos·v) minus
        # start·Σv (pos = buffer index; i = pos - window start). Requires
        # n · m · max|v| < 2^63 — enforced by the buf_len check above.
        np.copyto(a64, v_s, casting="unsafe")
        a64[:m] *= ARENA.iota(m)
        a64[m] = 0
        s1 = np.add.reduceat(a64, inter, dtype=np.int64)[::2] - starts * s0
        si = n_ * (n_ - 1) // 2
        sii = (n_ - 1) * n_ * (2 * n_ - 1) // 6
        num = n_ * s1 - si * s0
        den = n_ * sii - si * si
        out["tok_slope"] = np.where(den > 0, num / np.where(den > 0, den, 1), 0.0)
        # percentiles: gather window values once, ONE composite int64 sort
        # (win << 32 | value clusters each window's values sorted)
        gidx, goff = concat_ranges(starts, slice_len)
        T = int(goff[-1])
        compw = ARENA.get("compw", T, np.int64)
        compw.fill(0)
        compw[goff[1:-1]] = 1  # boundaries unique: slice_len > 0
        np.cumsum(compw, out=compw)
        compw <<= np.int64(32)
        compw += v[gidx]
        compw.sort()
        base = goff[:-1]
        mask32 = np.int64((1 << 32) - 1)
        for name, qn, qd in (("tok_p20", 1, 5), ("tok_p50", 1, 2), ("tok_p80", 4, 5)):
            pick = compw[base + ((n_ - 1) * qn) // qd]
            out[name] = np.bitwise_and(pick, mask32)
        # dict order: slope was inserted before the percentiles — rebuild
        # the intended order (p20, p50, p80, slope) for stable schemas
        out["tok_slope"] = out.pop("tok_slope")

    # ---- sliding distinct via previous-occurrence + range-add
    if m == 0:
        out["n_distinct"] = np.zeros(n_win, dtype=np.int64)
        return out
    if v.min() < 0:
        raise ValueError("window distinct kernel requires non-negative tokens")
    if m >= (1 << 31) or int(np.abs(sess_base_tick).max(initial=0)) + m >= (1 << 31):
        # monster-session guard: global ticks exceed int32 — fall back to
        # the gathered int64 path (correct, more memory traffic)
        seg_values, seg_offsets = gather_windows(
            values,
            sess_bounds[:-1],
            sess_base_tick,
            win_sess,
            ts_start,
            slice_len,
        )
        out["n_distinct"] = window_aggregates(
            seg_values, seg_offsets, gt_threshold, match_token
        )["n_distinct"]
        return out
    comp = a64[:m]
    np.copyto(comp, v, casting="unsafe")
    comp <<= np.int64(32)
    comp += ARENA.iota(m)
    comp.sort()
    # int32 intermediates from here on: m, ticks, window counts all < 2^31,
    # halving memory traffic (this host is DRAM-bandwidth bound)
    pos = ARENA.get("pos", m, np.int32)
    np.copyto(pos, comp.view(np.int32)[::2])  # little-endian low words
    comp >>= np.int64(32)  # comp is now the sorted values
    prev = ARENA.get("prev", m, np.int32)
    prev.fill(-1)
    same = bmask[: m - 1]
    np.equal(comp[1:], comp[:-1], out=same)
    prev[pos[1:][same]] = pos[:-1][same]

    # sess_of via boundary-scatter + cumsum (np.repeat allocates)
    sess_of = ARENA.get("sess_of", m, np.int32)
    sess_of.fill(0)
    inner = rel_bounds[1:-1]
    np.add.at(sess_of, inner[inner < m], 1)
    np.cumsum(sess_of, out=sess_of)

    # tick(i) = i - rel_bounds[sess] + base_tick[sess] = i - C[sess]
    C32 = (rel_bounds[:-1] - sess_base_tick).astype(np.int32)
    rel32 = rel_bounds[:-1].astype(np.int32)
    g = ARENA.get("g", m, np.int32)  # per-element gathered session scalars
    np.take(C32, sess_of, out=g)
    tick = ARENA.get("tick", m, np.int32)
    np.subtract(ARENA.iota32(m), g, out=tick)
    # prev_tick: -1 when prev is outside this element's session buffer
    np.take(rel32, sess_of, out=g)
    np.less(prev, g, out=bmask[:m])  # prev outside this session's buffer
    np.take(C32, sess_of, out=g)
    prev -= g  # prev_tick where valid
    np.copyto(prev, np.int32(-1), where=bmask[:m])

    # windows (session-level k) containing tick t: k in [ceil((t-width+1)/H), t//H]
    klo = ARENA.get("klo", m, np.int32)
    np.subtract(tick, np.int32(width - 1), out=klo)
    np.negative(klo, out=klo)
    np.floor_divide(klo, np.int32(hop), out=klo)
    np.negative(klo, out=klo)  # ceil division
    np.floor_divide(prev, np.int32(hop), out=prev)
    prev += np.int32(1)
    np.maximum(klo, prev, out=klo)
    fk32 = first_k.astype(np.int32)
    np.take(fk32, sess_of, out=g)
    np.maximum(klo, g, out=klo)
    khi = tick
    np.floor_divide(khi, np.int32(hop), out=khi)
    last_k = (first_k + np.diff(np.append(win_offset, n_win)) - 1).astype(np.int32)
    np.take(last_k, sess_of, out=g)
    np.minimum(khi, g, out=khi)
    np.less_equal(klo, khi, out=bmask[:m])
    np.take((win_offset - first_k).astype(np.int32), sess_of, out=g)
    klo += g
    khi += g
    ok = bmask[:m]
    d = np.bincount(klo[ok], minlength=n_win + 1)[: n_win + 1].astype(np.int64)
    d -= np.bincount(khi[ok] + 1, minlength=n_win + 1)[: n_win + 1]
    out["n_distinct"] = np.cumsum(d[:n_win])
    return out


def window_aggregates(
    seg_values: np.ndarray,
    seg_offsets: np.ndarray,
    gt_threshold: int = 25_000,
    match_token: int = 13,
    functionals: bool = False,
) -> dict[str, np.ndarray]:
    """Per-window aggregate family (token analog of reference metrics).

    - n_tokens        : G2 word-count analog (``src/search/index.py:33-36``)
    - n_distinct      : G3 distinct-speakers analog (``index.py:93-95``)
    - freq_gt         : G4 thresholded frequency (``src/search/metrics.py:8-21``)
    - match_count     : G5 argmax-class count analog (``metrics.py:24-30``)
    - sum/mean/std/max/min : G6/G7 building blocks (``metrics.py:33-57``)

    ``std`` is the population std (ddof=0, numpy default) — matches the
    reference's ``np.std`` usage in ``metrics.py:36``.
    """
    starts = seg_offsets[:-1]
    lens = np.diff(seg_offsets)
    n = len(starts)
    out: dict[str, np.ndarray] = {}
    out["n_tokens"] = lens.astype(np.int64)
    if n == 0 or len(seg_values) == 0:
        # column ORDER must match the main branch exactly — zero-window
        # chunks concat with populated ones.
        z64 = np.zeros(n, dtype=np.int64)
        zf = np.zeros(n, dtype=np.float64)
        for name in ("freq_gt", "match_count", "tok_sum"):
            out[name] = z64.copy()
        out["tok_mean"] = zf
        out["tok_std"] = zf.copy()
        out["tok_max"] = z64.copy()
        out["tok_min"] = z64.copy()
        if functionals:
            out["tok_p20"] = z64.copy()
            out["tok_p50"] = z64.copy()
            out["tok_p80"] = z64.copy()
            out["tok_slope"] = zf.copy()
        out["n_distinct"] = z64.copy()
        return out

    v = seg_values.astype(np.int64, copy=False)
    # windows are non-empty by construction (every window owns its start
    # tick), so reduceat segments are all valid.
    assert lens.min() > 0, "empty window emitted — kernel invariant broken"
    win_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    out["freq_gt"] = np.add.reduceat((v > gt_threshold).astype(np.int64), starts)
    out["match_count"] = np.add.reduceat((v == match_token).astype(np.int64), starts)
    s = np.add.reduceat(v, starts)
    out["tok_sum"] = s
    mean = s / lens
    out["tok_mean"] = mean
    sq = np.add.reduceat(v * v, starts)
    var = sq / lens - mean * mean
    out["tok_std"] = np.sqrt(np.maximum(var, 0.0))
    out["tok_max"] = np.maximum.reduceat(v, starts)
    out["tok_min"] = np.minimum.reduceat(v, starts)

    # ONE lexsort by (window, value) feeds both the percentile gather
    # (functionals) and the distinct count — it is the dominant
    # O(N log N) cost of this kernel, so it must not run twice
    order = np.lexsort((v, win_of))
    sv, sw = v[order], win_of[order]

    if functionals:
        # same integer-exact definitions as window_features_stream
        n_ = out["n_tokens"]
        _check_functional_bounds(
            n_.max(),
            max(int(out["tok_max"].max()), -int(out["tok_min"].min())),
        )
        i_loc = np.arange(len(v), dtype=np.int64) - np.repeat(starts, lens)
        s1 = np.add.reduceat(i_loc * v, starts)
        si = n_ * (n_ - 1) // 2
        sii = (n_ - 1) * n_ * (2 * n_ - 1) // 6
        num = n_ * s1 - si * s
        den = n_ * sii - si * si
        for name, qn, qd in (("tok_p20", 1, 5), ("tok_p50", 1, 2), ("tok_p80", 4, 5)):
            out[name] = sv[starts + ((n_ - 1) * qn) // qd]
        out["tok_slope"] = np.where(den > 0, num / np.where(den > 0, den, 1), 0.0)

    # distinct count: value-change points within each window run
    change = np.empty(len(sv), dtype=bool)
    change[0] = True
    np.not_equal(sv[1:], sv[:-1], out=change[1:])
    change[1:] |= sw[1:] != sw[:-1]
    out["n_distinct"] = np.bincount(sw[change], minlength=n).astype(np.int64)
    return out


def lag_lead_windows(
    values: np.ndarray,
    row_value_start: np.ndarray,
    row_value_len: np.ndarray,
    row_base_tick: np.ndarray,
    row_idx: np.ndarray,
    ts_start: np.ndarray,
    slice_len: np.ndarray,
    lag: int,
    lead: int,
    lag_avail: np.ndarray | None = None,
    lead_avail: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bounded lag/lead context slices for each window.

    ``lag_tokens``  = up to ``lag`` ticks immediately before ``ts_start``
    (truncated at stream start — the null-pad analog is a shorter list).
    ``lead_tokens`` = up to ``lead`` ticks immediately after the window's
    exclusive end (truncated at stream end). ``lead`` must be bounded by
    the declared lookahead — the generalization of the YAMNet chunk
    lookahead (reference ``src/features/YAMNetExtractor.py:78-95``); zero
    temporal leakage beyond ``ts_end + lead`` is tested as a property.

    For chunked processing, ``lag_avail[i]`` is the number of buffered
    ticks BEFORE row i's first owned tick (lookbehind history carried
    across the cut) and ``lead_avail[i]`` the buffered ticks from the
    owned start (owned + lookahead); both default to the simple
    whole-session case.

    Returns (lag_values, lag_offsets, lead_values, lead_offsets).
    """
    base = row_base_tick[row_idx]
    vstart = row_value_start[row_idx]
    la_ = (
        np.zeros(len(row_value_start), dtype=np.int64)
        if lag_avail is None
        else np.asarray(lag_avail, dtype=np.int64)
    )[row_idx]
    ld_ = (
        np.asarray(row_value_len, dtype=np.int64)
        if lead_avail is None
        else np.asarray(lead_avail, dtype=np.int64)
    )[row_idx]
    rel_start = ts_start - base
    lag_lo = np.maximum(rel_start - lag, -la_)
    lag_len = rel_start - lag_lo
    lidx, lag_off = concat_ranges(vstart + lag_lo, lag_len)
    rel_end = rel_start + slice_len
    lead_hi = np.minimum(rel_end + lead, ld_)
    lead_len = np.maximum(lead_hi - rel_end, 0)
    ridx, lead_off = concat_ranges(vstart + rel_end, lead_len)
    return values[lidx], lag_off, values[ridx], lead_off
