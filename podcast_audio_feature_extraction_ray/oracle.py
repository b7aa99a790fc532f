"""Loop-based NumPy/pandas conformance oracle.

Deliberately written row-at-a-time / window-at-a-time — the OPPOSITE of
the engine's vectorized kernels — so a shared bug is unlikely. Mirrors
the reference's window arithmetic literally:

- frame mode:   openSMILE fixed frames, left-aligned, partial last frame
  (reference ``data/custom_FrameModeFunctionals.conf.inc:8-11``).
- segment mode: ``for seg_start in range(0, math.ceil(last_tick), step)``
  with inclusive-both-ends membership by start tick (reference
  ``src/search/index.py:76-89``); a 1-tick session emits no windows.

The oracle consumes plain Python/pandas structures and returns a pandas
DataFrame sorted by (doc_id, source, ts_start) for direct comparison.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from podcast_audio_feature_extraction_ray.config import WindowSpec


def oracle_session_streams(df: pd.DataFrame, session_key, order_key) -> dict:
    """Assemble ordered token streams per session, the slow way."""
    streams: dict = {}
    for key, g in df.groupby(list(session_key), sort=True):
        g = g.sort_values(list(order_key), kind="mergesort")
        toks: list[int] = []
        for t in g["tokens"]:
            toks.extend(int(x) for x in t)
        streams[key if isinstance(key, tuple) else (key,)] = toks
    return streams


def oracle_windows_for_stream(tokens: list, spec: WindowSpec):
    """Yield (win_id, ts_start, seg_tokens) for one session stream."""
    L = len(tokens)
    W, H = spec.window, spec.hop
    if L == 0:
        return
    if spec.mode == "frame":
        k = 0
        while k * H < L:
            s = k * H
            yield k, s, tokens[s : s + W]
            k += 1
    else:
        last_tick = L - 1
        for s in range(0, math.ceil(last_tick), H):
            # membership: s <= ts <= s + W (inclusive both ends)
            kept = [tokens[t] for t in range(L) if s <= t <= s + W]
            yield s // H, s, kept


def oracle_segment(
    df: pd.DataFrame,
    spec: WindowSpec,
    session_key=("doc_id", "source"),
    order_key=("seq_no",),
    gt_threshold: int = 25_000,
    match_token: int = 13,
    lag: int = 0,
    lead: int = 0,
    functionals: bool = False,
) -> pd.DataFrame:
    """Golden windowed output with aggregates (and optional lag/lead)."""
    rows = []
    streams = oracle_session_streams(df, session_key, order_key)
    for key, toks in streams.items():
        for k, s, seg in oracle_windows_for_stream(toks, spec):
            arr = np.array(seg, dtype=np.int64)
            rec = dict(zip(session_key, key))
            rec.update(
                win_id=k,
                ts_start=s,
                ts_end=s + len(seg),
                seg_tokens=[int(x) for x in seg],
                n_tokens=len(seg),
                n_distinct=len(set(seg)),
                freq_gt=int((arr > gt_threshold).sum()),
                match_count=int((arr == match_token).sum()),
                tok_sum=int(arr.sum()),
                tok_mean=float(arr.mean()),
                tok_std=float(arr.std()),  # population std, ddof=0
                tok_max=int(arr.max()),
                tok_min=int(arr.min()),
            )
            if functionals:
                n = len(seg)
                srt = sorted(int(x) for x in seg)
                rec["tok_p20"] = srt[(n - 1) // 5]
                rec["tok_p50"] = srt[(n - 1) // 2]
                rec["tok_p80"] = srt[(4 * (n - 1)) // 5]
                s0 = sum(srt)
                s1 = sum(i * int(x) for i, x in enumerate(seg))
                si = n * (n - 1) // 2
                sii = (n - 1) * n * (2 * n - 1) // 6
                den = n * sii - si * si
                rec["tok_slope"] = (n * s1 - si * s0) / den if den else 0.0
            if lag or lead:
                e = s + len(seg)
                rec["lag_tokens"] = [int(x) for x in toks[max(0, s - lag) : s]]
                rec["lead_tokens"] = [int(x) for x in toks[e : e + lead]]
            rows.append(rec)
    out = pd.DataFrame(rows)
    if len(out):
        out = out.sort_values([*session_key, "ts_start"]).reset_index(drop=True)
    return out


def oracle_backfill(
    windows: pd.DataFrame, events: pd.DataFrame, key=("doc_id", "source")
) -> pd.DataFrame:
    """Last event value at-or-before each window's cutoff (``ts_end - 1``,
    the last tick the window may read). Null before the first event —
    the point-in-time rule distilled from the reference's start-time-only
    membership (``src/search/index.py:84-89``) and score attach
    (``src/search/search.py:112-116``). Loop-based on purpose.
    """
    ev = {k: g.sort_values("ts") for k, g in events.groupby(list(key), sort=False)}
    vals = []
    ts_vals = []
    for _, w in windows.iterrows():
        k = tuple(w[c] for c in key)
        k = k if len(k) > 1 else k[0]
        cutoff = w["ts_end"] - 1
        g = ev.get(k)
        best_v, best_t = None, None
        if g is not None:
            for _, e in g.iterrows():
                if e["ts"] <= cutoff:
                    best_v, best_t = e["value"], e["ts"]
                else:
                    break
        vals.append(best_v)
        ts_vals.append(best_t)
    out = windows.copy()
    out["bf_value"] = vals
    out["bf_ts"] = ts_vals
    return out
