"""Backfill/as-of conformance + leakage property (FIXTURES.md plan 3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from podcast_audio_feature_extraction_ray import fixtures, oracle
from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.stages import asof, segment as seg


@pytest.fixture(scope="module")
def windows_and_events(tiny_tokens, tiny_df):
    spec = WindowSpec(16, 8, "frame")
    win_ds = seg.segment_sessions(rd.from_arrow(tiny_tokens), spec)
    events = fixtures.event_table(tiny_tokens, rate=1 / 20.0)
    want_windows = oracle.oracle_segment(tiny_df, spec)[
        ["doc_id", "source", "win_id", "ts_start", "ts_end", "seg_tokens"]
    ]
    want = oracle.oracle_backfill(want_windows, events.to_pandas())
    return win_ds, events, want


def _check(got: pd.DataFrame, want: pd.DataFrame, sort=("doc_id", "source", "ts_start")):
    # callers with duplicate (key, ts_start) rows must sort on a unique
    # id column instead (two same-start windows with different cutoffs
    # legitimately get different bf values)
    got = got.sort_values(list(sort)).reset_index(drop=True)
    want = want.sort_values(list(sort)).reset_index(drop=True)
    assert len(got) == len(want)
    g_null = got["bf_value"].isna().to_numpy()
    w_null = want["bf_value"].isna().to_numpy()
    np.testing.assert_array_equal(g_null, w_null)
    np.testing.assert_allclose(
        got["bf_value"].to_numpy(dtype=float)[~g_null],
        want["bf_value"].to_numpy(dtype=float)[~w_null],
    )
    np.testing.assert_array_equal(
        got["bf_ts"].to_numpy(dtype=float)[~g_null],
        want["bf_ts"].to_numpy(dtype=float)[~w_null],
    )
    # zero temporal leakage: joined ts <= cutoff
    ok = ~g_null
    assert (
        got["bf_ts"].to_numpy(dtype=float)[ok] <= (got["ts_end"].to_numpy() - 1)[ok]
    ).all()


def test_backfill_broadcast(windows_and_events):
    win_ds, events, want = windows_and_events
    got = asof.backfill_broadcast(win_ds, events, concurrency=2).to_pandas()
    _check(got, want)


def test_backfill_join(windows_and_events):
    win_ds, events, want = windows_and_events
    got = asof.backfill_join(win_ds, rd.from_arrow(events)).to_pandas()
    _check(got, want)


def test_sessionize_events_matches_pandas():
    from podcast_audio_feature_extraction_ray.stages.sessionize import sessionize_events

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, 500),
            "ts": rng.integers(0, 10_000, 500).astype(np.int64),
            "v": rng.normal(size=500),
        }
    )
    got = (
        sessionize_events(rd.from_pandas(df), ("user_id",), "ts", gap=200)
        .to_pandas()
        .sort_values(["user_id", "ts", "v"])
        .reset_index(drop=True)
    )
    want = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts", kind="mergesort").copy()
        sess, prev, sid = [], None, 0
        for t in g["ts"]:
            if prev is not None and t - prev > 200:
                sid += 1
            sess.append(sid)
            prev = t
        g["session_no"] = sess
        want.append(g)
    want = (
        pd.concat(want).sort_values(["user_id", "ts", "v"]).reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        got["session_no"].to_numpy(), want["session_no"].to_numpy()
    )


def test_backfill_join_hot_key_split(windows_and_events):
    """Hot-key tick-chunk splitting: with a threshold that trips on the
    skewed keys, the join must produce identical results while splitting
    each hot key into multiple (key, chunk) group tasks."""
    win_ds, events, want = windows_and_events
    got = asof.backfill_join(
        win_ds, rd.from_arrow(events), hot_threshold=20, chunk_rows=16
    ).to_pandas()
    _check(got, want)


def test_backfill_join_one_monster_key():
    """One key holds ~50% of all windows: with hot splitting it must be
    processed as MULTIPLE chunks (observable via the discovered index and
    the chunk math) and match the broadcast-oracle output exactly."""
    import pyarrow as pa

    n_hot, n_cold_keys = 4000, 40
    rng = np.random.default_rng(5)
    win_tbls = [
        pa.table(
            {
                "doc_id": ["hot"] * n_hot,
                "source": ["s"] * n_hot,
                "win_id": np.arange(n_hot, dtype=np.int64),
                "ts_start": np.arange(n_hot, dtype=np.int64) * 8,
                "ts_end": np.arange(n_hot, dtype=np.int64) * 8 + 16,
            }
        )
    ]
    for k in range(n_cold_keys):
        m = 100
        win_tbls.append(
            pa.table(
                {
                    "doc_id": [f"c{k}"] * m,
                    "source": ["s"] * m,
                    "win_id": np.arange(m, dtype=np.int64),
                    "ts_start": np.arange(m, dtype=np.int64) * 8,
                    "ts_end": np.arange(m, dtype=np.int64) * 8 + 16,
                }
            )
        )
    windows = pa.concat_tables(win_tbls)
    ev_keys = ["hot"] * 25 + [f"c{k}" for k in range(n_cold_keys) for _ in (0,)]
    ev_ts = list(rng.integers(0, n_hot * 8, size=25)) + list(
        rng.integers(0, 800, size=n_cold_keys)
    )
    events = pa.table(
        {
            "doc_id": ev_keys,
            "source": ["s"] * len(ev_keys),
            "ts": np.array(ev_ts, dtype=np.int64),
            "value": rng.normal(size=len(ev_keys)),
        }
    )
    # discovery must find exactly the hot key, split into >= 4 chunks
    hot = asof._discover_hot_asof(
        rd.from_arrow(windows), ("doc_id", "source"), None, hot_threshold=1000
    )
    assert set(hot) == {("hot", "s")}
    assert -(-hot[("hot", "s")][0] // 1024) >= 3
    got = asof.backfill_join(
        rd.from_arrow(windows), rd.from_arrow(events),
        hot_threshold=1000, chunk_rows=1024,
    ).to_pandas()
    want = asof.backfill_broadcast(
        rd.from_arrow(windows), events.to_pandas(), concurrency=2
    ).to_pandas()
    _check(got, want.rename(columns={}))


def test_backfill_broadcast_task_mode(windows_and_events):
    """mode='tasks' (per-worker compiled-index cache) must equal the
    actor-pool mode exactly."""
    win_ds, events, want = windows_and_events
    got = asof.backfill_broadcast(
        win_ds, events, mode="tasks", batch_size=4096
    ).to_pandas()
    _check(got, want)


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_keys=st.integers(1, 8),
    n_win=st.integers(1, 120),
    n_ev=st.integers(0, 60),
    hot=st.sampled_from([None, 5]),
    impl=st.sampled_from(["join", "broadcast", "blockref"]),
)
def test_backfill_join_property(ray_session, seed, n_keys, n_win, n_ev, hot, impl):
    """Random keys/times through the merge-path join (hot-split on and
    off) AND the broadcast path must equal the loop oracle exactly —
    including the zero-leakage invariant, duplicate event timestamps and
    windows before any event."""
    rng = np.random.default_rng(seed)
    keys = [(f"d{i % n_keys}", ("a", "b")[i % 2]) for i in range(n_keys)]
    wk = rng.integers(0, n_keys, n_win)
    ts_start = rng.integers(0, 200, n_win).astype(np.int64)
    win = pd.DataFrame(
        {
            "doc_id": [keys[i][0] for i in wk],
            "source": [keys[i][1] for i in wk],
            "win_id": np.arange(n_win, dtype=np.int64),
            "ts_start": ts_start,
            "ts_end": ts_start + rng.integers(1, 40, n_win).astype(np.int64),
        }
    )
    ek = rng.integers(0, n_keys, n_ev)
    events = pd.DataFrame(
        {
            "doc_id": [keys[i][0] for i in ek],
            "source": [keys[i][1] for i in ek],
            # duplicate ts on purpose: ties must resolve deterministically
            "ts": rng.integers(0, 220, n_ev).astype(np.int64) // 2 * 2,
            "value": rng.integers(-50, 50, n_ev).astype(np.float64),
        }
    )
    if n_ev:
        # oracle keys last-at-or-before by sorted ts; make ties unambiguous
        events = events.drop_duplicates(["doc_id", "source", "ts"])
    if impl == "broadcast":
        got = asof.backfill_broadcast(
            rd.from_pandas(win), events, mode="tasks", batch_size=32
        ).to_pandas()
    else:
        got = asof.backfill_join(
            rd.from_pandas(win), rd.from_pandas(events),
            hot_threshold=hot, chunk_rows=16,
            payload="blockref" if impl == "blockref" else "inline",
        ).to_pandas()
    want = oracle.oracle_backfill(win, events)
    _check(got, want, sort=("win_id",))


def test_backfill_join_blockref_list_payload(windows_and_events):
    """Blockref mode must equal inline mode bit-for-bit on windows that
    carry a list payload column (seg_tokens) — the exact case the
    pointer exchange exists for."""
    win_ds, events, _ = windows_and_events
    inline = asof.backfill_join(win_ds, rd.from_arrow(events)).to_pandas()
    blk = asof.backfill_join(
        win_ds, rd.from_arrow(events), payload="blockref"
    ).to_pandas()
    assert sorted(inline.columns) == sorted(blk.columns)
    key = ["doc_id", "source", "win_id"]
    inline = inline.sort_values(key).reset_index(drop=True)
    blk = blk.sort_values(key).reset_index(drop=True)
    for c in inline.columns:
        a, b = inline[c], blk[c]
        if c == "seg_tokens":
            assert all(np.array_equal(x, y) for x, y in zip(a, b))
        else:
            pd.testing.assert_series_equal(a, b, check_names=False)


def test_backfill_join_blockref_registry_path(windows_and_events, monkeypatch):
    """Past TOKWIN_ASOF_REGISTRY_MIN blocks the attach tasks fetch their
    block ref from a _BufRegistry actor instead of a captured list;
    force the threshold to 0 so the registry path runs at test scale and
    assert it is bit-identical to the direct-capture path."""
    win_ds, events, _ = windows_and_events
    direct = asof.backfill_join(
        win_ds, rd.from_arrow(events), payload="blockref"
    ).to_pandas()
    monkeypatch.setenv("TOKWIN_ASOF_REGISTRY_MIN", "0")
    reg = asof.backfill_join(
        win_ds, rd.from_arrow(events), payload="blockref"
    ).to_pandas()
    assert sorted(direct.columns) == sorted(reg.columns)
    key = ["doc_id", "source", "win_id"]
    direct = direct.sort_values(key).reset_index(drop=True)
    reg = reg.sort_values(key).reset_index(drop=True)
    for c in direct.columns:
        a, b = direct[c], reg[c]
        if c == "seg_tokens":
            assert all(np.array_equal(x, y) for x, y in zip(a, b))
        else:
            pd.testing.assert_series_equal(a, b, check_names=False)


def test_event_index_key_code_order_and_null_keys(ray_session):
    """Two confirmed round-5 review repros:

    1. with >= 2 key columns, a later key group whose secondary column
       value sorts BEFORE an already-seen value used to leave the
       composite event array unsorted (factorize codes by first
       appearance) — every searchsorted returned garbage;
    2. a null-key event coded -1 used to alias onto a REAL key
       ((a)*r - 1 == (a-1)*r + (r-1)) and leak its value cross-key.
    """
    from podcast_audio_feature_extraction_ray.stages.asof import _EventIndex

    ev = pd.DataFrame(
        {
            "doc_id": [1, 1, 2, 2],
            "source": ["b", "b", "a", "b"],
            "ts": [10, 20, 10, 20],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    idx = _EventIndex(ev, ("doc_id", "source"), "ts", "value")
    assert (np.diff(idx.ev_comp) >= 0).all()  # the broken invariant
    import pyarrow as pa

    win = pa.table({"doc_id": [2, 2, 1], "source": ["b", "a", "b"], "cut": [100, 100, 15]})
    out = idx.attach(win, lambda b: b["cut"].to_numpy())
    assert out["bf_value"].to_pylist() == [4.0, 3.0, 1.0]
    assert out["bf_ts"].to_pylist() == [20, 10, 10]

    ev2 = pd.DataFrame(
        {
            "doc_id": [1, 1, 2],
            "source": ["a", "b", None],
            "ts": [10, 10, 50],
            "value": [1.0, 2.0, 99.0],
        }
    )
    idx2 = _EventIndex(ev2, ("doc_id", "source"), "ts", "value")
    win2 = pa.table({"doc_id": [1, 2], "source": ["b", None], "cut": [99, 99]})
    out2 = idx2.attach(win2, lambda b: b["cut"].to_numpy())
    assert out2["bf_value"].to_pylist() == [2.0, None]  # no 99.0 leak


def test_backfill_broadcast_interleaved_key_order(windows_and_events, ray_session):
    """End-to-end broadcast backfill on an event table crafted so every
    doc's source set appears in a DIFFERENT first-appearance order than
    sorted order — matches the loop oracle exactly."""
    win_ds, _, _ = windows_and_events
    rng = np.random.default_rng(11)
    win_df = win_ds.to_pandas()
    keys = win_df[["doc_id", "source"]].drop_duplicates().reset_index(drop=True)
    # reverse the key order so later groups' sources appear "early"
    keys = keys.iloc[::-1].reset_index(drop=True)
    ev = pd.DataFrame(
        {
            "doc_id": np.repeat(keys.doc_id.to_numpy(), 3),
            "source": np.repeat(keys.source.to_numpy(), 3),
            "ts": np.tile(np.array([0, 7, 23]), len(keys)),
            "value": rng.normal(size=3 * len(keys)).round(3),
        }
    )
    got = asof.backfill_broadcast(win_ds, ev, concurrency=2).to_pandas()
    want = oracle.oracle_backfill(
        win_df[["doc_id", "source", "win_id", "ts_start", "ts_end", "seg_tokens"]], ev
    )
    _check(got, want)


def test_stale_hot_index_clamps_instead_of_nulling(ray_session):
    """A caller-supplied hot_index understating max cutoff must still
    attach matching events (clamped into the last chunk), not silently
    null the out-of-range windows."""
    win = pd.DataFrame(
        {
            "doc_id": ["d"] * 4,
            "source": ["s"] * 4,
            "win_id": np.arange(4),
            "ts_start": [0, 5_000, 12_000, 19_999],
            "ts_end": [100, 5_100, 12_100, 20_000],
        }
    )
    ev = pd.DataFrame(
        {
            "doc_id": ["d"] * 2,
            "source": ["s"] * 2,
            "ts": [50, 15_000],
            "value": [1.0, 2.0],
        }
    )
    stale = {("d", "s"): (1_000_000, 10_000)}  # real cutoffs reach 19_999
    got = (
        asof.backfill_join(
            rd.from_pandas(win),
            rd.from_pandas(ev),
            hot_index=stale,
            chunk_rows=100_000,
        )
        .to_pandas()
        .sort_values("win_id")
        .reset_index(drop=True)
    )
    assert got["bf_value"].to_list() == [1.0, 1.0, 1.0, 2.0]
