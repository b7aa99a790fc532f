"""Failure-recovery evidence for the blockref payload exchanges
(round-5 VERDICT ask #3): SIGKILL a Ray worker process mid-
``segment_sessions(payload="blockref")`` and mid-
``backfill_join(payload="blockref")`` and assert each run completes
with output identical to an undisturbed run.

Scope honesty: on a single node the payload blocks live in plasma
(managed by the raylet, not the worker that produced them), so a dead
WORKER exercises Ray's task-retry path — the tag/reduce task that died
re-executes and re-reads the still-registered block refs. Whole-NODE
loss (where lineage reconstruction of the materialized read blocks
would kick in) cannot be simulated in this single-node sandbox; the
docstring claim about lineage covers that case and is scoped
accordingly in segment.py."""

from __future__ import annotations

import os
import signal
import threading
import time

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from podcast_audio_feature_extraction_ray import fixtures
from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.stages import segment

SPEC = WindowSpec(16, 8, "frame")
SCALAR_COLS = ["doc_id", "source", "win_id", "ts_start", "ts_end", "n_tokens", "tok_sum"]


def _fixture_path(tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("blockref_fix") / "tokens")
    tab = fixtures.token_table(150_000, 500, seed=11)
    fixtures.write_fixture(tab, path)
    return path


def _run_hash(path: str) -> tuple[int, np.uint64]:
    ds = rd.read_parquet(path, override_num_blocks=8)
    out = segment.segment_sessions(
        ds, SPEC, payload="blockref", with_aggregates=True, emit_tokens=False
    )
    df = out.to_pandas()
    df = df[SCALAR_COLS].sort_values(SCALAR_COLS, kind="mergesort").reset_index(drop=True)
    h = np.uint64(0)
    for hv in pd.util.hash_pandas_object(df, index=False).to_numpy():
        h ^= np.uint64(hv)
    return len(df), h


def _kill_one_busy_worker() -> str | None:
    """SIGKILL one ray:: task worker (never the _BufRegistry actor or
    idle workers); returns its cmdline or None if none was busy."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            cmd = open(f"/proc/{pid}/cmdline", "rb").read().decode().replace("\0", " ")
        except OSError:
            continue
        if (
            "ray::" in cmd
            and "_BufRegistry" not in cmd
            and "IDLE" not in cmd
            and "raylet" not in cmd
        ):
            try:
                os.kill(int(pid), signal.SIGKILL)
            except OSError:
                continue
            return cmd
    return None


def _kill_while_running(run_fn) -> tuple[dict, list[str]]:
    """Run ``run_fn`` (fills + returns a result dict) on a thread while
    SIGKILLing up to three busy ray:: workers; returns (result, killed)."""
    result: dict = {}
    killed: list[str] = []

    def run():
        result.update(run_fn())

    t = threading.Thread(target=run)
    t.start()
    deadline = time.time() + 60
    while t.is_alive() and len(killed) < 3 and time.time() < deadline:
        victim = _kill_one_busy_worker()
        if victim is not None:
            killed.append(victim)
            time.sleep(0.5)
        else:
            time.sleep(0.05)
    t.join(timeout=300)
    assert not t.is_alive(), "run did not finish after worker kills"
    return result, killed


@pytest.mark.timeout(600)
def test_blockref_survives_worker_kill(ray_session, tmp_path_factory):
    path = _fixture_path(tmp_path_factory)
    want_rows, want_hash = _run_hash(path)
    assert want_rows > 100_000

    result, killed = _kill_while_running(
        lambda: dict(zip(("rows", "hash"), _run_hash(path)))
    )
    assert "rows" in result, "run crashed instead of retrying"
    assert result["rows"] == want_rows
    assert result["hash"] == want_hash
    # the test is vacuous if the run finished before any kill landed —
    # the fixture is sized so at least one busy worker exists
    assert killed, "no busy worker was observed to kill (fixture too small?)"


# windows keep their wide seg_tokens payload (the case blockref exists
# for); the hash pins the join decision per window via bf_ts plus a
# cheap reduction of the payload column to prove the attach preserved it
ASOF_KEY_COLS = ["doc_id", "source", "win_id", "ts_start", "ts_end"]
ASOF_COLS = ASOF_KEY_COLS + ["ts_cutoff", "bf_ts", "payload_sum"]


def _run_asof_hash(tok_path: str, ev_path: str) -> tuple[int, np.uint64]:
    from podcast_audio_feature_extraction_ray.stages import asof

    win = segment.segment_sessions(
        rd.read_parquet(tok_path, override_num_blocks=8), SPEC
    )
    out = asof.backfill_join(
        win, rd.read_parquet(ev_path), payload="blockref"
    )
    df = out.to_pandas()
    df["payload_sum"] = df["seg_tokens"].map(lambda a: int(np.asarray(a).sum()))
    df = (
        df[ASOF_COLS]
        .sort_values(ASOF_KEY_COLS, kind="mergesort")
        .reset_index(drop=True)
    )
    h = np.uint64(0)
    for hv in pd.util.hash_pandas_object(df, index=False).to_numpy():
        h ^= np.uint64(hv)
    return len(df), h


@pytest.mark.timeout(600)
def test_asof_blockref_survives_worker_kill(ray_session, tmp_path_factory):
    """Same protocol over the as-of blockref exchange (asof.py:
    _backfill_join_blockref): the pointer-table merge plus the attach
    tasks that re-read the pinned window blocks must retry through a
    dead worker and reproduce the undisturbed output bit-for-bit."""
    base = tmp_path_factory.mktemp("asof_blockref_fix")
    tok_path = str(base / "tokens")
    ev_path = str(base / "events")
    tab = fixtures.token_table(150_000, 500, seed=13)
    fixtures.write_fixture(tab, tok_path)
    fixtures.write_fixture(fixtures.event_table(tab, rate=1 / 50.0), ev_path)

    want_rows, want_hash = _run_asof_hash(tok_path, ev_path)
    assert want_rows > 100_000

    result, killed = _kill_while_running(
        lambda: dict(zip(("rows", "hash"), _run_asof_hash(tok_path, ev_path)))
    )
    assert "rows" in result, "run crashed instead of retrying"
    assert result["rows"] == want_rows
    assert result["hash"] == want_hash
    assert killed, "no busy worker was observed to kill (fixture too small?)"
