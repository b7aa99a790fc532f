"""Resume idempotence (FIXTURES.md plan 5): kill/restart ⇒ identical output."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pyarrow.parquet as pq
import ray.data as rd

from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.stages import segment as seg
from podcast_audio_feature_extraction_ray.state import manifest as mf


def _run(tokens, out_dir, num_partitions=8):
    ds = rd.from_arrow(tokens)
    win = seg.segment_rows(ds, WindowSpec(16, 8, "frame"), key_cols=("doc_id", "source", "seq_no"))
    return mf.write_resumable(
        win, out_dir, key_cols=("doc_id", "source"), num_partitions=num_partitions,
        sort_within=("doc_id", "source", "seq_no", "ts_start"),
    )


def _hash_dir(out_dir) -> dict:
    out = {}
    for f in sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))):
        out[os.path.relpath(f, out_dir)] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_resume_skips_done_and_is_byte_identical(tiny_tokens, tmp_path):
    full = str(tmp_path / "full")
    n1 = _run(tiny_tokens, full)
    assert n1 > 0
    h_full = _hash_dir(full)
    assert len(h_full) == n1
    assert mf.completed_partitions(full) == set(range(n1)) or len(mf.completed_partitions(full)) == n1

    # simulate a crash: drop half the partitions + their manifests
    crashed = str(tmp_path / "crashed")
    shutil.copytree(full, crashed)
    victims = sorted(mf.completed_partitions(crashed))[::2]
    for pid in victims:
        shutil.rmtree(os.path.join(crashed, f"part={pid:05d}"))
        os.remove(os.path.join(mf.manifest_dir(crashed), f"part-{pid:05d}.json"))

    n2 = _run(tiny_tokens, crashed)
    assert n2 == len(victims)  # only the pending complement was rewritten
    assert _hash_dir(crashed) == h_full  # byte-identical after resume

    # third run: everything done -> nothing written
    n3 = _run(tiny_tokens, crashed)
    assert n3 == 0


def test_read_back_roundtrip(tiny_tokens, tmp_path):
    out = str(tmp_path / "o")
    _run(tiny_tokens, out)
    ds = mf.read_output(out)
    direct = seg.segment_rows(
        rd.from_arrow(tiny_tokens), WindowSpec(16, 8, "frame"),
        key_cols=("doc_id", "source", "seq_no"),
    )
    assert ds.count() == direct.count()


def test_resume_layout_mismatch_refused(tiny_tokens, tmp_path):
    """Re-invoking write_resumable with a different num_partitions or
    key_cols must raise, not silently drop colliding partitions."""
    import pytest

    out = str(tmp_path / "layout")
    _run(tiny_tokens, out, num_partitions=8)
    with pytest.raises(ValueError, match="layout mismatch"):
        _run(tiny_tokens, out, num_partitions=16)
    ds = rd.from_arrow(tiny_tokens)
    win = seg.segment_rows(
        ds, WindowSpec(16, 8, "frame"), key_cols=("doc_id", "source", "seq_no")
    )
    with pytest.raises(ValueError, match="layout mismatch"):
        mf.write_resumable(win, out, key_cols=("doc_id",), num_partitions=8)
