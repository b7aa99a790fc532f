"""Dead-letter containment (S12 analog)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from podcast_audio_feature_extraction_ray.stages.errors import (
    read_dead_letters,
    safe_map_batches,
)


def test_poison_rows_dead_lettered(tmp_path):
    tbl = pa.table({"x": pa.array(list(range(100)), type=pa.int64())})
    dead_dir = str(tmp_path / "dead")

    def fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        if np.any(x % 37 == 5):  # rows 5, 42, 79 are poison
            raise ValueError("poison")
        return pa.table({"x": batch["x"], "y": pc.multiply(batch["x"], 2)})

    out = safe_map_batches(rd.from_arrow(tbl), fn, dead_dir, batch_size=16)
    got = out.to_pandas().sort_values("x").reset_index(drop=True)
    assert list(got.x) == [i for i in range(100) if i % 37 != 5]
    assert (got.y == got.x * 2).all()

    dead = read_dead_letters(dead_dir).to_pandas()
    assert sorted(dead.x) == [5, 42, 79]
    assert (dead["__error"].str.contains("poison")).all()


def test_no_errors_no_dead_letters(tmp_path):
    tbl = pa.table({"x": pa.array(list(range(10)), type=pa.int64())})
    dead_dir = str(tmp_path / "dead")
    out = safe_map_batches(
        rd.from_arrow(tbl), lambda b: b, dead_dir, batch_size=4
    )
    assert out.count() == 10
    assert read_dead_letters(dead_dir) is None
