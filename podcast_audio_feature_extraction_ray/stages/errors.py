"""Per-record error policy: dead-letter records instead of silent drops.

Recast of the reference's catch-log-skip per item + failure-log file
(``src/features/FeatureExtractor.py:57-65``, ``src/search/index.py:132-163``):
a Ray Data task must not swallow errors silently, and a whole-job abort
on one poison record is wrong for 100 TB runs. ``safe_map_batches`` runs
the UDF per batch; if a batch throws, it bisects to isolate the poison
rows, emits good rows through the UDF and routes poison rows to a
dead-letter parquet directory (append-only, one file per failing task)
with the error string attached.
"""

from __future__ import annotations

import os
import traceback
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


def _bisect_apply(batch: pa.Table, fn, dead: list[tuple[pa.Table, str]], depth=0):
    """Apply fn; on failure split the batch until poison rows isolated."""
    try:
        return [fn(batch)]
    except Exception as e:  # noqa: BLE001 — the whole point is containment
        if batch.num_rows <= 1:
            dead.append((batch, f"{type(e).__name__}: {e}"))
            return []
        mid = batch.num_rows // 2
        out = _bisect_apply(batch.slice(0, mid), fn, dead, depth + 1)
        out += _bisect_apply(batch.slice(mid), fn, dead, depth + 1)
        return out


def safe_map_batches(
    ds,
    fn,
    dead_letter_dir: str,
    batch_format: str = "pyarrow",
    batch_size: int | None = 4096,
    **map_kwargs,
):
    """map_batches with per-record containment + dead-letter sink.

    Returns the dataset of successful outputs; failed input rows land in
    ``dead_letter_dir`` as parquet with an ``__error`` column. The
    dead-letter write is per-task append-only (uuid filenames) — the
    manifest analog of the reference's ``index_failed.txt``.
    """
    os.makedirs(dead_letter_dir, exist_ok=True)

    def wrapped(batch: pa.Table) -> pa.Table:
        dead: list[tuple[pa.Table, str]] = []
        outs = _bisect_apply(batch, fn, dead)
        if dead:
            bad = pa.concat_tables(
                t.append_column("__error", pa.array([err] * t.num_rows))
                for t, err in dead
            )
            pq.write_table(
                bad, os.path.join(dead_letter_dir, f"dead-{uuid.uuid4().hex}.parquet")
            )
        if outs:
            return pa.concat_tables(outs)
        # preserve output schema: run fn on an empty slice (UDFs must
        # handle empty batches — ours do)
        return fn(batch.slice(0, 0))

    return ds.map_batches(
        wrapped, batch_format=batch_format, batch_size=batch_size, **map_kwargs
    )


def read_dead_letters(dead_letter_dir: str):
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(dead_letter_dir, "dead-*.parquet")))
    if not files:
        return None
    return rd.read_parquet(files)
