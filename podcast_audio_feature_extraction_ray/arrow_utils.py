"""Zero-copy helpers between Arrow list columns and numpy buffers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """Return (values, offsets) numpy views of a list<T> column.

    ``offsets`` is int64[n+1]; ``values`` indexes the FULL child buffer, so
    ``values[offsets[i]:offsets[i+1]]`` is row i — valid for sliced arrays
    too (``.offsets`` respects the slice, ``.values`` does not slice).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64, copy=False)
    values = col.values.to_numpy(zero_copy_only=False)
    return values, offsets


def list_array(values: np.ndarray, offsets: np.ndarray, value_type=pa.int32()) -> pa.Array:
    """Build a list<value_type> array from numpy (values, offsets).

    Raises (rather than silently switching to large_list) past int32
    offsets: every caller emits PER-BLOCK data, and one block flipping
    to ``large_list`` while its siblings stay ``list`` breaks cross-block
    schema unification mid-run — exactly on the giant inputs where it
    would trigger. The fix at the call site is smaller blocks (batch
    size / bucket fan-out / ``split_ticks``), not a wider type."""
    if len(values) > np.iinfo(np.int32).max:
        raise ValueError(
            f"block would need large_list offsets ({len(values)} values > "
            "int32 max), which breaks cross-block schema unification; "
            "reduce the batch size / bucket fan-out / split_ticks so one "
            "block's gathered values stay under 2^31"
        )
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()),
        pa.array(values, type=value_type),
    )


def typed_empty_table(columns: "dict[str, pa.DataType]") -> pa.Table:
    """A 0-row table with EXPLICIT column types. Operators that build a
    driver-side artifact before streaming (BM25 stats, SemDeDup sample,
    blockref pointer tables) must emit this instead of a bare empty
    table: Ray hands 0-row blocks around schema-less ("new schema: ."),
    so an untyped empty poisons downstream unions and column lookups."""
    return pa.table({c: pa.array([], type=t) for c, t in columns.items()})
