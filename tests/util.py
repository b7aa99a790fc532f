from __future__ import annotations

import numpy as np
import pandas as pd


def normalize_windows(df: pd.DataFrame, key=("doc_id", "source")) -> pd.DataFrame:
    """Sort + canonicalize a window table for comparison."""
    df = df.copy()
    for c in ("seg_tokens", "lag_tokens", "lead_tokens"):
        if c in df.columns:
            df[c] = df[c].map(lambda x: [int(v) for v in x])
    sort_cols = [*key, "ts_start"]
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def assert_windows_equal(got: pd.DataFrame, want: pd.DataFrame, key=("doc_id", "source")):
    got = normalize_windows(got, key)
    want = normalize_windows(want, key)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    assert set(want.columns) <= set(got.columns), (
        f"missing columns {set(want.columns) - set(got.columns)}"
    )
    for c in want.columns:
        g, w = got[c], want[c]
        if g.dtype == object or w.dtype == object:
            for i, (a, b) in enumerate(zip(g, w)):
                assert list(a) == list(b), f"col {c} row {i}: {a} != {b}"
        elif np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(
                g.to_numpy(dtype=float), w.to_numpy(dtype=float), rtol=1e-12, atol=1e-12,
                err_msg=f"col {c}",
            )
        else:
            np.testing.assert_array_equal(
                g.to_numpy(), w.to_numpy(), err_msg=f"col {c}"
            )
