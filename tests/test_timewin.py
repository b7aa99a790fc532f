"""Event-time window aggregates vs a pandas loop oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from podcast_audio_feature_extraction_ray.stages.timewin import tumbling_aggregate


def _oracle(df: pd.DataFrame, width: int, hop: int) -> pd.DataFrame:
    rows = []
    for _, r in df.iterrows():
        t = int(r.ts)
        c = int(round(r.value * 100))
        j_hi = t // hop
        j_lo = max(j_hi - (width // hop - 1), 0)
        for j in range(j_lo, j_hi + 1):
            rows.append((int(r.user_id), j * hop, c, t))
    o = pd.DataFrame(rows, columns=["user_id", "win_start_us", "c", "t"])
    return (
        o.groupby(["user_id", "win_start_us"])
        .agg(n_events=("c", "size"), sum_cents=("c", "sum"),
             min_ts_us=("t", "min"), max_ts_us=("t", "max"))
        .reset_index()
        .sort_values(["user_id", "win_start_us"])
        .reset_index(drop=True)
    )


def test_tumbling_and_hopping_match_oracle():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 8, 400),
            "ts": rng.integers(0, 10_000, 400).astype(np.int64),
            "value": np.round(rng.normal(10, 5, 400), 2),
        }
    )
    for width, hop in ((1000, 1000), (1000, 500), (900, 300)):
        got = (
            tumbling_aggregate(rd.from_pandas(df), "user_id", "ts", "value",
                               width_us=width, hop_us=hop)
            .to_pandas()
            .sort_values(["user_id", "win_start_us"])
            .reset_index(drop=True)
        )
        want = _oracle(df, width, hop)
        pd.testing.assert_frame_equal(
            got.astype({"n_events": np.int64, "sum_cents": np.int64}),
            want.astype({"n_events": np.int64, "sum_cents": np.int64}),
            check_dtype=False,
        )
