"""Event-time tumbling/hopping window aggregates over timestamped logs.

The token engine windows by POSITION (ticks); this stage windows by
EVENT TIME — the streaming-shaped complement (Ray Data has no native
event-time windows; the idiom is floor-bucketed keys + grouped
aggregation). Same combiner discipline as the grouped metrics: partial
aggregates per batch inside ``map_batches`` (one row per (entity,
window) per batch), then a small ``groupby`` over the partials — the
shuffle never moves raw events.

Hopping windows (hop < width) emit each event into ``width/hop`` buckets
via vectorized repeat — the event-time analog of the token frame
windows; ``width % hop == 0`` required so bucket membership is exact
integer math (SQL-replicable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_aggregate(
    ds,
    entity_key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width_us: int = 3_600_000_000,  # 1 hour
    hop_us: int | None = None,
):
    """Per (entity, window) aggregates; window start = floor-aligned
    event-time in microseconds. Values are exact integer cents so the
    DuckDB oracle hash-matches.

    Returns columns: entity, win_start_us, n_events, sum_cents,
    min_ts_us, max_ts_us.
    """
    hop = hop_us or width_us
    if width_us % hop != 0:
        raise ValueError("width_us must be a multiple of hop_us")
    k = width_us // hop  # buckets per event

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ent = batch[entity_key].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        # half-away-from-zero, matching DuckDB round() (np.round is
        # half-to-even: 112.5 -> 112 vs DuckDB 113)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)
        # hopping: event at t belongs to windows starting at
        # hop * j for j in (floor((t - width)/hop), floor(t/hop)]
        j_hi = ts // hop
        j_lo = np.maximum(j_hi - (k - 1), 0)
        reps = (j_hi - j_lo + 1).astype(np.int64)
        ridx = np.repeat(np.arange(n, dtype=np.int64), reps)
        cum = np.concatenate([[0], np.cumsum(reps)])
        j = np.arange(int(reps.sum()), dtype=np.int64)
        j -= np.repeat(cum[:-1], reps)
        j += np.repeat(j_lo, reps)
        df = pd.DataFrame(
            {
                entity_key: ent[ridx],
                "win_start_us": j * hop,
                "c": cents[ridx],
                "t": ts[ridx],
            }
        )
        g = df.groupby([entity_key, "win_start_us"], sort=False).agg(
            n_events=("c", "size"),
            sum_cents=("c", "sum"),
            min_ts_us=("t", "min"),
            max_ts_us=("t", "max"),
        ).reset_index()
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby([entity_key, "win_start_us"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_ts_us", alias_name="min_ts_us"),
        Max("max_ts_us", alias_name="max_ts_us"),
    )
