"""Property-based conformance: random tables + random window geometry
must match the loop oracle exactly on every path (FIXTURES.md plan)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from podcast_audio_feature_extraction_ray import oracle
from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.stages import segment as seg

from .util import assert_windows_equal


def _table(rng_seed: int, n_rows: int, n_docs: int, max_len: int) -> pa.Table:
    rng = np.random.default_rng(rng_seed)
    doc = rng.integers(0, n_docs, n_rows)
    src = rng.integers(0, 2, n_rows)
    lens = rng.integers(0, max_len + 1, n_rows)
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    vals = rng.integers(0, 50, int(offs[-1]), dtype=np.int32)  # small vocab: distinct-count stress
    seq = pd.DataFrame({"d": doc, "s": src}).groupby(["d", "s"], sort=False).cumcount().to_numpy()
    return pa.table(
        {
            "doc_id": pa.array([f"d{int(x)}" for x in doc]),
            "tokens": pa.ListArray.from_arrays(pa.array(offs.astype(np.int32)), pa.array(vals)),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array([("a", "b")[int(x)] for x in src]),
            "seq_no": pa.array(seq.astype(np.int64)),
        }
    )


@settings(max_examples=14, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    window=st.integers(1, 40),
    hop_frac=st.integers(1, 40),
    mode=st.sampled_from(["frame", "segment"]),
    impl=st.sampled_from(["bucket", "groups", "hotsplit"]),
    lag=st.integers(0, 12),
    lead=st.integers(0, 12),
)
def test_random_geometry_matches_oracle(
    seed, window, hop_frac, mode, impl, lag, lead, ray_session
):
    hop = hop_frac  # independent of window: covers hop > window (gaps)
    spec = WindowSpec(window, hop, mode)
    tbl = _table(seed, n_rows=60, n_docs=5, max_len=30)
    ds = rd.from_arrow(tbl)
    opts = dict(with_aggregates=True, lag=lag, lead=lead)
    if impl == "groups":
        got = seg.segment_sessions(
            ds, spec, impl="groups", chunk_ticks=4 * hop, **opts
        ).to_pandas()
    elif impl == "hotsplit":
        got = seg.segment_sessions(
            ds, spec, num_buckets=4, split_ticks=8 * hop, **opts
        ).to_pandas()
    else:
        got = seg.segment_sessions(ds, spec, num_buckets=4, **opts).to_pandas()
    want = oracle.oracle_segment(tbl.to_pandas(), spec, lag=lag, lead=lead)
    if not (lag or lead):
        want = want.drop(columns=[c for c in ("lag_tokens", "lead_tokens") if c in want])
    else:
        if not lag:
            want = want.drop(columns=["lag_tokens"])
        if not lead:
            want = want.drop(columns=["lead_tokens"])
    assert_windows_equal(got, want)
