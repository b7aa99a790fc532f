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
    # functionals on: the percentile/slope columns must hold under
    # arbitrary geometry too (window=1 degenerate slopes, hop>window gaps)
    opts = dict(with_aggregates=True, functionals=True, lag=lag, lead=lead)
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
    want = oracle.oracle_segment(
        tbl.to_pandas(), spec, lag=lag, lead=lead, functionals=True
    )
    if not (lag or lead):
        want = want.drop(columns=[c for c in ("lag_tokens", "lead_tokens") if c in want])
    else:
        if not lag:
            want = want.drop(columns=["lag_tokens"])
        if not lead:
            want = want.drop(columns=["lead_tokens"])
    assert_windows_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000), n_docs=st.integers(1, 30))
def test_repetition_signals_property(ray_session, seed, n_docs):
    """Random tiny-vocab corpora (repetition-heavy by construction):
    the vectorized run-length kernel must equal a Counter-based loop
    oracle on every doc, including <3-word drops and all-ties."""
    from collections import Counter

    from podcast_audio_feature_extraction_ray.stages.text import repetition_signals

    rng = np.random.default_rng(seed)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(n_docs)
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": [f"d{i}" for i in range(n_docs)], "text": docs})
    )
    got = repetition_signals(ds).to_pandas()
    if got.empty:  # every doc dropped (<3 words): Ray gives a no-column df
        got = pd.DataFrame(columns=["doc_id"])
    got = got.set_index("doc_id")

    n_expected = 0
    for i, text in enumerate(docs):
        words = text.split(" ")
        toks = [len(w) * 31 + (ord(w[0]) if w else 0) for w in words]
        if len(toks) < 3:
            assert f"d{i}" not in got.index
            continue
        n_expected += 1
        row = got.loc[f"d{i}"]
        bc = Counter(zip(toks, toks[1:]))
        top_n = max(bc.values())
        top = min(b for b, c in bc.items() if c == top_n)
        tc = Counter(zip(toks, toks[1:], toks[2:]))
        dup = sum(c for c in tc.values() if c > 1)
        assert row["n_tok"] == len(toks)
        assert (row["top_bigram_a"], row["top_bigram_b"]) == top
        assert row["top_bigram_n"] == top_n
        assert row["top_bigram_frac"] == top_n / (len(toks) - 1)
        assert row["dup_trigram_n"] == dup
        assert row["dup_trigram_frac"] == dup / (len(toks) - 2)
    assert len(got) == n_expected
