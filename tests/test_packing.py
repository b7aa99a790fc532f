"""Sequence packing vs a loop oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from podcast_audio_feature_extraction_ray.stages.packing import pack_sequences

SEP = 50_256


def test_packing_matches_loop_oracle(tiny_tokens):
    ds = rd.from_arrow(tiny_tokens)
    got = pack_sequences(ds, seq_len=64, sep_token=SEP, num_buckets=8).to_pandas()

    # oracle: same bucketing + ordering, naive python
    df = tiny_tokens.to_pandas()
    h = pd.util.hash_pandas_object(df["doc_id"], index=False).to_numpy(dtype=np.uint64)
    df["__bucket"] = (h % np.uint64(8)).astype(np.int64)
    want_rows = []
    for b, g in df.groupby("__bucket"):
        # mirror the engine's deterministic layout keys (the fixture has
        # duplicate (doc_id, seq_no) rows, so n_tok breaks those ties)
        g = g.sort_values(["doc_id", "seq_no", "n_tok"], kind="mergesort")
        stream: list[int] = []
        is_sep: list[bool] = []
        for toks in g["tokens"]:
            stream.extend(int(x) for x in toks)
            is_sep.extend([False] * len(toks))
            stream.append(SEP)
            is_sep.append(True)  # positional: a real token == SEP is not a boundary
        for s in range(0, len(stream), 64):
            chunk = stream[s : s + 64]
            want_rows.append((int(b), s // 64, chunk, len(chunk),
                              sum(is_sep[s : s + 64])))
    want = pd.DataFrame(
        want_rows, columns=["bucket", "seq_no", "tokens", "n_tok", "n_bounds"]
    ).sort_values(["bucket", "seq_no"]).reset_index(drop=True)
    got = got.sort_values(["bucket", "seq_no"]).reset_index(drop=True)
    assert len(got) == len(want)
    for i in range(len(got)):
        assert list(got.tokens[i]) == want.tokens[i], f"seq {i}"
    np.testing.assert_array_equal(got.n_tok, want.n_tok)
    # boundary counts match separators (SEP never collides: vocab < 50256
    # is not guaranteed for fixtures, so compare against actual SEP count)
    np.testing.assert_array_equal(got.n_doc_boundaries, want.n_bounds)


def test_packing_conserves_tokens(tiny_tokens):
    ds = rd.from_arrow(tiny_tokens)
    packed = pack_sequences(ds, seq_len=128, sep_token=SEP, num_buckets=4)
    total_out = sum(r["n_tok"] for r in packed.select_columns(["n_tok"]).take_all())
    df = tiny_tokens.to_pandas()
    total_in = int(df["tokens"].map(len).sum()) + len(df)  # + one sep per doc
    assert total_out == total_in


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_rows=st.integers(1, 60),
    n_docs=st.integers(1, 8),
    seq_len=st.sampled_from([8, 64, 257]),
)
def test_packing_random_property(ray_session, seed, n_rows, n_docs, seq_len):
    """Random tables (length-0 docs, docs longer than seq_len, duplicate
    keys) must pack identically to the loop oracle at any seq_len."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 3 * seq_len, n_rows)
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    vals = rng.integers(0, 1000, int(offs[-1]), dtype=np.int32)
    doc = rng.integers(0, n_docs, n_rows)
    seq = pd.DataFrame({"d": doc}).groupby("d").cumcount().to_numpy()
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{int(x)}" for x in doc]),
            "tokens": pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32)), pa.array(vals)
            ),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(["s"] * n_rows),
            "seq_no": pa.array(seq.astype(np.int64)),
        }
    )
    got = (
        pack_sequences(rd.from_arrow(tbl), seq_len=seq_len, sep_token=SEP,
                       num_buckets=4)
        .to_pandas().sort_values(["bucket", "seq_no"]).reset_index(drop=True)
    )
    df = tbl.to_pandas()
    h = pd.util.hash_pandas_object(df["doc_id"], index=False).to_numpy(dtype=np.uint64)
    df["__bucket"] = (h % np.uint64(4)).astype(np.int64)
    want_rows = []
    for b, g in df.groupby("__bucket"):
        g = g.sort_values(["doc_id", "seq_no", "n_tok"], kind="mergesort")
        stream: list[int] = []
        for toks in g["tokens"]:
            stream.extend(int(x) for x in toks)
            stream.append(SEP)
        for s in range(0, len(stream), seq_len):
            want_rows.append((int(b), s // seq_len, stream[s : s + seq_len]))
    want = (
        pd.DataFrame(want_rows, columns=["bucket", "seq_no", "tokens"])
        .sort_values(["bucket", "seq_no"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    for i in range(len(got)):
        assert list(got.tokens[i]) == want.tokens[i]
