"""Conformance for the DSIR importance-resampling operator: exact
equality with an independent per-row loop oracle (hashing via the
pure-Python reference primitives), plus layout invariance."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from podcast_audio_feature_extraction_ray import hashing
from podcast_audio_feature_extraction_ray.stages import dsir

SF = "/root/testdata/sf0.001"
M = 512  # small bucket table so collisions actually occur in the test
NGRAM_MAX = 2


@pytest.fixture(scope="module")
def raw_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def target_df(raw_df):
    # a biased "domain" sample: the longest-text quartile (deterministic)
    n = max(4, len(raw_df) // 4)
    return (
        raw_df.assign(_l=raw_df.text.str.len())
        .nlargest(n, "_l")
        .drop(columns="_l")
        .reset_index(drop=True)
    )


def _loop_buckets(text: str) -> list[int]:
    """Loop-oracle hashed-gram buckets: every level n=1..NGRAM_MAX goes
    through combine_hashes (the ngram_hashes reference rule; winnowing —
    no short grams)."""
    words = text.split()
    hs = [hashing.word_hash(w) for w in words]
    out = []
    for n in range(1, NGRAM_MAX + 1):
        for i in range(len(hs) - n + 1):
            out.append(hashing.combine_hashes(hs[i : i + n]) % M)
    return out


def _loop_counts(df: pd.DataFrame) -> np.ndarray:
    c = np.zeros(M, dtype=np.int64)
    for t in df.text:
        for b in _loop_buckets(t if t is not None else ""):
            c[b] += 1
    return c


def test_bucket_counts_match_loop(raw_df, target_df):
    got = dsir.hashed_bucket_counts(rd.from_pandas(raw_df), m=M, ngram_max=NGRAM_MAX)
    np.testing.assert_array_equal(got, _loop_counts(raw_df))
    got_t = dsir.hashed_bucket_counts(
        rd.from_pandas(target_df), m=M, ngram_max=NGRAM_MAX
    )
    np.testing.assert_array_equal(got_t, _loop_counts(target_df))


def test_weights_match_loop_oracle_exactly(raw_df, target_df):
    tc, rc = _loop_counts(target_df), _loop_counts(raw_df)
    lr_q = dsir.dsir_log_ratio(tc, rc)

    # independent recompute of the quantized table
    t_tot, r_tot = int(tc.sum()) + M, int(rc.sum()) + M
    for b in range(M):
        want = round(
            (math.log((int(tc[b]) + 1) / t_tot) - math.log((int(rc[b]) + 1) / r_tot))
            * dsir.DSIR_SCALE
        )
        assert lr_q[b] == want

    got = (
        dsir.dsir_weights(rd.from_pandas(raw_df), lr_q, ngram_max=NGRAM_MAX)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_q, want_g = [], []
    for t in raw_df.sort_values("doc_id").text:
        bs = _loop_buckets(t if t is not None else "")
        want_g.append(len(bs))
        want_q.append(int(sum(int(lr_q[b]) for b in bs)))  # exact bigint sum
    np.testing.assert_array_equal(got.n_grams.to_numpy(), np.array(want_g))
    np.testing.assert_array_equal(got.logw_q.to_numpy(), np.array(want_q))
    np.testing.assert_array_equal(
        got.logw.to_numpy(), got.logw_q.to_numpy().astype(np.float64) / dsir.DSIR_SCALE
    )


def test_weights_layout_invariant(raw_df, target_df):
    tc, rc = _loop_counts(target_df), _loop_counts(raw_df)
    lr_q = dsir.dsir_log_ratio(tc, rc)
    a = (
        dsir.dsir_weights(rd.from_pandas(raw_df), lr_q, ngram_max=NGRAM_MAX)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    shuffled = raw_df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    b = (
        dsir.dsir_weights(
            rd.from_pandas(shuffled).repartition(7), lr_q, ngram_max=NGRAM_MAX
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_select_is_topk_of_loop_weights(raw_df, target_df):
    k = 10
    out = (
        dsir.dsir_select(
            rd.from_pandas(raw_df),
            rd.from_pandas(target_df),
            k=k,
            m=M,
            ngram_max=NGRAM_MAX,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    tc, rc = _loop_counts(target_df), _loop_counts(raw_df)
    lr_q = dsir.dsir_log_ratio(tc, rc)
    rows = []
    for did, t in zip(raw_df.doc_id, raw_df.text):
        bs = _loop_buckets(t if t is not None else "")
        rows.append((did, int(sum(int(lr_q[b]) for b in bs))))
    want = sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    assert list(out.doc_id) == [r[0] for r in want]
    assert list(out.logw_q) == [r[1] for r in want]
    # the selected set skews toward the target domain (long docs)
    med_sel = raw_df.set_index("doc_id").loc[out.doc_id].text.str.len().median()
    med_all = raw_df.text.str.len().median()
    assert med_sel > med_all
