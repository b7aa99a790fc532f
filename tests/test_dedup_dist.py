"""Distributed candidate-pair resolution (round-5 VERDICT ask #1):
``ngram_jaccard_verify_ds`` / ``neardup_clusters_ds`` must match the
broadcast-small-side path (itself loop-oracle tested) on a planted
30 %-dup corpus, and the composed queries must produce identical output
on both sides of the driver-collect threshold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _planted_corpus(seed: int = 0, n_base: int = 80) -> pd.DataFrame:
    """~30 % near/exact dups: every 3rd base doc gets a one-word
    perturbation, every 7th an exact copy; two whitespace-only docs."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(200)]
    texts, ids = [], []
    k = 0
    for i in range(n_base):
        t = " ".join(rng.choice(words, rng.integers(5, 40)))
        texts.append(t)
        ids.append(k)
        k += 1
        if i % 3 == 0:
            w = t.split()
            w[rng.integers(0, len(w))] = "zzz"
            texts.append(" ".join(w))
            ids.append(k)
            k += 1
        if i % 7 == 0:
            texts.append(t)
            ids.append(k)
            k += 1
    texts += ["", "  "]
    ids += [k, k + 1]
    return pd.DataFrame(
        {
            "doc_id": np.array(ids, np.int64),
            "text": texts,
            "source": ["s"] * len(ids),
        }
    )


@pytest.fixture(scope="module")
def planted():
    df = _planted_corpus()
    from podcast_audio_feature_extraction_ray.stages import dedup

    pairs = dedup.minhash_lsh_pairs(
        rd.from_pandas(df), est_threshold=0.3
    ).materialize()
    assert pairs.count() > 20  # the plant worked
    return df, pairs


def test_verify_ds_matches_broadcast(ray_session, planted):
    from podcast_audio_feature_extraction_ray.stages import dedup

    df, pairs = planted
    ver_b = (
        dedup.ngram_jaccard_verify(rd.from_pandas(df), pairs.to_pandas())
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ver_d = (
        dedup.ngram_jaccard_verify_ds(rd.from_pandas(df), pairs)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    cols = ["a", "b", "inter_n", "union_n"]
    pd.testing.assert_frame_equal(ver_b[cols], ver_d[cols])


def test_clusters_ds_matches_broadcast_and_loop(ray_session, planted):
    from podcast_audio_feature_extraction_ray.stages import dedup

    df, pairs = planted
    cl_b = (
        dedup.neardup_clusters(rd.from_pandas(df), pairs.to_pandas())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cl_d = (
        dedup.neardup_clusters_ds(rd.from_pandas(df), pairs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "cluster_id", "keep"]
    pd.testing.assert_frame_equal(cl_b[cols], cl_d[cols])

    # independent loop oracle: classic union-find over the pair list
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    pdfp = pairs.to_pandas()
    for a, b in zip(pdfp["a"], pdfp["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {
        int(d): find(int(d)) for d in df["doc_id"]
    }
    got = dict(zip(cl_d["doc_id"].astype(int), cl_d["cluster_id"].astype(int)))
    assert got == want


def test_clusters_ds_long_chain_converges(ray_session):
    """Pointer jumping must close a long chain (worst diameter) well
    inside max_rounds."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    n = 300
    pairs = rd.from_pandas(
        pd.DataFrame(
            {"a": np.arange(n - 1, dtype=np.int64), "b": np.arange(1, n, dtype=np.int64)}
        )
    )
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n + 5, dtype=np.int64)})
    )
    out = (
        dedup.neardup_clusters_ds(docs, pairs, max_rounds=12)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["cluster_id"].to_numpy()[:n] == 0).all()
    assert (out["cluster_id"].to_numpy()[n:] == np.arange(n, n + 5)).all()
    assert out["keep"].to_numpy()[0] and not out["keep"].to_numpy()[1:n].any()


def test_verify_ds_empty_pairs(ray_session):
    from podcast_audio_feature_extraction_ray.arrow_utils import typed_empty_table
    from podcast_audio_feature_extraction_ray.stages import dedup
    import pyarrow as pa

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": ["a b c"] * 4})
    )
    pairs = rd.from_arrow(typed_empty_table({"a": pa.int64(), "b": pa.int64()}))
    assert dedup.ngram_jaccard_verify_ds(docs, pairs).count() == 0
    out = (
        dedup.neardup_clusters_ds(docs, pairs).to_pandas().sort_values("doc_id")
    )
    assert (out["cluster_id"].to_numpy() == np.arange(4)).all()
    assert out["keep"].all()


def test_composed_query_distributed_path_matches(ray_session, monkeypatch):
    """dedup_minhash_lsh over real testdata: forcing the distributed
    path (threshold 0) must reproduce the default broadcast path."""
    from podcast_audio_feature_extraction_ray.pipelines import queries

    sf = "/root/testdata/sf0.001"
    base = (
        queries.dedup_minhash_lsh(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setenv("TOKWIN_PAIR_DRIVER_MAX", "0")
    dist = (
        queries.dedup_minhash_lsh(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "cluster_id", "keep"]
    pd.testing.assert_frame_equal(base[cols], dist[cols])


def test_verify_ds_survives_duplicate_doc_id_rows(ray_session, planted):
    """A corpus holding DUPLICATE doc_id rows (same id, same text) must
    not drop pairs from the distributed verify (the join matches each
    membership several times): output equals the broadcast path run on
    the deduplicated corpus."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    df, pairs = planted
    # duplicate every 5th row verbatim (same id, same text)
    dup_rows = df.iloc[::5]
    df_dup = pd.concat([df, dup_rows], ignore_index=True)

    want = (
        dedup.ngram_jaccard_verify(rd.from_pandas(df), pairs.to_pandas())
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = (
        dedup.ngram_jaccard_verify_ds(rd.from_pandas(df_dup), pairs)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    cols = ["a", "b", "inter_n", "union_n"]
    pd.testing.assert_frame_equal(want[cols], got[cols])
