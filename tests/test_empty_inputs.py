"""Empty datasets must flow through every pipeline shape without error
(a crashed 0-row partition kills a 100-TB run as surely as a bug at
scale — two real crashes were found here: the hot-discovery sketch on
schema-less empty blocks, and the broadcast as-of on an empty event
table)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.stages import asof, segment as seg


@pytest.fixture()
def empty_tokens():
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "tokens": pa.array([], type=pa.list_(pa.int32())),
            "n_tok": pa.array([], type=pa.int32()),
            "source": pa.array([], type=pa.string()),
            "seq_no": pa.array([], type=pa.int64()),
        }
    )


SPEC = WindowSpec(16, 8)


def test_segment_rows_empty(ray_session, empty_tokens):
    assert seg.segment_rows(
        rd.from_arrow(empty_tokens), SPEC, with_aggregates=True
    ).count() == 0


@pytest.mark.parametrize("kw", [{}, {"payload": "blockref"}, {"impl": "groups"}])
def test_segment_sessions_empty(ray_session, empty_tokens, kw):
    assert seg.segment_sessions(rd.from_arrow(empty_tokens), SPEC, **kw).count() == 0


def _empty_windows():
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "win_id": pa.array([], type=pa.int64()),
            "ts_start": pa.array([], type=pa.int64()),
            "ts_end": pa.array([], type=pa.int64()),
        }
    )


def _one_event():
    return pa.table(
        {
            "doc_id": pa.array(["a"]),
            "source": pa.array(["s"]),
            "ts": pa.array([3], type=pa.int64()),
            "value": pa.array([1.0]),
        }
    )


@pytest.mark.parametrize("payload", ["inline", "blockref"])
def test_backfill_join_empty_windows(ray_session, payload):
    assert asof.backfill_join(
        rd.from_arrow(_empty_windows()), rd.from_arrow(_one_event()),
        payload=payload,
    ).count() == 0


def test_backfill_broadcast_empty_events(ray_session):
    win = pd.DataFrame(
        {
            "doc_id": ["a", "a"],
            "source": ["s", "s"],
            "win_id": np.array([0, 1], dtype=np.int64),
            "ts_start": np.array([0, 8], dtype=np.int64),
            "ts_end": np.array([16, 24], dtype=np.int64),
        }
    )
    events = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=str),
            "source": pd.Series([], dtype=str),
            "ts": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64),
        }
    )
    got = asof.backfill_broadcast(rd.from_pandas(win), events).to_pandas()
    assert len(got) == 2 and got["bf_value"].isna().all()


def _empty_docs():
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
        }
    )


def test_bm25_empty_corpus(ray_session):
    from podcast_audio_feature_extraction_ray.stages import text

    got = text.bm25_topk(rd.from_arrow(_empty_docs()), {1: [5, 7]}, k=3)
    assert got.count() == 0
    assert set(got.schema().names) == {"query_id", "doc_id", "score_q", "rank"}


def test_semdedup_empty_corpus(ray_session):
    from podcast_audio_feature_extraction_ray.stages import ann

    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.string()),
            "embedding": pa.array([], type=pa.list_(pa.float32())),
        }
    )
    got = ann.semdedup(rd.from_arrow(empty), id_col="vec_id", col="embedding")
    assert got.count() == 0
    assert "keep" in got.schema().names


def test_more_stages_pass_empty_through(ray_session, empty_tokens):
    """The broad battery: every family must stream a 0-row dataset
    without error (schema-less empty blocks are a Ray Data reality)."""
    from podcast_audio_feature_extraction_ray.stages import (
        dedup, packing, text, timewin, topk,
    )

    docs = rd.from_arrow(_empty_docs())
    assert text.text_signals(docs).count() == 0
    assert text.doc_fingerprint(rd.from_arrow(_empty_docs())).count() == 0
    assert dedup.exact_dedup(rd.from_arrow(_empty_docs())).count() == 0
    assert dedup.minhash_lsh_pairs(rd.from_arrow(_empty_docs())).count() == 0
    assert dedup.simhash_pairs(rd.from_arrow(_empty_docs())).count() == 0
    assert packing.pack_sequences(rd.from_arrow(empty_tokens), seq_len=64).count() == 0
    assert topk.stride_sample(rd.from_arrow(empty_tokens)).count() == 0
    ev = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "value": pa.array([], type=pa.float64()),
        }
    )
    assert timewin.tumbling_aggregate(rd.from_arrow(ev)).count() == 0


def test_null_text_flows_through_text_family(ray_session):
    """Null text rows must flow through every text-consuming operator as
    the empty string (the quality_arrays/hash_words convention), never
    crash a task."""
    from podcast_audio_feature_extraction_ray.stages import dedup, text

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["hello world", None, ""]),
            "source": pa.array(["s", "s", "s"]),
        }
    )
    dd = dedup.exact_dedup(rd.from_arrow(docs)).to_pandas()
    assert len(dd) == 2  # null and "" hash identically -> one group of 2
    assert int(dd.loc[dd["n_dups"] == 2, "keep_doc_id"].iloc[0]) == 2
    assert dedup.minhash_lsh_pairs(rd.from_arrow(docs)).count() == 1
    assert text.text_signals(rd.from_arrow(docs)).count() == 3
    assert text.doc_fingerprint(rd.from_arrow(docs)).count() == 3
