"""Text-kernel conformance on crafted inputs (the fixture corpus has no
brackets/digit runs, so the oracle gate alone can't exercise M3's regex
branches — compare engine output against DuckDB directly here)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

CRAFTED = [
    "Hello World",
    "ad break [BUY OUR STUFF] resume show",
    "Episode 42 of 100: the [sponsor] cut",
    "  leading and   trailing   ",
    "[whole thing bracketed]",
    "unicode żółć ÜNÏCODE 123 mixed",
    "numbers 123 mid 4567 and x9 mixed a1b",
    "",
    "[a][b][c] 1 2 3",
]


def test_clean_text_matches_duckdb():
    from podcast_audio_feature_extraction_ray.stages.text import clean_text

    tbl = pa.table(
        {"doc_id": np.arange(len(CRAFTED), dtype=np.int64), "text": CRAFTED}
    )
    got = (
        clean_text(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(r"""
        WITH c AS (
          SELECT doc_id, text,
                 trim(regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(text), '\[[^\]]*\]', '', 'g'),
                     '\b[0-9]+\b', '', 'g'),
                   ' +', ' ', 'g')) AS clean_text
          FROM documents
        )
        SELECT doc_id, clean_text,
               cast(length(text) - length(clean_text) AS bigint) AS n_chars_removed
        FROM c ORDER BY doc_id
    """).df()
    pd.testing.assert_series_equal(
        got.clean_text, want.clean_text, check_names=False
    )
    np.testing.assert_array_equal(
        got.n_chars_removed.to_numpy(), want.n_chars_removed.to_numpy()
    )


def test_langid_profiles_distinguish():
    from podcast_audio_feature_extraction_ray.stages.text import langid_ngram

    texts = [
        "the cat and the dog are running out of the house",
        "der hund und ein schöner schuh und noch ein buch ich",
        "les enfants que nous aimons sont dans les jardins de que",
    ]
    tbl = pa.table({"doc_id": np.arange(3, dtype=np.int64), "text": texts})
    got = (
        langid_ngram(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.lang) == ["en", "de", "fr"]


def test_word_tokens_arrow_matches_loop():
    """Vectorized Arrow tokenizer == the per-row loop reference,
    including empty strings, runs of spaces, and multi-byte UTF-8
    first chars (1..4 byte encodings)."""
    import numpy as np
    import pyarrow as pa

    from podcast_audio_feature_extraction_ray.functions.scalar import (
        word_tokens_arrow,
        word_tokens_np,
    )

    texts = [
        "hello world",
        "",
        " ",
        "a  b   c",
        "  lead",
        "trail  ",
        "żółć ünïcode 中文 \U0001F600emoji x",
        "one",
    ]
    want_v, want_o = word_tokens_np(np.array(texts, dtype=object))
    for typ in (pa.string(), pa.large_string()):
        got_v, got_o = word_tokens_arrow(pa.array(texts, type=typ))
        assert np.array_equal(got_o, want_o), typ
        assert np.array_equal(got_v, want_v), typ
