"""Scalar/vectorized functions (SURVEY §2.8), pyarrow.compute throughout.

Every function here is batch-vectorized (Arrow kernels or numpy); the
matching ANSI-SQL expressions used by the DuckDB correctness oracle live
next to each docstring so the two stay in lock-step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def shard_key(prefix: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Path shard key: ``{upper(P[5])}/{upper(P[6])}/{P}``.

    Token analog of the reference's episode path deriver, which shards by
    chars 5 and 6 (0-based) of the show prefix, uppercased
    (``src/data.py:16-23``).
    SQL: ``upper(substr(p,6,1)) || '/' || upper(substr(p,7,1)) || '/' || p``
    """
    c5 = pc.utf8_upper(pc.utf8_slice_codeunits(prefix, 5, 6))
    c6 = pc.utf8_upper(pc.utf8_slice_codeunits(prefix, 6, 7))
    return pc.binary_join_element_wise(c5, c6, prefix, "/")


def format_segment_id(base: pa.Array, seg_start: pa.Array) -> pa.Array:
    """``f"{base}_{seg_start}"`` — segment id generator
    (reference ``src/search/index.py:81``).
    SQL: ``base || '_' || cast(seg_start as varchar)``
    """
    return pc.binary_join_element_wise(base, pc.cast(seg_start, pa.string()), "_")


def parse_segment_id(ids: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Inverse: split ``"{uri}_{start}"`` on the LAST underscore
    (reference ``src/search/search.py:293-299``).
    SQL: ``regexp_extract(id,'^(.*)_([0-9]+)$',1)`` / ``...,2)``.
    Returns (uri, start:int64).
    """
    uri = pc.extract_regex(ids, r"^(?P<uri>.*)_(?P<start>[0-9]+)$")
    return (
        pc.struct_field(uri, "uri"),
        pc.cast(pc.struct_field(uri, "start"), pa.int64()),
    )


_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def word_tokens_np(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic toy tokenizer: split on single spaces, map each word
    ``w -> len(w)*31 + ord(w[0])`` (0 for empty).

    This is the SQL-replicable stand-in for a real BPE vocabulary, used to
    derive a token table from the ``documents`` test table so the window
    engine has a DuckDB-checkable oracle. SQL equivalent::

        list_transform(string_split(text, ' '),
                       w -> cast(length(w)*31 + coalesce(ascii(w), 0) as int))

    (``length`` = unicode chars = Python ``len``; ``ascii`` = first
    codepoint = Python ``ord``.) Returns flat (values:int32, offsets:int64).
    """
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    vals: list[int] = []
    for i, t in enumerate(texts):
        words = t.split(" ")
        vals.extend(len(w) * 31 + (ord(w[0]) if w else 0) for w in words)
        offsets[i + 1] = len(vals)
    return np.asarray(vals, dtype=np.int32), offsets


def word_tokens_arrow(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``word_tokens_np`` over an Arrow string column — the
    token-derivation hot path (zero per-row Python; identical values to
    the loop reference, property-tested in tests/test_text_kernels.py).

    ``pc.split_pattern(x, " ")`` matches Python ``x.split(" ")`` exactly
    (empty tokens kept for leading/trailing/run spaces); word length is
    codepoints (``pc.utf8_length``); the first codepoint is decoded from
    the UTF-8 byte buffer with branch-free numpy selects.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    lists = pc.split_pattern(texts, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    t_offsets = np.asarray(lists.offsets, dtype=np.int64)
    words = lists.values
    L = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(words.type) else np.int32
    w_off = np.frombuffer(words.buffers()[1], dtype=off_dtype)[
        words.offset : words.offset + len(words) + 1
    ].astype(np.int64)
    buf = np.frombuffer(words.buffers()[2], dtype=np.uint8)
    s, blen = w_off[:-1], np.diff(w_off)
    has = blen > 0
    nb = len(buf)

    def byte(k: int) -> np.ndarray:
        return buf[np.minimum(s + k, max(nb - 1, 0))].astype(np.int64) if nb else np.zeros(len(s), np.int64)

    b0, b1, b2, b3 = byte(0), byte(1), byte(2), byte(3)
    cp = np.select(
        [b0 < 0x80, b0 < 0xE0, b0 < 0xF0],
        [
            b0,
            ((b0 & 0x1F) << 6) | (b1 & 0x3F),
            ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F),
        ],
        ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F),
    )
    vals = np.where(has, L * 31 + cp, 0).astype(np.int32)
    return vals, t_offsets
