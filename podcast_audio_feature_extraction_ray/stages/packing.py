"""Training-sequence packing: concatenate documents (with a separator
token) into fixed-length sequences — the canonical "pretokenized data →
training batches" op, the inverse of the windowing stages.

Deterministic layout: docs are hash-bucketed (same stable hash as the
sessionizer), sorted by id within bucket, concatenated with ``sep_token``
after each doc, and the bucket stream is cut into ``seq_len`` chunks
(last partial chunk kept, unpadded; trainer-side padding is a separate
concern). Every output row records its bucket, position, and how many
doc boundaries it contains — enough lineage to reconstruct attention
masks downstream.

Scale shape: one hash shuffle (same exchange as sessionize); packing
within a bucket is one vectorized pass. Exactly reproducible for a given
(num_buckets, seed-free stable hash, sort order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from podcast_audio_feature_extraction_ray import hashing
from podcast_audio_feature_extraction_ray.arrow_utils import list_array, list_buffers
from podcast_audio_feature_extraction_ray.kernels import concat_ranges


def pack_bucket_table(block: pa.Table, seq_len: int, sep_token: int, id_col: str) -> pa.Table:
    """Pack one sorted bucket block into fixed-length sequences."""
    n = block.num_rows
    values, offsets = list_buffers(block["tokens"])
    row_len = np.diff(offsets)
    # interleave each doc's tokens with one separator: build gather index
    idx, _ = concat_ranges(offsets[:-1], row_len)
    out_len = int(row_len.sum()) + n
    stream = np.empty(out_len, dtype=np.int32)
    # positions of separators: after each doc
    sep_pos = np.cumsum(row_len + 1) - 1
    mask = np.ones(out_len, dtype=bool)
    mask[sep_pos] = False
    stream[mask] = values[idx]
    stream[sep_pos] = sep_token
    n_seq = -(-out_len // seq_len)
    starts = np.arange(n_seq, dtype=np.int64) * seq_len
    lens = np.minimum(seq_len, out_len - starts)
    sidx, soff = concat_ranges(starts, lens)
    # doc boundaries per sequence = separators inside [start, start+len)
    n_bounds = (
        np.searchsorted(sep_pos, starts + lens, side="left")
        - np.searchsorted(sep_pos, starts, side="left")
    )
    bucket = block["__bucket"][0].as_py() if "__bucket" in block.column_names and n else -1
    return pa.table(
        {
            "bucket": pa.array(np.full(n_seq, bucket, dtype=np.int64)),
            "seq_no": pa.array(np.arange(n_seq, dtype=np.int64)),
            "tokens": list_array(stream[sidx], soff),
            "n_tok": pa.array(lens.astype(np.int32)),
            "n_doc_boundaries": pa.array(n_bounds.astype(np.int64)),
        }
    )


def pack_sequences(
    ds,
    seq_len: int = 2048,
    sep_token: int = 50_256,
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Dataset of (bucket, seq_no, tokens, n_tok, n_doc_boundaries)."""

    def tag(batch: pa.Table) -> pa.Table:
        # single-column form == the plain pandas row hash (and the loop
        # oracle in tests/test_packing.py)
        h = hashing.combined_key_hash([pd.Series(batch[id_col].to_pandas())])
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        # secondary keys: with duplicate ids the layout would otherwise
        # depend on nondeterministic block arrival order; (id, seq_no)
        # is the token table's unique key, n_tok the generic fallback
        sort_cols = [id_col] + [
            c for c in ("seq_no", "n_tok") if c in group.column_names and c != id_col
        ]
        order = pa.compute.sort_indices(
            group.select(sort_cols),
            sort_keys=[(c, "ascending") for c in sort_cols],
        )
        return pack_bucket_table(group.take(order), seq_len, sep_token, id_col)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
