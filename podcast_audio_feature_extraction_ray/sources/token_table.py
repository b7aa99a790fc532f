"""Sources: token-table reader + documents→tokens derivation.

``read_token_table`` prunes at the read (columns= pushdown) — a read that
loads all columns for a 2-column transform is wrong at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from podcast_audio_feature_extraction_ray.arrow_utils import list_array
from podcast_audio_feature_extraction_ray.functions.scalar import word_tokens_arrow

TOKEN_COLUMNS = ["doc_id", "tokens", "n_tok", "source", "seq_no"]


def read_token_table(paths, columns=None, **kw):
    """``ray.data.read_parquet`` of the token table with column pruning."""
    return rd.read_parquet(paths, columns=columns or TOKEN_COLUMNS, **kw)


def documents_to_tokens(documents_ds, batch_size: int = 2048):
    """Derive the canonical token table from the ``documents`` test table.

    Deterministic toy tokenizer (see ``functions.scalar.word_tokens_np``)
    so DuckDB can replicate it exactly; one row per document = one
    single-row session (``seq_no`` = 0).
    """

    def fn(batch: pa.Table) -> pa.Table:
        vals, offs = word_tokens_arrow(batch["text"])
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.string()),
                "tokens": list_array(vals, offs),
                "n_tok": pa.array(np.diff(offs).astype(np.int32)),
                "source": batch["source"],
                "seq_no": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    return documents_ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
