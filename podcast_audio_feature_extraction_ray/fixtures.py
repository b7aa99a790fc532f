"""Deterministic synthetic token-table fixtures (FIXTURES.md F1/F3).

Schema per ``BASELINE.json input_hint``:
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)`` plus
the explicit ordering column ``seq_no:int64`` (row index within
``(doc_id, source)`` at synthesis time — the analog of the dataset's
deterministic file order, reference ``src/data.py:16-23``).

All generation is seeded; no wall clock, no external data. Zipf-skewed
doc ids produce hot sessions (skew test, SURVEY §7.4.3); edge cases
(empty token list, 1-token session, session exactly W long) are planted
explicitly in the ``tiny`` size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SOURCES = ("web", "books", "code", "chat")
VOCAB = 50_257


def token_table(
    n_rows: int,
    n_docs: int,
    seed: int = 42,
    zipf_a: float = 1.3,
    mean_len: float = 5.0,
    sigma_len: float = 1.0,
    max_len: int = 2048,
    plant_edge_cases: bool = True,
) -> pa.Table:
    """Generate the F1 token table as a pyarrow Table."""
    rng = np.random.default_rng(seed)
    doc_k = (rng.zipf(zipf_a, size=n_rows) - 1) % n_docs
    src = rng.integers(0, len(SOURCES), size=n_rows)
    lens = np.clip(rng.lognormal(mean_len, sigma_len, size=n_rows).astype(np.int64), 1, max_len)
    if plant_edge_cases and n_rows >= 8:
        # one empty-list row, one 1-token row, one exactly-96 row (= FRAME W),
        # one exactly-97 row (W+1, segment-mode inclusive edge)
        lens[0], lens[1], lens[2], lens[3] = 0, 1, 96, 97
        doc_k[0:4] = n_docs - 1  # park them on a dedicated doc
        src[0:4] = 0
    total = int(lens.sum())
    values = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    doc_id = pa.array([f"doc{int(k):06d}" for k in doc_k], type=pa.string())
    source = pa.array([SOURCES[int(s)] for s in src], type=pa.string())
    tokens = pa.LargeListArray.from_arrays(offsets, pa.array(values, type=pa.int32())).cast(
        pa.list_(pa.int32())
    )
    # seq_no: rank within (doc_id, source) in generation order
    import pandas as pd

    seq_no = (
        pd.DataFrame({"d": doc_k, "s": src})
        .groupby(["d", "s"], sort=False)
        .cumcount()
        .to_numpy(dtype=np.int64)
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": source,
            "seq_no": pa.array(seq_no),
        }
    )


def event_table(token_tbl: pa.Table, seed: int = 43, rate: float = 1 / 500.0) -> pa.Table:
    """F3 sparse attribute stream: ~1 event per 1/rate ticks per session.

    Columns ``(doc_id, source, ts:int64, value:float64)`` with ts strictly
    increasing within a session.
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    df = token_tbl.select(["doc_id", "source", "n_tok"]).to_pandas()
    sess_len = df.groupby(["doc_id", "source"], sort=True)["n_tok"].sum()
    recs: list[tuple] = []
    for (d, s), L in sess_len.items():
        n_ev = int(rng.binomial(max(int(L), 0), rate))
        if n_ev == 0:
            continue
        ts = np.sort(rng.choice(int(L), size=n_ev, replace=False))
        vals = np.round(rng.normal(0, 100, size=n_ev), 3)
        recs.extend((d, s, int(t), float(v)) for t, v in zip(ts, vals))
    out = pd.DataFrame(recs, columns=["doc_id", "source", "ts", "value"])
    return pa.Table.from_pandas(
        out.astype({"ts": np.int64, "value": np.float64}), preserve_index=False
    )


def tiny(seed: int = 42) -> pa.Table:
    return token_table(220, n_docs=6, seed=seed, mean_len=3.5)


def small(seed: int = 42) -> pa.Table:
    return token_table(20_000, n_docs=400, seed=seed)


def bench_table(n_rows: int = 2_000_000, n_docs: int = 50_000, seed: int = 42) -> pa.Table:
    return token_table(n_rows, n_docs=n_docs, seed=seed)


def write_fixture(table: pa.Table, path: str, rows_per_group: int = 8_192) -> None:
    """Write with small row groups: Ray Data parallelizes parquet reads at
    row-group granularity, and every downstream map task works one block —
    a 2-row-group file caps the whole pipeline at 2 tasks."""
    import pyarrow.parquet as pq
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path, row_group_size=rows_per_group)
