"""Heavy-state model-inference actor stage (SURVEY §2.4 A2/A3 analog).

The reference's defining stateful stages load a model once per worker
and score windows per batch (YAMNet
``/root/reference/src/features/YAMNetExtractor.py:43-49``, VGGish
``/root/reference/src/features/VGGishExtractor.py:58-67``). The token
analog: ``LinearWindowScorer`` loads an integer weight matrix from a
FILE once per actor (``__init__``), then each ``__call__`` is one
matmul over the batch's window-feature columns — the canonical Ray Data
actor-pool pattern (callable class + ``concurrency=N``).

Weights are integer (int64) so scoring is EXACT fixed-point math: the
DuckDB oracle reproduces logits/argmax bit-for-bit, making this a fully
oracle-verified model stage (no float tolerance games).

Scale notes: the weights file is read per-actor, not per-batch; on a
real cluster the path must be on shared storage (or the matrix shipped
via ``ray.put`` — ``fn_constructor_args`` holds only the path/ref, so
either way nothing is re-shipped per batch). Argmax tie rule:
first-of-max (numpy ``argmax``), mirrored by the oracle's ordered CASE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_FEATURES = (
    "n_tokens",
    "n_distinct",
    "freq_gt",
    "match_count",
    "tok_sum",
    "tok_max",
    "tok_min",
)


def make_weights(path: str, n_classes: int = 4, n_features: int = 7, seed: int = 31337):
    """Write the deterministic integer weight matrix (n_classes x
    n_features, values in [-9, 9]) to ``path`` as .npy and return it.
    The SQL oracle inlines the SAME matrix as literals (``weights_sql``).

    Write is atomic (unique temp + ``os.replace``) and skipped when the
    file already exists: two concurrent runs sharing the path must never
    let an actor ``np.load`` a half-written file."""
    import os
    import tempfile

    rng = np.random.default_rng(seed)
    w = rng.integers(-9, 10, size=(n_classes, n_features), dtype=np.int64)
    if not os.path.exists(path):
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path) or ".", suffix=".npy.tmp"
        )
        try:
            with os.fdopen(fd, "wb") as fh:
                np.save(fh, w)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return w


def weight_matrix(n_classes: int = 4, n_features: int = 7, seed: int = 31337) -> np.ndarray:
    """The same deterministic matrix without the file side effect."""
    rng = np.random.default_rng(seed)
    return rng.integers(-9, 10, size=(n_classes, n_features), dtype=np.int64)


class LinearWindowScorer:
    """Actor: weights np.load-ed ONCE per actor; one matmul per batch."""

    def __init__(self, weights_path: str, feature_cols=DEFAULT_FEATURES):
        self.W = np.load(weights_path)  # (n_classes, n_features) int64
        self.cols = list(feature_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        F = np.stack(
            [
                batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in self.cols
            ],
            axis=1,
        )
        logits = F @ self.W.T  # exact int64
        best = np.argmax(logits, axis=1)  # first-of-max tie rule
        score = logits[np.arange(len(best)), best]
        batch = batch.append_column("class_id", pa.array(best.astype(np.int64)))
        return batch.append_column("class_score", pa.array(score))


def score_windows(
    windows_ds,
    weights_path: str,
    feature_cols=DEFAULT_FEATURES,
    concurrency: int = 4,
    batch_size: int = 4096,
):
    """Attach (class_id, class_score) to a window-feature Dataset via the
    actor pool. ``windows_ds`` must carry the integer feature columns."""
    return windows_ds.map_batches(
        LinearWindowScorer,
        fn_constructor_args=(weights_path, feature_cols),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
