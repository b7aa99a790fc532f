"""Grow-only scratch-buffer arena.

This sandbox (and many virtualized hosts) services fresh-page writes at
~200 MB/s (page-fault bound) while warm-page numpy ops run at GB/s — a
40x gap measured here. Kernel hot paths therefore compute into REUSED
per-process buffers (`out=`/in-place ufuncs) instead of allocating
per batch. Each Ray map-task worker process keeps one arena; buffers are
handed out as views and never escape into output Arrow arrays (outputs
must own fresh memory — Arrow zero-copies numpy).
"""

from __future__ import annotations

import numpy as np


class Arena:
    def __init__(self) -> None:
        self._bufs: dict[tuple[str, np.dtype], np.ndarray] = {}

    def get(self, name: str, n: int, dtype) -> np.ndarray:
        key = (name, np.dtype(dtype))
        buf = self._bufs.get(key)
        if buf is None or len(buf) < n:
            buf = np.empty(int(n * 5 // 4) + 16, dtype=dtype)
            self._bufs[key] = buf
        return buf[:n]

    def iota(self, n: int) -> np.ndarray:
        """Cached ascending int64 [0..n) — read-only by convention."""
        key = ("__iota", np.dtype(np.int64))
        buf = self._bufs.get(key)
        if buf is None or len(buf) < n:
            buf = np.arange(int(n * 5 // 4) + 16, dtype=np.int64)
            self._bufs[key] = buf
        return buf[:n]

    def iota32(self, n: int) -> np.ndarray:
        """Cached ascending int32 [0..n) — read-only by convention."""
        key = ("__iota32", np.dtype(np.int32))
        buf = self._bufs.get(key)
        if buf is None or len(buf) < n:
            buf = np.arange(int(n * 5 // 4) + 16, dtype=np.int32)
            self._bufs[key] = buf
        return buf[:n]


ARENA = Arena()
