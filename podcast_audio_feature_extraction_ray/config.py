"""Window + engine configuration.

The two canonical window geometries are token-domain analogs of the
reference's (see SURVEY.md §2.3):

- ``FRAME_SPEC``  — W=96, H=48, half-open left-aligned frames, the analog
  of openSMILE ``frameSize=0.96, frameStep=0.48, frameCenterSpecial=left``
  (reference ``data/custom_FrameModeFunctionals.conf.inc:8-11``): windows
  pinned at ``t = k*H`` for every ``k*H < L``; the last window may be
  partial; window covers ticks ``[k*H, min(k*H + W, L))``.

- ``SEGMENT_SPEC`` — W=12000, H=6000, inclusive-bound segments, the analog
  of the transcript segmenter (reference ``src/search/index.py:76-89``):
  ``for s in range(0, ceil(last_tick), H)`` keep ticks with
  ``s <= ts <= s + W`` (inclusive BOTH ends — a window holds up to W+1
  ticks). A session whose last tick is 0 (length-1 stream) emits NO
  windows, exactly like a one-word transcript in the reference.

``ts_end`` in all engine output is the EXCLUSIVE end tick
(``ts_start + len(seg_tokens)``) regardless of mode, so downstream code
never needs to know mode-specific inclusivity.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class WindowSpec:
    """Geometry of a fixed-stride sliding window over token ticks.

    mode="frame":   half-open [k*H, k*H+W), emitted while k*H < L.
    mode="segment": inclusive [s, s+W], s in range(0, ceil(L-1), H).
    """

    window: int
    hop: int
    mode: str = "frame"  # "frame" | "segment"

    def __post_init__(self) -> None:
        if self.window <= 0 or self.hop <= 0:
            raise ValueError("window and hop must be positive")
        if self.mode not in ("frame", "segment"):
            raise ValueError(f"unknown window mode {self.mode!r}")

    @property
    def lookahead(self) -> int:
        """Bounded lookahead needed past a chunk cut: ``window - hop``.

        Token analog of the YAMNet extractor's 0.47s (= 0.96 - 0.48 - one
        LLD tick) chunk-boundary lookahead (reference
        ``src/features/YAMNetExtractor.py:78-95`` — "the 0.47s has to do
        with yamnet windowing").
        """
        return max(self.window - self.hop, 0)


FRAME_SPEC = WindowSpec(window=96, hop=48, mode="frame")
SEGMENT_SPEC = WindowSpec(window=12000, hop=6000, mode="segment")


@dataclass(frozen=True)
class EngineConfig:
    """Engine-wide knobs (scale-sensitive; see SURVEY.md §7.4)."""

    # Batch sizing is by TOKEN budget, not row count: rows are wide
    # (tokens lists dominate). map_batches batch_size is derived from this
    # at stage-build time assuming ~avg_tokens_per_row.
    token_budget_per_batch: int = 2_000_000
    avg_tokens_per_row: int = 512
    # Actor-pool sizing for stateful stages.
    actor_pool_size: int = 4
    # Default session key / ordering (SURVEY §7.1 step 1).
    session_key: tuple[str, ...] = ("doc_id", "source")
    order_key: tuple[str, ...] = ("seq_no",)
    # Checkpoint/manifest
    checkpoint_dir: str | None = None
    num_output_partitions: int = 64

    @property
    def batch_size(self) -> int:
        return max(64, self.token_budget_per_batch // max(1, self.avg_tokens_per_row))


DEFAULT_CONFIG = EngineConfig()
