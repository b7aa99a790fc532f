"""tokwin — a Ray-Data-native windowed feature-engineering engine.

A from-scratch re-expression of the semantics of
``trecpodcasts/podcast-audio-feature-extraction`` (studied read-only at
``/root/reference``) over Parquet tables of pre-tokenized sequences
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``:

- fixed-stride sliding-window segmentation of long ordered per-entity
  streams (reference: openSMILE 0.96s/0.48s frames,
  ``data/custom_FrameModeFunctionals.conf.inc:8-11``; transcript 120s/60s
  segments, ``src/search/index.py:55-110``),
- chunked streaming with bounded lookahead (reference:
  ``src/features/YAMNetExtractor.py:78-95``),
- point-in-time as-of/backfill joins and lag/lead features (reference:
  start-time-only window membership ``src/search/index.py:84-89`` and the
  score zip-join ``src/search/search.py:112-116``),
- per-window aggregate family (reference: ``src/search/metrics.py``),
- resumable partitioned output (reference skip-if-exists,
  ``src/features/FeatureExtractor.py:68-90``).

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow batches; stateful stages are actor pools. No code is
copied from the reference — citations are for semantic parity only.
"""

from podcast_audio_feature_extraction_ray.config import WindowSpec, FRAME_SPEC, SEGMENT_SPEC

__all__ = ["WindowSpec", "FRAME_SPEC", "SEGMENT_SPEC"]
__version__ = "0.1.0"
