"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
typed metadata columns beside them; decode / feature-extraction / resize
/ frame-sample run as actor-pool ``map_batches`` stages (A1-A5 pattern —
the model/codec loads once per actor, reference
``src/features/YAMNetExtractor.py:43-49``).

The actual codec libraries (PIL/librosa/ffmpeg) are NOT in this
container, so the decode body is STUBBED: ``_HAVE_CODECS`` gates the real
import, and the fallback is a deterministic fake decoder that parses the
payload header we synthesize. The Ray-side plumbing — schema, batch
sizing for wide binary rows, actor signature, output layout — is real
and tested.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

try:  # real codecs are absent in this sandbox
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False


MAGIC = b"FAKEIMG1"


def attach_fake_payload(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Synthesize a deterministic binary 'image' payload per row:
    header (magic, width, height, n_frames) + pseudo-pixel bytes."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        payloads = []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            w = 16 + (int(i) * 7) % 48
            h = 16 + (int(i) * 13) % 32
            frames = 1 + (int(i)) % 4
            body = (t.encode("utf-8") * ((w * h) // max(len(t), 1) + 1))[: w * h]
            payloads.append(MAGIC + struct.pack("<III", w, h, frames) + body)
        return pa.table(
            {
                id_col: batch[id_col],
                "media_type": pa.array(["image/fake"] * batch.num_rows),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode stage. Real decode requires codec libs; the
    deterministic fallback parses the synthesized header. batch_size for
    this stage must be set by PAYLOAD budget (wide binary rows), not row
    count — callers use ``decode_media(..., batch_size=...)``."""

    def __init__(self, want_real: bool = False):
        if want_real and not _HAVE_CODECS:
            raise NotImplementedError(
                "image/audio codec libraries are not available in this "
                "container; run with want_real=False for the stub decoder"
            )
        self.want_real = want_real and _HAVE_CODECS

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        w_out = np.empty(len(payloads), dtype=np.int64)
        h_out = np.empty(len(payloads), dtype=np.int64)
        f_out = np.empty(len(payloads), dtype=np.int64)
        feat = np.empty((len(payloads), 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p[:8] != MAGIC:
                raise ValueError("unknown media payload")
            w, h, fr = struct.unpack("<III", p[8:20])
            w_out[i], h_out[i], f_out[i] = w, h, fr
            body = np.frombuffer(p[20:], dtype=np.uint8)
            # deterministic fake "embedding": 8 byte-histogram moments
            if len(body):
                feat[i] = [
                    body.mean(), body.std(), body.min(), body.max(),
                    np.percentile(body, 25), np.percentile(body, 50),
                    np.percentile(body, 75), len(body) % 255,
                ]
            else:
                feat[i] = 0
        cols = {c: batch[c] for c in batch.column_names if c != "payload"}
        cols["width"] = pa.array(w_out)
        cols["height"] = pa.array(h_out)
        cols["n_frames"] = pa.array(f_out)
        cols["media_embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(feat.reshape(-1)), 8
        )
        return pa.table(cols)


def decode_media(ds, batch_size: int = 256, concurrency: int = 2, want_real: bool = False):
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(want_real,),
        batch_format="pyarrow",
        batch_size=batch_size,  # small: binary rows are wide
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def frame_sample(ds, every: int = 2):
    """Frame-sampling analog: keep rows whose n_frames index stride
    matches (placeholder for per-frame explode at real scale)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(pc.bit_wise_and(batch["n_frames"], every - 1), 0)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
