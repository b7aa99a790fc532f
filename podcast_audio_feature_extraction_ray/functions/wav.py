"""Real RIFF/WAVE PCM16 codec over stdlib ``struct`` + numpy — no audio
libraries required, so unlike the gated JPEG path this decode is REAL in
this container (the PNG codec's sibling; reference analog: the audio
ingest feeding the frame functionals, ``src/features/FeatureExtractor.py``).

Scope: mono/stereo, 16-bit signed PCM (format tag 1). The decoder walks
RIFF chunks properly (skips unknown chunks like LIST/fact, honors chunk
word alignment) rather than assuming the canonical 44-byte header.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF = b"RIFF"
WAVE = b"WAVE"


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples (1-D mono or (n, ch) interleaved-on-write)
    as a canonical PCM16 WAV file."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("wav_encode takes int16 samples")
    if s.ndim == 1:
        ch = 1
    elif s.ndim == 2:
        ch = s.shape[1]
    else:
        raise ValueError("samples must be 1-D or (n, channels)")
    data = s.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return RIFF + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV file -> (samples, sample_rate). Mono returns a
    1-D int16 array; multi-channel returns (n, ch). Walks chunks: any
    chunk other than fmt/data is skipped (word-aligned), fmt must be
    uncompressed 16-bit PCM."""
    if data[:4] != RIFF or data[8:12] != WAVE:
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    n = len(data)
    ch = rate = bits = None
    raw = None
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > n:  # truncated/corrupt files must not
            raise ValueError(      # silently decode to a shorter clip
                f"truncated WAV: chunk {tag!r} declares {length} bytes, "
                f"{n - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"malformed fmt chunk ({length} bytes < 16)")
            fmt_tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag} (PCM only)")
        elif tag == b"data":
            raw = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if ch is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (16-bit PCM only)")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.int16, copy=False)
    if ch > 1:
        samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch)
    return samples, rate
