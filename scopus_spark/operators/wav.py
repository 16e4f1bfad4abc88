"""WAV (RIFF PCM) audio codec — pure stdlib struct + numpy, no codec
libraries. Extends the multimodal tier from images (png.py, jpeg.py) to
AUDIO with a REAL wire format: RIFF/WAVE with integer PCM payloads is what
arecord/sox/ffmpeg emit for uncompressed audio, and PCM is lossless, so
the j35 feature extraction is hash-exact against byte-level ground truth
with no staging tricks needed.

Scope (ValueError on real code paths, same policy as png.py/jpeg.py):

- DECODE: RIFF/WAVE container, `fmt ` chunk with format tag 1 (integer
  PCM), 8-bit unsigned or 16-bit signed little-endian samples, any
  channel count (samples return as (n_frames, channels)). Rejected:
  compressed/float format tags (IEEE float, ADPCM, MP3-in-WAV...),
  24/32-bit sample widths, truncated containers, missing fmt/data.
- ENCODE (staging tier): mono/multi-channel int16 or uint8 PCM.

Chunk parsing follows the RIFF rules: chunks are halfword-aligned (odd
sizes carry a pad byte), unknown chunks (LIST/INFO/fact/...) are skipped,
and `fmt ` must precede `data`.
"""

from __future__ import annotations

import struct

import numpy as np

PCM_TAG = 1


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode (n,) mono or (n, ch) PCM samples (int16 for bits=16, uint8
    for bits=8) into a RIFF/WAVE byte stream."""
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    if samples.ndim != 2:
        raise ValueError("encode_wav expects (n,) or (n, channels) samples")
    n, ch = samples.shape
    if bits == 16:
        payload = samples.astype("<i2").tobytes()
    elif bits == 8:
        payload = samples.astype(np.uint8).tobytes()
    else:
        raise ValueError("encode_wav supports 8- or 16-bit PCM")
    block_align = ch * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", PCM_TAG, ch, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunks += b"\x00"  # RIFF halfword alignment pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE byte stream -> ((n_frames, channels) int array,
    sample_rate). 16-bit samples come back int16-valued, 8-bit ones as
    their unsigned byte values. Raises ValueError outside the documented
    integer-PCM scope and on corrupt/truncated containers."""
    data = bytes(data) if data is not None else b""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if body_at + size > len(data):
            raise ValueError("corrupt WAV: truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            tag, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", data, body_at)
            if tag != PCM_TAG:
                raise ValueError(
                    "non-integer-PCM WAV (float/ADPCM/compressed) outside scope"
                )
            if bits not in (8, 16):
                raise ValueError("only 8/16-bit PCM in scope")
            if ch < 1:
                raise ValueError("corrupt WAV: zero channels")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("corrupt WAV: data chunk before fmt")
            ch, rate, bits = fmt
            width = bits // 8
            frames = size // (ch * width)
            raw = data[body_at : body_at + frames * ch * width]
            dt = "<i2" if bits == 16 else np.uint8
            return (
                np.frombuffer(raw, dtype=dt)
                .astype(np.int64)
                .reshape(frames, ch),
                rate,
            )
        pos = body_at + size + (size % 2)  # halfword alignment
    raise ValueError("corrupt WAV: no data chunk")
