"""Real PNG decode (and a staging encoder) with ZERO new dependencies.

The container ships no codec libraries, but PNG needs none: the format is
zlib (stdlib) + five per-scanline byte filters (RFC 2083 §6), all
reconstructable in numpy. This removes the compressed-codec
NotImplementedError for PNG in operators/multimodal.py — the decode tier
that every real multimodal corpus (which is PNG/JPEG, not raw RGB888)
actually exercises.

Scope (decoder): 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha) and 6 (RGBA), non-interlaced — the overwhelming majority of
real-world PNGs. 16-bit depth and Adam7 interlacing raise ValueError with
an explicit message (narrow edge, not a stub of the main path). Alpha is
stripped; gray replicates to 3 channels; output is always an
(n_pixels, 3) uint8 array, the same contract as the raw-RGB888 decoder.

Scale note: decode runs inside the existing Arrow-batched mapInPandas
tier — pure map work, no shuffle. Per-row Sub is a uint8 cumsum (exact
mod-256 wraparound); Up/None are whole-row vector ops; Average/Paeth walk
pixels within a row but vectorize across the 3 byte lanes. A real
deployment can swap libpng in behind the same decode_pixels dispatch
without touching the plan.

The encoder exists to STAGE deterministic test payloads (j32 renders PNGs
from the same pixel buffers the j27 raw tier uses) and deliberately cycles
through ALL five filter types row by row so the decoder's every
reconstruction path is exercised and HASH-checked.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per color type (before alpha stripping)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int16 inputs -> uint8.

    Tie-break order is load-bearing (RFC 2083 §6.6): a wins pa<=pb and
    pa<=pc, THEN b wins pb<=pc, else c. Picking c on a pb==pc tie decodes
    real-world (libpng-encoded) Paeth rows to silently wrong pixels;
    tests/test_png.py pins an externally hand-filtered tie vector."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where(pb <= pc, b, c)
    out = np.where((pa <= pb) & (pa <= pc), a, out)
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, width: int, height: int) -> bytes:
    """8-bit RGB PNG from an (h*w, 3) uint8 pixel buffer (row-major).

    Row r uses filter [Sub, Up, Average, Paeth, None][r % 5], so a
    multi-row image exercises every filter reconstruction path in the
    decoder — that coverage is the point of this staging encoder.
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    filters = (1, 2, 3, 4, 0)
    raw = bytearray()
    prev = np.zeros((width, 3), dtype=np.uint8)
    for r in range(height):
        rw = px[r]
        left = np.vstack([np.zeros((1, 3), dtype=np.uint8), rw[:-1]])
        prev_left = np.vstack([np.zeros((1, 3), dtype=np.uint8), prev[:-1]])
        ftype = filters[r % 5]
        if ftype == 0:
            filt = rw
        elif ftype == 1:
            filt = rw - left  # uint8 wraparound == mod-256 arithmetic
        elif ftype == 2:
            filt = rw - prev
        elif ftype == 3:
            filt = rw - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        else:
            filt = rw - _paeth(left, prev, prev_left)
        raw.append(ftype)
        raw.extend(filt.tobytes())
        prev = rw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (n_pixels, 3) uint8, row-major; alpha stripped, gray
    replicated, palette resolved. Raises ValueError for signatures or
    features outside the documented scope."""
    data = bytes(payload)
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            raise ValueError("corrupt PNG: truncated chunk")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("corrupt PNG: bad IHDR length")
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bitdepth != 8:
        raise ValueError(f"unsupported PNG bit depth {bitdepth} (8 only)")
    if colortype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {colortype}")
    if interlace != 0:
        raise ValueError("unsupported PNG: Adam7 interlacing")
    ch = _CHANNELS[colortype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: bad IDAT stream ({exc})") from None
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: scanline length mismatch")
    recon = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        off = r * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:
            cur = row.copy()
        elif ftype == 1:
            # recon[x] = filt[x] + recon[x-ch]: a per-lane running sum —
            # uint8 cumsum wraps mod 256, which IS the spec's arithmetic.
            cur = np.cumsum(
                row.reshape(width, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype == 2:
            cur = row + prev
        elif ftype in (3, 4):
            # left neighbor depends on the just-reconstructed pixel:
            # sequential in x, vectorized across the ch byte lanes.
            rw = row.reshape(width, ch)
            pv = prev.reshape(width, ch)
            out = np.empty((width, ch), dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint8)
            pleft = np.zeros(ch, dtype=np.uint8)
            for x in range(width):
                if ftype == 3:
                    out[x] = rw[x] + (
                        (left.astype(np.uint16) + pv[x].astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    out[x] = rw[x] + _paeth(left, pv[x], pleft)
                left = out[x]
                pleft = pv[x]
            cur = out.reshape(stride)
        else:
            raise ValueError(f"corrupt PNG: filter type {ftype}")
        recon[r] = cur
        prev = cur
    px = recon.reshape(height, width, ch)
    if colortype == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        return palette[px.reshape(-1)].reshape(-1, 3)
    if colortype == 0:
        return np.repeat(px.reshape(-1, 1), 3, axis=1)
    if colortype == 4:
        return np.repeat(px.reshape(-1, 2)[:, :1], 3, axis=1)
    if colortype == 6:
        return px.reshape(-1, 4)[:, :3].copy()
    return px.reshape(-1, 3)
