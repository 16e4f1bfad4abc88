"""AVI (RIFF) uncompressed-video codec — pure stdlib struct + numpy.
Completes the multimodal tier's third modality for REAL: uncompressed
24-bit BI_RGB AVI is a genuine wire format (``ffmpeg -c:v rawvideo``
emits exactly this), and raw frames are lossless, so frame extraction is
hash-exact against byte-level ground truth.

The DIB frame quirks are implemented faithfully — they are where a naive
decoder silently corrupts pixels:

- rows are stored BOTTOM-UP (positive biHeight),
- pixel byte order is BGR, not RGB,
- each row is padded to a 4-byte boundary (stride = ceil(3w/4)*4).

Scope (ValueError policy as png.py/jpeg.py/wav.py): single 'vids' stream,
BI_RGB (biCompression=0) 24-bit frames in '00db'/'00dc' chunks. Rejected:
compressed codecs, other bit depths, multi-stream files, missing
hdrl/movi, truncated containers.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB -> bottom-up BGR rows, 4-byte-aligned stride."""
    h, w, _ = frame.shape
    stride = ((3 * w + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = frame[::-1, :, ::-1].reshape(h, 3 * w)
    return rows.tobytes()


def _dib_to_frame(body: bytes, w: int, h: int) -> np.ndarray:
    stride = ((3 * w + 3) // 4) * 4
    if len(body) < stride * h:
        raise ValueError("corrupt AVI: short frame chunk")
    rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(h, stride)
    return rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an uncompressed 24-bit
    BI_RGB AVI byte stream."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi expects (n_frames, h, w, 3) RGB")
    n, h, w, _ = frames.shape
    stride = ((3 * w + 3) // 4) * 4
    frame_size = stride * h
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size,
        0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(
        b"movi", b"".join(_chunk(b"00db", _frame_to_dib(f)) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed BI_RGB AVI -> ((n, h, w, 3) uint8 RGB
    frames, fps). Raises ValueError outside the documented scope and on
    corrupt containers."""
    data = bytes(data) if data is not None else b""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/AVI header")

    dims = None       # (w, h) from strf BITMAPINFOHEADER
    fps = 0
    n_streams = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal dims, fps, n_streams
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_at = pos + 8
            if body_at + size > end:
                raise ValueError("corrupt AVI: truncated chunk")
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)  # skip the list kind tag
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("corrupt AVI: short avih")
                fields = struct.unpack_from("<IIIIIII", data, body_at)
                n_streams = fields[6]
                if n_streams != 1:
                    raise ValueError("multi-stream AVI outside scope")
            elif cid == b"strh":
                if data[body_at : body_at + 4] != b"vids":
                    raise ValueError("non-video stream outside scope")
                scale, rate = struct.unpack_from("<II", data, body_at + 20)
                fps = rate // scale if scale else rate
            elif cid == b"strf":
                if size < 40:
                    raise ValueError("corrupt AVI: short BITMAPINFOHEADER")
                (_, w, h, _, bits, comp) = struct.unpack_from(
                    "<IiiHHI", data, body_at
                )
                if comp != 0:
                    raise ValueError(
                        "compressed AVI codecs outside scope (BI_RGB only)"
                    )
                if bits != 24:
                    raise ValueError("only 24-bit BI_RGB frames in scope")
                dims = (w, abs(h))
            elif cid[2:] in (b"db", b"dc"):
                if dims is None:
                    raise ValueError("corrupt AVI: frame chunk before strf")
                frames.append(_dib_to_frame(data[body_at : body_at + size], *dims))
            pos = body_at + size + (size % 2)

    walk(12, len(data))
    if dims is None:
        raise ValueError("corrupt AVI: no stream format header")
    if not frames:
        raise ValueError("corrupt AVI: no frame chunks")
    return np.stack(frames), fps
