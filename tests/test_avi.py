"""AVI (RIFF BI_RGB) codec tests — a hand-assembled container pins the DIB
quirks (bottom-up rows, BGR order, 4-byte stride) independently of the
encoder, plus round-trips and scope rejects."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from scopus_spark.operators.avi import decode_avi, encode_avi


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _headers(w: int, h: int, n: int, comp: int = 0, bits: int = 24) -> bytes:
    stride = ((bits // 8 * w + 3) // 4) * 4
    avih = struct.pack("<IIIIIIIIII4I", 100000, 0, 0, 0x10, n, 0, 1,
                       stride * h, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIi4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, 10, 0, n, stride * h, 0, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, comp,
                       stride * h, 0, 0, 0, 0)
    return _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))


def _avi(headers: bytes, movi_chunks: bytes) -> bytes:
    body = b"AVI " + headers + _list(b"movi", movi_chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_built_dib_quirks_vector():
    """A 2x1 frame hand-packed as the container stores it: bottom-up rows
    are trivial at h=1, but BGR order and the 4-byte stride pad are live.
    Pixels (RGB): [(1,2,3), (4,5,6)] -> DIB bytes B,G,R,B,G,R + 2 pad
    bytes (stride 8)."""
    dib = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    frames, fps = decode_avi(_avi(_headers(2, 1, 1), _chunk(b"00db", dib)))
    assert fps == 10
    assert frames.shape == (1, 1, 2, 3)
    assert frames[0, 0].tolist() == [[1, 2, 3], [4, 5, 6]]


def test_hand_built_bottom_up_rows():
    """2x2 frame: the FIRST stored row is the BOTTOM image row."""
    # stored: row0 = bottom = pixels (7,8,9),(10,11,12) as BGR; row1 = top
    dib = bytes([9, 8, 7, 12, 11, 10, 0, 0,   # bottom row + stride pad
                 3, 2, 1, 6, 5, 4, 0, 0])     # top row + stride pad
    frames, _ = decode_avi(_avi(_headers(2, 2, 1), _chunk(b"00db", dib)))
    assert frames[0, 0].tolist() == [[1, 2, 3], [4, 5, 6]]       # top
    assert frames[0, 1].tolist() == [[7, 8, 9], [10, 11, 12]]    # bottom


def test_roundtrip_multi_frame_odd_width():
    rng = np.random.RandomState(4)
    fr = rng.randint(0, 256, size=(6, 3, 5, 3)).astype(np.uint8)
    dec, fps = decode_avi(encode_avi(fr, fps=24))
    assert fps == 24 and np.array_equal(dec, fr)


def test_00dc_chunk_id_accepted():
    """Uncompressed frames may ship under '00dc' too."""
    fr = np.full((1, 1, 1, 3), 9, dtype=np.uint8)
    data = encode_avi(fr).replace(b"00db", b"00dc")
    dec, _ = decode_avi(data)
    assert np.array_equal(dec, fr)


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"RIFF\x04\x00\x00\x00WAVE", "not an AVI"),
        (_avi(_headers(2, 1, 1, comp=1), _chunk(b"00db", b"\x00" * 8)),
         "compressed AVI codecs"),
        (_avi(_headers(2, 1, 1, bits=32), _chunk(b"00db", b"\x00" * 8)),
         "24-bit"),
        (_avi(_headers(2, 1, 1), _chunk(b"00db", b"\x00" * 3)), "short frame"),
        (_avi(_headers(2, 1, 1), b""), "no frame chunks"),
        (_avi(b"", _chunk(b"00db", b"\x00" * 8)), "frame chunk before strf"),
    ],
)
def test_scope_and_corruption_rejects(data, msg):
    with pytest.raises(ValueError, match=msg):
        decode_avi(data)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 6), h=st.integers(1, 4), w=st.integers(1, 5),
        seed=st.integers(0, 1000),
    )
    def test_property_avi_roundtrip(n, h, w, seed):
        fr = (
            np.random.RandomState(seed)
            .randint(0, 256, size=(n, h, w, 3))
            .astype(np.uint8)
        )
        dec, _ = decode_avi(encode_avi(fr))
        assert np.array_equal(dec, fr)

except ImportError:  # pragma: no cover
    pass
