"""operators/png.py — the dependency-free PNG codec behind j32.

The decoder is checked two ways: (1) hand-computed RFC-2083 filter vectors
(independent of our own encoder, so a matching encode/decode bug can't
hide), (2) random round-trips through the staging encoder across shapes
that exercise every filter type and the mod-256 wraparound.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from scopus_spark.operators.png import _paeth, decode_png, encode_png


def _chunk(t: bytes, d: bytes) -> bytes:
    return struct.pack(">I", len(d)) + t + d + struct.pack(
        ">I", zlib.crc32(t + d) & 0xFFFFFFFF
    )


def _build(w, h, rows_with_filters, colortype=2, bitdepth=8, plte=None, interlace=0):
    raw = bytearray()
    for f, row in rows_with_filters:
        raw.append(f)
        raw.extend(row)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def test_filter_sub_hand_vector():
    png = _build(2, 1, [(1, bytes([10, 20, 30, 5, 5, 5]))])
    assert decode_png(png).tolist() == [[10, 20, 30], [15, 25, 35]]


def test_filter_up_hand_vector():
    png = _build(
        2, 2,
        [(0, bytes([1, 2, 3, 4, 5, 6])), (2, bytes([10, 10, 10, 200, 200, 200]))],
    )
    assert decode_png(png).tolist() == [
        [1, 2, 3], [4, 5, 6], [11, 12, 13], [204, 205, 206]
    ]


def test_filter_average_hand_vector():
    # px0 = 8 + (0+100)//2 = 58; px1 = 7 + (58+50)//2 = 61
    png = _build(
        2, 2,
        [(0, bytes([100, 100, 100, 50, 50, 50])), (3, bytes([8, 8, 8, 7, 7, 7]))],
    )
    assert decode_png(png).tolist() == [
        [100, 100, 100], [50, 50, 50], [58, 58, 58], [61, 61, 61]
    ]


def test_filter_paeth_hand_vector():
    # px0: paeth(0,10,0)=10 -> 11; px1: paeth(11,20,10)=20 -> 22
    png = _build(
        2, 2,
        [(0, bytes([10, 10, 10, 20, 20, 20])), (4, bytes([1, 1, 1, 2, 2, 2]))],
    )
    assert decode_png(png).tolist() == [
        [10, 10, 10], [20, 20, 20], [11, 11, 11], [22, 22, 22]
    ]


def test_mod256_wraparound():
    png = _build(2, 1, [(1, bytes([100, 100, 100, 200, 200, 200]))])
    assert decode_png(png).tolist() == [[100, 100, 100], [44, 44, 44]]


def test_paeth_tiebreak_prefers_left():
    assert _paeth(
        np.array([5], np.uint8), np.array([5], np.uint8), np.array([0], np.uint8)
    ).tolist() == [5]


def test_paeth_tiebreak_pb_pc_tie_prefers_up():
    """RFC 2083 §6.6: on a pb==pc tie (a not winning) the predictor is b
    (up), NOT c (upper-left). a=125,b=200,c=150 -> pa=50, pb=25, pc=25:
    spec predicts 200. A c-on-tie decoder mispredicts 150 and decodes
    real libpng-encoded Paeth rows to silently wrong pixels."""
    assert _paeth(
        np.array([125], np.uint8),
        np.array([200], np.uint8),
        np.array([150], np.uint8),
    ).tolist() == [200]


def test_paeth_pb_pc_tie_external_vector():
    """End-to-end decode of a HAND-FILTERED (encoder-independent) PNG whose
    Paeth row hits the pb==pc tie, so encoder/decoder bug-cancellation
    cannot hide a tie-break error. Row 0 (None): pixels [150, 200].
    Row 1 (Paeth): x0 pred=paeth(0,150,0)=150, filt=(125-150)%256=231 ->
    125; x1 pred=paeth(125,200,150)=200 (the tie), filt=50 -> 250.
    A c-on-tie decoder would yield 200 here instead of 250."""
    png = _build(
        2, 2,
        [
            (0, bytes([150, 150, 150, 200, 200, 200])),
            (4, bytes([231, 231, 231, 50, 50, 50])),
        ],
    )
    assert decode_png(png).tolist() == [
        [150, 150, 150], [200, 200, 200], [125, 125, 125], [250, 250, 250]
    ]


def test_truncated_and_corrupt_chunks_raise_valueerror():
    """The documented contract is ValueError for anything malformed: a
    chunk whose declared length overruns the payload, a short IHDR, and
    an IDAT that is not a zlib stream must not escape as struct.error /
    zlib.error."""
    full = _build(2, 1, [(0, bytes([1, 2, 3, 4, 5, 6]))])
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_png(full[:20])  # cut mid-IHDR
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_png(full[:-14])  # drop IEND (12B) + 2B of IDAT's CRC
    with pytest.raises(ValueError, match="bad IHDR"):
        decode_png(
            b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", b"\x00" * 5)
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="bad IDAT"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", b"not zlib at all")
            + _chunk(b"IEND", b"")
        )


def test_grayscale_replicates():
    png = _build(3, 1, [(0, bytes([7, 8, 9]))], colortype=0)
    assert decode_png(png).tolist() == [[7, 7, 7], [8, 8, 8], [9, 9, 9]]


def test_rgba_strips_alpha():
    png = _build(1, 1, [(0, bytes([1, 2, 3, 255]))], colortype=6)
    assert decode_png(png).tolist() == [[1, 2, 3]]


def test_palette_resolves():
    png = _build(
        3, 1, [(0, bytes([2, 0, 1]))], colortype=3,
        plte=bytes([9, 9, 9, 10, 11, 12, 13, 14, 15]),
    )
    assert decode_png(png).tolist() == [[13, 14, 15], [9, 9, 9], [10, 11, 12]]


def test_unsupported_paths_raise_explicitly():
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_build(1, 1, [(0, bytes([0, 0]))], bitdepth=16))
    with pytest.raises(ValueError, match="interlacing"):
        decode_png(_build(1, 1, [(0, bytes([0, 0, 0]))], interlace=1))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_roundtrip_all_filters_random():
    rng = np.random.RandomState(42)
    for w, h in [(1, 1), (5, 1), (3, 7), (16, 16), (7, 11), (2, 5), (64, 1), (1, 9)]:
        px = rng.randint(0, 256, size=(w * h, 3), dtype=np.uint8)
        out = decode_png(encode_png(px, w, h))
        assert out.shape == px.shape and (out == px).all(), (w, h)


def test_multi_idat_chunks():
    """Decoders must concatenate split IDAT streams."""
    px = np.arange(30, dtype=np.uint8).reshape(10, 3) * 7 % 256
    full = encode_png(px, 5, 2)
    # split the single IDAT into two chunks byte-for-byte
    sig, rest = full[:8], full[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = sig
    for t, d in chunks:
        if t == b"IDAT":
            out += _chunk(b"IDAT", d[: len(d) // 2]) + _chunk(b"IDAT", d[len(d) // 2:])
        else:
            out += _chunk(t, d)
    assert (decode_png(out) == px).all()
