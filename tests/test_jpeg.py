"""Baseline JPEG codec tests (operators/jpeg.py, SURVEY §2.L tier).

The decoder vectors here are HAND-BUILT byte streams with Huffman tables
and quantization unlike anything the repo's encoder emits, and the AC
vector's expected pixels come from an independently-written direct-formula
IDCT — so an encoder/decoder bug pair cannot cancel (the round-5 Paeth
lesson: round-trips alone prove nothing about spec conformance).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from scopus_spark.operators.jpeg import ZIGZAG, decode_jpeg, encode_jpeg


def test_zigzag_is_the_t81_order():
    # spec-known prefix and suffix of the scan, plus permutation totality
    assert ZIGZAG[:16] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    ]
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]


def _seg(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _minimal_jpeg(qdc: int, scan_bits: str, dc_vals, ac_vals) -> bytes:
    """Hand-assemble a single-block 8x8 grayscale baseline JPEG with
    one-code-per-length canonical Huffman tables (bits=[1,1,...]) whose
    symbol assignment is given by dc_vals/ac_vals — deliberately unlike
    the encoder's fixed-length tables."""
    qt = bytes([qdc]) + bytes([1] * 63)  # zigzag order: DC slot first
    out = b"\xff\xd8"
    out += _seg(0xDB, b"\x00" + qt)
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes([1] * len(dc_vals) + [0] * (16 - len(dc_vals)))
        + bytes(dc_vals),
    )
    out += _seg(
        0xC4,
        bytes([0x10]) + bytes([1] * len(ac_vals) + [0] * (16 - len(ac_vals)))
        + bytes(ac_vals),
    )
    out += _seg(0xDA, bytes([1, 1, 0x00, 0x00, 0x3F, 0x00]))
    bits = scan_bits + "1" * (-len(scan_bits) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    return out


def test_hand_built_dc_only_vector():
    """DC category 4, value 9, quant 64 -> pixel 72+128 = 200 everywhere.
    Canonical one-per-length tables: DC symbol 4 gets code '0' (len 1);
    AC EOB (0x00) gets code '0' (len 1). Scan: '0' + '1001' + '0'."""
    data = _minimal_jpeg(qdc=64, scan_bits="0" + "1001" + "0",
                         dc_vals=[4], ac_vals=[0x00])
    px = decode_jpeg(data)
    assert px.shape == (8, 8)
    assert (px == 200).all(), px


def _direct_idct(coeffs: np.ndarray) -> np.ndarray:
    """T.81 IDCT written as the spec's direct double sum (independent of
    the codec's matrix formulation)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeffs[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_hand_built_ac_vector_against_direct_formula_idct():
    """One AC coefficient (zigzag position 1 = row 0, col 1) of value 13,
    DC 0, quant all covered by the hand table (DC slot 64 but DC=0). Scan:
    DC cat0 '0', AC (run0,size4) code '0' + '1101', then EOB '10'.
    Expected pixels from the independent direct-formula IDCT."""
    # tables: DC values [0] (cat 0, code '0'); AC values [0x04, 0x00]:
    # (0,4) gets code '0' (len 1), EOB gets '10' (len 2)
    data = _minimal_jpeg(qdc=64, scan_bits="0" + "0" + "1101" + "10",
                         dc_vals=[0], ac_vals=[0x04, 0x00])
    px = decode_jpeg(data)
    coeffs = np.zeros((8, 8))
    coeffs[0, 1] = 13.0  # dequant: 13 * qtable[0,1] = 13 * 1
    expected = np.clip(np.rint(_direct_idct(coeffs) + 128.0), 0, 255)
    assert (px == expected.astype(np.uint8)).all(), (px[0], expected[0])


def test_block_constant_roundtrip_is_exact():
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 256, size=33)
    img = np.repeat(np.repeat(vals.reshape(1, -1), 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_arbitrary_gray_roundtrip_within_quant1_tolerance():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_roundtrip_within_tolerance_and_crop():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(11, 13, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (11, 13, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_decode_pixels_dispatch_replicates_gray():
    from scopus_spark.operators.multimodal import JPEG_MIME, decode_pixels

    img = np.full((8, 16), 77, dtype=np.uint8)
    px = decode_pixels(encode_jpeg(img), JPEG_MIME)
    assert px.shape == (128, 3) and (px == 77).all()


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: d[:40], "corrupt"),  # truncated mid-segment
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1), "non-baseline"),
        (lambda d: b"\x00\x01" + d[2:], "not a JPEG"),
    ],
)
def test_scope_and_corruption_rejects(mutate, msg):
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = mutate(encode_jpeg(img))
    with pytest.raises(ValueError, match=msg):
        decode_jpeg(data)


def test_sampling_factors_beyond_two_rejected():
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    # sampling byte of component 1 lives at SOF0 payload offset 7
    data[i + 4 + 7] = 0x33
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(data))


def test_420_constant_macroblocks_near_lossless():
    """Per-16x16-macroblock constant color survives 4:2:0 within the
    YCbCr round-trip rounding (chroma subsampling itself is lossless on
    constant 2x2 cells)."""
    rng = np.random.RandomState(3)
    mb = rng.randint(0, 256, size=(2, 3, 3))
    img = np.repeat(np.repeat(mb, 16, 0), 16, 1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_420_gray_block_constant_is_exact():
    """The j34 contract: r=g=b input -> zero chroma -> constant Y blocks
    decode EXACTLY through the full 4:2:0 MCU interleave, including the
    bottom-pad crop (8-px-tall image against 16-px MCUs) and an odd block
    count (right-half Y pad in the final MCU)."""
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 256, size=13)
    g = np.repeat(np.repeat(vals.reshape(1, -1), 8, 0), 8, 1)
    img = np.stack([g, g, g], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert np.array_equal(dec, img)


def test_420_odd_dims_crop_and_tolerance():
    rng = np.random.RandomState(17)
    y = rng.randint(0, 256, size=(19, 21))
    img = np.stack([y, y, y], -1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert dec.shape == (19, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


# --- hypothesis property: block-constant exactness over the full byte range ---------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        vals=st.lists(st.integers(0, 255), min_size=1, max_size=40),
        sub=st.sampled_from(["gray444", "color420"]),
    )
    def test_property_block_constant_exact(vals, sub):
        """Any byte sequence staged as constant blocks survives quant=1
        baseline JPEG exactly, in both MCU geometries."""
        g = np.repeat(np.repeat(np.array(vals).reshape(1, -1), 8, 0), 8, 1)
        if sub == "gray444":
            img = g.astype(np.uint8)
            dec = decode_jpeg(encode_jpeg(img))
        else:
            img = np.stack([g, g, g], -1).astype(np.uint8)
            dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
        assert np.array_equal(dec, img)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
