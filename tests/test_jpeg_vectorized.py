"""r10 focused tests: the vectorized JPEG codec (stacked-block FDCT/IDCT,
packed-LUT Huffman decode) must be BIT-IDENTICAL to the straightforward
scalar rendering of T.81 it replaced. The reference here is a
self-contained transcription of the pre-r10 per-block encoder and
per-bit decoder (kept in the test, independent of the module under
test), run A/B against the module on the staged corpus shapes (j33/j34
block-constant content) and on random images."""

from __future__ import annotations

import numpy as np
import pytest

from scopus_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALUES,
    _DC_BITS,
    _DC_VALUES,
    _ZZ_COLS,
    _ZZ_ROWS,
    _BitWriter,
    _M,
    _canonical_codes,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)

# ---------------------------------------------------------------------------
# scalar REFERENCE entropy coder (the pre-vectorization shape)
# ---------------------------------------------------------------------------


class _RefCompWriter:
    def __init__(self, bw, dc_codes, ac_codes):
        self.bw, self.dc, self.ac = bw, dc_codes, ac_codes
        self.pred = 0

    def block(self, block, qtable):
        coeffs = _M @ (block.astype(np.float64) - 128.0) @ _M.T
        q = np.rint(coeffs / qtable).astype(np.int64)
        zz = q[_ZZ_ROWS, _ZZ_COLS]
        t, bits = _magnitude(int(zz[0]) - self.pred)
        self.pred = int(zz[0])
        code, length = self.dc[t]
        self.bw.write(code, length)
        if t:
            self.bw.write(bits, t)
        nz = np.nonzero(zz[1:])[0]
        prev = 0
        for idx in nz:
            run = int(idx) - prev
            prev = int(idx) + 1
            while run > 15:
                code, length = self.ac[0xF0]
                self.bw.write(code, length)
                run -= 16
            t, bits = _magnitude(int(zz[1 + idx]))
            code, length = self.ac[(run << 4) | t]
            self.bw.write(code, length)
            self.bw.write(bits, t)
        if prev != 63:
            code, length = self.ac[0x00]
            self.bw.write(code, length)


def _ref_entropy_bytes(planes, factors, mcus_y, mcus_x, qz) -> bytes:
    """The reference per-block MCU walk — returns the entropy segment
    bytes only (headers are shared construction, not under test)."""
    bw = _BitWriter()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALUES)
    writers = [_RefCompWriter(bw, dc_codes, ac_codes) for _ in planes]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for wtr, plane, (hi, vi) in zip(writers, planes, factors):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        wtr.block(plane[y0 : y0 + 8, x0 : x0 + 8], qz)
    bw.flush()
    return bytes(bw.out)


def _entropy_segment(jpeg_bytes: bytes) -> bytes:
    """Everything between SOS payload end and the trailing EOI."""
    i = jpeg_bytes.find(b"\xff\xda")
    assert i > 0
    seg_len = (jpeg_bytes[i + 2] << 8) | jpeg_bytes[i + 3]
    return jpeg_bytes[i + 2 + seg_len : -2]


class _RefBitReader:
    def __init__(self, data):
        self.data, self.pos, self._acc, self._n = data, 0, 0, 0

    def read_bit(self):
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("exhausted")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _ref_decode_gray(jpeg_bytes: bytes, h: int, w: int) -> np.ndarray:
    """Reference per-bit decode of a single-component file OUR encoder
    wrote (all-ones quant, the encoder's canonical tables — rebuilt here
    from the module constants, not read back from the stream, so the
    reference stays independent of the module's DHT parser)."""
    dc_codes = {v: k for k, v in _canonical_codes(_DC_BITS, _DC_VALUES).items()}
    ac_codes = {v: k for k, v in _canonical_codes(_AC_BITS, _AC_VALUES).items()}

    def huff_decode(reader, codes):
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | reader.read_bit()
            length += 1
            sym = codes.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid code")

    def receive_extend(reader, t):
        if t == 0:
            return 0
        v = reader.read_bits(t)
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

    # de-stuff
    raw = _entropy_segment(jpeg_bytes)
    clean = bytearray()
    i = 0
    while i < len(raw):
        clean.append(raw[i])
        if raw[i] == 0xFF and i + 1 < len(raw) and raw[i + 1] == 0x00:
            i += 2
        else:
            i += 1
    reader = _RefBitReader(bytes(clean))
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    plane = np.zeros((mcus_y * 8, mcus_x * 8))
    pred = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            zz = np.zeros(64, dtype=np.int64)
            t = huff_decode(reader, dc_codes)
            pred += receive_extend(reader, t)
            zz[0] = pred
            k = 1
            while k < 64:
                rs = huff_decode(reader, ac_codes)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                k += r
                zz[k] = receive_extend(reader, s)
                k += 1
            coeffs = np.zeros((8, 8))
            coeffs[_ZZ_ROWS, _ZZ_COLS] = zz
            plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                _M.T @ coeffs @ _M + 128.0
            )
    return np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# A/B gates
# ---------------------------------------------------------------------------


def _staged_gray(raw: bytes) -> np.ndarray:
    vals = np.frombuffer(raw, dtype=np.uint8)
    return np.repeat(np.repeat(vals.reshape(1, -1), 8, 0), 8, 1)


def test_encoder_entropy_bytes_match_scalar_reference_gray():
    rng = np.random.RandomState(1234)
    for trial in range(24):
        if trial < 12:  # the j33 staged shape: block-constant rows
            n = rng.randint(1, 300)
            img = _staged_gray(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
        else:  # arbitrary content, incl. edge-padded partial blocks
            h, w = rng.randint(1, 40), rng.randint(1, 40)
            img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        got = _entropy_segment(encode_jpeg(img))
        mcus_x, mcus_y = -(-img.shape[1] // 8), -(-img.shape[0] // 8)
        plane = np.pad(
            img.astype(np.float64),
            ((0, mcus_y * 8 - img.shape[0]), (0, mcus_x * 8 - img.shape[1])),
            mode="edge",
        )
        want = _ref_entropy_bytes(
            [plane], [(1, 1)], mcus_y, mcus_x, np.ones((8, 8), dtype=np.int64)
        )
        assert got == want, f"trial {trial}: entropy bytes diverge"


def test_encoder_entropy_bytes_match_scalar_reference_rgb444():
    rng = np.random.RandomState(99)
    for _ in range(6):
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        got = _entropy_segment(encode_jpeg(img))
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        mcus_x, mcus_y = -(-w // 8), -(-h // 8)
        padded = [
            np.pad(
                p, ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)), mode="edge"
            )
            for p in planes
        ]
        want = _ref_entropy_bytes(
            padded, [(1, 1)] * 3, mcus_y, mcus_x, np.ones((8, 8), dtype=np.int64)
        )
        assert got == want


def test_decoder_matches_scalar_reference_gray():
    rng = np.random.RandomState(4321)
    for trial in range(16):
        if trial < 8:
            n = rng.randint(1, 200)
            img = _staged_gray(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
        else:
            h, w = rng.randint(1, 32), rng.randint(1, 32)
            img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        enc = encode_jpeg(img)
        got = decode_jpeg(enc)
        want = _ref_decode_gray(enc, img.shape[0], img.shape[1])
        assert np.array_equal(got, want), f"trial {trial}: decoded pixels diverge"


def test_staged_roundtrips_remain_exact():
    rng = np.random.RandomState(7)
    for _ in range(10):
        n = rng.randint(1, 400)
        g = _staged_gray(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
        assert np.array_equal(decode_jpeg(encode_jpeg(g)), g)
        img = np.stack([g, g, g], axis=-1)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, subsampling="420")), img
        )


def test_corrupt_stream_errors_preserved():
    img = np.full((8, 16), 100, dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    # truncate inside the entropy segment -> exhausted
    sos = bytes(enc).find(b"\xff\xda")
    cut = sos + 12
    with pytest.raises(ValueError, match="exhausted|invalid Huffman"):
        decode_jpeg(bytes(enc[:cut]))
