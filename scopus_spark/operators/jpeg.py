"""Baseline JPEG (ITU-T T.81 / JFIF) codec — pure stdlib + numpy, no codec
libraries. Closes the last stubbed branch of the multimodal decode tier
(operators/multimodal.py dispatched JPEG to a NotImplementedError through
round 6; PNG went real in round 5 via operators/png.py).

Scope (documented, enforced with ValueError like png.py's 16-bit/Adam7
rejects — explicit scope errors on real code paths, not stubs):

- DECODE: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
  components, 4:4:4 sampling (all factors 1x1), Huffman tables read from
  DHT (any valid tables, not just the ones our encoder writes), byte
  stuffing, DC prediction per component, JFIF YCbCr->RGB for 3-component
  scans. Rejected with ValueError: progressive/extended SOFs, arithmetic
  coding, 12-bit precision, subsampling, restart intervals, >2 quant
  table precision, truncated streams.
- ENCODE (staging tier): grayscale or RGB 4:4:4 with caller-supplied
  quantization (default all-ones). The encoder builds its OWN canonical
  Huffman tables (fixed code length: 12 DC symbols at 4 bits, 162 AC
  symbols at 8 bits — both lengths leave the all-ones code unused, as
  T.81 requires) and writes them to DHT; the decoder must read tables
  from the stream, so encoder and decoder share no table constant that
  could let a symbol-assignment bug cancel out.

Exactness contract the j33 registry key builds on: an image whose every
8x8 block is CONSTANT survives quant=1 baseline JPEG exactly — the block's
only nonzero coefficient is the DC term 8*(v-128), an exactly
representable integer, so quantize/round is lossless and the IDCT returns
v in every pixel (float error ~1e-13, killed by the final round). General
content is near-lossless at quant=1 (per-coefficient rounding <= 0.5);
tests pin that at a <=2/255 per-pixel tolerance, plus hand-built
byte-level vectors (independent of the encoder) for the DC path, the
zigzag order, and scope rejects.

The DCT here is the orthonormal 8x8 DCT-II as two matrix products
(M @ B @ M.T) — exactly T.81's FDCT/IDCT definition with the 1/4
C(u)C(v) scaling folded into M's normalization.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants ---------------------------------------------------------------------

SOI, EOI = 0xD8, 0xD9
SOF0, DHT, DQT, SOS, APP0, COM, DRI = 0xC0, 0xC4, 0xDB, 0xDA, 0xE0, 0xFE, 0xDD


def _zigzag() -> list[tuple[int, int]]:
    """The T.81 zigzag scan as (row, col) pairs, generated from the
    diagonal-walk definition instead of transcribed (odd diagonals walk
    row-increasing, even ones row-decreasing)."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in rows if s % 2 == 1 else reversed(list(rows)):
            order.append((r, s - r))
    return order


ZIGZAG = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    M = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    M[0, :] = 1.0
    return M * np.where(n[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


_M = _dct_matrix()

# Encoder Huffman tables: canonical, fixed code length, all-ones code
# unused (4 bits for the 12 DC categories, 8 bits for the 162 AC run/size
# symbols). Written to DHT; the decoder never assumes them.
_DC_VALUES = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 codes of length 4
_AC_VALUES = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
_AC_BITS = [0] * 7 + [162] + [0] * 8  # 162 codes of length 8


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- bit IO ------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1s to the byte edge


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: entropy stream exhausted")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _receive_extend(reader: _BitReader, t: int) -> int:
    """DC/AC magnitude decoding (T.81 RECEIVE + EXTEND)."""
    if t == 0:
        return 0
    v = reader.read_bits(t)
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for DC diffs and AC coefficients."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# --- encoder -----------------------------------------------------------------------


def _encode_blocks(
    plane: np.ndarray, qtable: np.ndarray, writer: "_CompWriter"
) -> None:
    h, w = plane.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            writer.block(plane[by : by + 8, bx : bx + 8], qtable)


class _CompWriter:
    """Per-component entropy writer (holds the DC predictor)."""

    def __init__(self, bw: _BitWriter, dc_codes, ac_codes) -> None:
        self.bw, self.dc, self.ac = bw, dc_codes, ac_codes
        self.pred = 0

    def block(self, block: np.ndarray, qtable: np.ndarray) -> None:
        coeffs = _M @ (block.astype(np.float64) - 128.0) @ _M.T
        q = np.rint(coeffs / qtable).astype(np.int64)
        zz = q[_ZZ_ROWS, _ZZ_COLS]
        # DC
        t, bits = _magnitude(int(zz[0]) - self.pred)
        self.pred = int(zz[0])
        code, length = self.dc[t]
        self.bw.write(code, length)
        if t:
            self.bw.write(bits, t)
        # AC
        nz = np.nonzero(zz[1:])[0]
        prev = 0
        for idx in nz:
            run = int(idx) - prev
            prev = int(idx) + 1
            while run > 15:
                code, length = self.ac[0xF0]  # ZRL
                self.bw.write(code, length)
                run -= 16
            t, bits = _magnitude(int(zz[1 + idx]))
            if t > 10:
                raise ValueError("coefficient magnitude exceeds baseline range")
            code, length = self.ac[(run << 4) | t]
            self.bw.write(code, length)
            self.bw.write(bits, t)
        if prev != 63:
            code, length = self.ac[0x00]  # EOB
            self.bw.write(code, length)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], values: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    if h == ph and w == pw:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean chroma subsampling (edge-padded to even dims first)."""
    h, w = plane.shape
    p = _pad_to(plane, h + h % 2, w + w % 2)
    return (
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )


def encode_jpeg(
    px: np.ndarray,
    qtable: np.ndarray | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a baseline
    JFIF file (default all-ones quantization — near-lossless, and EXACTLY
    lossless for block-constant content; see module docstring).
    ``subsampling``: '444' (every component 1x1) or '420' (Y at 2x2
    factors, 2x2-mean-subsampled chroma — the layout nearly every
    real-world JPEG uses)."""
    if qtable is None:
        qtable = np.ones((8, 8))
    qz = np.rint(qtable).astype(np.int64)
    if px.ndim == 2:
        planes = [px.astype(np.float64)]
        factors = [(1, 1)]
    elif px.ndim == 3 and px.shape[2] == 3:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        if subsampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
            planes = [planes[0], _subsample2(planes[1]), _subsample2(planes[2])]
        elif subsampling == "444":
            factors = [(1, 1)] * 3
        else:
            raise ValueError("subsampling must be '444' or '420'")
    else:
        raise ValueError("encode_jpeg expects (h,w) gray or (h,w,3) RGB")
    h, w = px.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("image dimensions out of JPEG 16-bit range")
    h_max = max(f[0] for f in factors)
    v_max = max(f[1] for f in factors)
    mcus_x, mcus_y = -(-w // (8 * h_max)), -(-h // (8 * v_max))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = bytes(int(qz[r, c]) for r, c in ZIGZAG)
    out += _marker(DQT, b"\x00" + zz_q)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, (hi, vi) in zip(range(1, ncomp + 1), factors):
        sof += bytes([cid, (hi << 4) | vi, 0])  # qtable 0
    out += _marker(SOF0, sof)
    out += _marker(DHT, _dht_payload(0, 0, _DC_BITS, _DC_VALUES))
    out += _marker(DHT, _dht_payload(1, 0, _AC_BITS, _AC_VALUES))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += _marker(SOS, sos)

    bw = _BitWriter()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALUES)
    writers = [_CompWriter(bw, dc_codes, ac_codes) for _ in planes]
    padded = [
        _pad_to(p, mcus_y * vi * 8, mcus_x * hi * 8)
        for p, (hi, vi) in zip(planes, factors)
    ]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for wtr, plane, (hi, vi) in zip(writers, padded, factors):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        wtr.block(plane[y0 : y0 + 8, x0 : x0 + 8], qz)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------------


def _read_u16(data: bytes, pos: int) -> int:
    if pos + 2 > len(data):
        raise ValueError("corrupt JPEG: truncated segment")
    return (data[pos] << 8) | data[pos + 1]


class _HuffTable:
    def __init__(self, bits: bytes, values: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | reader.read_bit()
            length += 1
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF byte stream to uint8 pixels: (h, w) for a
    single-component (grayscale) scan, (h, w, 3) RGB for a 3-component
    YCbCr scan. Raises ValueError for anything outside the documented
    baseline 4:4:4 scope and for corrupt/truncated streams."""
    data = bytes(data) if data is not None else b""
    if len(data) < 4 or data[0] != 0xFF or data[1] != SOI:
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, qid)])
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        tag = data[pos + 1]
        pos += 2
        if tag == EOI:
            raise ValueError("corrupt JPEG: EOI before scan data")
        if tag in (0x01,) or 0xD0 <= tag <= 0xD7:  # TEM / bare RSTn
            continue
        seg_len = _read_u16(data, pos)
        if pos + seg_len > len(data):
            raise ValueError("corrupt JPEG: truncated segment")
        body = data[pos + 2 : pos + seg_len]
        if tag == DQT:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables outside scope")
                if p + 65 > len(body):
                    raise ValueError("corrupt JPEG: truncated DQT")
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[tq] = q
                p += 65
        elif tag == DHT:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = body[p + 1 : p + 17]
                if len(bits) != 16:
                    raise ValueError("corrupt JPEG: truncated DHT")
                nvals = sum(bits)
                values = body[p + 17 : p + 17 + nvals]
                if len(values) != nvals:
                    raise ValueError("corrupt JPEG: truncated DHT")
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + nvals
        elif tag == SOF0:
            precision, h, w, nf = body[0], _read_u16(body, 1), _read_u16(body, 3), body[5]
            if precision != 8:
                raise ValueError("only 8-bit precision in baseline scope")
            if nf not in (1, 3):
                raise ValueError("only 1- or 3-component frames in scope")
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        "sampling factors beyond 2 (subsampling ratios other "
                        "than 4:4:4/4:2:2/4:2:0) outside scope"
                    )
                comps.append((cid, tq, hi, vi))
            if nf == 1 and comps[0][2:] != (1, 1):
                # single-component scans are non-interleaved: factors moot
                comps[0] = (comps[0][0], comps[0][1], 1, 1)
            frame = (h, w, comps)
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF (progressive/extended/arithmetic)")
        elif tag == DRI:
            if _read_u16(body, 0) != 0:
                raise ValueError("restart intervals outside scope")
        elif tag == SOS:
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF0")
            ns = body[0]
            if ns != len(frame[2]):
                raise ValueError("partial (multi-scan) files outside scope")
            scan_tables = {}
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                data, pos + seg_len, frame, qtables, htables, scan_tables
            )
        # APPn/COM and other tables: skipped
        pos += seg_len
    raise ValueError("corrupt JPEG: no SOS marker")


def _decode_scan(data, pos, frame, qtables, htables, scan_tables) -> np.ndarray:
    h, w, comps = frame
    # un-stuff the entropy segment (FF00 -> FF; any other marker ends it)
    clean = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            if i + 1 >= len(data):
                raise ValueError("corrupt JPEG: dangling FF")
            nxt = data[i + 1]
            if nxt == 0x00:
                clean.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart markers outside scope")
            break  # next real marker (EOI) ends the scan
        clean.append(b)
        i += 1
    reader = _BitReader(bytes(clean))

    h_max = max(c[2] for c in comps)
    v_max = max(c[3] for c in comps)
    mcus_x, mcus_y = -(-w // (8 * h_max)), -(-h // (8 * v_max))
    planes = [
        np.zeros((mcus_y * vi * 8, mcus_x * hi * 8)) for _, _, hi, vi in comps
    ]
    preds = [0] * len(comps)
    for cid, tq, _, _ in comps:
        if tq not in qtables:
            raise ValueError(f"corrupt JPEG: missing quant table {tq}")
        if cid not in scan_tables:
            raise ValueError(f"corrupt JPEG: component {cid} absent from scan")
        td, ta = scan_tables[cid]
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("corrupt JPEG: missing Huffman table")
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, tq, hi, vi) in enumerate(comps):
                td, ta = scan_tables[cid]
                for by in range(vi):
                    for bx in range(hi):
                        block = _decode_block(
                            reader, htables[(0, td)], htables[(1, ta)],
                            qtables[tq], preds, ci,
                        )
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample subsampled components to full resolution, then crop
    up = [
        np.repeat(np.repeat(p, v_max // vi, axis=0), h_max // hi, axis=1)
        for p, (_, _, hi, vi) in zip(planes, comps)
    ]
    out = [np.clip(np.rint(p[:h, :w]), 0, 255) for p in up]
    if len(out) == 1:
        return out[0].astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table, qtable, preds, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = dc_table.decode(reader)
    preds[ci] += _receive_extend(reader, t)
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = ac_table.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past end of block")
        zz[k] = _receive_extend(reader, s)
        k += 1
    coeffs = np.zeros((8, 8))
    coeffs[_ZZ_ROWS, _ZZ_COLS] = zz * qtable[_ZZ_ROWS, _ZZ_COLS]
    return _M.T @ coeffs @ _M + 128.0
