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


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for DC diffs and AC coefficients."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# --- encoder -----------------------------------------------------------------------


def _gather_blocks(
    plane: np.ndarray, mcus_y: int, mcus_x: int, hi: int, vi: int
) -> np.ndarray:
    """(N, 8, 8) blocks of a padded plane in the MCU interleave order the
    scan walks them: (my, mx, by, bx). One gather instead of N slice
    copies — the front half of the r10 per-task vectorization (guide
    §1.2 step 2): FDCT/quantize/zigzag then run as THREE whole-plane
    numpy ops over the stacked blocks instead of per-block matmuls
    (measured 5x on the j33 staging shape, byte-identical output on
    staged AND random content)."""
    R, C = plane.shape[0] // 8, plane.shape[1] // 8
    b4 = plane.reshape(R, 8, C, 8).transpose(0, 2, 1, 3)  # (R, C, 8, 8)
    my, mx, by, bx = np.meshgrid(
        np.arange(mcus_y), np.arange(mcus_x), np.arange(vi), np.arange(hi),
        indexing="ij",
    )
    rows = (my * vi + by).ravel()
    cols = (mx * hi + bx).ravel()
    return b4[rows, cols]


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
    eob_code, eob_len = ac_codes[0x00]
    zrl_code, zrl_len = ac_codes[0xF0]

    # Vectorized FDCT + quantize + zigzag per component, blocks stacked in
    # scan interleave order; DC diffs/categories precomputed whole-plane.
    # The entropy pass below then only walks precomputed rows — and for the
    # staged block-constant corpus (no AC coefficients) emits DC + EOB with
    # ~6 Python ops per block instead of two 8x8 matmuls + nonzero + slices.
    comp_zz: list[np.ndarray] = []
    comp_dc_t: list[np.ndarray] = []
    comp_dc_bits: list[np.ndarray] = []
    comp_has_ac: list[np.ndarray] = []
    for p, (hi, vi) in zip(planes, factors):
        padded = _pad_to(p, mcus_y * vi * 8, mcus_x * hi * 8)
        blocks = _gather_blocks(padded, mcus_y, mcus_x, hi, vi)
        coeffs = np.matmul(np.matmul(_M, blocks - 128.0), _M.T)
        q = np.rint(coeffs / qz).astype(np.int64)
        zz = q[:, _ZZ_ROWS, _ZZ_COLS]
        dc = zz[:, 0]
        diffs = dc - np.concatenate(([0], dc[:-1]))
        a = np.abs(diffs)
        # vectorized int bit_length — exact: np.log2 of an int <= 2^12 is
        # correctly rounded, so floor(log2(2^k)) == k precisely
        t = np.zeros(len(diffs), dtype=np.int64)
        nz_mask = a > 0
        t[nz_mask] = np.floor(np.log2(a[nz_mask])).astype(np.int64) + 1
        comp_zz.append(zz)
        comp_dc_t.append(t)
        comp_dc_bits.append(np.where(diffs >= 0, diffs, diffs + (1 << t) - 1))
        comp_has_ac.append((zz[:, 1:] != 0).any(axis=1))

    counters = [0] * ncomp
    write = bw.write
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            for ci, (hi, vi) in enumerate(factors):
                zz = comp_zz[ci]
                dct = comp_dc_t[ci]
                dcb = comp_dc_bits[ci]
                hac = comp_has_ac[ci]
                k = counters[ci]
                for _ in range(hi * vi):
                    t = int(dct[k])
                    code, length = dc_codes[t]
                    write(code, length)
                    if t:
                        write(int(dcb[k]), t)
                    if hac[k]:
                        row = zz[k]
                        prev = 0
                        for idx in np.nonzero(row[1:])[0]:
                            run = int(idx) - prev
                            prev = int(idx) + 1
                            while run > 15:
                                write(zrl_code, zrl_len)  # ZRL
                                run -= 16
                            tt, bits = _magnitude(int(row[1 + idx]))
                            if tt > 10:
                                raise ValueError(
                                    "coefficient magnitude exceeds baseline "
                                    "range"
                                )
                            code, length = ac_codes[(run << 4) | tt]
                            write(code, length)
                            write(bits, tt)
                        if prev != 63:
                            write(eob_code, eob_len)  # EOB
                    else:
                        write(eob_code, eob_len)  # EOB
                    k += 1
                counters[ci] = k
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------------


def _read_u16(data: bytes, pos: int) -> int:
    if pos + 2 > len(data):
        raise ValueError("corrupt JPEG: truncated segment")
    return (data[pos] << 8) | data[pos + 1]


# Packed Huffman decode LUTs keyed on the table's (bits, values) bytes —
# the staged corpus shares one table pair, so each Python worker builds
# them once (r10 guide §4.5: heavyweight init once, amortized per task).
_LUT_CACHE: dict[bytes, list[int]] = {}


def _huff_lut(bits: bytes, values: bytes) -> list[int]:
    """Decode LUT over a 16-bit peek: entry = (code length << 8) | symbol,
    0 where no code of any length prefixes the pattern. Because canonical
    codes are prefix-free, the first ``length`` bits alone determine the
    entry — one list index replaces the bit-by-bit canonical walk with
    identical symbol semantics. A Python list: C-array indexing beats
    numpy scalar access ~4x in the per-symbol loop."""
    key = bytes(bits) + b"\x00" + bytes(values)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = (length << 8) | values[k]
            code += 1
            k += 1
        code <<= 1
    packed = sym.tolist()
    _LUT_CACHE[key] = packed
    return packed


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
    htables: dict[tuple[int, int], tuple[bytes, bytes]] = {}
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
                htables[(tc, th)] = (bits, values)
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


def _destuff(data: bytes, pos: int) -> bytes:
    """Entropy segment from ``pos``: FF00 -> FF; any other marker ends it.
    Walks FF positions with bytes.find instead of per-byte Python."""
    out = bytearray()
    i = pos
    n = len(data)
    while i < n:
        j = data.find(b"\xff", i)
        if j < 0:
            out += data[i:]
            break
        out += data[i:j]
        if j + 1 >= n:
            raise ValueError("corrupt JPEG: dangling FF")
        nxt = data[j + 1]
        if nxt == 0x00:
            out.append(0xFF)
            i = j + 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            raise ValueError("restart markers outside scope")
        break  # next real marker (EOI) ends the scan
    return bytes(out)


def _decode_scan(data, pos, frame, qtables, htables, scan_tables) -> np.ndarray:
    """r10 vectorized scan decode (guide §1.2 step 2; pixel-identical to
    the per-bit/per-block shape on 640 A/B cases, 3-4x faster): the
    entropy pass keeps the bit buffer in LOCALS and decodes each symbol
    with one packed-LUT index; dequantize + IDCT then run as THREE
    whole-component numpy ops over the stacked coefficient rows instead
    of one matmul pair per block."""
    h, w, comps = frame
    clean = _destuff(data, pos)

    h_max = max(c[2] for c in comps)
    v_max = max(c[3] for c in comps)
    mcus_x, mcus_y = -(-w // (8 * h_max)), -(-h // (8 * v_max))
    for cid, tq, _, _ in comps:
        if tq not in qtables:
            raise ValueError(f"corrupt JPEG: missing quant table {tq}")
        if cid not in scan_tables:
            raise ValueError(f"corrupt JPEG: component {cid} absent from scan")
        td, ta = scan_tables[cid]
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("corrupt JPEG: missing Huffman table")
    comp_tabs = []
    for cid, tq, hi, vi in comps:
        td, ta = scan_tables[cid]
        comp_tabs.append(
            (_huff_lut(*htables[(0, td)]), _huff_lut(*htables[(1, ta)]), hi * vi)
        )

    comp_zz = [
        np.zeros((mcus_y * mcus_x * hi * vi, 64), dtype=np.int64)
        for _, _, hi, vi in comps
    ]
    counters = [0] * len(comps)
    preds = [0] * len(comps)

    ndata = len(clean)
    dpos = 0
    acc = 0
    nbits = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            for ci in range(len(comps)):
                dlut, alut, nper = comp_tabs[ci]
                zzc = comp_zz[ci]
                k0 = counters[ci]
                pred = preds[ci]
                for b in range(nper):
                    row = zzc[k0 + b]
                    # --- DC symbol
                    while nbits < 16 and dpos < ndata:
                        acc = (acc << 8) | clean[dpos]
                        dpos += 1
                        nbits += 8
                    peek = (
                        (acc >> (nbits - 16)) & 0xFFFF
                        if nbits >= 16
                        else (acc << (16 - nbits)) & 0xFFFF
                    )
                    e = dlut[peek]
                    ln = e >> 8
                    if ln == 0 or ln > nbits:
                        if nbits < 16:
                            raise ValueError(
                                "corrupt JPEG: entropy stream exhausted"
                            )
                        raise ValueError("corrupt JPEG: invalid Huffman code")
                    nbits -= ln
                    t = e & 0xFF
                    # --- DC magnitude (T.81 RECEIVE + EXTEND)
                    if t:
                        while nbits < t and dpos < ndata:
                            acc = (acc << 8) | clean[dpos]
                            dpos += 1
                            nbits += 8
                        if nbits < t:
                            raise ValueError(
                                "corrupt JPEG: entropy stream exhausted"
                            )
                        nbits -= t
                        v = (acc >> nbits) & ((1 << t) - 1)
                        pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                    row[0] = pred
                    # --- AC coefficients
                    k = 1
                    while k < 64:
                        while nbits < 16 and dpos < ndata:
                            acc = (acc << 8) | clean[dpos]
                            dpos += 1
                            nbits += 8
                        peek = (
                            (acc >> (nbits - 16)) & 0xFFFF
                            if nbits >= 16
                            else (acc << (16 - nbits)) & 0xFFFF
                        )
                        e = alut[peek]
                        ln = e >> 8
                        if ln == 0 or ln > nbits:
                            if nbits < 16:
                                raise ValueError(
                                    "corrupt JPEG: entropy stream exhausted"
                                )
                            raise ValueError(
                                "corrupt JPEG: invalid Huffman code"
                            )
                        nbits -= ln
                        rs = e & 0xFF
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError(
                                "corrupt JPEG: AC run past end of block"
                            )
                        while nbits < s and dpos < ndata:
                            acc = (acc << 8) | clean[dpos]
                            dpos += 1
                            nbits += 8
                        if nbits < s:
                            raise ValueError(
                                "corrupt JPEG: entropy stream exhausted"
                            )
                        nbits -= s
                        v = (acc >> nbits) & ((1 << s) - 1)
                        row[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                        k += 1
                preds[ci] = pred
                counters[ci] += nper

    planes = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        qt = qtables[tq]
        zz = comp_zz[ci]
        coeffs = np.zeros((zz.shape[0], 8, 8))
        coeffs[:, _ZZ_ROWS, _ZZ_COLS] = zz * qt[_ZZ_ROWS, _ZZ_COLS][None, :]
        blocks = np.matmul(np.matmul(_M.T, coeffs), _M) + 128.0
        plane = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8))
        R, C = plane.shape[0] // 8, plane.shape[1] // 8
        b4 = plane.reshape(R, 8, C, 8).transpose(0, 2, 1, 3)
        my, mx, by, bx = np.meshgrid(
            np.arange(mcus_y), np.arange(mcus_x), np.arange(vi), np.arange(hi),
            indexing="ij",
        )
        rows = (my * vi + by).ravel()
        cols = (mx * hi + bx).ravel()
        b4[rows, cols] = blocks  # fancy assignment writes through the view
        planes.append(plane)

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
