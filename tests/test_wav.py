"""WAV (RIFF PCM) codec tests — hand-assembled containers (independent of
the encoder) for the parse paths, plus round-trips and scope rejects."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from scopus_spark.operators.wav import decode_wav, encode_wav


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(tag=1, ch=1, rate=8000, bits=16) -> bytes:
    ba = ch * (bits // 8)
    return _chunk(b"fmt ", struct.pack("<HHIIHH", tag, ch, rate, rate * ba, ba, bits))


def test_hand_built_mono16_vector():
    """Samples [-1, 0, 300, -32768] hand-packed little-endian, with an
    unknown LIST chunk between fmt and data that must be skipped."""
    pcm = struct.pack("<4h", -1, 0, 300, -32768)
    data = _riff(_fmt(), _chunk(b"LIST", b"INFOjunk"), _chunk(b"data", pcm))
    samples, rate = decode_wav(data)
    assert rate == 8000
    assert samples.shape == (4, 1)
    assert samples[:, 0].tolist() == [-1, 0, 300, -32768]


def test_hand_built_stereo_and_8bit():
    pcm = struct.pack("<6h", 1, 2, 3, 4, 5, 6)  # 3 stereo frames
    samples, _ = decode_wav(_riff(_fmt(ch=2), _chunk(b"data", pcm)))
    assert samples.tolist() == [[1, 2], [3, 4], [5, 6]]
    samples8, _ = decode_wav(
        _riff(_fmt(bits=8), _chunk(b"data", bytes([0, 128, 255])))
    )
    assert samples8[:, 0].tolist() == [0, 128, 255]


def test_odd_data_size_halfword_pad():
    """An 8-bit data chunk of odd length carries a pad byte; a chunk
    following it must still parse (alignment arithmetic)."""
    data = _riff(_fmt(bits=8), _chunk(b"data", bytes([7, 8, 9])))
    samples, _ = decode_wav(data)
    assert samples[:, 0].tolist() == [7, 8, 9]


def test_roundtrip_int16_and_uint8():
    rng = np.random.RandomState(2)
    v = rng.randint(-32768, 32768, size=50).astype(np.int16)
    dec, rate = decode_wav(encode_wav(v, sample_rate=44100))
    assert rate == 44100 and dec[:, 0].tolist() == v.tolist()
    u = rng.randint(0, 256, size=33).astype(np.uint8)
    dec8, _ = decode_wav(encode_wav(u, bits=8))
    assert dec8[:, 0].tolist() == u.tolist()
    st = rng.randint(-1000, 1000, size=(20, 2)).astype(np.int16)
    decs, _ = decode_wav(encode_wav(st))
    assert decs.tolist() == st.tolist()


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"RIFX" + b"\x00" * 20, "not a WAV"),
        (_riff(_fmt(tag=3), _chunk(b"data", b"\x00\x00")), "outside scope"),
        (_riff(_fmt(bits=24), _chunk(b"data", b"\x00" * 6)), "8/16-bit"),
        (_riff(_chunk(b"data", b"\x00\x00")), "data chunk before fmt"),
        (_riff(_fmt()), "no data chunk"),
        (_riff(_fmt())[:-3], "truncated"),
    ],
)
def test_scope_and_corruption_rejects(data, msg):
    with pytest.raises(ValueError, match=msg):
        decode_wav(data)


# --- hypothesis property: PCM container round-trip is byte-faithful -----------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        vals=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def test_property_pcm_roundtrip(vals, rate):
        v = np.array(vals, dtype=np.int16)
        dec, r = decode_wav(encode_wav(v, sample_rate=rate))
        assert r == rate and dec[:, 0].tolist() == vals

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
