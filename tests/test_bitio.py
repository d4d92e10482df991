"""Bit reader/writer tests."""
import numpy as np
import pytest

from aacjax.host.bitio import BitReader, BitstreamError, BitWriter


def test_read_msb_first():
    r = BitReader(bytes([0b10110100, 0b01100001]))
    assert r.read(1) == 1
    assert r.read(3) == 0b011
    assert r.read(4) == 0b0100
    assert r.read(8) == 0b01100001


def test_peek_does_not_advance():
    r = BitReader(bytes([0xAB, 0xCD]))
    assert r.peek(12) == 0xABC
    assert r.peek(12) == 0xABC
    assert r.read(16) == 0xABCD


def test_writer_reader_roundtrip():
    rng = np.random.default_rng(7)
    fields = [(int(rng.integers(0, 1 << n)), n)
              for n in rng.integers(1, 25, size=200)]
    w = BitWriter()
    for v, n in fields:
        w.write(v, int(n))
    r = BitReader(w.getvalue())
    for v, n in fields:
        assert r.read(int(n)) == v


def test_advance_align_seek():
    r = BitReader(bytes(range(16)))
    r.advance(3)
    assert r.bit_position == 3
    r.align()
    assert r.bit_position == 8
    r.align()  # already aligned: no-op
    assert r.bit_position == 8
    r.advance(41)
    assert r.bit_position == 49
    r.seek_bits(12)
    assert r.bit_position == 12
    assert r.read(4) == (bytes(range(16))[1] & 0x0F)


def test_read_past_end_raises():
    r = BitReader(b"\xff")
    r.read(8)
    with pytest.raises(BitstreamError):
        r.read(1)


def test_peek_padded():
    r = BitReader(b"\xf0")
    r.read(4)
    assert r.peek_padded(8) == 0b00000000
    r2 = BitReader(b"\xff")
    r2.read(4)
    assert r2.peek_padded(8) == 0b11110000


def test_bits_left():
    r = BitReader(b"\x00\x00\x00")
    assert r.bits_left == 24
    r.read(5)
    assert r.bits_left == 19
