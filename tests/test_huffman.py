"""Huffman codebook tests: encode/decode roundtrip over every book,
escape paths, and sign handling (huffman.js:1441-1490 semantics)."""
import numpy as np
import pytest

from aacjax.host import huffman
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.testing.encoder import BOOK_LAV


def _roundtrip(book: int, values_list):
    w = BitWriter()
    for vals in values_list:
        huffman.encode_spectral(w, book, list(vals))
    r = BitReader(w.getvalue())
    out = []
    buf = [0, 0, 0, 0]
    n = 4 if book in huffman.QUAD_BOOKS else 2
    for _ in values_list:
        huffman.decode_spectral(r, book, buf)
        out.append(tuple(buf[:n]))
    return out


@pytest.mark.parametrize("book", range(1, 12))
def test_spectral_roundtrip_exhaustive_smallvals(book):
    rng = np.random.default_rng(book)
    n = 4 if book in huffman.QUAD_BOOKS else 2
    lav = 16 if book == 11 else BOOK_LAV[book]
    # signed books cover [-lav, lav]; unsigned books encode sign bits
    values = []
    for _ in range(500):
        if book == 11:
            vals = rng.integers(-20, 21, size=n)
        else:
            vals = rng.integers(-lav, lav + 1, size=n)
        values.append(tuple(int(v) for v in vals))
    assert _roundtrip(book, values) == values


def test_escape_large_values():
    """Book-11 escape sequences for magnitudes 16..8192."""
    cases = [(16, 0), (-16, 17), (100, -100), (8191, -8191), (2048, 31)]
    values = [tuple(c) for c in cases]
    assert _roundtrip(11, values) == values


def test_scalefactor_roundtrip_all_deltas():
    w = BitWriter()
    for d in range(121):
        huffman.encode_scalefactor(w, d)
    r = BitReader(w.getvalue())
    for d in range(121):
        assert huffman.decode_scalefactor(r) == d


def test_book_tables_shape():
    assert len(huffman.SPECTRAL_BOOKS) == 11
    for i, t in enumerate(huffman.SPECTRAL_BOOKS, 1):
        expect = 4 if i in huffman.QUAD_BOOKS else 2
        assert t.values.shape[1] == expect


def test_invalid_codeword_handling():
    """HCB3 is an incomplete code (escape-free unsigned book); feeding
    all-ones must either decode or raise, never loop forever."""
    table = huffman.SPECTRAL_BOOKS[2]
    # construct a window that maps to no codeword if any exists
    missing = np.where(table.lut < 0)[0]
    if len(missing):
        nbytes = (table.maxlen + 7) // 8
        window = int(missing[0]) << (8 * nbytes - table.maxlen)
        r = BitReader(window.to_bytes(nbytes, "big"))
        with pytest.raises(ValueError):
            table.decode(r)
