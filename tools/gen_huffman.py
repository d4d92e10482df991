#!/usr/bin/env python3
"""Extract the AAC Huffman codebooks (ISO/IEC 14496-3 tables 4.A.2-4.A.13)
into a compact packed .npz consumed by aacjax.host.huffman.

The codebook contents are spec-mandated constants; we extract them from the
reference implementation's data tables (/root/reference/src/huffman.js:22-1418,
which transcribes the spec) rather than retyping ~1400 rows by hand.  Only
the numeric data is taken; the storage format, decoder algorithm, and all
code are original (LUT-based multi-bit decode, not the reference's linear
scan).

Run:  python3 tools/gen_huffman.py   (writes aacjax/host/huffman_books.npz)
"""
from __future__ import annotations

import pathlib
import re

import numpy as np

REF = pathlib.Path("/root/reference/src/huffman.js")
OUT = pathlib.Path(__file__).resolve().parent.parent / "aacjax" / "host" / "huffman_books.npz"


def parse_books(src: str) -> dict[str, np.ndarray]:
    books: dict[str, np.ndarray] = {}
    for m in re.finditer(r"const (HCB\w+) = \[(.*?)\n\];", src, re.S):
        name, body = m.group(1), m.group(2)
        rows = []
        for rm in re.finditer(r"\[([^\]]+)\]", body):
            rows.append([int(x) for x in rm.group(1).split(",")])
        width = len(rows[0])
        assert all(len(r) == width for r in rows), name
        books[name] = np.array(rows, dtype=np.int32)
    return books


def main() -> None:
    books = parse_books(REF.read_text())
    expected = [f"HCB{i}" for i in range(1, 12)] + ["HCB_SF"]
    assert sorted(books) == sorted(expected), sorted(books)
    # sanity: prefix-freeness of every book
    for name, tab in books.items():
        codes = {(int(r[0]), int(r[1])) for r in tab}
        assert len(codes) == len(tab), f"{name}: duplicate codewords"
        for ln, cw in codes:
            for ln2, cw2 in codes:
                if ln2 > ln and (cw2 >> (ln2 - ln)) == cw:
                    raise AssertionError(f"{name}: {cw:0{ln}b} prefixes {cw2:0{ln2}b}")
    np.savez_compressed(OUT, **books)
    print(f"wrote {OUT} with {len(books)} books:",
          {k: v.shape for k, v in sorted(books.items())})


if __name__ == "__main__":
    main()
