"""Window/IMDCT constant tables for the device filterbank.

All tables are generated from the closed forms in aacjax.tables (which
reproduce the reference's filter_bank.js:46-86 window generation and the
mdct.js twiddle pipeline, verified in tests/test_tables.py) and are laid
out for branch-free per-frame selection on device:

  F_TABLE[seq*2 + prev_shape]  — first-half window applied to imdct[:1024]
  S_TABLE[seq*2 + cur_shape]   — second-half window applied to imdct[1024:]
                                 (this becomes the next frame's overlap)
  RISE/FALL                    — 128-sample short-window halves for the
                                 EIGHT_SHORT intra-frame overlap-add

The composite LONG_START / LONG_STOP windows (ones/zeros padding around a
short-window transition, filter_bank.js:120-141 and 180-202) are baked into
F/S rows so the device code is a single gather + multiply per half.
"""
from __future__ import annotations

import functools

import numpy as np

from aacjax import tables

ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP = 0, 1, 2, 3

LONG_LEN = 1024
SHORT_LEN = 128
MID = (LONG_LEN - SHORT_LEN) // 2  # 448


@functools.lru_cache(maxsize=None)
def first_half_windows() -> np.ndarray:
    """[8, 1024] float32: F_TABLE[seq*2 + prev_shape]."""
    out = np.zeros((8, LONG_LEN), np.float64)
    for prev in (0, 1):
        wl = tables.long_window(prev)
        ws = tables.short_window(prev)
        out[ONLY_LONG * 2 + prev] = wl
        out[LONG_START * 2 + prev] = wl
        # EIGHT_SHORT first half is handled by the short path; keep zeros so
        # an accidental selection is loud in tests.
        out[LONG_STOP * 2 + prev] = np.concatenate(
            [np.zeros(MID), ws, np.ones(MID)])
    return out.astype(np.float32)


@functools.lru_cache(maxsize=None)
def second_half_windows() -> np.ndarray:
    """[8, 1024] float32: S_TABLE[seq*2 + cur_shape]."""
    out = np.zeros((8, LONG_LEN), np.float64)
    for cur in (0, 1):
        wl = tables.long_window(cur)
        ws = tables.short_window(cur)
        out[ONLY_LONG * 2 + cur] = wl[::-1]
        out[LONG_START * 2 + cur] = np.concatenate(
            [np.ones(MID), ws[::-1], np.zeros(MID)])
        out[LONG_STOP * 2 + cur] = wl[::-1]
    return out.astype(np.float32)


@functools.lru_cache(maxsize=None)
def short_rise() -> np.ndarray:
    """[2, 128] float32: rising short window per shape."""
    return np.stack([tables.short_window(0),
                     tables.short_window(1)]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def short_fall() -> np.ndarray:
    """[2, 128] float32: falling short window per shape."""
    return short_rise()[:, ::-1].copy()


@functools.lru_cache(maxsize=None)
def imdct_long_matrix() -> np.ndarray:
    """[1024, 2048] float32 — IMDCT as a single MXU matmul."""
    return tables.imdct_matrix(2048).astype(np.float32)


@functools.lru_cache(maxsize=None)
def imdct_short_matrix() -> np.ndarray:
    """[128, 256] float32."""
    return tables.imdct_matrix(256).astype(np.float32)
