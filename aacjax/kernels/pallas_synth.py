"""Fused Pallas TPU kernel for the synthesis filterbank.

One kernel invocation computes, for a tile of channel-frames:

    long path : spec[TILE,1024] @ M_long[1024,2048]          (MXU)
    short path: spec.reshape(TILE*8,128) @ M_short[128,256]  (MXU)
    window    : per-row window vectors selected from the 8-row F/S tables
                via one-hot matmuls (no gathers, stays on MXU/VPU)
    OLA       : the EIGHT_SHORT intra-frame overlap-add of the 8 windowed
                sub-blocks, then branch-free select between paths

producing the frame's (first, second) 1024-sample halves.  The cross-frame
overlap-add (one shifted add along T) stays outside the kernel.

Everything the kernel needs — both IMDCT matrices (8.4 MB f32), the window
tables (40 KB) and a spec tile — fits in VMEM, so each channel-frame's
spectrum is read from HBM exactly once and its output written exactly
once: the kernel is HBM-minimal.  Replaces the reference's per-sample JS
loops (mdct.js, fft.js, filter_bank.js — SURVEY.md §2.9).

Status: optional path, off by default (AACJAX_PALLAS=1); validated under
Mosaic on hardware against the XLA filterbank for all four window
sequences.  Pitfall encoded below: every in-kernel dot must request
Precision.HIGHEST — Mosaic's default matmul is bf16 and silently
quantizes even one-hot selections (~0.4% error).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aacjax.kernels import windows as W

FRAME = 1024
TILE = 8  # channel-frames per grid step


def _synthesis_kernel(spec_ref, f_oh_ref, s_oh_ref, shape_oh_ref,
                      prev_oh_ref, is_short_ref,
                      m_long_ref, m_short_ref, f_tab_ref, s_tab_ref,
                      rise_ref, fall_ref,
                      first_ref, second_ref):
    spec = spec_ref[:]                                   # [TILE, 1024]

    # ---- long path: IMDCT(2048) as one MXU matmul
    long_out = jax.lax.dot_general(
        spec, m_long_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [TILE, 2048]

    # ---- short path: 8 x IMDCT(256)
    blocks = jax.lax.dot_general(
        spec.reshape(TILE * 8, 128), m_short_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [TILE*8, 256]
    blocks = blocks.reshape(TILE, 8, 256)

    # ---- per-row window vectors selected by one-hot matmuls (the one-hot
    # rows arrive precomputed and 128-lane padded; selection stays on the
    # MXU, no gathers).  HIGHEST precision is required: Mosaic's default
    # matmul is bf16 and would quantize the window values (~0.4%).
    def select(oh, tab):
        return jax.lax.dot_general(
            oh, tab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    f_win = select(f_oh_ref[:], f_tab_ref[:])            # [TILE, 1024]
    s_win = select(s_oh_ref[:], s_tab_ref[:])
    rise_cur = select(shape_oh_ref[:], rise_ref[:])      # [TILE, 128]
    rise_prev = select(prev_oh_ref[:], rise_ref[:])
    fall_cur = select(shape_oh_ref[:], fall_ref[:])

    # ---- EIGHT_SHORT windowing + intra-frame OLA, as static segment
    # algebra (Mosaic has no dynamic_update_slice): sub-window w occupies
    # [448+128w, 448+128w+256); segment j of 128 samples therefore equals
    # rising-half[j] + falling-half[j-1].
    rises = jnp.concatenate(
        [rise_prev.reshape(TILE, 1, 128),
         jnp.broadcast_to(rise_cur.reshape(TILE, 1, 128), (TILE, 7, 128))],
        axis=1)                                           # [TILE, 8, 128]
    a = blocks[:, :, :128] * rises                        # rising halves
    b = blocks[:, :, 128:] * fall_cur.reshape(TILE, 1, 128)
    mid = a[:, 1:, :] + b[:, :7, :]                       # segments 1..7
    segs = jnp.concatenate([a[:, :1, :], mid, b[:, 7:, :]], axis=1)
    zeros_448 = jnp.zeros((TILE, W.MID), jnp.float32)
    t_short = jnp.concatenate(
        [zeros_448, segs.reshape(TILE, 9 * 128), zeros_448], axis=1)

    first_long = long_out[:, :FRAME] * f_win
    second_long = long_out[:, FRAME:] * s_win

    sel = is_short_ref[:, 0:1] != 0.0                     # [TILE, 1]
    first_ref[:] = jnp.where(sel, t_short[:, :FRAME], first_long)
    second_ref[:] = jnp.where(sel, t_short[:, FRAME:], second_long)


@functools.lru_cache(maxsize=None)
def _tables_f32():
    return (W.imdct_long_matrix(), W.imdct_short_matrix(),
            W.first_half_windows(), W.second_half_windows(),
            W.short_rise(), W.short_fall())


def synthesis(spec: jax.Array, f_idx: jax.Array, s_idx: jax.Array,
              shape_idx: jax.Array, prev_shape_idx: jax.Array,
              is_short: jax.Array,
              interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Pallas filterbank over a flat batch.

    spec [B, 1024] float32; index arrays [B] int32.  Returns
    (first [B, 1024], second [B, 1024]).  B must be a multiple of TILE
    (the runtime's C*T batches are; pad otherwise).
    """
    B = spec.shape[0]
    assert B % TILE == 0, f"batch {B} not a multiple of {TILE}"
    m_long, m_short, f_tab, s_tab, rise, fall = _tables_f32()

    # one-hot selection rows, computed by XLA outside the kernel (fused,
    # negligible), padded to 128 lanes — Mosaic requires last-dim 128
    # alignment for reliable block layout
    def onehot128(idx, n):
        oh = (idx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
        return jnp.pad(oh, ((0, 0), (0, 128 - n)))

    def pad_rows(tab, n):
        return np.pad(tab, ((0, 128 - n), (0, 0)))

    f_oh = onehot128(f_idx.astype(jnp.int32), 8)
    s_oh = onehot128(s_idx.astype(jnp.int32), 8)
    shape_oh = onehot128(shape_idx.astype(jnp.int32), 2)
    prev_oh = onehot128(prev_shape_idx.astype(jnp.int32), 2)
    is_short_col = jnp.pad(is_short.astype(jnp.float32)[:, None],
                           ((0, 0), (0, 127)))
    f_tab128 = pad_rows(f_tab, 8)
    s_tab128 = pad_rows(s_tab, 8)
    rise128 = pad_rows(rise, 2)
    fall128 = pad_rows(fall, 2)

    grid = (B // TILE,)
    row_spec = pl.BlockSpec((TILE, FRAME), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def small_spec():
        return pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape),
                            memory_space=pltpu.VMEM)

    first, second = pl.pallas_call(
        _synthesis_kernel,
        grid=grid,
        in_specs=[
            row_spec,                     # spec
            small_spec(), small_spec(), small_spec(), small_spec(),
            small_spec(),
            const_spec(m_long), const_spec(m_short),
            const_spec(f_tab128), const_spec(s_tab128),
            const_spec(rise128), const_spec(fall128),
        ],
        out_specs=[
            pl.BlockSpec((TILE, FRAME), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, FRAME), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, FRAME), jnp.float32),
            jax.ShapeDtypeStruct((B, FRAME), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * (1024 * 2048 * 2 + 8 * 128 * 256 * 2),
            bytes_accessed=B * FRAME * 4 * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        spec, f_oh, s_oh, shape_oh, prev_oh, is_short_col,
        jnp.asarray(m_long), jnp.asarray(m_short),
        jnp.asarray(f_tab128), jnp.asarray(s_tab128),
        jnp.asarray(rise128), jnp.asarray(fall128),
    )
    return first, second
