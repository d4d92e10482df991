"""Fused Pallas TPU kernel for the WHOLE post-TNS decode tail.

One kernel invocation processes a tile of TILE_C channels x all T frames
of the chunk and fuses every remaining pipeline stage around the IMDCT
matmuls (VERDICT r3 #7 — the step is stage-count-bound, not FLOP- or
HBM-bound; see ARCHITECTURE.md §7.1):

    decompress : block-scaled int16 spectra -> f32 (one exact 0/1-matmul
                 expands the per-16-bin scales; optional — f32 input too)
    IMDCT      : long [B,1024]@[1024,2048] + short 8x[.,128]@[128,256] (MXU)
    window     : per-row window vectors selected by one-hot matmuls
    intra-OLA  : the EIGHT_SHORT 8-sub-block overlap-add, branch-free select
    cross-OLA  : pcm[t] = first[t] + second[t-1] resolved INSIDE the kernel
                 (row-shift along the flattened [C*T] axis; frame 0 reads the
                 incoming overlap state via an exact one-hot matmul)
    conceal    : invalid (padding / post-error) frames deliver silence
    pack       : round/clip to int16 PCM (halves the D2H) or 1/32768 f32
    carry      : new per-channel overlap = second[last_valid] extracted with
                 a one-hot contraction; channels with no frames keep state

so the XLA program around it shrinks to: [dequant+TNS when present] ->
this kernel.  Everything the kernel needs fits in VMEM (~10 MB constants
incl. the [1024,2048] IMDCT matrix); each spectrum is read from HBM once
and each PCM sample written once — the kernel is HBM-minimal AND
stage-minimal.  Replaces the reference's per-sample JS loops (mdct.js,
fft.js, filter_bank.js, decoder.js:204-215 — SURVEY.md §2.9).

Numerics: every dot requests Precision.HIGHEST (bf16x3 — exact for the
0/1 selection/expansion matmuls since the decomposition represents f32
exactly; ~2e-5 relative on the big IMDCT matmul vs XLA, well inside the
1e-4 parity target).  Validated under Mosaic on TPU v5e against the XLA
path; interpret mode covers CPU CI (tests/test_pallas_tail.py).
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
TILE_C = 8    # channels per grid step (x T frames = the row tile)

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)


def _make_kernel(T: int, spec_i16: bool, out_int16: bool, has_short: bool):
    BT = TILE_C * T

    def kernel(*refs):
        it = iter(refs)
        spec_ref = next(it)
        scale_ref = next(it) if spec_i16 else None
        f_oh_ref, s_oh_ref, shape_oh_ref, prev_oh_ref = (
            next(it), next(it), next(it), next(it))
        flags_ref = next(it)          # [BT,128]: lane0 is_short, lane1 valid
        carry_ref = next(it)          # [BT,128]: lane c = carry row of ch c
        keep_ref = next(it)           # [TILE_C,128]: lane0 = keep overlap
        ov_ref = next(it)             # [TILE_C,1024] incoming overlap
        m_long_ref, m_short_ref = next(it), next(it)
        f_tab_ref, s_tab_ref = next(it), next(it)
        rise_ref, fall_ref = next(it), next(it)
        exp_ref = next(it) if spec_i16 else None
        pcm_ref, ovout_ref = next(it), next(it)

        if spec_i16:
            # exact decompression: scale rows [BT,128] (per-16-bin block
            # scales, zero-padded) expand to per-bin via a 0/1 matmul
            gain = _dot(scale_ref[:], exp_ref[:])        # [BT,1024]
            spec = spec_ref[:].astype(jnp.float32) * gain
        else:
            spec = spec_ref[:]                           # [BT,1024]

        long_out = _dot(spec, m_long_ref[:])             # [BT,2048]
        f_win = _dot(f_oh_ref[:], f_tab_ref[:])          # [BT,1024]
        s_win = _dot(s_oh_ref[:], s_tab_ref[:])
        first = long_out[:, :FRAME] * f_win
        second = long_out[:, FRAME:] * s_win

        if has_short:
            blocks = _dot(spec.reshape(BT * 8, 128), m_short_ref[:])
            blocks = blocks.reshape(BT, 8, 256)
            rise_cur = _dot(shape_oh_ref[:], rise_ref[:])    # [BT,128]
            rise_prev = _dot(prev_oh_ref[:], rise_ref[:])
            fall_cur = _dot(shape_oh_ref[:], fall_ref[:])
            # sub-window w occupies [448+128w, 448+128w+256): segment j of
            # 128 samples = rising-half[j] + falling-half[j-1] (static
            # segment algebra; Mosaic has no dynamic_update_slice)
            rises = jnp.concatenate(
                [rise_prev.reshape(BT, 1, 128),
                 jnp.broadcast_to(rise_cur.reshape(BT, 1, 128),
                                  (BT, 7, 128))], axis=1)
            a = blocks[:, :, :128] * rises
            b = blocks[:, :, 128:] * fall_cur.reshape(BT, 1, 128)
            mid = a[:, 1:, :] + b[:, :7, :]
            segs = jnp.concatenate([a[:, :1, :], mid, b[:, 7:, :]], axis=1)
            z448 = jnp.zeros((BT, W.MID), jnp.float32)
            t_short = jnp.concatenate(
                [z448, segs.reshape(BT, 9 * 128), z448], axis=1)
            sel = flags_ref[:, 0:1] != 0.0
            first = jnp.where(sel, t_short[:, :FRAME], first)
            second = jnp.where(sel, t_short[:, FRAME:], second)

        # ---- cross-frame overlap-add in the flattened row space:
        # prev[r] = second[r-1] within a channel; frame-0 rows read the
        # incoming overlap state instead (exact one-hot matmul).
        rows = jax.lax.broadcasted_iota(jnp.int32, (BT, 1), 0)
        t0 = (rows % T == 0).astype(jnp.float32)             # [BT,1]
        shifted = jnp.concatenate(
            [jnp.zeros((1, FRAME), jnp.float32), second[:-1]], axis=0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, 128), 1)
        oh0 = ((rows // T) == lanes).astype(jnp.float32) * t0  # [BT,128]
        ov_pad = jnp.concatenate(
            [ov_ref[:], jnp.zeros((128 - TILE_C, FRAME), jnp.float32)],
            axis=0)
        prev = shifted * (1.0 - t0) + _dot(oh0, ov_pad)
        pcm = (first + prev) * flags_ref[:, 1:2]             # conceal
        if out_int16:
            pcm_ref[:] = jnp.clip(jnp.round(pcm),
                                  -32768.0, 32767.0).astype(jnp.int16)
        else:
            pcm_ref[:] = pcm * jnp.float32(1.0 / 32768.0)

        # ---- overlap carry: channel c's new state = second[carry row c]
        part = jax.lax.dot_general(
            carry_ref[:], second, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # [128,1024]
        ovout_ref[:] = part[:TILE_C] + keep_ref[:, 0:1] * ov_ref[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _tables_f32():
    def pad_rows(tab, n):
        return np.pad(tab, ((0, 128 - n), (0, 0)))
    exp = np.zeros((128, FRAME), np.float32)
    for b in range(64):
        exp[b, b * 16:(b + 1) * 16] = 1.0
    return (W.imdct_long_matrix(), W.imdct_short_matrix(),
            pad_rows(W.first_half_windows(), 8),
            pad_rows(W.second_half_windows(), 8),
            pad_rows(W.short_rise(), 2), pad_rows(W.short_fall(), 2), exp)


def default_on() -> bool:
    """Serving default for the fused decode tail: Pallas ON when the
    backend is a real TPU (it wins the recorded hardware A/B — 4.7 ms
    fused vs 5.2 ms XLA per chunk, BASELINE.md round 4), XLA everywhere
    else (CPU CI, virtual meshes, oracle-exactness suites stay pinned
    to the bit-stable XLA pipeline).  AACJAX_PALLAS=1/0 force-overrides
    in both directions.  This is the ONE parse shared by the library
    (runtime.batch._device_step) and bench.py, so the same env value
    can never select different kernels in the two."""
    import os
    env = os.environ.get("AACJAX_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def supported(flags, C: int, T: int, F: int) -> bool:
    """Can the fused tail take this decode_spec_step configuration?

    spec_qsf (the native HE core's exact-i16 q/sf transfer) is fine: the
    two LUT dequant gathers stay in XLA and the kernel takes the f32
    spectra — same split as the TNS case.

    T is bounded: the kernel's tile footprint grows linearly with
    TILE_C*T (long_out alone is 8*T x 2048 f32, plus the short-window
    intermediates) on top of ~10 MB of constants; past T=64 a chunk
    could blow the 100 MB vmem_limit_bytes and fail Mosaic compilation
    at runtime — fall back to the XLA pipeline instead."""
    return (F == FRAME and C % TILE_C == 0 and T <= 64 and not flags.eld
            and not flags.has_pred and not flags.has_cce_post
            and not flags.has_cce_time)


def decode_tail(spec, spec_scale, f_idx, s_idx, shape_idx, prev_shape_idx,
                is_short, valid, last_valid, overlap_in, *,
                out_int16: bool, has_short: bool,
                interpret: bool = False):
    """Fused decode tail over a [C, T, 1024] chunk.

    spec: f32 [C,T,1024] (post-TNS / exact transfer), or int16 with
    spec_scale [C,T,64] per-16-bin block scales (compact transfer, fused
    decompression).  Index/flag arrays [C,T] i32/bool, last_valid [C] i32,
    overlap_in [C,1024] f32.  Returns (pcm [C,T,1024] int16 or f32,
    new_overlap [C,1024] f32).
    """
    C, T, F = spec.shape
    assert F == FRAME and C % TILE_C == 0
    # Mosaic is TPU-only; other backends (CPU tests, virtual meshes) run
    # the same kernel under the Pallas interpreter
    interpret = interpret or jax.default_backend() != "tpu"
    spec_i16 = spec_scale is not None
    B = C * T
    m_long, m_short, f_tab, s_tab, rise, fall, exp = _tables_f32()

    def onehot128(idx, n):
        oh = (idx.reshape(B)[:, None]
              == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(jnp.float32)
        return jnp.pad(oh, ((0, 0), (0, 128 - n)))

    f_oh = onehot128(f_idx.astype(jnp.int32), 8)
    s_oh = onehot128(s_idx.astype(jnp.int32), 8)
    shape_oh = onehot128(shape_idx.astype(jnp.int32), 2)
    prev_oh = onehot128(prev_shape_idx.astype(jnp.int32), 2)
    flags_col = jnp.stack(
        [is_short.reshape(B).astype(jnp.float32),
         valid.reshape(B).astype(jnp.float32)], axis=1)
    flags_col = jnp.pad(flags_col, ((0, 0), (0, 126)))
    # carry selector: row c*T + last_valid[c] lights lane (c % TILE_C);
    # a channel with no valid frame (last_valid < 0) selects nothing and
    # keeps its incoming overlap instead
    rows = jnp.arange(B, dtype=jnp.int32)
    ch = rows // T
    tpos = rows % T
    lv_row = jnp.where(last_valid >= 0, last_valid, -1)     # [C]
    is_carry = (tpos == lv_row[ch]).astype(jnp.float32)     # [B]
    carry_sel = (jnp.pad(
        ((ch % TILE_C)[:, None]
         == jnp.arange(TILE_C, dtype=jnp.int32)[None, :]).astype(jnp.float32),
        ((0, 0), (0, 128 - TILE_C))) * is_carry[:, None])
    keep_col = jnp.pad((last_valid < 0).astype(jnp.float32)[:, None],
                       ((0, 0), (0, 127)))

    BT = TILE_C * T
    grid = (C // TILE_C,)

    def row_spec(cols):
        return pl.BlockSpec((BT, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def ch_spec(cols):
        return pl.BlockSpec((TILE_C, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [row_spec(FRAME)]
    args = [spec.reshape(B, F)]
    if spec_i16:
        scale_pad = jnp.pad(spec_scale.reshape(B, 64), ((0, 0), (0, 64)))
        in_specs.append(row_spec(128))
        args.append(scale_pad)
    in_specs += [row_spec(128)] * 6 + [ch_spec(128), ch_spec(FRAME)]
    args += [f_oh, s_oh, shape_oh, prev_oh, flags_col, carry_sel,
             keep_col, overlap_in]
    consts = [m_long, m_short, f_tab, s_tab, rise, fall]
    if spec_i16:
        consts.append(exp)
    in_specs += [const_spec(c) for c in consts]
    args += [jnp.asarray(c) for c in consts]

    pcm, new_overlap = pl.pallas_call(
        _make_kernel(T, spec_i16, out_int16, has_short),
        grid=grid,
        in_specs=in_specs,
        out_specs=[row_spec(FRAME), ch_spec(FRAME)],
        out_shape=[
            jax.ShapeDtypeStruct((B, F), jnp.int16 if out_int16
                                 else jnp.float32),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
        ],
        # ~10 MB of constants (the 8 MB [1024,2048] IMDCT matrix dominates)
        # exceed the 16 MB default scoped-VMEM budget once Mosaic
        # double-buffers them; v5e has headroom — raise the cap explicitly
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=B * (1024 * 2048 * 2
                       + (8 * 128 * 256 * 2 if has_short else 0)),
            bytes_accessed=B * F * (2 if spec_i16 else 4) + B * F
            * (2 if out_int16 else 4) + 2 * C * F * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return pcm.reshape(C, T, F), new_overlap
