"""The batched device decode pipeline (JAX/XLA, TPU-first).

One jitted function processes a dense batch of channel-frames shaped
[C, T, 1024] — C channel slots (across all concurrent streams) by T
consecutive frames — through the full spectral tail of AAC-LC decoding:

  dequant -> M/S -> intensity -> coupling -> TNS -> IMDCT filterbank -> OLA

Design notes (vs the reference's per-sample JS loops, SURVEY.md §2.9):
  * The IMDCT is a single MXU matmul against a precomputed [1024, 2048]
    cosine matrix (closed form == the reference's twiddle+FFT pipeline,
    mdct.js:62-115; verified in tests/test_tables.py).  EIGHT_SHORT frames
    use a batched [128, 256] matmul over 8 sub-windows.  Both paths are
    computed for every frame and selected per-element — branch-free, and
    the extra FLOPs are negligible next to MXU throughput.
  * Windowing + overlap-add are per-bin multiplies against window rows
    gathered by (window_sequence, window_shape) index — no control flow.
  * The cross-frame overlap-add recurrence is resolved with one shifted
    add along the T axis (SURVEY.md §5.7): pcm[t] = first[t] + second[t-1].
  * TNS is the one true sequential recurrence (order <= 20 along <= 1024
    bins).  It runs as two lax.scan passes (forward + reversed filters)
    batched over the whole [C*T] mega-batch, with per-bin tap masking so
    filter regions and orders vary per element with no recompilation.
  * M/S, intensity, and coupling are row gathers + masked elementwise ops;
    pair/coupling indices address the C axis.

Everything is static-shaped; host-side packing (aacjax.runtime.pack) pads
C, T and filter/pair/coupling counts to fixed sizes.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from aacjax.kernels import windows as W

FRAME = 1024
TNS_SLOTS = 8
TNS_ORDER = 20


@dataclass(frozen=True)
class PipelineFlags:
    """Static specialization flags (each combination is a separate XLA
    program; the host picks the cheapest variant that covers the batch)."""
    has_stereo: bool = True
    has_tns: bool = False
    has_cce: bool = False
    out_int16: bool = False   # deliver PCM as int16 samples (halves D2H)
    use_pallas: bool = False  # fused Pallas synthesis kernel (TPU)
    # spec-path coupling entry lists (native parser fuses dependent
    # coupling on host except AFTER_TNS onto TNS'd targets, which must run
    # after the device TNS pass; AFTER_IMDCT couples time samples)
    has_cce_post: bool = False
    has_cce_time: bool = False
    # compact transfer: spectra arrive as per-row int16 fixed point with a
    # per-channel-frame f32 scale (half the H2D bytes, ~1.5e-5 rel error)
    spec_i16: bool = False
    # exact-i16 q/sf transfer (HE fast path): spectra arrive as RAW
    # quantized coefficients (int16, |q| <= 8191) + one scalefactor byte
    # per 4 bins; dequantization runs on-device through gathers into the
    # same pow(i,4/3)->f32 and 2^((sf-100)/4)->f32 LUTs the native parser
    # uses — bit-exact vs the host-fused f32 spectra at 2.25 B/bin H2D
    spec_qsf: bool = False
    # Main-profile backward prediction: a stateful device stage between
    # M/S and intensity (cross-frame [C,672,6] predictor state)
    has_pred: bool = False
    # any EIGHT_SHORT frame in the chunk?  When False the whole short
    # IMDCT path (8x einsum + intra-frame OLA + select) compiles away —
    # the common all-long case skips ~a third of the filterbank work
    has_short: bool = True
    # AAC-ELD (AOT 39): the low-delay filterbank replaces the standard
    # IMDCT path — one [N, 3N] synthesis matmul + a 3-segment shifted
    # overlap-add with a 2N-per-channel carry (tables.eld_synthesis_matrix)
    eld: bool = False


@functools.lru_cache(maxsize=None)
def _qsf_luts():
    """Dequant LUTs for the exact-i16 q/sf spectral transfer, numerically
    identical to the native parser's (double pow -> f32 cast, same libm):
    iq_lut[i] = i^(4/3) for i in [0,8192), sf_lut[s] = 2^((s-100)/4) for
    s in [0,256).  Embedded as XLA constants at trace time (33 KB)."""
    iq = np.power(np.arange(8192, dtype=np.float64),
                  4.0 / 3.0).astype(np.float32)
    sf = np.power(2.0, (np.arange(256, dtype=np.float64) - 100.0)
                  / 4.0).astype(np.float32)
    return iq, sf


@functools.lru_cache(maxsize=None)
def _consts(frame_len: int = FRAME):
    """Constant tables (numpy; embedded as XLA constants at trace time so
    they are safe to cache across jit traces).  frame_len is 1024, or 960
    in frameLengthFlag mode (all shapes scale with it)."""
    return dict(
        m_long=W.imdct_long_matrix(frame_len),    # [L, 2L]
        m_short=W.imdct_short_matrix(frame_len),  # [L/8, L/4]
        f_table=W.first_half_windows(frame_len),  # [8, L]
        s_table=W.second_half_windows(frame_len),  # [8, L]
        rise=W.short_rise(frame_len),             # [2, L/8]
        fall=W.short_fall(frame_len),             # [2, L/8]
    )


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------
def dequantize(quant: jax.Array, scale: jax.Array, noise: jax.Array) -> jax.Array:
    """spec = iq * scale + noise, where iq = sign(q) * |q|^(4/3) arrives
    pre-computed from the host packer (float32 of a float64 pow — the
    same rounding as the native parser and libavcodec, which keeps the
    bit-precision-sensitive Main-profile predictor in sync; the
    reference fuses a table lookup into its Huffman loop, ics.js:250-254).
    """
    return quant * scale + noise


def dequant_qsf(q: jax.Array, sf: jax.Array) -> jax.Array:
    """Exact-i16 q/sf -> f32 dequant as one-hot MATMULS, not gathers.

    Gathers of scalar f32 LUT entries run on the TPU's scalar/vector
    path and dominated the HE core step (40.1 ms standalone for a
    [256,16,1024] chunk).  Decomposing each lookup into two one-hot
    contractions — iq_lut [8192] as a [128,64] grid indexed by
    (|q|>>6, |q|&63), sf_lut [256] as [16,16] — turns the whole dequant
    into MXU work: 5.0 ms on the same shape, bit-exact (a one-hot row
    times an f32 table sums one exact product, so the result equals the
    gathered value; verified on hardware by tools/qsf_prof.py).  The
    float values are identical to the native parser's
    inverse_quant/sf_gain_index (native/aacparse.cc) — f32 casts of
    float64 pow — which keeps every oracle test bit-stable.

    q  [C,T,F]  int16 raw quantized coefficients, |q| <= 8191
    sf [C,T,F/4] uint8 scalefactor gain index per 4-bin group
    """
    iq_lut, sf_lut = _qsf_luts()
    hi_p = jax.lax.Precision.HIGHEST
    qi = q.astype(jnp.int32)
    a = jnp.abs(qi)
    tab_iq = jnp.asarray(iq_lut.reshape(128, 64))
    oh_hi = ((a >> 6)[..., None] == jnp.arange(128)).astype(jnp.float32)
    rows = jnp.einsum('...h,hl->...l', oh_hi, tab_iq, precision=hi_p)
    oh_lo = ((a & 63)[..., None] == jnp.arange(64)).astype(jnp.float32)
    m = jnp.sum(rows * oh_lo, axis=-1)
    m = jnp.where(qi < 0, -m, m)
    sfi = sf.astype(jnp.int32)
    tab_sf = jnp.asarray(sf_lut.reshape(16, 16))
    oh_sh = ((sfi >> 4)[..., None] == jnp.arange(16)).astype(jnp.float32)
    rows_s = jnp.einsum('...h,hl->...l', oh_sh, tab_sf, precision=hi_p)
    oh_sl = ((sfi & 15)[..., None] == jnp.arange(16)).astype(jnp.float32)
    gain = jnp.sum(rows_s * oh_sl, axis=-1)
    C, T, F = q.shape
    return (m.reshape(C, T, F // 4, 4) * gain[..., None]).reshape(C, T, F)


def stereo(spec: jax.Array, pair_l: jax.Array, pair_r: jax.Array,
           ms_mask: jax.Array, is_scale: jax.Array) -> jax.Array:
    """M/S butterfly + intensity stereo on channel pairs.

    spec [C,T,F]; pair_l/pair_r [P] channel indices; ms_mask [P,T,F]
    (0/1); is_scale [P,T,F] — nonzero where intensity applies; its value is
    the signed scale c * 2^(-pos/4) including the ms_used sign flip
    (decoder.js:337-404 semantics, expanded per-bin by the host packer).
    """
    l = spec[pair_l]
    r = spec[pair_r]
    m = ms_mask
    l2 = jnp.where(m != 0, l + r, l)
    r2 = jnp.where(m != 0, l - r, r)
    r3 = jnp.where(is_scale != 0, l2 * is_scale, r2)
    return spec.at[pair_l].set(l2).at[pair_r].set(r3)


def stereo_ms(spec, pair_l, pair_r, ms_mask) -> jax.Array:
    """M/S butterflies only (the Main-profile predictor sits between
    M/S and intensity, so the two halves run separately)."""
    l = spec[pair_l]
    r = spec[pair_r]
    l2 = jnp.where(ms_mask != 0, l + r, l)
    r2 = jnp.where(ms_mask != 0, l - r, r)
    return spec.at[pair_l].set(l2).at[pair_r].set(r2)


def stereo_is(spec, pair_l, pair_r, is_scale) -> jax.Array:
    """Intensity stereo only (reads the post-M/S, post-prediction left)."""
    l2 = spec[pair_l]
    r2 = spec[pair_r]
    r3 = jnp.where(is_scale != 0, l2 * is_scale, r2)
    return spec.at[pair_r].set(r3)


# -- Main-profile backward prediction ---------------------------------------
PRED_BINS = 672
_PRED_A = 0.953125      # 61/64
_PRED_ALPHA = 0.90625   # 29/32


def _flt16(x: jax.Array, mode: str) -> jax.Array:
    """IEEE-754 16-bit-mantissa truncation helpers (libavcodec
    flt16_round/even/trunc) — the predictor state is specified in this
    reduced precision so independent decoders stay bit-synchronized."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    if mode == "round":
        b = (b + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000)
    elif mode == "even":
        b = (b + jnp.uint32(0x7FFF)
             + ((b >> 16) & jnp.uint32(1))) & jnp.uint32(0xFFFF0000)
    else:  # trunc
        b = b & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def apply_prediction(spec: jax.Array, batch: dict,
                     pred_state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Backward-adaptive second-order lattice predictor per spectral bin
    (ISO/IEC 14496-3 §4.6.2, libavcodec `predict` numerics incl. the
    float16 state truncation).  Runs as one lax.scan over the frame axis
    — bins are independent, so each step is pure VPU elementwise math
    over [C, 672].

    spec [C,T,F] post-M/S; pred_state [C,672,6] = (r0, r1, cor0, cor1,
    var0, var1).  pred_mode: 0 none, 1 predict+update, 2 reset-all."""
    C, T, F = spec.shape
    kvec = jnp.arange(PRED_BINS)

    # Plain f32 multiplies: the flt16 state truncation bounds any
    # platform rounding differences vs libavcodec to sub-ULP-of-output
    # level (verified ~127 dB+ across chunkings, tests/test_main_profile);
    # catastrophic divergence only ever came from semantic mismatches.
    def fmul(x, y):
        return x * y

    def step(st, xs):
        s_t, mode, rg, nbins, used = xs
        r0, r1 = st[..., 0], st[..., 1]
        cor0, cor1 = st[..., 2], st[..., 3]
        var0, var1 = st[..., 4], st[..., 5]
        a = jnp.float32(_PRED_A)
        al = jnp.float32(_PRED_ALPHA)
        k1 = jnp.where(var0 > 1.0,
                       fmul(cor0, _flt16(a / var0, "even")), 0.0)
        k2 = jnp.where(var1 > 1.0,
                       fmul(cor1, _flt16(a / var1, "even")), 0.0)
        pv = _flt16(fmul(k1, r0) + fmul(k2, r1), "round")
        long_f = (mode == 1)[:, None]
        coef = s_t[:, :PRED_BINS] + fmul(
            pv, used * long_f.astype(jnp.float32))
        e0 = coef
        e1 = e0 - fmul(k1, r0)
        half = jnp.float32(0.5)
        cor1n = _flt16(fmul(al, cor1) + fmul(r1, e1), "trunc")
        var1n = _flt16(fmul(al, var1)
                       + fmul(half, fmul(r1, r1) + fmul(e1, e1)), "trunc")
        cor0n = _flt16(fmul(al, cor0) + fmul(r0, e0), "trunc")
        var0n = _flt16(fmul(al, var0)
                       + fmul(half, fmul(r0, r0) + fmul(e0, e0)), "trunc")
        r1n = _flt16(fmul(a, r0 - fmul(k1, e0)), "trunc")
        r0n = _flt16(fmul(a, e0), "trunc")
        # state updates only run for bins below this frame's pred_sfb_max
        # boundary, on long Main frames
        upd = long_f & (kvec[None, :] < nbins[:, None])
        # group reset applies AFTER the frame; short frames reset all
        rm = (((kvec[None, :] % 30) == (rg[:, None] - 1))
              & (rg[:, None] > 0) & long_f) | (mode == 2)[:, None]

        def sel(new, old, init):
            v = jnp.where(upd, new, old)
            return jnp.where(rm, jnp.float32(init), v)

        st_new = jnp.stack(
            [sel(r0n, r0, 0.0), sel(r1n, r1, 0.0),
             sel(cor0n, cor0, 0.0), sel(cor1n, cor1, 0.0),
             sel(var0n, var0, 1.0), sel(var1n, var1, 1.0)], axis=-1)
        out_t = jnp.concatenate([coef, s_t[:, PRED_BINS:]], axis=1)
        return st_new, out_t

    xs = (jnp.moveaxis(spec, 1, 0),
          jnp.moveaxis(batch['pred_mode'], 1, 0),
          jnp.moveaxis(batch['pred_reset'], 1, 0),
          jnp.moveaxis(batch['pred_nbins'], 1, 0),
          jnp.moveaxis(batch['pred_used'], 1, 0))
    new_state, out = jax.lax.scan(step, pred_state, xs)
    return jnp.moveaxis(out, 0, 1), new_state


def pred_state_init(C: int):
    st = np.zeros((C, PRED_BINS, 6), np.float32)
    st[..., 4:] = 1.0     # var0/var1 start at 1
    return jnp.asarray(st)


# -- float-float ("double-f32") helpers for the TNS recurrence --------------
# The AR feedback amplifies per-step rounding by the filter gain; with
# pathological (but legal) order-12 filters a plain f32 recursion can be
# ~1e-3 full-scale off the fp64 reference (FFmpeg's f32 TNS is ~0.4 off
# on the same content).  Keeping the recursion state as an unevaluated
# f32 hi+lo pair restores f64-class accuracy without device float64:
# products split exactly via mantissa bit-masking (fusion-proof, unlike
# Dekker's multiply-based split), sums via Knuth TwoSum (adds only, so
# FMA contraction cannot break it).

def _split_hi(a: jax.Array) -> jax.Array:
    """Top 12 mantissa bits of each f32 (exact, product-safe half)."""
    b = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(b & jnp.uint32(0xFFFFF000),
                                        jnp.float32)


def _two_prod(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """a*b = p + e exactly (f32 pair)."""
    p = a * b
    a_hi = _split_hi(a)
    a_lo = a - a_hi
    b_hi = _split_hi(b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _two_sum(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """a+b = s + e exactly (Knuth TwoSum, 6 adds)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _tns_directional_scan(x: jax.Array, lpc: jax.Array, start: jax.Array,
                          end: jax.Array) -> jax.Array:
    """All-pole (AR) TNS filtering along the bin axis, batched.

    x [B, F]; lpc [B, S, 20]; start/end [B, S] bin ranges (disjoint per
    element).  Implements y[n] = x[n] - sum_i lpc[i] * y[n-1-i] with taps
    masked to stay inside the active filter's range — exactly the
    spec-correct sequential recurrence (ISO/IEC 14496-3 §4.6.9.3; the
    reference's equivalent loop at tns.js:156-161 never executes due to
    the NaN-region bug, see SURVEY.md §7 quirk 2).  The recurrence runs
    in compensated float-float arithmetic (see helpers above) so the
    device output tracks the fp64 reference to ~1e-6 even on torture
    filters; AACJAX_TNS_FAST=1 opts into the plain f32 scan.
    """
    B, F = x.shape
    fast = os.environ.get("AACJAX_TNS_FAST", "0") == "1"

    def step_fast(hist, inputs):
        # hist: [B, 20] previous outputs, hist[:, i] = y[n-1-i]
        xn, n = inputs
        active = (start <= n) & (n < end)                  # [B, S]
        lpc_n = jnp.einsum('bs,bso->bo', active.astype(x.dtype), lpc)
        start_n = jnp.sum(jnp.where(active, start, 0), axis=1)  # [B]
        lags = jnp.arange(1, TNS_ORDER + 1, dtype=jnp.int32)
        tap_ok = (n - lags[None, :]) >= start_n[:, None]   # [B, 20]
        acc = jnp.sum(lpc_n * hist * tap_ok.astype(x.dtype), axis=1)
        yn = xn - acc
        hist = jnp.concatenate([yn[:, None], hist[:, :-1]], axis=1)
        return hist, yn

    def step_ff(carry, inputs):
        hist_hi, hist_lo = carry                           # [B, 20] each
        xn, n = inputs
        active = (start <= n) & (n < end)
        lpc_n = jnp.einsum('bs,bso->bo', active.astype(x.dtype), lpc)
        start_n = jnp.sum(jnp.where(active, start, 0), axis=1)
        lags = jnp.arange(1, TNS_ORDER + 1, dtype=jnp.int32)
        tap_ok = ((n - lags[None, :]) >= start_n[:, None]).astype(x.dtype)
        c = lpc_n * tap_ok                                 # exact mask*lpc? no:
        # lpc_n is a gather (sum over one active filter) -> exact; the
        # tap mask is 0/1 so c = lpc or 0, exact.
        p_hi, p_lo = _two_prod(c, hist_hi)                 # [B, 20] pairs
        p_lo = p_lo + c * hist_lo
        # compensated accumulation of the 20 taps + x_n
        s, e = -p_hi[:, 0], -p_lo[:, 0]
        for i in range(1, TNS_ORDER):
            s, e2 = _two_sum(s, -p_hi[:, i])
            e = e + e2 - p_lo[:, i]
        y_hi, e2 = _two_sum(xn, s)
        y_lo = e + e2
        # renormalize the pair
        y_hi, e3 = _two_sum(y_hi, y_lo)
        y_lo = e3
        hist_hi = jnp.concatenate([y_hi[:, None], hist_hi[:, :-1]], axis=1)
        hist_lo = jnp.concatenate([y_lo[:, None], hist_lo[:, :-1]], axis=1)
        return (hist_hi, hist_lo), y_hi

    ns = jnp.arange(F, dtype=jnp.int32)
    hist0 = jnp.zeros((B, TNS_ORDER), x.dtype)
    if fast:
        _, ys = jax.lax.scan(step_fast, hist0, (x.T, ns))
    else:
        _, ys = jax.lax.scan(step_ff, (hist0, hist0), (x.T, ns))
    return ys.T


def tns(spec: jax.Array, fwd_lpc, fwd_start, fwd_end,
        rev_lpc, rev_start, rev_end) -> jax.Array:
    """Apply TNS filters; reversed-direction filters run on the flipped
    spectrum with host-transformed coordinates (start' = F - end).

    spec [C,T,F]; filters [C,T,S,20] / [C,T,S].  Filter regions are
    disjoint within an element, so the passes combine by region masking.
    """
    C, T, F = spec.shape
    x = spec.reshape(C * T, F)

    def flat(a):
        return a.reshape((C * T,) + a.shape[2:])

    y_f = _tns_directional_scan(x, flat(fwd_lpc), flat(fwd_start),
                                flat(fwd_end))
    y_r = _tns_directional_scan(x[:, ::-1], flat(rev_lpc), flat(rev_start),
                                flat(rev_end))[:, ::-1]

    ns = jnp.arange(F, dtype=jnp.int32)[None, None, :]
    fwd_cover = jnp.any((flat(fwd_start)[:, :, None] <= ns)
                        & (ns < flat(fwd_end)[:, :, None]), axis=1)
    rev_s = F - flat(rev_end)
    rev_e = F - flat(rev_start)
    rev_cover = jnp.any((rev_s[:, :, None] <= ns) & (ns < rev_e[:, :, None]),
                        axis=1)
    out = jnp.where(fwd_cover, y_f, x)
    out = jnp.where(rev_cover, y_r, out)
    return out.reshape(C, T, F)


def filterbank(spec: jax.Array, f_idx: jax.Array, s_idx: jax.Array,
               shape_idx: jax.Array, prev_shape_idx: jax.Array,
               is_short: jax.Array,
               has_short: bool = True) -> tuple[jax.Array, jax.Array]:
    """IMDCT + windowing for every frame; returns (first, second) halves
    [C,T,1024] each.  first is this frame's direct contribution; second is
    the overlap carried into the next frame (filter_bank.js:88-204
    semantics for all four window sequences, linearized — see module doc).

    has_short is a trace-time flag: when the host knows the chunk has no
    EIGHT_SHORT frame, the whole short path compiles away.
    """
    C, T, F = spec.shape
    S = F // 8  # short-window length (128, or 120 in 960 mode)
    # fresh jnp constants per trace (cached numpy underneath)
    c = {k: jnp.asarray(v) for k, v in _consts(F).items()}

    # Long path: one MXU matmul for IMDCT(2F).
    long_out = jnp.einsum('ctk,kn->ctn', spec, c['m_long'],
                          precision=jax.lax.Precision.HIGHEST)  # [C,T,2F]
    f_win = c['f_table'][f_idx]                                 # [C,T,1024]
    s_win = c['s_table'][s_idx]
    first_long = long_out[..., :F] * f_win
    second_long = long_out[..., F:] * s_win
    if not has_short:
        return first_long, second_long

    # Short path: 8 x IMDCT(2S).
    blocks = jnp.einsum('ctwk,kn->ctwn', spec.reshape(C, T, 8, S),
                        c['m_short'],
                        precision=jax.lax.Precision.HIGHEST)    # [C,T,8,2S]
    rise_cur = c['rise'][shape_idx]                             # [C,T,S]
    rise_prev = c['rise'][prev_shape_idx]
    fall_cur = c['fall'][shape_idx]
    # Block 0's rising half uses the previous frame's window shape
    # (filter_bank.js:154: shortWindowsPrev).
    rises = jnp.concatenate(
        [rise_prev[:, :, None, :],
         jnp.broadcast_to(rise_cur[:, :, None, :], (C, T, 7, S))], axis=2)
    wb = jnp.concatenate([blocks[..., :S] * rises,
                          blocks[..., S:] * fall_cur[:, :, None, :]],
                         axis=-1)                               # [C,T,8,2S]
    t_short = jnp.zeros((C, T, 2 * F), spec.dtype)
    for w in range(8):
        off = W.mid(F) + S * w
        t_short = t_short.at[..., off:off + 2 * S].add(wb[..., w, :])

    sel = is_short[..., None]
    first = jnp.where(sel, t_short[..., :F], first_long)
    second = jnp.where(sel, t_short[..., F:], second_long)
    return first, second


@functools.lru_cache(maxsize=None)
def _eld_matrix(frame_len: int) -> np.ndarray:
    from aacjax import tables as T
    return T.eld_synthesis_matrix(frame_len).astype(np.float32)


def eld_synthesis(spec: jax.Array, overlap_in: jax.Array,
                  last_valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """AAC-ELD low-delay filterbank: y = spec @ M maps each frame's N
    coefficients to 4N output samples (window folded into M, identified
    sample-exactly against libavcodec — tables.eld_synthesis_matrix);
    frames accumulate at N-sample stride, so
        pcm[t] = y0[t] + y1[t-1] + y2[t-2] + y3[t-3]
    with a [C, 3N] carry (the three pending segments) across chunks."""
    C, T, N = spec.shape
    M = jnp.asarray(_eld_matrix(N))
    y = jnp.einsum('ctk,kn->ctn', spec, M,
                   precision=jax.lax.Precision.HIGHEST)      # [C,T,4N]
    y0, y1 = y[..., :N], y[..., N:2 * N]
    y2, y3 = y[..., 2 * N:3 * N], y[..., 3 * N:]
    ova = overlap_in[:, :N][:, None, :]
    ovb = overlap_in[:, N:2 * N][:, None, :]
    ovc = overlap_in[:, 2 * N:][:, None, :]
    z = jnp.zeros_like(ova)
    pcm = y0 + jnp.concatenate([ova, y1[:, :-1]], axis=1)
    if T >= 2:
        pcm = pcm + jnp.concatenate([z, ovb, y2[:, :-2]], axis=1)
    if T >= 3:
        pcm = pcm + jnp.concatenate([z, z, ovc, y3[:, :-3]], axis=1)
    # carry after the last real frame per channel (the recurrence
    # state (a,b,c) = pending segments due at the next 3 frames);
    # a -1 channel keeps its incoming state untouched
    ci = jnp.arange(C)
    lv = jnp.maximum(last_valid, 0)
    y2x = jnp.concatenate([ovb, y2], axis=1)       # [t] = y2[t-1]
    y3x1 = jnp.concatenate([ovc, y3], axis=1)      # [t] = y3[t-1]
    y3x2 = jnp.concatenate([z, ovc, y3], axis=1)   # [t] = y3[t-2]
    new_a = y1[ci, lv] + y2x[ci, lv] + y3x2[ci, lv]
    new_b = y2[ci, lv] + y3x1[ci, lv]
    new_c = y3[ci, lv]
    keep = (last_valid >= 0)[:, None]
    new_overlap = jnp.where(
        keep, jnp.concatenate([new_a, new_b, new_c], axis=1), overlap_in)
    return pcm, new_overlap


def overlap_add(first: jax.Array, second: jax.Array, overlap_in: jax.Array,
                last_valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Resolve the cross-frame OLA chain with one shifted add along T
    (SURVEY.md §5.7): pcm[t] = first[t] + second[t-1].

    last_valid [C]: index of the last real (non-padding) frame per channel,
    or -1 if the channel received no frames this chunk.  The carried-out
    overlap is taken at last_valid so trailing padding cannot corrupt
    stream state; a -1 channel keeps its incoming overlap untouched.
    """
    prev = jnp.concatenate([overlap_in[:, None, :], second[:, :-1, :]], axis=1)
    c_idx = jnp.arange(second.shape[0])
    carried = second[c_idx, jnp.maximum(last_valid, 0), :]
    new_overlap = jnp.where((last_valid >= 0)[:, None], carried, overlap_in)
    return first + prev, new_overlap


def couple_spectral(spec: jax.Array, src: jax.Array, dst: jax.Array,
                    gain: jax.Array) -> jax.Array:
    """Dependent coupling FMA: spec[dst] += gain * spec[src]
    (cce.js:130-158, with the spec-correct band bound — SURVEY.md §7
    quirk 3).  src/dst [Q]; gain [Q,T,F] (zero-padded slots are no-ops)."""
    return spec.at[dst].add(gain * spec[src])


def couple_time(pcm: jax.Array, src: jax.Array, dst: jax.Array,
                gain: jax.Array) -> jax.Array:
    """Independent coupling on time samples after the filterbank:
    pcm[dst] += gain * pcm[src]; gain [Q,T,1] scalar per frame."""
    return pcm.at[dst].add(gain * pcm[src])


# ---------------------------------------------------------------------------
# Full step
# ---------------------------------------------------------------------------
def decode_step(batch: dict, overlap_in: jax.Array,
                flags: PipelineFlags, pred_state: jax.Array | None = None):
    """Decode T frames for C channel slots.  Returns (pcm [C,T,1024] in the
    reference's 1/32768 float scale, new overlap [C,1024]) — plus the new
    predictor state when flags.has_pred."""
    spec = dequantize(batch['quant'], batch['scale'], batch['noise'])

    if flags.has_pred:
        # Main profile: the backward predictor sits between M/S and
        # intensity (libavcodec decode_cpe ordering)
        spec = stereo_ms(spec, batch['pair_l'], batch['pair_r'],
                         batch['ms_mask'])
        spec, pred_state = apply_prediction(spec, batch, pred_state)
        spec = stereo_is(spec, batch['pair_l'], batch['pair_r'],
                         batch['is_scale'])
    elif flags.has_stereo:
        spec = stereo(spec, batch['pair_l'], batch['pair_r'],
                      batch['ms_mask'], batch['is_scale'])

    if flags.has_cce:
        spec = couple_spectral(spec, batch['cce_src_pre'],
                               batch['cce_dst_pre'], batch['cce_gain_pre'])

    if flags.has_tns:
        spec = tns(spec, batch['tns_fwd_lpc'], batch['tns_fwd_start'],
                   batch['tns_fwd_end'], batch['tns_rev_lpc'],
                   batch['tns_rev_start'], batch['tns_rev_end'])

    if flags.has_cce:
        spec = couple_spectral(spec, batch['cce_src_post'],
                               batch['cce_dst_post'], batch['cce_gain_post'])

    if flags.eld:
        pcm, new_overlap = eld_synthesis(spec, overlap_in,
                                         batch['last_valid'])
    else:
        first, second = filterbank(spec, batch['f_idx'], batch['s_idx'],
                                   batch['shape_idx'],
                                   batch['prev_shape_idx'],
                                   batch['is_short'], flags.has_short)
        pcm, new_overlap = overlap_add(first, second, overlap_in,
                                       batch['last_valid'])

    if flags.has_cce:
        pcm = couple_time(pcm, batch['cce_src_time'], batch['cce_dst_time'],
                          batch['cce_gain_time'])

    if flags.out_int16:
        # native PCM sample units (the spectral path already produces
        # full-scale samples; the reference divides by 32768 only to
        # normalize floats — decoder.js:211)
        out = jnp.clip(jnp.round(pcm), -32768.0, 32767.0).astype(jnp.int16)
    else:
        # Output scale matches the reference's interleave loop
        # (decoder.js:211).
        out = pcm * jnp.float32(1.0 / 32768.0)
    if flags.has_pred:
        return out, new_overlap, pred_state
    return out, new_overlap


@functools.lru_cache(maxsize=None)
def jitted_decode_step(flags: PipelineFlags):
    """Compiled decode step; overlap buffer is donated (updated in place)."""
    if flags.has_pred:
        def fn_pred(batch, overlap, pred_state):
            return decode_step(batch, overlap, flags, pred_state)
        return jax.jit(fn_pred, donate_argnums=(1, 2))
    def fn(batch, overlap_in):
        return decode_step(batch, overlap_in, flags)
    return jax.jit(fn, donate_argnums=(1,))


def _unpack_spec_batch(batch: dict) -> dict:
    """Packed batch format: the native parser's buffers travel WHOLE
    (meta [C,T,6] i32, tns_lpc [C,T,2,8,20], tns_range [C,T,2,8,2],
    cce_*_idx [Q,3]) and are sliced here inside the jitted program.  One
    H2D transfer each instead of ~13 per-field arrays — on a
    latency-bound link every extra buffer costs a full RPC roundtrip
    (~30 ms on the dev tunnel ≈ 0.3 s/chunk of pure latency).  The
    per-field (unpacked) format still works for the python packer."""
    if 'meta' not in batch:
        return batch
    batch = dict(batch)
    m = batch.pop('meta')
    T = m.shape[1]
    batch['f_idx'] = m[:, :, 0]
    batch['s_idx'] = m[:, :, 1]
    batch['shape_idx'] = m[:, :, 2]
    batch['prev_shape_idx'] = m[:, :, 3]
    batch['is_short'] = m[:, :, 4].astype(bool)
    valid = m[:, :, 5] != 0
    batch['valid'] = valid
    batch['last_valid'] = jnp.where(
        valid.any(axis=1),
        (T - 1) - jnp.argmax(valid[:, ::-1], axis=1),
        -1).astype(jnp.int32)
    if 'tns_lpc' in batch:
        tl = batch.pop('tns_lpc')
        tr = batch.pop('tns_range')
        batch['tns_fwd_lpc'] = tl[:, :, 0]
        batch['tns_rev_lpc'] = tl[:, :, 1]
        batch['tns_fwd_start'] = tr[:, :, 0, :, 0]
        batch['tns_fwd_end'] = tr[:, :, 0, :, 1]
        batch['tns_rev_start'] = tr[:, :, 1, :, 0]
        batch['tns_rev_end'] = tr[:, :, 1, :, 1]
    for key in ('post', 'time'):
        k = f'cce_{key}_idx'
        if k in batch:
            idx = batch.pop(k)
            batch[f'cce_{key}_src'] = idx[:, 0]
            batch[f'cce_{key}_dst'] = idx[:, 1]
            batch[f'cce_{key}_t'] = idx[:, 2]
    if 'pred_meta' in batch:
        # Main-profile predictor feed (native parser emit_pred): meta
        # [C,T,3] i32 = (mode, reset_group, nbins) + per-bin used mask
        # shipped as u8 (H2D stays compact; the f32 cast runs on-device)
        pm = batch.pop('pred_meta')
        batch['pred_mode'] = pm[:, :, 0]
        batch['pred_reset'] = pm[:, :, 1]
        batch['pred_nbins'] = pm[:, :, 2]
        batch['pred_used'] = batch.pop('pred_used_u8').astype(jnp.float32)
    return batch


def decode_spec_step(batch: dict, overlap_in: jax.Array,
                     flags: PipelineFlags, pred_state: jax.Array | None = None):
    """Host-prep decode step: the native parser has already fused
    dequantization, PNS, M/S and intensity into final float32 spectra
    (native/aacparse.cc aacparse_batch_spec), quartering the host->device
    transfer.  The device runs the FLOP-heavy tail: TNS + IMDCT matmuls +
    windowed overlap-add (+ int16 PCM conversion)."""
    batch = _unpack_spec_batch(batch)
    from aacjax.kernels import pallas_tail as PT
    spec_arr = (batch['spec_q'] if flags.spec_qsf
                else batch['spec_i16'] if flags.spec_i16
                else batch['spec'])
    use_tail = flags.use_pallas and PT.supported(flags, *spec_arr.shape)
    if use_tail and flags.spec_i16 and not flags.has_tns:
        # fully fused fast path: the kernel decompresses the compact i16
        # spectra itself — the XLA program is ONE pallas_call
        pcm, new_overlap = PT.decode_tail(
            batch['spec_i16'], batch['spec_scale'], batch['f_idx'],
            batch['s_idx'], batch['shape_idx'], batch['prev_shape_idx'],
            batch['is_short'], batch['valid'], batch['last_valid'],
            overlap_in, out_int16=flags.out_int16,
            has_short=flags.has_short)
        return pcm, new_overlap
    if flags.spec_qsf:
        # exact-i16 q/sf -> f32 via one-hot MXU contractions (dequant_qsf)
        # — same float values the native parser's finalize_spec would
        # have produced (native/aacparse.cc inverse_quant/sf_gain_index)
        spec = dequant_qsf(batch['spec_q'], batch['spec_sf'])
    elif flags.spec_i16:
        # block-scaled int16 -> f32: scale [C,T,64] applies per 16-bin block
        q = batch['spec_i16']
        C_, T_, F_ = q.shape
        nb = batch['spec_scale'].shape[-1]
        spec = (q.astype(jnp.float32).reshape(C_, T_, nb, F_ // nb)
                * batch['spec_scale'][..., None]).reshape(C_, T_, F_)
    else:
        spec = batch['spec']
    if flags.has_pred:
        # Main-profile backward prediction: the native parser host-fuses
        # M/S (which precedes prediction) and falls back on intensity/CCE
        # content (which must follow it), so the stage runs first here —
        # same position in the tool chain as the python-packer path
        spec, pred_state = apply_prediction(spec, batch, pred_state)
    if flags.has_tns:
        spec = tns(spec, batch['tns_fwd_lpc'], batch['tns_fwd_start'],
                   batch['tns_fwd_end'], batch['tns_rev_lpc'],
                   batch['tns_rev_start'], batch['tns_rev_end'])
    if flags.has_cce_post:
        # AFTER_TNS dependent coupling: spec[dst,t] += gain * spec[src,t]
        # per entry (cce.js:130-158; zero-gain padding entries are no-ops)
        src, dst, tt = (batch['cce_post_src'], batch['cce_post_dst'],
                        batch['cce_post_t'])
        spec = spec.at[dst, tt].add(batch['cce_post_gain'] * spec[src, tt])
    C, T, F = spec.shape
    if flags.eld:
        pcm, new_overlap = eld_synthesis(spec, overlap_in,
                                         batch['last_valid'])
    elif use_tail:
        # fused synthesis + cross-frame OLA + conceal + pack (post-TNS /
        # exact-f32 variant; the decompressing variant returned above)
        pcm, new_overlap = PT.decode_tail(
            spec, None, batch['f_idx'], batch['s_idx'],
            batch['shape_idx'], batch['prev_shape_idx'],
            batch['is_short'], batch['valid'], batch['last_valid'],
            overlap_in, out_int16=flags.out_int16,
            has_short=flags.has_short)
        return pcm, new_overlap
    elif flags.use_pallas and (C * T) % 8 == 0 and F == 1024:
        from aacjax.kernels.pallas_synth import synthesis
        first, second = synthesis(
            spec.reshape(C * T, F),
            batch['f_idx'].reshape(C * T), batch['s_idx'].reshape(C * T),
            batch['shape_idx'].reshape(C * T),
            batch['prev_shape_idx'].reshape(C * T),
            batch['is_short'].reshape(C * T).astype(jnp.int32))
        first = first.reshape(C, T, F)
        second = second.reshape(C, T, F)
        pcm, new_overlap = overlap_add(first, second, overlap_in,
                                       batch['last_valid'])
    else:
        first, second = filterbank(spec, batch['f_idx'], batch['s_idx'],
                                   batch['shape_idx'],
                                   batch['prev_shape_idx'],
                                   batch['is_short'], flags.has_short)
        pcm, new_overlap = overlap_add(first, second, overlap_in,
                                       batch['last_valid'])
    if flags.has_cce_time:
        # AFTER_IMDCT independent coupling on time samples
        # (cce.js:121-128 intent; the coupling channel goes through its
        # own slot's IMDCT, matching the python packer path)
        src, dst, tt = (batch['cce_time_src'], batch['cce_time_dst'],
                        batch['cce_time_t'])
        pcm = pcm.at[dst, tt].add(
            batch['cce_time_gain'][:, None] * pcm[src, tt])
    # error concealment: frames that never parsed (padding / post-error)
    # deliver silence instead of garbage
    pcm = pcm * batch['valid'][..., None].astype(pcm.dtype)
    if flags.out_int16:
        out = jnp.clip(jnp.round(pcm), -32768.0, 32767.0).astype(jnp.int16)
    else:
        out = pcm * jnp.float32(1.0 / 32768.0)
    if flags.has_pred:
        return out, new_overlap, pred_state
    return out, new_overlap


@functools.lru_cache(maxsize=None)
def jitted_decode_spec_step(flags: PipelineFlags):
    if flags.has_pred:
        def fn_pred(batch, overlap_in, pred_state):
            return decode_spec_step(batch, overlap_in, flags, pred_state)
        return jax.jit(fn_pred, donate_argnums=(1, 2))
    def fn(batch, overlap_in):
        return decode_spec_step(batch, overlap_in, flags)
    return jax.jit(fn, donate_argnums=(1,))
