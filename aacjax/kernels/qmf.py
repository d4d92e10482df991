"""SBR QMF filterbanks as batched matmuls (ISO/IEC 14496-3 §4.6.18.4).

The reference never implemented SBR (decoder.js:279-280 throws), so this
is spec-driven.  Both filterbanks are expressed TPU-first:

  * 32-band complex analysis of the core-rate signal: a static sliding-
    window gather + 5-way fold + one [64 -> 32] complex matmul per slot,
    batched over all slots of all channel-frames — no scan.
  * 64-band complex synthesis to the 2x output rate: one [64 -> 128]
    complex matmul per slot, then the 640-tap windowed sum expressed as a
    10-tap FIR over the slot axis (each slot's v-vector contributes to the
    next 10 output slots) — a static gather + weighted sum, no scan.

Cross-slot state (the analysis 288-sample history and the synthesis
9-slot v history) lives in HBM between chunks, exactly like the core
decoder's overlap buffer.

The 640-tap prototype filter is a spec constant with no closed form,
extracted from libavcodec (tools/extract_ffmpeg_tables.py; see the
extraction cross-validation in tests/test_tables.py).
"""
from __future__ import annotations

import functools
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

_SBR_NPZ = pathlib.Path(__file__).parent.parent / "host" / "sbr_tables.npz"

# Synthesis-FIR form: the 10-tap windowed sum over the slot axis runs
# as banded-Toeplitz MXU contractions by default (~35 GFLOP replacing
# ~6 GB of sliced HBM passes — the qmf.py lines were the top traffic
# block of the r5 B=1024 trace); AACJAX_QMF_FIR=slices restores the
# 10-static-slice form for on-hardware A/B.  Read at import (the two
# forms agree to float reassociation error, ~1e-7 rel).
_FIR_MATMUL = os.environ.get("AACJAX_QMF_FIR", "matmul") == "matmul"

ANA_BANDS = 32      # analysis bands (core rate)
SYN_BANDS = 64      # synthesis bands (2x rate)
ANA_TAPS = 320      # downsampled prototype length
SYN_TAPS = 640
ANA_HIST = ANA_TAPS - ANA_BANDS   # 288 samples carried between chunks
SYN_HIST = 9        # v-vectors carried between chunks


@functools.lru_cache(maxsize=None)
def prototype() -> np.ndarray:
    """[640] float64 QMF prototype filter c(n)."""
    return np.load(_SBR_NPZ)["qmf_window_us"].astype(np.float64)


@functools.lru_cache(maxsize=None)
def _analysis_consts():
    c = prototype()
    # Downsampled prototype c(2n); the x2 compensates the 2x band
    # upsampling so the analysis(32) -> synthesis(64) chain has unit
    # passthrough gain (verified in tests/test_qmf.py: ~62 dB
    # reconstruction, the prototype's stopband floor).
    win_ds = 2.0 * c[::2]                       # [320]
    n = np.arange(64, dtype=np.float64)
    k = np.arange(ANA_BANDS, dtype=np.float64)
    # X[k] = sum_n u(n) exp(j pi/64 (k+0.5)(2n-0.5)).  The exact phase
    # convention (paired with the synthesis bank's 2n+257) was pinned
    # against libavcodec: with this pair, aacjax's whole SBR chain matches
    # FFmpeg's HE-AAC output sample-exactly (~130 dB, float32 floor) in
    # tests/test_sbr.py; self-reconstruction sits at the prototype's
    # stopband (~62 dB, tests/test_qmf.py).
    ang = np.pi / 64.0 * (k[:, None] + 0.5) * (2.0 * n[None, :] - 0.5)
    m = np.exp(1j * ang)                        # [32, 64]
    return (win_ds.astype(np.float32),
            m.real.astype(np.float32).T,        # [64, 32]
            m.imag.astype(np.float32).T)


@functools.lru_cache(maxsize=None)
def _analysis_device_consts():
    """_analysis_consts re-laid-out for the gather-free device path: the
    device builds 64-wide sample blocks in NATURAL (ascending time)
    order, while the filterbank wants them newest-first — fold that
    reversal into the constants here (host-side numpy) so nothing is
    reversed or gathered on device."""
    win_ds, mr, mi = _analysis_consts()
    win_flip = np.stack([win_ds[64 * f:64 * (f + 1)][::-1]
                         for f in range(5)])    # [5, 64]
    return (np.ascontiguousarray(win_flip),
            np.ascontiguousarray(mr[::-1]),     # [64, 32], rows flipped
            np.ascontiguousarray(mi[::-1]))


@functools.lru_cache(maxsize=None)
def _synthesis_consts():
    c = prototype()
    n = np.arange(128, dtype=np.float64)
    k = np.arange(SYN_BANDS, dtype=np.float64)
    # v(n) = 1/64 Re{ sum_k X[k] exp(j pi/128 (k+0.5)(2n+257)) } — the
    # conjugate pair of the analysis phase above (see that comment)
    ang = np.pi / 128.0 * (k[None, :] + 0.5) * (2.0 * n[:, None] + 257.0)
    m = np.exp(1j * ang) / 64.0                 # [128, 64]
    # g-selection: the windowed 640 taps pick alternating half-blocks of
    # the 1280-sample v FIFO:  g(128i + n)      = v(256i + n)
    #                          g(128i + 64 + n) = v(256i + 192 + n), n<64
    gsel = np.zeros(SYN_TAPS, np.int64)
    for i in range(5):
        gsel[128 * i:128 * i + 64] = 256 * i + np.arange(64)
        gsel[128 * i + 64:128 * i + 128] = 256 * i + 192 + np.arange(64)
    # out(n) = sum_{j<10} w(64j + n);  w = g * c.  FIFO entry v(q) for
    # q in [0,1280) lives in v-vector (slot - q//128) at row q%128, so tap
    # (j, n) reads v[slot - jj][row] weighted by c[64j + n] where
    # q = gsel[64j + n], jj = q // 128, row = q % 128.
    taps_j = np.zeros((10, 64), np.int64)   # which past slot (0..9)
    taps_r = np.zeros((10, 64), np.int64)   # which v row (0..127)
    taps_w = np.zeros((10, 64), np.float64)
    for j in range(10):
        for nn in range(64):
            q = gsel[64 * j + nn]
            taps_j[j, nn] = q // 128
            taps_r[j, nn] = q % 128
            taps_w[j, nn] = c[64 * j + nn]
    return (m.real.astype(np.float32), m.imag.astype(np.float32),
            taps_j, taps_r, taps_w.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _syn_fir_mats(S: int):
    """Banded FIR matrices for the matmul synthesis form: tap j of
    output slot s reads v row s-j (or history row j-s-1 when s < j) in
    channel half j&1, weighted by the prototype window row taps_w[j]."""
    _, _, _taps_j, _taps_r, taps_w = _synthesis_consts()
    w = np.asarray(taps_w, np.float64)                       # [10, 64]
    Wv = np.zeros((2, 64, S, S), np.float64)
    Wh = np.zeros((2, 64, S, SYN_HIST), np.float64)
    for j in range(10):
        half = j & 1
        for s in range(S):
            k = s - j
            if k >= 0:
                Wv[half, :, s, k] += w[j]
            else:
                Wh[half, :, s, j - s - 1] += w[j]
    f = np.float32
    # numpy out (jnp constants created at the use site): a cached jnp
    # array built inside one jit trace would leak its tracer into the
    # next (the _consts rule, ps_batch.py)
    return (Wv[0].astype(f), Wv[1].astype(f),
            Wh[0].astype(f), Wh[1].astype(f))


def analysis(x: jax.Array, hist: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """32-band complex QMF analysis.

    x [B, N] core-rate samples (N % 32 == 0); hist [B, 288] carried
    samples (the previous chunk's tail).  Returns (X_re, X_im) [B, S, 32]
    with S = N // 32 slots, plus the new history."""
    win_flip, mr, mi = _analysis_device_consts()
    B, N = x.shape
    S = N // ANA_BANDS
    buf = jnp.concatenate([hist, x], axis=1)          # [B, 288 + N]
    # Slot s consumes the 320 newest samples buf[32s : 32s+320] (newest
    # first), folded into 64-wide blocks.  Fold f covers samples
    # buf[32s + 256-64f : 32s + 320-64f]: 64-wide windows at stride 32,
    # i.e. adjacent row pairs of the [S+9, 32] reshape — static slices
    # and concats only, no gather (per-element gathers serialize on TPU;
    # the reversal lives in the pre-flipped constants).
    c = buf.reshape(B, S + 9, ANA_BANDS)
    u = None
    for f in range(5):
        d = (256 - 64 * f) // ANA_BANDS
        blk = jnp.concatenate([c[:, d:d + S], c[:, d + 1:d + 1 + S]],
                              axis=2)                 # [B, S, 64]
        term = blk * jnp.asarray(win_flip[f])
        u = term if u is None else u + term
    xr = jnp.einsum('bsn,nk->bsk', u, jnp.asarray(mr),
                    precision=jax.lax.Precision.HIGHEST)
    xi = jnp.einsum('bsn,nk->bsk', u, jnp.asarray(mi),
                    precision=jax.lax.Precision.HIGHEST)
    new_hist = buf[:, -ANA_HIST:]
    return xr, xi, new_hist


def synthesis(xr: jax.Array, xi: jax.Array,
              vhist: jax.Array) -> tuple[jax.Array, jax.Array]:
    """64-band real-output QMF synthesis.

    xr/xi [B, S, 64]; vhist [B, 9, 128] carried v-vectors (previous
    slots, vhist[:, 0] = most recent).  Returns (pcm [B, S*64], new
    vhist)."""
    mr, mi, taps_j, taps_r, taps_w = _synthesis_consts()
    B, S, _ = xr.shape
    v = (jnp.einsum('bsk,nk->bsn', xr, jnp.asarray(mr),
                    precision=jax.lax.Precision.HIGHEST)
         - jnp.einsum('bsk,nk->bsn', xi, jnp.asarray(mi),
                      precision=jax.lax.Precision.HIGHEST))  # [B, S, 128]
    # Tap j of slot s reads vall[:, 9 + s - j, n + 64*(j&1)] with
    # vall = [reversed vhist; v] (the gsel block structure collapses to
    # taps_j[j,:] == j and taps_r[j,:] == n + 64*(j odd) — asserted in
    # _synthesis_consts' construction by tests/test_qmf.py).
    if _FIR_MATMUL and S >= SYN_HIST:
        # Banded-Toeplitz contraction per channel half: pcm[b,s,n] =
        # sum_k Wv[n,s,k] v[b,k,n(+64)] + sum_h Wh[n,s,h] vhist[b,h,.]
        # — the FIR's ~6 GB of sliced full-width HBM passes become
        # ~35 GFLOP of MXU work reading v once.
        Wv_e, Wv_o, Wh_e, Wh_o = (jnp.asarray(m)
                                  for m in _syn_fir_mats(S))
        hi = jax.lax.Precision.HIGHEST
        pcm = (jnp.einsum('nsk,bkn->bsn', Wv_e, v[:, :, :64],
                          precision=hi)
               + jnp.einsum('nsk,bkn->bsn', Wv_o, v[:, :, 64:],
                            precision=hi)
               + jnp.einsum('nsh,bhn->bsn', Wh_e, vhist[:, :, :64],
                            precision=hi)
               + jnp.einsum('nsh,bhn->bsn', Wh_o, vhist[:, :, 64:],
                            precision=hi))
        new_vhist = v[:, S - 1: S - 10: -1, :]               # newest first
        return pcm.reshape(B, S * 64), new_vhist
    # 10-static-slice FIR (AACJAX_QMF_FIR=slices, and the S < 9 path):
    # no gather — per-element gathers serialize on TPU and dominated
    # the whole SBR program.
    vall = jnp.concatenate([vhist[:, ::-1, :], v], axis=1)   # [B, 9+S, 128]
    pcm = None
    w = jnp.asarray(taps_w)                                  # [10, 64]
    for j in range(10):
        lo = 64 * (j & 1)
        sl = vall[:, 9 - j: 9 - j + S, lo:lo + 64]           # [B, S, 64]
        term = sl * w[j]
        pcm = term if pcm is None else pcm + term
    new_vhist = vall[:, -1:-10:-1, :]                        # newest first
    return pcm.reshape(B, S * 64), new_vhist


def analysis_init(B: int) -> jax.Array:
    return jnp.zeros((B, ANA_HIST), jnp.float32)


def synthesis_init(B: int) -> jax.Array:
    return jnp.zeros((B, SYN_HIST, 128), jnp.float32)
