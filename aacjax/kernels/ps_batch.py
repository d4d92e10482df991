"""Batched Parametric Stereo on device (JAX/XLA, TPU-first; 20- and
34-band modes compile as separate programs).

One jitted program turns a [B, T] chunk of mono SBR-adjusted QMF planes
into stereo: hybrid filterbank analysis as sliding-window einsums
against the full 13-tap complex/real filters, transient detection and
the 3-link allpass decorrelator as lax.scans over the continuous
T*32-slot axis (the only truly sequential recurrences), LUT-gathered
mixing matrices (HA table + smoothed-phase table indexed by the
host-packed knots, aacjax.host.ps_pack) with per-slot linear
interpolation — including the negative-center channels' imaginary-start
negation — and two QMF synthesis filterbanks.

Chunk boundaries are exact: the hybrid FIR's low-band input is the
continuous X_low stream (identical to the per-frame lookahead semantics
because the 13-tap filters only ever see low QMF bands), and the
delay/allpass/transient states carry between chunks.  Numerics follow
aacjax.host.ps_decode, the reference that is sample-exact against
libavcodec; equality between the two paths is enforced in
tests/test_ps_batch.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from aacjax.host import ps as P
from aacjax.host.ps_decode import _make_filter, _tables
from aacjax.kernels import qmf

SLOTS = 32
MAX_DELAY = 14
BANDS = 64
_HI = jax.lax.Precision.HIGHEST

# The only truly sequential recurrences in the whole HE+PS device program
# are the PS transient detector and the 3-link allpass decorrelator.
# AACJAX_PS_SCAN selects the allpass form:
#   matmul (default) — the constant-coefficient recurrence v[n] =
#          w[n] + g*v[n-1] is a lower-triangular Toeplitz MATMUL
#          (T[i,k] = g^(i-k), constants in f64): ~13 GFLOP on the MXU
#          instead of ~4 GB of full-width HBM passes (the doubling
#          loop was the top source line of the r5 B=1024 trace)
#   assoc  — log-depth Hillis-Steele doubling (r4 default)
#   seq    — the original lax.scan forms for on-hardware A/B
# The transient detector (max-based, not linear) keeps its doubling
# form in both parallel modes.  All forms agree to float reassociation
# error (~1e-6 rel), far inside the 3e-3 path tolerance and the >70 dB
# oracle bar (tests/test_ps_batch.py, test_ps_scan_modes_agree).
# The env var is re-read and folded into the jit cache key on every
# jitted_sbr_ps_apply call, so flipping it mid-process retraces instead
# of silently reusing the other mode's compiled program (the module
# globals exist for the eager-path tests that monkeypatch them).
_SCAN_MODE = os.environ.get("AACJAX_PS_SCAN", "matmul")
_SEQ_SCAN = _SCAN_MODE == "seq"


def _sync_seq_scan() -> str:
    global _SEQ_SCAN, _SCAN_MODE
    _SCAN_MODE = os.environ.get("AACJAX_PS_SCAN", "matmul")
    _SEQ_SCAN = _SCAN_MODE == "seq"
    return _SCAN_MODE


# The mixing stage reads two small LUTs with DYNAMIC (host-packed)
# indices: HA[ha, icc] ([46,8,4]) and the smoothed-phase table pd[idx]
# ([512], re/im).  XLA:TPU lowers these to element gathers — the op
# class that dominated the SBR program before the gather-free rewrite.
# AACJAX_PS_LUT selects the replacement:
#   split  (default) — TWO-LEVEL one-hot (the dequant idiom,
#          kernels/pipeline.py:143): idx = hi*L + lo; a [.,N/L]
#          one-hot matmul picks the L-row block, a [.,L] one-hot
#          selects within it.  Exact (each step has ONE nonzero
#          term) at (N/L + L*(K+1)) one-hot/block elements per index
#          instead of N — at B=1024 the flat 512-wide one-hot
#          materialized 0.4-1.7 GB iota/compare tensors per chunk
#          (the top of the r5 trace); the split cuts that ~6-10x.
#   onehot — flat [.,N] one-hot HIGHEST matmul (r4 default; won its
#          B=256 A/B 22.2 vs 24.8 ms against gather)
#   gather — plain XLA element gather
# Folded into the jit cache key like the scan mode.
_LUT_MODE = os.environ.get("AACJAX_PS_LUT", "split")


def _sync_lut_mode() -> str:
    global _LUT_MODE
    _LUT_MODE = os.environ.get("AACJAX_PS_LUT", "split")
    return _LUT_MODE


def _lut_rows(table2d, idx):
    """table2d [N, K] rows selected by integer idx [...]: exact one-hot
    matmul (flat or two-level split, see _LUT_MODE) or a plain gather."""
    if _LUT_MODE == "gather":
        return table2d[idx]
    N, K = table2d.shape
    L = None
    if _LUT_MODE != "onehot":
        # cheapest legal split: minimize per-index one-hot+block traffic
        cands = [(N // l + l * (K + 1), l) for l in (8, 16, 32)
                 if N % l == 0]
        if cands:
            L = min(cands)[1]
    if L is None:
        oh = (idx[..., None] == jnp.arange(N)).astype(jnp.float32)
        return jnp.einsum('...n,nk->...k', oh, table2d, precision=_HI)
    H = N // L
    oh_hi = ((idx // L)[..., None] == jnp.arange(H)).astype(jnp.float32)
    blk = jnp.einsum('...h,hm->...m', oh_hi,
                     table2d.reshape(H, L * K), precision=_HI)
    oh_lo = ((idx % L)[..., None] == jnp.arange(L)).astype(jnp.float32)
    return jnp.einsum('...l,...lk->...k', oh_lo,
                      blk.reshape(blk.shape[:-1] + (L, K)),
                      precision=_HI)

# per-mode geometry (20-band / 34-band): hybrid channel count, parameter
# bands, allpass bands, short-delay boundary, decay cutoff, phase cut
_NB = (71, 91)
_NPAR = (20, 34)
_NAP = (30, 50)
_SDB = (42, 62)
_DECAY_CUTOFF = (10, 32)


def _full13(f: np.ndarray) -> np.ndarray:
    """7-tap conjugate-symmetric prototype -> full 13-tap complex filter."""
    full = np.zeros((f.shape[0], 13), np.complex128)
    full[:, :6] = f[:, :6]
    full[:, 6] = f[:, 6].real
    full[:, 7:] = np.conj(f[:, 5::-1])
    return full


@functools.lru_cache(maxsize=None)
def _consts(is34: bool = False) -> dict:
    """Device constants per PS mode (f32/complex pairs)."""
    t = _tables()
    pt = P.tables()
    nb, nap, sdb = _NB[is34], _NAP[is34], _SDB[is34]
    out = {}
    if not is34:
        f = _full13(_make_filter(pt["g0_q8"].astype(np.float64), 8))
        out["filt13_r"] = [f.real.astype(np.float32)]
        out["filt13_i"] = [f.imag.astype(np.float32)]
        # full 13-tap real 2-band split filter (g1_Q2)
        g1 = np.array([0.0, 0.01899487526049, 0.0, -0.07293139167538,
                       0.0, 0.30596630545168, 0.5])
        g2 = np.zeros(13)
        g2[:7] = g1
        g2[7:] = g1[5::-1]
        out["g1_13"] = g2.astype(np.float32)
        out["k_to_i"] = t["k_to_i_20"].astype(np.int32)[:nb]
    else:
        fs = [_full13(_make_filter(pt["g0_q12"].astype(np.float64), 12)),
              _full13(_make_filter(pt["g1_q8"].astype(np.float64), 8)),
              _full13(_make_filter(pt["g2_q4"].astype(np.float64), 4))]
        out["filt13_r"] = [f.real.astype(np.float32) for f in fs]
        out["filt13_i"] = [f.imag.astype(np.float32) for f in fs]
        out["k_to_i"] = t["k_to_i_34"].astype(np.int32)[:nb]
    out["HA"] = t["HA"].astype(np.float32)                  # [46, 8, 4]
    out["pd_r"] = t["pd_smooth"].real.astype(np.float32)    # [512]
    out["pd_i"] = t["pd_smooth"].imag.astype(np.float32)
    out["phi_r"] = t[f"phi_fract_{int(is34)}"].real.astype(np.float32)
    out["phi_i"] = t[f"phi_fract_{int(is34)}"].imag.astype(np.float32)
    out["qf_r"] = t[f"q_fract_{int(is34)}"].real.astype(np.float32)
    out["qf_i"] = t[f"q_fract_{int(is34)}"].imag.astype(np.float32)
    a = np.array([0.65143905753106, 0.56471812200776, 0.48954165955695])
    gds = np.clip(1.0 - 0.05 * (np.arange(nap) - _DECAY_CUTOFF[is34]),
                  0.0, 1.0)
    out["ag"] = (a[None, :] * gds[:, None]).astype(np.float32)  # [nap, 3]
    # plain-delay offset per band into the [14 hist | S] line
    doff = np.zeros(nb, np.int64)
    doff[sdb:] = MAX_DELAY - 1           # short-delay bands: delay 1
    out["delay_off"] = doff              # others: delay 14 (offset 0)
    cm = np.zeros(nb, np.float32)
    if is34:
        cm[9:14] = 1.0                   # negative-center channels
    else:
        cm[:2] = 1.0
    out["conj_mask"] = cm
    return out


def ps_state_init(B: int, is34: bool = False) -> dict:
    nb, nap, npar = _NB[is34], _NAP[is34], _NPAR[is34]
    return dict(
        hist4_r=jnp.zeros((B, 4, 5), jnp.float32),
        hist4_i=jnp.zeros((B, 4, 5), jnp.float32),
        delay_r=jnp.zeros((B, nb, MAX_DELAY), jnp.float32),
        delay_i=jnp.zeros((B, nb, MAX_DELAY), jnp.float32),
        ap_r=jnp.zeros((B, nap, 3, 5), jnp.float32),
        ap_i=jnp.zeros((B, nap, 3, 5), jnp.float32),
        peak=jnp.zeros((B, npar), jnp.float32),
        psmooth=jnp.zeros((B, npar), jnp.float32),
        pdiff=jnp.zeros((B, npar), jnp.float32),
        v_l=jnp.zeros((B, qmf.SYN_HIST, 128), jnp.float32),
        v_r=jnp.zeros((B, qmf.SYN_HIST, 128), jnp.float32),
    )


def _hybrid_analysis(Xr, Xi, lo_r, lo_i, c, B, S, is34):
    """Xr/Xi [B,S,64] (HF+low per slot), lo_r/i [B,S+12,5] the continuous
    low-band line incl. 6 slots of history and 6 of lookahead ->
    s [B,S,nb] complex (re, im)."""
    def win13(a, qb):
        # 13-tap sliding window of the [B, S+12] band line as 13 static
        # slices (a per-element gather serializes on TPU)
        return jnp.stack([a[:, j:j + S, qb] for j in range(13)], axis=-1)

    def fir(qb, fset):
        wr = win13(lo_r, qb)                                  # [B,S,13]
        wi = win13(lo_i, qb)
        fr = jnp.asarray(c["filt13_r"][fset])
        fi = jnp.asarray(c["filt13_i"][fset])
        return ((jnp.einsum('bsj,qj->bsq', wr, fr, precision=_HI)
                 - jnp.einsum('bsj,qj->bsq', wi, fi, precision=_HI)),
                (jnp.einsum('bsj,qj->bsq', wi, fr, precision=_HI)
                 + jnp.einsum('bsj,qj->bsq', wr, fi, precision=_HI)))

    if is34:
        # 12 + 8 + 4 + 4 + 4 sub-channels from QMF bands 0-4, 59 direct
        parts = [fir(0, 0), fir(1, 1), fir(2, 2), fir(3, 2), fir(4, 2)]
        outs_r = [p[0] for p in parts] + [Xr[:, :, 5:]]
        outs_i = [p[1] for p in parts] + [Xi[:, :, 5:]]
        return (jnp.concatenate(outs_r, axis=-1),
                jnp.concatenate(outs_i, axis=-1))             # [B,S,91]

    sub_r, sub_i = fir(0, 0)
    # fold: singles 6,7,0,1 then pairs 2+5, 3+4
    def fold(sub):
        return jnp.stack([sub[..., 6], sub[..., 7], sub[..., 0],
                          sub[..., 1], sub[..., 2] + sub[..., 5],
                          sub[..., 3] + sub[..., 4]], axis=-1)  # [B,S,6]
    g1 = jnp.asarray(c["g1_13"])
    outs_r, outs_i = [fold(sub_r)], [fold(sub_i)]
    for qb, rev in ((1, 1), (2, 0)):
        wr = win13(lo_r, qb)
        wi = win13(lo_i, qb)
        mid_r = jnp.einsum('bsj,j->bs', wr, g1, precision=_HI)
        mid_i = jnp.einsum('bsj,j->bs', wi, g1, precision=_HI)
        # g1_13 is symmetric: mid already contains mid+op; recover the
        # two split outputs from mid_tap and op separately
        ctr_r = wr[..., 6] * g1[6]
        ctr_i = wi[..., 6] * g1[6]
        op_r = mid_r - ctr_r
        op_i = mid_i - ctr_i
        plus_r, plus_i = ctr_r + op_r, ctr_i + op_i
        minus_r, minus_i = ctr_r - op_r, ctr_i - op_i
        pair_r = (jnp.stack([minus_r, plus_r], -1) if rev
                  else jnp.stack([plus_r, minus_r], -1))
        pair_i = (jnp.stack([minus_i, plus_i], -1) if rev
                  else jnp.stack([plus_i, minus_i], -1))
        outs_r.append(pair_r)
        outs_i.append(pair_i)
    outs_r.append(Xr[:, :, 3:])                               # [B,S,61]
    outs_i.append(Xi[:, :, 3:])
    return (jnp.concatenate(outs_r, axis=-1),
            jnp.concatenate(outs_i, axis=-1))                 # [B,S,71]


def _allpass_assoc(xr, xi, ap_r0, ap_i0, qf_r, qf_i, ag, S,
                   matmul=False):
    """3-link allpass cascade in log depth (matmul=True: in ONE
    Toeplitz MXU contraction per link, see _SCAN_MODE).

    Per link m (delay d = m+3, the lax.scan form reads buffer index 2-m
    of a 5-deep shift register): the state line obeys the first-order
    recurrence with lag d

        v[n] = (a*q) * v[n-d] + (1 - a^2) * u[n],
        y[n] = q * v[n-d] - a * u[n],

    which splits into d independent first-order linear recurrences (one
    per residue class mod d).  The coefficient a*q is a spec CONSTANT
    per (band, link), so instead of jax.lax.associative_scan — whose
    generic tuple machinery treats the coefficient as a second scanned
    operand and interleaves odd/even slices at every recursion level
    (it alone built the bulk of a ~2,200-op XLA program that ran
    op-dispatch-bound at ~28 ms/step) — each recurrence is solved by
    constant-coefficient Hillis-Steele doubling:

        B_{j+1}[n] = B_j[n] + (aq)^(2^j) * B_j[n - 2^j]

    with the per-level coefficient powers and the seed line A[n] =
    (aq)^(n+1) precomputed in numpy float64 (tighter than the f32
    squaring chain the scan performed).  ~6 full-width ops per level
    instead of ~50.  qf_r/qf_i/ag arrive as NUMPY constants.

    State layout is IDENTICAL to the scan form: buffer index j of the
    [B,NAP,3,5] register holds v[n-(5-j)], so v[-k] = buf[5-k]; residue
    r's seed v[r-d] = buf[5-d+r] and the new register is v[S-5:S].
    Links cascade (u_{m+1} = y_m) but each link is fully parallel over
    slots."""
    Bn, NAP = xr.shape[0], xr.shape[1]
    aq = (np.asarray(ag, np.float64)
          * (np.asarray(qf_r, np.float64)
             + 1j * np.asarray(qf_i, np.float64)))            # [NAP,3]
    ur, ui = xr, xi
    new_r, new_i = [], []
    for m in range(3):
        d = m + 3
        a = jnp.asarray(ag[:, m], jnp.float32)[None, :, None]  # [1,NAP,1]
        qr = jnp.asarray(qf_r[:, m], jnp.float32)[None, :, None]
        qi = jnp.asarray(qf_i[:, m], jnp.float32)[None, :, None]
        wr = (1.0 - a * a) * ur                               # [B,NAP,S]
        wi = (1.0 - a * a) * ui
        nres = -(-S // d)
        pad = nres * d - S
        wr_p = jnp.pad(wr, ((0, 0), (0, 0), (0, pad)))
        wi_p = jnp.pad(wi, ((0, 0), (0, 0), (0, pad)))
        br = wr_p.reshape(Bn, NAP, nres, d)
        bi = wi_p.reshape(Bn, NAP, nres, d)

        g = aq[:, m]                                          # [NAP] cplx
        if matmul:
            # v_lin = T @ w with T[p,i,k] = g_p^(i-k) (i >= k), the
            # closed form of the recurrence — one banded-Toeplitz MXU
            # contraction instead of log2(nres) full-width HBM passes
            P = np.arange(nres)[:, None] - np.arange(nres)[None, :]
            Tm = np.where(P >= 0, g[:, None, None]
                          ** np.clip(P, 0, None)[None], 0.0)  # [NAP,n,n]
            Tr = jnp.asarray(Tm.real.astype(np.float32))
            Ti = jnp.asarray(Tm.imag.astype(np.float32))
            ein = functools.partial(jnp.einsum, 'pik,bpkd->bpid',
                                    precision=_HI)
            br, bi = (ein(Tr, br) - ein(Ti, bi),
                      ein(Tr, bi) + ein(Ti, br))
        else:
            j = 1
            while j < nres:
                gj = g ** j
                gjr = jnp.asarray(
                    gj.real.astype(np.float32))[None, :, None, None]
                gji = jnp.asarray(
                    gj.imag.astype(np.float32))[None, :, None, None]
                sr = jnp.pad(br,
                             ((0, 0), (0, 0), (j, 0), (0, 0)))[:, :, :nres]
                si = jnp.pad(bi,
                             ((0, 0), (0, 0), (j, 0), (0, 0)))[:, :, :nres]
                br = br + gjr * sr - gji * si
                bi = bi + gjr * si + gji * sr
                j *= 2
        apow = g[:, None] ** np.arange(1, nres + 1)[None, :]  # [NAP,nres]
        Ar = jnp.asarray(apow.real.astype(np.float32))[None, :, :, None]
        Ai = jnp.asarray(apow.imag.astype(np.float32))[None, :, :, None]
        v0r = ap_r0[:, :, m, 5 - d:][:, :, None, :]           # [B,NAP,1,d]
        v0i = ap_i0[:, :, m, 5 - d:][:, :, None, :]
        vr = (Ar * v0r - Ai * v0i + br).reshape(Bn, NAP, -1)[:, :, :S]
        vi = (Ar * v0i + Ai * v0r + bi).reshape(Bn, NAP, -1)[:, :, :S]
        vdr = jnp.concatenate([ap_r0[:, :, m, 5 - d:], vr[:, :, :S - d]],
                              axis=2)                         # v[n-d]
        vdi = jnp.concatenate([ap_i0[:, :, m, 5 - d:], vi[:, :, :S - d]],
                              axis=2)
        yr = qr * vdr - qi * vdi - a * ur
        yi = qr * vdi + qi * vdr - a * ui
        new_r.append(vr[:, :, S - 5:])
        new_i.append(vi[:, :, S - 5:])
        ur, ui = yr, yi
    return ur, ui, jnp.stack(new_r, axis=2), jnp.stack(new_i, axis=2)


def _decorrelate(s_r, s_i, state, c, B, S, is34):
    """Transient-attenuated allpass decorrelation -> d [B,S,nb]."""
    NB, NPAR, NAP = _NB[is34], _NPAR[is34], _NAP[is34]
    k_to_i = jnp.asarray(c["k_to_i"])
    # per-parameter-band power via indicator matmul
    ind = (k_to_i[:, None] == jnp.arange(NPAR)[None, :]).astype(jnp.float32)
    pw = jnp.einsum('bsk,kp->bsp', s_r * s_r + s_i * s_i, ind,
                    precision=_HI)                            # [B,S,20]

    if _SEQ_SCAN:
        def tstep(carry, x):
            peak, psm, pdf = carry
            decayed = jnp.float32(0.76592833836465) * peak
            peak = jnp.maximum(decayed, x)
            psm = psm + jnp.float32(0.25) * (x - psm)
            pdf = pdf + jnp.float32(0.25) * (peak - x - pdf)
            denom = jnp.float32(1.5) * pdf
            g = jnp.where(denom > psm,
                          psm / jnp.where(denom > 0, denom, 1.0), 1.0)
            return (peak, psm, pdf), g

        (peak, psm, pdf), tg = jax.lax.scan(
            tstep, (state["peak"], state["psmooth"], state["pdiff"]),
            jnp.moveaxis(pw, 1, 0))                           # tg [S,B,20]
        tg = jnp.moveaxis(tg, 0, 1)                           # [B,S,npar]
    else:
        # log-depth DOUBLING forms.  All three recurrences have spec
        # CONSTANT coefficients — peak[n] = max(C*peak[n-1], x[n]) and
        # two EMAs y[n] = 0.75*y[n-1] + 0.25*u[n] — so the generic
        # associative_scan (coefficient scanned as data, odd/even
        # interleave slices at every level) is replaced by
        # Hillis-Steele with numpy-precomputed coefficient powers:
        # ~4 full-width ops per level, log2(S) levels.  Same math,
        # reassociated (~1e-6 rel, far inside the 3e-3 path tolerance).
        C_PEAK = 0.76592833836465
        C_LIN = 0.75

        def shift1(y, k):  # zero-pad shift along the slot axis of [B,S,P]
            return jnp.pad(y, ((0, 0), (k, 0), (0, 0)))[:, :S]

        def powline(cc):  # [1,S,1] constant line c^(n+1)
            return jnp.asarray(
                np.power(cc, np.arange(1, S + 1, dtype=np.float64))
                .astype(np.float32))[None, :, None]

        y = pw                                                # [B,S,npar]
        j = 1
        while j < S:
            y = jnp.maximum(y, jnp.float32(C_PEAK ** j) * shift1(y, j))
            j *= 2
        peak_s = jnp.maximum(powline(C_PEAK) * state["peak"][:, None], y)

        def lin_prefix(u):
            yl = u
            k = 1
            while k < S:
                yl = yl + jnp.float32(C_LIN ** k) * shift1(yl, k)
                k *= 2
            return yl

        al = powline(C_LIN)
        psm_s = al * state["psmooth"][:, None] + lin_prefix(
            jnp.float32(0.25) * pw)
        pdf_s = al * state["pdiff"][:, None] + lin_prefix(
            jnp.float32(0.25) * (peak_s - pw))
        denom = jnp.float32(1.5) * pdf_s
        tg = jnp.where(denom > psm_s,
                       psm_s / jnp.where(denom > 0, denom, 1.0), 1.0)
        peak, psm, pdf = peak_s[:, -1], psm_s[:, -1], pdf_s[:, -1]
    # parameter-band -> hybrid-band expansion as an exact one-hot matmul
    # (constant-index lane gathers serialize on TPU; `ind` rows are
    # one-hot so HIGHEST-precision matmul reproduces the values bitwise)
    tg_k = jnp.einsum('bsp,kp->bsk', tg, ind, precision=_HI)  # [B,S,nb]

    # delay lines: [14 hist | S] along slots
    line_r = jnp.concatenate([state["delay_r"],
                              jnp.moveaxis(s_r, 1, 2)], axis=2)  # [B,71,14+S]
    line_i = jnp.concatenate([state["delay_i"],
                              jnp.moveaxis(s_i, 1, 2)], axis=2)
    new_delay_r = line_r[:, :, -MAX_DELAY:]
    new_delay_i = line_i[:, :, -MAX_DELAY:]

    # non-allpass bands: static per-band delay — only two distinct
    # offsets exist (14 below SDB, 1 above), so select between the two
    # static slices instead of take_along_axis
    short = (jnp.asarray(c["delay_off"]) != 0)[None, :, None]  # [1,71,1]
    dp_r = jnp.where(short, line_r[:, :, MAX_DELAY - 1: MAX_DELAY - 1 + S],
                     line_r[:, :, :S])
    dp_i = jnp.where(short, line_i[:, :, MAX_DELAY - 1: MAX_DELAY - 1 + S],
                     line_i[:, :, :S])                        # [B,71,S]

    # allpass bands: input = 2-slot-delayed s rotated by phi_fract
    xin_r_l = line_r[:, :NAP, MAX_DELAY - 2: MAX_DELAY - 2 + S]
    xin_i_l = line_i[:, :NAP, MAX_DELAY - 2: MAX_DELAY - 2 + S]
    phi_r = jnp.asarray(c["phi_r"])[None, :, None]
    phi_i = jnp.asarray(c["phi_i"])[None, :, None]
    xr = xin_r_l * phi_r - xin_i_l * phi_i                    # [B,30,S]
    xi = xin_r_l * phi_i + xin_i_l * phi_r
    qf_r = np.asarray(c["qf_r"])                              # [30,3]
    qf_i = np.asarray(c["qf_i"])
    ag = np.asarray(c["ag"])                                  # [30,3]

    if _SEQ_SCAN:
        def apstep(carry, x):
            ar, ai = carry                                    # [B,30,3,5]
            cr, ci = x                                        # [B,30]
            new_ar, new_ai = [], []
            for m in range(3):
                ld_r = ar[:, :, m, 2 - m]
                ld_i = ai[:, :, m, 2 - m]
                nr = ld_r * qf_r[:, m] - ld_i * qf_i[:, m] - ag[:, m] * cr
                ni = ld_r * qf_i[:, m] + ld_i * qf_r[:, m] - ag[:, m] * ci
                new_ar.append(jnp.concatenate(
                    [ar[:, :, m, 1:], (cr + ag[:, m] * nr)[:, :, None]],
                    axis=2))
                new_ai.append(jnp.concatenate(
                    [ai[:, :, m, 1:], (ci + ag[:, m] * ni)[:, :, None]],
                    axis=2))
                cr, ci = nr, ni
            return ((jnp.stack(new_ar, axis=2), jnp.stack(new_ai, axis=2)),
                    (cr, ci))

        (ap_r, ap_i), (out_r, out_i) = jax.lax.scan(
            apstep, (state["ap_r"], state["ap_i"]),
            (jnp.moveaxis(xr, 2, 0), jnp.moveaxis(xi, 2, 0)))
        out_r = jnp.moveaxis(out_r, 0, 2)                     # [B,30,S]
        out_i = jnp.moveaxis(out_i, 0, 2)
    else:
        out_r, out_i, ap_r, ap_i = _allpass_assoc(
            xr, xi, state["ap_r"], state["ap_i"], qf_r, qf_i, ag, S,
            matmul=_SCAN_MODE == "matmul")

    d_r = jnp.concatenate([out_r, dp_r[:, NAP:]], axis=1)     # [B,71,S]
    d_i = jnp.concatenate([out_i, dp_i[:, NAP:]], axis=1)
    d_r = jnp.moveaxis(d_r, 1, 2) * tg_k                      # [B,S,71]
    d_i = jnp.moveaxis(d_i, 1, 2) * tg_k
    new_state = dict(peak=peak, psmooth=psm, pdiff=pdf,
                     delay_r=new_delay_r, delay_i=new_delay_i,
                     ap_r=ap_r, ap_i=ap_i)
    return d_r, d_i, new_state


def _mixing_h(dense, c, B, T, is34):
    """Host-packed knot data -> per-slot H [B,T,32,npar,4] (re, im)
    and the imneg interpolation track (imaginary-start negation).

    Knot 0 (the cross-frame carry) arrives as EXPLICIT H values
    (ps_h0_r/i, the host packer's h_prev mirror) rather than LUT
    indices: remapped band-flip carries, IPD/OPD-off spans, and
    off->on resumes are all representable, so none of those states
    forces the numpy fallback anymore.  Envelope knots additionally
    take a per-slot chunk-constant imaginary tail for bands at/past
    the IPD cut (ps_himag rows selected by ps_hslot) — the stale
    per-envelope-slot values libavcodec keeps interpolating after a
    band-scheme switch (host.ps_decode h_slot_imag semantics); the
    tail columns are never rewritten in-mode, so chunk-constant is
    exact."""
    NPAR = _NPAR[is34]
    CUT = 17 if is34 else 11
    HA = jnp.asarray(c["HA"])
    pd_r = jnp.asarray(c["pd_r"])
    pd_i = jnp.asarray(c["pd_i"])
    ha = dense["ps_ha"][:, :, :, :NPAR]                       # [B,T,6,npar]
    ic = dense["ps_icc"][:, :, :, :NPAR]
    base = _lut_rows(HA.reshape(-1, 4),
                     jnp.maximum(ha, 0) * HA.shape[1] + ic)   # [B,T,6,20,4]
    base = base * (ha >= 0).astype(jnp.float32)[..., None]
    opd = dense["ps_opd"]                                     # [B,T,6,17]
    ipd = dense["ps_ipd"]
    pd_ri = jnp.stack([pd_r, pd_i], axis=-1)                  # [512, 2]
    o_r, o_i = jnp.moveaxis(_lut_rows(pd_ri, opd), -1, 0)
    i_r, i_i = jnp.moveaxis(_lut_rows(pd_ri, ipd), -1, 0)
    adj_r = o_r * i_r + o_i * i_i                             # opd*conj(ipd)
    adj_i = o_i * i_r - o_r * i_i
    rot_r = jnp.stack([o_r, adj_r, o_r, adj_r], axis=-1)      # [B,T,6,17,4]
    rot_i = jnp.stack([o_i, adj_i, o_i, adj_i], axis=-1)
    pad_shape = rot_r.shape[:3] + (NPAR - 17, 4)
    rot_r = jnp.concatenate(
        [rot_r, jnp.ones(pad_shape, jnp.float32)], axis=3)
    rot_i = jnp.concatenate(
        [rot_i, jnp.zeros(pad_shape, jnp.float32)], axis=3)
    K_r = base * rot_r                                        # [B,T,6,20,4]
    K_i = base * rot_i
    # imaginary tail: rows 1..4 of the per-slot h_slot_imag shadow,
    # selected per knot (ps_hslot 0 = no tail), applied at bands >= CUT
    hs = dense["ps_hslot"].astype(jnp.int32)                  # [B,T,6]
    oh_t = (hs[..., None] == (1 + jnp.arange(4))).astype(jnp.float32)
    tail = jnp.einsum('btkr,brpx->btkpx', oh_t,
                      dense["ps_himag"][:, :, :NPAR], precision=_HI)
    cutm = (jnp.arange(NPAR) >= CUT).astype(jnp.float32)[
        None, None, None, :, None]
    K_i = K_i * (1.0 - cutm) + tail * cutm
    # knot 0: explicit carry values (overrides indices AND the tail)
    K_r = jnp.concatenate(
        [dense["ps_h0_r"][:, :, None, :NPAR], K_r[:, :, 1:]], axis=2)
    K_i = jnp.concatenate(
        [dense["ps_h0_i"][:, :, None, :NPAR], K_i[:, :, 1:]], axis=2)

    al = dense["ps_alpha"][..., None, None]                   # [B,T,32,1,1]

    # per-slot knot selection along the 6-knot axis as a 6-way masked
    # sum (bitwise-exact, no gather): idx [B,T,32] in [0,6)
    def knot_sel(K, idx):
        acc = None
        for n in range(K.shape[2]):
            m = (idx == n).astype(jnp.float32)[..., None, None]
            term = m * K[:, :, n][:, :, None]                 # [B,T,32,P,4]
            acc = term if acc is None else acc + term
        return acc

    idx_lo = dense["ps_knot_lo"].astype(jnp.int32)            # [B,T,32]
    idx_hi = dense["ps_knot_hi"].astype(jnp.int32)
    lo_r = knot_sel(K_r, idx_lo)
    lo_i = knot_sel(K_i, idx_lo)
    hi_r = knot_sel(K_r, idx_hi)
    hi_i = knot_sel(K_i, idx_hi)
    h_r = (1.0 - al) * lo_r + al * hi_r                       # [B,T,32,20,4]
    h_i = (1.0 - al) * lo_i + al * hi_i
    h_imneg = -(1.0 - al) * lo_i + al * hi_i
    return h_r, h_i, h_imneg


def ps_apply(Xr, Xi, xall_lo_r, xall_lo_i, dense: dict, state: dict,
             B: int, T: int, is34: bool = False) -> tuple:
    """Mono SBR plane -> stereo QMF planes + dual synthesis.

    Xr/Xi [B,S,64] (32768 scale); xall_lo_r/i [B, 8+S, 5] = the SBR
    stage's continuous low-band analysis line (8 history rows + S; its
    last 6 rows are this chunk's hybrid-filter lookahead).  Returns
    (pcm_l, pcm_r [B, S*64] in 32768 scale, new_state)."""
    c = _consts(is34)
    NB = _NB[is34]
    S = T * SLOTS
    # continuous hybrid-FIR input: X slot n lives at xall row n+2, and
    # the FIR needs X slots [n-6, n+6] -> prepend 4 carried rows so row r
    # of `lo` is X slot r-6
    lo_r = jnp.concatenate([state["hist4_r"], xall_lo_r], axis=1)
    lo_i = jnp.concatenate([state["hist4_i"], xall_lo_i], axis=1)
    new_hist4_r = xall_lo_r[:, S - 4: S]
    new_hist4_i = xall_lo_i[:, S - 4: S]
    s_r, s_i = _hybrid_analysis(Xr, Xi, lo_r, lo_i, c, B, S, is34)
    d_r, d_i, dec_state = _decorrelate(s_r, s_i, state, c, B, S, is34)
    h_r, h_i, h_imneg = _mixing_h(dense, c, B, T, is34)

    # parameter-band -> hybrid-band expansion via exact one-hot matmul
    # (see _decorrelate's tg_k note)
    kmap = (jnp.asarray(c["k_to_i"])[:, None]
            == jnp.arange(_NPAR[is34])[None, :]).astype(jnp.float32)
    expand = functools.partial(
        jnp.einsum, 'btspx,kp->btskx', precision=_HI)
    hk_r = expand(h_r, kmap)                                  # [B,T,32,nb,4]
    # conj-mask folded INTO the expansion matrix: one contraction over
    # the doubled param axis replaces two dots + a 300 MB masked
    # combine.  Exact: conj_mask is 0/1, so each output keeps exactly
    # one nonzero term (h_i or h_imneg), the rest exact zeros.
    cmask_p = jnp.asarray(c["conj_mask"]).astype(jnp.float32)[:, None]
    kmap_i = jnp.concatenate([kmap * (1.0 - cmask_p), kmap * cmask_p],
                             axis=1)                          # [nb, 2P]
    hk_i = expand(jnp.concatenate([h_i, h_imneg], axis=3), kmap_i)
    hk_r = hk_r.reshape(B, S, NB, 4)
    hk_i = hk_i.reshape(B, S, NB, 4)

    has = dense["ps_has"].reshape(B, T, 1, 1)
    has_s = jnp.broadcast_to(has, (B, T, SLOTS, 1)).reshape(B, S, 1)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    # The whole mix -> hybrid synthesis -> QMF synthesis tail runs ONCE
    # on an L-stacked-on-R [2B, ...] batch: every stage is row-local,
    # so stacking is bit-exact, halves the op count of this
    # op-dispatch-bound program's tail, and doubles the QMF matmul row
    # count for the MXU.  hk lane pairs (0,1)=direct, (2,3)=decorr.
    s2_r = jnp.concatenate([s_r, s_r], axis=0)            # [2B,S,NB]
    s2_i = jnp.concatenate([s_i, s_i], axis=0)
    d2_r = jnp.concatenate([d_r, d_r], axis=0)
    d2_i = jnp.concatenate([d_i, d_i], axis=0)
    hd_r = jnp.concatenate([hk_r[..., 0], hk_r[..., 1]], axis=0)
    hd_i = jnp.concatenate([hk_i[..., 0], hk_i[..., 1]], axis=0)
    hx_r = jnp.concatenate([hk_r[..., 2], hk_r[..., 3]], axis=0)
    hx_i = jnp.concatenate([hk_i[..., 2], hk_i[..., 3]], axis=0)
    ch_r, ch_i = cmul(s2_r, s2_i, hd_r, hd_i)
    tx_r, tx_i = cmul(d2_r, d2_i, hx_r, hx_i)
    ch_r, ch_i = ch_r + tx_r, ch_i + tx_i                 # [2B,S,NB]

    if is34:
        groups = ((0, 12), (12, 20), (20, 24), (24, 28), (28, 32))

        def hybrid_synthesis(ch_r, ch_i):
            sums_r = [jnp.sum(ch_r[..., lo:hi], axis=-1, keepdims=True)
                      for lo, hi in groups]
            sums_i = [jnp.sum(ch_i[..., lo:hi], axis=-1, keepdims=True)
                      for lo, hi in groups]
            return (jnp.concatenate(sums_r + [ch_r[..., 32:]], -1),
                    jnp.concatenate(sums_i + [ch_i[..., 32:]], -1))
    else:
        def hybrid_synthesis(ch_r, ch_i):
            b0_r = jnp.sum(ch_r[..., :6], axis=-1, keepdims=True)
            b0_i = jnp.sum(ch_i[..., :6], axis=-1, keepdims=True)
            b1_r = (ch_r[..., 6] + ch_r[..., 7])[..., None]
            b1_i = (ch_i[..., 6] + ch_i[..., 7])[..., None]
            b2_r = (ch_r[..., 8] + ch_r[..., 9])[..., None]
            b2_i = (ch_i[..., 8] + ch_i[..., 9])[..., None]
            return (jnp.concatenate([b0_r, b1_r, b2_r, ch_r[..., 10:]], -1),
                    jnp.concatenate([b0_i, b1_i, b2_i, ch_i[..., 10:]], -1))

    Xo_r, Xo_i = hybrid_synthesis(ch_r, ch_i)                 # [2B,S,64]
    has2 = jnp.concatenate([has_s, has_s], axis=0)
    X2_r = jnp.concatenate([Xr, Xr], axis=0)
    X2_i = jnp.concatenate([Xi, Xi], axis=0)
    Xo_r = jnp.where(has2 != 0.0, Xo_r, X2_r)
    Xo_i = jnp.where(has2 != 0.0, Xo_i, X2_i)

    pcm_lr, v_lr = qmf.synthesis(
        Xo_r, Xo_i,
        jnp.concatenate([state["v_l"], state["v_r"]], axis=0))
    pcm_l, pcm_r = pcm_lr[:B], pcm_lr[B:]
    v_l, v_r = v_lr[:B], v_lr[B:]
    new_state = dict(state)
    new_state.update(dec_state)
    new_state["hist4_r"] = new_hist4_r
    new_state["hist4_i"] = new_hist4_i
    new_state["v_l"] = v_l
    new_state["v_r"] = v_r
    return pcm_l, pcm_r, new_state


def sbr_ps_apply(core_pcm, dense, ps_dense, state, ps_state, cfg,
                 out_int16: bool = False, is34: bool = False):
    """One program: core PCM -> SBR -> PS -> stereo PCM routed to output
    slots (ps_dense['out_src'/'out_role']: slot c emits channel role
    (0=L, 1=R) of source slot src[c]).  Traceable body shared by the
    single-device jit below and runtime.mesh.sharded_sbr_ps_apply."""
    from aacjax.kernels.sbr_batch import sbr_apply

    B, T, F = core_pcm.shape
    Xr, Xi, lo_r, lo_i, new_state = sbr_apply(
        core_pcm, dense, state, cfg, emit_x=True)
    new_state["v_hist"] = state["v_hist"]  # PS owns synthesis state
    pcm_l, pcm_r, new_ps = ps_apply(Xr, Xi, lo_r, lo_i,
                                    ps_dense, ps_state, B, T, is34)
    src = ps_dense["out_src"]
    role = ps_dense["out_role"][:, None]
    out = jnp.where(role != 0, pcm_r[src], pcm_l[src])
    out = out.reshape(B, T, 2 * F)
    if out_int16:
        return (jnp.clip(jnp.round(out), -32768.0, 32767.0)
                .astype(jnp.int16), new_state, new_ps)
    return out * jnp.float32(1.0 / 32768.0), new_state, new_ps


def sbr_ps_apply_dual(core_pcm, dense, ps_dense, state, ps_state20,
                      ps_state34, cfg, out_int16: bool = False):
    """Mixed 20/34-band batch in ONE program: the SBR stage runs once
    (emit_x), then BOTH band-mode PS paths process the full batch — each
    with its own state set — and the per-slot mode mask
    (ps_dense['slot_is34']) selects which mode's stereo output a slot
    emits.  Slots running mode M keep exact state in M's set; their rows
    in the other set carry bounded don't-care values that are never read
    (a mode switch re-seeds via the sticky numpy replay).  Costs ~2x the
    PS stage only when modes are actually mixed; homogeneous batches use
    the single-mode program."""
    from aacjax.kernels.sbr_batch import sbr_apply

    B, T, F = core_pcm.shape
    Xr, Xi, lo_r, lo_i, new_state = sbr_apply(
        core_pcm, dense, state, cfg, emit_x=True)
    new_state["v_hist"] = state["v_hist"]  # PS owns synthesis state
    l20, r20, nps20 = ps_apply(Xr, Xi, lo_r, lo_i,
                               ps_dense, ps_state20, B, T, False)
    l34, r34, nps34 = ps_apply(Xr, Xi, lo_r, lo_i,
                               ps_dense, ps_state34, B, T, True)
    m34 = (ps_dense["slot_is34"] != 0.0)[:, None]             # [B,1]
    pcm_l = jnp.where(m34, l34, l20)
    pcm_r = jnp.where(m34, r34, r20)
    src = ps_dense["out_src"]
    role = ps_dense["out_role"][:, None]
    out = jnp.where(role != 0, pcm_r[src], pcm_l[src])
    out = out.reshape(B, T, 2 * F)
    if out_int16:
        return (jnp.clip(jnp.round(out), -32768.0, 32767.0)
                .astype(jnp.int16), new_state, nps20, nps34)
    return out * jnp.float32(1.0 / 32768.0), new_state, nps20, nps34


@functools.lru_cache(maxsize=None)
def _jitted_sbr_ps_apply_dual(out_int16: bool, modes: tuple):
    def fn(core_pcm, dense, ps_dense, state, ps20, ps34, cfg):
        return sbr_ps_apply_dual(core_pcm, dense, ps_dense, state,
                                 ps20, ps34, cfg, out_int16)

    return jax.jit(fn, donate_argnums=(3, 4, 5))


def jitted_sbr_ps_apply_dual(out_int16: bool = False):
    return _jitted_sbr_ps_apply_dual(out_int16, kernel_modes())


@functools.lru_cache(maxsize=None)
def _jitted_sbr_ps_apply(out_int16: bool, is34: bool, modes: tuple):
    def fn(core_pcm, dense, ps_dense, state, ps_state, cfg):
        return sbr_ps_apply(core_pcm, dense, ps_dense, state, ps_state,
                            cfg, out_int16, is34)

    return jax.jit(fn, donate_argnums=(3, 4))


def kernel_modes() -> tuple:
    """(seq_scan, lut_onehot) resolved fresh from the environment — the
    jit cache key component for every PS program variant."""
    return (_sync_seq_scan(), _sync_lut_mode())


def jitted_sbr_ps_apply(out_int16: bool = False, is34: bool = False):
    """ONE compiled SBR+PS program per (out dtype, PS band mode): the
    per-slot SBR cfg planes arrive as a runtime argument, so mixed
    SBR headers across the batch share the program."""
    return _jitted_sbr_ps_apply(out_int16, is34, kernel_modes())
