"""Batched SBR reconstruction on device (JAX/XLA, TPU-first).

One jitted program applies SBR to a whole [B, T] chunk of channel-frames:
QMF analysis (batched matmuls, kernels.qmf), covariance-LPC inverse
filtering (three lag dot-products + a 2x2 complex solve per subband line,
fully vectorized), patch gathers, envelope gains with limiter and boost
(band segment sums as indicator matmuls), noise/sinusoid assembly
(static gathers into the spec noise-phase table), and QMF synthesis —
no scans, no per-frame host round trips.

The host packs all grid-dependent data densely (aacjax.host.sbr_pack)
and keeps the sequential cross-frame state (scalefactor carry, chirp,
counters); the device carries only the QMF/X_low FIFO state between
chunks.  Numerics follow aacjax.host.sbr_decode, the per-channel
reference that is sample-exact against libavcodec; equality between the
two paths is enforced in tests/test_sbr_batch.py.
"""
from __future__ import annotations

import functools
import pathlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from aacjax.kernels import qmf

MAX_ENV = 5
BANDS = 64
SLOTS = 32      # QMF output slots per frame
YSLOTS = 38     # adjusted slots (32 + up to 6 VAR-class overhang)
HIST = 8        # carried X_low slots
ADJ = 2         # envelope/output window offset (see host.sbr_decode)
MAX_LIM = 16
_HI = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class SBRStaticConfig:
    """Header/table-derived per-SLOT configuration.

    Until round 4 this was a jit-static compilation key: one XLA program
    per header, and a batch mixing SBR headers exiled the minority slots
    to a permanent numpy path (VERDICT r4 #1).  It is now a per-slot
    DATA descriptor: plane_row() renders it into dense per-slot arrays
    (cfg_planes_zeros / set_cfg_row) that the ONE compiled program reads
    — the patch-source selection becomes a per-slot one-hot matmul, the
    limiter bands per-slot indicator rows, kx/limgain per-slot scalars —
    so heterogeneous-header fleets run on the device path with zero
    recompiles."""
    kx: int
    m: int
    src_band: tuple       # [64] patch source subband per target (0 pad)
    patched: tuple        # [64] 1 where the subband is HF-generated
    lim_ind: tuple        # [MAX_LIM * 64] flattened limiter indicators
    limgain: float
    n_lim: int

    @classmethod
    def from_tables(cls, t, limgain: float) -> "SBRStaticConfig":
        src = np.zeros(BANDS, np.int64)
        pat = np.zeros(BANDS, np.int64)
        g = 0
        for i in range(t.num_patches):
            for x in range(t.patch_num_subbands[i]):
                k = t.kx + g
                src[k] = t.patch_start_subband[i] + x
                pat[k] = 1
                g += 1
        lim = np.zeros((MAX_LIM, BANDS), np.float32)
        f_lim = np.asarray(t.f_lim)
        for b in range(min(t.n_lim, MAX_LIM)):
            lim[b, int(f_lim[b]): int(f_lim[b + 1])] = 1.0
        return cls(kx=int(t.kx), m=int(t.m),
                   src_band=tuple(int(v) for v in src),
                   patched=tuple(int(v) for v in pat),
                   lim_ind=tuple(float(v) for v in lim.reshape(-1)),
                   limgain=float(limgain), n_lim=int(t.n_lim))

    def plane_row(self) -> dict:
        """This config rendered as one slot's rows of the cfg planes."""
        kvec = np.arange(BANDS)
        patched = np.array(self.patched, np.float32)
        psel = np.zeros((32, BANDS), np.float32)
        psel[np.array(self.src_band), kvec] = patched
        lim = np.array(self.lim_ind, np.float32).reshape(MAX_LIM, BANDS)
        return dict(
            kx=np.int32(self.kx),
            patched=patched,
            in_range=((kvec >= self.kx) & (kvec < self.kx + self.m))
            .astype(np.float32),
            psel=psel,
            lim=lim,
            in_lim=lim.sum(axis=0),
            limgain=np.float32(self.limgain),
        )


def cfg_planes_zeros(B: int) -> dict:
    """Zeroed per-slot config planes (host numpy).  A zero row is a
    valid don't-care for slots with no SBR payload: has_sbr=0 masks the
    HF path out entirely and the low band passes through on the
    (kvec < 32) branch."""
    return dict(
        kx=np.full(B, 32, np.int32),
        patched=np.zeros((B, BANDS), np.float32),
        in_range=np.zeros((B, BANDS), np.float32),
        psel=np.zeros((B, 32, BANDS), np.float32),
        lim=np.zeros((B, MAX_LIM, BANDS), np.float32),
        in_lim=np.zeros((B, BANDS), np.float32),
        limgain=np.ones(B, np.float32),
    )


def set_cfg_row(planes: dict, s: int, cfg: SBRStaticConfig) -> None:
    for k, v in cfg.plane_row().items():
        planes[k][s] = v


def broadcast_cfg(cfg: SBRStaticConfig, B: int) -> dict:
    """One config broadcast to all B slots (single-header callers and
    tests)."""
    planes = cfg_planes_zeros(B)
    row = cfg.plane_row()
    for k in planes:
        planes[k][:] = row[k]
    return planes


@functools.lru_cache(maxsize=None)
def _noise_table() -> np.ndarray:
    d = np.load(pathlib.Path(__file__).parent.parent / "host"
                / "sbr_tables.npz")
    return d["noise_table"].astype(np.float32)  # [512, 2]


def sbr_state_init(B: int) -> dict:
    return dict(
        x_hist=jnp.zeros((B, qmf.ANA_HIST), jnp.float32),
        v_hist=jnp.zeros((B, qmf.SYN_HIST, 128), jnp.float32),
        xlow_r=jnp.zeros((B, HIST, 32), jnp.float32),
        xlow_i=jnp.zeros((B, HIST, 32), jnp.float32),
        # previous chunk's final-frame adjusted overhang (Y double-buffer)
        ytail_r=jnp.zeros((B, YSLOTS - SLOTS, BANDS), jnp.float32),
        ytail_i=jnp.zeros((B, YSLOTS - SLOTS, BANDS), jnp.float32),
    )


def _lpc_batch(wr, wi):
    """Covariance LPC per [B,T,32] subband line over the 40-slot window.
    wr/wi [B,T,40,32].  Returns (a0r, a0i, a1r, a1i) each [B,T,32]."""
    def seg(a, lo, hi):
        return a[:, :, lo:hi, :]

    def cdots(ar, ai, br, bi):
        """sum a * conj(b) over the slot axis -> (re, im)."""
        re = jnp.sum(ar * br + ai * bi, axis=2)
        im = jnp.sum(ai * br - ar * bi, axis=2)
        return re, im

    a_r, a_i = seg(wr, 2, 40), seg(wi, 2, 40)
    b1r, b1i = seg(wr, 1, 39), seg(wi, 1, 39)
    b2r, b2i = seg(wr, 0, 38), seg(wi, 0, 38)
    p01r, p01i = cdots(a_r, a_i, b1r, b1i)
    p02r, p02i = cdots(a_r, a_i, b2r, b2i)
    p12r, p12i = cdots(b1r, b1i, b2r, b2i)
    p11 = jnp.sum(b1r * b1r + b1i * b1i, axis=2)
    p22 = jnp.sum(b2r * b2r + b2i * b2i, axis=2)

    d = p11 * p22 - (p12r * p12r + p12i * p12i) / 1.000001
    safe_d = jnp.where(d != 0, d, 1.0)
    # a1 = (p01 * p12 - p02 * p11) / d        (plain complex product)
    a1r = (p01r * p12r - p01i * p12i - p02r * p11) / safe_d
    a1i = (p01r * p12i + p01i * p12r - p02i * p11) / safe_d
    a1r = jnp.where(d != 0, a1r, 0.0)
    a1i = jnp.where(d != 0, a1i, 0.0)
    # a0 = -(p01 + a1 * conj(p12)) / p11
    safe_p11 = jnp.where(p11 != 0, p11, 1.0)
    a0r = -(p01r + a1r * p12r + a1i * p12i) / safe_p11
    a0i = -(p01i + a1i * p12r - a1r * p12i) / safe_p11
    a0r = jnp.where(p11 != 0, a0r, 0.0)
    a0i = jnp.where(p11 != 0, a0i, 0.0)
    bad = ((a0r * a0r + a0i * a0i >= 16.0)
           | (a1r * a1r + a1i * a1i >= 16.0))
    z = jnp.zeros_like(a0r)
    return (jnp.where(bad, z, a0r), jnp.where(bad, z, a0i),
            jnp.where(bad, z, a1r), jnp.where(bad, z, a1i))


def expand_compact_dense(dense: dict) -> dict:
    """Inverse of sbr_pack.compact_dense, traced inside the jitted SBR
    program (XLA fuses the expansion into the consumers, so the ~3x H2D
    saving is free).  A non-compact dense dict passes through."""
    if 'eq_l2' not in dense:
        return dense
    l2 = dense['eq_l2']
    off = dense['eq_off'][:, :, :, None, None]
    mag = jnp.where(l2 == -32768, jnp.float32(0.0),
                    jnp.exp2(l2.astype(jnp.float32) * (1.0 / 1024.0) + off))
    sbits = dense['sbits']
    dtbits = dense['dtbits']
    return dict(
        e_orig=mag[:, :, 0], q_map=mag[:, :, 1],
        s_idx=(sbits & 1).astype(jnp.float32),
        s_map=((sbits >> 1) & 1).astype(jnp.float32),
        delta=(dtbits & 1).astype(jnp.float32),
        transient=((dtbits >> 1) & 1).astype(jnp.float32),
        covered=dense['covered'].astype(jnp.float32),
        has_sbr=dense['has_sbr'].astype(jnp.float32),
        env_id=dense['env_id'].astype(jnp.int32),
        sine_idx=dense['sine_idx'].astype(jnp.int32),
        noise_base=dense['noise_base'].astype(jnp.int32),
        bw=dense['bw'], i_temp=dense['i_temp'])


def sbr_apply(core_pcm: jax.Array, dense: dict, state: dict,
              cfg: dict,
              out_int16: bool = False,
              emit_x: bool = False):
    """core_pcm [B, T, F] (1/32768-scale floats) -> pcm [B, T, 2F] plus
    the updated QMF state.  dense: the host-packed arrays (sbr_pack).
    cfg: PER-SLOT config planes (cfg_planes_zeros / set_cfg_row /
    broadcast_cfg) — every header/table-derived quantity is per-slot
    data, so ONE compiled program serves a batch mixing SBR headers.

    With emit_x, returns (Xr, Xi [B, T*32, 64], xall low-band line
    [B, 8+T*32, 5] re/im, new_state) BEFORE synthesis — the Parametric
    Stereo stage (kernels.ps_batch) consumes the plane and runs its own
    dual synthesis (the v_hist state stays untouched)."""
    dense = expand_compact_dense(dense)
    B, T, F = core_pcm.shape
    S = T * SLOTS
    kx = cfg['kx']                                           # [B] i32
    kvec = jnp.arange(BANDS)
    patched = cfg['patched'][:, None, None, :]               # [B,1,1,64]
    # the full SBR range [kx, kx+m): the patch construction can cover
    # FEWER than m subbands (its source range k0..kx runs out — e.g.
    # start_freq=6/stop_freq=4 at 44.1k gives m=16 but only 14 patched),
    # and the spec still fills the unpatched tail with envelope noise
    # and sinusoids (xhigh is zero there, so gain*xhigh contributes
    # nothing, but q_m/s_m do) — ffmpeg sbr_hf_assemble semantics,
    # mirrored by host.sbr_decode.  Masking those bands out of the
    # output silenced them (found by tools/diff_fuzz.py --he)
    in_range = cfg['in_range'][:, None, None, :]             # [B,1,1,64]

    # --- analysis (FFmpeg-unit scale: full-scale PCM) ---------------------
    xr, xi, x_hist = qmf.analysis(
        core_pcm.reshape(B, T * F) * jnp.float32(32768.0), state['x_hist'])
    xall_r = jnp.concatenate([state['xlow_r'], xr], axis=1)  # [B, 8+S, 32]
    xall_i = jnp.concatenate([state['xlow_i'], xi], axis=1)
    new_state = dict(x_hist=x_hist,
                     xlow_r=xall_r[:, -HIST:], xlow_i=xall_i[:, -HIST:])
    YS = YSLOTS

    # per-frame 40-slot windows: rows 32t+d of xall for d in [0, 40) —
    # overlapping stride-32 blocks, i.e. adjacent row pairs of the
    # [T+1, 32, 32] reshape.  Static slices + concat, NOT a gather
    # (per-element gathers serialize on TPU).
    pad = jnp.zeros((B, 32 * (T + 1) - xall_r.shape[1], 32), jnp.float32)
    rr = jnp.concatenate([xall_r, pad], axis=1).reshape(B, T + 1, 32, 32)
    ri = jnp.concatenate([xall_i, pad], axis=1).reshape(B, T + 1, 32, 32)
    wr = jnp.concatenate([rr[:, :T], rr[:, 1:, :HIST]], axis=2)  # [B,T,40,32]
    wi = jnp.concatenate([ri[:, :T], ri[:, 1:, :HIST]], axis=2)

    # --- HF generation -----------------------------------------------------
    # patch-source selection x[..., src_band] as an exact one-hot matmul
    # (HIGHEST precision keeps 1.0*x bit-exact) — a constant-index
    # gather along the lane axis is a cross-lane shuffle XLA:TPU
    # executes element-at-a-time; the MXU does it for free.  The
    # selection matrix is PER-SLOT (cfg['psel'] [B,32,64]), so the op is
    # a batched matmul — each slot patches by its own header's map
    psel_j = cfg['psel']

    def sel(x):
        if x.ndim == 4:
            return jnp.einsum('btsn,bnk->btsk', x, psel_j, precision=_HI)
        return jnp.einsum('btn,bnk->btk', x, psel_j, precision=_HI)

    a0r, a0i, a1r, a1i = _lpc_batch(wr, wi)                  # [B,T,32]
    sr = sel(wr)                                             # [B,T,40,64]
    si = sel(wi)
    a0r_k = sel(a0r) * dense['bw']                           # [B,T,64]
    a0i_k = sel(a0i) * dense['bw']
    bw2 = dense['bw'] * dense['bw']
    a1r_k = sel(a1r) * bw2
    a1i_k = sel(a1i) * bw2
    cur_r, cur_i = sr[:, :, ADJ: ADJ + YS], si[:, :, ADJ: ADJ + YS]
    l1r, l1i = sr[:, :, ADJ - 1: ADJ - 1 + YS], si[:, :, ADJ - 1: ADJ - 1 + YS]
    l2r, l2i = sr[:, :, ADJ - 2: ADJ - 2 + YS], si[:, :, ADJ - 2: ADJ - 2 + YS]
    xh_r = (cur_r + l1r * a0r_k[:, :, None, :] - l1i * a0i_k[:, :, None, :]
            + l2r * a1r_k[:, :, None, :] - l2i * a1i_k[:, :, None, :])
    xh_i = (cur_i + l1r * a0i_k[:, :, None, :] + l1i * a0r_k[:, :, None, :]
            + l2r * a1i_k[:, :, None, :] + l2i * a1r_k[:, :, None, :])
    xh_r = xh_r * patched                                    # [B,T,38,64]
    xh_i = xh_i * patched

    # --- envelope energies -------------------------------------------------
    oh = ((dense['env_id'][..., None] == jnp.arange(MAX_ENV)[None, None, None])
          .astype(jnp.float32) * dense['covered'][..., None])  # [B,T,38,5]
    counts = jnp.sum(oh, axis=2)                             # [B,T,5]
    xh2 = xh_r * xh_r + xh_i * xh_i
    e_curr = (jnp.einsum('btse,btsk->btek', oh, xh2, precision=_HI)
              / jnp.maximum(counts, 1.0)[..., None])         # [B,T,5,64]

    # --- gains (sbr_decode formulas, vectorized over envelopes) ------------
    e_orig, q_map = dense['e_orig'], dense['q_map']
    s_idx, s_map = dense['s_idx'], dense['s_map']
    delta = dense['delta'][..., None]                        # [B,T,5,1]
    q_m = jnp.sqrt(e_orig * q_map / (1.0 + q_map))
    s_m = s_idx * jnp.sqrt(e_orig / (1.0 + q_map))
    gain = jnp.where(
        s_map != 0.0,
        jnp.sqrt(e_orig * q_map / ((1.0 + e_curr) * (1.0 + q_map))),
        jnp.sqrt(e_orig / ((1.0 + e_curr) * (1.0 + q_map * delta)))) + 1e-12

    # limiter + boost per limiter band (disjoint bands -> one shot);
    # indicator rows are per-slot (cfg['lim'] [B,MAX_LIM,64]) so every
    # slot limits over its own header's band grid
    lim = cfg['lim']
    eps = 1e-12
    sum_o = jnp.einsum('btek,blk->btel', e_orig, lim, precision=_HI)
    sum_c = jnp.einsum('btek,blk->btel', e_curr, lim, precision=_HI)
    limgain = cfg['limgain'][:, None, None, None]            # [B,1,1,1]
    gmax_l = jnp.minimum(
        limgain * jnp.sqrt((eps + sum_o) / (eps + sum_c)), 1e5)
    in_lim = cfg['in_lim'][:, None, None, :]                 # [B,1,1,64]
    gmax = (jnp.einsum('btel,blk->btek', gmax_l, lim, precision=_HI)
            + (1.0 - in_lim) * 1e5)
    q_m = jnp.minimum(q_m, q_m * gmax / gain)
    gain = jnp.minimum(gain, gmax)
    sum_b = jnp.einsum(
        'btek,blk->btel',
        e_curr * gain * gain + s_m * s_m
        + delta * (s_m == 0.0).astype(jnp.float32) * q_m * q_m,
        lim, precision=_HI)
    boost_l = jnp.minimum(jnp.sqrt((eps + sum_o) / (eps + sum_b)),
                          1.584893192)
    boost = (jnp.einsum('btel,blk->btek', boost_l, lim, precision=_HI)
             + (1.0 - in_lim))
    gain = gain * boost
    q_m = q_m * boost
    s_m = s_m * boost

    # --- per-slot expansion + assembly --------------------------------------
    g_slot = jnp.einsum('btse,btek->btsk', oh, gain, precision=_HI)
    q_slot = jnp.einsum('btse,btek->btsk', oh, q_m, precision=_HI)
    s_slot = jnp.einsum('btse,btek->btsk', oh, s_m, precision=_HI)
    tr_slot = jnp.einsum('btse,bte->bts', oh, dense['transient'],
                         precision=_HI)[..., None]

    y_r = xh_r * g_slot
    y_i = xh_i * g_slot

    # noise: each (b,t,slot) row reads 64 CONSECUTIVE table entries
    # (base + k - kx + 1 mod 512).  Neither a per-element gather (~34M
    # random indices: 95% of the program, fusion profile 180/190 ms) nor
    # a vmapped dynamic_slice (lowers to a SERIAL while loop of ~160k
    # tiny update-slices: 208 of 212 ms/step, he_prof --trace) survives
    # on TPU.  Decompose the row shift s = 8*hi + lo instead: the coarse
    # shift is an exact 64-way one-hot matmul (MXU; 0/1 x f32 is exact
    # under bf16x3) into a [64, 71, 2] Hankel slab of the table, the
    # fine shift an 8-way masked select over static slices (VPU).  No
    # loop, no gather: 208 ms -> sub-ms.
    ntab = np.asarray(_noise_table(), np.float32)            # [512, 2]
    ntab2 = np.concatenate([ntab, ntab[:BANDS - 1]], axis=0)  # [575, 2]
    nstart = (dense['noise_base'] + (1 - kx[:, None, None])) & 0x1FF
    hi = nstart >> 3                                         # 0..63
    lo = nstart & 7                                          # 0..7
    hank = np.stack([ntab2[8 * h: 8 * h + BANDS + 7]
                     for h in range(64)])                    # [64, 71, 2]
    oh_hi = (hi[..., None] == jnp.arange(64)).astype(jnp.float32)
    tmp = jnp.einsum('btsh,hjc->btsjc', oh_hi, jnp.asarray(hank),
                     precision=_HI)                          # [B,T,38,71,2]
    noise = None
    for sh in range(8):
        term = jnp.where((lo == sh)[..., None, None],
                         tmp[:, :, :, sh: sh + BANDS, :], 0.0)
        noise = term if noise is None else noise + term      # [B,T,38,64,2]
    n_on = ((s_slot == 0.0).astype(jnp.float32) * (1.0 - tr_slot)
            * dense['covered'][..., None] * in_range)
    y_r = y_r + n_on * q_slot * noise[..., 0]
    y_i = y_i + n_on * q_slot * noise[..., 1]

    # sinusoids: phase rotation (re, +im, -re, -im) with per-band sign on
    # the imaginary phases
    phase = dense['sine_idx'][..., None]                     # [B,T,32,1]
    sign_k = jnp.where((kvec & 1) == 1, -1.0, 1.0)[None, None, None, :]
    y_r = y_r + jnp.where(phase == 0, s_slot, 0.0) \
              - jnp.where(phase == 2, s_slot, 0.0)
    y_i = y_i + jnp.where(phase == 1, s_slot * sign_k, 0.0) \
              - jnp.where(phase == 3, s_slot * sign_k, 0.0)

    # --- final X + synthesis -------------------------------------------------
    # VAR-class Y-carry: each frame's first i_temp slots take the
    # PREVIOUS frame's adjusted overhang (slots 32..38 of y) — a
    # shifted-frame gather, like the overlap-add (FFmpeg's Y double
    # buffer; host.sbr_decode y_tail semantics)
    tail_r = jnp.concatenate([state['ytail_r'][:, None],
                              y_r[:, :-1, SLOTS:YS]], axis=1)  # [B,T,6,64]
    tail_i = jnp.concatenate([state['ytail_i'][:, None],
                              y_i[:, :-1, SLOTS:YS]], axis=1)
    carry = (jnp.arange(YS - SLOTS)[None, None, :, None]
             < dense['i_temp'][..., None, None])              # [B,T,6,1]
    yo_r = jnp.concatenate(
        [jnp.where(carry, tail_r, y_r[:, :, :YS - SLOTS]),
         y_r[:, :, YS - SLOTS:SLOTS]], axis=2)                # [B,T,32,64]
    yo_i = jnp.concatenate(
        [jnp.where(carry, tail_i, y_i[:, :, :YS - SLOTS]),
         y_i[:, :, YS - SLOTS:SLOTS]], axis=2)
    new_state['ytail_r'] = y_r[:, -1, SLOTS:YS]
    new_state['ytail_i'] = y_i[:, -1, SLOTS:YS]

    out_r, out_i = wr[:, :, ADJ: ADJ + SLOTS], wi[:, :, ADJ: ADJ + SLOTS]
    has = dense['has_sbr'][..., None, None]                  # [B,T,1,1]
    kx_mask = (kvec[None, :] < kx[:, None]).astype(jnp.float32)
    low_mask = jnp.where(has != 0.0,
                         kx_mask[:, None, None, :],
                         (kvec < 32).astype(jnp.float32))
    pad = jnp.zeros((B, T, SLOTS, BANDS - 32), jnp.float32)
    xlow64_r = jnp.concatenate([out_r, pad], axis=3)
    xlow64_i = jnp.concatenate([out_i, pad], axis=3)
    hf_mask = in_range * has
    Xr = xlow64_r * low_mask + yo_r * hf_mask
    Xi = xlow64_i * low_mask + yo_i * hf_mask

    if emit_x:
        return (Xr.reshape(B, S, BANDS), Xi.reshape(B, S, BANDS),
                xall_r[:, :, :5], xall_i[:, :, :5], new_state)

    pcm, v_hist = qmf.synthesis(Xr.reshape(B, S, BANDS),
                                Xi.reshape(B, S, BANDS), state['v_hist'])
    new_state['v_hist'] = v_hist
    pcm = pcm.reshape(B, T, 2 * F)
    if out_int16:
        # already in native sample units before the 1/32768 normalization
        out = jnp.clip(jnp.round(pcm), -32768.0, 32767.0).astype(jnp.int16)
        return out, new_state
    return pcm * jnp.float32(1.0 / 32768.0), new_state


@functools.lru_cache(maxsize=None)
def jitted_sbr_apply(out_int16: bool = False):
    """ONE compiled program for all headers: the per-slot cfg planes are
    a runtime argument (not donated — they persist across chunks and
    change only when a slot's header changes)."""
    def fn(core_pcm, dense, state, cfg):
        return sbr_apply(core_pcm, dense, state, cfg, out_int16)
    return jax.jit(fn, donate_argnums=(2,))
