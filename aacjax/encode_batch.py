"""TPU-batched AAC-LC encoding: the analysis hot loops on the device,
batched over streams (SURVEY.md §2.9 applied in reverse — the reference
has no encoder at all).

Division of labor per chunk of S streams x nF frames:

  device (2 jitted dispatches covering all channel-frames at once):
    1. ANALYSIS — int16 PCM arrives once ([S*ch, nF*F+F], half the
       bytes of f32); the program builds the 50%-overlapped segments,
       runs the windowed forward MDCT as einsums (long windows selected
       branch-free by plan index; EIGHT_SHORT via the 8xS sub-matmul),
       band energies as `coefs^2 @ band_matrix` (MXU), ATH +
       directional psy spreading (lax.scan over ~49 bands), the
       analytic base-scalefactor model refined by two measured-
       distortion quantization trials, and an EXACT book-11 Huffman
       cost (LUT gather + signs + escapes) over a static grid of rate
       offsets -> est_bits [N, K].
    2. QUANTIZE — mid-tread quantization at each channel-frame's chosen
       offset -> q int16 [N, F] + per-band scalefactors (one compact
       D2H).
  host:
    window-sequence planning, rate choice per frame from the est_bits
    grid + a per-stream bit reservoir (replacing the per-frame
    bisection), exact per-band codebook selection
    (bands_books_and_bits), DPCM clamping and bitstream writing.

Quality scope: sine windows, long/short switching with the [8]
grouping, independent L/R (no M/S), TNS/PNS/IS off — the per-stream
`AACEncoder` remains the quality-first path; this is the
high-throughput serving encoder.  Output is standard AAC-LC that any
decoder plays (round-tripped against aacjax and libavcodec in
tests/test_encode_batch.py).
"""
from __future__ import annotations

import functools
import time

import numpy as np

from aacjax import tables
from aacjax.encode import (EIGHT_SHORT, ONLY_LONG, PsyParams,
                           _analysis_matrix_cached, _ath_energy,
                           _COST_LUTS, bands_books_and_bits,
                           detect_transients, window_sequence_plan)
from aacjax.host.asc import make_asc, parse_asc

FRAME = 1024

# rate-offset grid the device costs in one pass (bits are nonincreasing
# along the grid: higher offset -> coarser quantization)
OFF_GRID = np.array([-48, -36, -24, -16, -10, -6, -3, 0, 3, 7, 11,
                     16, 22, 30, 40, 52], np.float32)


# ---------------------------------------------------------------------------
# static per-config arrangements
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _arrangement(sample_index: int, cutoff_bin: int, frame: int = FRAME):
    """Band matrices, per-bin band maps and gather layouts for one
    sample-rate config.  Long bands are the contiguous swb runs up to
    the cutoff; short uses ONE group of 8 windows, so band sfb spans the
    interleaved union {w*S + [a, b)} (a static gather ordering makes it
    contiguous for the host's codebook pass)."""
    cfg = parse_asc(make_asc(2, sample_index, 1, frame_length=frame))
    off_l = np.asarray(cfg.swb_offsets_long, np.int64)
    off_s = np.asarray(cfg.swb_offsets_short, np.int64)
    max_sfb_l = int(np.searchsorted(off_l, cutoff_bin, "left"))
    max_sfb_l = min(max(max_sfb_l, 1), cfg.swb_count_long)
    S = frame // 8
    max_sfb_s = int(np.searchsorted(off_s, cutoff_bin // 8, "left"))
    max_sfb_s = min(max(max_sfb_s, 1), cfg.swb_count_short)
    nb = max(max_sfb_l, max_sfb_s)

    def band_matrix(offsets, n_bands, stride, n_rep):
        m = np.zeros((frame, nb), np.float32)
        for b in range(n_bands):
            a, e = int(offsets[b]), int(offsets[b + 1])
            for w in range(n_rep):
                m[w * stride + a: w * stride + e, b] = 1.0
        return m

    bm_l = band_matrix(off_l, max_sfb_l, frame, 1)
    bm_s = band_matrix(off_s, max_sfb_s, S, 8)

    def bin_band(bm):
        idx = np.full(frame, nb, np.int64)
        for b in range(bm.shape[1]):
            idx[bm[:, b] > 0] = b
        return idx

    gidx_s: list[int] = []
    ptr_s = [0]
    for b in range(max_sfb_s):
        a, e = int(off_s[b]), int(off_s[b + 1])
        for w in range(8):
            gidx_s.extend(range(w * S + a, w * S + e))
        ptr_s.append(len(gidx_s))
    ptr_l = off_l[: max_sfb_l + 1].astype(np.int64)

    def pad(a, fill):
        out = np.full(nb, fill, np.float32)
        out[: len(a)] = a
        return out

    ath_l = _ath_energy(off_l[: max_sfb_l + 1], cfg.sample_rate,
                        frame, frame)
    ath_s = 8.0 * _ath_energy(off_s[: max_sfb_s + 1], cfg.sample_rate,
                              S, S)   # energies sum over the 8 windows
    return dict(
        cfg=cfg, nb=nb, max_sfb_l=max_sfb_l, max_sfb_s=max_sfb_s,
        bm_l=bm_l, bm_s=bm_s,
        bb_l=bin_band(bm_l), bb_s=bin_band(bm_s),
        gidx_s=np.asarray(gidx_s, np.int64),
        ptr_s=np.asarray(ptr_s, np.int64), ptr_l=ptr_l,
        ath_l=pad(ath_l, 1e30), ath_s=pad(ath_s, 1e30),
        coded_l=np.arange(nb) < max_sfb_l,
        coded_s=np.arange(nb) < max_sfb_s,
    )


@functools.lru_cache(maxsize=None)
def _long_windows(frame: int = FRAME):
    """[3, 2F] windowed-analysis vectors for ONLY_LONG / LONG_START /
    LONG_STOP (sine shape), matching AACEncoder._window_long."""
    F = frame
    S = F // 8
    MID = (F - S) // 2
    rise = tables.long_window(0, F)
    srise = tables.short_window(0, S)
    w_only = np.concatenate([rise, rise[::-1]])
    w_start = np.concatenate([rise, np.ones(MID), srise[::-1],
                              np.zeros(MID)])
    w_stop = np.concatenate([np.zeros(MID), srise, np.ones(MID),
                             rise[::-1]])
    return np.stack([w_only, w_start, w_stop]).astype(np.float32)


# ---------------------------------------------------------------------------
# device programs
# ---------------------------------------------------------------------------
def _analysis_fn(sample_index: int, cutoff_bin: int, frame: int,
                 n_frames: int, psy_key: tuple):
    """Build the (un-jitted) analysis program — separated from the jit
    wrapper so runtime.mesh can compile the same body with explicit
    ('stream',) shardings for multi-chip encoding."""
    import jax
    import jax.numpy as jnp

    arr = _arrangement(sample_index, cutoff_bin, frame)
    F = frame
    S = F // 8
    MID = (F - S) // 2
    nb = arr["nb"]
    A_l = jnp.asarray(_analysis_matrix_cached(2 * F).astype(np.float32))
    A_s = jnp.asarray(_analysis_matrix_cached(2 * S).astype(np.float32))
    wins_l = jnp.asarray(_long_windows(frame))
    srise = tables.short_window(0, S)
    win_s = jnp.asarray(np.concatenate([srise, srise[::-1]])
                        .astype(np.float32))
    smr_db, up_db, down_db = psy_key
    up = np.float32(10.0 ** (-up_db / 10.0))
    down = np.float32(10.0 ** (-down_db / 10.0))
    smr = np.float32(10.0 ** (-smr_db / 10.0))

    bm_l = jnp.asarray(arr["bm_l"])
    bm_s = jnp.asarray(arr["bm_s"])
    bb_l = jnp.asarray(arr["bb_l"])
    bb_s = jnp.asarray(arr["bb_s"])
    in_l = jnp.asarray((arr["bb_l"] < nb).astype(np.float32))
    in_s = jnp.asarray((arr["bb_s"] < nb).astype(np.float32))
    ath_l = jnp.asarray(arr["ath_l"])
    ath_s = jnp.asarray(arr["ath_s"])
    coded_l = jnp.asarray(arr["coded_l"])
    coded_s = jnp.asarray(arr["coded_s"])
    lut11, radix, offs, n_tup, _, _ = _COST_LUTS[11]

    def spread(e):
        def step_up(carry, x):
            m = jnp.maximum(x, carry * up)
            return m, m
        _, eu = jax.lax.scan(step_up, jnp.zeros(e.shape[0]), e.T)
        def step_dn(carry, x):
            m = jnp.maximum(x, carry * down)
            return m, m
        _, ed = jax.lax.scan(step_dn, jnp.zeros(e.shape[0]), eu[::-1])
        return ed[::-1].T * smr

    def quant(x, sf_bin):
        gain = jnp.exp2((sf_bin - 100.0) * 0.25)
        c = jnp.floor(jnp.power(jnp.abs(x) / gain, 0.75) + 0.4054)
        return jnp.sign(x) * jnp.minimum(c, 8191.0)

    def recon(q, sf_bin):
        return (jnp.sign(q) * jnp.power(jnp.abs(q), 4.0 / 3.0)
                * jnp.exp2((sf_bin - 100.0) * 0.25))

    # coded-region extents (both multiples of 4, so Huffman pairs and
    # quads never straddle the slice boundaries)
    cut_l = int(arr["ptr_l"][-1])
    cut_s = int(arr["cfg"].swb_offsets_short[arr["max_sfb_s"]])
    Pe = max(cut_l, 8 * cut_s)

    # Static band->bin / band->coded-region expansion matrices.  Every
    # per-bin lookup of a per-band value in this program indexes with a
    # CONSTANT map (bb_l / bb_s are fixed per window type), so the
    # take_along_axis gathers — ~60 M elem/s on this chip — are
    # replaced by one-hot matmuls on the MXU (the dequant/PS idiom,
    # kernels/pipeline.py:143).  Each output column receives exactly
    # one 1.0 term, so Precision.HIGHEST dots are bit-identical to the
    # gather for any f32 operand.
    hi_p = jax.lax.Precision.HIGHEST

    def _expand(bb, width):
        E = np.zeros((nb + 1, width), np.float32)
        E[np.asarray(bb), np.arange(width)] = 1.0
        return jnp.asarray(E)

    El_bin = _expand(arr["bb_l"], F)
    Es_bin = _expand(arr["bb_s"], F)
    bbe_l = np.concatenate([np.asarray(arr["bb_l"])[:cut_l],
                            np.full(Pe - cut_l, nb, np.int64)])
    bbe_s = np.concatenate([
        np.asarray(arr["bb_s"]).reshape(8, S)[:, :cut_s].reshape(-1),
        np.full(Pe - 8 * cut_s, nb, np.int64)])
    El_reg = _expand(bbe_l, Pe)
    Es_reg = _expand(bbe_s, Pe)
    # pair-cost LUT as a [17,17] matrix for the bilinear one-hot
    # contraction in est_at; values are small integers (codeword bit
    # counts <= 2^8), exact in bf16, so the DEFAULT-precision MXU pass
    # is exact there too
    L17 = jnp.asarray(lut11.astype(np.float32).reshape(17, 17))

    def analysis(pcm_i16, w_idx, is_short):
        """pcm_i16 [B, nF*F + F] int16 (frame of history first);
        w_idx [B, nF] in {0,1,2}; is_short [B, nF] bool.
        Flattened channel-frame index: n = b * nF + f."""
        B = pcm_i16.shape[0]
        x = pcm_i16.astype(jnp.float32)
        # 50%-overlap segmentation as strided reshapes (no gather: the
        # general-gather path measures ~60 M elem/s on this chip, vs
        # effectively free reshapes)
        first = x[:, : n_frames * F].reshape(B, n_frames, F)
        second = x[:, F:].reshape(B, n_frames, F)
        seg = jnp.concatenate([first, second], axis=2) \
            .reshape(B * n_frames, 2 * F)
        N = B * n_frames
        w_idx = w_idx.reshape(N)
        sel = is_short.reshape(N)[:, None]

        coefs_l = (seg * wins_l[w_idx]) @ A_l                  # [N, F]
        # the 8 short sub-windows overlap by S: two strided views
        y = seg[:, MID: MID + 9 * S]
        subs = jnp.concatenate(
            [y[:, : 8 * S].reshape(N, 8, S),
             y[:, S:].reshape(N, 8, S)], axis=2)               # [N, 8, 2S]
        coefs_s = ((subs * win_s) @ A_s).reshape(N, F)
        coefs_l = coefs_l * in_l
        coefs_s = coefs_s * in_s
        coefs = jnp.where(sel, coefs_s, coefs_l)
        bin_band = jnp.where(sel, bb_s[None, :], bb_l[None, :])

        def band_reduce(v):                                    # [N,F]->[N,nb]
            return jnp.where(sel, v @ bm_s, v @ bm_l)

        def coded_region(v, fill=0.0):
            """Slice [N, F] down to the coded bins as [N, Pe]: longs are
            the contiguous prefix, shorts the per-window prefixes; both
            preserve pair/quad alignment.  Zero-pads to the common Pe."""
            vl = v[:, :cut_l]
            if Pe > cut_l:
                vl = jnp.pad(vl, ((0, 0), (0, Pe - cut_l)),
                             constant_values=fill)
            vs = v.reshape(N, 8, S)[:, :, :cut_s].reshape(N, 8 * cut_s)
            if Pe > 8 * cut_s:
                vs = jnp.pad(vs, ((0, 0), (0, Pe - 8 * cut_s)),
                             constant_values=fill)
            return jnp.where(sel, vs, vl)

        e = band_reduce(coefs * coefs)
        ath = jnp.where(sel, ath_s[None, :], ath_l[None, :])
        thr = jnp.maximum(spread(e), ath)
        coded = jnp.where(sel, coded_s[None, :], coded_l[None, :])

        absc = jnp.abs(coefs)
        # per-band max via static slices (long bands are contiguous;
        # short bands are 8 strided segments) — no scatter in the graph
        absc_s8 = absc.reshape(N, 8, S)
        m_cols = []
        for bnd in range(nb):
            if bnd < arr["max_sfb_l"]:
                a0, a1 = int(arr["ptr_l"][bnd]), int(arr["ptr_l"][bnd + 1])
                ml = absc[:, a0:a1].max(axis=1)
            else:
                ml = jnp.zeros(N)
            offs_s = arr["cfg"].swb_offsets_short
            if bnd < arr["max_sfb_s"]:
                s0, s1 = int(offs_s[bnd]), int(offs_s[bnd + 1])
                ms = absc_s8[:, :, s0:s1].max(axis=(1, 2))
            else:
                ms = jnp.zeros(N)
            m_cols.append(jnp.where(sel[:, 0], ms, ml))
        m = jnp.stack(m_cols, axis=1)                          # [N, nb]
        lg = jnp.log2(jnp.maximum(m, 1e-30))
        fit_sf = jnp.maximum(jnp.ceil(
            100.0 + 4.0 * (lg - (4.0 / 3.0) * np.log2(8191.0))), 0.0)
        zero_sf = jnp.ceil(
            100.0 + 4.0 * (lg - (4.0 / 3.0) * np.log2(0.5946)))
        sq = band_reduce(jnp.sqrt(absc))
        g_t = jnp.power(thr / jnp.maximum(0.1481 * sq, 1e-30), 2.0 / 3.0)
        base = jnp.floor(100.0 + 4.0 * jnp.log2(jnp.maximum(g_t, 1e-30)))
        base = jnp.clip(base, fit_sf, zero_sf)

        def sf_per_bin(sfb):
            ext = jnp.concatenate(
                [sfb, jnp.full((N, 1), 255.0)], axis=1)
            return jnp.where(sel,
                             jnp.dot(ext, Es_bin, precision=hi_p),
                             jnp.dot(ext, El_bin, precision=hi_p))

        for _ in range(2):                                     # quant trials
            sfx = sf_per_bin(base)
            q = quant(coefs, sfx)
            d = band_reduce((coefs - recon(q, sfx)) ** 2)
            over = d > thr
            step = jnp.ceil(jnp.log2(jnp.maximum(d / thr, 1.0)) / 0.375)
            base = jnp.clip(
                base - jnp.where(over, jnp.maximum(step, 1.0), 0.0),
                fit_sf, zero_sf)
        base = jnp.where(coded, base, 255.0)

        # --- rate-offset cost grid.  Estimated channel payload bits:
        # exact book-11 cost (LUT pairs + signs + escapes) over NONZERO
        # bands only — all-zero bands ride as book-0 sections for ~free
        # in the real bitstream — plus ~6 bits/coded band of
        # scalefactor+section side.  A slight overestimate vs the
        # host's final multi-book selection; errors land on the safe
        # side.  Restructured for the chip: every per-offset term is
        # elementwise on the coded region (quantized magnitudes re-
        # derived from |coef|^0.75 by a pure exp2 of the offset; band
        # nonzero-ness from the zero_sf bound instead of a band-matmul
        # of the quantized values) + the one unavoidable pair-LUT
        # gather.
        ce = coded_region(coefs)                           # [N, Pe]
        t34 = jnp.power(jnp.abs(ce), 0.75)

        def band_to_region(v, fill):
            ext = jnp.concatenate(
                [v, jnp.full((N, 1), fill)], axis=1)
            return jnp.where(sel,
                             jnp.dot(ext, Es_reg, precision=hi_p),
                             jnp.dot(ext, El_reg, precision=hi_p))

        b_b = band_to_region(base, 255.0)
        f_b = band_to_region(fit_sf, 255.0)
        z_b = band_to_region(zero_sf, 0.0)

        def est_at(_, o):
            sfb = jnp.clip(b_b + o, f_b, 255.0)
            c = jnp.floor(t34 * jnp.exp2((100.0 - sfb) * 0.1875)
                          + 0.4054)
            a = jnp.minimum(c, 8191.0)
            # sfb < zero_sf  <=>  the band's max magnitude quantizes
            # to >= 1 (same bound that defined zero_sf above)
            nz = sfb < z_b
            p = jnp.minimum(a, 16.0).astype(jnp.int32).reshape(N, -1, 2)
            pair_nz = nz.reshape(N, -1, 2)[:, :, 0]
            # bilinear one-hot contraction u.L17.v == LUT[p0*17+p1]:
            # 0/1 one-hots and <=2^8-integer LUT rows are bf16-exact,
            # so the default-precision MXU pass reproduces the gather
            # bit-for-bit at MXU rather than gather throughput
            u = ((p[:, :, 0, None] == jnp.arange(17)).astype(jnp.float32)
                 * pair_nz[:, :, None].astype(jnp.float32))
            v = (p[:, :, 1, None] == jnp.arange(17)).astype(jnp.float32)
            w = jnp.einsum('npi,ij->npj', u, L17)
            lut_bits = jnp.einsum('npj,npj->n', w, v)
            signs = (a > 0).sum(axis=1)
            nbits = jnp.maximum(
                jnp.floor(jnp.log2(jnp.maximum(a, 1.0))), 4.0)
            extra = jnp.where(a >= 16.0, 2.0 * nbits - 3.0,
                              0.0).sum(axis=1)
            side_nz = jnp.clip(base + o, fit_sf, 255.0) < zero_sf
            side = 6.0 * side_nz.sum(axis=1).astype(jnp.float32)
            return 0, ((lut_bits + signs).astype(jnp.float32)
                       + extra + side)
        _, est = jax.lax.scan(est_at, 0, jnp.asarray(OFF_GRID))
        est = est.T                                            # [N, K]
        return coefs, base, fit_sf, est, bin_band.astype(jnp.int32)

    return analysis


@functools.lru_cache(maxsize=None)
def _jitted_analysis(sample_index: int, cutoff_bin: int, frame: int,
                     n_frames: int, psy_key: tuple):
    import jax
    return jax.jit(_analysis_fn(sample_index, cutoff_bin, frame,
                                n_frames, psy_key))


def _quantize_fn(w8: int = FRAME // 8, sample_index: int | None = None,
                 cutoff_bin: int | None = None, frame: int = FRAME):
    """w8: coded-region width per short sub-block; the packed D2H width
    is W = 8*w8 (<= FRAME).  Bins beyond the rate cutoff are never
    written to the bitstream, so only the coded region crosses the
    link: long rows ship their flat prefix [:W], short rows ship the
    per-128-bin-block prefixes [:, :, :w8] — the host unpacker
    (BatchEncoder._unpack_q) re-expands using the window plan.

    With (sample_index, cutoff_bin) given, the per-bin scalefactor map
    rides the static band->bin one-hot expansion matmul instead of a
    take_along_axis gather (bit-identical; see _analysis_fn) — the
    gather was the entire quantize stage's device time.  The traced
    bin_band argument is then unused (XLA drops it)."""
    import jax
    import jax.numpy as jnp

    S8 = FRAME // 8
    W = 8 * w8
    hi_p = jax.lax.Precision.HIGHEST
    exp_mats = None
    if sample_index is not None:
        arr = _arrangement(sample_index, cutoff_bin, frame)
        nb = arr["nb"]

        def _expand(bb):
            E = np.zeros((nb + 1, frame), np.float32)
            E[np.asarray(bb), np.arange(frame)] = 1.0
            return jnp.asarray(E)

        exp_mats = (_expand(arr["bb_l"]), _expand(arr["bb_s"]))

    def fn(coefs, base, fit_sf, bin_band, off, is_short_row):
        """Quantize at the chosen per-channel-frame offset -> (packed q
        int16 [N, W], per-band sf int16 [N, nb])."""
        N = coefs.shape[0]
        sfb = jnp.clip(base + off[:, None], fit_sf, 255.0)
        ext = jnp.concatenate([sfb, jnp.full((N, 1), 255.0)], axis=1)
        if exp_mats is not None:
            El_bin, Es_bin = exp_mats
            sf_bin = jnp.where(is_short_row[:, None],
                               jnp.dot(ext, Es_bin, precision=hi_p),
                               jnp.dot(ext, El_bin, precision=hi_p))
        else:
            sf_bin = jnp.take_along_axis(ext, bin_band, axis=1)
        gain = jnp.exp2((sf_bin - 100.0) * 0.25)
        c = jnp.floor(jnp.power(jnp.abs(coefs) / gain, 0.75) + 0.4054)
        q = (jnp.sign(coefs) * jnp.minimum(c, 8191.0)).astype(jnp.int16)
        if W >= FRAME:
            return q, sfb.astype(jnp.int16)
        q_long = q[:, :W]
        q_short = q.reshape(N, 8, S8)[:, :, :w8].reshape(N, W)
        packed = jnp.where(is_short_row[:, None], q_short, q_long)
        return packed, sfb.astype(jnp.int16)

    return fn


@functools.lru_cache(maxsize=None)
def _jitted_quantize(w8: int = FRAME // 8, sample_index: int | None = None,
                     cutoff_bin: int | None = None, frame: int = FRAME):
    import jax
    return jax.jit(_quantize_fn(w8, sample_index, cutoff_bin, frame))


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------
class BatchEncoder:
    """Encodes S concurrent same-config AAC-LC streams with the
    analysis on the device.  See the module docstring for the
    device/host split and the quality scope."""

    def __init__(self, sample_rate: int = 44100, channels: int = 2,
                 bitrate: int = 128_000, n_streams: int = 1,
                 cutoff_hz: float | None = None, mesh=None):
        si = int(np.argmin(np.abs(
            tables.SAMPLE_RATES[:12].astype(np.int64) - sample_rate)))
        if int(tables.SAMPLE_RATES[si]) != sample_rate:
            raise ValueError(f"unsupported sample rate {sample_rate}")
        self.config = parse_asc(make_asc(2, si, channels))
        self.sample_rate = sample_rate
        self.channels = channels
        self.bitrate = bitrate
        self.S = n_streams
        per_ch = bitrate / channels
        if cutoff_hz is None:
            cutoff_hz = min(0.45 * sample_rate,
                            4000.0 + per_ch * 0.12, 20000.0)
        self._cutoff_bin = int(min(cutoff_hz, 0.5 * sample_rate)
                               / (sample_rate / 2.0) * FRAME)
        self._cutoff_bin -= self._cutoff_bin % 2
        self._si = si
        self._arr = _arrangement(si, self._cutoff_bin)
        self._psy = PsyParams()
        # multi-chip: P('stream') data parallelism over the channel-row
        # axis (see runtime.mesh "TPU-batched encoder"); rows must split
        # evenly across the mesh's 'stream' axis
        # packed q D2H width: only the coded region (bins below the rate
        # cutoff) crosses the link; see _quantize_fn
        cut_l = int(self._arr["ptr_l"][-1])
        cut_s = int(self._arr["cfg"].swb_offsets_short[
            self._arr["max_sfb_s"]])
        self._w8 = min(max(-(-cut_l // 8), cut_s), FRAME // 8)
        self.mesh = mesh
        if mesh is not None:
            n_shards = mesh.shape["stream"]
            if (n_streams * channels) % n_shards:
                raise ValueError(
                    f"{n_streams} streams x {channels} ch = "
                    f"{n_streams * channels} channel rows do not split "
                    f"over {n_shards} 'stream' shards")
            from aacjax.runtime.mesh import sharded_encode_quantize
            self._quantize = sharded_encode_quantize(
                mesh, self._w8, self._si, self._cutoff_bin)
        else:
            self._quantize = _jitted_quantize(
                self._w8, self._si, self._cutoff_bin)
        self._reservoir = np.zeros(n_streams)
        self._res_cap = 6.0 * bitrate * FRAME / sample_rate
        # online calibration of the device bit estimate against bits
        # actually written (the exact multi-book host pass undercuts the
        # book-11 estimate by ~25-40% depending on content)
        self._est_ratio = np.full(n_streams, 0.7)
        self._carry = None   # [S, F, ch] 1-frame lookahead across chunks
        self._prev_seq = np.zeros(n_streams, np.int64)
        # native multi-threaded bitstream writer (byte-identical to
        # _write_stream; AACJAX_NATIVE_WRITE=0 reverts to Python)
        import os
        from aacjax.host import native_write
        self._native_write = (
            os.environ.get("AACJAX_NATIVE_WRITE", "1") == "1"
            and native_write.available())
        # per-stage accounting, split like the decode side's (VERDICT r4:
        # one conflated h2d+compute bucket made the encoder unoptimizable):
        #   h2d_s       synced PCM upload (the dominant input transfer)
        #   analysis_s  analysis dispatch -> est ready (device compute +
        #               dispatch latency; bench.py measure_stages_encode
        #               additionally records the chained-amortized compute)
        #   d2h_s       est + packed q/sf downloads
        #   host_s      window plan / rate choice / unpack
        #   write_s     bitstream write
        self.stats = dict(h2d_s=0.0, analysis_s=0.0, d2h_s=0.0,
                          host_s=0.0, write_s=0.0, frames=0)
        import threading
        self._stats_lock = threading.Lock()

    # -- plan ---------------------------------------------------------------
    def _plan(self, full: np.ndarray, nF: int) -> np.ndarray:
        """Window-sequence plan per stream over this chunk's frames,
        continuing the previous chunk's chain legally."""
        seqs = np.zeros((self.S, nF), np.int64)
        for s in range(self.S):
            tr = np.zeros((nF, 2), np.int64)
            for c in range(self.channels):
                t_c = detect_transients(full[s, :, c], FRAME)
                # window f's new (right) half is full frame f+1
                n = min(len(t_c) - 1, nF)
                tr[:n, 0] |= t_c[1:n + 1, 0]
            plan = window_sequence_plan(tr)[:nF]
            # legal continuation across the chunk boundary: a frame's
            # left half must mirror its predecessor's right half
            prev = self._prev_seq[s]
            short_tail = prev in (1, EIGHT_SHORT)   # right half is short
            if short_tail and plan[0] == 0:
                plan[0] = 3                          # ONLY_LONG -> STOP
            elif short_tail and plan[0] == 1:
                plan[0] = EIGHT_SHORT                # START -> SHORT
            elif not short_tail and plan[0] == EIGHT_SHORT:
                plan[0] = 1                          # SHORT -> START
            elif not short_tail and plan[0] == 3:
                plan[0] = 0                          # STOP -> ONLY_LONG
            self._prev_seq[s] = plan[-1]
            seqs[s] = plan
        return seqs

    # -- encode -------------------------------------------------------------
    def _prep_chunk(self, pcm: np.ndarray):
        """Host stage: window-sequence plan + channel-major int16 PCM
        rows (b = s*ch + c; n = b*nF + f) for this chunk.  Mutates the
        1-frame carry and the window-chain state, so calls must stay in
        chunk order."""
        S_, n, ch = pcm.shape
        assert S_ == self.S and ch == self.channels and n % FRAME == 0
        F, nF = FRAME, n // FRAME
        if self._carry is None:
            self._carry = np.zeros((self.S, F, ch), pcm.dtype)
        full = np.concatenate([self._carry, pcm], axis=1)
        self._carry = full[:, -F:].copy()
        seqs = self._plan(full, nF)                        # [S, nF]
        pcm_i16 = np.clip(np.round(full.transpose(0, 2, 1)), -32768,
                          32767).astype(np.int16).reshape(
            self.S * ch, n + F)
        w_map = {0: 0, 1: 1, EIGHT_SHORT: 0, 3: 2}
        w_idx = np.vectorize(w_map.get)(seqs).astype(np.int32)
        w_idx = np.repeat(w_idx[:, None, :], ch, axis=1).reshape(
            self.S * ch, nF)
        is_short = np.repeat((seqs == EIGHT_SHORT)[:, None, :], ch,
                             axis=1).reshape(self.S * ch, nF)
        return seqs, pcm_i16, w_idx, is_short, nF

    def _analysis_for(self, nF: int):
        """The (cached) jitted analysis program for this chunk length —
        mesh-sharded over the channel-row axis when a mesh is set."""
        psy_key = (self._psy.smr_db, self._psy.spread_up_db,
                   self._psy.spread_down_db)
        if self.mesh is not None:
            from aacjax.runtime.mesh import sharded_encode_analysis
            return sharded_encode_analysis(
                self._si, self._cutoff_bin, FRAME, nF, psy_key,
                self.mesh)
        return _jitted_analysis(self._si, self._cutoff_bin, FRAME, nF,
                                psy_key)

    def _rate_choice(self, est_np: np.ndarray, nF: int):
        """Rate choice: finest grid offset whose estimated bits fit the
        frame budget (+ per-stream reservoir).  The estimate is the
        exact book-11 cost, a slight overestimate vs the host's final
        multi-book selection — errors land on the safe side and the
        reservoir absorbs them.  Mutates the reservoir, so calls must
        stay in chunk order."""
        ch = self.channels
        overhead = 60.0
        bits_frame = self.bitrate * FRAME / self.sample_rate
        est_sf = (est_np.reshape(self.S, ch, nF, -1).sum(axis=1)
                  * self._est_ratio[:, None, None])
        off_idx = np.empty((self.S, nF), np.int64)
        chosen_est = np.zeros(self.S)
        for f in range(nF):
            budget = (bits_frame - overhead
                      + np.minimum(self._reservoir, bits_frame))
            fits = est_sf[:, f] <= budget[:, None]
            idx = np.where(fits.any(axis=1), np.argmax(fits, axis=1),
                           len(OFF_GRID) - 1)
            off_idx[:, f] = idx
            used = est_sf[np.arange(self.S), f, idx] + overhead
            chosen_est += used
            self._reservoir = np.clip(
                self._reservoir + bits_frame - used, 0.0, self._res_cap)
        off = OFF_GRID[np.repeat(off_idx[:, None, :], ch, axis=1)
                       .reshape(-1)]
        return off, chosen_est

    def _unpack_q(self, packed: np.ndarray, is_short_flat: np.ndarray
                  ) -> np.ndarray:
        """Re-expand packed coded-region q rows to [N, FRAME] (zeros
        beyond the coded region, which the writer never reads) — the
        host inverse of _quantize_fn's device packing."""
        W = 8 * self._w8
        if W >= FRAME:
            return packed
        N = packed.shape[0]
        q = np.zeros((N, FRAME), np.int16)
        m = is_short_flat
        q[~m, :W] = packed[~m]
        if m.any():
            tmp = np.zeros((int(m.sum()), 8, FRAME // 8), np.int16)
            tmp[:, :, : self._w8] = packed[m].reshape(-1, 8, self._w8)
            q[m] = tmp.reshape(-1, FRAME)
        return q

    def _write_out(self, seqs, q, sf, chosen_est) -> list[list[bytes]]:
        """Bitstream write + online calibration of the device bit
        estimate against bits actually written."""
        if self._native_write:
            from aacjax.host import native_write
            arr = self._arr
            out = native_write.write_lc_batch(
                seqs, q, sf, arr["ptr_l"],
                arr["cfg"].swb_offsets_short[: arr["max_sfb_s"] + 1],
                arr["max_sfb_l"], arr["max_sfb_s"])
        else:
            out = [self._write_stream(seqs[s], q[s], sf[s])
                   for s in range(self.S)]
        actual = np.array([8.0 * sum(len(p) for p in o) for o in out])
        ratio = actual / np.maximum(chosen_est, 1.0)
        self._est_ratio = np.clip(self._est_ratio * ratio, 0.35, 1.2)
        return out

    def encode_chunk(self, pcm: np.ndarray) -> list[list[bytes]]:
        """pcm [S, n_samples, channels] float (reference 32768 scale),
        n_samples a multiple of 1024.  Returns per-stream
        raw_data_block payload lists (wrap with
        testing.encoder.adts_frame for ADTS)."""
        t0 = time.perf_counter()
        seqs, pcm_i16, w_idx, is_short, nF = self._prep_chunk(pcm)
        analysis = self._analysis_for(nF)
        self.stats["host_s"] += time.perf_counter() - t0

        import jax
        t0 = time.perf_counter()
        if self.mesh is None:
            dev = jax.block_until_ready(jax.device_put(pcm_i16))
        else:
            from aacjax.runtime.mesh import _row_sharding
            dev = jax.block_until_ready(jax.device_put(
                pcm_i16, _row_sharding(self.mesh, pcm_i16.ndim)))
        self.stats["h2d_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        coefs, base, fit_sf, est, bin_band = analysis(
            dev, w_idx, is_short)
        jax.block_until_ready(est)
        self.stats["analysis_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        est_np = np.asarray(est)                           # [N, K]
        self.stats["d2h_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        off, chosen_est = self._rate_choice(est_np, nF)
        self.stats["host_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        short_flat = is_short.reshape(-1)
        q_dev, sf_dev = self._quantize(coefs, base, fit_sf, bin_band,
                                       off, short_flat)
        jax.block_until_ready((q_dev, sf_dev))
        self.stats["analysis_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        q_packed = np.asarray(q_dev)
        sf = np.asarray(sf_dev).reshape(self.S, self.channels, nF, -1)
        self.stats["d2h_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        q = self._unpack_q(q_packed, short_flat).reshape(
            self.S, self.channels, nF, FRAME)
        self.stats["host_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        out = self._write_out(seqs, q, sf, chosen_est)
        self.stats["write_s"] += time.perf_counter() - t0
        self.stats["frames"] += self.S * nF
        return out

    def encode_pipelined(self, pcm_iter, duplex: bool | None = None):
        """Generator encoding an iterator of [S, n, ch] PCM chunks as a
        3-stage pipeline with double-buffered transfers — the encode
        mirror of runtime.batch.decode_pipelined:

            main thread : window plan + i16 prep, chunk k
            up worker   : H2D + analysis dispatch + est D2H, chunk k-1
            down worker : rate choice -> quantize dispatch -> q/sf D2H
                          -> bitstream write, chunk k-2

        Both workers are single-threaded, so the reservoir and the
        estimate calibration update in chunk order — outputs are
        byte-identical to sequential encode_chunk calls.  `duplex` as
        in decode_pipelined: on links that serialize transfers anyway
        (the tunneled 'axon' platform) a shared lock keeps H2D and D2H
        from contending; both still overlap host work and device
        compute.  Yields per-stream payload lists in chunk order."""
        import concurrent.futures
        import contextlib

        import jax

        from aacjax.runtime.batch import BatchDecoder

        lock = BatchDecoder._transfer_lock(duplex)
        lk = lock if lock is not None else contextlib.nullcontext()
        up_pool = concurrent.futures.ThreadPoolExecutor(1)
        down_pool = concurrent.futures.ThreadPoolExecutor(1)

        def upload_analysis(pcm_i16, w_idx, is_short, nF):
            t0 = time.perf_counter()
            analysis = self._analysis_for(nF)
            if self.mesh is None:
                with lk:
                    dev = jax.block_until_ready(jax.device_put(pcm_i16))
            else:
                # explicit sharded H2D under the lock (the implicit
                # transfer inside pjit would run outside it and contend
                # with the down worker's q/sf D2H on serialized links)
                from aacjax.runtime.mesh import _row_sharding
                with lk:
                    dev = jax.block_until_ready(jax.device_put(
                        pcm_i16, _row_sharding(self.mesh, pcm_i16.ndim)))
            t1 = time.perf_counter()
            outs = analysis(dev, w_idx, is_short)
            est = outs[3]
            jax.block_until_ready(est)   # compute done; lock only the D2H
            t2 = time.perf_counter()
            with lk:
                est_np = np.asarray(est)
            t3 = time.perf_counter()
            with self._stats_lock:
                self.stats["h2d_s"] += t1 - t0
                self.stats["analysis_s"] += t2 - t1
                self.stats["d2h_s"] += t3 - t2
            return outs, est_np

        def rate_quant_write(seqs, outs, est_np, nF, short_flat):
            t0 = time.perf_counter()
            off, chosen_est = self._rate_choice(est_np, nF)
            t1 = time.perf_counter()
            coefs, base, fit_sf, _est, bin_band = outs
            q_dev, sf_dev = self._quantize(coefs, base, fit_sf,
                                           bin_band, off, short_flat)
            jax.block_until_ready((q_dev, sf_dev))
            t1b = time.perf_counter()
            with lk:
                q_packed = np.asarray(q_dev)
                sf = np.asarray(sf_dev).reshape(self.S, self.channels,
                                                nF, -1)
            t1c = time.perf_counter()
            q = self._unpack_q(q_packed, short_flat).reshape(
                self.S, self.channels, nF, FRAME)
            t2 = time.perf_counter()
            out = self._write_out(seqs, q, sf, chosen_est)
            t3 = time.perf_counter()
            with self._stats_lock:
                self.stats["host_s"] += (t1 - t0) + (t2 - t1c)
                self.stats["analysis_s"] += t1b - t1
                self.stats["d2h_s"] += t1c - t1b
                self.stats["write_s"] += t3 - t2
                self.stats["frames"] += self.S * nF
            return out

        def advance(up_fut, down_fut, pend):
            """Move the finished upload into the down worker, yielding
            the previous down result first to keep one chunk in each
            stage."""
            outs, est_np = up_fut.result()
            prev = down_fut.result() if down_fut is not None else None
            nxt = down_pool.submit(rate_quant_write, pend[0], outs,
                                   est_np, pend[1], pend[2])
            return prev, nxt

        up_fut = down_fut = None
        pend = None   # (seqs, nF, short_flat) for the upload-stage chunk
        try:
            for pcm in pcm_iter:
                t0 = time.perf_counter()
                seqs, pcm_i16, w_idx, is_short, nF = self._prep_chunk(
                    pcm)
                with self._stats_lock:
                    self.stats["host_s"] += time.perf_counter() - t0
                if up_fut is not None:
                    prev, down_fut = advance(up_fut, down_fut, pend)
                    if prev is not None:
                        yield prev
                up_fut = up_pool.submit(upload_analysis, pcm_i16,
                                        w_idx, is_short, nF)
                pend = (seqs, nF, is_short.reshape(-1))
            if up_fut is not None:
                prev, down_fut = advance(up_fut, down_fut, pend)
                if prev is not None:
                    yield prev
            if down_fut is not None:
                yield down_fut.result()
        finally:
            up_pool.shutdown(wait=False)
            down_pool.shutdown(wait=False)

    # -- bitstream ----------------------------------------------------------
    def _write_stream(self, seqs, q, sf) -> list[bytes]:
        from aacjax.host.bitio import BitWriter
        from aacjax.testing.encoder import (ChannelSpec, CPESpec,
                                            end_frame, write_cpe,
                                            write_sce)
        arr = self._arr
        payloads = []
        for f in range(len(seqs)):
            seq = int(seqs[f])
            short = seq == EIGHT_SHORT
            max_sfb = arr["max_sfb_s"] if short else arr["max_sfb_l"]
            ptr = arr["ptr_s"] if short else arr["ptr_l"]
            specs = []
            for c in range(self.channels):
                row = q[c, f].astype(np.int64)
                flat = row[arr["gidx_s"]] if short else row[: ptr[-1]]
                books, _ = bands_books_and_bits(flat, ptr)
                sfs = np.where(books > 0, sf[c, f, :max_sfb], 0) \
                    .astype(np.int64)
                nz = np.nonzero(books)[0]
                gg = int(sfs[nz[0]]) if nz.size else 121
                prev = gg
                for i in nz:                   # DPCM clamp, +-60/step
                    d = int(np.clip(int(sfs[i]) - prev, -60, 60))
                    sfs[i] = prev + d
                    prev = sfs[i]
                specs.append(ChannelSpec(
                    window_sequence=seq, window_shape=0,
                    max_sfb=max_sfb,
                    grouping=[8] if short else None,
                    global_gain=int(np.clip(gg, 0, 255)),
                    band_books=books, band_sf=sfs, quant=row))
            w = BitWriter()
            if self.channels == 2:
                write_cpe(w, CPESpec(left=specs[0], right=specs[1],
                                     common_window=True, ms_type=0),
                          self.config)
            else:
                write_sce(w, specs[0], self.config)
            payloads.append(end_frame(w))
        return payloads
