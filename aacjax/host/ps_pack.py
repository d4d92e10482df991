"""Host-side dense packing for the batched device Parametric Stereo
stage (kernels/ps_batch.py).

The device receives LUT *indices*, not mixing values: per frame and
knot, the HA-table row (iid+offset), the ICC column, and the 9-bit
smoothed-phase indices — a few hundred bytes per channel-frame instead
of tens of kilobytes of complex matrices.  Knot 0 is the carry (the
previous frame's final envelope), so the device needs no cross-frame H
state; the host tracks it here (PSPackState), exactly like the numpy
reference path tracks PSProc.h_prev and the phase histories.

Semantics are shared with the reference path through
ps_decode.resolve_frame_indices (parameter-band maps, phase-history
smoothing, the ipdopd-off reset); equality of the two paths is enforced
in tests/test_ps_batch.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from aacjax.host.ps_decode import NR_PAR_BANDS, resolve_frame_indices

SLOTS = 32
MAX_KNOTS = 6           # carry + up to 5 envelopes (incl. the fixup one)


@dataclass
class PSPackState:
    """Per-slot host-side sequential PS state for the batched path."""
    # previous frame's final-envelope indices (knot 0 of the next frame);
    # ha -1 = no PS seen yet (H starts at zero, like PSProc.h_prev)
    ha_prev: np.ndarray = field(
        default_factory=lambda: np.full(34, -1, np.int64))
    icc_prev: np.ndarray = field(default_factory=lambda: np.zeros(34, np.int64))
    opd_pd_prev: np.ndarray = field(
        default_factory=lambda: np.zeros(17, np.int64))
    ipd_pd_prev: np.ndarray = field(
        default_factory=lambda: np.zeros(17, np.int64))
    ipd_hist: np.ndarray = field(default_factory=lambda: np.zeros(17, np.int64))
    opd_hist: np.ndarray = field(default_factory=lambda: np.zeros(17, np.int64))
    ps_prev: object = None          # last PSData (replayed when absent)
    is34_prev: bool | None = None
    ipd_seen: bool = False          # any ipdopd frame packed so far
    # shadow of PSProc.h_slot_imag (per-envelope-slot imaginary H) so a
    # slot that turns sticky at a band-scheme switch can seed the numpy
    # fallback with the stale values ffmpeg keeps interpolating; on the
    # device itself these are always zero (constant-scheme chunks never
    # read bands >= the IPD cut)
    h_slot_imag: np.ndarray = field(
        default_factory=lambda: np.zeros((5, 34, 4)))


@dataclass
class PSDense:
    """Dense per-[B, T] arrays for the device PS stage."""
    ha_idx: np.ndarray      # [B,T,6,34] i32  HA row per knot/band (-1 = 0)
    icc_idx: np.ndarray     # [B,T,6,34] i32
    opd_pd: np.ndarray      # [B,T,6,17] i32  9-bit phase idx (0=identity)
    ipd_pd: np.ndarray      # [B,T,6,17] i32
    knot_lo: np.ndarray     # [B,T,32] i32  interpolation knots per slot
    knot_hi: np.ndarray     # [B,T,32] i32
    alpha: np.ndarray       # [B,T,32] f32
    ipd_on: np.ndarray      # [B,T] f32  1 = complex H this frame
    has_ps: np.ndarray      # [B,T] f32  1 = PS processing (else L=R=mono)


def alloc_ps_dense(B: int, T: int) -> PSDense:
    return PSDense(
        ha_idx=np.full((B, T, MAX_KNOTS, 34), -1, np.int32),
        icc_idx=np.zeros((B, T, MAX_KNOTS, 34), np.int32),
        opd_pd=np.zeros((B, T, MAX_KNOTS, 17), np.int32),
        ipd_pd=np.zeros((B, T, MAX_KNOTS, 17), np.int32),
        knot_lo=np.zeros((B, T, SLOTS), np.int32),
        knot_hi=np.zeros((B, T, SLOTS), np.int32),
        alpha=np.zeros((B, T, SLOTS), np.float32),
        ipd_on=np.zeros((B, T), np.float32),
        has_ps=np.zeros((B, T), np.float32),
    )


def pack_ps_frame(dense: PSDense, slot: int, t: int, st: PSPackState,
                  ps, chunk_is34: bool = False) -> bool:
    """Pack one frame's PS parameters for `slot`.  ps may be None (frame
    without ps_data: the previous frame's parameters replay, matching
    apply_ps).  Returns False when the frame needs the numpy fallback
    (its band mode differs from the chunk's compiled kernel mode)."""
    if ps is None:
        ps = st.ps_prev
    if ps is None:
        return True              # no parameters yet: kernel emits L=R=mono
    if bool(ps.is34) != chunk_is34:
        return False
    if st.is34_prev is not None and st.is34_prev != bool(ps.is34):
        # band-scheme switch: the carried H must be REMAPPED between
        # parameter-band schemes (apply_ps, mirroring libavcodec's
        # map_val_34_to_20/_20_to_34) — remapped VALUES cannot be
        # expressed as HA-LUT indices, so the slot goes sticky and the
        # warm-seeded numpy path owns the flip (even when the flip
        # lands exactly on a chunk boundary)
        return False
    st.is34_prev = bool(ps.is34)
    st.ps_prev = ps
    npar = NR_PAR_BANDS[ps.is34]

    if st.ipd_seen and not bool(
            ps.enable_ipdopd and ps.ipd_par is not None):
        # explicit enable_ipdopd=0 after active IPD frames: the frozen
        # phase state and the stored imaginary H must survive the off
        # span and resume (ffmpeg context semantics) — the index-based
        # device carry cannot express that, so the slot goes sticky
        return False

    ha, ic, opd_pd, ipd_pd, ipdopd = resolve_frame_indices(
        ps, st.ipd_hist, st.opd_hist)
    st.ipd_seen = st.ipd_seen or ipdopd
    num_env = ps.num_env

    dense.has_ps[slot, t] = 1.0
    dense.ipd_on[slot, t] = 1.0 if ipdopd else 0.0
    # knot 0 = carry
    dense.ha_idx[slot, t, 0, :npar] = st.ha_prev[:npar]
    dense.icc_idx[slot, t, 0, :npar] = st.icc_prev[:npar]
    if ipdopd:
        dense.opd_pd[slot, t, 0, :] = st.opd_pd_prev
        dense.ipd_pd[slot, t, 0, :] = st.ipd_pd_prev
    # (when ipdopd is off this frame the kernel zeroes every imaginary
    # part via ipd_on, which also covers the carry — matching apply_ps's
    # h_prev.real reset)
    for e in range(num_env):
        dense.ha_idx[slot, t, e + 1, :npar] = ha[e]
        dense.icc_idx[slot, t, e + 1, :npar] = ic[e]
        dense.opd_pd[slot, t, e + 1, :] = opd_pd[e]
        dense.ipd_pd[slot, t, e + 1, :] = ipd_pd[e]

    # per-slot interpolation weights between knots
    borders = ps.border_position
    for e in range(num_env):
        start = int(borders[e])
        stop = min(int(borders[e + 1]), SLOTS - 1)
        width = 1.0 / max(stop - start, 1)
        for n in range(start + 1, stop + 1):
            dense.knot_lo[slot, t, n] = e
            dense.knot_hi[slot, t, n] = e + 1
            dense.alpha[slot, t, n] = (n - start) * width
    # slots at/before the first border (start = -1 covers slot 0 already;
    # defensive for odd grids) and after the last hold the nearest knot
    first = int(borders[0])
    for n in range(0, first + 1):
        dense.knot_lo[slot, t, n] = 0
        dense.knot_hi[slot, t, n] = 0
        dense.alpha[slot, t, n] = 0.0
    last = min(int(borders[num_env]), SLOTS - 1)
    for n in range(last + 1, SLOTS):
        dense.knot_lo[slot, t, n] = num_env
        dense.knot_hi[slot, t, n] = num_env
        dense.alpha[slot, t, n] = 1.0

    # shadow the per-envelope-slot imaginary H exactly like apply_ps
    # (written only below the IPD cut, only on ipdopd frames)
    if ipdopd:
        from aacjax.host.ps_decode import _tables as _ps_tables
        t_ = _ps_tables()
        cut = 17 if ps.is34 else 11
        for e in range(num_env):
            base = t_["HA"][ha[e, :cut], ic[e, :cut]].astype(np.complex128)
            o = t_["pd_smooth"][opd_pd[e, :cut]]
            adj = o * np.conj(t_["pd_smooth"][ipd_pd[e, :cut]])
            sl = st.h_slot_imag[min(e + 1, 4)]
            sl[:cut, 0] = (base[:, 0] * o).imag
            sl[:cut, 1] = (base[:, 1] * adj).imag
            sl[:cut, 2] = (base[:, 2] * o).imag
            sl[:cut, 3] = (base[:, 3] * adj).imag

    # carry for the next frame
    st.ha_prev[:npar] = ha[num_env - 1]
    st.ha_prev[npar:] = 7            # unused bands: identity row
    st.icc_prev[:npar] = ic[num_env - 1]
    st.icc_prev[npar:] = 0
    if ipdopd:
        st.opd_pd_prev[:] = opd_pd[num_env - 1]
        st.ipd_pd_prev[:] = ipd_pd[num_env - 1]
    else:
        st.opd_pd_prev[:] = 0
        st.ipd_pd_prev[:] = 0
    return True
