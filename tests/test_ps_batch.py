"""Batched device Parametric Stereo (kernels/ps_batch.py) held equal to
the numpy reference path (host/ps_decode.py, itself sample-exact vs
libavcodec in tests/test_ps.py)."""
import numpy as np
import pytest

from aacjax.host import ps_pack as PP
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.ps import PSContext, read_ps_data
from aacjax.host.ps_decode import PSProc, apply_ps
from aacjax.host.sbr_decode import SBRChannelProc, _qmf_synthesis_np
from aacjax.testing.sbr_encoder import PSSpec, write_ps_data

B, T = 3, 4
S = 32 * T


def _ps_data(spec, ctx):
    w = BitWriter()
    write_ps_data(w, spec)
    w.write(0, 7)
    return read_ps_data(BitReader(w.getvalue()), ctx, 0)


def _random_specs(rng, b):
    """Per-frame PSSpec list for one stream (varied modes/envelopes)."""
    out = []
    for t in range(T):
        iid_mode = int((b + t) % 2)            # 10/20-band coarse
        nr = (10, 20)[iid_mode]
        ne = (1, 2, 4, 2)[t % 4]
        kw = dict(iid_mode=iid_mode,
                  iid_par=rng.integers(-7, 8, (ne, nr)), num_env=ne,
                  icc_mode=0, icc_par=rng.integers(0, 8, (ne, 10)))
        if b != 1:  # stream 1 stays baseline (no phase extension)
            kw["ipd_par"] = rng.integers(0, 8, (ne, (5, 11)[iid_mode]))
            kw["opd_par"] = rng.integers(0, 8, (ne, (5, 11)[iid_mode]))
        out.append(PSSpec(**kw))
    return out


def _build_planes(rng):
    """Synthetic continuous QMF content: low bands 0-4 continuous across
    frames (+6 lookahead), HF bands per slot with zero lookahead —
    exactly the X plane shape both paths consume."""
    low = (rng.standard_normal((B, S + 6, 5))
           + 1j * rng.standard_normal((B, S + 6, 5))) * 300
    hf = (rng.standard_normal((B, S, 59))
          + 1j * rng.standard_normal((B, S, 59))) * 100
    return low, hf


def _frame_X(low, hf, b, t):
    X = np.zeros((38, 64), np.complex128)
    n0 = 32 * t
    X[:, :5] = low[b, n0: n0 + 38]
    X[:32, 5:] = hf[b, n0: n0 + 32]
    return X


def _random_specs_34(rng, b):
    out = []
    for t in range(T):
        ne = (1, 2, 4, 2)[t % 4]
        kw = dict(iid_mode=2, iid_par=rng.integers(-7, 8, (ne, 34)),
                  num_env=ne, icc_mode=2, icc_par=rng.integers(0, 8, (ne, 34)))
        if b != 1:
            kw["ipd_par"] = rng.integers(0, 8, (ne, 17))
            kw["opd_par"] = rng.integers(0, 8, (ne, 17))
        out.append(PSSpec(**kw))
    return out


@pytest.mark.parametrize("is34", [False, True])
def test_ps_batch_matches_numpy_reference(is34):
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from aacjax.kernels.ps_batch import ps_apply, ps_state_init

    rng = np.random.default_rng(11)
    low, hf = _build_planes(rng)
    gen = _random_specs_34 if is34 else _random_specs
    specs = [gen(rng, b) for b in range(B)]

    # ---- numpy reference: per frame, chained state -----------------------
    ref_l = np.zeros((B, S * 64))
    ref_r = np.zeros((B, S * 64))
    for b in range(B):
        proc = PSProc()
        ctx = PSContext()
        vl = SBRChannelProc().v_hist
        vr = SBRChannelProc().v_hist
        for t in range(T):
            ps = _ps_data(specs[b][t], ctx)
            xl, xr = apply_ps(proc, _frame_X(low, hf, b, t), ps)
            pl, vl = _qmf_synthesis_np(xl, vl)
            pr, vr = _qmf_synthesis_np(xr, vr)
            ref_l[b, t * 2048: (t + 1) * 2048] = pl
            ref_r[b, t * 2048: (t + 1) * 2048] = pr

    # ---- batched device path ---------------------------------------------
    dense = PP.alloc_ps_dense(B, T)
    states = [PP.PSPackState() for _ in range(B)]
    ctxs = [PSContext() for _ in range(B)]
    for b in range(B):
        for t in range(T):
            ps = _ps_data(specs[b][t], ctxs[b])
            assert PP.pack_ps_frame(dense, b, t, states[b], ps)
    Xr = np.zeros((B, S, 64), np.float32)
    Xi = np.zeros((B, S, 64), np.float32)
    Xr[:, :, :5] = low[:, :S].real
    Xi[:, :, :5] = low[:, :S].imag
    Xr[:, :, 5:] = hf.real
    Xi[:, :, 5:] = hf.imag
    # xall rows = X slots -2..S+5
    xall_lo_r = np.zeros((B, 8 + S, 5), np.float32)
    xall_lo_i = np.zeros((B, 8 + S, 5), np.float32)
    xall_lo_r[:, 2:] = low.real
    xall_lo_i[:, 2:] = low.imag
    pdense = {
        "ps_ha": jnp.asarray(dense.ha_idx),
        "ps_icc": jnp.asarray(dense.icc_idx),
        "ps_opd": jnp.asarray(dense.opd_pd),
        "ps_ipd": jnp.asarray(dense.ipd_pd),
        "ps_h0_r": jnp.asarray(dense.h0_r),
        "ps_h0_i": jnp.asarray(dense.h0_i),
        "ps_hslot": jnp.asarray(dense.hslot),
        "ps_himag": jnp.asarray(PP.himag_plane(states, B)),
        "ps_knot_lo": jnp.asarray(dense.knot_lo),
        "ps_knot_hi": jnp.asarray(dense.knot_hi),
        "ps_alpha": jnp.asarray(dense.alpha),
        "ps_has": jnp.asarray(dense.has_ps),
    }
    fn = jax.jit(lambda *a: ps_apply(*a, B=B, T=T, is34=is34))
    pcm_l, pcm_r, _ = fn(jnp.asarray(Xr), jnp.asarray(Xi),
                         jnp.asarray(xall_lo_r), jnp.asarray(xall_lo_i),
                         pdense, ps_state_init(B, is34))
    got_l = np.asarray(pcm_l)
    got_r = np.asarray(pcm_r)
    scale = float(np.abs(ref_l).max())
    np.testing.assert_allclose(got_l, ref_l, atol=3e-3 * scale)
    np.testing.assert_allclose(got_r, ref_r, atol=3e-3 * scale)


@pytest.mark.parametrize("is34", [False, True])
def test_ps_scan_modes_agree(is34):
    """The parallel decorrelator forms (Toeplitz matmul — the default —
    and log-depth doubling) match the sequential lax.scan form to float-
    reassociation error, including the carried transient/allpass state
    across a chunk boundary."""
    pytest.importorskip("jax")
    import jax.numpy as jnp
    from aacjax.kernels import ps_batch as PB

    rng = np.random.default_rng(7)
    nb = PB._NB[is34]
    S = 64
    state = PB.ps_state_init(B, is34)

    def run(mode):
        old = (PB._SEQ_SCAN, PB._SCAN_MODE)
        PB._SCAN_MODE = mode
        PB._SEQ_SCAN = mode == "seq"
        try:
            st = {k: jnp.asarray(v) for k, v in state.items()}
            outs = []
            for chunk in range(2):
                r = rng_all[chunk]
                d_r, d_i, st2 = PB._decorrelate(
                    jnp.asarray(r[0]), jnp.asarray(r[1]), st,
                    PB._consts(is34), B, S, is34)
                st.update(st2)
                outs.append((np.asarray(d_r), np.asarray(d_i)))
            return outs, {k: np.asarray(v) for k, v in st.items()}
        finally:
            PB._SEQ_SCAN, PB._SCAN_MODE = old

    rng_all = [(rng.standard_normal((B, S, nb)).astype(np.float32) * 100,
                rng.standard_normal((B, S, nb)).astype(np.float32) * 100)
               for _ in range(2)]
    outs_s, st_s = run("seq")
    for mode in ("assoc", "matmul"):
        outs_a, st_a = run(mode)
        for (ar, ai), (sr, si) in zip(outs_a, outs_s):
            sc = max(np.abs(sr).max(), 1.0)
            np.testing.assert_allclose(ar, sr, atol=2e-4 * sc,
                                       err_msg=mode)
            np.testing.assert_allclose(ai, si, atol=2e-4 * sc,
                                       err_msg=mode)
        for k in ("peak", "psmooth", "pdiff", "ap_r", "ap_i",
                  "delay_r", "delay_i"):
            sc = max(np.abs(st_s[k]).max(), 1.0)
            np.testing.assert_allclose(st_a[k], st_s[k], atol=2e-4 * sc,
                                       err_msg=f"{mode}:{k}")


@pytest.mark.parametrize("is34", [False, True])
def test_ps_lut_modes_bitwise_equal(is34):
    """AACJAX_PS_LUT split/onehot replace the dynamic HA/phase-table
    gathers with exact one-hot matmuls — bitwise identical (each step
    has one 1.0 term; the other addends are exact zeros)."""
    pytest.importorskip("jax")
    import jax.numpy as jnp
    from aacjax.kernels import ps_batch as PB

    rng = np.random.default_rng(13)
    npar = PB._NPAR[is34]
    dense = dict(
        ps_ha=jnp.asarray(rng.integers(-1, 46 - 7, (B, T, 6, npar)),
                          jnp.int32),
        ps_icc=jnp.asarray(rng.integers(0, 8, (B, T, 6, npar)), jnp.int32),
        ps_opd=jnp.asarray(rng.integers(0, 512, (B, T, 6, 17)), jnp.int32),
        ps_ipd=jnp.asarray(rng.integers(0, 512, (B, T, 6, 17)), jnp.int32),
        ps_h0_r=jnp.asarray(rng.standard_normal((B, T, 34, 4)),
                            jnp.float32),
        ps_h0_i=jnp.asarray(rng.standard_normal((B, T, 34, 4)),
                            jnp.float32),
        ps_hslot=jnp.asarray(rng.integers(0, 5, (B, T, 6)), jnp.int8),
        ps_himag=jnp.asarray(rng.standard_normal((B, 4, 34, 4)),
                             jnp.float32),
        ps_knot_lo=jnp.asarray(rng.integers(0, 6, (B, T, 32)), jnp.int32),
        ps_knot_hi=jnp.asarray(rng.integers(0, 6, (B, T, 32)), jnp.int32),
        ps_alpha=jnp.asarray(rng.random((B, T, 32)), jnp.float32),
    )
    c = PB._consts(is34)

    def run(mode):
        old = PB._LUT_MODE
        PB._LUT_MODE = mode
        try:
            return [np.asarray(x)
                    for x in PB._mixing_h(dense, c, B, T, is34)]
        finally:
            PB._LUT_MODE = old

    gather = run("gather")
    for mode in ("onehot", "split"):
        for a, g in zip(run(mode), gather):
            np.testing.assert_array_equal(a, g)


HAVE_ORACLE = None


def _oracle():
    global HAVE_ORACLE
    if HAVE_ORACLE is None:
        from aacjax.testing import ffmpeg_oracle
        HAVE_ORACLE = ffmpeg_oracle.available()
    return HAVE_ORACLE


def test_decode_adts_ps_batched_matches_oracle():
    """decode_adts routes HE-AAC v2 through the combined batched
    SBR+PS device program; stereo output is sample-exact vs libavcodec
    for both the 20-band and 34-band kernel modes."""
    if not _oracle():
        pytest.skip("libavcodec oracle not built")
    from test_ps import _ICC10, _RAMP10, _snr, make_ps_stream
    from aacjax.api import decode_adts
    from aacjax.testing import ffmpeg_oracle
    cases = [
        PSSpec(iid_mode=0, iid_par=_RAMP10[None, :],
               icc_mode=0, icc_par=_ICC10[None, :],
               ipd_par=((np.arange(5) * 3) % 8)[None, :],
               opd_par=(np.arange(5) % 8)[None, :]),
        PSSpec(iid_mode=2, iid_par=(np.arange(34) % 15 - 7)[None, :],
               icc_mode=2, icc_par=(np.arange(34) % 8)[None, :],
               ipd_par=((np.arange(17) * 3) % 8)[None, :],
               opd_par=((np.arange(17) * 5) % 8)[None, :]),
    ]
    for ps in cases:
        stream = make_ps_stream(ps)
        pcm, rate = decode_adts(stream)
        want, wrate = ffmpeg_oracle.decode_adts(stream)
        assert rate == wrate == 44100 and pcm.shape[1] == 2
        nn = min(len(want), len(pcm))
        sl = slice(4096, nn - 64)
        for ch in range(2):
            assert _snr(want[sl, ch], pcm[sl, ch]) > 70.0


def test_ps_sticky_transition_is_seamless():
    """A PS stream whose SBR header changes mid-stream goes STICKY to
    the numpy path; the transition seeds the PS DSP state WARM from the
    batched device state (synthesis histories, delay/allpass lines,
    transient trackers, hybrid FIR history from hist4+xlow, H matrices
    reconstructed from the pack snapshot's knot indices) — output stays
    at float noise through the transition instead of a cold-start
    glitch (was ~0.6 rel on the transition chunk's first frame)."""
    if not _oracle():
        pytest.skip("libavcodec oracle not built")
    import sys as _sys
    import pathlib
    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_sbr import _lowpass_noise
    from aacjax.api import AACDecoder, decode_adts
    from aacjax.host import sbr as S
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import sbr_payload as sp

    core_cfg = parse_asc(make_asc(2, 7, 1))
    h1 = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    h2 = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0,
                     limiter_gains=1)
    t = S.derive_tables(h1, 44100)
    nb = t.n_bands(1)
    ps = PSSpec(iid_mode=1, num_env=2,
                iid_par=np.stack([np.arange(20) % 15 - 7,
                                  7 - np.arange(20) % 15]),
                icc_mode=1, icc_par=np.arange(40).reshape(2, 20) % 8,
                ipd_par=np.arange(22).reshape(2, 11) % 8,
                opd_par=np.arange(22)[::-1].reshape(2, 11) % 8)
    from aacjax.testing.sbr_encoder import SBRFrameSpec
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                        env_q=np.full((2, nb), 25, np.int64),
                        noise_q=np.full((2, t.n_q), 30, np.int64))
    pays = [sp([spec], h2 if f >= 6 else h1, 44100, ps=ps,
               write_header=(f in (0, 6))) for f in range(8)]
    x = _lowpass_noise(np.random.default_rng(1), 1024 * 8, 1)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)

    dec = AACDecoder()
    dec.feed(stream)
    chunks = []
    while (c := dec.read_chunk()) is not None:
        chunks.append(c.reshape(-1, 2))
    want = np.concatenate(chunks, axis=0)
    got, _ = decode_adts(stream, chunk_frames=4)   # header flips inside
    n = min(len(want), len(got))                   # the second chunk
    scale = float(np.abs(want[2 * 2048: n - 64]).max())
    for f in range(4, 8):
        sl = slice(f * 2048 + 64, min((f + 1) * 2048, n))
        err = float(np.abs(got[sl] - want[sl]).max()) / scale
        assert err < 1e-4, (f, err)


def test_ps_batched_chunk_carry_and_mixed_batch():
    """PS device state carries exactly across chunk boundaries, and a
    chunk mixing a PS stream with a plain HE-AAC stream keeps both
    correct (the PS kernel passes non-PS slots through)."""
    if not _oracle():
        pytest.skip("libavcodec oracle not built")
    import aacjax.host.adts as adts
    from test_ps import _ICC10, _RAMP10, _snr, make_ps_stream
    from test_sbr import make_he_stream
    from aacjax.api import decode_adts
    from aacjax.host.asc import parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing import ffmpeg_oracle

    ps = PSSpec(iid_mode=0, num_env=2,
                iid_par=np.stack([_RAMP10, -_RAMP10]),
                icc_mode=0, icc_par=np.stack([_ICC10, _ICC10[::-1]]))
    stream = make_ps_stream(ps)
    a, _ = decode_adts(stream, chunk_frames=2)
    b, _ = decode_adts(stream, chunk_frames=64)
    assert float(np.abs(a - b).max()) < 3e-4  # f32 accumulation only

    he = make_he_stream(ch=1, n_frames=6)
    f1, f2 = adts.split_frames(stream), adts.split_frames(he)
    cfg1 = parse_asc(adts.synthesize_cookie(f1[0][0]))
    cfg2 = parse_asc(adts.synthesize_cookie(f2[0][0]))
    dec = BatchDecoder([cfg1, cfg2], chunk_frames=6, cce_slots=1)
    out = dec.step_he_raw([[stream[s:e] for _, s, e in f1][:6],
                           [he[s:e] for _, s, e in f2][:6]])
    assert np.isfinite(out).all()
    b1, b2 = dec.streams[0].base_slot, dec.streams[1].base_slot
    got_ps = out[b1:b1 + 2, :6].reshape(2, -1).T
    got_he = out[b2:b2 + 1, :6].reshape(1, -1).T
    w1, _ = ffmpeg_oracle.decode_adts(stream)
    w2, _ = ffmpeg_oracle.decode_adts(he)
    n1 = min(len(w1), len(got_ps))
    n2 = min(len(w2), len(got_he))
    assert _snr(w1[4096:n1 - 64, 0], got_ps[4096:n1 - 64, 0]) > 70
    assert _snr(w1[4096:n1 - 64, 1], got_ps[4096:n1 - 64, 1]) > 70
    assert _snr(w2[4096:n2 - 64, 0], got_he[4096:n2 - 64, 0]) > 70
