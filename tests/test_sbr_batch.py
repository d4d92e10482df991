"""Batched device SBR pipeline vs the per-channel numpy reference
(which is itself sample-exact against libavcodec, tests/test_sbr.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from aacjax.host import sbr as S
from aacjax.host import sbr_decode as SD
from aacjax.host import sbr_pack as SP
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import CPEData, decode_frame
from aacjax.kernels.sbr_batch import (SBRStaticConfig, broadcast_cfg,
                                      jitted_sbr_apply, sbr_state_init)
from aacjax.runtime.batch import BatchDecoder
from test_sbr import make_he_stream
from aacjax.host import adts


def _parse_he(stream, ch):
    config = parse_asc(adts.synthesize_cookie(adts.split_frames(stream)[0][0]))
    ctx = S.SBRContext(sample_rate=2 * config.sample_rate)
    prev = np.zeros(ch, np.int32)
    frames = []
    for _, s, e in adts.split_frames(stream):
        f = decode_frame(BitReader(stream[s:e]), config, prev, sbr_ctx=ctx)
        chn = 0
        for el in f.elements:
            n = 2 if isinstance(el, CPEData) else 1
            for k in range(n):
                prev[chn] = (el.ics.info.window_shape if n == 1
                             else (el.left if k == 0 else el.right)
                             .info.window_shape)
                chn += 1
        frames.append(f)
    return config, frames


def _core_pcm(config, frames, ch):
    dec = BatchDecoder([config], chunk_frames=len(frames), use_native=False)
    pcm = dec.step([frames])                       # [C, T, 1024]
    return np.asarray(pcm)[:ch]


def _numpy_ref(frames, ch, core):
    procs = [SD.SBRChannelProc() for _ in range(ch)]
    out = np.zeros((ch, core.shape[1], 2048))
    for t, f in enumerate(frames):
        sf = f.elements[0].sbr
        eq = S.dequant(sf)
        for c in range(ch):
            out[c, t] = SD.process_channel(procs[c],
                                           core[c, t].astype(np.float64),
                                           sf, c, eq[c])
    return out


def _batch(frames, ch, core, chunks=1):
    sf0 = frames[0].elements[0].sbr
    cfg = SBRStaticConfig.from_tables(
        sf0.tables, S._consts()["limgain"][sf0.header.limiter_gains])
    states = [SP.SBRHostState() for _ in range(ch)]
    state = sbr_state_init(ch)
    T = core.shape[1]
    outs = []
    step = T // chunks
    fn = jitted_sbr_apply()
    cfg_planes = {k: jnp.asarray(v)
                  for k, v in broadcast_cfg(cfg, ch).items()}
    for lo in range(0, T, step):
        n = min(step, T - lo)
        dense = SP.alloc_dense(ch, n)
        for t in range(n):
            f = frames[lo + t]
            sf = f.elements[0].sbr
            eq = S.dequant(sf)
            for c in range(ch):
                SP.pack_channel_frame(dense, c, t, states[c], sf, c, eq[c])
        dense_d = {k: jnp.asarray(v) for k, v in vars(dense).items()}
        pcm, state = fn(jnp.asarray(core[:, lo:lo + n], jnp.float32),
                        dense_d, state, cfg_planes)
        outs.append(np.asarray(pcm))
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("kw", [
    dict(invf=0), dict(invf=1), dict(num_env=4, noise_q=18),
    dict(freq_res=0),
])
def test_batch_matches_numpy_reference(kw):
    stream = make_he_stream(n_frames=5, **kw)
    config, frames = _parse_he(stream, 1)
    core = _core_pcm(config, frames, 1)
    want = _numpy_ref(frames, 1, core)
    got = _batch(frames, 1, core)
    scale = max(1e-9, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    assert err < 2e-4, err


def test_batch_stereo_and_chunked_state():
    stream = make_he_stream(ch=2, n_frames=8)
    config, frames = _parse_he(stream, 2)
    core = _core_pcm(config, frames, 2)
    want = _numpy_ref(frames, 2, core)
    got = _batch(frames, 2, core, chunks=3)   # state carried across chunks
    scale = max(1e-9, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    assert err < 2e-4, err


def test_step_he_raw_matches_streaming_decoder():
    """BatchDecoder.step_he_raw (batched, device-resident core->SBR
    chain) equals the streaming AACDecoder SBR path across chunked steps,
    including a mid-stream chunk boundary."""
    from aacjax.api import AACDecoder
    stream = make_he_stream(ch=2, n_frames=7, invf=1)
    config, _ = _parse_he(stream, 2)
    payloads = [stream[s:e] for _, s, e in adts.split_frames(stream)]

    dec = AACDecoder()
    dec.feed(stream)
    ref = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        ref.append(c.reshape(-1, 2))
    want = np.concatenate(ref)                    # [T*2048, 2]

    b = BatchDecoder([config], chunk_frames=4, use_native=False)
    outs = []
    for lo in (0, 4):
        group = payloads[lo:lo + 4]
        pcm = b.step_he_raw([group])              # [C, T, 2048]
        n = len(group)
        outs.append(np.ascontiguousarray(
            pcm[:2, :n].reshape(2, n * 2048).T))
    got = np.concatenate(outs)
    scale = max(1e-9, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    assert err < 2e-4, err


def test_step_he_raw_native_parse_matches_python():
    """The native HE path (C++ core parse + recorded SBR FIL positions,
    python parses only the SBR payloads) equals the pure-python HE path."""
    from aacjax.host import native
    if not native.available():
        import pytest
        pytest.skip("native parser not built")
    stream = make_he_stream(ch=2, n_frames=6, invf=1, num_env=2)
    config, _ = _parse_he(stream, 2)
    payloads = [stream[s:e] for _, s, e in adts.split_frames(stream)]

    bp = BatchDecoder([config], chunk_frames=len(payloads),
                      use_native=False)
    want = bp.step_he_raw([payloads])

    bn = BatchDecoder([config], chunk_frames=len(payloads),
                      use_native=True)
    assert bn.use_native
    got = bn.step_he_raw([payloads])
    scale = max(1e-9, float(np.abs(want).max()))
    # the two CORE parse paths differ at the float32 level (host-fused
    # dequant vs device dequant), and envelope normalization amplifies
    # relative differences on near-empty HF source bands; observed ~1.5e-4
    assert float(np.abs(got - want).max()) / scale < 5e-4


def test_request_reset_mid_he_pipeline():
    """Serving on the HE path: a slot is recycled WHILE the 3-stage
    decode_he_pipelined generator has chunks in flight (upload/dispatch
    AND download workers).  The deferred reset drains everything in
    flight, the newcomer restarts like a fresh decoder, and the neighbor
    stream's PCM is bit-identical to an undisturbed run."""
    from aacjax.host import native
    if not native.available():
        pytest.skip("native parser not built")
    a = make_he_stream(ch=2, n_frames=12, invf=1)
    b = make_he_stream(ch=2, n_frames=12, invf=1, num_env=2)
    c = make_he_stream(ch=2, n_frames=6, invf=1, num_env=4)
    config, _ = _parse_he(a, 2)
    pa = [a[s:e] for _, s, e in adts.split_frames(a)]
    pb = [b[s:e] for _, s, e in adts.split_frames(b)]
    pc = [c[s:e] for _, s, e in adts.split_frames(c)]
    T = 3

    ref = BatchDecoder([config, config], chunk_frames=T)
    want_b = [np.asarray(x)[2:4] for x in ref.decode_he_pipelined(
        iter([[pa[i*T:(i+1)*T], pb[i*T:(i+1)*T]] for i in range(4)]))]
    fresh = BatchDecoder([config], chunk_frames=T)
    want_c = [np.asarray(x) for x in fresh.decode_he_pipelined(
        iter([[pc[i*T:(i+1)*T]] for i in range(2)]))]

    dec = BatchDecoder([config, config], chunk_frames=T)

    def source():
        for i in range(4):
            if i == 2:
                dec.request_reset(0)
            src0 = pa[i*T:(i+1)*T] if i < 2 else pc[(i-2)*T:(i-1)*T]
            yield [src0, pb[i*T:(i+1)*T]]

    got = [np.asarray(x) for x in dec.decode_he_pipelined(source())]
    assert len(got) == 4
    for i in range(4):
        np.testing.assert_array_equal(got[i][2:4], want_b[i])
    for i in (0, 1):
        peak = max(float(np.abs(want_c[i][0:2]).max()), 1)
        err = float(np.abs(got[2 + i][0:2].astype(np.int32)
                           - want_c[i][0:2].astype(np.int32)).max())
        assert err / peak < 1e-4, (i, err, peak)


@pytest.mark.parametrize("duplex", [True, False])
def test_decode_he_pipelined_matches_step_he_raw(duplex):
    """The 3-stage pipelined HE generator (host parse ∥ H2D+dispatch ∥
    D2H+sticky replay, per-chunk SBR context snapshotted) yields the
    same chunks as sequential step_he_raw — cross-chunk SBR/QMF state
    carried identically — with transfers overlapped (duplex) AND under
    the serialized-transfer lock used on half-duplex links."""
    from aacjax.host import native
    if not native.available():
        pytest.skip("native parser not built")
    stream = make_he_stream(ch=2, n_frames=9, invf=1, num_env=2)
    config, _ = _parse_he(stream, 2)
    payloads = [stream[s:e] for _, s, e in adts.split_frames(stream)]

    ref = BatchDecoder([config], chunk_frames=3)
    assert ref.use_native
    want = [np.array(ref.step_he_raw([payloads[lo:lo + 3]],
                                     out_int16=True))
            for lo in (0, 3, 6)]

    pl = BatchDecoder([config], chunk_frames=3)
    it = ([payloads[lo:lo + 3]] for lo in (0, 3, 6))
    got = list(pl.decode_he_pipelined(it, out_int16=True, duplex=duplex))
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_compact_dense_transfer_close_to_exact():
    """Compact SBR-plane transfer (sbr_pack.compact_dense: exact int8
    flags + 1/1024-log2 int16 energies with per-frame exponent anchors)
    vs the exact f32 planes: identical decode to ~-70 dB — far below the
    SBR envelope quantizer's own 2^(1/2) step."""
    from aacjax.host import native
    if not native.available():
        import pytest
        pytest.skip("native parser not built")
    stream = make_he_stream(ch=2, n_frames=6, invf=1, num_env=2)
    config, _ = _parse_he(stream, 2)
    payloads = [stream[s:e] for _, s, e in adts.split_frames(stream)]

    be = BatchDecoder([config], chunk_frames=len(payloads), use_native=True)
    want = be.step_he_raw([payloads], compact=False)
    bc = BatchDecoder([config], chunk_frames=len(payloads), use_native=True)
    got = bc.step_he_raw([payloads], compact=True)
    scale = max(1e-9, float(np.abs(want).max()))
    rel = float(np.abs(got - want).max()) / scale
    assert 0 < rel < 5e-4   # compact engaged, fidelity bounded
