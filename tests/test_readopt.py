"""Sticky-fallback RE-ADOPTION: a slot diverted to the per-channel numpy
path (PS band-scheme flip, deviant/changed SBR header) must return to
the batched device path at the next chunk boundary — isolation is
temporary, never a one-way door (SURVEY.md §5 error-isolation spirit;
the reference has no SBR/PS at all, decoder.js:279-280, decoder.js:221).

Covers BatchDecoder._readopt_sticky: the inverse warm seeding (device
QMF/X_low/Y-carry FIFOs, PS delay/allpass/transient/synthesis state,
SBRHostState + PSPackState reconstruction from the numpy procs), the
SBR header re-election, and the PS band-mode re-election.  Also pins
the new device-native IPD/OPD-off handling (explicit-values knot-0
carry): an off->on resume never leaves the device path at all.
"""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from aacjax.host import adts
from aacjax.host.asc import parse_asc
from aacjax.runtime.batch import BatchDecoder

try:
    from aacjax.testing import ffmpeg_oracle
    HAVE_ORACLE = ffmpeg_oracle.available()
except Exception:  # pragma: no cover
    HAVE_ORACLE = False


def _decode_chunked(stream: bytes, chunk_frames: int = 2,
                    hook=None, pipelined: bool = False):
    """Decode an HE-AAC v2 ADTS stream with an inspectable BatchDecoder;
    returns (pcm [n, 2], decoder).  `hook(chunk_idx, dec)` runs after
    each chunk's device step + sticky replay."""
    frames = adts.split_frames(stream)
    cfg = parse_asc(adts.synthesize_cookie(frames[0][0]))
    dec = BatchDecoder([cfg], chunk_frames=chunk_frames, cce_slots=1)
    payloads = [stream[s:e] for _, s, e in frames]
    chunks = [payloads[k:k + chunk_frames]
              for k in range(0, len(payloads), chunk_frames)]
    outs = []
    if pipelined:
        for k, out in enumerate(dec.decode_he_pipelined(
                ([c] for c in chunks), out_int16=False)):
            out = np.asarray(out, np.float32)
            outs.append(out)
            if hook:
                hook(k, dec)
    else:
        for k, chunk in enumerate(chunks):
            outs.append(np.asarray(dec.step_he_raw([chunk]), np.float32))
            if hook:
                hook(k, dec)
    pair = dec._ps_pair[0] if dec._ps_pair[0] >= 0 else 1
    pcm = [np.stack([o[0, :len(c)].reshape(-1),
                     o[pair, :len(c)].reshape(-1)], axis=1)
           for o, c in zip(outs, chunks)]
    return np.concatenate(pcm, axis=0), dec


def _assert_oracle_exact(stream, got, tol=3e-4, start_frame=2):
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100 and want.shape[1] == 2
    n = min(len(want), len(got))
    scale = max(float(np.abs(want[:n]).max()), 1e-3)
    nfr = n // 2048
    for f in range(start_frame, nfr):
        sl = slice(f * 2048, min((f + 1) * 2048, n))
        err = float(np.abs(got[sl] - want[sl]).max()) / scale
        assert err < tol, f"frame {f}: rel err {err:.2e}"


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("head,tail", [(2, 1), (1, 2), (2, 0), (0, 2)])
def test_flip_readopts_next_chunk(head, tail):
    """A band-scheme flip diverts the slot to numpy for AT MOST one
    chunk: the next chunk boundary re-elects the kernel band mode and
    rebuilds the device state from the numpy procs; output stays
    oracle-exact through divert AND re-adopt."""
    from test_ps import _make_flip_stream
    modes = [head] * 4 + [tail] * 8
    stream = _make_flip_stream(modes)
    sticky_per_chunk = []

    def hook(k, dec):
        sticky_per_chunk.append(list(dec._sbr_np_sticky))

    got, dec = _decode_chunked(stream, chunk_frames=2, hook=hook)
    # flip lands in chunk 2 (frames 4-5): sticky there, clear from the
    # next processed chunk on
    assert any(sticky_per_chunk[2]), "flip chunk should divert to numpy"
    for k in range(3, len(sticky_per_chunk)):
        assert not any(sticky_per_chunk[k]), f"chunk {k} still sticky"
    assert all(p is None for p in dec._sbr_np_procs)
    assert all(p is None for p in dec._ps_np)
    # the flipped slot now lives in the tail mode's state set
    assert dec._ps_slot_is34[0] == (tail == 2)
    _assert_oracle_exact(stream, got)


def _header_flip_stream(flip_at: int = 6, n_frames: int = 12):
    from test_ps import PSSpec, _RAMP20
    from test_sbr import _lowpass_noise
    from aacjax.host import sbr as S
    from aacjax.host.asc import make_asc
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload

    core_cfg = parse_asc(make_asc(2, 7, 1))
    h1 = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    h2 = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0,
                     limiter_gains=1)
    t = S.derive_tables(h1, 44100)
    nb = t.n_bands(1)
    ps = PSSpec(iid_mode=1, num_env=2,
                iid_par=np.stack([_RAMP20, -_RAMP20]),
                icc_mode=1, icc_par=np.arange(40).reshape(2, 20) % 8)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                        env_q=np.full((2, nb), 25, np.int64),
                        noise_q=np.full((2, t.n_q), 30, np.int64))
    pays = [sbr_payload([spec], h2 if f >= flip_at else h1, 44100, ps=ps,
                        write_header=(f in (0, flip_at)))
            for f in range(n_frames)]
    x = _lowpass_noise(np.random.default_rng(5), 1024 * n_frames, 1)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    return b"".join(enc.adts_frame(p, core_cfg) for p in frames), h2


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_header_change_chunk_aligned_no_divert():
    """An SBR header change landing ON a chunk boundary re-renders the
    slot's cfg-plane row in place: the stream never leaves the batched
    device path (headers are per-slot data, not a compile key)."""
    stream, h2 = _header_flip_stream(flip_at=6)

    sticky_per_chunk = []

    def hook(k, dec):
        sticky_per_chunk.append(list(dec._sbr_np_sticky))

    got, dec = _decode_chunked(stream, chunk_frames=2, hook=hook)
    for k, st in enumerate(sticky_per_chunk):
        assert not any(st), f"chunk {k} diverted on an aligned flip"
    assert all(hdr == h2 for hdr in dec._slot_sbr_hdr
               if hdr is not None)          # slot rows re-rendered to h2
    assert all(p is None for p in dec._sbr_np_procs)
    _assert_oracle_exact(stream, got)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_header_change_midchunk_readopts_next_chunk():
    """A MID-chunk SBR header change replays that one chunk on the numpy
    path (the chunk's cfg row is frozen) and re-adopts the slot at the
    next boundary; output stays oracle-exact."""
    stream, h2 = _header_flip_stream(flip_at=6)

    sticky_per_chunk = []

    def hook(k, dec):
        sticky_per_chunk.append(list(dec._sbr_np_sticky))

    # chunk_frames=4: the flip at frame 6 lands mid-chunk-1 (frames 4-7)
    got, dec = _decode_chunked(stream, chunk_frames=4, hook=hook)
    assert any(sticky_per_chunk[1]), "mid-chunk flip should divert"
    for k in range(2, len(sticky_per_chunk)):
        assert not any(sticky_per_chunk[k]), f"chunk {k} still sticky"
    assert all(hdr == h2 for hdr in dec._slot_sbr_hdr
               if hdr is not None)
    assert all(p is None for p in dec._sbr_np_procs)
    _assert_oracle_exact(stream, got)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ipdopd_off_resume_never_leaves_device():
    """enable_ipdopd=0 spans and the off->on resume are now expressible
    on the device (explicit-values knot-0 carry + stored-imag planes):
    the batched path decodes them with NO numpy divert at all."""
    from test_ps import PSSpec, _lowpass_noise
    from aacjax.host import sbr as S
    from aacjax.host.asc import make_asc
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload

    rng = np.random.default_rng(3)
    core_cfg = parse_asc(make_asc(2, 7, 1))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    nb = t.n_bands(1)
    flags = ["on"] * 3 + ["off"] * 3 + ["on"] * 4
    pays = []
    for f, fl in enumerate(flags):
        iid = np.clip(np.cumsum(rng.integers(-2, 3, (2, 20)), axis=1),
                      -7, 7)
        icc = np.clip(3 + np.cumsum(rng.integers(-2, 3, (2, 20)), axis=1),
                      0, 7)
        kw = dict(iid_mode=1, num_env=2, iid_par=iid,
                  icc_mode=1, icc_par=icc)
        if fl == "on":
            kw["ipd_par"] = np.clip(np.cumsum(
                rng.integers(-1, 2, (2, 11)), axis=1) % 8, 0, 7)
            kw["opd_par"] = np.clip(np.cumsum(
                rng.integers(-1, 2, (2, 11)), axis=1) % 8, 0, 7)
        else:
            kw["ipd_off"] = True
        spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                            env_q=np.full((2, nb), 25, np.int64),
                            noise_q=np.full((2, t.n_q), 30, np.int64))
        pays.append(sbr_payload([spec], h, 44100, ps=PSSpec(**kw),
                                write_header=(f == 0)))
    x = _lowpass_noise(rng, 1024 * len(flags))
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)

    ever_sticky = []

    def hook(k, dec):
        ever_sticky.append(any(dec._sbr_np_sticky))

    got, dec = _decode_chunked(stream, chunk_frames=2, hook=hook)
    assert not any(ever_sticky), "off/resume must stay on device"
    _assert_oracle_exact(stream, got)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_pipelined_no_permanent_numpy_residents():
    """decode_he_pipelined drains once per stickiness event and
    re-adopts: after a band flip mid-stream, the generator finishes with
    ZERO numpy residents and the output matches the non-pipelined path
    bit-for-bit."""
    from test_ps import _make_flip_stream
    modes = [1] * 4 + [2] * 8
    stream = _make_flip_stream(modes)
    got_pipe, dec = _decode_chunked(stream, chunk_frames=2,
                                    pipelined=True)
    assert not any(dec._sbr_np_sticky)
    assert all(p is None for p in dec._sbr_np_procs)
    assert all(p is None for p in dec._ps_np)
    got_step, _ = _decode_chunked(stream, chunk_frames=2)
    np.testing.assert_array_equal(got_pipe, got_step)
    _assert_oracle_exact(stream, got_pipe)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_mixed_sbr_headers_one_batch_device_path():
    """Two stream populations carrying DIFFERENT SBR headers decode in
    ONE BatchDecoder entirely on the batched device path: the header
    statics are per-slot cfg-plane rows (data, not compile keys), so a
    mixed-encoder fleet never degrades to the numpy path and nothing
    recompiles per header.  Every stream stays oracle-exact."""
    from test_sbr import make_he_stream
    from aacjax.host import sbr as S

    h1 = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    # different frequency grid AND limiter setup: start_freq=6/stop_freq=4
    # also exercises the patched<m corner (see sbr_batch in_range note)
    h2 = S.SBRHeader(amp_res=1, start_freq=6, stop_freq=4, xover_band=0,
                     limiter_gains=1)
    specs = [(h1, 1), (h2, 2), (h1, 3), (h2, 4)]
    streams = [make_he_stream(ch=2, header=h, n_frames=8, seed=s)
               for h, s in specs]
    frames_per = [adts.split_frames(st) for st in streams]
    cfg = parse_asc(adts.synthesize_cookie(frames_per[0][0][0]))
    dec = BatchDecoder([cfg] * len(streams), chunk_frames=2)
    payloads_per = [[st[s:e] for _, s, e in fr]
                    for st, fr in zip(streams, frames_per)]
    outs = []
    for lo in range(0, 8, 2):
        outs.append(np.asarray(dec.step_he_raw(
            [p[lo:lo + 2] for p in payloads_per])))
        assert not any(dec._sbr_np_sticky), f"chunk {lo//2} diverted"
    assert not dec._readopt_blocked
    assert all(p is None for p in dec._sbr_np_procs)
    # the two headers rendered into per-slot rows, not one elected config
    assert set(dec._slot_sbr_hdr) == {h1, h2}
    got = np.concatenate(outs, axis=1)       # [C, T, 2048]
    for i, st in enumerate(streams):
        want, rate = ffmpeg_oracle.decode_adts(st)
        assert rate == 44100
        mine = np.stack([got[2 * i].reshape(-1),
                         got[2 * i + 1].reshape(-1)], axis=1)
        n = min(len(want), len(mine))
        scale = max(float(np.abs(want[:n]).max()), 1e-3)
        err = float(np.abs(mine[2048:n] - want[2048:n]).max()) / scale
        assert err < 3e-4, f"stream {i}: rel err {err:.2e}"


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_mixed_ps_band_modes_one_batch_device_path():
    """A batch mixing 20-band and 34-band Parametric Stereo streams
    decodes entirely on the device path via the dual-mode program
    (kernels.ps_batch.sbr_ps_apply_dual): no slot ever goes sticky, no
    numpy replay, and every stream stays oracle-exact."""
    from test_ps import (_ICC34, _RAMP20, _RAMP34, make_ps_stream)
    from aacjax.testing.sbr_encoder import PSSpec

    ps20 = PSSpec(iid_mode=1, num_env=2,
                  iid_par=np.stack([_RAMP20, -_RAMP20]),
                  icc_mode=1, icc_par=np.arange(40).reshape(2, 20) % 8)
    ps34 = PSSpec(iid_mode=2, num_env=2,
                  iid_par=np.stack([_RAMP34, -_RAMP34]),
                  icc_mode=2, icc_par=np.stack([_ICC34, _ICC34[::-1]]))
    streams = [make_ps_stream(ps20, seed=1), make_ps_stream(ps34, seed=2),
               make_ps_stream(ps20, seed=3)]
    frames_per = [adts.split_frames(st) for st in streams]
    cfg = parse_asc(adts.synthesize_cookie(frames_per[0][0][0]))
    dec = BatchDecoder([cfg] * 3, chunk_frames=2, cce_slots=1)
    payloads_per = [[st[s:e] for _, s, e in fr]
                    for st, fr in zip(streams, frames_per)]
    n = min(len(p) for p in payloads_per)
    n -= n % 2
    outs = []
    for lo in range(0, n, 2):
        outs.append(np.asarray(dec.step_he_raw(
            [p[lo:lo + 2] for p in payloads_per])))
        assert not any(dec._sbr_np_sticky), f"chunk {lo//2} diverted"
    assert not dec._readopt_blocked
    assert all(p is None for p in dec._ps_np)
    # slot band modes: stream 1 (base slot 2) is 34-band, the rest 20
    assert [dec._ps_slot_is34[2 * i] for i in range(3)] == \
        [False, True, False]
    got = np.concatenate(outs, axis=1)       # [C, T, 2048]
    for i, st in enumerate(streams):
        want, rate = ffmpeg_oracle.decode_adts(st)
        assert rate == 44100 and want.shape[1] == 2
        base = 2 * i
        mine = np.stack([got[base].reshape(-1),
                         got[base + 1].reshape(-1)], axis=1)
        m = min(len(want), len(mine))
        scale = max(float(np.abs(want[:m]).max()), 1e-3)
        err = float(np.abs(mine[2048:m] - want[2048:m]).max()) / scale
        assert err < 3e-4, f"stream {i}: rel err {err:.2e}"
