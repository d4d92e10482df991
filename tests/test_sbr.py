"""HE-AAC v1 (SBR) decode — a capability the reference rejects outright
(decoder.js:279-280).

The oracle is libavcodec decoding the same self-generated HE-AAC streams:
aacjax's SBR output matches FFmpeg's SAMPLE-EXACTLY (float32 precision,
>100 dB) across inverse-filter modes, envelope counts, frequency
resolutions, noise floors, stereo and alternative header parameters —
the strongest conformance statement available in this environment.
"""
import numpy as np
import pytest

from aacjax.api import AACDecoder
from aacjax.host import sbr as S
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload

HAVE_ORACLE = ffmpeg_oracle.available()


def _lowpass_noise(rng, n, ch):
    """Mostly-lowpass noise with a small broadband floor.  The floor keeps
    every HF patch source band well above the float32 rounding noise of
    the QMF arithmetic — without it, near-empty source bands get
    envelope-normalized up to the target energy and the (legitimate)
    float32-vs-float64 rounding differences vs FFmpeg dominate the
    comparison (~60 dB instead of the ~130 dB precision floor)."""
    x = rng.standard_normal((n + 256, ch))
    k = np.hanning(65)
    k = k * np.sinc(np.linspace(-8, 8, 65) * 0.4)
    for c in range(ch):
        x[:, c] = np.convolve(x[:, c], k, mode="same")
    x = x[:n] + 0.03 * rng.standard_normal((n, ch))
    return x * 9000 / max(1.0, np.abs(x).max()) * 3


def make_he_stream(ch=1, num_env=2, invf=1, env_q=25, noise_q=30,
                   freq_res=1, header=None, n_frames=7, seed=1):
    rng = np.random.default_rng(seed)
    core_cfg = parse_asc(make_asc(2, 7, ch))  # 22050 core -> 44100 out
    h = header or S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3,
                              xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    n = t.n_bands(freq_res)
    nn = 2 if num_env > 1 else 1

    def spec():
        return SBRFrameSpec(
            num_env=num_env, freq_res=freq_res, invf=[invf] * t.n_q,
            env_q=np.full((num_env, n), env_q, np.int64),
            noise_q=np.full((nn, t.n_q), noise_q, np.int64))

    pay = sbr_payload([spec()] if ch == 1 else [spec(), spec()], h,
                      2 * core_cfg.sample_rate)
    x = _lowpass_noise(rng, 1024 * n_frames, ch)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=[pay])
    return b"".join(enc.adts_frame(p, core_cfg) for p in frames)


def decode_ours(stream):
    dec = AACDecoder()
    dec.feed(stream)
    outs = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        outs.append(c)
    assert dec._sbr_mode is True
    assert dec.output_sample_rate == 44100
    nch = outs[0].size // 2048
    return np.concatenate([c.reshape(-1, nch) for c in outs])


def oracle_snr(stream) -> float:
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100  # FFmpeg accepted + enabled SBR
    got = decode_ours(stream)
    a = want[4000:12000, 0].astype(np.float64)
    b = got[4000:12000, 0].astype(np.float64)
    err = a - b
    return 10 * np.log10(float(np.sum(a ** 2))
                         / max(float(np.sum(err ** 2)), 1e-30))


# ---------------------------------------------------------------------------
# conformance vs libavcodec (sample-exact)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("kw,label", [
    (dict(invf=0), "no inverse filtering"),
    (dict(invf=1), "invf LOW"),
    (dict(invf=3), "invf STRONG"),
    (dict(num_env=1, env_q=40), "single envelope (amp_res forced 0)"),
    (dict(num_env=4, noise_q=20), "four envelopes, real noise floor"),
    (dict(freq_res=0), "low frequency resolution"),
    (dict(ch=2), "stereo CPE (non-coupled)"),
    (dict(header=S.SBRHeader(amp_res=0, start_freq=6, stop_freq=5,
                             xover_band=2, freq_scale=1, noise_bands=1,
                             limiter_bands=1, limiter_gains=1)),
     "alternative header (tables/limiter/noise bands)"),
])
def test_sbr_matches_ffmpeg_sample_exact(kw, label):
    snr = oracle_snr(make_he_stream(**kw))
    assert snr > 80.0, (label, snr)  # observed ~130 dB (float32 floor)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_sbr_unpatched_tail_bands_match_ffmpeg():
    """Headers whose patch construction covers FEWER than m subbands
    (start_freq=6/stop_freq=4 at 44.1k: m=16, patch total 14): the
    unpatched tail bands carry envelope noise/sinusoids even though
    xhigh is zero there — on the streaming numpy path AND the batched
    device path (whose output mask once dropped them; found by
    tools/diff_fuzz.py --he)."""
    from aacjax.api import decode_adts
    h = S.SBRHeader(amp_res=1, start_freq=6, stop_freq=4, xover_band=0)
    t = S.derive_tables(h, 44100)
    assert sum(t.patch_num_subbands) < t.m   # the geometry this pins
    stream = make_he_stream(ch=1, n_frames=7, header=h, noise_q=12)
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100
    got_np = decode_ours(stream)
    got_dev, r2 = decode_adts(stream)
    assert r2 == 44100
    for name, got in (("numpy", got_np), ("batched", got_dev)):
        a = want[4000:12000, 0].astype(np.float64)
        b = got[4000:12000, 0].astype(np.float64)
        snr = 10 * np.log10(float(np.sum(a ** 2))
                            / max(float(np.sum((a - b) ** 2)), 1e-30))
        assert snr > 80.0, (name, snr)


# ---------------------------------------------------------------------------
# bitstream / tables
# ---------------------------------------------------------------------------
def test_freq_table_derivation():
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    fm = np.asarray(t.f_master)
    assert (np.diff(fm) > 0).all()
    assert t.kx == fm[t.n_master - t.n_high]
    assert t.kx + t.m <= 64
    assert t.f_low[0] == t.f_high[0] and t.f_low[-1] == t.f_high[-1]
    assert t.f_noise[0] == t.kx and t.f_noise[-1] == t.k2
    assert sum(t.patch_num_subbands) == t.m


def test_sbr_parse_roundtrip():
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    rng = np.random.default_rng(5)
    env = rng.integers(10, 40, size=(2, t.n_high)).astype(np.int64)
    noise = rng.integers(5, 25, size=(2, t.n_q)).astype(np.int64)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[2, 1][: t.n_q],
                        env_q=env, noise_q=noise)
    pay = sbr_payload([spec], h, 44100)

    ctx = S.SBRContext(sample_rate=44100)
    r = BitReader(pay)
    assert r.read(4) == S.EXT_SBR_DATA
    frame = S.read_sbr_extension(r, ctx, is_cpe=False, crc=False)
    cd = frame.channels[0]
    assert cd.grid.num_env == 2
    assert cd.grid.num_noise == 2
    np.testing.assert_array_equal(cd.env_facs[:, : t.n_high], env)
    np.testing.assert_array_equal(cd.noise_facs, noise)
    np.testing.assert_array_equal(cd.invf_mode, [2, 1][: t.n_q])


def test_explicit_sbr_asc():
    cookie = make_asc(2, 7, 2, sbr=True)
    cfg = parse_asc(cookie)
    assert cfg.sbr == 1
    assert cfg.sample_rate == 22050
    assert cfg.output_sample_rate == 44100
    assert cfg.profile == 2


def test_upsample_only_frames():
    """Frames without SBR payloads in an SBR stream still upsample 2x
    (passthrough mode keeps state/delay aligned)."""
    core_cfg = parse_asc(make_asc(2, 7, 1))
    rng = np.random.default_rng(3)
    x = _lowpass_noise(rng, 1024 * 4, 1)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)
    dec = AACDecoder(cookie=make_asc(2, 7, 1, sbr=True))
    dec.feed(stream)
    outs = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        outs.append(c)
    assert all(o.shape == (2048,) for o in outs)
    assert dec.output_sample_rate == 44100


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_sbr_streaming_partial_feed_matches():
    stream = make_he_stream(invf=1, n_frames=5)
    want = decode_ours(stream)
    dec = AACDecoder()
    got = []
    for i in range(0, len(stream), 333):
        dec.feed(stream[i:i + 333])
        while True:
            c = dec.read_chunk()
            if c is None:
                break
            got.append(c.reshape(-1, 1))
    np.testing.assert_allclose(np.concatenate(got), want, atol=1e-7)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_decode_adts_routes_he_aac():
    """decode_adts detects implicitly signaled SBR and returns the 2x
    output rate instead of silently emitting the core-only lowband."""
    from aacjax.api import decode_adts
    stream = make_he_stream(invf=1, n_frames=5)
    pcm, rate = decode_adts(stream)
    assert rate == 44100
    assert pcm.shape == (6 * 2048, 1)  # encoder emits n_frames+1 blocks
    want, _ = ffmpeg_oracle.decode_adts(stream)
    a = want[4000:9000, 0].astype(np.float64)
    b = pcm[4000:9000, 0].astype(np.float64)
    snr = 10 * np.log10(np.sum(a ** 2) / max(np.sum((a - b) ** 2), 1e-30))
    assert snr > 80


def _stream_from_specs(specs, header=None, coupling=False, n_frames=6,
                       seed=2, ch=None):
    core_ch = ch or len(specs)
    rng = np.random.default_rng(seed)
    core_cfg = parse_asc(make_asc(2, 7, core_ch))
    h = header or S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3,
                              xover_band=0)
    pay = sbr_payload(specs, h, 2 * core_cfg.sample_rate, coupling=coupling)
    x = _lowpass_noise(rng, 1024 * n_frames, core_ch)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=[pay])
    return b"".join(enc.adts_frame(p, core_cfg) for p in frames)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_sbr_coupled_stereo_matches_ffmpeg():
    """bs_coupling=1: shared grid/invf, ch1 coded as balance with the
    balance codebooks and delta 2; panning dequant must match."""
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    s0 = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                      env_q=np.full((2, t.n_high), 27, np.int64),
                      noise_q=np.full((2, t.n_q), 24, np.int64))
    s1 = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                      env_q=np.full((2, t.n_high), 14, np.int64),  # pan
                      noise_q=np.full((2, t.n_q), 10, np.int64))
    snr = oracle_snr(_stream_from_specs([s0, s1], coupling=True))
    assert snr > 80.0, snr


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_sbr_delta_time_coding_matches_ffmpeg():
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    env = np.stack([np.full(t.n_high, 24), np.full(t.n_high, 28)])
    noise = np.stack([np.full(t.n_q, 20), np.full(t.n_q, 23)])
    s = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                     env_q=env.astype(np.int64),
                     noise_q=noise.astype(np.int64),
                     df_env=[0, 1], df_noise=[0, 1])
    snr = oracle_snr(_stream_from_specs([s]))
    assert snr > 80.0, snr


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_sbr_add_harmonic_matches_ffmpeg():
    """Sinusoidal coding: harmonics injected at band centers with the
    phase rotation/sign conventions."""
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    ah = np.zeros(t.n_high, bool)
    ah[2] = ah[5] = True
    s = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                     env_q=np.full((2, t.n_high), 26, np.int64),
                     noise_q=np.full((2, t.n_q), 22, np.int64),
                     add_harmonic=ah)
    snr = oracle_snr(_stream_from_specs([s]))
    assert snr > 80.0, snr


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("pointer", [0, 1, 2])
def test_sbr_fixvar_transient_matches_ffmpeg(pointer):
    """FIXVAR grid (variable trailing border, no overhang) with a
    transient pointer: exercises l_A gating, the noise-floor middle
    border, and unequal envelope durations."""
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    s = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                     env_q=np.stack([np.full(t.n_high, 24),
                                     np.full(t.n_high, 30)]).astype(np.int64),
                     noise_q=np.full((2, t.n_q), 22, np.int64),
                     frame_class=S.FIXVAR, var_bord_1=0,
                     rel_widths=[6], pointer=pointer)
    snr = oracle_snr(_stream_from_specs([s]))
    assert snr > 80.0, (pointer, snr)


def _overhang_stream(n_frames=7, seed=3):
    """Frame sequence exercising every VAR grid class with envelope
    borders PAST the frame end (t_env up to 19): the adjusted overhang
    slots must carry into the next frame's X (FFmpeg's Y double-buffer;
    aacjax's SBRChannelProc.y_tail).  Envelope amplitudes differ so a
    wrong carry is loud."""
    core_cfg = parse_asc(make_asc(2, 7, 1))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    n = t.n_bands(1)

    def spec(e0, e1, **kw):
        ne = kw.pop("num_env", 2)
        qs = np.stack([np.full(n, e0, np.int64),
                       np.full(n, e1, np.int64)][:ne])
        nn = 2 if ne > 1 else 1
        return SBRFrameSpec(num_env=ne, freq_res=1, invf=[1] * t.n_q,
                            env_q=qs,
                            noise_q=np.full((nn, t.n_q), 30, np.int64),
                            **kw)

    seq = [
        spec(25, 25),                                   # FIXFIX warmup
        # FIXVAR trail t=18: last envelope overhangs by 2 t-units
        spec(20, 40, frame_class=S.FIXVAR, var_bord_1=2, rel_widths=[4]),
        # VARFIX continuing at the overhang border
        spec(22, 22, frame_class=S.VARFIX, abs_bord_0=2,
             rel_widths_lead=[6]),
        # single-envelope FIXVAR with maximum overhang (t=19)
        spec(38, 0, num_env=1, frame_class=S.FIXVAR, var_bord_1=3),
        # VARVAR with leading border at the previous overhang
        spec(18, 30, frame_class=S.VARVAR, abs_bord_0=3,
             rel_widths_lead=[4], rel_widths=[]),
        spec(25, 25),
        spec(25, 25),
    ]
    pays = [sbr_payload([sp], h, 2 * core_cfg.sample_rate,
                        write_header=(i == 0)) for i, sp in enumerate(seq)]
    rng = np.random.default_rng(seed)
    x = _lowpass_noise(rng, 1024 * n_frames, 1)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    return b"".join(enc.adts_frame(p, core_cfg) for p in frames)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_sbr_var_overhang_matches_ffmpeg():
    """VAR-class envelope overhang (Y-carry) is sample-exact: per-frame
    SNR vs libavcodec stays at the float32 floor through FIXVAR/VARFIX/
    VARVAR transitions with overhanging borders."""
    stream = _overhang_stream()
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100
    got = decode_ours(stream)
    # skip the first two frames (QMF warm-up differs, as in every SBR
    # test); every later frame must match at f32 precision
    for f in range(2, 7):
        sl = slice(f * 2048 + 64, (f + 1) * 2048)
        a = want[sl, 0].astype(np.float64)
        b = got[sl, 0].astype(np.float64)
        snr = 10 * np.log10(np.sum(a ** 2)
                            / max(np.sum((a - b) ** 2), 1e-30))
        assert snr > 80.0, (f, snr)


def test_sbr_batch_overhang_on_device():
    """VAR-class overhang runs in the batched kernel itself (Y double
    buffer): no slot goes sticky, and the output matches the streaming
    decoder at the f32 floor — including across a chunk boundary."""
    from aacjax.runtime.batch import BatchDecoder
    stream = _overhang_stream()
    import aacjax.host.adts as adts
    frames = adts.split_frames(stream)
    cfg = parse_asc(adts.synthesize_cookie(frames[0][0]))
    payloads = [stream[s:e] for _, s, e in frames]
    want = decode_ours(stream)
    for chunk in (len(payloads), 3):
        dec = BatchDecoder([cfg], chunk_frames=chunk)
        outs = []
        for lo in range(0, len(payloads), chunk):
            group = payloads[lo:lo + chunk]
            out = dec.step_he_raw([group])
            outs.append(out[0, :len(group)].reshape(-1, 1))
        assert not any(dec._sbr_np_sticky)  # overhang stays on-device
        got = np.concatenate(outs)
        nn = min(len(want), len(got))
        a = want[4096:nn - 64, 0].astype(np.float64)
        b = got[4096:nn - 64, 0].astype(np.float64)
        snr = 10 * np.log10(np.sum(a ** 2)
                            / max(np.sum((a - b) ** 2), 1e-30))
        assert snr > 60.0, (chunk, snr)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_decode_adts_he_batched_stereo_and_overhang():
    """decode_adts routes PS-free HE-AAC through the batched device
    pipeline (step_he_raw); output still matches libavcodec, including
    a stream whose overhang grids divert its slot to the numpy path."""
    from aacjax.api import decode_adts
    for stream in (make_he_stream(ch=2, n_frames=5), _overhang_stream()):
        pcm, rate = decode_adts(stream)
        want, wrate = ffmpeg_oracle.decode_adts(stream)
        assert rate == wrate == 44100
        nn = min(len(want), len(pcm))
        a = want[4096:nn - 64, 0].astype(np.float64)
        b = pcm[4096:nn - 64, 0].astype(np.float64)
        snr = 10 * np.log10(np.sum(a ** 2)
                            / max(np.sum((a - b) ** 2), 1e-30))
        assert snr > 60.0, snr
