"""HE-AAC v2 (Parametric Stereo) decode — a capability the reference
lacks entirely (it lists HE-v2 as planned future work, README).

A mono core + SBR + ps_data stream reconstructs STEREO from IID
(intensity difference) and ICC (coherence) parameters in the QMF/hybrid
domain.  The oracle is libavcodec decoding the same self-generated
HE-AAC v2 streams; aacjax matches it sample-exactly (float32 precision,
~100 dB) across IID/ICC modes (coarse/fine, 10/20/34 bands), mixed-mode
parameter upsampling, envelope counts, and the num_env=0 fixup.

The hybrid filterbank fold order, decorrelator recurrence, and the
10->34 / 20->34 parameter maps were recovered from the libavcodec
binary (the spec text is not available in this environment) and are
pinned here against its output.
"""
import numpy as np
import pytest

from aacjax.api import AACDecoder
from aacjax.host import sbr as S
from aacjax.host.asc import make_asc, parse_asc
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.sbr_encoder import PSSpec, SBRFrameSpec, sbr_payload

HAVE_ORACLE = ffmpeg_oracle.available()


def _lowpass_noise(rng, n):
    x = rng.standard_normal((n + 256, 1))
    k = np.hanning(65) * np.sinc(np.linspace(-8, 8, 65) * 0.4)
    x[:, 0] = np.convolve(x[:, 0], k, mode="same")
    x = x[:n] + 0.03 * rng.standard_normal((n, 1))
    return x * 9000 / max(1.0, np.abs(x).max()) * 3


def make_ps_stream(ps: PSSpec, n_frames=7, seed=1) -> bytes:
    rng = np.random.default_rng(seed)
    core_cfg = parse_asc(make_asc(2, 7, 1))  # mono 22050 core -> 44100
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    n = t.n_bands(1)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                        env_q=np.full((2, n), 25, np.int64),
                        noise_q=np.full((2, t.n_q), 30, np.int64))
    pay = sbr_payload([spec], h, 2 * core_cfg.sample_rate, ps=ps)
    x = _lowpass_noise(rng, 1024 * n_frames)
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
        outs.append(c.reshape(-1, dec.output_channels))
    assert dec.output_channels == 2  # PS engaged: mono stream, stereo out
    assert dec.output_sample_rate == 44100
    return np.concatenate(outs)


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    err = a - b
    return 10 * np.log10(float(np.sum(a ** 2))
                         / max(float(np.sum(err ** 2)), 1e-30))


def oracle_snrs(ps: PSSpec):
    stream = make_ps_stream(ps)
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100 and want.shape[1] == 2  # FFmpeg engaged PS
    got = decode_ours(stream)
    nn = min(len(want), len(got))
    sl = slice(4000, nn - 2000)
    return [_snr(want[sl, c], got[sl, c]) for c in range(2)]


_RAMP10 = np.arange(10) % 15 - 7
_RAMP20 = np.arange(20) % 15 - 7
_RAMP34 = np.arange(34) % 15 - 7
_ICC10 = np.arange(10) % 8
_ICC34 = np.arange(34) % 8


# ---------------------------------------------------------------------------
# conformance vs libavcodec (sample-exact)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("label,ps", [
    ("iid coarse 10-band",
     PSSpec(iid_mode=0, iid_par=_RAMP10[None, :])),
    ("iid coarse 20-band",
     PSSpec(iid_mode=1, iid_par=_RAMP20[None, :])),
    ("iid fine 10-band",
     PSSpec(iid_mode=3, iid_par=(np.arange(10) % 31 - 15)[None, :])),
    ("iid fine 20-band",
     PSSpec(iid_mode=4, iid_par=(np.arange(20) % 31 - 15)[None, :])),
    ("icc 10-band (decorrelator)",
     PSSpec(icc_mode=0, icc_par=_ICC10[None, :])),
    ("icc 20-band",
     PSSpec(icc_mode=1, icc_par=(np.arange(20) % 8)[None, :])),
    ("iid 34-band (hybrid 34 filterbank)",
     PSSpec(iid_mode=2, iid_par=_RAMP34[None, :])),
    ("icc 34-band",
     PSSpec(icc_mode=2, icc_par=_ICC34[None, :])),
    ("iid20 + icc10 (10->20 map)",
     PSSpec(iid_mode=1, iid_par=_RAMP20[None, :],
            icc_mode=0, icc_par=_ICC10[None, :])),
    ("iid10 + icc34 (10->34 map)",
     PSSpec(iid_mode=0, iid_par=_RAMP10[None, :],
            icc_mode=2, icc_par=_ICC34[None, :])),
    ("iid20 + icc34 (20->34 map, averaged entries)",
     PSSpec(iid_mode=1, iid_par=_RAMP20[None, :],
            icc_mode=2, icc_par=_ICC34[None, :])),
    ("two envelopes (H interpolation)",
     PSSpec(iid_mode=0, iid_par=np.stack([_RAMP10, -_RAMP10]),
            icc_mode=0, icc_par=np.stack([_ICC10, _ICC10[::-1]]))),
    ("four envelopes",
     PSSpec(iid_mode=0, num_env=4,
            iid_par=np.stack([_RAMP10, -_RAMP10, _RAMP10 // 2, _RAMP10]))),
    ("num_env=0 (synthetic envelope fixup)",
     PSSpec(iid_mode=0, num_env=0, iid_par=np.zeros((0, 10), np.int64))),
    ("ipd+opd phase extension (nr5)",
     PSSpec(iid_mode=0, iid_par=_RAMP10[None, :],
            ipd_par=((np.arange(5) * 3) % 8)[None, :],
            opd_par=((np.arange(5) * 5) % 8)[None, :])),
    ("ipd+opd+icc nr11 (neg-center imag sawtooth)",
     PSSpec(iid_mode=1, iid_par=_RAMP20[None, :],
            icc_mode=1, icc_par=(np.arange(20) % 8)[None, :],
            ipd_par=((np.arange(11) * 5) % 8)[None, :],
            opd_par=((np.arange(11) * 3) % 8)[None, :])),
    ("ipd+opd 34-band nr17",
     PSSpec(iid_mode=2, iid_par=_RAMP34[None, :],
            ipd_par=((np.arange(17) * 3) % 8)[None, :],
            opd_par=((np.arange(17) * 5) % 8)[None, :])),
    ("ipd+opd two envelopes (phase history)",
     PSSpec(iid_mode=0, num_env=2, iid_par=np.stack([_RAMP10, -_RAMP10]),
            ipd_par=np.stack([(np.arange(5) * 3) % 8,
                              (np.arange(5) * 3 + 2) % 8]),
            opd_par=np.stack([(np.arange(5) + 1) % 8,
                              (np.arange(5) * 3) % 8]))),
])
def test_ps_matches_ffmpeg_sample_exact(label, ps):
    snrs = oracle_snrs(ps)
    assert min(snrs) > 80.0, (label, snrs)  # observed ~100 dB (f32 floor)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ps_ipdopd_persists_when_extension_absent():
    """A frame whose ps_data carries NO extension keeps the previous
    frame's IPD/OPD parameters in force (libavcodec context
    persistence: its toggle-off output is bit-identical to explicitly
    re-sending the old phases — found by tools/diff_fuzz.py --ps; our
    decode once reverted to identity rotation).  Both the streaming
    numpy path and the batched device path stay sample-exact through
    the toggle."""
    import pathlib
    import sys as _sys
    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_sbr import _lowpass_noise
    from aacjax.api import decode_adts

    core_cfg = parse_asc(make_asc(2, 7, 1))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    nb = t.n_bands(1)
    on = PSSpec(iid_mode=1, num_env=1, iid_par=(np.arange(20) % 15 - 7)[None],
                icc_mode=1, icc_par=(np.arange(20) % 8)[None],
                ipd_par=np.full((1, 11), 3), opd_par=np.full((1, 11), 5))
    off = PSSpec(iid_mode=1, num_env=1, iid_par=(np.arange(20) % 15 - 7)[None],
                 icc_mode=1, icc_par=(np.arange(20) % 8)[None])
    seq = [on, on, on, off, off, off, off]
    pays = [sbr_payload(
        [SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                      env_q=np.full((2, nb), 25, np.int64),
                      noise_q=np.full((2, t.n_q), 30, np.int64))],
        h, 44100, ps=seq[min(f, 6)], write_header=(f == 0))
        for f in range(7)]
    x = _lowpass_noise(np.random.default_rng(1), 1024 * 7, 1)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100
    got_np = decode_ours(stream)
    got_dev, _ = decode_adts(stream, chunk_frames=3)
    nn = min(len(want), len(got_np), len(got_dev))
    sl = slice(3 * 2048, nn - 2000)   # the post-toggle region
    for name, got in (("numpy", got_np), ("batched", got_dev)):
        snrs = [_snr(want[sl, c], got[sl, c]) for c in range(2)]
        assert min(snrs) > 80.0, (name, snrs)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_decode_adts_routes_ps_stereo():
    """decode_adts on a mono HE-AAC v2 stream returns stereo at 2x rate."""
    from aacjax.api import decode_adts
    stream = make_ps_stream(PSSpec(iid_mode=0, iid_par=_RAMP10[None, :],
                                   icc_mode=0, icc_par=_ICC10[None, :]))
    pcm, rate = decode_adts(stream)
    assert rate == 44100
    assert pcm.shape[1] == 2
    want, _ = ffmpeg_oracle.decode_adts(stream)
    nn = min(len(want), len(pcm))
    assert _snr(want[4000:nn - 2000], pcm[4000:nn - 2000]) > 80.0


# ---------------------------------------------------------------------------
# oracle-free behavior
# ---------------------------------------------------------------------------
def test_ps_stereo_output_shape_and_iid_direction():
    """IID > 0 pans energy left; the PS path doubles the channel count."""
    stream = make_ps_stream(PSSpec(
        iid_mode=0, iid_par=np.full((1, 10), 5, np.int64)))
    got = decode_ours(stream)
    assert got.shape[1] == 2
    l_rms = float(got[4000:, 0].std())
    r_rms = float(got[4000:, 1].std())
    assert l_rms > 3 * r_rms  # iid=+5 => strongly left
    assert np.isfinite(got).all()


def test_ps_parse_roundtrip():
    """The bitstream writer and parser agree on every field."""
    from aacjax.host.bitio import BitReader, BitWriter
    from aacjax.host.ps import PSContext, read_ps_data
    from aacjax.testing.sbr_encoder import write_ps_data
    ps_in = PSSpec(iid_mode=1, iid_par=_RAMP20[None, :],
                   icc_mode=0, icc_par=_ICC10[None, :])
    w = BitWriter()
    write_ps_data(w, ps_in)
    w.write(0, 7)  # padding so the reader never underflows
    ps = read_ps_data(BitReader(w.getvalue()), PSContext(), 0)
    assert ps.enable_iid and ps.enable_icc
    assert ps.iid_mode == 1 and ps.icc_mode == 0
    assert ps.num_env >= 1
    np.testing.assert_array_equal(ps.iid_par[0], _RAMP20)
    np.testing.assert_array_equal(ps.icc_par[0], _ICC10)


# ---------------------------------------------------------------------------
# band-scheme switches (10/20 <-> 34) vs libavcodec
# ---------------------------------------------------------------------------
def _make_flip_stream(modes, seed=7):
    """One PS frame per entry in `modes` (0/1/2 = 10/20/34 bands), all
    with IID/ICC/IPD/OPD random walks — flips band scheme mid-stream."""
    rng = np.random.default_rng(seed)
    core_cfg = parse_asc(make_asc(2, 7, 1))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    nb = t.n_bands(1)
    pays = []
    for f, m in enumerate(modes):
        nr = (10, 20, 34)[m]
        nri = (5, 11, 17)[m]
        iid = np.clip(np.cumsum(rng.integers(-2, 3, (2, nr)), axis=1), -7, 7)
        icc = np.clip(3 + np.cumsum(rng.integers(-2, 3, (2, nr)), axis=1),
                      0, 7)
        ps = PSSpec(
            iid_mode=m, num_env=2, iid_par=iid, icc_mode=m, icc_par=icc,
            ipd_par=np.clip(np.cumsum(
                rng.integers(-1, 2, (2, nri)), axis=1) % 8, 0, 7),
            opd_par=np.clip(np.cumsum(
                rng.integers(-1, 2, (2, nri)), axis=1) % 8, 0, 7))
        spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                            env_q=np.full((2, nb), 25, np.int64),
                            noise_q=np.full((2, t.n_q), 30, np.int64))
        pays.append(sbr_payload([spec], h, 2 * core_cfg.sample_rate,
                                ps=ps, write_header=(f == 0)))
    x = _lowpass_noise(rng, 1024 * len(modes))
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    return b"".join(enc.adts_frame(p, core_cfg) for p in frames)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("head,tail", [(2, 1), (1, 2), (2, 0), (0, 2)])
def test_ps_band_scheme_flip_sample_exact(head, tail):
    """A mid-stream 10/20<->34 band-scheme switch stays sample-exact vs
    libavcodec on EVERY frame including the flip frame itself: the
    persisted H matrices are remapped (map_val_34_to_20/_20_to_34 on
    envelope slot 0 only), the running IPD/OPD phase accumulators
    restart, and bands at/beyond the new scheme's IPD cut keep
    interpolating the stale per-envelope-slot imaginary H components
    (aacps.c keeps those array entries forever; recovered by
    least-squares probing of the binary oracle)."""
    modes = [head] * 4 + [tail] * 4
    stream = _make_flip_stream(modes)
    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100 and want.shape[1] == 2
    got = decode_ours(stream)
    n = min(len(want), len(got))
    scale = max(float(np.abs(want[:n]).max()), 1e-3)
    for f in range(2, len(modes)):
        sl = slice(f * 2048, min((f + 1) * 2048, n))
        err = float(np.abs(got[sl] - want[sl]).max()) / scale
        assert err < 1e-4, f"frame {f}: rel err {err:.2e}"


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ps_ipdopd_explicit_off_resume():
    """An extension transmitting enable_ipdopd=0 (explicit OFF, unlike
    an absent extension) freezes — not resets — the 6-bit phase
    accumulators and leaves the stored imaginary H untouched, so IPD
    resumes from the pre-off state (ffmpeg context semantics).  Checked
    sample-exact vs libavcodec on the streaming path and self-consistent
    on the batched path (explicit-off slots divert to the warm numpy
    fallback)."""
    rng = np.random.default_rng(3)
    core_cfg = parse_asc(make_asc(2, 7, 1))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    nb = t.n_bands(1)
    flags = ["on"] * 3 + ["off"] * 3 + ["on"] * 4
    pays = []
    for f, fl in enumerate(flags):
        iid = np.clip(np.cumsum(rng.integers(-2, 3, (2, 20)), axis=1), -7, 7)
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
        pays.append(sbr_payload([spec], h, 2 * core_cfg.sample_rate,
                                ps=PSSpec(**kw), write_header=(f == 0)))
    x = _lowpass_noise(rng, 1024 * len(flags))
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)

    want, rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == 44100
    got = decode_ours(stream)
    n = min(len(want), len(got))
    scale = max(float(np.abs(want[:n]).max()), 1e-3)
    for f in range(2, len(flags)):
        sl = slice(f * 2048, min((f + 1) * 2048, n))
        err = float(np.abs(got[sl] - want[sl]).max()) / scale
        assert err < 1e-4, f"frame {f}: rel err {err:.2e}"

    from aacjax.api import decode_adts as batched_decode
    got_b, rate_b = batched_decode(stream, chunk_frames=4)
    nb2 = min(n, len(got_b))
    err_b = float(np.abs(got_b[:nb2] - got[:nb2]).max()) / scale
    assert rate_b == 44100 and err_b < 3e-3, f"batched rel err {err_b:.2e}"
