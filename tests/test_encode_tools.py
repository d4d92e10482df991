"""Encoder coding tools: TNS analysis, PNS detection, intensity stereo.

The reference is decode-only; these tools make the production encoder
real.  Each tool's bitstream output is validated two ways: our own
decode pipeline, and libavcodec decoding the same stream (sample-exact
for TNS/IS; PNS compares band energies since decoder noise is random by
design).
"""
import numpy as np
import pytest
from scipy import signal as sig

from aacjax import decode_adts
from aacjax.encode import AACEncoder, _levinson, tns_analyze, tns_fir
from aacjax.host.adts import split_frames
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import decode_frame
from aacjax.testing import ffmpeg_oracle

HAVE_ORACLE = ffmpeg_oracle.available()
SR = 44100


def tool_stats(stream: bytes, chan_config=2):
    """Walk the ADTS stream counting TNS channel-frames and
    noise/intensity band types."""
    cfg = parse_asc(make_asc(2, 4, chan_config))
    n_tns = n_noise = n_is = 0
    shapes = [0] * chan_config
    for _, s, e in split_frames(stream):
        fr = decode_frame(BitReader(stream[s:e]), cfg, shapes)
        for el in fr.elements:
            chans = ([el.ics] if hasattr(el, "ics")
                     else [el.left, el.right])
            for ch in chans:
                if ch.tns_present:
                    n_tns += 1
                bts = np.asarray(ch.band_types)
                n_noise += int(np.sum(bts == 13))
                n_is += int(np.sum(bts >= 14))
            shapes = [ch.info.window_shape for ch in chans]
    return n_tns, n_noise, n_is


def snr_db(stream: bytes, pcm: np.ndarray) -> float:
    out, _ = decode_adts(stream, on_error="raise")
    d = out[1024:] * 32768
    x = pcm[: len(d)]
    return float(10 * np.log10(
        (x ** 2).sum() / max(((d - x) ** 2).sum(), 1e-12)))


def sawtooth_stereo(n=1024 * 16):
    t = np.arange(n) / SR
    saw = 9000 * sig.sawtooth(2 * np.pi * 110 * t)
    return np.stack([saw, saw * 0.8], axis=1)


def test_levinson_order1():
    """k1 = r1/r0 and err1 = r0(1-k1^2) — the convention the decoder's
    reflection-to-LPC conversion expects."""
    r = np.array([2.0, 1.2, 0.9])
    k, err = _levinson(r, 2)
    assert abs(k[0] - 0.6) < 1e-12
    assert abs(err[1] - 2.0 * (1 - 0.36)) < 1e-12


def test_tns_fir_ar_roundtrip():
    """The encoder's analysis FIR and the decoder's AR pass are exact
    inverses for the same quantized LPC."""
    rng = np.random.default_rng(3)
    e = rng.standard_normal(1024)
    y = np.zeros(1024)
    for n in range(1, 1024):
        y[n] = 0.9 * y[n - 1] + e[n]
    y[0] = e[0]
    got = tns_analyze(y, 100, 900)
    assert got is not None
    lpc, idxs = got
    assert 1 <= len(idxs) <= 12 and all(0 <= i < 16 for i in idxs)
    x = tns_fir(y, 100, 900, lpc)
    z = x.copy()
    for n in range(100, 900):
        for i in range(1, min(n - 100, len(lpc)) + 1):
            z[n] -= z[n - i] * lpc[i - 1]
    assert np.abs(z - y).max() < 1e-9
    e_in = float(y[100:900] @ y[100:900])
    e_res = float(x[100:900] @ x[100:900])
    assert e_in / e_res > 1.3  # genuine prediction gain


def test_tns_analyze_declines_white_spectrum():
    rng = np.random.default_rng(11)
    assert tns_analyze(rng.standard_normal(1024), 100, 900) is None


def test_tns_fires_and_improves_quality():
    """Pitch-pulse content (sawtooth) has strong temporal structure inside
    long windows — the TNS sweet spot.  Same bitrate, measurably better
    waveform SNR, and sample-exact interop with libavcodec."""
    pcm = sawtooth_stereo()
    on = AACEncoder(SR, 2, 96_000, pns=False).encode(pcm)
    off = AACEncoder(SR, 2, 96_000, tns=False, pns=False).encode(pcm)
    n_tns, _, _ = tool_stats(on)
    assert n_tns >= 16, n_tns
    gain = snr_db(on, pcm) - snr_db(off, pcm)
    assert gain > 2.0, f"TNS gained only {gain:.2f} dB"
    if HAVE_ORACLE:
        ref, _ = ffmpeg_oracle.decode_adts(on)
        mine, _ = decode_adts(on)
        n = min(len(ref), len(mine))
        peak = max(float(np.abs(ref[:n]).max()), 1e-9)
        assert float(np.abs(ref[:n] - mine[:n]).max()) / peak < 2e-4


def test_intensity_stereo_fires_and_tracks_image():
    """Hard-correlated stereo (right = 0.5 * left) above the IS start
    frequency: intensity bands appear and the decoded channel ratio
    follows the original image."""
    n = 1024 * 16
    rng = np.random.default_rng(7)
    hiss = sig.lfilter(*sig.butter(6, 5000 / (SR / 2), "highpass"),
                       rng.standard_normal(n) * 4000)
    t = np.arange(n) / SR
    base = 8000 * np.sin(2 * np.pi * 440 * t)
    left = base + hiss
    pcm = np.stack([left, 0.5 * left], axis=1)
    stream = AACEncoder(SR, 2, 64_000, tns=False, pns=False).encode(pcm)
    _, _, n_is = tool_stats(stream)
    assert n_is >= 20, n_is
    out, _ = decode_adts(stream, on_error="raise")
    d = out[1024:] * 32768
    ratio = float(np.abs(d[:, 1]).mean() / np.abs(d[:, 0]).mean())
    assert 0.4 < ratio < 0.6, ratio
    if HAVE_ORACLE:
        ref, _ = ffmpeg_oracle.decode_adts(stream)
        mine, _ = decode_adts(stream)
        nn = min(len(ref), len(mine))
        peak = max(float(np.abs(ref[:nn]).max()), 1e-9)
        assert float(np.abs(ref[:nn] - mine[:nn]).max()) / peak < 2e-4


def test_pns_fires_and_preserves_band_energy():
    """Noise-like high bands become parametric noise; the decoded
    spectrum keeps the band energy (within 2.5 dB in a band inside the
    encoder's bandwidth cutoff) even though the waveform is synthetic."""
    n = 1024 * 16
    rng = np.random.default_rng(13)
    hp = sig.lfilter(*sig.butter(6, 4500 / (SR / 2), "highpass"),
                     rng.standard_normal(n) * 4000)
    pcm = hp.reshape(-1, 1)
    enc = AACEncoder(SR, 1, 48_000, tns=False, intensity=False)
    stream = enc.encode(pcm)
    _, n_noise, _ = tool_stats(stream, chan_config=1)
    assert n_noise >= 30, n_noise
    out, _ = decode_adts(stream, on_error="raise")
    d = out[1024:, 0] * 32768
    x = pcm[: len(d), 0]
    b, a = sig.butter(4, [5000 / (SR / 2), 6500 / (SR / 2)], "bandpass")
    eo = float((sig.lfilter(b, a, x) ** 2).mean())
    ed = float((sig.lfilter(b, a, d) ** 2).mean())
    assert abs(10 * np.log10(ed / eo)) < 2.5, (eo, ed)
    if HAVE_ORACLE:  # libavcodec accepts and stays energy-consistent
        ref, _ = ffmpeg_oracle.decode_adts(stream)
        er = float((sig.lfilter(b, a, ref[1024:, 0] * 32768) ** 2).mean())
        assert abs(10 * np.log10(er / eo)) < 2.5, (eo, er)


def test_all_tools_stream_decodes_everywhere():
    """TNS + PNS + IS in one stream: our batched decoder (strict mode)
    and libavcodec both decode it; bitrate still lands on target."""
    n = 1024 * 20
    t = np.arange(n) / SR
    rng = np.random.default_rng(5)
    base = (8000 * np.sin(2 * np.pi * 440 * t)
            + 3000 * np.sin(2 * np.pi * 1320 * t))
    hiss = sig.lfilter(*sig.butter(6, 5000 / (SR / 2), "highpass"),
                       rng.standard_normal(n) * 1200)
    pcm = np.stack([base + hiss, 0.7 * base + 0.6 * hiss], axis=1)
    bitrate = 96_000
    enc = AACEncoder(SR, 2, bitrate)
    stream = enc.encode(pcm)
    n_tns, n_noise, n_is = tool_stats(stream)
    assert n_noise > 0 and n_is > 0
    decode_adts(stream, on_error="raise")
    if HAVE_ORACLE:
        ffmpeg_oracle.decode_adts(stream)
    secs = n / SR
    measured = len(stream) * 8 / secs
    assert abs(measured - bitrate) / bitrate < 0.12, measured


def test_tools_can_be_disabled():
    pcm = sawtooth_stereo(1024 * 6)
    enc = AACEncoder(SR, 2, 96_000, tns=False, pns=False, intensity=False)
    stream = enc.encode(pcm)
    n_tns, n_noise, n_is = tool_stats(stream)
    assert n_tns == 0 and n_noise == 0 and n_is == 0
    assert snr_db(stream, pcm) > 10


def test_short_window_tns_fires_and_matches_oracle():
    """Castanet-like click content forces EIGHT_SHORT frames; per-window
    order<=5 TNS filters appear and the stream stays sample-exact in
    libavcodec."""
    n = 1024 * 16
    rng = np.random.default_rng(5)
    x = np.zeros(n)
    x[::1536] = 1.0
    x = sig.lfilter([1, -0.3], [1, -0.98], x) * 18000
    x += 500 * rng.standard_normal(n)
    pcm = np.stack([x, x * 0.9], axis=1)
    stream = AACEncoder(SR, 2, 96_000, pns=False).encode(pcm)
    cfg = parse_asc(make_asc(2, 4, 2))
    n_short = n_short_tns = 0
    shapes = [0, 0]
    for _, s, e in split_frames(stream):
        fr = decode_frame(BitReader(stream[s:e]), cfg, shapes)
        for el in fr.elements:
            for ch in (el.left, el.right):
                if ch.info.window_sequence == 2:
                    n_short += 1
                    n_short_tns += bool(ch.tns_present)
            shapes = [el.left.info.window_shape,
                      el.right.info.window_shape]
    assert n_short >= 8 and n_short_tns >= n_short // 2, \
        (n_short, n_short_tns)
    decode_adts(stream, on_error="raise")
    if HAVE_ORACLE:
        ref, _ = ffmpeg_oracle.decode_adts(stream)
        mine, _ = decode_adts(stream)
        nn = min(len(ref), len(mine))
        peak = max(float(np.abs(ref[:nn]).max()), 1e-9)
        assert float(np.abs(ref[:nn] - mine[:nn]).max()) / peak < 2e-4
