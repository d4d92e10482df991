"""Dynamic range control (ISO/IEC 14496-3 §4.5.2.7).

The reference skips every FIL payload (decoder.js:187-193), so it has no
DRC at all.  aacjax parses dynamic_range_info and applies it in the
spectral domain (per-bin scalefactor gains), opt-in via drc_scale."""
import numpy as np
import pytest

from aacjax import AACDecoder, decode_adts
from aacjax.host import adts
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import decode_frame
from aacjax.testing import encoder as enc
from aacjax.testing.encoder import drc_payload

SR = 44100


def _tone_frames(freqs=(523.0,), amp=8000.0, n=8, ch=1, drc=None):
    config = parse_asc(make_asc(2, 4, ch))
    t = np.arange(1024 * n)[:, None] / SR
    x = sum(amp * np.sin(2 * np.pi * f * t) for f in freqs)
    x = np.repeat(x, ch, axis=1)
    payloads = enc.encode_pcm_frames(
        x, config, target_sf=110,
        fil_payloads=[drc] if drc is not None else None)
    return config, x, payloads


def test_parse_roundtrip():
    config = parse_asc(make_asc(2, 4, 1))
    pay = drc_payload([-12.0, 3.5], band_tops=[128, 1024],
                      excluded=[False, True, False, True, False, False,
                                False, True],  # 8 channels -> 2 groups
                      pce_tag=5, prog_ref=100, interpolation=1)
    _, _, payloads = _tone_frames(drc=pay)
    frame = decode_frame(BitReader(payloads[1]), config, [0])
    d = frame.drc
    assert d is not None
    assert d.pce_tag == 5
    assert d.prog_ref_level == 100
    assert d.interpolation_scheme == 1
    assert list(d.band_top) == [128, 1024]
    np.testing.assert_allclose(d.gain_db, [-12.0, 3.5])
    assert list(d.excluded[:8]) == [False, True, False, True, False,
                                    False, False, True]


@pytest.mark.parametrize("gain_db,scale", [(-12.0, 1.0), (-12.0, 0.5),
                                           (6.0, 1.0)])
def test_fullband_gain_applied(gain_db, scale):
    """Constant full-band DRC scales the PCM exactly by the (scaled)
    gain; drc_scale=0 ignores it."""
    config, x, payloads = _tone_frames(drc=drc_payload([gain_db]))
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    flat, _ = decode_adts(stream)                      # drc off (default)
    scaled, _ = decode_adts(stream, drc_scale=scale)
    expect = 10.0 ** (gain_db * scale / 20.0)
    ratio = (np.linalg.norm(scaled[1024:-1024])
             / np.linalg.norm(flat[1024:-1024]))
    assert ratio == pytest.approx(expect, rel=5e-3), (ratio, expect)


def test_banded_gain():
    """Two DRC bands: the low tone is attenuated, the high tone is not
    (spectral-domain application — FAAD-style, per-bin gains)."""
    # tones at ~bin 23 (500 Hz) and ~bin 420 (9 kHz); band split at 128
    config, x, payloads = _tone_frames(
        freqs=(500.0, 9000.0), amp=6000.0,
        drc=drc_payload([-18.0, 0.0], band_tops=[128, 1024]))
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    flat, _ = decode_adts(stream)
    drc, _ = decode_adts(stream, drc_scale=1.0)
    seg_f = flat[2048:6144, 0]
    seg_d = drc[2048:6144, 0]
    spec_f = np.abs(np.fft.rfft(seg_f))
    spec_d = np.abs(np.fft.rfft(seg_d))
    lo = slice(int(500 / SR * len(seg_f)) - 4, int(500 / SR * len(seg_f)) + 5)
    hi = slice(int(9000 / SR * len(seg_f)) - 4,
               int(9000 / SR * len(seg_f)) + 5)
    lo_ratio = spec_d[lo].max() / spec_f[lo].max()
    hi_ratio = spec_d[hi].max() / spec_f[hi].max()
    assert lo_ratio == pytest.approx(10 ** (-18 / 20), rel=0.05)
    assert hi_ratio == pytest.approx(1.0, rel=0.05)


def test_excluded_channels():
    config, x, payloads = _tone_frames(
        ch=2, drc=drc_payload([-12.0], excluded=[False, True]))
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    flat, _ = decode_adts(stream)
    drc, _ = decode_adts(stream, drc_scale=1.0)
    r0 = np.linalg.norm(drc[1024:-1024, 0]) / \
        np.linalg.norm(flat[1024:-1024, 0])
    r1 = np.linalg.norm(drc[1024:-1024, 1]) / \
        np.linalg.norm(flat[1024:-1024, 1])
    assert r0 == pytest.approx(10 ** (-12 / 20), rel=5e-3)
    assert r1 == pytest.approx(1.0, rel=5e-3)


def test_streaming_decoder_matches_batch():
    config, x, payloads = _tone_frames(drc=drc_payload([-9.0]))
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    batch, _ = decode_adts(stream, drc_scale=1.0, chunk_frames=4)
    dec = AACDecoder(drc_scale=1.0)
    dec.feed(stream)
    chunks = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        chunks.append(c.reshape(-1, 1))
    got = np.concatenate(chunks)
    n = min(len(got), len(batch))
    np.testing.assert_allclose(got[:n], batch[:n], atol=2e-7)


def test_native_drc_matches_python():
    """DRC keeps the native fast path (round-2 verdict: the old reroute
    to the python parser was the one feature-conditional performance
    cliff): the C walker records dynamic_range_info FIL offsets and the
    runtime folds the gains into the dequantized spectra — identical to
    the python parser's scalefactor fold to f32 rounding."""
    from aacjax.host import native
    from aacjax.runtime.batch import BatchDecoder
    if not native.available():
        pytest.skip("native parser not built")
    config, x, payloads = _tone_frames(
        freqs=(500.0, 9000.0), ch=2,
        drc=drc_payload([-18.0, 2.0], band_tops=[128, 1024]))

    bp = BatchDecoder([config], chunk_frames=len(payloads),
                      use_native=False, drc_scale=0.7)
    want = bp.step([bp.parse_stream_frames(0, payloads)])
    bn = BatchDecoder([config], chunk_frames=len(payloads),
                      use_native=True, drc_scale=0.7)
    assert bn.use_native
    got = bn.step_raw([payloads], compact=False)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=2e-6 * scale)
    # and the gain really engaged (differs from the undistorted decode)
    b0 = BatchDecoder([config], chunk_frames=len(payloads),
                      use_native=True)
    flat = b0.step_raw([payloads], compact=False)
    assert float(np.abs(got - flat).max()) > 1e-3
