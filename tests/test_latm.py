"""LOAS/LATM transport demux (aacjax/host/latm.py) — a transport the
reference has no demuxer for (it ships ADTS only, adts_demuxer.js).
Oracle: libavcodec's LATM decoder on the same self-generated streams."""
import numpy as np
import pytest

from aacjax import decode_adts, decode_loas, probe_loas
from aacjax.host import adts, latm
from aacjax.host.asc import make_asc, parse_asc
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_cpe_spec
from aacjax.host.bitio import BitWriter

HAVE_ORACLE = ffmpeg_oracle.available()


def _payloads(n=6, seed=3, config=None):
    config = config or parse_asc(make_asc(2, 4, 2))
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config, common=True), config)
        out.append(enc.end_frame(w))
    return config, out


def test_probe_loas():
    config, payloads = _payloads()
    stream = enc.loas_stream(payloads, config)
    assert probe_loas(stream)
    assert not probe_loas(b"\xff\xf1" + stream[2:])   # ADTS-ish
    assert not probe_loas(b"garbage bytes here")
    # (adts.probe may false-positive on arbitrary binary payloads that
    # contain 0xFFF patterns — sniff LOAS first when dispatching)


def test_loas_demux_roundtrip():
    """Demuxed payloads are byte-identical to what went in, across
    subframe packing, mux re-send, and both frameLengthTypes."""
    config, payloads = _payloads(n=8)
    for kw in (dict(), dict(subframes=2), dict(subframes=4),
               dict(mux_period=2)):
        stream = enc.loas_stream(payloads, config, **kw)
        mux, got = latm.split_loas(stream)
        assert got == payloads, kw
        assert mux.config.sample_rate == config.sample_rate
        assert mux.config.chan_config == config.chan_config
    # fixed-length framing (frameLengthType 1): 9-bit frameLength caps
    # payloads at 531 bytes, so use small equal-size payloads
    small = [p[:64].ljust(64, b"\x00") for p in payloads]
    stream = enc.loas_stream(small, config, flt=1)
    mux, got = latm.split_loas(stream)
    assert mux.frame_length_type == 1
    assert got == small


def test_decode_loas_matches_adts_path():
    """decode_loas routes ADTS-expressible configs through the exact
    decode_adts pipeline: outputs are bit-identical."""
    config, payloads = _payloads()
    loas = enc.loas_stream(payloads, config, subframes=2)
    adts_stream = b"".join(adts.wrap_frame(p, config) for p in payloads)
    a, ra = decode_loas(loas)
    b, rb = decode_adts(adts_stream)
    assert ra == rb
    np.testing.assert_array_equal(a, b)


def _pcm_payloads(n=6):
    """Realistic PNS-free content (PNS noise is decoder-specific, so
    FFmpeg comparisons exclude it, as in the ADTS conformance tests)."""
    config = parse_asc(make_asc(2, 4, 2))
    rng = np.random.default_rng(1)
    t = np.arange(1024 * n)[:, None] / 44100.0
    x = 8000 * np.sin(2 * np.pi * np.array([[440.0, 660.0]]) * t)
    x += 300 * rng.standard_normal(x.shape)
    return config, enc.encode_pcm_frames(x, config, target_sf=120)[:n]


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_decode_loas_matches_ffmpeg():
    config, payloads = _pcm_payloads()
    stream = enc.loas_stream(payloads, config)
    want, wrate = ffmpeg_oracle.decode_loas(stream)
    got, grate = decode_loas(stream)
    assert wrate == grate == config.sample_rate
    nn = min(len(want), len(got))
    assert nn >= 5 * 1024
    a = want[1024:nn].astype(np.float64)
    b = got[1024:nn].astype(np.float64)
    snr = 10 * np.log10(np.sum(a ** 2) / max(np.sum((a - b) ** 2), 1e-30))
    assert snr > 90.0, snr


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("explicit", [False, True])
def test_decode_loas_he_aac(explicit):
    """HE-AAC over LOAS, both implicitly signaled (SBR in the payload
    FILs) and explicitly (hierarchical AOT-5 ASC in the StreamMuxConfig,
    the broadcast norm).  FFmpeg dual-monos the mono HE stream, so the
    comparison is per-channel."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_sbr import make_he_stream
    adts_stream = make_he_stream(ch=1, n_frames=5)
    frames = adts.split_frames(adts_stream)
    payloads = [adts_stream[s:e] for _, s, e in frames]
    config = parse_asc(make_asc(2, 7, 1, sbr=explicit))
    stream = enc.loas_stream(payloads, config)
    want, wrate = ffmpeg_oracle.decode_loas(stream)
    got, grate = decode_loas(stream)
    assert wrate == grate == 44100
    nn = min(len(want), len(got))
    a = want[4096:nn - 64, 0].astype(np.float64)
    b = got[4096:nn - 64, 0].astype(np.float64)
    snr = 10 * np.log10(np.sum(a ** 2) / max(np.sum((a - b) ** 2), 1e-30))
    assert snr > 60.0, (explicit, snr)


def test_decode_loas_960_streaming_path():
    """A 960-frame config is not ADTS-expressible: decode_loas seeds the
    streaming decoder with the embedded ASC instead."""
    config = parse_asc(make_asc(2, 4, 2, frame_length=960))
    rng = np.random.default_rng(5)
    payloads = []
    for _ in range(4):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config, common=True), config)
        payloads.append(enc.end_frame(w))
    stream = enc.loas_stream(payloads, config)
    pcm, rate = decode_loas(stream)
    assert rate == config.sample_rate
    assert pcm.shape == (4 * 960, 2)
    assert np.isfinite(pcm).all()


def test_loas_corruption_resync():
    """on_error='skip' resynchronizes to the next 0x2B7 after a corrupt
    mux element; on_error='raise' raises."""
    from aacjax.host.bitio import BitstreamError
    config, payloads = _payloads(n=8)
    stream = bytearray(enc.loas_stream(payloads, config))
    stream[len(stream) // 2] ^= 0xFF
    mux, got = latm.split_loas(bytes(stream), on_error="skip")
    assert 0 < len(got) <= len(payloads)
    pcm, _ = decode_loas(bytes(stream), on_error="skip")
    assert np.isfinite(pcm).all()


def test_streaming_decoder_feeds_loas():
    """AACDecoder.feed auto-detects LOAS and demuxes incrementally:
    byte-dribbled feeding produces the same PCM as decode_loas."""
    from aacjax import AACDecoder
    config, payloads = _payloads(n=6)
    stream = enc.loas_stream(payloads, config, subframes=2)
    want, _ = decode_loas(stream)

    dec = AACDecoder()
    out = []
    step = 777    # deliberately misaligned with frame boundaries
    for lo in range(0, len(stream), step):
        dec.feed(stream[lo:lo + step])
        while True:
            c = dec.read_chunk()
            if c is None:
                break
            out.append(c.reshape(-1, dec.output_channels))
    got = np.concatenate(out)
    assert got.shape == want.shape
    # streaming path uses the same pipeline modulo chunking; f32 only
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())
