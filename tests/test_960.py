"""960-sample frame mode (frameLengthFlag=1) — a capability beyond the
reference, which rejects the mode outright (decoder.js:83-84).

SWB tables are spec constants extracted from libavcodec
(tools/extract_ffmpeg_tables.py); the FFmpeg oracle test below validates
the whole 960 pipeline against libavcodec's independent decoder, which
exercises exactly those tables from the other side.
"""
import numpy as np
import pytest

from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitWriter
from aacjax.runtime.batch import BatchDecoder
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec
from model_decoder import ModelDecoder


def _cfg960(si=4, ch=2):
    cfg = parse_asc(make_asc(2, si, ch, frame_length=960))
    assert cfg.frame_length == 960
    return cfg


def run_both(config, payloads, n_channels):
    dec = BatchDecoder([config], chunk_frames=len(payloads))
    frames = dec.parse_stream_frames(0, payloads)
    pcm = dec.step([frames])
    got = dec.stream_pcm(pcm, 0, len(payloads))
    model = ModelDecoder(config, n_channels=n_channels)
    want = np.concatenate([model.decode_frame(f) for f in frames], axis=0)
    if dec.use_native:
        # the native parser handles 960 too: hold its spectral output to
        # the python packer's result on the same payloads
        nat = BatchDecoder([config], chunk_frames=len(payloads))
        got_nat = nat.stream_pcm(nat.step_raw([payloads]), 0, len(payloads))
        assert_close(got_nat, want)
    return got, want


def assert_close(got, want, rtol=2e-5):
    scale = max(1.0, float(np.max(np.abs(want))))
    assert float(np.max(np.abs(got - want))) <= rtol * scale


@pytest.mark.parametrize("seed", range(4))
def test_960_mono_window_switching(seed):
    """All four window sequences at 960 (120-sample short windows)."""
    rng = np.random.default_rng(7000 + seed)
    config = _cfg960(si=int(rng.integers(0, 12)), ch=1)
    payloads = []
    for s in [0, 1, 2, 3, 2, 0]:
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(
            rng, config, window_sequence=s, allow_noise=False,
            allow_pulse=False, allow_tns=False), config)
        payloads.append(enc.end_frame(w))
    got, want = run_both(config, payloads, 1)
    assert_close(got, want)


@pytest.mark.parametrize("seed", range(3))
def test_960_stereo_tns(seed):
    rng = np.random.default_rng(7100 + seed)
    config = _cfg960(si=int(rng.integers(0, 12)), ch=2)
    payloads = []
    for _ in range(3):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    got, want = run_both(config, payloads, 2)
    assert_close(got, want)


def test_960_roundtrip_snr():
    """encode_pcm_frames(960) -> decode: the perfect-reconstruction OLA
    pair holds at N=1920 too (matrices come from the same closed form)."""
    config = _cfg960(si=4, ch=2)
    t = np.arange(960 * 8) / 44100
    x = 9000 * np.sin(2 * np.pi * 523 * t)
    pcm = np.stack([x, 0.8 * x], axis=1)
    payloads = enc.encode_pcm_frames(pcm, config, target_sf=120)

    dec = BatchDecoder([config], chunk_frames=len(payloads))
    frames = dec.parse_stream_frames(0, payloads)
    out = dec.stream_pcm(dec.step([frames]), 0, len(payloads)) * 32768.0
    got = out[960:960 * 9]  # one-frame encoder delay
    err = got - pcm
    snr = 10 * np.log10(float(np.sum(pcm ** 2)) / float(np.sum(err ** 2)))
    assert snr > 60, snr


def test_960_streaming_decoder():
    """AACDecoder consumes a raw 960 stream via its ASC cookie and emits
    960-sample chunks."""
    from aacjax.api import AACDecoder
    config = _cfg960(si=4, ch=1)
    t = np.arange(960 * 4) / 44100
    pcm = 8000 * np.sin(2 * np.pi * 700 * t)[:, None]
    payloads = enc.encode_pcm_frames(pcm, config, target_sf=120)

    dec = AACDecoder(cookie=make_asc(2, 4, 1, frame_length=960))
    dec.feed(b"".join(payloads))
    chunks = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        chunks.append(c)
    assert all(c.shape == (960,) for c in chunks)
    assert len(chunks) == len(payloads)


@pytest.mark.skipif(not ffmpeg_oracle.available(),
                    reason="libavcodec oracle not built")
def test_960_vs_ffmpeg_oracle():
    """Independent-decoder conformance at 960: libavcodec decodes our
    960-frame stream through its own spec tables; matching PCM validates
    the extracted SWB tables and the whole 960 pipeline."""
    config = _cfg960(si=4, ch=2)
    t = np.arange(960 * 10) / 44100
    rng = np.random.default_rng(5)
    x = (9000 * np.sin(2 * np.pi * 440 * t)
         + 1500 * rng.standard_normal(t.size))
    pcm = np.stack([x, np.roll(x, 31) * 0.7], axis=1)
    payloads = enc.encode_pcm_frames(pcm, config, target_sf=124)

    want, rate = ffmpeg_oracle.decode_raw(
        make_asc(2, 4, 2, frame_length=960), payloads)
    assert rate == 44100 and want.shape[1] == 2

    dec = BatchDecoder([config], chunk_frames=len(payloads))
    frames = dec.parse_stream_frames(0, payloads)
    got = dec.stream_pcm(dec.step([frames]), 0, len(payloads))
    n = min(len(got), len(want))
    err = float(np.max(np.abs(got[:n] - want[:n])))
    assert err < 1e-4, err  # north-star tolerance vs an independent decoder
