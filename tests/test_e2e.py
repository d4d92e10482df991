"""End-to-end tests: PCM -> encoder -> ADTS -> full decode -> PCM.

These anchor the whole stack to actual audio: a systematic error anywhere
(bit layout, Huffman, scalefactor tracks, IMDCT scale/sign, windowing,
overlap-add) destroys reconstruction SNR.
"""
import numpy as np
import pytest

from aacjax.api import AACDecoder, decode_adts, probe
from aacjax.host.asc import make_asc, parse_asc
from aacjax.testing.encoder import encode_pcm

SR = 44100
FRAME = 1024


def make_signal(n, channels, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = (8000 * np.sin(2 * np.pi * 440 * t)
         + 3000 * np.sin(2 * np.pi * 1850 * t)
         + 400 * rng.standard_normal(n))
    if channels == 1:
        return x[:, None]
    return np.stack([x, np.roll(x, 100) * 0.8], axis=1)


def snr_db(ref, err):
    return 10 * np.log10(np.sum(ref ** 2) / np.sum(err ** 2))


@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_snr(channels):
    n = FRAME * 10
    pcm = make_signal(n, channels)
    cfg = parse_asc(make_asc(2, 4, channels))
    data = encode_pcm(pcm, cfg, target_sf=120)
    assert probe(data)
    out, rate = decode_adts(data)
    assert rate == SR
    assert out.shape[1] == channels
    dec = out[FRAME:FRAME + n] * 32768.0   # undo 1024-sample encoder delay
    lo, hi = 2048, n - 2048
    err = dec[lo:hi] - pcm[lo:hi]
    assert snr_db(pcm[lo:hi], err) > 60.0


def test_streaming_api_matches_batch():
    """AACDecoder.read_chunk frame-by-frame == decode_adts batched."""
    n = FRAME * 6
    pcm = make_signal(n, 2, seed=3)
    cfg = parse_asc(make_asc(2, 4, 2))
    data = encode_pcm(pcm, cfg, target_sf=130)

    batch_out, _ = decode_adts(data)

    dec = AACDecoder()
    dec.feed(data)
    chunks = []
    while True:
        chunk = dec.read_chunk()
        if chunk is None:
            break
        chunks.append(chunk.reshape(-1, 2))
    stream_out = np.concatenate(chunks, axis=0)
    assert stream_out.shape == batch_out.shape
    scale = max(1.0, float(np.abs(batch_out).max()))
    np.testing.assert_allclose(stream_out, batch_out, atol=1e-6 * scale)


def test_reference_api_aliases():
    dec = AACDecoder()
    assert hasattr(dec, "setCookie") and hasattr(dec, "readChunk")
    assert dec.floating_point  # format.floatingPoint = true (decoder.js:50)
    dec.setCookie(make_asc(2, 4, 1))
    assert dec.config.sample_rate == 44100


def test_decode_adts_output_scale():
    """Output is interleaved float in the reference's 1/32768 scale
    (decoder.js:204-215)."""
    n = FRAME * 4
    pcm = make_signal(n, 1)
    cfg = parse_asc(make_asc(2, 4, 1))
    out, _ = decode_adts(encode_pcm(pcm, cfg, target_sf=120))
    peak = np.abs(out).max()
    assert 0.05 < peak < 1.0  # ~11000/32768 signal
