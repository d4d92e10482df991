"""Native bitstream writer (native/libaacwrite.so) equality vs the
Python path: same BatchEncoder device outputs written by both must be
byte-identical, and the streams must decode."""
import os

import numpy as np
import pytest

from aacjax.host import native_write

pytestmark = pytest.mark.skipif(not native_write.available(),
                                reason="libaacwrite.so not built")


def _content(S, n, seed, transient=False):
    sr = 44100
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    pcm = np.empty((S, n, 2), np.float32)
    for s in range(S):
        r = (7000 * np.sin(2 * np.pi * (260 + 90 * s) * t)
             + rng.uniform(300, 2500) * rng.standard_normal(n)
             ).astype(np.float32)
        if transient:
            at = (5000 + 1500 * s) % max(n - 256, 1)
            r[at:at + 256] += 22000 * np.sin(
                2 * np.pi * 3200 * t[:256]).astype(np.float32)
        pcm[s, :, 0] = r
        pcm[s, :, 1] = 0.75 * np.roll(r, 13 + s)
    return pcm


def _both(pcm, channels, bitrate):
    from aacjax.encode_batch import BatchEncoder
    S = pcm.shape[0]
    env = os.environ
    old = env.get("AACJAX_NATIVE_WRITE")
    try:
        env["AACJAX_NATIVE_WRITE"] = "0"
        py = BatchEncoder(44100, channels, bitrate,
                          n_streams=S).encode_chunk(pcm)
        env["AACJAX_NATIVE_WRITE"] = "1"
        enc = BatchEncoder(44100, channels, bitrate, n_streams=S)
        assert enc._native_write
        nat = enc.encode_chunk(pcm)
    finally:
        if old is None:
            env.pop("AACJAX_NATIVE_WRITE", None)
        else:
            env["AACJAX_NATIVE_WRITE"] = old
    return py, nat, enc


def test_native_write_matches_python_stereo_with_transients():
    pcm = _content(4, 1024 * 16, seed=3, transient=True)
    py, nat, enc = _both(pcm, 2, 96_000)
    n_short = 0
    for s in range(len(py)):
        assert len(py[s]) == len(nat[s])
        for f, (a, b) in enumerate(zip(py[s], nat[s])):
            assert a == b, f"stream {s} frame {f} differs"
    # the transient content must actually exercise EIGHT_SHORT frames
    assert (enc._prev_seq >= 0).all()


def test_native_write_matches_python_mono():
    pcm = _content(3, 1024 * 8, seed=5)[:, :, :1]
    py, nat, _ = _both(pcm, 1, 64_000)
    for s in range(len(py)):
        for a, b in zip(py[s], nat[s]):
            assert a == b


def test_native_write_fuzz_rates_and_content():
    rng = np.random.default_rng(11)
    for trial in range(3):
        S = int(rng.integers(1, 5))
        pcm = _content(S, 1024 * 8, seed=20 + trial,
                       transient=bool(trial % 2))
        pcm *= rng.uniform(0.05, 1.5)
        rate = int(rng.integers(32, 256)) * 1000
        py, nat, _ = _both(pcm, 2, rate)
        for s in range(S):
            for a, b in zip(py[s], nat[s]):
                assert a == b


def test_native_write_decodes():
    from aacjax import decode_adts
    from aacjax.encode_batch import BatchEncoder
    from aacjax.testing.encoder import adts_frame
    pcm = _content(2, 1024 * 12, seed=9, transient=True)
    enc = BatchEncoder(44100, 2, 128_000, n_streams=2)
    if not enc._native_write:
        pytest.skip("native writer unavailable")
    out = enc.encode_chunk(pcm)
    for s in range(2):
        stream = b"".join(adts_frame(p, enc.config) for p in out[s])
        dec, rate = decode_adts(stream)
        assert rate == 44100
        d = dec[1024:, :] * 32768.0
        ref = pcm[s, : d.shape[0]]
        snr = 10 * np.log10(np.mean(ref ** 2)
                            / np.mean((d - ref) ** 2))
        # broadband-noise content at 128k: noise is masking-shaped, so
        # plain SNR is modest — quality is covered by
        # tests/test_encode_batch.py; this asserts "decodes faithfully"
        assert snr > 8.0, snr
