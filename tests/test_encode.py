"""Production encoder (aacjax/encode.py): psychoacoustics, rate control,
window switching, M/S.  The reference is decode-only; correctness here is
established by (a) our own battle-tested decoder as the roundtrip oracle,
(b) libavcodec decoding the streams bit-compatibly, (c) rate accuracy."""
import numpy as np
import pytest

from aacjax import decode_adts, decode_m4a
from aacjax.encode import (AACEncoder, detect_transients, encode_adts,
                           encode_m4a, spectral_bits,
                           window_sequence_plan)
from aacjax.host import adts
from aacjax.host.asc import parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.syntax import decode_frame
from aacjax.testing import ffmpeg_oracle

HAVE_ORACLE = ffmpeg_oracle.available()
SR = 44100


def _music(seconds=2.0, ch=2, seed=0):
    """Tonal content + low-level noise: the realistic easy-ish case."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds))[:, None] / SR
    freqs = np.array([[523.25, 659.26][:ch]])
    x = 9000 * np.sin(2 * np.pi * freqs * t)
    x += 2000 * np.sin(2 * np.pi * 2.5 * freqs * t + 0.3)
    x += 150 * rng.standard_normal(x.shape)
    return x


def _roundtrip_snr(x, stream):
    out, rate = decode_adts(stream)
    d = out[1024:1024 + len(x)] * 32768
    n = len(d)
    err = d - x[:n]
    return 10 * np.log10(np.sum(x[:n] ** 2) / np.sum(err ** 2))


def test_bitrate_accuracy():
    """Noisy content saturates the budget: actual rate within 12%."""
    rng = np.random.default_rng(1)
    x = 3000 * rng.standard_normal((SR, 2))
    for target in (96_000, 192_000):
        stream = AACEncoder(SR, 2, target).encode(x)
        actual = len(stream) * 8 / (len(x) / SR)
        assert abs(actual - target) / target < 0.12, (target, actual)


def test_quality_scales_with_bitrate():
    x = _music(seconds=1.2)
    snrs = []
    for br in (48_000, 128_000, 320_000):
        stream = AACEncoder(SR, 2, br).encode(x)
        snrs.append(_roundtrip_snr(x, stream))
    assert snrs[0] > 15, snrs
    assert snrs[-1] > 28, snrs
    assert snrs[0] < snrs[1] < snrs[2] + 1e-9, snrs


def test_mono_and_other_rates():
    for sr, br in ((22050, 48_000), (48000, 96_000)):
        t = np.arange(sr)[:, None] / sr
        x = 8000 * np.sin(2 * np.pi * 440 * t) + \
            100 * np.random.default_rng(2).standard_normal((sr, 1))
        enc = AACEncoder(sr, 1, br)
        stream = enc.encode(x)
        out, rate = decode_adts(stream)
        assert rate == sr
        d = out[1024:1024 + len(x)] * 32768
        n = len(d)
        snr = 10 * np.log10(np.sum(x[:n] ** 2)
                            / np.sum((d - x[:n]) ** 2))
        assert snr > 15, (sr, br, snr)


def test_window_switching_on_transients():
    """Clicks force the LONG_START -> EIGHT_SHORT -> LONG_STOP chain and
    the stream stays decodable and aligned."""
    x = _music(seconds=2.0)
    for k in range(3):
        x[SR // 2 * k + 8000: SR // 2 * k + 8200] *= 8.0
    stream = AACEncoder(SR, 2, 128_000).encode(x)
    frames = adts.split_frames(stream)
    cfg = parse_asc(adts.synthesize_cookie(frames[0][0]))
    seqs = set()
    shapes = [0, 0]
    for h, s, e in frames:
        fr = decode_frame(BitReader(stream[s:e]), cfg, shapes)
        seqs.add(fr.elements[0].left.info.window_sequence)
    assert seqs == {0, 1, 2, 3}, seqs
    assert _roundtrip_snr(x, stream) > 10


def test_window_plan_legality():
    """Every generated plan obeys the transition rules for random flags."""
    rng = np.random.default_rng(3)
    for _ in range(50):
        flags = (rng.random(24) < 0.3).astype(np.int64)
        tr = np.stack([flags, rng.integers(0, 8, 24)], axis=1)
        seq = window_sequence_plan(tr)
        for f in range(1, len(seq)):
            if seq[f - 1] in (1, 2):      # START/SHORT exit short
                assert seq[f] in (2, 3), (f, seq)
            else:                          # ONLY_LONG/STOP exit long
                assert seq[f] in (0, 1), (f, seq)
        assert all(seq[f] == 2 for f in np.nonzero(flags)[0])


def test_ms_engages_on_correlated_content():
    rng = np.random.default_rng(4)
    t = np.arange(SR)[:, None] / SR
    mono = 8000 * np.sin(2 * np.pi * 523 * t) \
        + 200 * rng.standard_normal((SR, 1))
    x = np.concatenate([mono, mono * 0.95], axis=1)  # highly correlated
    stream = AACEncoder(SR, 2, 128_000).encode(x)
    frames = adts.split_frames(stream)
    cfg = parse_asc(adts.synthesize_cookie(frames[0][0]))
    shapes = [0, 0]
    ms_bands = 0
    for h, s, e in frames[2:10]:
        fr = decode_frame(BitReader(stream[s:e]), cfg, shapes)
        cpe = fr.elements[0]
        ms_bands += int(np.count_nonzero(cpe.ms_used))
    assert ms_bands > 0
    assert _roundtrip_snr(x, stream) > 20


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec not available")
def test_streams_decode_identically_in_ffmpeg():
    """Conformance: libavcodec's decode of our encoder's output matches
    our decoder (covers section data, scalefactors, all window
    sequences, grouping, M/S, TNS, intensity, book selection incl.
    escapes).  PNS is off here: decoders synthesize different random
    noise by design (tests/test_encode_tools.py checks PNS by band
    energy instead)."""
    x = _music(seconds=1.5)
    x[10000:10200] *= 6.0   # force short windows too
    stream = AACEncoder(SR, 2, 160_000, pns=False).encode(x)
    ours, rate = decode_adts(stream)
    ref, ref_rate = ffmpeg_oracle.decode_adts(stream)
    assert rate == ref_rate
    n = min(len(ours), len(ref))
    assert np.max(np.abs(ours[:n] - ref[:n])) < 1e-4


def test_encode_adts_one_call():
    x = _music(seconds=0.5, ch=1).reshape(-1)
    stream = encode_adts(x, SR, 96_000)
    out, rate = decode_adts(stream)
    assert rate == SR and out.shape[1] == 1


def test_encode_m4a_gapless():
    """encode_m4a embeds elst priming/duration: decode_m4a returns PCM
    sample-aligned with the input (no delay, no padding)."""
    x = _music(seconds=1.0)
    data = encode_m4a(x, SR, 128_000)
    out, rate = decode_m4a(data)
    assert rate == SR
    assert out.shape[0] == len(x)
    d = out * 32768
    snr = 10 * np.log10(np.sum(x ** 2) / np.sum((d - x) ** 2))
    assert snr > 15, snr


def test_spectral_bits_matches_writer():
    """The vectorized cost function equals the actual written bits for
    every book (incl. sign bits and book-11 escapes)."""
    from aacjax.host import huffman
    rng = np.random.default_rng(5)
    for book in range(1, 12):
        n = 4 if book in huffman.QUAD_BOOKS else 2
        lav = {1: 1, 2: 1, 3: 2, 4: 2, 5: 4, 6: 4, 7: 7, 8: 7,
               9: 12, 10: 12, 11: 400}[book]
        q = rng.integers(-lav, lav + 1, size=32 * n)
        w = BitWriter()
        for i in range(0, len(q), n):
            huffman.encode_spectral(w, book, [int(v) for v in q[i:i + n]])
        assert spectral_bits(q, book) == w.bit_position, book


def test_detect_transients():
    rng = np.random.default_rng(6)
    x = 100 * rng.standard_normal((1024 * 8, 1))
    x[1024 * 3 + 640: 1024 * 3 + 800] += 9000.0
    tr = detect_transients(x, 1024)
    assert tr[3, 0] == 1
    assert tr[3, 1] == 5     # attack sub-block 640/128
    assert tr[:3, 0].sum() == 0


@pytest.mark.parametrize("profile,frame_length", [(23, 512), (23, 480),
                                                  (2, 960), (17, 1024)])
def test_encode_ld_er_960_profiles(profile, frame_length):
    """The production encoder covers low-delay AAC-LD (AOT 23, 512/480),
    960-frame LC and ER AAC-LC — decoded by our pipeline and (where
    libavcodec is itself correct) sample-identical there too."""
    from aacjax import decode_loas
    from aacjax.testing import ffmpeg_oracle
    from scipy import signal as sig

    n = 512 * 30
    t = np.arange(n) / SR
    rng = np.random.default_rng(5)
    x = (8000 * np.sin(2 * np.pi * 440 * t)
         + 2000 * np.sin(2 * np.pi * 2000 * t)
         + sig.lfilter(*sig.butter(4, 5000 / (SR / 2)),
                       rng.standard_normal(n)) * 600)
    pcm = np.stack([x, 0.8 * x], axis=1)
    enc = AACEncoder(SR, 2, 96_000, profile=profile,
                     frame_length=frame_length, pns=False)
    with pytest.raises(ValueError):
        enc.encode(pcm)  # no ADTS representation
    loas = enc.encode_loas(pcm)
    out, rate = decode_loas(loas, on_error="raise")
    assert rate == SR
    d = out[frame_length:] * 32768
    m = min(len(d), len(pcm))
    snr = 10 * np.log10((pcm[:m] ** 2).sum()
                        / max(((d[:m] - pcm[:m]) ** 2).sum(), 1e-9))
    assert snr > 18, snr
    # libavcodec cross-check (LD-480 excluded: libavcodec zero-pads 480
    # frames through its 512 IMDCT — see tests/test_ld.py)
    if ffmpeg_oracle.available() and (profile, frame_length) != (23, 480):
        ref, _ = ffmpeg_oracle.decode_loas(loas)
        mm = min(len(ref), len(out))
        peak = max(float(np.abs(ref[:mm]).max()), 1e-9)
        assert float(np.abs(ref[:mm] - out[:mm]).max()) / peak < 2e-4


@pytest.mark.parametrize("frame_length", [512, 480])
def test_encode_eld(frame_length):
    """AAC-ELD encoding (AOT 39): the exact FIR dual of the decoder's
    biorthogonal low-delay bank (polyphase inversion, 210 dB roundtrip,
    5 frames history / zero lookahead) + ELD syntax.  One-frame system
    delay; sample-identical decode in libavcodec."""
    from aacjax import decode_loas
    from aacjax.host.asc import make_asc
    from aacjax.testing import ffmpeg_oracle
    from scipy import signal as sig

    n = 512 * 30
    t = np.arange(n) / SR
    rng = np.random.default_rng(5)
    x = (8000 * np.sin(2 * np.pi * 440 * t)
         + 2000 * np.sin(2 * np.pi * 2000 * t)
         + sig.lfilter(*sig.butter(4, 5000 / (SR / 2)),
                       rng.standard_normal(n)) * 600)
    pcm = np.stack([x, 0.8 * x], axis=1)
    enc = AACEncoder(SR, 2, 96_000, profile=39, frame_length=frame_length)
    payloads = enc.encode_frames(pcm)
    from aacjax.testing.encoder import loas_stream
    loas = loas_stream(payloads, enc.config)
    out, rate = decode_loas(loas, on_error="raise")
    assert rate == SR
    # one-frame system delay (the dual's u^1 term)
    d = out[frame_length:] * 32768
    m = min(len(d), len(pcm))
    snr = 10 * np.log10((pcm[:m] ** 2).sum()
                        / max(((d[:m] - pcm[:m]) ** 2).sum(), 1e-9))
    assert snr > 18, snr
    if ffmpeg_oracle.available():
        ref, _ = ffmpeg_oracle.decode_raw(
            make_asc(39, 4, 2, frame_length=frame_length), payloads)
        mm = min(len(ref), len(out))
        peak = max(float(np.abs(ref[:mm]).max()), 1e-9)
        assert float(np.abs(ref[:mm] - out[:mm]).max()) / peak < 2e-4


def test_eld_dual_is_exact():
    """The polyphase-inverted analysis operator reconstructs through the
    decoder's synthesis operator at >180 dB (true biorthogonal dual —
    the naive transposed bank only manages ~ -6 dB)."""
    from aacjax.encode import _eld_analysis_matrix_cached
    from aacjax import tables
    N = 512
    A = _eld_analysis_matrix_cached(N)
    assert A.shape == (6 * N, N)
    M = tables.eld_synthesis_matrix(N)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(N * 24).reshape(-1, N)
    T = len(x)
    pad = np.concatenate([np.zeros((5, N)), x])
    spec = np.stack([pad[t:t + 6].reshape(-1) @ A for t in range(T)])
    o = np.zeros((T + 4, N))
    for t in range(T):
        y = spec[t] @ M
        for j in range(4):
            o[t + j] += y[j * N:(j + 1) * N]
    err = den = 0.0
    for s in range(8, T - 2):
        err += ((o[s] - x[s - 1]) ** 2).sum()
        den += (x[s - 1] ** 2).sum()
    assert -10 * np.log10(err / den) > 180


@pytest.mark.parametrize("kind", ["silence", "dc", "clip", "impulse",
                                  "nyquist"])
def test_encoder_survives_extreme_inputs(kind):
    """Degenerate PCM (silence, DC, full-scale clipping, impulse trains,
    Nyquist tones) must encode to decodable, finite streams in every
    profile family."""
    n = 1024 * 6
    t = np.arange(n)
    x = {
        "silence": np.zeros(n),
        "dc": np.full(n, 20000.0),
        "clip": np.where((t // 64) % 2 == 0, 32767.0, -32768.0),
        "impulse": np.where(t % 997 == 0, 32767.0, 0.0),
        "nyquist": 30000.0 * np.cos(np.pi * t),
    }[kind]
    pcm = np.stack([x, -x], axis=1)
    stream = AACEncoder(SR, 2, 64_000).encode(pcm)
    out, _ = decode_adts(stream, on_error="raise")
    assert np.isfinite(out).all()
    from aacjax import decode_loas
    enc = AACEncoder(SR, 2, 64_000, profile=39)
    out2, _ = decode_loas(enc.encode_loas(pcm), on_error="raise")
    assert np.isfinite(out2).all()
    from aacjax.encode_he import HEAACEncoder
    out3, _ = decode_adts(HEAACEncoder(SR, 2, 40_000).encode(pcm),
                          on_error="raise")
    assert np.isfinite(out3).all()
