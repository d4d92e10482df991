"""AAC Main profile (AOT 1) backward-adaptive prediction — a capability
the reference lacks (decoder.js accepts the profile but ics.js throws on
the predictor bit; SURVEY.md rejected-features list).

The predictor is a per-bin second-order lattice with float16-truncated
state (ISO/IEC 14496-3 §4.6.2); it runs as a stateful device stage
between M/S and intensity (kernels/pipeline.apply_prediction).  The
oracle is libavcodec decoding the same self-generated Main-profile
streams: output matches sample-exactly (~127 dB, the float32 floor)
through multi-frame prediction feedback, reset groups, and short-window
resets — possible only because every path dequantizes with the same
float64-rounded |q|^(4/3) and the predictor uses strict (non-FMA) f32
multiplies.

Known deliberate divergence: libavcodec's `prediction_used[]` persists
across frames in its ics struct, so when max_sfb SHRINKS mid-stream the
stale bits keep predicting into bins that no longer carry bits.  aacjax
implements the spec behavior (no bits -> no prediction), so tests keep
max_sfb constant, as real Main encoders do.
"""
import numpy as np
import pytest

from aacjax.api import decode_adts
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.syntax import decode_frame
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec

HAVE_ORACLE = ffmpeg_oracle.available()

CFG = parse_asc(make_asc(1, 4, 1))        # Main profile, 44.1 kHz, mono
CFG2 = parse_asc(make_asc(1, 4, 2))


def _sce_stream(n_frames=8, seed=5, max_sfb=45, reset_frames=(),
                short_frames=(), used_fn=None):
    rng = np.random.default_rng(seed)
    payloads = []
    for f in range(n_frames):
        short = f in short_frames
        # spec-legal window transitions (FFmpeg windows illegal ones
        # differently): LONG_START before a short run, LONG_STOP after
        if short:
            seq = 2
        elif f + 1 in short_frames:
            seq = 1
        elif f - 1 in short_frames:
            seq = 3
        else:
            seq = 0
        spec = random_channel_spec(
            rng, CFG, window_sequence=seq,
            allow_tns=False, allow_noise=False, allow_pulse=False,
            **({} if short else dict(max_sfb=max_sfb)))
        if not short:
            n = min(spec.max_sfb, CFG.pred_sfb_max)
            u = rng.integers(0, 2, n) > 0
            spec.pred_used = used_fn(f, u) if used_fn else u
            spec.pred_reset_group = (f % 30) + 1 if f in reset_frames else 0
        w = BitWriter()
        enc.write_sce(w, spec, CFG, instance=0)
        payloads.append(enc.end_frame(w))
    return b"".join(enc.adts_frame(p, CFG) for p in payloads)


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return 10 * np.log10(float(np.sum(a ** 2))
                         / max(float(np.sum((a - b) ** 2)), 1e-30))


def _check(stream, skip_frames=(), chunk_frames=64):
    want, rate = ffmpeg_oracle.decode_adts(stream)
    got, grate = decode_adts(stream, chunk_frames=chunk_frames)
    assert rate == grate
    nn = min(len(want), len(got))
    for f in range(nn // 1024):
        if f in skip_frames:
            continue
        sl = slice(f * 1024, (f + 1) * 1024)
        snr = _snr(want[sl, 0], got[sl, 0])
        assert snr > 90.0, (f, snr)   # observed ~127 dB (f32 floor)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_main_prediction_matches_ffmpeg_sample_exact():
    """Multi-frame prediction feedback: every frame at the f32 floor."""
    _check(_sce_stream())


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_main_prediction_reset_groups():
    """predictor_reset groups cycle bins k = g-1 (mod 30)."""
    _check(_sce_stream(reset_frames=(2, 4, 6)))


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_main_prediction_short_window_resets():
    """EIGHT_SHORT frames reset every predictor state."""
    _check(_sce_stream(n_frames=9, short_frames=(3, 4)))


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_main_prediction_stereo_ms():
    """CPE with common window + M/S: the predictor operates on the
    post-M/S spectra, before intensity (libavcodec decode_cpe order)."""
    from aacjax.testing.encoder import CPESpec
    rng = np.random.default_rng(9)
    payloads = []
    for f in range(6):
        left = random_channel_spec(rng, CFG2, window_sequence=0,
                                   max_sfb=42, allow_noise=False,
                                   allow_pulse=False, allow_tns=False)
        right = random_channel_spec(rng, CFG2, window_sequence=0,
                                    max_sfb=42, window_shape=left.window_shape,
                                    allow_noise=False, allow_pulse=False,
                                    allow_tns=False)
        n_idx = left.max_sfb
        cpe = CPESpec(left=left, right=right, common_window=True,
                      ms_type=1,
                      ms_used=rng.integers(0, 2, 128).astype(bool))
        n = min(42, CFG2.pred_sfb_max)
        for ch in (cpe.left, cpe.right):
            ch.pred_used = rng.integers(0, 2, n) > 0
        w = BitWriter()
        enc.write_cpe(w, cpe, CFG2, instance=0)
        payloads.append(enc.end_frame(w))
    stream = b"".join(enc.adts_frame(p, CFG2) for p in payloads)
    want, rate = ffmpeg_oracle.decode_adts(stream)
    got, grate = decode_adts(stream)
    assert rate == grate
    nn = min(len(want), len(got))
    for ch in range(2):
        snr = _snr(want[1024:nn, ch], got[1024:nn, ch])
        assert snr > 90.0, (ch, snr)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_main_prediction_chunk_boundary_carry():
    """The predictor state carries across device chunks: a 3-frame
    chunking stays at the float32 floor vs the oracle everywhere.
    (Bit equality ACROSS chunk sizes is not asserted — different T
    compiles different XLA programs whose rounding can differ by ULPs;
    the flt16 state quantization keeps that bounded.)"""
    _check(_sce_stream(n_frames=10), chunk_frames=3)


def test_main_prediction_parse_roundtrip():
    """Predictor side info survives the writer -> parser roundtrip."""
    rng = np.random.default_rng(1)
    spec = random_channel_spec(rng, CFG, window_sequence=0, max_sfb=40,
                               allow_tns=False, allow_noise=False,
                               allow_pulse=False)
    spec.pred_used = rng.integers(0, 2, 40) > 0
    spec.pred_reset_group = 17
    w = BitWriter()
    enc.write_sce(w, spec, CFG, instance=0)
    frame = decode_frame(BitReader(enc.end_frame(w)), CFG, [0])
    info = frame.elements[0].ics.info
    assert info.predictor_present
    assert info.predictor_reset_group == 17
    np.testing.assert_array_equal(info.prediction_used, spec.pred_used)
    assert info.pred_bins == int(CFG.swb_offsets_long[CFG.pred_sfb_max])


def test_ssr_still_rejected():
    """AOT 3 (SSR gain control) raises a clear error at config time —
    also unsupported by both the reference and libavcodec."""
    from aacjax.api import UnsupportedError
    with pytest.raises(UnsupportedError):
        parse_asc(make_asc(3, 4, 1))
