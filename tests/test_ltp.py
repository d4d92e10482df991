"""AAC-LTP (AOT 4) long-term prediction — rejected by the reference
(ics.js throws on the predictor bit) and previously by aacjax.

Each frame's prediction reads the previous frames' TIME-domain output
(a 3-frame ltp_state incl. a windowed estimate of the current frame's
tail), windows it, forward-MDCTs it, TNS-analysis filters it, and adds
into the used sfbs.  That per-frame time feedback is inherently
sequential, so the profile decodes on the fp64 reference path
(aacjax.host.refdec); decode_adts / AACDecoder route it automatically.

Oracle: libavcodec decoding the same self-generated LTP streams —
sample-exact (~110-140 dB, f32/f64 floor).  The buf_mdct middle-half
convention (m[k] = x[512+k]) used by update_ltp was pinned numerically
against the model filterbank.
"""
import numpy as np
import pytest

from aacjax.api import AACDecoder, decode_adts
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.syntax import decode_frame
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_channel_spec

HAVE_ORACLE = ffmpeg_oracle.available()
CFG = parse_asc(make_asc(4, 4, 1))    # LTP profile, 44.1 kHz, mono
CFG2 = parse_asc(make_asc(4, 4, 2))


def _stream(n_frames=8, seed=5, short_frames=(), tns=False, lag_fn=None):
    rng = np.random.default_rng(seed)
    payloads = []
    for f in range(n_frames):
        short = f in short_frames
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
            allow_tns=False, force_tns=tns and not short,
            allow_noise=False, allow_pulse=False,
            **({} if short else dict(max_sfb=45)))
        if f >= 1 and not short:
            spec.ltp_lag = (lag_fn(f, rng) if lag_fn
                            else int(rng.integers(64, 2048)))
            spec.ltp_coef_idx = int(rng.integers(8))
            spec.ltp_used = rng.integers(0, 2, 40) > 0
        w = BitWriter()
        enc.write_sce(w, spec, CFG, instance=0)
        payloads.append(enc.end_frame(w))
    return b"".join(enc.adts_frame(p, CFG) for p in payloads)


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return 10 * np.log10(float(np.sum(a ** 2))
                         / max(float(np.sum((a - b) ** 2)), 1e-30))


def _check(stream, skip=()):
    want, rate = ffmpeg_oracle.decode_adts(stream)
    got, grate = decode_adts(stream)
    assert rate == grate
    nn = min(len(want), len(got))
    for f in range(nn // 1024):
        if f in skip:
            continue
        sl = slice(f * 1024, (f + 1) * 1024)
        for ch in range(want.shape[1]):
            snr = _snr(want[sl, ch], got[sl, ch])
            assert snr > 90.0, (f, ch, snr)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ltp_matches_ffmpeg_sample_exact():
    _check(_stream())


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ltp_extreme_lags():
    """lag edge cases: minimum useful, exactly one frame, maximum."""
    lags = {1: 1, 2: 1024, 3: 2047, 4: 2048 - 1, 5: 500, 6: 1500, 7: 2000}
    _check(_stream(lag_fn=lambda f, rng: lags[f]))


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ltp_short_window_interruption():
    """EIGHT_SHORT frames don't predict but still roll the time history
    (update_ltp), incl. the LONG_START/LONG_STOP saved_ltp shapes."""
    _check(_stream(n_frames=9, short_frames=(3, 4)))


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ltp_with_tns():
    """The predicted spectrum is TNS-ANALYSIS filtered (FIR, the inverse
    of the decoder's AR synthesis filter) before the add."""
    _check(_stream(tns=True))


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ltp_stereo_common_window():
    """CPE with common window: the shared ics_info carries channel 0's
    ltp_data; channel 1's ltp_data_present bit follows it."""
    from aacjax.testing.encoder import CPESpec
    rng = np.random.default_rng(11)
    payloads = []
    for f in range(6):
        chs = []
        for _ in range(2):
            s = random_channel_spec(rng, CFG2, window_sequence=0,
                                    max_sfb=42, allow_tns=False,
                                    allow_noise=False, allow_pulse=False)
            if f >= 1:
                s.ltp_lag = int(rng.integers(64, 2048))
                s.ltp_coef_idx = int(rng.integers(8))
                s.ltp_used = rng.integers(0, 2, 40) > 0
            chs.append(s)
        if f >= 1 and f % 2 == 0:
            chs[1].ltp_lag = None          # ch1 opts out some frames
        cpe = CPESpec(left=chs[0], right=chs[1], common_window=True,
                      ms_type=1, ms_used=rng.integers(0, 2, 128).astype(bool))
        w = BitWriter()
        enc.write_cpe(w, cpe, CFG2, instance=0)
        payloads.append(enc.end_frame(w))
    stream = b"".join(enc.adts_frame(p, CFG2) for p in payloads)
    _check(stream)


def test_ltp_streaming_decoder():
    """AACDecoder routes profile 4 to the reference path; output matches
    decode_adts."""
    stream = _stream(n_frames=5)
    want, _ = decode_adts(stream)
    dec = AACDecoder()
    dec.feed(stream)
    outs = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        outs.append(c.reshape(-1, 1))
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, want, atol=2e-7 * np.abs(want).max())


def test_ltp_parse_roundtrip():
    rng = np.random.default_rng(1)
    spec = random_channel_spec(rng, CFG, window_sequence=0, max_sfb=40,
                               allow_tns=False, allow_noise=False,
                               allow_pulse=False)
    spec.ltp_lag = 777
    spec.ltp_coef_idx = 5
    spec.ltp_used = rng.integers(0, 2, 40) > 0
    w = BitWriter()
    enc.write_sce(w, spec, CFG, instance=0)
    frame = decode_frame(BitReader(enc.end_frame(w)), CFG, [0])
    ltp = frame.elements[0].ics.info.ltp
    assert ltp is not None and ltp.lag == 777 and ltp.coef_idx == 5
    np.testing.assert_array_equal(ltp.used, spec.ltp_used)


def test_ltp_native_fast_path_bit_identical():
    """The native LTP fast path (C parse + vectorized frame-serial math,
    refdec.decode_ltp_native) engages on plain content and its output is
    BIT-identical to the per-frame python ModelDecoder loop — the
    exact-i16 q/sf representation makes the fp64 dequant equal to the
    python parse, and both paths share the ModelDecoder math."""
    from aacjax.host import adts, native
    from aacjax.host.refdec import ModelDecoder, decode_ltp_native

    if not native.available():
        pytest.skip("native parser not built")
    stream = _stream(n_frames=12, tns=True)
    frames = adts.split_frames(stream)
    payloads = [stream[s:e] for _, s, e in frames]

    fast = decode_ltp_native(payloads, CFG, chunk_frames=5)  # odd chunking
    assert fast is not None, "fast path must engage on plain LTP content"

    dec = ModelDecoder(CFG)
    prev = [0] * CFG.channels
    outs = []
    for p in payloads:
        f = decode_frame(BitReader(p), CFG, prev)
        ch = 0
        for el in f.elements:
            infos = ([el.ics.info] if hasattr(el, "ics")
                     else [el.left.info, el.right.info])
            for info in infos:
                prev[ch] = info.window_shape
                ch += 1
        outs.append(dec.decode_frame(f).astype(np.float32))
    want = np.concatenate(outs, axis=0)
    np.testing.assert_array_equal(fast, want)


def test_ltp_native_fast_path_stereo_ms():
    """Stereo common-window M/S content cannot ride the exact-i16
    representation (M/S mixes dequantized values); the fast path falls
    back to the host-fused f32 spectra and stays within f32 rounding of
    the fp64 python loop."""
    from aacjax.host import adts, native
    from aacjax.host.refdec import decode_ltp_native

    if not native.available():
        pytest.skip("native parser not built")
    from aacjax.testing.encoder import CPESpec
    rng = np.random.default_rng(21)
    payloads = []
    for f in range(5):
        chs = []
        for _ in range(2):
            s = random_channel_spec(rng, CFG2, window_sequence=0,
                                    max_sfb=42, allow_tns=False,
                                    allow_noise=False, allow_pulse=False)
            if f >= 1:
                s.ltp_lag = int(rng.integers(64, 2048))
                s.ltp_coef_idx = int(rng.integers(8))
                s.ltp_used = rng.integers(0, 2, 40) > 0
            chs.append(s)
        cpe = CPESpec(left=chs[0], right=chs[1], common_window=True,
                      ms_type=2)
        w = BitWriter()
        enc.write_cpe(w, cpe, CFG2, instance=0)
        payloads.append(enc.end_frame(w))

    fast = decode_ltp_native(payloads, CFG2)
    assert fast is not None
    stream = b"".join(enc.adts_frame(p, CFG2) for p in payloads)
    want, _ = decode_adts(stream)      # same fast path end-to-end
    np.testing.assert_array_equal(fast, want)
    # python loop agreement within f32-input rounding
    from aacjax.host.refdec import ModelDecoder
    dec = ModelDecoder(CFG2)
    prev = [0, 0]
    outs = []
    for p in payloads:
        fr = decode_frame(BitReader(p), CFG2, prev)
        for el in fr.elements:
            prev[0] = el.left.info.window_shape
            prev[1] = el.right.info.window_shape
        outs.append(dec.decode_frame(fr).astype(np.float32))
    ref = np.concatenate(outs, axis=0)
    assert _snr(ref.ravel(), fast.ravel()) > 110.0


# ---------------------------------------------------------------------------
# Stream-BATCHED LTP (host/ltp_batch.py): a fleet of profile-4 streams
# decodes with one native parse per chunk and vectorized frame math —
# bit-identical to the per-stream fast path, oracle-exact, and exposed
# through BatchDecoder (the reference throws on LTP, decoder.js:258-259).
# ---------------------------------------------------------------------------

def _batch_streams(n=5):
    """Varied per-stream content: plain, extreme lags, short-window
    interruptions, TNS."""
    lags = {1: 1, 2: 1024, 3: 2047, 4: 500, 5: 1500, 6: 2000, 7: 64}
    return [
        _stream(n_frames=8, seed=11),
        _stream(n_frames=8, seed=12, lag_fn=lambda f, rng: lags[f]),
        _stream(n_frames=8, seed=13, short_frames=(3, 4)),
        _stream(n_frames=8, seed=14, tns=True),
        _stream(n_frames=8, seed=15, short_frames=(2,), tns=True),
    ][:n]


def _native_ok():
    from aacjax.host import native
    return native.available()


@pytest.mark.skipif(not _native_ok(), reason="native parser not built")
def test_ltp_batched_equals_per_stream():
    """LTPBatchDecoder (vectorized across streams, chunked) equals the
    single-stream decode_ltp_native loop bit-for-bit on every stream."""
    from aacjax.host import adts
    from aacjax.host.ltp_batch import LTPBatchDecoder
    from aacjax.host.refdec import decode_ltp_native

    streams = _batch_streams()
    payloads_per = []
    for st in streams:
        frames = adts.split_frames(st)
        payloads_per.append([st[s:e] for _, s, e in frames])
    n = min(len(p) for p in payloads_per)
    dec = LTPBatchDecoder([CFG] * len(streams))
    outs = []
    for lo in range(0, n, 3):            # odd chunking crosses frames
        outs.append(dec.step_raw([p[lo:lo + 3] for p in payloads_per]))
    got = np.concatenate(outs, axis=1)   # [C, n, F]
    for i in range(len(streams)):
        fast = decode_ltp_native(payloads_per[i][:n], CFG)
        assert fast is not None
        np.testing.assert_array_equal(
            got[i].reshape(-1), fast[:, 0].astype(np.float32),
            err_msg=f"stream {i}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ltp_batchdecoder_oracle_exact():
    """BatchDecoder accepts an all-profile-4 batch and stays
    sample-exact against libavcodec for every stream."""
    from aacjax.host import adts
    from aacjax.runtime.batch import BatchDecoder

    streams = _batch_streams(4)
    payloads_per = []
    for st in streams:
        frames = adts.split_frames(st)
        payloads_per.append([st[s:e] for _, s, e in frames])
    n = min(len(p) for p in payloads_per)
    dec = BatchDecoder([CFG] * len(streams), chunk_frames=4)
    assert dec._ltp_batch is not None
    outs = []
    for lo in range(0, n, 4):
        outs.append(dec.step_raw([p[lo:lo + 4] for p in payloads_per]))
    got = np.concatenate(outs, axis=1)
    for i, st in enumerate(streams):
        want, rate = ffmpeg_oracle.decode_adts(st)
        assert rate == CFG.sample_rate
        mine = got[i].reshape(-1)
        m = min(len(want), len(mine))
        for f in range(m // 1024):
            sl = slice(f * 1024, (f + 1) * 1024)
            snr = _snr(want[sl, 0], mine[sl])
            assert snr > 90.0, (i, f, snr)


@pytest.mark.skipif(not _native_ok(), reason="native parser not built")
def test_ltp_batched_stereo_streams():
    """CPE profile-4 streams (2 rows per stream) batch the same way —
    including M/S content riding the host-fused f32 spectra."""
    from aacjax.host import adts
    from aacjax.host.ltp_batch import LTPBatchDecoder
    from aacjax.host.refdec import decode_ltp_native
    from aacjax.testing.encoder import CPESpec

    rng = np.random.default_rng(21)
    streams = []
    for _s in range(3):
        payloads = []
        for f in range(6):
            chs = []
            for _ in range(2):
                s = random_channel_spec(rng, CFG2, window_sequence=0,
                                        max_sfb=42, allow_tns=False,
                                        allow_noise=False,
                                        allow_pulse=False)
                if f >= 1:
                    s.ltp_lag = int(rng.integers(64, 2048))
                    s.ltp_coef_idx = int(rng.integers(8))
                    s.ltp_used = rng.integers(0, 2, 40) > 0
                chs.append(s)
            cpe = CPESpec(left=chs[0], right=chs[1], common_window=True,
                          ms_type=2)
            w = BitWriter()
            enc.write_cpe(w, cpe, CFG2, instance=0)
            payloads.append(enc.end_frame(w))
        streams.append(b"".join(enc.adts_frame(p, CFG2) for p in payloads))

    payloads_per = []
    for st in streams:
        frames = adts.split_frames(st)
        payloads_per.append([st[s:e] for _, s, e in frames])
    n = min(len(p) for p in payloads_per)
    dec = LTPBatchDecoder([CFG2] * len(streams))
    outs = [dec.step_raw([p[lo:lo + 2] for p in payloads_per])
            for lo in range(0, n, 2)]
    got = np.concatenate(outs, axis=1)   # [2*n_streams, n, F]
    for i in range(len(streams)):
        fast = decode_ltp_native(payloads_per[i][:n], CFG2)
        assert fast is not None
        for ch in range(2):
            np.testing.assert_array_equal(
                got[2 * i + ch].reshape(-1),
                fast[:, ch].astype(np.float32),
                err_msg=f"stream {i} ch {ch}")
