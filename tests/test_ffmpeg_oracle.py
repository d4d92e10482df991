"""Third-party conformance: aacjax vs FFmpeg's libavcodec AAC decoder.

Two directions:
  * streams produced by our syntax-level writer -> both decoders must
    agree (validates our whole decode stack against an independent,
    conformance-tested implementation);
  * streams produced by FFmpeg's real encoder -> both decoders must agree
    (validates against production bitstream statistics: window switching,
    M/S, TNS, IS).

PNS is excluded from exact comparisons: the spec leaves the noise
generator to the decoder, so PNS band samples are decoder-specific by
design (both decoders produce correctly-scaled but different noise).
"""
import numpy as np
import pytest

from aacjax.api import decode_adts
from aacjax.host import adts
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.syntax import decode_frame
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle as ff
from aacjax.testing.encoder import encode_pcm
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec

pytestmark = pytest.mark.skipif(not ff.available(),
                                reason="libavcodec oracle not built")

SR = 44100


def _cfg(si=4, ch=2):
    return parse_asc(make_asc(2, si, ch))


def rich_signal(n, channels, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = (0.25 * np.sin(2 * np.pi * 440 * t)
         + 0.06 * np.sin(2 * np.pi * 1850 * t)
         + 0.01 * rng.standard_normal(n))
    x[5000:5100] += 0.5 * np.hanning(100)  # transient -> window switching
    if channels == 1:
        return x[:, None].astype(np.float32)
    return np.stack([x, np.roll(x, 30) * 0.8], axis=1).astype(np.float32)


def assert_conformant(stream: bytes, tol: float = 3e-6):
    """Both decoders agree to within tol relative to the signal peak
    (float32 rounding scales with magnitude; random-syntax corpora reach
    huge levels)."""
    theirs, rate = ff.decode_adts(stream)
    ours, rate2 = decode_adts(stream)
    assert rate == rate2
    m = min(len(ours), len(theirs))
    assert m > 0
    peak = max(1.0, float(np.abs(theirs[:m]).max()))
    err = float(np.abs(ours[:m] - theirs[:m]).max()) / peak
    assert err < tol, f"aacjax vs ffmpeg rel maxerr {err} (peak {peak})"
    return err


@pytest.mark.parametrize("opts,bitrate", [
    ("aac_pns=0", 192_000),
    ("aac_pns=0:aac_tns=1", 96_000),
    ("aac_pns=0:aac_ms=1", 128_000),
    ("aac_pns=0:aac_is=1:aac_ms=1", 64_000),
])
def test_ffmpeg_encoded_streams_conform(opts, bitrate):
    pcm = rich_signal(1024 * 12, 2)
    stream = ff.encode_adts(pcm, SR, bitrate, opts=opts)
    assert_conformant(stream)


def test_ffmpeg_stream_exercises_window_switching():
    """The transient corpus must actually cover all four sequences, and we
    must still match FFmpeg."""
    pcm = rich_signal(1024 * 12, 2, seed=1)
    stream = ff.encode_adts(pcm, SR, 128_000, opts="aac_pns=0")
    seqs = set()
    frames = adts.split_frames(stream)
    config = parse_asc(adts.synthesize_cookie(frames[0][0]))
    prev = [0, 0]
    for _, s, e in frames:
        f = decode_frame(BitReader(stream[s:e]), config, prev)
        info = f.elements[0].left.info
        seqs.add(info.window_sequence)
        prev = [info.window_shape] * 2
    assert seqs >= {0, 1, 2, 3}, f"only sequences {seqs}"
    assert_conformant(stream)


def test_our_encoder_streams_conform():
    """encode_pcm output: FFmpeg's decode == aacjax's decode == source."""
    pcm = rich_signal(1024 * 8, 2, seed=2) * 20000
    cfg = _cfg()
    stream = encode_pcm(pcm, cfg, target_sf=125)
    err = assert_conformant(stream)
    # and both reconstruct the source (1024-sample encoder delay)
    ours, _ = decode_adts(stream)
    dec = ours[1024:1024 + len(pcm)] * 32768.0
    lo, hi = 2048, len(pcm) - 2048
    snr = 10 * np.log10(np.sum(pcm[lo:hi] ** 2)
                        / np.sum((dec[lo:hi] - pcm[lo:hi]) ** 2))
    assert snr > 55.0


@pytest.mark.parametrize("seed", range(10))
def test_random_syntax_streams_conform(seed):
    """Property-based three-way conformance: random valid raw_data_blocks
    (all window sequences, grouping, every codebook, pulse, TNS both
    directions, M/S, intensity) decoded by aacjax, FFmpeg, and the fp64
    model.  aacjax must (a) track FFmpeg within float tolerance OR (b) be
    at least as close to the fp64 ground truth as FFmpeg is — high-order
    TNS filters amplify float32 rounding and FFmpeg's float TNS drifts up
    to ~5e-4 from fp64 on torture content while aacjax stays ~1e-5."""
    from aacjax.testing.specgen import legal_sequence_chain
    rng = np.random.default_rng(seed)
    stereo = bool(seed % 2)
    config = _cfg(ch=2 if stereo else 1)
    payloads = []
    # encoder-legal window-sequence chain: decoders legitimately differ on
    # illegal transitions (FFmpeg adapts the overlap-add to the previous
    # frame's sequence; we honor the declared windows like the reference)
    for seq in legal_sequence_chain(rng, 6):
        w = BitWriter()
        if stereo:
            left = random_channel_spec(rng, config, window_sequence=seq,
                                       allow_noise=False)
            right = random_channel_spec(
                rng, config, window_sequence=seq, grouping=left.grouping,
                max_sfb=left.max_sfb, window_shape=left.window_shape,
                allow_intensity=True, allow_noise=False)
            n_idx = left.group_count * left.max_sfb
            ms_type = int(rng.choice([0, 1, 2]))
            ms_used = ((rng.random(n_idx) < 0.5).astype(np.int64)
                       if ms_type == 1 else None)
            enc.write_cpe(w, enc.CPESpec(left=left, right=right,
                                         common_window=True, ms_type=ms_type,
                                         ms_used=ms_used), config)
        else:
            spec = random_channel_spec(rng, config, window_sequence=seq,
                                       allow_noise=False)
            enc.write_sce(w, spec, config)
        payloads.append(enc.end_frame(w))
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)

    import sys as _sys
    import pathlib as _pl
    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from model_decoder import ModelDecoder
    from aacjax.runtime.batch import BatchDecoder

    theirs, _ = ff.decode_adts(stream)
    ours, _ = decode_adts(stream)
    ref = BatchDecoder([config], chunk_frames=len(payloads),
                       use_native=False)
    frames = ref.parse_stream_frames(
        0, [stream[s:e] for _, s, e in adts.split_frames(stream)])
    model = ModelDecoder(config)
    m64 = np.concatenate([model.decode_frame(f) for f in frames], axis=0)

    m = min(len(ours), len(theirs), len(m64))
    peak = max(1.0, float(np.abs(m64[:m]).max()))
    err_ours_ff = float(np.abs(ours[:m] - theirs[:m]).max()) / peak
    err_ours_64 = float(np.abs(ours[:m] - m64[:m]).max()) / peak
    err_ff_64 = float(np.abs(theirs[:m] - m64[:m]).max()) / peak
    assert err_ours_ff < 1e-5 or err_ours_64 <= max(2e-5, err_ff_64), (
        f"ours-vs-ffmpeg {err_ours_ff}, ours-vs-fp64 {err_ours_64}, "
        f"ffmpeg-vs-fp64 {err_ff_64}")


def test_51_channel_order_matches_ffmpeg():
    """Element-order -> canonical-order permutation agrees with FFmpeg's
    5.1 output layout."""
    from aacjax.api import to_canonical_order
    from aacjax.host.bitio import BitWriter as BW
    from aacjax.testing.specgen import (legal_sequence_chain,
                                        random_channel_spec)
    rng = np.random.default_rng(77)
    config = _cfg(si=3, ch=6)
    payloads = []
    for seq in legal_sequence_chain(rng, 3):
        w = BW()
        enc.write_sce(w, random_channel_spec(rng, config, window_sequence=seq,
                                             allow_noise=False,
                                             allow_tns=False), config)
        for inst in range(2):
            left = random_channel_spec(rng, config, window_sequence=seq,
                                       allow_noise=False, allow_tns=False)
            right = random_channel_spec(
                rng, config, window_sequence=seq, grouping=left.grouping,
                max_sfb=left.max_sfb, window_shape=left.window_shape,
                allow_noise=False, allow_tns=False)
            enc.write_cpe(w, enc.CPESpec(left=left, right=right,
                                         common_window=True, ms_type=0),
                          config, instance=inst)
        enc.write_sce(w, random_channel_spec(
            rng, config, window_sequence=0, allow_tns=False,
            allow_pulse=False, allow_noise=False), config, lfe=True)
        payloads.append(enc.end_frame(w))
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    theirs, _ = ff.decode_adts(stream)
    ours, _ = decode_adts(stream)
    ours_canon = to_canonical_order(ours, 6)
    m = min(len(ours_canon), len(theirs))
    peak = max(1.0, float(np.abs(theirs[:m]).max()))
    err = float(np.abs(ours_canon[:m] - theirs[:m]).max()) / peak
    assert err < 3e-6, err


def test_all_sample_indices_conform():
    """Every standard sampling index (96 kHz .. 7350 Hz) against
    libavcodec — exercises each index's SWB tables from both sides."""
    rng = np.random.default_rng(71)
    for si in range(12):
        config = _cfg(si=si, ch=1)
        payloads = []
        for _ in range(3):
            w = BitWriter()
            enc.write_sce(w, random_channel_spec(
                rng, config, window_sequence=0, allow_pulse=False,
                allow_noise=False), config)
            payloads.append(enc.end_frame(w))
        stream = b"".join(adts.wrap_frame(p, config) for p in payloads)
        mine, rate = decode_adts(stream)
        ref, ref_rate = ff.decode_adts(stream)
        assert rate == ref_rate, si
        n = min(len(mine), len(ref))
        peak = max(float(np.abs(ref[:n]).max()), 1e-9)
        err = float(np.abs(mine[:n] - ref[:n]).max()) / peak
        assert err < 2e-5, (si, err)
