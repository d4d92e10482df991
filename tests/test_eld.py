"""AAC-ELD (ER, AOT 39) — enhanced low delay, a profile the reference
rejects outright (decoder.js profile switch).  512/480-sample frames
through the low-delay MDCT filterbank: on device the whole synthesis is
ONE [N, 4N] MXU matmul (tables.eld_synthesis_matrix, the 4N-N/4-tap LD
window folded in) plus a 4-segment shifted overlap-add carrying a [C, 3N]
state across chunks (pipeline.eld_synthesis).

ELD syntax differences covered here (libavcodec aacdec eld_syntax):
no element instance tags, CPE common_window implied true, ics_info
reduced to max_sfb(6), no pulse/gain-control bits, tns_data directly
after its flag.

Oracle: libavcodec via the in-repo ctypes binding, through decode_raw
(extradata + raw payloads).  libavcodec's own LATM demuxer cannot carry
ELD (its in-band ASC reparse misaligns on ELDSpecificConfig and dies
with 'frame length mismatch'), so LOAS transport is cross-checked
against our whole-file path instead.
"""
import numpy as np
import pytest

from aacjax import decode_loas
from aacjax.host.asc import UnsupportedError, make_asc, parse_asc
from aacjax.host.bitio import BitReader
from aacjax.host.syntax import decode_frame
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_channel_spec

HAVE_ORACLE = ffmpeg_oracle.available()


def eld_config(frame_length=512, chan_config=1, sample_index=4):
    return parse_asc(make_asc(39, sample_index, chan_config,
                              frame_length=frame_length))


def eld_sce_payloads(rng, cfg, n, **kw):
    kw.setdefault("allow_pulse", False)
    kw.setdefault("allow_noise", False)
    return [enc.write_eld_frame(
        [("SCE", random_channel_spec(rng, cfg, window_sequence=0, **kw))],
        cfg) for _ in range(n)]


def eld_cpe_payloads(rng, cfg, n):
    out = []
    for _ in range(n):
        left = random_channel_spec(rng, cfg, window_sequence=0,
                                   allow_pulse=False, allow_noise=False)
        right = random_channel_spec(rng, cfg, window_sequence=0,
                                    max_sfb=left.max_sfb,
                                    window_shape=left.window_shape,
                                    allow_pulse=False, allow_noise=False,
                                    allow_intensity=True)
        ms_type = int(rng.integers(0, 3))
        ms_used = ((rng.random(left.max_sfb) < 0.5).astype(np.int64)
                   if ms_type == 1 else None)
        out.append(enc.write_eld_frame(
            [("CPE", enc.CPESpec(left=left, right=right, common_window=True,
                                 ms_type=ms_type, ms_used=ms_used))], cfg))
    return out


def test_asc_roundtrip():
    for fl in (512, 480):
        cfg = eld_config(fl)
        assert cfg.profile == 39
        assert cfg.frame_length == fl
        assert cfg.channels == 1
        assert cfg.swb_count_long > 0


def test_asc_rejects_ld_sbr():
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    w.write(31, 5)          # AOT escape
    w.write(39 - 32, 6)
    w.write(4, 4)
    w.write(1, 4)
    w.write(0, 1)           # 512 frames
    w.write(0, 3)           # resilience off
    w.write(1, 1)           # ldSbrPresentFlag
    w.align()
    with pytest.raises(UnsupportedError):
        parse_asc(w.getvalue())


def test_synthesis_matrix_shape_and_decay():
    """The [N, 4N] operator: the final N/4 columns are zero (the LD
    window has 4N - N/4 taps), and no row is degenerate."""
    from aacjax import tables
    for N in (512, 480):
        M = tables.eld_synthesis_matrix(N)
        assert M.shape == (N, 4 * N)
        assert np.all(M[:, 4 * N - N // 4:] == 0)
        assert np.all(np.abs(M).sum(axis=1) > 0)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("frame_length", [512, 480])
def test_eld_mono_oracle(frame_length):
    rng = np.random.default_rng(7)
    cfg = eld_config(frame_length)
    asc = make_asc(39, 4, 1, frame_length=frame_length)
    payloads = eld_sce_payloads(rng, cfg, 8)
    loas = enc.loas_stream(payloads, cfg)
    mine, rate = decode_loas(loas)
    assert rate == 44100 and mine.shape == (8 * frame_length, 1)
    ref, _ = ffmpeg_oracle.decode_raw(asc, payloads)
    n = min(len(ref), len(mine))
    assert n >= 7 * frame_length
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-5, err / peak


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("frame_length", [512, 480])
def test_eld_stereo_cpe_oracle(frame_length):
    """CPE with M/S + intensity + TNS through the tagless ELD layout."""
    rng = np.random.default_rng(11)
    cfg = eld_config(frame_length, chan_config=2, sample_index=3)
    asc = make_asc(39, 3, 2, frame_length=frame_length)
    payloads = eld_cpe_payloads(rng, cfg, 8)
    loas = enc.loas_stream(payloads, cfg)
    mine, rate = decode_loas(loas)
    assert rate == 48000 and mine.shape == (8 * frame_length, 2)
    ref, _ = ffmpeg_oracle.decode_raw(asc, payloads)
    n = min(len(ref), len(mine))
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-4, err / peak


def test_eld_chunk_boundary_carry():
    """The [C, 3N] overhang state must carry exactly across chunk
    boundaries: decoding 9 frames at chunk_frames=2 matches one shot."""
    rng = np.random.default_rng(13)
    cfg = eld_config(512)
    payloads = eld_sce_payloads(rng, cfg, 9)
    loas = enc.loas_stream(payloads, cfg)
    whole, _ = decode_loas(loas)
    chunked, _ = decode_loas(loas, chunk_frames=2)
    assert whole.shape == chunked.shape == (9 * 512, 1)
    peak = max(float(np.abs(whole).max()), 1e-9)
    assert float(np.abs(whole - chunked).max()) / peak < 1e-6


def test_eld_streaming_decoder():
    """AACDecoder.feed with a LOAS ELD stream: incremental demux +
    per-frame decode matches the whole-file path."""
    from aacjax import AACDecoder
    rng = np.random.default_rng(19)
    cfg = eld_config(512)
    payloads = eld_sce_payloads(rng, cfg, 6)
    loas = enc.loas_stream(payloads, cfg)
    whole, _ = decode_loas(loas)
    dec = AACDecoder()
    chunks = []
    for i in range(0, len(loas), 97):
        dec.feed(loas[i:i + 97])
        while (c := dec.read_chunk()) is not None:
            chunks.append(c.reshape(-1, 1))
    got = np.concatenate(chunks, axis=0)
    assert got.shape == whole.shape
    peak = max(float(np.abs(whole).max()), 1e-9)
    assert float(np.abs(got - whole).max()) / peak < 1e-5


def test_eld_dispatch_via_decode_frame():
    """decode_frame routes profile-39 configs to the ER parser with the
    tagless ELD layout."""
    cfg = eld_config(512)
    rng = np.random.default_rng(31)
    p = eld_sce_payloads(rng, cfg, 1)[0]
    f = decode_frame(BitReader(p), cfg, [0])
    assert len(f.elements) == 1 and not f.cces
    info = f.elements[0].ics.info
    assert info.window_count == 1 and info.frame_len == 512


def test_eld_rejects_oversized_max_sfb():
    from aacjax.host.bitio import BitstreamError, BitWriter
    cfg = eld_config(512)
    w = BitWriter()
    w.write(0, 8)            # global_gain
    w.write(63, 6)           # max_sfb way past swb_count
    w.align()
    with pytest.raises(BitstreamError):
        decode_frame(BitReader(w.getvalue()), cfg, [0])


def test_eld_model_decoder_matches_device():
    """The fp64 model decoder's ELD low-delay filterbank (an independent
    fp64 oracle — libavcodec is f32) agrees with the batched device
    pipeline."""
    from aacjax.host.refdec import ModelDecoder

    rng = np.random.default_rng(43)
    cfg = eld_config(512)
    payloads = eld_sce_payloads(rng, cfg, 6)
    loas = enc.loas_stream(payloads, cfg)
    dev, _ = decode_loas(loas)
    model = ModelDecoder(cfg, n_channels=1)
    out = []
    for p in payloads:
        f = decode_frame(BitReader(p), cfg, [0])
        out.append(model.decode_frame(f))
    want = np.concatenate(out, axis=0)
    err = float(np.abs(dev - want).max())
    peak = max(float(np.abs(want).max()), 1e-9)
    assert err / peak < 2e-5, err / peak
