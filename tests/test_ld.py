"""AAC-LD (ER, AOT 23) — a profile the reference rejects outright
(decoder.js profile switch).  512/480-sample frames, ER element layout
(fixed Table-1.19 order, 4-bit instance tags, no END element), ER ICS
ordering (no pulse; tns_data after the gain-control bit), and the LD
window pair (sine / low-overlap) in place of sine/KBD.

Oracle: libavcodec via the in-repo ctypes binding.  LD-512 is verified
sample-accurate against it.  LD-480 is NOT oracle-checkable: this
libavcodec zero-pads 480-coefficient frames through its 512-point IMDCT
(no mdct480/sine_480 in aacdec.o) — verified by reproducing its output
exactly from that broken recipe — so 480 mode is cross-checked between
our fp64 model decoder and the batched device pipeline instead.
"""
import numpy as np
import pytest

from aacjax import decode_loas
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitstreamError
from aacjax.host.refdec import ModelDecoder
from aacjax.host.syntax import decode_er_frame, decode_frame
from aacjax.host.asc import UnsupportedError
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_channel_spec

HAVE_ORACLE = ffmpeg_oracle.available()


def ld_config(frame_length=512, chan_config=1, sample_index=4):
    return parse_asc(make_asc(23, sample_index, chan_config,
                              frame_length=frame_length))


def ld_sce_payloads(rng, cfg, n, **kw):
    kw.setdefault("allow_pulse", False)
    kw.setdefault("allow_noise", False)
    return [enc.write_er_frame(
        [("SCE", random_channel_spec(rng, cfg, window_sequence=0, **kw))],
        cfg) for _ in range(n)]


def ld_cpe_payloads(rng, cfg, n):
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
        out.append(enc.write_er_frame(
            [("CPE", enc.CPESpec(left=left, right=right, common_window=True,
                                 ms_type=ms_type, ms_used=ms_used))], cfg))
    return out


def refdec_decode(cfg, payloads, nch):
    dec = ModelDecoder(cfg, nch)
    shapes = [0] * nch
    out = []
    for p in payloads:
        fr = decode_er_frame(BitReader(p), cfg, shapes)
        ch = 0
        for el in fr.elements:
            infos = ([el.ics.info] if hasattr(el, "ics")
                     else [el.left.info, el.right.info])
            for info in infos:
                shapes[ch] = info.window_shape
                ch += 1
        out.append(dec.decode_frame(fr))
    return np.concatenate(out, axis=0)


def test_asc_roundtrip():
    for fl in (512, 480):
        cfg = ld_config(fl)
        assert cfg.profile == 23
        assert cfg.frame_length == fl
        assert cfg.channels == 1
        assert cfg.swb_count_long > 0
        assert cfg.tns_max_bands_ld > 0


def test_asc_rejects_resilience_and_ep():
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    w.write(23, 5)
    w.write(4, 4)
    w.write(1, 4)
    w.write(0, 1)   # 512
    w.write(0, 1)   # dependsOnCoreCoder
    w.write(1, 1)   # extensionFlag
    w.write(4, 3)   # aacSectionDataResilienceFlag set
    w.write(0, 1)
    w.write(0, 2)
    w.align()
    with pytest.raises(UnsupportedError):
        parse_asc(w.getvalue())


def test_ld_window_pair():
    """Low-overlap window: zeros(3F/8) | sine rise(F/4) | ones(3F/8);
    Princen-Bradley complement with its own mirror (perfect
    reconstruction), for both LD frame lengths."""
    from aacjax import tables
    for F in (512, 480):
        w0 = tables.long_window(0, F)
        w1 = tables.long_window(1, F)
        q, z = F // 4, 3 * F // 8
        assert np.all(w1[:z] == 0) and np.all(w1[z + q:] == 1)
        for w in (w0, w1):
            assert np.allclose(w ** 2 + w[::-1] ** 2, 1.0, atol=1e-12)


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ld512_mono_oracle():
    rng = np.random.default_rng(7)
    cfg = ld_config(512)
    asc = make_asc(23, 4, 1, frame_length=512)
    payloads = ld_sce_payloads(rng, cfg, 10)
    mine = refdec_decode(cfg, payloads, 1)[:, 0]
    ref, _ = ffmpeg_oracle.decode_raw(asc, payloads)
    ref = ref[:, 0]
    n = min(len(ref), len(mine))
    assert n >= 9 * 512
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-5, err / peak


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ld512_loas_batched_oracle():
    """End-to-end: LD raw_data_blocks in a LOAS/LATM transport through
    decode_loas (batched device pipeline at F=512) vs libavcodec's own
    LATM decode."""
    rng = np.random.default_rng(11)
    cfg = ld_config(512)
    loas = enc.loas_stream(ld_sce_payloads(rng, cfg, 10), cfg)
    mine, rate = decode_loas(loas)
    assert rate == 44100 and mine.shape == (10 * 512, 1)
    ref, _ = ffmpeg_oracle.decode_loas(loas)
    n = min(len(ref), len(mine))
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-5, err / peak


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_ld512_stereo_cpe_oracle():
    """CPE with M/S + intensity + TNS through the LD ER layout.
    Tolerance reflects libavcodec's own f32 TNS drift (its IIR
    accumulates error our compensated scan avoids)."""
    rng = np.random.default_rng(13)
    cfg = ld_config(512, chan_config=2, sample_index=3)
    loas = enc.loas_stream(ld_cpe_payloads(rng, cfg, 10), cfg)
    mine, rate = decode_loas(loas)
    assert rate == 48000 and mine.shape[1] == 2
    ref, _ = ffmpeg_oracle.decode_loas(loas)
    n = min(len(ref), len(mine))
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-4, err / peak


def test_ld480_device_matches_model():
    """LD-480 cross-check: fp64 model decoder vs the batched device
    pipeline (libavcodec cannot oracle this mode — see module docstring)."""
    rng = np.random.default_rng(17)
    cfg = ld_config(480)
    payloads = ld_sce_payloads(rng, cfg, 6)
    model = refdec_decode(cfg, payloads, 1)
    loas = enc.loas_stream(payloads, cfg)
    dev, rate = decode_loas(loas)
    assert rate == 44100 and dev.shape == (6 * 480, 1)
    err = float(np.abs(model - dev).max())
    peak = max(float(np.abs(model).max()), 1e-9)
    assert err / peak < 2e-5, err / peak


def test_ld_streaming_decoder():
    """AACDecoder.feed with a LOAS LD stream: incremental demux +
    per-frame decode matches the whole-file path."""
    from aacjax import AACDecoder
    rng = np.random.default_rng(19)
    cfg = ld_config(512)
    payloads = ld_sce_payloads(rng, cfg, 6)
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


def test_ld_rejects_short_windows_and_pulse():
    cfg = ld_config(512)
    rng = np.random.default_rng(23)
    spec = random_channel_spec(rng, cfg, window_sequence=0,
                               allow_pulse=False, allow_noise=False)
    good = enc.write_er_frame([("SCE", spec)], cfg)
    decode_er_frame(BitReader(good), cfg, [0])
    # corrupt the window_sequence bits (after 4-bit tag + 8-bit gain +
    # 1 reserved bit -> bits 13..14)
    bad = bytearray(good)
    bad[1] |= 0x06  # set both window_sequence bits
    with pytest.raises(BitstreamError):
        decode_er_frame(BitReader(bytes(bad)), cfg, [0])


def test_ld_ltp_unsupported():
    """ics_info predictor bit in LD -> UnsupportedError (LD LTP has a
    different lag coding; libavcodec also rejects it)."""
    cfg = ld_config(512)
    rng = np.random.default_rng(29)
    spec = random_channel_spec(rng, cfg, window_sequence=0, max_sfb=1,
                               allow_pulse=False, allow_noise=False,
                               allow_tns=False)
    good = enc.write_er_frame([("SCE", spec)], cfg)
    # predictor_data_present is the bit right after max_sfb (6 bits):
    # tag(4) + gain(8) + reserved(1) + seq(2) + shape(1) + max_sfb(6) = 22
    bad = bytearray(good)
    bad[2] |= 0x02  # bit 22
    with pytest.raises(UnsupportedError):
        decode_er_frame(BitReader(bytes(bad)), cfg, [0])


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("frame_length", [1024, 960])
def test_er_lc_oracle(frame_length):
    """ER AAC-LC (AOT 17): standard frame lengths with the ER element
    layout and ICS ordering — all window sequences (legal chains; on
    illegal chains decoders legitimately differ), short grouping, TNS."""
    from aacjax.testing.specgen import legal_sequence_chain
    cfg = parse_asc(make_asc(17, 4, 1, frame_length=frame_length))
    assert cfg.profile == 17 and cfg.frame_length == frame_length
    rng = np.random.default_rng(41)
    seqs = legal_sequence_chain(rng, 10)
    payloads = [enc.write_er_frame(
        [("SCE", random_channel_spec(rng, cfg, window_sequence=s,
                                     allow_pulse=False,
                                     allow_noise=False))], cfg)
        for s in seqs]
    loas = enc.loas_stream(payloads, cfg)
    mine, rate = decode_loas(loas)
    assert mine.shape == (10 * frame_length, 1)
    ref, _ = ffmpeg_oracle.decode_loas(loas)
    n = min(len(ref), len(mine))
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-5, err / peak


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_er_lc_stereo_cpe_oracle():
    rng = np.random.default_rng(47)
    cfg = parse_asc(make_asc(17, 3, 2, frame_length=1024))
    loas = enc.loas_stream(ld_cpe_payloads(rng, cfg, 8), cfg)
    mine, rate = decode_loas(loas)
    assert rate == 48000 and mine.shape[1] == 2
    ref, _ = ffmpeg_oracle.decode_loas(loas)
    n = min(len(ref), len(mine))
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    assert err / peak < 2e-4, err / peak


def test_er_pulse_forbidden():
    """The pulse bit must be 0 in every ER profile (libavcodec: 'Pulse
    tool not allowed in ER AAC')."""
    cfg = parse_asc(make_asc(17, 4, 1, frame_length=1024))
    rng = np.random.default_rng(53)
    spec = random_channel_spec(rng, cfg, window_sequence=0, max_sfb=4,
                               allow_pulse=False, allow_noise=False,
                               allow_tns=False)
    enc.write_er_frame([("SCE", spec)], cfg)  # clean spec writes fine
    spec.pulse = (0, [1], [2])
    with pytest.raises(AssertionError):
        enc.write_er_frame([("SCE", spec)], cfg)


def test_ld_dispatch_via_decode_frame():
    """decode_frame routes profile-23 configs to the ER parser, so every
    runtime path (streaming, batched python parse) handles LD."""
    cfg = ld_config(512)
    rng = np.random.default_rng(31)
    spec = random_channel_spec(rng, cfg, window_sequence=0,
                               allow_pulse=False, allow_noise=False)
    p = enc.write_er_frame([("SCE", spec)], cfg)
    f = decode_frame(BitReader(p), cfg, [0])
    assert len(f.elements) == 1 and not f.cces
