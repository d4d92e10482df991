"""MP4/M4A container demux (aacjax/host/mp4.py).

The reference registers for codec id 'mp4a' (decoder.js:30-31) but has no
MP4 demuxer of its own — Aurora's separate mp4.js fed it the esds cookie
and sample payloads.  aacjax ships the demuxer; these tests mux fixtures
with aacjax.testing.mp4mux and validate the demux byte-exactly, the
decode against the ADTS pipeline (bit-identical routing), and the
end-to-end result against libavcodec on the same raw payloads."""
import numpy as np
import pytest

from aacjax import decode_adts, decode_m4a, probe_m4a
from aacjax.host import adts, mp4
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitWriter
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.mp4mux import mux_fmp4, mux_m4a
from aacjax.testing.specgen import random_cpe_spec

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


def _mux(config, payloads, **kw):
    asc = make_asc(config.profile, config.sample_index, config.chan_config)
    return mux_m4a(payloads, asc, config.sample_rate, config.channels, **kw)


def test_probe():
    config, payloads = _payloads()
    data = _mux(config, payloads)
    assert probe_m4a(data)
    assert not probe_m4a(b"\xff\xf1" + data)      # ADTS-ish
    assert not probe_m4a(b"garbage bytes here")
    assert not probe_m4a(b"")


@pytest.mark.parametrize("kw", [
    dict(),                          # mdat before moov
    dict(moov_first=True),           # faststart
    dict(co64=True),                 # 64-bit chunk offsets
    dict(samples_per_chunk=1),
    dict(samples_per_chunk=100),     # single chunk
    dict(qt_version=1),              # QuickTime v1 sound description
])
def test_demux_roundtrip(kw):
    """Demuxed sample payloads are byte-identical to what was muxed,
    across layout variants."""
    config, payloads = _payloads(n=9)
    data = _mux(config, payloads, **kw)
    track, got = mp4.split_samples(data)
    assert got == payloads, kw
    assert track.config.sample_rate == config.sample_rate
    assert track.config.chan_config == config.chan_config
    assert track.timescale == config.sample_rate
    assert track.sample_durations == [1024] * len(payloads)


def test_demux_fragmented():
    """Fragmented MP4 (moov+mvex, moof/traf/trun runs) demuxes to the
    same payloads."""
    config, payloads = _payloads(n=8)
    asc = make_asc(config.profile, config.sample_index, config.chan_config)
    data = mux_fmp4([payloads[:3], payloads[3:6], payloads[6:]], asc,
                    config.sample_rate, config.channels)
    track, got = mp4.split_samples(data)
    assert got == payloads


def test_decode_m4a_matches_adts_path():
    """decode_m4a routes ADTS-expressible configs through the exact
    decode_adts pipeline: outputs are bit-identical."""
    config, payloads = _payloads()
    data = _mux(config, payloads)
    a, ra = decode_m4a(data)
    b, rb = decode_adts(b"".join(adts.wrap_frame(p, config)
                                 for p in payloads))
    assert ra == rb
    np.testing.assert_array_equal(a, b)


def test_gapless_trim():
    """elst priming + valid duration trim the output to the source PCM
    window (iTunes-style gapless)."""
    config, payloads = _payloads(n=6)
    n_total = 1024 * len(payloads)
    priming = 2112
    valid = n_total - priming - 500   # emulate trailing encoder padding
    # movie_ts = sample rate keeps the elst duration sample-exact (with
    # the common 600-tick movie timescale the duration quantizes to
    # 1/600 s, as in real files)
    data = _mux(config, payloads, priming=priming, valid_samples=valid,
                movie_ts=config.sample_rate)
    track = mp4.parse(data)
    assert track.priming == priming
    assert track.total_samples == valid
    full, _ = decode_m4a(data, trim=False)
    trimmed, _ = decode_m4a(data)
    assert full.shape[0] == n_total
    assert trimmed.shape[0] == valid
    np.testing.assert_array_equal(trimmed, full[priming:priming + valid])


def test_esds_parse_errors():
    with pytest.raises(mp4.MP4Error):
        mp4.parse_esds(b"\x00\x00\x00\x00\x07", 0, 5)  # not ES_Descriptor
    # truncated file / no moov
    with pytest.raises(mp4.MP4Error):
        mp4.parse(b"\x00\x00\x00\x08ftyp")
    # moov without an audio track
    from aacjax.testing.mp4mux import _box, _full
    import struct
    moov = _box(b"moov", _full(b"mvhd", 0, 0, b"\x00" * 96))
    with pytest.raises(mp4.MP4Error):
        mp4.parse(_box(b"ftyp", b"M4A ") + moov)


def test_corrupt_sample_table_is_bounded():
    """Sample ranges pointing past EOF are dropped instead of crashing.
    Uses the faststart layout (moov first) so truncating mdat keeps the
    sample tables intact."""
    config, payloads = _payloads(n=4)
    data = bytearray(_mux(config, payloads, moov_first=True))
    track = mp4.parse(bytes(data))
    short = bytes(data[: track.samples[-1][0] + 1])
    t2 = mp4.parse(short)
    assert len(t2.samples) == len(payloads) - 1
    assert [bytes(short[s:e]) for s, e in t2.samples] == payloads[:-1]


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec not available")
def test_decode_m4a_vs_ffmpeg_raw():
    """End-to-end M4A decode matches libavcodec decoding the same raw
    access units with the same ASC."""
    config = parse_asc(make_asc(2, 4, 2))
    rng = np.random.default_rng(7)
    t = np.arange(1024 * 8)[:, None] / 44100.0
    x = 8000 * np.sin(2 * np.pi * np.array([[440.0, 660.0]]) * t)
    x += 300 * rng.standard_normal(x.shape)
    payloads = enc.encode_pcm_frames(x, config, target_sf=120)
    asc = make_asc(config.profile, config.sample_index, config.chan_config)
    data = mux_m4a(payloads, asc, config.sample_rate, config.channels)
    got, rate = decode_m4a(data)
    ref, ref_rate = ffmpeg_oracle.decode_raw(asc, payloads)
    assert rate == ref_rate
    n = min(len(got), len(ref))
    assert np.max(np.abs(got[:n] - ref[:n])) < 1e-4


def test_decode_m4a_he_aac_explicit_sbr():
    """HE-AAC with explicit AOT-5 signaling in the esds ASC: decodes at
    2x the core rate, and the elst trim scales to output samples."""
    from aacjax.host import sbr as S
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload
    rng = np.random.default_rng(2)
    core_cfg = parse_asc(make_asc(2, 7, 1))      # 22050 core -> 44100 out
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    n = t.n_bands(1)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                        env_q=np.full((2, n), 25, np.int64),
                        noise_q=np.full((2, t.n_q), 30, np.int64))
    pay = sbr_payload([spec], h, 2 * core_cfg.sample_rate)
    x = 1500 * rng.standard_normal((1024 * 5, 1))
    payloads = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                     fil_payloads=[pay])
    asc = make_asc(2, 7, 1, sbr=True)            # explicit AOT-5 cookie
    priming = 1024
    data = mux_m4a(payloads, asc, core_cfg.sample_rate, 1,
                   priming=priming, movie_ts=core_cfg.sample_rate)
    pcm, rate = decode_m4a(data)
    assert rate == 44100
    # output trim = priming scaled by rate/timescale = 2x
    assert pcm.shape[0] == 2048 * len(payloads) - 2 * priming
    full, _ = decode_m4a(data, trim=False)
    np.testing.assert_array_equal(pcm, full[2 * priming:])


def test_decode_m4a_960_mode():
    """960-frame streams (frameLengthFlag=1 — inexpressible in ADTS)
    decode through the streaming path with the embedded ASC cookie."""
    config = parse_asc(make_asc(2, 4, 1, frame_length=960))
    rng = np.random.default_rng(5)
    from aacjax.testing.specgen import random_channel_spec
    payloads = []
    for _ in range(4):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    asc = make_asc(config.profile, config.sample_index, config.chan_config,
                   frame_length=960)
    data = mux_m4a(payloads, asc, config.sample_rate, config.channels,
                   frame_length=960)
    pcm, rate = decode_m4a(data)
    assert rate == config.sample_rate
    assert pcm.shape == (960 * 4, 1)
    assert np.isfinite(pcm).all() and np.abs(pcm).max() > 0
