"""Random-access decoding (aacjax/file.py AACFile) — seek support the
reference never had (Aurora restarts its demuxer; the decoder keeps no
index).  AAC-LC carries only the 1-frame overlap/window history, so a
warmed-in seek-read must be bit-identical to the same slice of a
full-file decode."""
import numpy as np
import pytest

from aacjax import AACFile, decode_adts
from aacjax.host.asc import make_asc, parse_asc
from aacjax.testing import encoder as enc
from aacjax.testing.mp4mux import mux_m4a


def _adts_stream(n=12, seed=0, ch=2):
    config = parse_asc(make_asc(2, 4, ch))
    rng = np.random.default_rng(seed)
    t = np.arange(1024 * n)[:, None] / 44100.0
    freqs = np.array([[440.0, 660.0][:ch]])
    x = 8000 * np.sin(2 * np.pi * freqs * t)
    x += 300 * rng.standard_normal((1024 * n, ch))
    return config, enc.encode_pcm(x.astype(np.float64), config,
                                  target_sf=120)


def test_facts_and_full_read():
    config, stream = _adts_stream()
    f = AACFile(stream)
    assert f.sample_rate == 44100
    assert f.channels == 2
    full, rate = decode_adts(stream)
    assert f.total_samples == full.shape[0]
    assert f.duration == pytest.approx(full.shape[0] / 44100)
    got = f.read()
    np.testing.assert_array_equal(got, full)


@pytest.mark.parametrize("start,n", [
    (0, 1024),              # head
    (5 * 1024, 1024),       # frame-aligned interior
    (5 * 1024 + 137, 2000), # unaligned, crosses a boundary
    (11 * 1024 + 512, 4096),  # clipped at EOF
    (3 * 1024, 1),          # single sample
])
def test_seek_read_bit_identical(start, n):
    """A warmed-in ranged read equals the same slice of the full decode
    exactly (AAC-LC: 1 warm-in frame covers all carried state)."""
    config, stream = _adts_stream()
    full, _ = decode_adts(stream)
    f = AACFile(stream)
    got = f.read(start, n)
    want = full[start:start + n]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_player_cursor():
    config, stream = _adts_stream(n=6)
    full, _ = decode_adts(stream)
    f = AACFile(stream)
    f.seek(3 * 1024 / 44100)
    assert f.tell() == pytest.approx(3 * 1024 / 44100)
    chunks = []
    while True:
        c = f.read_chunk()
        if c is None:
            break
        chunks.append(c)
    got = np.concatenate(chunks, axis=0)
    np.testing.assert_array_equal(got, full[3 * 1024:])


def test_m4a_with_gapless_trim():
    """Seek positions are presentation samples: the container's elst
    priming is transparent to read()."""
    config = parse_asc(make_asc(2, 4, 2))
    rng = np.random.default_rng(1)
    t = np.arange(1024 * 8)[:, None] / 44100.0
    x = 8000 * np.sin(2 * np.pi * np.array([[440.0, 660.0]]) * t)
    x += 300 * rng.standard_normal(x.shape)
    payloads = enc.encode_pcm_frames(x, config, target_sf=120)
    priming = 2112
    data = mux_m4a(payloads, make_asc(2, 4, 2), 44100, 2, priming=priming,
                   movie_ts=44100)
    from aacjax import decode_m4a
    trimmed, _ = decode_m4a(data)
    f = AACFile(data)
    assert f.total_samples == trimmed.shape[0]
    got = f.read(3000, 1500)
    np.testing.assert_array_equal(got, trimmed[3000:4500])


def test_he_aac_seek_converges():
    """HE-AAC: QMF/envelope histories decay — a warmed-in seek-read
    matches the full decode to below audibility."""
    from aacjax.host import sbr as S
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload
    rng = np.random.default_rng(2)
    core_cfg = parse_asc(make_asc(2, 7, 1))      # 22050 -> 44100
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    tab = S.derive_tables(h, 2 * core_cfg.sample_rate)
    nb = tab.n_bands(1)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * tab.n_q,
                        env_q=np.full((2, nb), 25, np.int64),
                        noise_q=np.full((2, tab.n_q), 30, np.int64))
    pay = sbr_payload([spec], h, 2 * core_cfg.sample_rate)
    x = 1500 * rng.standard_normal((1024 * 24, 1))
    payloads = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                     fil_payloads=[pay])
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in payloads)
    from aacjax import decode_adts as da
    full, rate = da(stream)
    assert rate == 44100
    f = AACFile(stream)
    assert f.sample_rate == 44100
    start, n = 20 * 2048, 2 * 2048
    got = f.read(start, n)
    want = full[start:start + n]
    denom = float(np.sum(want ** 2)) or 1.0
    err = float(np.sum((got - want) ** 2))
    snr = 10 * np.log10(denom / max(err, 1e-30))
    assert snr > 60, snr


def test_bad_inputs():
    from aacjax.host.asc import UnsupportedError
    with pytest.raises(UnsupportedError):
        AACFile(b"no aac content here at all")
    with pytest.raises(UnsupportedError):
        AACFile(b"\x01" * 64, cookie=b"\x12\x10")


@pytest.mark.parametrize("profile,frame_length", [(23, 512), (39, 512),
                                                  (39, 480)])
def test_seek_ld_eld_loas(profile, frame_length):
    """Ranged reads on LD/ELD LOAS streams are bit-identical to the full
    decode (ELD's 3-segment filterbank carry needs the deeper warm-in)."""
    from aacjax import AACFile, decode_loas
    from aacjax.testing.specgen import random_channel_spec

    cfg = parse_asc(make_asc(profile, 4, 1, frame_length=frame_length))
    rng = np.random.default_rng(61)
    pays = []
    for _ in range(12):
        s = random_channel_spec(rng, cfg, window_sequence=0,
                                allow_pulse=False, allow_noise=False)
        pays.append(enc.write_eld_frame([("SCE", s)], cfg)
                    if profile == 39
                    else enc.write_er_frame([("SCE", s)], cfg))
    loas = enc.loas_stream(pays, cfg)
    whole, _ = decode_loas(loas)
    f = AACFile(loas)
    fl = frame_length
    clip = f.read(start=6 * fl, n=3 * fl)
    np.testing.assert_array_equal(clip, whole[6 * fl:9 * fl])


def test_he_aac_m4a_output_rate_timescale():
    """External HE-AAC .m4a commonly carry mdhd timescale = the SBR
    OUTPUT rate (2x the ASC core rate) with elst values in those units.
    AACFile must convert priming/valid-duration with the TRACK timescale
    (mirroring decode_m4a), not the ASC core rate — the latter doubled
    the trim and misaligned read()/total_samples (round-2 advisor)."""
    from aacjax import decode_m4a
    from aacjax.host import sbr as S
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload

    rng = np.random.default_rng(3)
    core_cfg = parse_asc(make_asc(2, 7, 1))      # 22050 core -> 44100 out
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    tab = S.derive_tables(h, 2 * core_cfg.sample_rate)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * tab.n_q,
                        env_q=np.full((2, tab.n_bands(1)), 25, np.int64),
                        noise_q=np.full((2, tab.n_q), 30, np.int64))
    pay = sbr_payload([spec], h, 2 * core_cfg.sample_rate)
    x = 1500 * rng.standard_normal((1024 * 6, 1))
    payloads = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                     fil_payloads=[pay])
    asc = make_asc(2, 7, 1, sbr=True)
    priming_out = 2048                            # in OUTPUT-rate ticks
    data = mux_m4a(payloads, asc, 44100, 1, frame_length=2048,
                   priming=priming_out, movie_ts=44100)

    trimmed, rate = decode_m4a(data)
    assert rate == 44100
    f = AACFile(data)
    assert f._timescale == 44100                  # mdhd, not ASC core rate
    assert f._priming_out == priming_out          # NOT doubled
    assert f.total_samples == trimmed.shape[0]
    assert f.duration == pytest.approx(trimmed.shape[0] / 44100)
