"""ADTS demux + ASC parsing tests (adts_demuxer.js / decoder.js:53-113)."""
import numpy as np
import pytest

from aacjax.host import adts
from aacjax.host.asc import StreamConfig, UnsupportedError, make_asc, parse_asc
from aacjax.host.bitio import BitReader
from aacjax.testing.encoder import adts_frame


def _cfg(sample_index=4, chan=2):
    return parse_asc(make_asc(2, sample_index, chan))


def test_asc_roundtrip():
    cfg = _cfg(4, 2)
    assert cfg.profile == 2
    assert cfg.sample_rate == 44100
    assert cfg.chan_config == 2
    assert cfg.frame_length == 1024


def test_asc_explicit_sample_rate():
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    w.write(2, 5)          # LC
    w.write(0x0F, 4)       # escape
    w.write(22050, 24)
    w.write(1, 4)
    w.write(0, 3)          # GASpecificConfig flags
    w.align()
    cfg = parse_asc(w.getvalue())
    assert cfg.sample_rate == 22050
    assert cfg.sample_index == 7


def test_asc_960_frame_mode():
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    w.write(2, 5)
    w.write(4, 4)
    w.write(2, 4)
    w.write(1, 1)          # frameLengthFlag = 960-sample frames
    w.align()
    cfg = parse_asc(w.getvalue())
    assert cfg.frame_length == 960
    assert cfg.short_length == 120


def test_asc_rejects_unknown_profile():
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    w.write(3, 5)          # AAC SSR — unsupported core object type
    w.write(4, 4)
    w.write(2, 4)
    w.align()
    with pytest.raises(UnsupportedError):
        parse_asc(w.getvalue())


def test_adts_header_roundtrip():
    cfg = _cfg(5, 1)
    payload = b"\x12\x34\x56\x78"
    frame = adts_frame(payload, cfg)
    header = adts.read_header(BitReader(frame))
    assert header.profile == 2
    assert header.sampling_index == 5
    assert header.chan_config == 1
    assert header.frame_length == len(payload) + 7
    assert header.num_frames == 1
    assert header.protection_absent


def test_cookie_synthesis_matches_asc():
    """The demuxer's 2-byte cookie (adts_demuxer.js:66-70) must parse back
    to the header's configuration."""
    for si in range(12):
        for ch in (1, 2, 3, 6):
            cfg = _cfg(si, ch)
            frame = adts_frame(b"\x00" * 10, cfg)
            header = adts.read_header(BitReader(frame))
            cookie = adts.synthesize_cookie(header)
            cfg2 = parse_asc(cookie)
            assert cfg2.sample_index == si
            assert cfg2.chan_config == ch
            assert cfg2.profile == 2


def test_probe():
    cfg = _cfg()
    stream = adts_frame(b"\x00" * 8, cfg)
    assert adts.probe(stream)
    assert not adts.probe(b"\x00" * 64)
    # probe scans 16-bit words (even offsets): a syncword at an odd offset
    # is invisible, matching the reference scan (adts_demuxer.js:11-16)
    assert not adts.probe(b"\x00" + stream[:-1])


def test_split_frames_and_resync():
    cfg = _cfg()
    f1 = adts_frame(b"\xaa" * 20, cfg)
    f2 = adts_frame(b"\xbb" * 30, cfg)
    garbage = b"\x01\x02\x03"
    data = garbage + f1 + f2
    frames = adts.split_frames(data)
    assert len(frames) == 2
    h1, s1, e1 = frames[0]
    assert data[s1:e1] == b"\xaa" * 20
    h2, s2, e2 = frames[1]
    assert data[s2:e2] == b"\xbb" * 30


def test_split_frames_truncated_tail():
    cfg = _cfg()
    f1 = adts_frame(b"\xaa" * 20, cfg)
    f2 = adts_frame(b"\xbb" * 30, cfg)
    frames = adts.split_frames(f1 + f2[:10])
    assert len(frames) == 1


def _pce_asc(si=4, n_front_cpe=1):
    """ASC with chanConfig=0 + embedded PCE declaring one front CPE."""
    from aacjax.host.bitio import BitWriter
    w = BitWriter()
    w.write(2, 5)    # AOT LC
    w.write(si, 4)
    w.write(0, 4)    # chanConfig 0 -> PCE follows GASpecificConfig flags
    w.write(0, 1)    # frameLengthFlag
    w.write(0, 1)    # dependsOnCoreCoder
    w.write(0, 1)    # extensionFlag
    # program_config_element
    w.write(0, 4)    # instance tag
    w.write(1, 2)    # object type (LC-1)
    w.write(si, 4)
    w.write(n_front_cpe, 4)  # num front
    w.write(0, 4)    # side
    w.write(0, 4)    # back
    w.write(0, 2)    # lfe
    w.write(0, 3)    # assoc
    w.write(0, 4)    # cc
    w.write(0, 1); w.write(0, 1); w.write(0, 1)  # mixdowns absent
    for i in range(n_front_cpe):
        w.write(1, 1)    # element_is_cpe
        w.write(i, 4)    # tag
    w.align()
    w.write(0, 8)    # comment length
    return w.getvalue()


def test_pce_chan_config_0():
    """chanConfig=0 with an embedded PCE (the reference throws,
    decoder.js:101-103): channel layout comes from the PCE; decode
    matches libavcodec on the same raw stream + ASC."""
    import numpy as np
    from aacjax.host.bitio import BitWriter
    from aacjax.api import AACDecoder
    from aacjax.testing import encoder as enc, ffmpeg_oracle
    from aacjax.testing.specgen import random_cpe_spec

    cookie = _pce_asc()
    cfg = parse_asc(cookie)
    assert cfg.chan_config == 0 and cfg.channels == 2
    assert cfg.sample_rate == 44100

    rng = np.random.default_rng(17)
    payloads = []
    for _ in range(4):
        w = BitWriter()
        # PNS noise is decoder-specific by design -> excluded from the
        # exact FFmpeg comparison (same policy as test_ffmpeg_oracle)
        from aacjax.testing.specgen import random_channel_spec
        from aacjax.testing.encoder import CPESpec
        # long windows only: random sequences can form spec-illegal
        # transitions that FFmpeg windows differently by design
        left = random_channel_spec(rng, cfg, window_sequence=0,
                                   allow_noise=False, allow_pulse=False,
                                   allow_tns=False)
        right = random_channel_spec(
            rng, cfg, window_sequence=0, max_sfb=left.max_sfb,
            window_shape=left.window_shape, allow_noise=False,
            allow_pulse=False, allow_tns=False)
        enc.write_cpe(w, CPESpec(left=left, right=right, common_window=True,
                                 ms_type=0), cfg)
        payloads.append(enc.end_frame(w))

    dec = AACDecoder(cookie=cookie)
    dec.feed(b"".join(payloads))
    outs = []
    while True:
        c = dec.read_chunk()
        if c is None:
            break
        outs.append(c.reshape(-1, 2))
    got = np.concatenate(outs)
    assert got.shape == (4 * 1024, 2)

    if ffmpeg_oracle.available():
        want, rate = ffmpeg_oracle.decode_raw(cookie, payloads)
        assert rate == 44100 and want.shape[1] == 2
        n = min(len(want), len(got))
        # random spectra are unclipped full-range floats; compare
        # relative to full scale (PNS/TNS excluded: their FFmpeg-accuracy
        # policy lives in test_ffmpeg_oracle)
        scale = max(1.0, float(np.abs(want).max()))
        assert float(np.abs(want[:n] - got[:n]).max()) < 2e-5 * scale


def test_in_stream_pce_is_consumed():
    """A PCE element inside a raw_data_block parses (consuming its exact
    bit count) instead of aborting the frame."""
    import numpy as np
    from aacjax.host.bitio import BitReader, BitWriter
    from aacjax.host.syntax import decode_frame
    from aacjax.testing import encoder as enc
    from aacjax.testing.specgen import random_channel_spec

    cfg = parse_asc(make_asc(2, 4, 1))
    rng = np.random.default_rng(3)
    w = BitWriter()
    # in-stream PCE first (element type 5 + its payload)
    w.write(5, 3)
    pce = BitReader(_pce_asc()[2:])  # reuse the PCE bits: skip ASC header
    w.write(0, 4)  # instance tag
    w.write(1, 2); w.write(4, 4)
    w.write(0, 4); w.write(0, 4); w.write(0, 4); w.write(0, 2)
    w.write(0, 3); w.write(0, 4)
    w.write(0, 1); w.write(0, 1); w.write(0, 1)
    w.align()
    w.write(0, 8)
    enc.write_sce(w, random_channel_spec(rng, cfg, allow_pulse=False), cfg)
    payload = enc.end_frame(w)
    frame = decode_frame(BitReader(payload), cfg, [0])
    assert len(frame.elements) == 1
