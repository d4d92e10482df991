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
