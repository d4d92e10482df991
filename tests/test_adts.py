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


# ---------------------------------------------------------------------------
# ADTS CRC (ISO/IEC 13818-7 §6.2 / §8.2.2)
# ---------------------------------------------------------------------------
# No external oracle exists for this field: the reference skips it
# (adts_demuxer.js:48-49 advances 16 bits unchecked), and libavcodec and
# the faad family ignore it too — so validation is symmetric: our encoder
# computes it (adts.compute_crc), our decoder verifies it
# (decode_adts verify_crc=True), corruption inside the protected span is
# rejected, and corruption beyond the §8.2.2 192-bit-per-block cap is
# (correctly) not detected.

def _crc_stream(n=4, crc=True):
    from aacjax.testing.encoder import encode_pcm_frames
    cfg = _cfg(4, 1)
    t = np.arange(n * 1024) / 44100.0
    pcm = (8000 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    payloads = encode_pcm_frames(pcm, cfg, target_sf=120)
    return b"".join(adts_frame(p, cfg, crc=crc) for p in payloads), payloads


def test_crc_header_fields():
    stream, _ = _crc_stream()
    h = adts.read_header(BitReader(stream))
    assert not h.protection_absent
    assert h.header_bytes == 9
    frames = adts.split_frames(stream)
    for hd, s, e in frames:
        # split_frames strips the header; CRC covers it, so rewind
        assert adts.check_crc(stream[s - hd.header_bytes:e], hd)


def test_crc_roundtrip_decodes():
    from aacjax import decode_adts
    stream, _ = _crc_stream()
    out, rate = decode_adts(stream, verify_crc=True)
    assert rate == 44100 and np.isfinite(out).all()
    # same PCM as the unprotected stream (CRC never alters audio)
    plain, _ = _crc_stream(crc=False)
    out2, _ = decode_adts(plain)
    np.testing.assert_array_equal(out, out2)


def test_crc_detects_protected_corruption():
    from aacjax import decode_adts
    from aacjax.host.bitio import BitstreamError
    stream, _ = _crc_stream()
    frames = adts.split_frames(stream)
    _, s, e = frames[1]          # s = payload start (header stripped)
    bad = bytearray(stream)
    bad[s + 12] ^= 0x10          # inside the first 192 payload bits
    with pytest.raises(BitstreamError, match="crc_check"):
        decode_adts(bytes(bad), verify_crc=True)
    # on_error='skip' conceals the corrupt frame and keeps decoding
    out, _ = decode_adts(bytes(bad), verify_crc=True, on_error="skip")
    assert out.shape[0] == len(frames) * 1024
    # header corruption is covered too (flip a private/original bit that
    # does not change framing)
    bad2 = bytearray(stream)
    bad2[s - 9 + 3] ^= 0x10      # private_bit region of frame 1's header
    with pytest.raises(BitstreamError, match="crc_check"):
        decode_adts(bytes(bad2), verify_crc=True)


def test_crc_cap_is_192_bits():
    """§8.2.2 caps the protected span at 192 bits per raw_data_block:
    corruption past byte 24 of the payload must NOT trip the check
    (documented coverage contract — the field bounds receiver buffering,
    it is not a whole-frame checksum)."""
    stream, payloads = _crc_stream()
    frames = adts.split_frames(stream)
    hd, s, e = frames[0]         # s = payload start (header stripped)
    assert e - s > 30, "test needs a payload longer than the cap"
    bad = bytearray(stream)
    bad[s + 30] ^= 0x40          # past the 24-byte protected span
    assert adts.check_crc(bytes(bad[s - hd.header_bytes:e]), hd)


def test_crc_via_aacjax_encoder():
    """aacjax.encode's ADTS writer emits real crc_check words that our
    own verification accepts, and other decoders (which skip the field,
    like the reference) still decode the stream."""
    from aacjax import decode_adts
    from aacjax.encode import AACEncoder
    from aacjax.testing import ffmpeg_oracle
    t = np.arange(1024 * 6) / 44100.0
    pcm = (9000 * np.sin(2 * np.pi * 523 * t)).reshape(-1, 1)
    enc = AACEncoder(44100, 1, 96_000)
    stream = enc.encode(pcm, crc=True)
    out, rate = decode_adts(stream, verify_crc=True)
    assert rate == 44100 and np.isfinite(out).all()
    if ffmpeg_oracle.available():
        # libavcodec skips crc_check entirely — protected streams decode
        # there identically to unprotected ones (parity note, no oracle)
        ref, rrate = ffmpeg_oracle.decode_adts(stream)
        assert rrate == 44100 and np.isfinite(ref).all()


# ---------------------------------------------------------------------------
# Multi-rdb ADTS CRC (13818-7 §6.2 adts_header_error_check +
# adts_raw_data_block_error_check) — extends the single-rdb contract above:
# the header crc_check covers the 56 header bits plus the
# raw_data_block_position words, and each block carries a trailing 16-bit
# crc_check over its first min(192, len) bits.  Same validation posture:
# symmetric encode-verify (no decoder on earth checks the field) plus
# per-block corruption rejection.
# ---------------------------------------------------------------------------

def _multi_rdb_stream(rdb=3, crc=True, n=6):
    from aacjax.encode import AACEncoder
    t = np.arange(1024 * n) / 44100.0
    pcm = (9000 * np.sin(2 * np.pi * 523 * t)
           + 900 * np.sin(2 * np.pi * 2210 * t)).reshape(-1, 1)
    enc = AACEncoder(44100, 1, 96_000)
    return enc.encode(pcm, crc=crc, rdb_per_frame=rdb), pcm


def test_multi_rdb_crc_header_layout():
    stream, _ = _multi_rdb_stream(rdb=3)
    h = adts.read_header(BitReader(stream))
    assert h.num_frames == 3 and not h.protection_absent
    assert h.header_bytes == 7 + 2 * 2 + 2     # 2 positions + header crc
    assert len(h.rdb_positions) == 2
    frames = adts.split_frames(stream)
    # the MDCT-lookahead flush frame may land alone in a final partial
    # ADTS frame; every full frame groups 3 raw data blocks
    assert all(hd.num_frames == 3 for hd, _, _ in frames[:-1])
    for hd, s, e in frames:
        fr = stream[s - hd.header_bytes:e]
        status = adts.crc_block_status(fr, hd)
        # multi-rdb: header verdict + one per block; single-rdb: the
        # classic one combined crc_check
        want = 1 + hd.num_frames if hd.num_frames > 1 else 1
        assert status == [True] * want
        assert adts.check_crc(fr, hd)


def test_multi_rdb_crc_roundtrip_decodes():
    from aacjax import decode_adts
    stream, _ = _multi_rdb_stream(rdb=3)
    out, rate = decode_adts(stream, verify_crc=True)
    assert rate == 44100 and np.isfinite(out).all()
    # same PCM as the plain single-rdb stream (framing and CRC never
    # alter audio; the grouping shifts chunk boundaries, so the only
    # permitted delta is overlap-add float32 rounding ~1e-7)
    plain, _ = _multi_rdb_stream(rdb=1, crc=False)
    out2, _ = decode_adts(plain)
    np.testing.assert_allclose(out, out2, atol=2e-7)
    # unprotected multi-rdb grouping decodes identically (same chunking)
    grouped, _ = _multi_rdb_stream(rdb=3, crc=False)
    out3, _ = decode_adts(grouped)
    np.testing.assert_array_equal(out3, out)


def test_multi_rdb_crc_per_block_rejection():
    from aacjax import decode_adts
    from aacjax.host.bitio import BitstreamError
    stream, _ = _multi_rdb_stream(rdb=3)
    frames = adts.split_frames(stream)
    hd, s, e = frames[0]
    # corrupt the SECOND raw data block of frame 0 (inside its 192-bit
    # protected span): exactly that block's verdict must flip
    base = s                                  # first block start
    p1 = hd.rdb_positions[0]
    bad = bytearray(stream)
    bad[base + p1 + 3] ^= 0x20
    status = adts.crc_block_status(
        bytes(bad[s - hd.header_bytes:e]), hd)
    assert status == [True, True, False, True]
    with pytest.raises(BitstreamError, match="crc_check"):
        decode_adts(bytes(bad), verify_crc=True)
    # on_error='skip' conceals the frame's blocks and keeps decoding
    out, _ = decode_adts(bytes(bad), verify_crc=True, on_error="skip")
    n_blocks = sum(h.num_frames for h, _, _ in frames)
    assert out.shape[0] == n_blocks * 1024
    # position-word corruption is covered by the header crc
    bad2 = bytearray(stream)
    bad2[s - hd.header_bytes + 7] ^= 0x01
    status2 = adts.crc_block_status(
        bytes(bad2[s - hd.header_bytes:e]), hd)
    assert status2[0] is False or status2[0] == False  # noqa: E712
    with pytest.raises(BitstreamError, match="crc_check"):
        decode_adts(bytes(bad2), verify_crc=True)
