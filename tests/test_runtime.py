"""Runtime features: checkpoint/resume, CRC headers, raw streaming,
7.1 layout, stats."""
import numpy as np
import pytest

from aacjax.api import AACDecoder, decode_adts
from aacjax.host import adts
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.runtime.batch import BatchDecoder
from aacjax.testing import encoder as enc
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec


def _cfg(si=4, ch=2):
    return parse_asc(make_asc(2, si, ch))


def _payloads(rng, config, n):
    out = []
    for _ in range(n):
        w = BitWriter()
        if config.chan_config == 2:
            enc.write_cpe(w, random_cpe_spec(rng, config), config)
        else:
            enc.write_sce(w, random_channel_spec(rng, config), config)
        out.append(enc.end_frame(w))
    return out


def test_checkpoint_resume():
    """save_state/restore_state reproduces identical continuation — the
    complete resumable decoder state (SURVEY.md §5)."""
    rng = np.random.default_rng(7)
    config = _cfg()
    payloads = _payloads(rng, config, 6)

    dec = BatchDecoder([config], chunk_frames=2)
    dec.step_raw([payloads[0:2]])
    state = dec.save_state()
    want1 = dec.step_raw([payloads[2:4]])
    want2 = dec.step_raw([payloads[4:6]])

    dec2 = BatchDecoder([config], chunk_frames=2)
    dec2.restore_state(state)
    got1 = dec2.step_raw([payloads[2:4]])
    got2 = dec2.step_raw([payloads[4:6]])
    np.testing.assert_array_equal(got1, want1)
    np.testing.assert_array_equal(got2, want2)


def test_adts_crc_header():
    """protection_absent=0 headers carry a 16-bit CRC that both parsers
    skip (adts_demuxer.js:48-49)."""
    rng = np.random.default_rng(3)
    config = _cfg()
    payloads = _payloads(rng, config, 3)
    plain = b"".join(enc.adts_frame(p, config) for p in payloads)
    with_crc = b"".join(enc.adts_frame(p, config, crc=True) for p in payloads)

    frames = adts.split_frames(with_crc)
    assert len(frames) == 3
    assert frames[0][0].header_bytes == 9
    a, _ = decode_adts(plain)
    b, _ = decode_adts(with_crc)
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_raw_stream_with_cookie():
    """Non-ADTS raw frames after set_cookie (the m4a/mp4a path: the
    decoder consumes raw_data_blocks directly, decoder.js:128-130)."""
    rng = np.random.default_rng(11)
    config = _cfg(ch=1)
    payloads = _payloads(rng, config, 2)

    dec = AACDecoder()
    dec.set_cookie(make_asc(2, 4, 1))
    dec.feed(payloads[0])
    chunk = dec.read_chunk()
    assert chunk is not None and chunk.shape == (1024,)

    # reference decode of the same payload
    ref = BatchDecoder([config], chunk_frames=1)
    frames = ref.parse_stream_frames(0, [payloads[0]])
    want = ref.stream_pcm(ref.step([frames]), 0, 1).reshape(-1)
    np.testing.assert_allclose(chunk, want, atol=1e-7)


def test_71_channel_layout():
    """chanConfig 8 (7.1): SCE + 3x CPE + LFE = 8 channels."""
    rng = np.random.default_rng(5)
    config = _cfg(si=3, ch=8)
    payloads = []
    for _ in range(2):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config, allow_pulse=False),
                      config)
        for inst in range(3):
            enc.write_cpe(w, random_cpe_spec(rng, config), config,
                          instance=inst)
        enc.write_sce(w, random_channel_spec(
            rng, config, window_sequence=0, allow_tns=False,
            allow_pulse=False), config, lfe=True)
        payloads.append(enc.end_frame(w))

    dec = BatchDecoder([config], chunk_frames=2, use_native=True)
    pcm = dec.step_raw([payloads])
    out = dec.stream_pcm(pcm, 0, 2)
    assert out.shape == (2048, 8)
    assert np.isfinite(out).all()

    dp = BatchDecoder([config], chunk_frames=2, use_native=False)
    frames = dp.parse_stream_frames(0, payloads)
    want = dp.stream_pcm(dp.step([frames]), 0, 2)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(out, want, atol=1e-6 * scale)


def test_stats_accumulate():
    rng = np.random.default_rng(1)
    config = _cfg()
    payloads = _payloads(rng, config, 4)
    dec = BatchDecoder([config], chunk_frames=4)
    dec.step_raw([payloads])
    d = dec.stats.as_dict()
    assert d["stream_frames"] == 4
    assert d["audio_seconds"] == pytest.approx(4 * 1024 / 44100, rel=1e-2)
    # as_dict rounds to 1 decimal (can be 0.0 under first-compile latency);
    # the property itself must be positive
    assert dec.stats.realtime_x > 0


def test_streaming_multi_rdb_and_partial_feed():
    """Continuous-bitstream streaming: multiple raw_data_blocks in one
    buffer, fed in arbitrary byte-sized pieces (underflow rollback)."""
    rng = np.random.default_rng(21)
    config = _cfg(ch=1)
    payloads = _payloads(rng, config, 3)
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)

    # reference result via batch path
    ref = BatchDecoder([config], chunk_frames=3)
    frames = ref.parse_stream_frames(
        0, [stream[s:e] for _, s, e in adts.split_frames(stream)])
    want = ref.stream_pcm(ref.step([frames]), 0, 3)

    dec = AACDecoder()
    got = []
    # drip-feed in 97-byte pieces
    for i in range(0, len(stream), 97):
        dec.feed(stream[i:i + 97])
        while True:
            chunk = dec.read_chunk()
            if chunk is None:
                break
            got.append(chunk.reshape(-1, 1))
    out = np.concatenate(got, axis=0)
    assert out.shape == want.shape
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(out, want, atol=1e-6 * scale)


def test_decode_adts_error_concealment():
    """on_error='skip': corrupt frames conceal as silence; later frames
    resync and keep decoding."""
    rng = np.random.default_rng(9)
    config = _cfg(ch=1)
    payloads = _payloads(rng, config, 5)
    # corrupt frame 2's payload (keep its ADTS length so framing survives)
    bad = bytearray(payloads[2])
    bad[2:6] = b"\xff\xff\xff\xff"
    stream = b"".join(enc.adts_frame(p, config)
                      for p in payloads[:2] + [bytes(bad)] + payloads[3:])

    with pytest.raises(Exception):
        decode_adts(stream, on_error="raise", chunk_frames=2)

    pcm, rate = decode_adts(stream, on_error="skip", chunk_frames=2)
    assert pcm.shape[0] == 5 * 1024
    assert np.isfinite(pcm).all()
    # the first frame decodes identically to the clean stream
    clean, _ = decode_adts(
        b"".join(enc.adts_frame(p, config) for p in payloads), chunk_frames=2)
    np.testing.assert_allclose(pcm[:1024], clean[:1024], atol=1e-6)


def test_heterogeneous_batch():
    """One BatchDecoder serving streams with different sample rates and
    channel counts simultaneously (mono 8kHz + stereo 44.1kHz + 5.1 48k)."""
    rng = np.random.default_rng(13)
    cfg_mono = _cfg(si=11, ch=1)     # 8 kHz mono
    cfg_st = _cfg(si=4, ch=2)        # 44.1 kHz stereo
    cfg_51 = _cfg(si=3, ch=6)        # 48 kHz 5.1

    p_mono = _payloads(rng, cfg_mono, 2)
    p_st = _payloads(rng, cfg_st, 2)
    p_51 = []
    for _ in range(2):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, cfg_51, allow_pulse=False),
                      cfg_51)
        enc.write_cpe(w, random_cpe_spec(rng, cfg_51), cfg_51)
        enc.write_cpe(w, random_cpe_spec(rng, cfg_51), cfg_51, instance=1)
        enc.write_sce(w, random_channel_spec(
            rng, cfg_51, window_sequence=0, allow_tns=False,
            allow_pulse=False), cfg_51, lfe=True)
        p_51.append(enc.end_frame(w))

    dec = BatchDecoder([cfg_mono, cfg_st, cfg_51], chunk_frames=2)
    pcm = dec.step_raw([p_mono, p_st, p_51])
    assert not any(st.failed for st in dec.streams)

    # each stream must match its solo decode
    for i, (cfg, payloads) in enumerate(
            [(cfg_mono, p_mono), (cfg_st, p_st), (cfg_51, p_51)]):
        solo = BatchDecoder([cfg], chunk_frames=2)
        want = solo.stream_pcm(solo.step_raw([payloads]), 0, 2)
        got = dec.stream_pcm(pcm, i, 2)
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(got, want, atol=1e-6 * scale)


def test_multi_rdb_concealment():
    """num_frames>1 fallback honors on_error='skip' (corrupt block ->
    silence, resync continues)."""
    rng = np.random.default_rng(55)
    config = _cfg(ch=1)
    p1, p2, p3 = _payloads(rng, config, 3)
    # one ADTS frame holding two raw_data_blocks, the first corrupted
    bad = bytearray(p1)
    bad[2:6] = b"\xff\xff\xff\xff"
    payload = bytes(bad) + p2
    w = BitWriter()
    length = len(payload) + 7
    w.write(0xFFF, 12); w.write(0b0001, 4); w.write(config.profile - 1, 2)
    w.write(config.sample_index, 4); w.write(0, 1)
    w.write(config.chan_config, 3); w.write(0, 4); w.write(length, 13)
    w.write(0x7FF, 11); w.write(1, 2)  # numFrames-1 = 1
    stream = w.getvalue() + payload + enc.adts_frame(p3, config)

    with pytest.raises(Exception):
        decode_adts(stream, on_error="raise")
    pcm, _ = decode_adts(stream, on_error="skip")
    assert np.isfinite(pcm).all()
    assert pcm.shape[0] >= 2 * 1024  # concealed + resynced frames
