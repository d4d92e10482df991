"""Native C++ parser vs Python parser: fused spectral outputs, window
metadata and TNS banks must match the Python parse+pack path bit-exactly
(the float32 operation order is identical by construction)."""
import numpy as np
import pytest

from aacjax.host import native
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.syntax import decode_frame
from aacjax.runtime.pack import pack_frames
from aacjax.testing import encoder as enc
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native parser not built")


def _cfg(si=4, ch=2):
    return parse_asc(make_asc(2, si, ch))


def python_reference_batch(config, payloads, n_slots, T):
    """Parse via the Python path and pack into the dense layout."""
    prev = np.zeros(n_slots, np.int32)
    frames = []
    for p in payloads:
        f = decode_frame(BitReader(p), config, prev)
        ch_i = 0
        for e in f.elements:
            infos = ([e.ics.info] if hasattr(e, 'ics')
                     else [e.left.info, e.right.info])
            for info in infos:
                prev[ch_i] = info.window_shape
                ch_i += 1
        frames.append(f)
    return pack_frames([(0, frames)], n_slots, T)


def expected_spec_f32(batch):
    """Reproduce the native finalize_spec + apply_stereo float32 math from
    the Python pack arrays (identical op order -> bit-exact)."""
    # batch['quant'] now carries host-side iq = sign(q)*|q|^(4/3)
    spec = batch['quant'] * batch['scale'] + batch['noise']
    l = spec[batch['pair_l']]
    r = spec[batch['pair_r']]
    ms = batch['ms_mask']
    isv = batch['is_scale']
    l2 = np.where(ms != 0, l + r, l).astype(np.float32)
    r2 = np.where(ms != 0, l - r, r).astype(np.float32)
    r3 = np.where(isv != 0, l2 * isv, r2).astype(np.float32)
    spec[batch['pair_l']] = l2
    spec[batch['pair_r']] = r3
    return spec


def run_native(config, payloads, n_slots):
    T = len(payloads)
    out = native.SpecBatchArrays(n_slots, T)
    prev = np.zeros(n_slots, np.int32)
    status, has_tns, _err = native.parse_batch_spec(
        [payloads], np.array([config.sample_index], np.int32),
        np.array([config.chan_config], np.int32),
        np.array([0], np.int32), np.array([n_slots], np.int32), prev, out)
    return out, status, has_tns, prev


def compare(config, payloads, n_slots, seed_info=""):
    T = len(payloads)
    out, status, has_tns, prev = run_native(config, payloads, n_slots)
    assert status[0] == 0, f"{seed_info}: native status {status[0]}"
    batch, flags = python_reference_batch(config, payloads, n_slots, T)

    np.testing.assert_array_equal(out.spec, expected_spec_f32(batch),
                                  err_msg=seed_info)
    meta = out.meta
    np.testing.assert_array_equal(meta[:, :, 0], batch['f_idx'])
    np.testing.assert_array_equal(meta[:, :, 1], batch['s_idx'])
    np.testing.assert_array_equal(meta[:, :, 4],
                                  batch['is_short'].astype(np.int32))
    assert bool(has_tns) == flags.has_tns
    if flags.has_tns:
        np.testing.assert_array_equal(out.tns_lpc[:, :, 0],
                                      batch['tns_fwd_lpc'])
        np.testing.assert_array_equal(out.tns_lpc[:, :, 1],
                                      batch['tns_rev_lpc'])
        np.testing.assert_array_equal(out.tns_range[:, :, 0, :, 0],
                                      batch['tns_fwd_start'])
        np.testing.assert_array_equal(out.tns_range[:, :, 0, :, 1],
                                      batch['tns_fwd_end'])
        np.testing.assert_array_equal(out.tns_range[:, :, 1, :, 0],
                                      batch['tns_rev_start'])
        np.testing.assert_array_equal(out.tns_range[:, :, 1, :, 1],
                                      batch['tns_rev_end'])


@pytest.mark.parametrize("seed", range(20))
def test_native_mono_matches_python(seed):
    rng = np.random.default_rng(seed)
    config = _cfg(si=int(rng.integers(0, 13)), ch=1)
    payloads = []
    for _ in range(4):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    compare(config, payloads, 1, f"seed={seed}")


@pytest.mark.parametrize("seed", range(20))
def test_native_stereo_matches_python(seed):
    rng = np.random.default_rng(1000 + seed)
    config = _cfg(si=int(rng.integers(0, 13)), ch=2)
    payloads = []
    for _ in range(4):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    compare(config, payloads, 2, f"seed={seed}")


def test_native_51_with_extras():
    rng = np.random.default_rng(77)
    config = _cfg(si=3, ch=6)
    payloads = []
    for _ in range(3):
        w = BitWriter()
        enc.write_fil(w, 5)
        enc.write_sce(w, random_channel_spec(rng, config), config)
        enc.write_dse(w, b"metadata", align=True)
        enc.write_cpe(w, random_cpe_spec(rng, config), config)
        enc.write_cpe(w, random_cpe_spec(rng, config), config, instance=1)
        enc.write_sce(w, random_channel_spec(rng, config, window_sequence=0,
                                             allow_tns=False,
                                             allow_pulse=False),
                      config, lfe=True)
        payloads.append(enc.end_frame(w))
    compare(config, payloads, 6)


def test_native_adts_headers_interleaved():
    """Frames prefixed with ADTS headers parse identically (the header is
    consumed inline, decoder.js:128-130)."""
    rng = np.random.default_rng(5)
    config = _cfg(si=4, ch=2)
    payloads = []
    for _ in range(3):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config), config)
        raw = enc.end_frame(w)
        payloads.append(enc.adts_frame(raw, config))  # header NOT stripped
    compare(config, payloads, 2)


def test_native_7350hz_index12():
    """sample_index 12 (7350 Hz) is legal and must use the 8 kHz tables
    (the reference crashes on it; SURVEY.md tables.js:127-155)."""
    rng = np.random.default_rng(6)
    config = _cfg(si=12, ch=1)
    assert config.sample_rate == 7350
    payloads = []
    for _ in range(2):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    compare(config, payloads, 1)


def _cce_payload(rng, config, point, target_tns=False, deltas=True,
                 n_extra_elems=0):
    """CPE (+optional TNS) followed by a CCE coupling onto both channels."""
    w = BitWriter()
    if target_tns:
        from aacjax.testing.encoder import CPESpec
        left = random_channel_spec(rng, config, force_tns=True,
                                   allow_pulse=False)
        right = random_channel_spec(
            rng, config, window_sequence=left.window_sequence,
            grouping=left.grouping, max_sfb=left.max_sfb,
            window_shape=left.window_shape, force_tns=True,
            allow_pulse=False)
        cpe = CPESpec(left=left, right=right, common_window=True,
                      ms_type=0, ms_used=np.zeros(128, bool))
    else:
        cpe = random_cpe_spec(rng, config, common=True)
    enc.write_cpe(w, cpe, config, instance=0)
    for i in range(n_extra_elems):
        enc.write_sce(w, random_channel_spec(rng, config, allow_pulse=False),
                      config, instance=i)
    ics = random_channel_spec(rng, config, window_sequence=0,
                              allow_tns=False, allow_noise=False,
                              allow_pulse=False)
    n_coded = int(np.count_nonzero(ics.band_books))
    gl = [(0 if (deltas and point != 2) else 1, 3,
           [int(rng.integers(-3, 4)) for _ in range(n_coded)])]
    enc.write_cce(w, enc.CCESpec(ics=ics, coupling_point=point,
                                 targets=[(1, 0, 3)], sign=int(rng.integers(2)),
                                 scale_idx=1, gain_lists=gl), config)
    return enc.end_frame(w)


@pytest.mark.parametrize("point,target_tns", [
    (0, False), (0, True), (1, False), (1, True), (2, False), (2, True)])
def test_native_cce_matches_python_path(point, target_tns):
    """Native CCE (host-fused dependent coupling, device entries for
    AFTER_TNS-onto-TNS'd targets and AFTER_IMDCT) produces the same PCM as
    the Python parse+pack path (cce.js:45-158 semantics)."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(500 + point * 10 + target_tns)
    config = _cfg(si=4, ch=2)
    payloads = [_cce_payload(rng, config, point, target_tns)
                for _ in range(3)]

    dn = BatchDecoder([config], chunk_frames=3, cce_slots=1, use_native=True)
    pcm_native = dn.step_raw([payloads])
    assert not dn.streams[0].failed, dn.streams[0].last_error

    dp = BatchDecoder([config], chunk_frames=3, cce_slots=1, use_native=False)
    pcm_python = dp.step([dp.parse_stream_frames(0, payloads)])
    scale = max(1.0, float(np.abs(pcm_python).max()))
    np.testing.assert_allclose(pcm_native, pcm_python, atol=2e-5 * scale)


def test_native_cce_no_slot_is_clear_failure():
    """Independent (AFTER_IMDCT) coupling needs a channel slot for the
    coupling channel's own IMDCT; with cce_slots=0 the stream fails with
    an error naming the fix instead of crashing or degrading the batch."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(3)
    config = _cfg(si=4, ch=2)
    payloads = [_cce_payload(rng, config, 2)]
    dec = BatchDecoder([config], chunk_frames=1, cce_slots=0, use_native=True)
    dec.step_raw([payloads])
    assert dec.streams[0].failed
    assert "cce_slots" in dec.streams[0].last_error


def test_native_error_status():
    config = _cfg(si=4, ch=1)
    out, status, _, _ = run_native(config, [b"\xff\xff\xff\xff"], 1)
    assert status[0] not in (0, native.ERR_FALLBACK)


def _mk_payloads(rng, config, n):
    payloads = []
    for _ in range(n):
        w = BitWriter()
        if config.chan_config == 2:
            enc.write_cpe(w, random_cpe_spec(rng, config), config)
        else:
            enc.write_sce(w, random_channel_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    return payloads


def test_step_raw_native_matches_python_step():
    """Full runtime: step_raw (native parse) == step (python parse+pack)."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(42)
    config = _cfg(si=4, ch=2)
    streams = [_mk_payloads(rng, config, 4) for _ in range(3)]

    dn = BatchDecoder([config] * 3, chunk_frames=4, use_native=True)
    pcm_native = dn.step_raw([list(p) for p in streams])

    dp = BatchDecoder([config] * 3, chunk_frames=4, use_native=False)
    frames = [dp.parse_stream_frames(i, p) for i, p in enumerate(streams)]
    pcm_python = dp.step(frames)

    scale = max(1.0, float(np.abs(pcm_python).max()))
    np.testing.assert_allclose(pcm_native, pcm_python, atol=1e-6 * scale)
    for a, b in zip(dn.streams, dp.streams):
        np.testing.assert_array_equal(a.prev_shapes, b.prev_shapes)


def test_step_raw_error_isolation():
    """A corrupt stream inside a batch must not poison the others."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(11)
    config = _cfg(si=4, ch=2)
    good1 = _mk_payloads(rng, config, 3)
    bad = [b"\x00\x01\x02\x03"]
    good2 = _mk_payloads(rng, config, 3)

    dec = BatchDecoder([config] * 3, chunk_frames=3, use_native=True)
    pcm = dec.step_raw([good1, bad, good2])
    assert dec.streams[1].failed
    assert not dec.streams[0].failed and not dec.streams[2].failed

    solo = BatchDecoder([config], chunk_frames=3, use_native=True)
    pcm_solo = solo.step_raw([good1])
    scale = max(1.0, float(np.abs(pcm_solo).max()))
    np.testing.assert_allclose(pcm[0:2], pcm_solo[0:2], atol=1e-6 * scale)


def test_cce_stream_keeps_batch_native():
    """One CCE stream inside a batch stays on the native path and does not
    de-optimize (or perturb) the other streams (VERDICT round 1, #2)."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(9)
    config = _cfg(si=4, ch=2)
    cce_payloads = [_cce_payload(rng, config, 0) for _ in range(2)]
    plain = [_mk_payloads(rng, config, 2) for _ in range(2)]

    dec = BatchDecoder([config] * 3, chunk_frames=2, cce_slots=1,
                       use_native=True)
    assert dec.use_native
    pcm = dec.step_raw([plain[0], cce_payloads, plain[1]])
    assert not any(st.failed for st in dec.streams)

    # plain streams decode identically to a solo native run
    solo = BatchDecoder([config], chunk_frames=2, cce_slots=1,
                        use_native=True)
    want = solo.step_raw([plain[0]])
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(pcm[0:2], want[0:2], atol=1e-6 * scale)

    # and the CCE stream matches the python-path reference
    dp = BatchDecoder([config], chunk_frames=2, cce_slots=1,
                      use_native=False)
    want_cce = dp.step([dp.parse_stream_frames(0, cce_payloads)])
    scale = max(1.0, float(np.abs(want_cce).max()))
    np.testing.assert_allclose(pcm[3:5], want_cce[0:2], atol=2e-5 * scale)


@pytest.mark.parametrize("duplex", [True, False])
def test_decode_pipelined_matches_step_raw(duplex):
    """3-stage pipelined decode equals sequential step_raw with
    transfers overlapped (duplex) AND under the serialized-transfer
    lock used on half-duplex links."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(2024)
    config = _cfg(si=4, ch=2)
    streams = [_mk_payloads(rng, config, 6) for _ in range(2)]

    ref = BatchDecoder([config] * 2, chunk_frames=3, use_native=True)
    want = [np.asarray(ref.step_raw([p[i:i + 3] for p in streams],
                                    out_int16=True))
            for i in (0, 3)]

    dec = BatchDecoder([config] * 2, chunk_frames=3, use_native=True)
    got = list(dec.decode_pipelined(
        ([p[i:i + 3] for p in streams] for i in (0, 3)), out_int16=True,
        duplex=duplex))
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_native_parse_deterministic():
    """Two parses of the same chunk produce bit-identical outputs
    (guards against uninitialized reads in the C parser)."""
    rng = np.random.default_rng(31337)
    config = _cfg(si=4, ch=2)
    payloads = _mk_payloads(rng, config, 4)
    a, sa, _, pa = run_native(config, payloads, 2)
    b, sb, _, pb = run_native(config, payloads, 2)
    np.testing.assert_array_equal(a.spec, b.spec)
    np.testing.assert_array_equal(a.meta, b.meta)
    np.testing.assert_array_equal(a.tns_lpc, b.tns_lpc)
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_array_equal(pa, pb)


def test_native_frame_concealment_keeps_rest_of_stream():
    """A corrupt frame inside a chunk conceals as (near-)silence while the
    stream's later frames still decode — at most one frame is lost per
    corrupt frame (VERDICT round 1, #7)."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(21)
    config = _cfg(si=4, ch=2)
    payloads = _mk_payloads(rng, config, 5)

    clean = BatchDecoder([config], chunk_frames=5, use_native=True)
    want = clean.step_raw([payloads])

    bad = bytearray(payloads[2])
    bad[1:5] = b"\xff\xff\xff\xff"
    dec = BatchDecoder([config], chunk_frames=5, use_native=True)
    got = dec.step_raw([payloads[:2] + [bytes(bad)] + payloads[3:]])
    assert dec.streams[0].failed
    assert np.isfinite(got).all()
    scale = max(1.0, float(np.abs(want).max()))
    # frames before the corrupt one: identical
    np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-6 * scale)
    # frames after: identical except frame 3's first half, which misses
    # only the corrupt frame's overlap tail (its own contribution is there)
    np.testing.assert_allclose(got[:, 4], want[:, 4], atol=1e-6 * scale)
    # the concealed frame plays the previous frame's decaying tail, not
    # garbage: it must be strictly quieter than the clean frame
    assert float(np.abs(got[:2, 2]).max()) <= float(np.abs(want[:2, 2]).max())


def test_streaming_native_matches_python():
    """AACDecoder on the native block path (decode_block + consumed-bits
    reporting) produces the same PCM as the pure-python streaming path,
    including TNS and coupling content (VERDICT round 1, #7)."""
    from aacjax.api import AACDecoder
    from aacjax.host.asc import make_asc
    rng = np.random.default_rng(64)
    config = _cfg(si=4, ch=2)
    payloads = [_cce_payload(rng, config, p % 3) for p in range(4)]
    payloads += _mk_payloads(rng, config, 3)
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    cookie = make_asc(2, 4, 2)

    def run(use_native):
        dec = AACDecoder(cookie=cookie, use_native=use_native)
        dec.feed(stream)
        outs = []
        while True:
            c = dec.read_chunk()
            if c is None:
                break
            outs.append(c)
        return dec, np.concatenate(outs)

    dn, got = run(True)
    dp, want = run(False)
    assert dn._runtime.use_native and not dp._runtime.use_native
    assert got.shape == want.shape == (7 * 1024 * 2,)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_streaming_native_partial_feed():
    """Partial feeds on the native path: read_chunk returns None until a
    complete block is buffered, then decodes it identically."""
    from aacjax.api import AACDecoder
    from aacjax.host.asc import make_asc
    rng = np.random.default_rng(65)
    config = _cfg(si=4, ch=2)
    payloads = _mk_payloads(rng, config, 2)
    stream = b"".join(enc.adts_frame(p, config) for p in payloads)
    cookie = make_asc(2, 4, 2)

    ref = AACDecoder(cookie=cookie, use_native=True)
    ref.feed(stream)
    want = [ref.read_chunk(), ref.read_chunk()]

    dec = AACDecoder(cookie=cookie, use_native=True)
    got = []
    for i in range(0, len(stream), 100):
        dec.feed(stream[i:i + 100])
        while True:
            c = dec.read_chunk()
            if c is None:
                break
            got.append(c)
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_compact_spec_transfer_close_to_exact():
    """Compact (per-row int16 fixed point) spectral transfer stays within
    its documented ~1.5e-5 relative error of the exact f32 path — below
    the codec's own quantization noise floor — on realistic encoded
    content (full-scale music-like PCM)."""
    from aacjax.host import adts
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing.encoder import encode_pcm
    config = _cfg(si=4, ch=2)
    t = np.arange(1024 * 6) / 44100
    rng = np.random.default_rng(99)
    x = (20000 * np.sin(2 * np.pi * 440 * t)
         + 3000 * rng.standard_normal(t.size))
    stream = encode_pcm(np.stack([x, 0.8 * x], axis=1), config,
                        target_sf=130)
    payloads = [stream[s:e] for _, s, e in adts.split_frames(stream)]

    def run(compact, out_int16):
        dec = BatchDecoder([config], chunk_frames=len(payloads),
                           use_native=True)
        return dec.step_raw([payloads], compact=compact,
                            out_int16=out_int16)

    want = run(False, False)
    got = run(True, False)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=1e-4 * scale)
    # and int16 PCM differs by at most 2 LSB
    w16 = run(False, True)
    g16 = run(True, True)
    assert int(np.abs(g16.astype(np.int32) - w16.astype(np.int32)).max()) <= 2


def test_native_parse_threads_bit_exact():
    """The multi-threaded batch parse (AACJAX_PARSE_THREADS) produces
    bit-identical outputs to the serial path — spectra, meta, TNS, and
    the compacted CCE side arrays — across a mixed batch (stereo, CCE
    coupling, and a concealed corrupt frame)."""
    import os
    n_streams, T = 12, 3
    config = _cfg(si=4, ch=2)

    def build_payloads(s):
        rng = np.random.default_rng(900 + s)
        if s % 3 == 0:  # coupled stream (exercises the CCE arenas)
            return [_cce_payload(rng, config, point=s % 2, target_tns=False)
                    for _ in range(T)]
        out = []
        for _ in range(T):
            w = BitWriter()
            enc.write_cpe(w, random_cpe_spec(rng, config, common=True),
                          config, instance=0)
            out.append(enc.end_frame(w))
        return out

    payloads = [build_payloads(s) for s in range(n_streams)]
    payloads[5][1] = b"\x3f\xff\xff\x00"  # corrupt: concealment rollback

    def run(threads):
        os.environ["AACJAX_PARSE_THREADS"] = str(threads)
        try:
            n_slots = 3
            out = native.SpecBatchArrays(n_streams * n_slots, T)
            prev = np.zeros(n_streams * n_slots, np.int32)
            status, has_tns, _ = native.parse_batch_spec(
                payloads,
                np.full(n_streams, config.sample_index, np.int32),
                np.full(n_streams, config.chan_config, np.int32),
                np.arange(n_streams, dtype=np.int32) * n_slots,
                np.full(n_streams, n_slots, np.int32), prev, out)
            return out, status, has_tns, prev
        finally:
            del os.environ["AACJAX_PARSE_THREADS"]

    a, st_a, tns_a, prev_a = run(1)
    b, st_b, tns_b, prev_b = run(8)
    np.testing.assert_array_equal(st_a, st_b)
    assert st_a[5] != 0  # the corrupt frame was detected in both
    assert tns_a == tns_b
    np.testing.assert_array_equal(prev_a, prev_b)
    for field in ("spec", "meta", "tns_lpc", "tns_range", "cce_counts"):
        np.testing.assert_array_equal(getattr(a, field), getattr(b, field),
                                      err_msg=field)
    n_post, n_time = int(a.cce_counts[0]), int(a.cce_counts[1])
    assert n_post + n_time > 0  # arenas exercised
    # rows past the counts are uncompacted scratch; only the used prefix
    # is the contract
    for field, n in (("cce_post_idx", n_post), ("cce_post_gain", n_post),
                     ("cce_time_idx", n_time), ("cce_time_gain", n_time)):
        np.testing.assert_array_equal(getattr(a, field)[:n],
                                      getattr(b, field)[:n], err_msg=field)


@pytest.mark.parametrize("profile,frame_length,seed", [
    (2, 960, 0), (17, 1024, 1), (17, 960, 2),
    (23, 512, 3), (23, 480, 4), (39, 512, 5), (39, 480, 6)])
def test_native_er_and_frame_lengths_match_python(profile, frame_length,
                                                  seed):
    """Native parse of the ER/LD/ELD syntaxes and the non-1024 frame
    lengths is bit-identical to the python parse + device step on the
    same payloads (stereo CPE with M/S, intensity and TNS where the
    profile allows)."""
    from aacjax.runtime.batch import BatchDecoder

    cfg = parse_asc(make_asc(profile, 4, 2, frame_length=frame_length))
    rng = np.random.default_rng(9100 + seed)
    eld = profile == 39
    payloads = []
    for _ in range(4):
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
        spec = enc.CPESpec(left=left, right=right, common_window=True,
                           ms_type=ms_type, ms_used=ms_used)
        if eld:
            payloads.append(enc.write_eld_frame([("CPE", spec)], cfg))
        elif profile in (17, 23):
            payloads.append(enc.write_er_frame([("CPE", spec)], cfg))
        else:
            w = BitWriter()
            enc.write_cpe(w, spec, cfg)
            payloads.append(enc.end_frame(w))
    nat = BatchDecoder([cfg], chunk_frames=4)
    assert nat.use_native
    got = nat.stream_pcm(nat.step_raw([payloads]), 0, 4)
    assert int(nat._last_status[0]) == 0  # genuinely native, no fallback
    ref = BatchDecoder([cfg], chunk_frames=4, use_native=False)
    frames = ref.parse_stream_frames(0, payloads)
    want = ref.stream_pcm(ref.step([frames]), 0, 4)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("profile,frame_length", [(23, 512), (39, 480)])
def test_native_er_mutations_match_python_verdict(profile, frame_length):
    """Bit-flipped ER/ELD payloads: the native parser's decode-vs-reject
    verdict and concealment behavior stay consistent (finite output,
    per-stream status, no crashes)."""
    from aacjax.runtime.batch import BatchDecoder

    cfg = parse_asc(make_asc(profile, 4, 1, frame_length=frame_length))
    rng = np.random.default_rng(9500 + profile)
    def make_pay():
        spec = random_channel_spec(rng, cfg, window_sequence=0,
                                   allow_pulse=False, allow_noise=False)
        if profile == 39:
            return enc.write_eld_frame([("SCE", spec)], cfg)
        return enc.write_er_frame([("SCE", spec)], cfg)
    for _ in range(10):
        payloads = [bytearray(make_pay()) for _ in range(3)]
        for p in payloads:
            pos = int(rng.integers(0, len(p)))
            p[pos] ^= 1 << int(rng.integers(8))
        dec = BatchDecoder([cfg], chunk_frames=3)
        pcm = dec.step_raw([[bytes(p) for p in payloads]])
        assert np.isfinite(pcm).all()


@pytest.mark.parametrize("profile,frame_length", [(23, 512), (39, 480),
                                                  (2, 960)])
def test_compact_transfer_non_1024_frames(profile, frame_length):
    """Block-scaled int16 compact transfer is frame-length-generic:
    LD/ELD/960 chunks decode within the ~90 dB compact noise floor of
    the exact f32 path."""
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing.specgen import random_channel_spec

    cfg = parse_asc(make_asc(profile, 4, 1, frame_length=frame_length))
    rng = np.random.default_rng(97)
    payloads = []
    for _ in range(4):
        spec = random_channel_spec(rng, cfg, window_sequence=0,
                                   allow_pulse=False, allow_noise=False)
        payloads.append(enc.write_eld_frame([("SCE", spec)], cfg)
                        if profile == 39
                        else enc.write_er_frame([("SCE", spec)], cfg)
                        if profile in (17, 23)
                        else _sce_payload(rng, cfg))
    dec_exact = BatchDecoder([cfg], chunk_frames=4)
    assert dec_exact.use_native
    want = dec_exact.stream_pcm(dec_exact.step_raw([payloads]), 0, 4)
    dec_c = BatchDecoder([cfg], chunk_frames=4)
    got = dec_c.stream_pcm(dec_c.step_raw([payloads], compact=True), 0, 4)
    peak = max(float(np.abs(want).max()), 1e-9)
    err = float(np.abs(got - want).max()) / peak
    assert err < 1e-3, err  # well under codec quantization noise


def _sce_payload(rng, cfg):
    from aacjax.testing.specgen import random_channel_spec
    w = BitWriter()
    enc.write_sce(w, random_channel_spec(rng, cfg, window_sequence=0,
                                         allow_pulse=False,
                                         allow_noise=False), cfg)
    return enc.end_frame(w)


# ---------------------------------------------------------------------------
# Exact-i16 q/sf spectral transfer (HE-AAC fast path; VERDICT r3 #2)
# ---------------------------------------------------------------------------

def _run_native_qsf(config, payloads, n_slots):
    T = len(payloads)
    out = native.SpecBatchArrays(n_slots, T)
    prev = np.zeros(n_slots, np.int32)
    status, _, _ = native.parse_batch_spec(
        [payloads], np.array([config.sample_index], np.int32),
        np.array([config.chan_config], np.int32),
        np.array([0], np.int32), np.array([n_slots], np.int32), prev, out,
        want_qsf=True)
    return out, status


def _qsf_reconstruct(out):
    """Host replica of the device dequant (pipeline._qsf_luts gathers)."""
    from aacjax.kernels.pipeline import _qsf_luts
    iq, sfl = _qsf_luts()
    q = out.spec_q.astype(np.int32)
    m = iq[np.abs(q)]
    m = np.where(q < 0, -m, m)
    gain = np.repeat(sfl[out.spec_sf.astype(np.int32)], 4, axis=-1)
    return (m * gain).astype(np.float32)


@pytest.mark.parametrize("seed", range(12))
def test_qsf_transfer_bit_exact_mono(seed):
    """Raw quantized i16 + per-4-bin scalefactor bytes dequantize to
    EXACTLY the host-fused f32 spectra (same double-pow->f32 LUT values,
    same single f32 multiply) on PNS-free content — incl. short windows,
    TNS side info, pulse application and book-11 escapes <= 8191."""
    rng = np.random.default_rng(4200 + seed)
    config = _cfg(si=int(rng.integers(0, 13)), ch=1)
    payloads = []
    for _ in range(4):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config,
                                             allow_noise=False), config)
        payloads.append(enc.end_frame(w))
    out, status = _run_native_qsf(config, payloads, 1)
    assert status[0] == 0
    assert out.qsf_ok[0] == 1
    np.testing.assert_array_equal(_qsf_reconstruct(out), out.spec)


def test_qsf_rejects_pns_intensity_ms_cce():
    """Content the i16 q/sf representation cannot express marks the
    stream qsf_ok=0 (the caller then ships the exact f32 spectra):
    PNS bands (host noise), M/S or intensity stereo (fused on host) and
    coupling (fused f32 spectra)."""
    rng = np.random.default_rng(99)
    config = _cfg(si=4, ch=1)

    # PNS: force noise bands until one actually lands
    for attempt in range(50):
        w = BitWriter()
        spec = random_channel_spec(rng, config, allow_noise=True,
                                   allow_pulse=False)
        if not (np.asarray(spec.band_books) == 13).any():
            continue
        enc.write_sce(w, spec, config)
        out, status = _run_native_qsf(config, [enc.end_frame(w)], 1)
        assert status[0] == 0
        assert out.qsf_ok[0] == 0
        break
    else:
        pytest.fail("specgen never produced a PNS band")

    # M/S stereo
    config2 = _cfg(si=4, ch=2)
    for attempt in range(50):
        cpe = random_cpe_spec(rng, config2, common=True)
        if cpe.ms_type == 0:
            continue
        w = BitWriter()
        enc.write_cpe(w, cpe, config2)
        out, status = _run_native_qsf(config2, [enc.end_frame(w)], 2)
        assert status[0] == 0
        assert out.qsf_ok[0] == 0
        break
    else:
        pytest.fail("specgen never produced an M/S mask")

    # CCE (any coupling point forces the fused f32 chunk)
    config6 = _cfg(si=3, ch=6)
    payload = _cce_payload(rng, config6, point=0)
    out, status = _run_native_qsf(config6, [payload], 6)
    assert status[0] == 0
    assert out.qsf_ok[0] == 0


def test_qsf_device_step_matches_f32(monkeypatch):
    """BatchDecoder end to end: a chunk parsed with qsf=True decodes
    bit-identically to the exact-f32 transfer, and mixed content falls
    back transparently (still bit-identical)."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(7)
    config = _cfg(si=4, ch=2)
    clean, noisy = [], []
    for _ in range(4):
        w = BitWriter()
        from aacjax.testing.encoder import CPESpec
        left = random_channel_spec(rng, config, allow_noise=False)
        right = random_channel_spec(rng, config, allow_noise=False)
        enc.write_cpe(w, CPESpec(left=left, right=right,
                                 common_window=False, ms_type=0,
                                 ms_used=np.zeros(128, bool)), config)
        clean.append(enc.end_frame(w))
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config), config)
        noisy.append(enc.end_frame(w))

    for payloads in (clean, noisy):
        dq = BatchDecoder([config], chunk_frames=4)
        bq = dq._parse_native([payloads], qsf=True, compact=False)
        df = BatchDecoder([config], chunk_frames=4)
        bf = df._parse_native([payloads], qsf=False, compact=False)
        if payloads is clean:
            assert bq['_spec_qsf'], "clean CPE content must ride q/sf"
        got = dq.finalize_step(dq._device_step(bq, out_int16=False))
        want = df.finalize_step(df._device_step(bf, out_int16=False))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1])
def test_native_main_profile_matches_python(seed):
    """Native parse of AAC Main (AOT 1): predictor side info
    (predictor_reset groups, prediction_used bits) feeds the same
    apply_prediction device stage as the python packer — output is
    bit-identical to the python parse path on the same payloads,
    including short-window resets, TNS and CPE common-window M/S."""
    from aacjax.runtime.batch import BatchDecoder

    cfg = parse_asc(make_asc(1, 4, 2))
    rng = np.random.default_rng(9800 + seed)
    payloads = []
    for f in range(6):
        seq = 2 if f == 3 else (1 if f == 2 else (3 if f == 4 else 0))
        def chan(like=None):
            kw = {} if like is None else dict(
                max_sfb=like.max_sfb, window_shape=like.window_shape,
                grouping=like.grouping)  # common window: shared ICSInfo
            s = random_channel_spec(
                rng, cfg, window_sequence=seq,
                allow_pulse=False, allow_noise=False, **kw)
            if seq != 2:
                n = min(s.max_sfb, cfg.pred_sfb_max)
                s.pred_used = rng.integers(0, 2, n) > 0
                s.pred_reset_group = (f % 30) + 1 if f == 1 else 0
            return s
        left = chan()
        right = chan(like=left)
        ms_type = int(rng.integers(0, 2))
        ms_used = ((rng.random(128) < 0.5).astype(np.int64)
                   if ms_type == 1 else None)
        spec = enc.CPESpec(left=left, right=right, common_window=True,
                           ms_type=ms_type, ms_used=ms_used)
        w = BitWriter()
        enc.write_cpe(w, spec, cfg)
        payloads.append(enc.end_frame(w))

    nat = BatchDecoder([cfg], chunk_frames=6)
    assert nat.use_native, "Main profile must ride the native fast path"
    got = nat.stream_pcm(nat.step_raw([payloads]), 0, 6)
    assert int(nat._last_status[0]) == 0  # genuinely native, no fallback
    ref = BatchDecoder([cfg], chunk_frames=6, use_native=False)
    frames = ref.parse_stream_frames(0, payloads)
    want = ref.stream_pcm(ref.step([frames]), 0, 6)
    np.testing.assert_array_equal(got, want)


def test_native_main_intensity_falls_back():
    """Main + intensity stereo cannot ride the host-fused spec path (IS
    must read the POST-prediction left channel): the native parser
    reports ERR_FALLBACK and the runtime's python reparse still decodes
    the stream correctly end-to-end."""
    from aacjax.host import adts as adts_mod
    from aacjax import decode_adts as api_decode

    cfg = parse_asc(make_asc(1, 4, 2))
    rng = np.random.default_rng(9900)
    payloads = []
    for _f in range(3):
        left = random_channel_spec(rng, cfg, window_sequence=0,
                                   allow_pulse=False, allow_noise=False)
        right = random_channel_spec(rng, cfg, window_sequence=0,
                                    max_sfb=left.max_sfb,
                                    window_shape=left.window_shape,
                                    allow_pulse=False, allow_noise=False)
        right.band_books[0] = 15          # INTENSITY_BT
        right.band_sf[0] = 0
        right.quant[:int(cfg.swb_offsets_long[1])] = 0
        spec = enc.CPESpec(left=left, right=right, common_window=True,
                           ms_type=0)
        w = BitWriter()
        enc.write_cpe(w, spec, cfg)
        payloads.append(enc.end_frame(w))
    stream = b"".join(enc.adts_frame(p, cfg) for p in payloads)
    out, rate = api_decode(stream)
    assert np.isfinite(out).all() and out.shape == (3 * 1024, 2)
