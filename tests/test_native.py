"""Native C++ parser vs Python parser: dense outputs must match exactly."""
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


def python_reference_arrays(config, payloads, n_slots, T):
    """Parse via the Python path and pack into the same dense layout."""
    prev = [0] * n_slots
    frames = []
    for p in payloads:
        f = decode_frame(BitReader(p), config, prev)
        # update prev shapes the way BatchDecoder does
        ch_i = 0
        for e in f.elements:
            infos = ([e.ics.info] if hasattr(e, 'ics')
                     else [e.left.info, e.right.info])
            for info in infos:
                prev[ch_i] = info.window_shape
                ch_i += 1
        frames.append(f)
    batch, flags = pack_frames([(0, frames)], n_slots, T)
    return batch, flags


def compare(config, payloads, n_slots, seed_info=""):
    T = len(payloads)
    out = native.ChunkArrays(n_slots, T)
    prev_shapes = np.zeros(n_slots, np.int32)
    info = native.parse_chunk(payloads, config.sample_index,
                              config.chan_config, prev_shapes, out)
    batch, flags = python_reference_arrays(config, payloads, n_slots, T)

    np.testing.assert_array_equal(out.quant, batch['quant'], err_msg=seed_info)
    np.testing.assert_array_equal(out.scale, batch['scale'], err_msg=seed_info)
    np.testing.assert_array_equal(out.noise, batch['noise'], err_msg=seed_info)
    np.testing.assert_array_equal(out.meta[:, :, 0], batch['f_idx'])
    np.testing.assert_array_equal(out.meta[:, :, 1], batch['s_idx'])
    np.testing.assert_array_equal(out.meta[:, :, 4],
                                  batch['is_short'].astype(np.int32))
    assert info['has_tns'] == flags.has_tns
    if flags.has_tns:
        np.testing.assert_array_equal(out.tns_lpc[:, :, 0], batch['tns_fwd_lpc'])
        np.testing.assert_array_equal(out.tns_lpc[:, :, 1], batch['tns_rev_lpc'])
        np.testing.assert_array_equal(out.tns_range[:, :, 0, :, 0],
                                      batch['tns_fwd_start'])
        np.testing.assert_array_equal(out.tns_range[:, :, 0, :, 1],
                                      batch['tns_fwd_end'])
        np.testing.assert_array_equal(out.tns_range[:, :, 1, :, 0],
                                      batch['tns_rev_start'])
        np.testing.assert_array_equal(out.tns_range[:, :, 1, :, 1],
                                      batch['tns_rev_end'])
    # stereo masks: python pack stacks pairs in first-seen order, same as C
    n_pairs = info['n_pairs']
    if n_pairs:
        np.testing.assert_array_equal(
            out.pair_slots[:n_pairs, 0], batch['pair_l'][:n_pairs])
        np.testing.assert_array_equal(
            out.pair_slots[:n_pairs, 1], batch['pair_r'][:n_pairs])
        np.testing.assert_array_equal(out.ms_mask[:n_pairs],
                                      batch['ms_mask'][:n_pairs])
        np.testing.assert_array_equal(out.is_scale[:n_pairs],
                                      batch['is_scale'][:n_pairs])
    return info


@pytest.mark.parametrize("seed", range(20))
def test_native_mono_matches_python(seed):
    rng = np.random.default_rng(seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=1)
    payloads = []
    for _ in range(4):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config), config)
        payloads.append(enc.end_frame(w))
    compare(config, payloads, 1, f"seed={seed}")


@pytest.mark.parametrize("seed", range(20))
def test_native_stereo_matches_python(seed):
    rng = np.random.default_rng(1000 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=2)
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


def test_native_cce_falls_back():
    rng = np.random.default_rng(3)
    config = _cfg(si=4, ch=2)
    w = BitWriter()
    cpe = random_cpe_spec(rng, config, common=True)
    enc.write_cpe(w, cpe, config)
    ics = random_channel_spec(rng, config, window_sequence=0,
                              allow_tns=False, allow_noise=False,
                              allow_pulse=False)
    enc.write_cce(w, enc.CCESpec(ics=ics, coupling_point=0,
                                 targets=[(1, 0, 3)],
                                 gain_lists=[(1, 2, [])]), config)
    payload = enc.end_frame(w)
    out = native.ChunkArrays(3, 1)
    with pytest.raises(native.NeedsPythonFallback):
        native.parse_chunk([payload], config.sample_index, config.chan_config,
                           np.zeros(3, np.int32), out)


def test_native_error_reporting():
    config = _cfg(si=4, ch=1)
    out = native.ChunkArrays(1, 1)
    with pytest.raises(native.NativeParseError) as ei:
        native.parse_chunk([b"\xff\xff\xff\xff"], config.sample_index,
                           config.chan_config, np.zeros(1, np.int32), out)
    assert ei.value.frame == 0


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
    # prev-shape state must agree too
    for a, b in zip(dn.streams, dp.streams):
        np.testing.assert_array_equal(a.prev_shapes, b.prev_shapes)


def test_step_raw_error_isolation():
    """A corrupt stream inside a batch must not poison the others."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(11)
    config = _cfg(si=4, ch=2)
    good1 = _mk_payloads(rng, config, 3)
    bad = [b"\x00\x01\x02\x03"]  # SCE with nonsense content
    good2 = _mk_payloads(rng, config, 3)

    dec = BatchDecoder([config] * 3, chunk_frames=3, use_native=True)
    pcm = dec.step_raw([good1, bad, good2])
    assert dec.streams[1].failed
    assert not dec.streams[0].failed and not dec.streams[2].failed

    solo = BatchDecoder([config], chunk_frames=3, use_native=True)
    pcm_solo = solo.step_raw([good1])
    scale = max(1.0, float(np.abs(pcm_solo).max()))
    np.testing.assert_allclose(pcm[0:2], pcm_solo[0:2], atol=1e-6 * scale)


def test_step_raw_cce_fallback_correct():
    """A chunk containing CCE falls back to the Python path transparently."""
    from aacjax.runtime.batch import BatchDecoder
    rng = np.random.default_rng(9)
    config = _cfg(si=4, ch=2)
    payloads = []
    for _ in range(2):
        w = BitWriter()
        cpe = random_cpe_spec(rng, config, common=True)
        enc.write_cpe(w, cpe, config)
        ics = random_channel_spec(rng, config, window_sequence=0,
                                  allow_tns=False, allow_noise=False,
                                  allow_pulse=False)
        enc.write_cce(w, enc.CCESpec(ics=ics, coupling_point=1,
                                     targets=[(1, 0, 0)],
                                     gain_lists=[(1, 2, [])]), config)
        payloads.append(enc.end_frame(w))

    dn = BatchDecoder([config], chunk_frames=2, cce_slots=1, use_native=True)
    pcm_native_path = dn.step_raw([payloads])

    dp = BatchDecoder([config], chunk_frames=2, cce_slots=1, use_native=False)
    frames = [dp.parse_stream_frames(0, payloads)]
    pcm_python = dp.step(frames)
    np.testing.assert_allclose(pcm_native_path, pcm_python, atol=1e-7)


def test_decode_pipelined_matches_step_raw():
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
        ([p[i:i + 3] for p in streams] for i in (0, 3)), out_int16=True))
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
