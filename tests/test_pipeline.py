"""Device pipeline vs independent fp64 model decoder.

Every test builds real bitstreams (writer), parses them once, then decodes
the same parsed frames through (a) the batched JAX pipeline and (b) the
loop-based fp64 model.  Agreement validates the linearized window/OLA
algebra, the batched TNS scan, stereo masks, coupling, and state carry.
"""
import numpy as np
import pytest

from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitWriter
from aacjax.runtime.batch import BatchDecoder
from aacjax.testing import encoder as enc
from aacjax.testing.specgen import (random_channel_spec, random_cpe_spec,
                                    random_grouping)
from model_decoder import ModelDecoder


def _cfg(si=4, ch=1):
    return parse_asc(make_asc(2, si, ch))


def mono_payload(spec, config):
    w = BitWriter()
    enc.write_sce(w, spec, config)
    return enc.end_frame(w)


def stereo_payload(spec, config):
    w = BitWriter()
    enc.write_cpe(w, spec, config)
    return enc.end_frame(w)


def assert_close(got: np.ndarray, want: np.ndarray, rtol=2e-5):
    scale = max(1.0, float(np.max(np.abs(want))))
    err = float(np.max(np.abs(got - want)))
    assert err <= rtol * scale, f"max err {err} vs scale {scale}"


def run_both(config, payloads, n_channels, cce_slots=0):
    """Decode payloads via BatchDecoder (one chunk) and ModelDecoder."""
    dec = BatchDecoder([config], chunk_frames=len(payloads),
                       cce_slots=cce_slots)
    frames = dec.parse_stream_frames(0, payloads)
    pcm = dec.step([frames])
    got = dec.stream_pcm(pcm, 0, len(payloads))  # [T*1024, ch]

    model = ModelDecoder(config, n_channels=n_channels)
    outs = [model.decode_frame(f) for f in frames]
    want = np.concatenate(outs, axis=0)
    return got, want


@pytest.mark.parametrize("seed", range(8))
def test_mono_long_frames(seed):
    rng = np.random.default_rng(seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=1)
    payloads = [mono_payload(random_channel_spec(
        rng, config, window_sequence=0, allow_tns=False, allow_noise=False,
        allow_pulse=False), config) for _ in range(4)]
    got, want = run_both(config, payloads, 1)
    assert_close(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_mono_window_switching(seed):
    """All four sequences incl. EIGHT_SHORT with random grouping + KBD."""
    rng = np.random.default_rng(100 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=1)
    seqs = [0, 1, 2, 3, 2, 2, 0, 3]
    payloads = [mono_payload(random_channel_spec(
        rng, config, window_sequence=s, allow_tns=False, allow_noise=False,
        allow_pulse=False), config) for s in seqs]
    got, want = run_both(config, payloads, 1)
    assert_close(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_stereo_ms_is(seed):
    rng = np.random.default_rng(200 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=2)
    payloads = [stereo_payload(random_cpe_spec(rng, config), config)
                for _ in range(4)]
    got, want = run_both(config, payloads, 2)
    assert_close(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_tns(seed):
    rng = np.random.default_rng(300 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=1)
    payloads = [mono_payload(random_channel_spec(
        rng, config, force_tns=True, allow_noise=False, allow_pulse=False),
        config) for _ in range(3)]
    got, want = run_both(config, payloads, 1)
    assert_close(got, want)


@pytest.mark.parametrize("seed", range(4))
def test_pns(seed):
    rng = np.random.default_rng(400 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=1)
    payloads = [mono_payload(random_channel_spec(
        rng, config, allow_tns=False, allow_noise=True, allow_pulse=False),
        config) for _ in range(3)]
    got, want = run_both(config, payloads, 1)
    assert_close(got, want)


def test_multichannel_51():
    rng = np.random.default_rng(7)
    config = _cfg(si=3, ch=6)
    payloads = []
    for _ in range(3):
        w = BitWriter()
        enc.write_sce(w, random_channel_spec(rng, config, allow_pulse=False),
                      config, instance=0)
        enc.write_cpe(w, random_cpe_spec(rng, config), config, instance=0)
        enc.write_cpe(w, random_cpe_spec(rng, config), config, instance=1)
        enc.write_sce(w, random_channel_spec(
            rng, config, window_sequence=0, allow_tns=False,
            allow_noise=False, allow_pulse=False), config, instance=1,
            lfe=True)
        payloads.append(enc.end_frame(w))
    got, want = run_both(config, payloads, 6)
    assert_close(got, want)


@pytest.mark.parametrize("point", [0, 1, 2])
def test_cce_coupling(point):
    """Dependent (before/after TNS) and independent (after IMDCT) coupling
    onto a CPE, with per-band and common gains."""
    rng = np.random.default_rng(50 + point)
    config = _cfg(si=4, ch=2)
    payloads = []
    for _ in range(3):
        w = BitWriter()
        cpe = random_cpe_spec(rng, config, common=True)
        enc.write_cpe(w, cpe, config, instance=0)
        cce_ics = random_channel_spec(rng, config, window_sequence=0,
                                      allow_tns=False, allow_noise=False,
                                      allow_pulse=False)
        n_coded = int(np.count_nonzero(cce_ics.band_books))
        spec = enc.CCESpec(
            ics=cce_ics, coupling_point=point,
            targets=[(1, 0, 3)],  # couple both channels of CPE 0, two gains
            sign=int(rng.integers(0, 2)), scale_idx=1,
            gain_lists=[(0 if point != 2 else 1, 3,
                         [int(rng.integers(-3, 4)) for _ in range(n_coded)])])
        enc.write_cce(w, spec, config, instance=0)
        payloads.append(enc.end_frame(w))
    got, want = run_both(config, payloads, 2, cce_slots=1)
    assert_close(got, want)


def test_batched_vs_single_invariance():
    """Decoding a stream alone must equal decoding it inside a batch with
    other streams (SURVEY.md §4)."""
    rng = np.random.default_rng(99)
    config = _cfg(si=4, ch=2)
    streams = []
    for _s in range(3):
        payloads = [stereo_payload(random_cpe_spec(rng, config), config)
                    for _ in range(3)]
        streams.append(payloads)

    # together
    dec = BatchDecoder([config] * 3, chunk_frames=3)
    frames = [dec.parse_stream_frames(i, p) for i, p in enumerate(streams)]
    pcm = dec.step(frames)
    together = [dec.stream_pcm(pcm, i, 3) for i in range(3)]

    # alone — XLA may tile the IMDCT matmul differently for different batch
    # shapes, so exact bitwise equality is not guaranteed; require
    # float32-epsilon-level agreement.
    for i, payloads in enumerate(streams):
        solo = BatchDecoder([config], chunk_frames=3)
        f = solo.parse_stream_frames(0, payloads)
        alone = solo.stream_pcm(solo.step([f]), 0, 3)
        scale = max(1.0, float(np.abs(together[i]).max()))
        np.testing.assert_allclose(alone, together[i], atol=1e-6 * scale)


def test_state_carry_across_chunks():
    """Splitting a stream into multiple step() calls must give identical
    PCM to one big chunk (overlap + window-shape state carry)."""
    rng = np.random.default_rng(123)
    config = _cfg(si=4, ch=1)
    specs = [random_channel_spec(rng, config, window_sequence=s,
                                 allow_pulse=False)
             for s in [0, 1, 2, 3, 2, 0]]
    payloads = [mono_payload(s, config) for s in specs]

    big = BatchDecoder([config], chunk_frames=6)
    frames = big.parse_stream_frames(0, payloads)
    want = big.stream_pcm(big.step([frames]), 0, 6)

    small = BatchDecoder([config], chunk_frames=2)
    outs = []
    for i in range(0, 6, 2):
        f = small.parse_stream_frames(0, payloads[i:i + 2])
        outs.append(small.stream_pcm(small.step([f]), 0, 2))
    got = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(got, want, atol=1e-7 * max(
        1.0, float(np.abs(want).max())))


def test_partial_chunk_padding():
    """A chunk with fewer frames than T must not corrupt stream state."""
    rng = np.random.default_rng(321)
    config = _cfg(si=4, ch=1)
    payloads = [mono_payload(random_channel_spec(
        rng, config, allow_pulse=False), config) for _ in range(5)]

    ref = BatchDecoder([config], chunk_frames=5)
    frames = ref.parse_stream_frames(0, payloads)
    want = ref.stream_pcm(ref.step([frames]), 0, 5)

    dec = BatchDecoder([config], chunk_frames=4)
    f1 = dec.parse_stream_frames(0, payloads[:3])   # 3 of 4 slots used
    out1 = dec.stream_pcm(dec.step([f1]), 0, 3)
    f2 = dec.parse_stream_frames(0, payloads[3:])
    out2 = dec.stream_pcm(dec.step([f2]), 0, 2)
    got = np.concatenate([out1, out2], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-7 * max(
        1.0, float(np.abs(want).max())))
