"""Adversarial robustness: random garbage and mutated bitstreams must
produce clean per-stream errors (or valid decodes), never crashes,
corruption of other streams, or unbounded loops."""
import numpy as np
import pytest

from aacjax.host import native
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitstreamError, BitWriter
from aacjax.host.syntax import decode_frame
from aacjax.runtime.batch import BatchDecoder
from aacjax.testing import encoder as enc
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec


def _cfg(si=4, ch=2):
    return parse_asc(make_asc(2, si, ch))


@pytest.mark.parametrize("seed", range(20))
def test_python_parser_survives_garbage(seed):
    rng = np.random.default_rng(seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=2)
    data = rng.integers(0, 256, size=int(rng.integers(4, 600))).astype(
        np.uint8).tobytes()
    try:
        decode_frame(BitReader(data), config, [0, 0])
    except BitstreamError:
        pass
    except Exception as e:  # noqa: BLE001
        # only structured bitstream/unsupported errors are acceptable
        from aacjax.host.asc import UnsupportedError
        assert isinstance(e, UnsupportedError), type(e)


@pytest.mark.skipif(not native.available(), reason="native parser not built")
@pytest.mark.parametrize("seed", range(20))
def test_native_parser_survives_garbage(seed):
    rng = np.random.default_rng(1000 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=2)
    payloads = [rng.integers(0, 256, size=int(rng.integers(4, 600))).astype(
        np.uint8).tobytes() for _ in range(3)]
    out = native.SpecBatchArrays(2, 3)
    status, _, _err = native.parse_batch_spec(
        [payloads], np.array([config.sample_index], np.int32),
        np.array([2], np.int32), np.array([0], np.int32),
        np.array([2], np.int32), np.zeros(2, np.int32), out)
    # whatever happened, outputs stay finite and the call returned
    assert np.isfinite(out.spec).all()


@pytest.mark.skipif(not native.available(), reason="native parser not built")
@pytest.mark.parametrize("seed", range(15))
def test_native_parser_survives_mutations(seed):
    """Random bit flips in valid streams: either decodes (finite) or fails
    with a per-stream status, matching the python parser's verdict on
    crash-vs-decode for the same bytes."""
    rng = np.random.default_rng(2000 + seed)
    config = _cfg(si=4, ch=2)
    w = BitWriter()
    enc.write_cpe(w, random_cpe_spec(rng, config), config)
    payload = bytearray(enc.end_frame(w))
    for _ in range(int(rng.integers(1, 6))):
        payload[rng.integers(0, len(payload))] ^= 1 << rng.integers(0, 8)
    payload = bytes(payload)

    out = native.SpecBatchArrays(2, 1)
    status, _, _err = native.parse_batch_spec(
        [[payload]], np.array([4], np.int32), np.array([2], np.int32),
        np.array([0], np.int32), np.array([2], np.int32),
        np.zeros(2, np.int32), out)
    assert np.isfinite(out.spec).all()
    assert np.isfinite(out.tns_lpc).all()


@pytest.mark.skipif(not native.available(), reason="native parser not built")
def test_corrupt_stream_cannot_poison_batch():
    """Fuzzed streams decode alongside a good stream in the same chunk;
    the good stream's output must be exactly its solo decode."""
    rng = np.random.default_rng(3)
    config = _cfg(si=4, ch=2)
    good = []
    for _ in range(2):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config), config)
        good.append(enc.end_frame(w))

    garbage = [rng.integers(0, 256, size=200).astype(np.uint8).tobytes()
               for _ in range(2)]

    both = BatchDecoder([config] * 2, chunk_frames=2, use_native=True)
    pcm = both.step_raw([good, garbage])
    solo = BatchDecoder([config], chunk_frames=2, use_native=True)
    want = solo.step_raw([good])
    import jax
    if jax.default_backend() == "cpu":
        # identical float op order -> bitwise equality
        np.testing.assert_array_equal(pcm[:2], want[:2])
    else:
        # accelerators may tile the [4,*] and [2,*] batch matmuls
        # differently; the isolation guarantee is near-exactness
        peak = max(float(np.abs(want[:2]).max()), 1e-9)
        assert float(np.abs(pcm[:2] - want[:2]).max()) / peak < 1e-5


@pytest.mark.parametrize("seed", range(12))
def test_he_aac_survives_mutations(seed):
    """Bit-flipped HE-AAC v1/v2 streams (flips aimed at the SBR FIL /
    ps_data region) must decode, conceal, or raise a clean error — no
    crashes, NaNs in delivered PCM, or unbounded loops."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_ps import make_ps_stream, PSSpec
    from test_sbr import make_he_stream
    from aacjax.api import UnsupportedError, decode_adts

    rng = np.random.default_rng(seed)
    if seed % 2:
        stream = bytearray(make_he_stream(ch=1, n_frames=4, seed=seed))
    else:
        nr = 10
        stream = bytearray(make_ps_stream(PSSpec(
            iid_mode=0, iid_par=rng.integers(-7, 8, (1, nr))), n_frames=4,
            seed=seed))
    # flip a handful of bits in the back half of random frames (the SBR
    # FIL extension rides at the frame tail)
    for _ in range(4):
        pos = int(rng.integers(len(stream) // 2, len(stream)))
        stream[pos] ^= 1 << int(rng.integers(8))
    try:
        pcm, rate = decode_adts(bytes(stream), on_error="skip")
        assert np.isfinite(pcm).all()
    except (BitstreamError, UnsupportedError):
        pass


def test_ps_parser_survives_garbage():
    """Random bytes through read_ps_data: clean BitstreamError or a
    parsed struct, never a crash."""
    from aacjax.host.bitio import BitstreamUnderflow
    from aacjax.host.ps import PSContext, read_ps_data
    for seed in range(50):
        rng = np.random.default_rng(1000 + seed)
        data = rng.integers(0, 256, size=int(rng.integers(2, 40))).astype(
            np.uint8).tobytes()
        ctx = PSContext()
        ctx.header_seen = bool(seed % 2)
        try:
            read_ps_data(BitReader(data), ctx, len(data) * 8)
        except (BitstreamError, BitstreamUnderflow):
            pass


@pytest.mark.parametrize("seed", range(10))
def test_loas_survives_mutations(seed):
    """Bit-flipped LOAS streams decode, conceal, or raise cleanly."""
    from aacjax import decode_loas
    from aacjax.host.asc import UnsupportedError
    from aacjax.host.bitio import BitstreamUnderflow
    from aacjax.testing.encoder import loas_stream
    from aacjax.testing.specgen import random_cpe_spec

    rng = np.random.default_rng(2000 + seed)
    config = _cfg(si=4, ch=2)
    payloads = []
    for _ in range(5):
        w = BitWriter()
        enc.write_cpe(w, random_cpe_spec(rng, config, common=True), config)
        payloads.append(enc.end_frame(w))
    stream = bytearray(loas_stream(payloads, config,
                                   subframes=1 if seed % 2 else 5))
    for _ in range(3):
        pos = int(rng.integers(0, len(stream)))
        stream[pos] ^= 1 << int(rng.integers(8))
    try:
        pcm, _ = decode_loas(bytes(stream), on_error="skip")
        assert np.isfinite(pcm).all()
    except (BitstreamError, BitstreamUnderflow, UnsupportedError):
        pass


@pytest.mark.parametrize("seed", range(10))
def test_eld_survives_mutations(seed):
    """Bit-flipped AAC-ELD LOAS streams (tagless ER layout, low-delay
    filterbank) decode, conceal, or raise cleanly."""
    from aacjax import decode_loas
    from aacjax.host.asc import UnsupportedError
    from aacjax.host.bitio import BitstreamUnderflow
    from aacjax.testing.encoder import loas_stream, write_eld_frame

    rng = np.random.default_rng(7000 + seed)
    config = parse_asc(make_asc(39, 4, 1,
                                frame_length=480 if seed % 2 else 512))
    payloads = [write_eld_frame(
        [("SCE", random_channel_spec(rng, config, window_sequence=0,
                                     allow_pulse=False,
                                     allow_noise=False))], config)
        for _ in range(4)]
    stream = bytearray(loas_stream(payloads, config))
    for _ in range(3):
        pos = int(rng.integers(0, len(stream)))
        stream[pos] ^= 1 << int(rng.integers(8))
    try:
        pcm, _ = decode_loas(bytes(stream), on_error="skip")
        assert np.isfinite(pcm).all()
    except (BitstreamError, BitstreamUnderflow, UnsupportedError):
        pass
