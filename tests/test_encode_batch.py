"""TPU-batched encoder (aacjax/encode_batch.py): device analysis
(MDCT / band energies / psy / quant trials / Huffman-cost grid), host
rate choice + bitstream write.  The reference has no encoder at all."""
import numpy as np
import pytest

from aacjax import decode_adts
from aacjax.encode_batch import BatchEncoder, OFF_GRID
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.encoder import adts_frame

SR = 44100
HAVE_ORACLE = ffmpeg_oracle.available()


def _stream_of(enc, chunks_out, s):
    payloads = [p for o in chunks_out for p in o[s]]
    return b"".join(adts_frame(p, enc.config) for p in payloads)


def _snr(ref, got):
    err = got[: len(ref)] - ref[: len(got)]
    n = min(len(ref), len(got))
    return 10 * np.log10((ref[:n] ** 2).mean()
                         / max((err[:n] ** 2).mean(), 1e-12))


def test_roundtrip_rate_and_quality():
    """3 chunks of stereo tones+noise: decodes through aacjax with
    sensible SNR once the bit-estimate calibration warms, and the
    realized rate lands near the target."""
    n = 1024 * 24
    t = np.arange(n) / SR
    rng = np.random.default_rng(3)
    x = np.stack([8000 * np.sin(2 * np.pi * 440 * t),
                  8000 * np.sin(2 * np.pi * 660 * t)], axis=1)
    x += 400 * rng.standard_normal(x.shape)

    enc = BatchEncoder(SR, 2, 128_000, n_streams=1)
    outs = [enc.encode_chunk(x[None, i * 8192:(i + 1) * 8192])
            for i in range(3)]
    stream = _stream_of(enc, outs, 0)
    kbps = len(stream) * 8 / (n / SR) / 1000
    assert 70 < kbps < 180, kbps          # target 128 +- the reservoir
    out, rate = decode_adts(stream)
    assert rate == SR
    ref = x[8192: out.shape[0] - 1024]
    got = (out[1024:] * 32768)[8192: 8192 + len(ref)]
    assert _snr(ref, got) > 18.0


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
def test_oracle_accepts_and_matches():
    """libavcodec decodes the batched-encoder bitstream and agrees with
    aacjax's decode of the same stream (decode-side conformance)."""
    n = 1024 * 8
    t = np.arange(n) / SR
    x = np.stack([7000 * np.sin(2 * np.pi * 523 * t),
                  7000 * np.sin(2 * np.pi * 1046 * t)], axis=1)
    enc = BatchEncoder(SR, 2, 128_000, n_streams=1)
    outs = [enc.encode_chunk(x[None])]
    stream = _stream_of(enc, outs, 0)
    mine, rate = decode_adts(stream)
    ref, rrate = ffmpeg_oracle.decode_adts(stream)
    assert rate == rrate == SR
    m = min(len(mine), len(ref))
    assert np.abs(mine[:m] - ref[:m]).max() < 1e-3   # both full-scale ~1


def test_transients_use_short_windows():
    """A hard attack plans EIGHT_SHORT (with the legal START/STOP
    transitions around it) and still round-trips."""
    n = 1024 * 8
    rng = np.random.default_rng(5)
    x = 500 * rng.standard_normal((n, 1))
    x[4000:4200] += 18000
    enc = BatchEncoder(SR, 1, 96_000, n_streams=1)
    outs = [enc.encode_chunk(x[None])]
    assert (enc._prev_seq >= 0).all()
    # the plan stored per frame: reconstruct from the written payloads
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.host.bitio import BitReader
    from aacjax.host.syntax import decode_frame
    cfg = enc.config
    seqs = []
    for p in outs[0][0]:
        f = decode_frame(BitReader(p), cfg, [0])
        seqs.append(f.elements[0].ics.info.window_sequence)
    assert 2 in seqs                       # EIGHT_SHORT engaged
    i = seqs.index(2)
    if i > 0:
        assert seqs[i - 1] in (1, 2)       # legal predecessor
    stream = _stream_of(enc, outs, 0)
    out, _ = decode_adts(stream)
    assert np.isfinite(out).all()


def test_multistream_matches_single():
    """Encoding S streams in one batch is bit-identical to encoding each
    alone (per-stream state isolation; CPU backend is bitwise)."""
    n = 1024 * 8
    rng = np.random.default_rng(7)
    t = np.arange(n) / SR
    pcm = np.zeros((3, n, 2))
    for s in range(3):
        f0 = 300.0 * (s + 1)
        pcm[s] = np.stack([6000 * np.sin(2 * np.pi * f0 * t),
                           6000 * np.sin(2 * np.pi * 1.5 * f0 * t)],
                          axis=1)
        pcm[s] += 300 * rng.standard_normal((n, 2))

    enc_b = BatchEncoder(SR, 2, 128_000, n_streams=3)
    batch_out = enc_b.encode_chunk(pcm)
    for s in range(3):
        enc_1 = BatchEncoder(SR, 2, 128_000, n_streams=1)
        solo = enc_1.encode_chunk(pcm[s][None])
        assert batch_out[s] == solo[0]


def test_chunk_boundary_window_chain():
    """An attack straddling the chunk boundary keeps the window-sequence
    chain legal across encode_chunk calls (left half mirrors the
    predecessor's right half) and the decode stays clean."""
    n = 1024 * 8
    rng = np.random.default_rng(9)
    x = 400 * rng.standard_normal((2 * n, 1))
    x[n - 300: n - 100] += 15000        # attack at the boundary
    enc = BatchEncoder(SR, 1, 96_000, n_streams=1)
    outs = [enc.encode_chunk(x[None, :n]), enc.encode_chunk(x[None, n:])]
    stream = _stream_of(enc, outs, 0)
    out, _ = decode_adts(stream)
    assert np.isfinite(out).all()
    # no gross discontinuity artifact at the boundary region
    seg = out[n - 2048: n + 2048] * 32768
    assert np.abs(seg).max() < 32768 * 1.5


def _mixed_pcm(n_streams, n):
    t = np.arange(n) / SR
    rng = np.random.default_rng(17)
    pcm = np.empty((n_streams, n, 2), np.float32)
    for s in range(n_streams):
        x = (7000 * np.sin(2 * np.pi * (300 + 70 * s) * t)
             + 500 * rng.standard_normal(n))
        # a click per stream so short windows appear mid-run
        x[n // 2: n // 2 + 64] += 15000
        pcm[s, :, 0] = x
        pcm[s, :, 1] = 0.8 * np.roll(x, 31)
    return pcm


@pytest.mark.parametrize("duplex", [False, True])
def test_pipelined_matches_sequential(duplex):
    """encode_pipelined yields byte-identical payloads, in order, to
    sequential encode_chunk calls on a fresh encoder — the reservoir /
    calibration chain advances identically because the down worker is
    single-threaded."""
    S, chunk, n_chunks = 3, 4 * 1024, 4
    pcm = _mixed_pcm(S, chunk * n_chunks)
    chunks = [pcm[:, k * chunk:(k + 1) * chunk] for k in range(n_chunks)]

    seq = BatchEncoder(SR, 2, 96_000, n_streams=S)
    want = [seq.encode_chunk(c) for c in chunks]

    pipe = BatchEncoder(SR, 2, 96_000, n_streams=S)
    got = list(pipe.encode_pipelined(iter(chunks), duplex=duplex))

    assert len(got) == len(want)
    for k, (w, g) in enumerate(zip(want, got)):
        for s in range(S):
            assert w[s] == g[s], (k, s)
    assert np.allclose(seq._reservoir, pipe._reservoir)
    assert np.allclose(seq._est_ratio, pipe._est_ratio)


def test_packed_q_d2h_matches_full_width():
    """The coded-region D2H packing (_quantize_fn w8 < 128 + host
    _unpack_q) is byte-identical to shipping the full [N, 1024] q
    planes: bins beyond the rate cutoff never reach the writer."""
    from aacjax.encode_batch import FRAME, _jitted_quantize

    S, n = 2, 1024 * 6
    pcm = _mixed_pcm(S, n)                 # clicks force short windows

    enc = BatchEncoder(SR, 2, 96_000, n_streams=S)
    assert enc._w8 < FRAME // 8            # packing actually engages
    want = enc.encode_chunk(pcm)

    full = BatchEncoder(SR, 2, 96_000, n_streams=S)
    full._w8 = FRAME // 8
    full._quantize = _jitted_quantize(FRAME // 8)
    got = full.encode_chunk(pcm)

    for s in range(S):
        assert want[s] == got[s]


def test_pipelined_single_chunk_and_empty():
    """Pipeline drain paths: zero and one chunk."""
    S = 2
    enc = BatchEncoder(SR, 2, 96_000, n_streams=S)
    assert list(enc.encode_pipelined(iter([]))) == []
    pcm = _mixed_pcm(S, 2 * 1024)
    ref = BatchEncoder(SR, 2, 96_000, n_streams=S).encode_chunk(pcm)
    out = list(enc.encode_pipelined(iter([pcm])))
    assert len(out) == 1
    for s in range(S):
        assert out[0][s] == ref[s]
