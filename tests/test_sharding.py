"""Multi-device sharding tests on an 8-virtual-device CPU mesh.

Run via scripts/test_cpu.sh (sets XLA_FLAGS for 8 virtual devices);
auto-skips on single-device backends — the driver validates the
multi-chip path separately through __graft_entry__.dryrun_multichip.
"""
import numpy as np
import pytest

import jax

import __graft_entry__ as graft
from aacjax.runtime import mesh as meshlib

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (use scripts/test_cpu.sh)")


@needs_mesh
def test_sharded_matches_single_device():
    """Decode the same chunk on a ('stream','frame') mesh and on one
    device; results must agree to f32 tolerance."""
    batch, overlap, flags = graft._example_chunk(n_streams=4, T=4)

    from aacjax.kernels.pipeline import jitted_decode_step
    pcm_single, ov_single = jitted_decode_step(flags)(batch, overlap.copy())

    m = meshlib.make_mesh(4, 2)
    step = meshlib.sharded_decode_step(flags, m)
    sharded = meshlib.shard_batch(m, batch)
    ov = jax.device_put(overlap.copy(), jax.sharding.NamedSharding(
        m, jax.sharding.PartitionSpec("stream", None)))
    pcm_mesh, ov_mesh = step(sharded, ov)

    scale = max(1.0, float(np.abs(np.asarray(pcm_single)).max()))
    np.testing.assert_allclose(np.asarray(pcm_mesh),
                               np.asarray(pcm_single), atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(ov_mesh), np.asarray(ov_single),
                               atol=1e-5 * scale)


@needs_mesh
def test_dryrun_multichip():
    graft.dryrun_multichip(8)


@needs_mesh
def test_sharded_spec_path_matches_single_device():
    """The PRODUCTION serving path — native-packed decode_spec_step with
    compact int16 spectra, TNS side info and concealment masks — must
    decode identically jitted over the ('stream','frame') mesh and on a
    single device, including the overlap carry across two chunks and a
    corrupt stream whose concealment masks ride the sharded batch."""
    from aacjax.host import native
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.host.bitio import BitWriter
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing import encoder as enc
    from aacjax.testing.specgen import random_cpe_spec

    if not native.available():
        pytest.skip("native parser not built")

    rng = np.random.default_rng(5)
    config = parse_asc(make_asc(2, 4, 2))
    n_stream, T, n_chunks = 4, 4, 2
    chunks = []
    for _k in range(n_chunks):
        per_stream = []
        for _i in range(n_stream):
            payloads = []
            for _t in range(T):
                w = BitWriter()
                enc.write_cpe(w, random_cpe_spec(rng, config, common=True),
                              config)
                payloads.append(enc.end_frame(w))
            per_stream.append(payloads)
        chunks.append(per_stream)
    # corrupt stream 2's second payload in chunk 0: its frames from t=1 on
    # conceal to silence; other streams must be unaffected on both paths
    chunks[0][2][1] = b"\x00\x41"  # SCE element truncated mid-header

    def run(step):
        dec = BatchDecoder([config] * n_stream, chunk_frames=T,
                           use_native=True)
        outs = []
        for c in chunks:
            batch = dec._parse_native(c, compact=True)
            outs.append(np.asarray(dec.finalize_step(step(dec, batch))))
        return dec, outs

    dec_ref, ref = run(lambda d, b: d._device_step(b, out_int16=False))
    m = meshlib.make_mesh(n_stream, 2)
    dec_mesh, got = run(lambda d, b: d._device_step_sharded(b, m))

    assert dec_ref.streams[2].failed and dec_mesh.streams[2].failed
    for r, g in zip(ref, got):
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(g, r, atol=1e-5 * scale)


@needs_mesh
@pytest.mark.parametrize("use_native", [False, True])
def test_sharded_he_sbr_matches_single_device(use_native):
    """HE-AAC multi-chip serving: step_he_raw over a stream-only mesh —
    the core spectral step AND the chained batched SBR program both
    jitted over the mesh with every slot-leading plane and QMF/synthesis
    state FIFO sharded P('stream') — equals the single-device path
    across a chunk boundary (state carried sharded via donation)."""
    from aacjax.host import adts, native
    from aacjax.host.asc import parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from test_sbr import make_he_stream

    if use_native and not native.available():
        pytest.skip("native parser not built")
    stream = make_he_stream(ch=2, n_frames=6, invf=1, num_env=2)
    frames = adts.split_frames(stream)
    config = parse_asc(adts.synthesize_cookie(frames[0][0]))
    payloads = [stream[s:e] for _, s, e in frames]

    def run(mesh):
        dec = BatchDecoder([config, config], chunk_frames=3,
                           use_native=use_native)
        return [np.asarray(dec.step_he_raw([payloads[lo:lo + 3]] * 2,
                                           mesh=mesh))
                for lo in (0, 3)]

    want = run(None)
    got = run(meshlib.make_mesh(4, 1))
    for w, g in zip(want, got):
        scale = max(1e-9, float(np.abs(w).max()))
        np.testing.assert_allclose(g, w, atol=1e-5 * scale)


@needs_mesh
def test_sharded_he_ps_matches_single_device():
    """HE-AAC v2: the combined SBR + Parametric Stereo program sharded
    over the stream mesh — including the mono-source -> stereo-output
    slot routing gather, which stays shard-local because the pair slot
    is adjacent to its source — equals single-device, with PS delay /
    allpass / synthesis state carried across a chunk boundary."""
    from test_ps import _ICC10, _RAMP10, make_ps_stream
    from aacjax.host import adts
    from aacjax.host.asc import parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing.sbr_encoder import PSSpec

    ps = PSSpec(iid_mode=0, num_env=2,
                iid_par=np.stack([_RAMP10, -_RAMP10]),
                icc_mode=0, icc_par=np.stack([_ICC10, _ICC10[::-1]]),
                ipd_par=((np.arange(5) * 3) % 8)[None].repeat(2, 0),
                opd_par=(np.arange(5) % 8)[None].repeat(2, 0))
    stream = make_ps_stream(ps)
    frames = adts.split_frames(stream)
    config = parse_asc(adts.synthesize_cookie(frames[0][0]))
    payloads = [stream[s:e] for _, s, e in frames][:6]

    def run(mesh):
        dec = BatchDecoder([config, config], chunk_frames=3, cce_slots=1)
        return [np.asarray(dec.step_he_raw([payloads[lo:lo + 3]] * 2,
                                           mesh=mesh))
                for lo in (0, 3)]

    want = run(None)
    got = run(meshlib.make_mesh(4, 1))
    for w, g in zip(want, got):
        scale = max(1e-9, float(np.abs(w).max()))
        np.testing.assert_allclose(g, w, atol=1e-5 * scale)


@needs_mesh
def test_decode_pipelined_sharded_matches_single_device():
    """The FULL multi-chip serving loop: decode_pipelined(mesh=...) runs
    the 3-stage pipeline with sharded H2D and the mesh-jitted production
    spec step; chunks must equal the single-device generator, including
    a mid-iteration slot recycle deferred to a chunk boundary."""
    from aacjax.host import native
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing.streams import make_lc_payload_chunks

    if not native.available():
        pytest.skip("native parser not built")
    configs, chunks = make_lc_payload_chunks(
        n_streams=4, chunk_frames=4, n_chunks=3, seed=7)

    def run(mesh):
        dec = BatchDecoder(configs, chunk_frames=4, use_native=True)
        out = []
        gen = dec.decode_pipelined(iter(chunks), out_int16=True, mesh=mesh)
        for k, pcm in enumerate(gen):
            out.append(np.asarray(pcm).copy())
            if k == 0:
                dec.request_reset(1, configs[1])
        return out

    want = run(None)
    got = run(meshlib.make_mesh(4, 2))
    assert len(want) == len(got) == 3
    for w, g in zip(want, got):
        # int16 PCM: f32 reduction-order differences across shardings can
        # flip a rounding boundary by at most 1 LSB
        np.testing.assert_allclose(g.astype(np.int32),
                                   w.astype(np.int32), atol=1)


@needs_mesh
def test_decode_he_pipelined_sharded_matches_single_device():
    """HE-AAC multi-chip serving loop: decode_he_pipelined(mesh=...)
    equals the single-device generator across chunks (SBR state FIFOs
    carried sharded through the overlapped device half)."""
    from aacjax.host import adts, native
    from aacjax.host.asc import parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from test_sbr import make_he_stream

    if not native.available():
        pytest.skip("native parser not built")
    stream = make_he_stream(ch=2, n_frames=6, invf=1, num_env=2)
    frames = adts.split_frames(stream)
    config = parse_asc(adts.synthesize_cookie(frames[0][0]))
    payloads = [stream[s:e] for _, s, e in frames]
    chunks = [[payloads[lo:lo + 3]] * 2 for lo in (0, 3)]

    def run(mesh):
        dec = BatchDecoder([config, config], chunk_frames=3,
                           use_native=True)
        return [np.asarray(p).copy() for p in
                dec.decode_he_pipelined(iter(chunks), out_int16=False,
                                        mesh=mesh)]

    want = run(None)
    got = run(meshlib.make_mesh(4, 1))
    assert len(want) == len(got) == 2
    for w, g in zip(want, got):
        scale = max(1e-9, float(np.abs(w).max()))
        np.testing.assert_allclose(g, w, atol=1e-5 * scale)


def test_entry_compiles():
    fn, args = graft.entry()
    pcm, ov = jax.jit(fn)(*args)
    assert pcm.shape[-1] == 1024
    assert bool(jax.numpy.isfinite(pcm).all())


@needs_mesh
@pytest.mark.parametrize("profile,frame_length", [(23, 512), (39, 512)])
def test_sharded_ld_eld_matches_single_device(profile, frame_length):
    """The mesh path is frame-length- and profile-generic: LD (standard
    IMDCT at F=512) and ELD (one-matmul low-delay filterbank with the
    [C, 3F] carry) decode identically sharded vs single-device — GSPMD
    turns the ELD shifted-segment adds into frame-axis halo exchanges."""
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.runtime.pack import pack_frames
    from aacjax.kernels.pipeline import jitted_decode_step
    from aacjax.testing import encoder as enc
    from aacjax.testing.specgen import random_channel_spec

    rng = np.random.default_rng(41)
    cfg = parse_asc(make_asc(profile, 4, 1, frame_length=frame_length))
    payloads = []
    for _ in range(4):
        spec = random_channel_spec(rng, cfg, window_sequence=0,
                                   allow_pulse=False, allow_noise=False)
        payloads.append(enc.write_eld_frame([("SCE", spec)], cfg)
                        if profile == 39
                        else enc.write_er_frame([("SCE", spec)], cfg))
    dec = BatchDecoder([cfg] * 4, chunk_frames=4, use_native=False)
    per_slot = []
    for i in range(4):
        frames = dec.parse_stream_frames(i, payloads)
        per_slot.append((dec.streams[i].base_slot, frames))
    batch, flags = pack_frames(per_slot, dec.C, dec.T,
                               frame_len=frame_length,
                               eld=profile == 39)
    ov_len = 3 * frame_length if profile == 39 else frame_length
    overlap = np.zeros((dec.C, ov_len), np.float32)

    pcm_single, ov_single = jitted_decode_step(flags)(batch, overlap.copy())

    m = meshlib.make_mesh(4, 2)
    step = meshlib.sharded_decode_step(flags, m)
    sharded = meshlib.shard_batch(m, batch)
    ov = jax.device_put(overlap.copy(), jax.sharding.NamedSharding(
        m, jax.sharding.PartitionSpec("stream", None)))
    pcm_mesh, ov_mesh = step(sharded, ov)

    scale = max(1.0, float(np.abs(np.asarray(pcm_single)).max()))
    np.testing.assert_allclose(np.asarray(pcm_mesh),
                               np.asarray(pcm_single), atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(ov_mesh), np.asarray(ov_single),
                               atol=1e-5 * scale)


@needs_mesh
def test_sharded_qsf_spec_path_matches_single_device():
    """The exact-i16 q/sf transfer (HE fast path spectra) sharded over a
    ('stream','frame') mesh: spec_q [C,T,F] i16 + spec_sf [C,T,F/4] u8
    ride P('stream','frame'); output matches the single-device program
    to the same few-ulp bound as the f32 spec path (the IMDCT matmul
    accumulates in a different tile order under GSPMD — the dequant
    itself is exact, tests/test_native.py::test_qsf_transfer_bit_exact)."""
    from aacjax.host import native
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.host.bitio import BitWriter
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing import encoder as enc
    from aacjax.testing.specgen import random_channel_spec

    if not native.available():
        pytest.skip("native parser not built")

    rng = np.random.default_rng(11)
    config = parse_asc(make_asc(2, 4, 1))
    n_stream, T = 4, 4
    per_stream = []
    for _i in range(n_stream):
        payloads = []
        for _t in range(T):
            w = BitWriter()
            enc.write_sce(w, random_channel_spec(rng, config,
                                                 allow_noise=False), config)
            payloads.append(enc.end_frame(w))
        per_stream.append(payloads)

    dec = BatchDecoder([config] * n_stream, chunk_frames=T, use_native=True)
    batch = dec._parse_native(per_stream, qsf=True, compact=False)
    assert batch['_spec_qsf']
    ref = np.asarray(dec.finalize_step(dec._device_step(batch,
                                                        out_int16=False)))

    dec2 = BatchDecoder([config] * n_stream, chunk_frames=T, use_native=True)
    batch2 = dec2._parse_native(per_stream, qsf=True, compact=False)
    assert batch2['_spec_qsf']
    m = meshlib.make_mesh(n_stream, 2)
    got = np.asarray(dec2.finalize_step(
        dec2._device_step_sharded(batch2, m)))
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=1e-5 * scale)


@needs_mesh
def test_sharded_encoder_matches_single_device():
    """The TPU-batched ENCODER over a stream-only mesh: both jitted
    dispatches (analysis + quantize) run with P('stream') shardings on
    the flat channel-row axis.  Every op is row-local (zero collectives),
    so the bitstreams must be byte-identical to the single-device run —
    including across a chunk boundary with a transient (EIGHT_SHORT in
    the plan) and the reservoir/calibration state carried between
    chunks."""
    from aacjax.encode_batch import BatchEncoder

    S, ch, n = 4, 2, 1024 * 4
    rng = np.random.default_rng(13)
    t = np.arange(2 * n) / 44100.0
    pcm = np.zeros((S, 2 * n, ch))
    for s in range(S):
        f0 = 250.0 * (s + 1)
        pcm[s, :, 0] = 7000 * np.sin(2 * np.pi * f0 * t)
        pcm[s, :, 1] = 7000 * np.sin(2 * np.pi * 1.5 * f0 * t)
    pcm += 300 * rng.standard_normal(pcm.shape)
    pcm[1, n + 900: n + 1100] += 15000          # straddles chunk 2's frames

    def run(mesh):
        e = BatchEncoder(44100, ch, 96_000, n_streams=S, mesh=mesh)
        return [e.encode_chunk(pcm[:, :n]), e.encode_chunk(pcm[:, n:])]

    ref = run(None)
    got = run(meshlib.make_mesh(8, 1))
    assert got == ref                           # byte-identical payloads

    with pytest.raises(ValueError):             # rows must split evenly
        BatchEncoder(44100, 1, 96_000, n_streams=3,
                     mesh=meshlib.make_mesh(8, 1))


@needs_mesh
def test_sharded_encode_pipelined_matches_single_device():
    """encode_pipelined over the stream mesh: the upload worker hands
    numpy straight to the sharded analysis (pjit lands it in the
    P('stream') row layout), the down worker runs the sharded quantize.
    Byte-identical to the sequential single-device encode."""
    from aacjax.encode_batch import BatchEncoder

    S, ch, n = 4, 2, 1024 * 3
    rng = np.random.default_rng(29)
    t = np.arange(3 * n) / 44100.0
    pcm = np.zeros((S, 3 * n, ch))
    for s in range(S):
        pcm[s, :, 0] = 7000 * np.sin(2 * np.pi * 300.0 * (s + 1) * t)
        pcm[s, :, 1] = 0.7 * pcm[s, :, 0]
    pcm += 250 * rng.standard_normal(pcm.shape)
    pcm[2, n + 500: n + 600] += 15000
    chunks = [pcm[:, k * n:(k + 1) * n] for k in range(3)]

    seq = BatchEncoder(44100, ch, 96_000, n_streams=S)
    want = [seq.encode_chunk(c) for c in chunks]
    pipe = BatchEncoder(44100, ch, 96_000, n_streams=S,
                        mesh=meshlib.make_mesh(8, 1))
    got = list(pipe.encode_pipelined(iter(chunks)))
    assert got == want
