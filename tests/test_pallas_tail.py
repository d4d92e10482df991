"""Fused Pallas decode tail vs the XLA pipeline (interpret mode on CPU;
the same kernel compiles via Mosaic on TPU — A/B'd in bench.py stages)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aacjax.kernels import pipeline
from aacjax.kernels.pallas_tail import TILE_C, decode_tail, supported


def _mk_batch(seed, C=8, T=4, i16=False):
    rng = np.random.default_rng(seed)
    spec = (rng.standard_normal((C, T, 1024)).astype(np.float32) * 300)
    seq = rng.integers(0, 4, (C, T)).astype(np.int32)
    shape = rng.integers(0, 2, (C, T)).astype(np.int32)
    prev = rng.integers(0, 2, (C, T)).astype(np.int32)
    batch = dict(
        f_idx=jnp.asarray((seq * 2 + prev).astype(np.int32)),
        s_idx=jnp.asarray((seq * 2 + shape).astype(np.int32)),
        shape_idx=jnp.asarray(shape), prev_shape_idx=jnp.asarray(prev),
        is_short=jnp.asarray(seq == 2),
    )
    # ragged validity: per-channel frame counts 0..T (0 -> keeps overlap)
    nval = rng.integers(0, T + 1, C)
    valid = np.arange(T)[None, :] < nval[:, None]
    batch['valid'] = jnp.asarray(valid)
    batch['last_valid'] = jnp.asarray((nval - 1).astype(np.int32))
    if i16:
        # block-scaled compact transfer: scale = max|block| / 32767
        blocks = spec.reshape(C, T, 64, 16)
        sc = np.abs(blocks).max(axis=-1) / 32767.0
        sc = np.maximum(sc, 1e-30).astype(np.float32)
        q = np.clip(np.round(blocks / sc[..., None]),
                    -32768, 32767).astype(np.int16)
        batch['spec_i16'] = jnp.asarray(q.reshape(C, T, 1024))
        batch['spec_scale'] = jnp.asarray(sc)
    else:
        batch['spec'] = jnp.asarray(spec)
    overlap = rng.standard_normal((C, 1024)).astype(np.float32) * 100
    return batch, jnp.asarray(overlap)


@pytest.mark.parametrize("i16", [False, True])
@pytest.mark.parametrize("out_int16", [True, False])
def test_fused_tail_matches_xla_step(i16, out_int16):
    for seed in range(4):
        batch, overlap = _mk_batch(seed, i16=i16)
        base = pipeline.PipelineFlags(
            has_stereo=False, has_tns=False, has_cce=False,
            out_int16=out_int16, spec_i16=i16, has_short=True)
        assert supported(base, 8, 4, 1024)
        ref_pcm, ref_ov = pipeline.decode_spec_step(
            dict(batch), jnp.array(overlap), base)
        fl = pipeline.PipelineFlags(
            has_stereo=False, has_tns=False, has_cce=False,
            out_int16=out_int16, spec_i16=i16, has_short=True,
            use_pallas=True)
        pcm, ov = pipeline.decode_spec_step(
            dict(batch), jnp.array(overlap), fl)
        np.testing.assert_allclose(np.asarray(ov), np.asarray(ref_ov),
                                   atol=3e-3, err_msg=f"seed {seed}")
        if out_int16:
            d = np.abs(np.asarray(pcm).astype(np.int32)
                       - np.asarray(ref_pcm).astype(np.int32))
            # matmul rounding differences can flip round() by 1 LSB on
            # values near .5 boundaries; anything larger is a real bug
            assert d.max() <= 1, f"seed {seed}: max int16 delta {d.max()}"
            assert (d > 0).mean() < 0.02, f"seed {seed}"
        else:
            scale = max(1.0, float(np.abs(np.asarray(ref_pcm)).max()))
            np.testing.assert_allclose(
                np.asarray(pcm), np.asarray(ref_pcm),
                atol=5e-5 * scale, err_msg=f"seed {seed}")


def test_fused_tail_all_long_variant():
    batch, overlap = _mk_batch(11)
    batch['is_short'] = jnp.zeros_like(batch['is_short'])
    # keep window indices consistent with all-long content
    batch['f_idx'] = jnp.where(batch['f_idx'] // 2 == 2,
                               batch['prev_shape_idx'], batch['f_idx'])
    batch['s_idx'] = jnp.where(batch['s_idx'] // 2 == 2,
                               batch['shape_idx'], batch['s_idx'])
    ref_pcm, ref_ov = pipeline.decode_spec_step(
        dict(batch), jnp.array(overlap),
        pipeline.PipelineFlags(has_stereo=False, out_int16=True,
                               has_short=False))
    pcm, ov = pipeline.decode_spec_step(
        dict(batch), jnp.array(overlap),
        pipeline.PipelineFlags(has_stereo=False, out_int16=True,
                               has_short=False, use_pallas=True))
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ref_ov), atol=3e-3)
    d = np.abs(np.asarray(pcm).astype(np.int32)
               - np.asarray(ref_pcm).astype(np.int32))
    assert d.max() <= 1


def test_fused_tail_post_tns_path():
    """With TNS present the kernel takes the post-TNS f32 spectra (the
    decompress stays in XLA ahead of the scan); outputs must still match."""
    rng = np.random.default_rng(3)
    batch, overlap = _mk_batch(3, i16=True)
    C, T = 8, 4
    lpc = np.zeros((C, T, 2, 8, 20), np.float32)
    rngs = np.zeros((C, T, 2, 8, 2), np.int32)
    # order-2 AR coefficients via reflection-coefficient (Levinson)
    # parameterization so every filter is STABLE — unstable draws blow the
    # 300-bin recursion up to ~1e18 and make the comparison ill-conditioned
    k1 = rng.uniform(-0.7, 0.7, (C, T))
    k2 = rng.uniform(-0.7, 0.7, (C, T))
    lpc[:, :, 0, 0, 0] = k1 * (1.0 + k2)
    lpc[:, :, 0, 0, 1] = k2
    rngs[:, :, 0, 0, 0] = 100
    rngs[:, :, 0, 0, 1] = 400
    batch['tns_fwd_lpc'] = jnp.asarray(lpc[:, :, 0])
    batch['tns_rev_lpc'] = jnp.asarray(lpc[:, :, 1])
    batch['tns_fwd_start'] = jnp.asarray(rngs[:, :, 0, :, 0])
    batch['tns_fwd_end'] = jnp.asarray(rngs[:, :, 0, :, 1])
    batch['tns_rev_start'] = jnp.asarray(rngs[:, :, 1, :, 0])
    batch['tns_rev_end'] = jnp.asarray(rngs[:, :, 1, :, 1])
    kw = dict(has_stereo=False, has_tns=True, out_int16=True, spec_i16=True)
    ref_pcm, ref_ov = pipeline.decode_spec_step(
        dict(batch), jnp.array(overlap), pipeline.PipelineFlags(**kw))
    pcm, ov = pipeline.decode_spec_step(
        dict(batch), jnp.array(overlap),
        pipeline.PipelineFlags(use_pallas=True, **kw))
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ref_ov), atol=3e-3)
    d = np.abs(np.asarray(pcm).astype(np.int32)
               - np.asarray(ref_pcm).astype(np.int32))
    assert d.max() <= 1


def test_supported_gates():
    fl = pipeline.PipelineFlags()
    assert supported(fl, TILE_C, 4, 1024)
    assert not supported(fl, TILE_C + 1, 4, 1024)   # C % TILE_C
    assert not supported(fl, TILE_C, 4, 960)        # 960 mode
    # qsf (native HE core transfer) IS supported: dequant stays in XLA
    assert supported(pipeline.PipelineFlags(spec_qsf=True), TILE_C, 4, 1024)
    for k in ("eld", "has_pred", "has_cce_post", "has_cce_time"):
        assert not supported(
            pipeline.PipelineFlags(**{k: True}), TILE_C, 4, 1024), k


def test_fused_tail_qsf_path():
    """The native HE core's exact-i16 q/sf transfer: LUT dequant runs in
    XLA, the fused kernel takes the f32 spectra (out_int16=False — the
    core PCM feeds the SBR stage)."""
    rng = np.random.default_rng(9)
    batch, overlap = _mk_batch(9)
    batch.pop('spec')
    C, T = 8, 4
    batch['spec_q'] = jnp.asarray(
        rng.integers(-300, 300, (C, T, 1024)).astype(np.int16))
    batch['spec_sf'] = jnp.asarray(
        rng.integers(60, 120, (C, T, 256)).astype(np.int16))
    kw = dict(has_stereo=False, out_int16=False, spec_qsf=True)
    ref_pcm, ref_ov = pipeline.decode_spec_step(
        dict(batch), jnp.array(overlap), pipeline.PipelineFlags(**kw))
    pcm, ov = pipeline.decode_spec_step(
        dict(batch), jnp.array(overlap),
        pipeline.PipelineFlags(use_pallas=True, **kw))
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ref_ov),
                               atol=3e-3 * float(np.abs(ref_ov).max()))
    scale = max(1.0, float(np.abs(np.asarray(ref_pcm)).max()))
    np.testing.assert_allclose(np.asarray(pcm), np.asarray(ref_pcm),
                               atol=5e-5 * scale)
