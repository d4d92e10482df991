"""Pallas fused synthesis kernel vs the jnp filterbank (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aacjax.kernels import pipeline
from aacjax.kernels.pallas_synth import TILE, synthesis

INTERPRET = jax.default_backend() != "tpu"

# On the remote-compile TPU dev setup each Mosaic build takes minutes —
# but the build is per-SHAPE, so many seeds run through ONE compile.
SEEDS = range(6)


def test_pallas_matches_jnp_filterbank():
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        B = 16
        spec = rng.standard_normal((B, 1024)).astype(np.float32) * 100
        seq = rng.integers(0, 4, B).astype(np.int32)
        shape = rng.integers(0, 2, B).astype(np.int32)
        prev = rng.integers(0, 2, B).astype(np.int32)
        f_idx = (seq * 2 + prev).astype(np.int32)
        s_idx = (seq * 2 + shape).astype(np.int32)
        is_short = (seq == 2)

        # reference: the jnp path (shapes [C=B, T=1, F])
        first_ref, second_ref = pipeline.filterbank(
            jnp.asarray(spec)[:, None, :], jnp.asarray(f_idx)[:, None],
            jnp.asarray(s_idx)[:, None], jnp.asarray(shape)[:, None],
            jnp.asarray(prev)[:, None], jnp.asarray(is_short)[:, None])

        first, second = synthesis(
            jnp.asarray(spec), jnp.asarray(f_idx), jnp.asarray(s_idx),
            jnp.asarray(shape), jnp.asarray(prev),
            jnp.asarray(is_short.astype(np.int32)), interpret=INTERPRET)

        # Mosaic's HIGHEST-precision matmul rounds slightly differently
        # from XLA's (measured ~2.3e-5 relative on hardware); the kernel
        # is an optional path, well inside the 1e-4 parity target.
        tol = (5e-5 if jax.default_backend() == "tpu" else 2e-5)
        scale = max(1.0, float(np.abs(np.asarray(first_ref)).max()),
                    float(np.abs(np.asarray(second_ref)).max()))
        np.testing.assert_allclose(
            np.asarray(first), np.asarray(first_ref)[:, 0],
            atol=tol * scale, err_msg=f"seed {seed}")
        np.testing.assert_allclose(
            np.asarray(second), np.asarray(second_ref)[:, 0],
            atol=tol * scale, err_msg=f"seed {seed}")


def test_tile_divisibility_assert():
    spec = jnp.zeros((TILE + 1, 1024), jnp.float32)
    z = jnp.zeros(TILE + 1, jnp.int32)
    with pytest.raises(AssertionError):
        synthesis(spec, z, z, z, z, z, interpret=True)
