"""SBR QMF filterbank pair: reconstruction, chunked-state invariance."""
import numpy as np
import pytest

import jax.numpy as jnp

from aacjax.kernels import qmf


def _run_chain(x, chunk=None):
    """analysis(32) -> zero-pad to 64 bands -> synthesis(64): upsamples
    2x.  Returns the output signal."""
    B, N = x.shape
    ah = qmf.analysis_init(B)
    vh = qmf.synthesis_init(B)
    outs = []
    step = chunk or N
    for i in range(0, N, step):
        xr, xi, ah = qmf.analysis(jnp.asarray(x[:, i:i + step]), ah)
        S = xr.shape[1]
        pad = jnp.zeros((B, S, 32), jnp.float32)
        pcm, vh = qmf.synthesis(jnp.concatenate([xr, pad], axis=2),
                                jnp.concatenate([xi, pad], axis=2), vh)
        outs.append(np.asarray(pcm))
    return np.concatenate(outs, axis=1)


def test_qmf_reconstruction_snr():
    """A band-limited core signal passes analysis->synthesis as its 2x
    upsampled self (unit gain, fixed delay) — the near-perfect-
    reconstruction property of the spec prototype."""
    fs = 22050
    t = np.arange(32 * 64) / fs
    x = (np.sin(2 * np.pi * 1000 * t) + 0.5 * np.sin(2 * np.pi * 2500 * t)
         )[None, :].astype(np.float32)
    out = _run_chain(x)[0]

    t2 = np.arange(out.size) / (2 * fs)
    ref_fn = lambda d: (np.sin(2 * np.pi * 1000 * (t2 - d))
                        + 0.5 * np.sin(2 * np.pi * 2500 * (t2 - d)))
    # find the integer-sample chain delay by correlation
    best = max(range(200, 800),
               key=lambda d: np.dot(out[1000:3000],
                                    ref_fn(d / (2 * fs))[1000:3000]))
    ref = ref_fn(best / (2 * fs))
    seg = slice(1200, out.size - 1200)
    err = out[seg] - ref[seg]
    snr = 10 * np.log10(np.sum(ref[seg] ** 2) / np.sum(err ** 2))
    assert snr > 50, (snr, best)


def test_qmf_chunked_state_matches_single_shot():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32 * 24)).astype(np.float32)
    a = _run_chain(x)
    b = _run_chain(x, chunk=32 * 8)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_synthesis_tap_structure():
    """The gather-free device synthesis relies on the gsel block
    structure collapsing to taps_j[j,:] == j and taps_r[j,:] ==
    n + 64*(j odd) (see kernels.qmf.synthesis); pin that here against
    the constants' spec-order construction."""
    _, _, taps_j, taps_r, _ = qmf._synthesis_consts()
    n = np.arange(64)
    for j in range(10):
        assert (taps_j[j] == j).all()
        np.testing.assert_array_equal(taps_r[j], n + 64 * (j & 1))


def test_analysis_device_consts_match_flat():
    """The pre-flipped device constants are exactly the flat analysis
    constants re-laid-out (fold-reversal folded in)."""
    win_ds, mr, mi = qmf._analysis_consts()
    win_flip, mr_f, mi_f = qmf._analysis_device_consts()
    for f in range(5):
        np.testing.assert_array_equal(win_flip[f],
                                      win_ds[64 * f:64 * (f + 1)][::-1])
    np.testing.assert_array_equal(mr_f, mr[::-1])
    np.testing.assert_array_equal(mi_f, mi[::-1])
