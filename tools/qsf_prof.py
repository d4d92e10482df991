#!/usr/bin/env python3
"""Isolate the exact-i16 q/sf dequant cost in the HE core device step.

The r4 bench recorded core_compute_s = 23.1 ms for a [256, 16, 1024]
HE core chunk while the LC core runs [1024, 16, 1024] in 4.8 ms — a
~19x per-row gap that appeared with the qsf transfer (VERDICT r4 #2).
This times the three candidate decompression paths on synthetic inputs
shaped exactly like the bench chunk, amortized over a chained queue:

    python tools/qsf_prof.py [--rows 256] [--t 16]

  gather   : the current jnp LUT-gather dequant (pipeline.py qsf branch)
  onehot   : two-level one-hot matmul decomposition (Hankel-style, like
             the SBR noise-table fix) — exact same f32 values
  f32ref   : no decompression (spectra arrive as exact f32) — the floor
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aacjax.kernels.pipeline import _qsf_luts

_HI = jax.lax.Precision.HIGHEST


def dequant_gather(q, sf):
    iq_lut, sf_lut = _qsf_luts()
    qi = q.astype(jnp.int32)
    m = jnp.asarray(iq_lut)[jnp.abs(qi)]
    m = jnp.where(qi < 0, -m, m)
    gain = jnp.asarray(sf_lut)[sf.astype(jnp.int32)]
    C, T, F = q.shape
    return (m.reshape(C, T, F // 4, 4) * gain[..., None]).reshape(C, T, F)


def dequant_onehot(q, sf):
    iq_lut, sf_lut = _qsf_luts()
    qi = q.astype(jnp.int32)
    a = jnp.abs(qi)
    hi = a >> 6                       # [C,T,F] in [0,128)
    lo = a & 63
    tab2d = jnp.asarray(iq_lut.reshape(128, 64))
    oh_hi = (hi[..., None] == jnp.arange(128)).astype(jnp.float32)
    rows = jnp.einsum('...h,hl->...l', oh_hi, tab2d, precision=_HI)
    oh_lo = (lo[..., None] == jnp.arange(64)).astype(jnp.float32)
    m = jnp.sum(rows * oh_lo, axis=-1)
    m = jnp.where(qi < 0, -m, m)
    sfi = sf.astype(jnp.int32)
    tab_sf = jnp.asarray(sf_lut.reshape(16, 16))
    oh_s = (((sfi >> 4)[..., None]) == jnp.arange(16)).astype(jnp.float32)
    rows_s = jnp.einsum('...h,hl->...l', oh_s, tab_sf, precision=_HI)
    oh_sl = ((sfi & 15)[..., None] == jnp.arange(16)).astype(jnp.float32)
    gain = jnp.sum(rows_s * oh_sl, axis=-1)
    C, T, F = q.shape
    return (m.reshape(C, T, F // 4, 4) * gain[..., None]).reshape(C, T, F)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=256)
    ap.add_argument('--t', type=int, default=16)
    ap.add_argument('--trace', action='store_true')
    args = ap.parse_args()
    C, T, F = args.rows, args.t, 1024

    rng = np.random.default_rng(0)
    q = rng.integers(-800, 800, size=(C, T, F)).astype(np.int16)
    # sprinkle large escapes
    q.flat[rng.integers(0, q.size, 1000)] = 8191
    sf = rng.integers(60, 180, size=(C, T, F // 4)).astype(np.uint8)
    qd = jax.device_put(q)
    sfd = jax.device_put(sf)

    # exactness check (CPU ok too)
    g = np.asarray(jax.jit(dequant_gather)(qd, sfd))
    o = np.asarray(jax.jit(dequant_onehot)(qd, sfd))
    exact = np.array_equal(g, o)
    print(f'onehot bit-exact vs gather: {exact}', flush=True)
    assert exact

    def bench(name, fn, *a):
        f = jax.jit(lambda *xs: jnp.sum(fn(*xs)))
        f(*a).block_until_ready()
        n = 20
        t0 = time.perf_counter()
        outs = [f(*a) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        print(f'{name:8s} {dt * 1e3:8.2f} ms/step  [{C},{T},{F}]',
              flush=True)
        return dt

    bench('gather', dequant_gather, qd, sfd)
    bench('onehot', dequant_onehot, qd, sfd)

    def dequant_rowtake(q, sf):
        iq_lut, sf_lut = _qsf_luts()
        qi = q.astype(jnp.int32)
        a = jnp.abs(qi)
        tab2d = jnp.asarray(iq_lut.reshape(128, 64))
        rows = jnp.take(tab2d, a >> 6, axis=0)       # [C,T,F,64]
        oh_lo = ((a & 63)[..., None] == jnp.arange(64)).astype(jnp.float32)
        m = jnp.sum(rows * oh_lo, axis=-1)
        m = jnp.where(qi < 0, -m, m)
        gain = jnp.asarray(sf_lut)[sf.astype(jnp.int32)]
        C, T, F = q.shape
        return (m.reshape(C, T, F // 4, 4) * gain[..., None]).reshape(C, T, F)

    rt = np.asarray(jax.jit(dequant_rowtake)(qd, sfd))
    print('rowtake bit-exact vs gather:', np.array_equal(g, rt), flush=True)
    bench('rowtake', dequant_rowtake, qd, sfd)

    # coded-prefix variant: dequant only the first W bins, zero-fill rest
    W = F // 2
    def dequant_onehot_w(q, sf):
        C, T, F_ = q.shape
        pre = dequant_onehot(q[:, :, :W], sf[:, :, : W // 4])
        return jnp.concatenate(
            [pre, jnp.zeros((C, T, F_ - W), jnp.float32)], axis=-1)
    qw = q.copy(); qw[:, :, W:] = 0
    qwd = jax.device_put(qw)
    gw = np.asarray(jax.jit(dequant_gather)(qwd, sfd))
    ow = np.asarray(jax.jit(dequant_onehot_w)(qwd, sfd))
    print('onehot-W bit-exact:', np.array_equal(gw, ow), flush=True)
    bench('onehot-W', dequant_onehot_w, qwd, sfd)

    fd = jax.device_put(g)
    bench('f32ref', lambda x: x * 1.0000001, fd)


if __name__ == '__main__':
    main()
