#!/usr/bin/env python3
"""Profile the batched HE-AAC device programs (SBR / SBR+PS) in isolation.

Two phases so the expensive device work never waits on host encode/parse:

  1. capture (CPU, no tunnel):
       JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/he_prof.py capture [--ps]
     Builds the same workload as `bench.py --he/--ps` (128 HE stereo / PS
     streams, 16-frame chunks), runs one `BatchDecoder.step_he_raw`, and
     snapshots the exact (core_pcm, dense, state) arguments of the jitted
     SBR[+PS] program to /tmp/{sbr,ps}_inputs.npz.

  2. time (TPU or CPU):
       python tools/he_prof.py time [--ps] [--trace]
     Loads the snapshot, jits the program, and reports ms/step over 10
     chained steps (states donated, exactly like serving).  --trace also
     captures a jax.profiler trace and prints the top ops by total time —
     this is how the gather hotspots were found (see kernels/qmf.py and
     kernels/sbr_batch.py "gather-free" notes).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(ps: bool, n_streams=128, chunk=16, seconds=8.0):
    from scipy import signal as sig

    from aacjax.host import sbr as S
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import PSSpec, SBRFrameSpec, sbr_payload

    out = '/tmp/ps_inputs.npz' if ps else '/tmp/sbr_inputs.npz'
    core_cfg = parse_asc(make_asc(2, 7, 1 if ps else 2))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 44100)
    spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                        env_q=np.full((2, t.n_high), 25, np.int64),
                        noise_q=np.full((2, t.n_q), 24, np.int64))
    if ps:
        psd = PSSpec(iid_mode=0, num_env=2,
                     iid_par=np.stack([np.arange(10) % 15 - 7,
                                       7 - np.arange(10) % 15]),
                     icc_mode=0, icc_par=np.arange(20).reshape(2, 10) % 8,
                     ipd_par=np.arange(10).reshape(2, 5) % 8,
                     opd_par=np.arange(10)[::-1].reshape(2, 5) % 8)
        pay = sbr_payload([spec], h, 44100, ps=psd)
    else:
        pay = sbr_payload([spec, spec], h, 44100)
    n = int(seconds * 22050) // 1024 * 1024
    rng = np.random.default_rng(7)
    bl, al = sig.butter(8, 3600 / 11025.0)
    nch = 1 if ps else 2
    x = sig.lfilter(bl, al, rng.standard_normal((n, nch)), axis=0) * 9000
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=122,
                                   fil_payloads=[pay])
    per_stream = [list(frames)] * n_streams

    cap = {}
    if ps:
        from aacjax.kernels import ps_batch as PB
        orig = PB.jitted_sbr_ps_apply

        def spy(out_int16=False, is34=False):
            fn = orig(out_int16, is34)

            def wrapped(core_pcm, dense, ps_dense, state, ps_state, cfg):
                if 'cfg' not in cap:
                    cap.update(cfg={k: np.asarray(v)
                                    for k, v in cfg.items()},
                               out_int16=out_int16, is34=is34,
                               core=np.asarray(core_pcm),
                               dense={k: np.asarray(v)
                                      for k, v in dense.items()},
                               psdense={k: np.asarray(v)
                                        for k, v in ps_dense.items()},
                               state={k: np.asarray(v)
                                      for k, v in state.items()},
                               psstate={k: np.asarray(v)
                                        for k, v in ps_state.items()})
                return fn(core_pcm, dense, ps_dense, state, ps_state, cfg)
            return wrapped
        PB.jitted_sbr_ps_apply = spy
    else:
        from aacjax.kernels import sbr_batch as SB
        orig = SB.jitted_sbr_apply

        def spy(out_int16=False):
            fn = orig(out_int16)

            def wrapped(core_pcm, dense, state, cfg):
                if 'cfg' not in cap:
                    cap.update(cfg={k: np.asarray(v)
                                    for k, v in cfg.items()},
                               out_int16=out_int16,
                               core=np.asarray(core_pcm),
                               dense={k: np.asarray(v)
                                      for k, v in dense.items()},
                               state={k: np.asarray(v)
                                      for k, v in state.items()})
                return fn(core_pcm, dense, state, cfg)
            return wrapped
        SB.jitted_sbr_apply = spy

    dec = BatchDecoder([core_cfg] * n_streams, chunk_frames=chunk,
                       **(dict(cce_slots=1) if ps else {}))
    dec.step_he_raw([p[:chunk] for p in per_stream], out_int16=True)
    arrs = dict(
        core=cap['core'],
        out_int16=np.int64(cap['out_int16']),
        is34=np.int64(cap.get('is34', 0)))
    arrs.update({f'cfg_{k}': v for k, v in cap['cfg'].items()})
    arrs.update({f'dense_{k}': v for k, v in cap['dense'].items()})
    arrs.update({f'state_{k}': v for k, v in cap['state'].items()})
    if ps:
        arrs.update({f'psdense_{k}': v for k, v in cap['psdense'].items()})
        arrs.update({f'psstat_{k}': v for k, v in cap['psstate'].items()})
    np.savez(out, **arrs)
    print('saved', out, 'core', cap['core'].shape, flush=True)


def time_program(ps: bool, trace: bool):
    import jax

    t_load = time.time()
    d = np.load('/tmp/ps_inputs.npz' if ps else '/tmp/sbr_inputs.npz')
    print(f'npz load: {time.time() - t_load:.1f}s', flush=True)

    def grp(p):
        return {k[len(p):]: jax.device_put(d[k]) for k in d.files
                if k.startswith(p) and not k.startswith('cfg_')}

    t_put = time.time()
    cfg = {k[4:]: jax.device_put(d[k]) for k in d.files
           if k.startswith('cfg_')}
    dense, state = grp('dense_'), grp('state_')
    core = jax.device_put(d['core'])
    np.asarray(core[:1, :1])
    print(f'device_put: {time.time() - t_put:.1f}s', flush=True)
    if ps:
        from aacjax.kernels.ps_batch import jitted_sbr_ps_apply
        fn0 = jitted_sbr_ps_apply(bool(d['out_int16']), bool(d['is34']))
        psdense, psstate = grp('psdense_'), grp('psstat_')
        fn = lambda c, st, pst: fn0(c, dense, psdense, st, pst, cfg)
        args = (core, state, psstate)
    else:
        from aacjax.kernels.sbr_batch import jitted_sbr_apply
        fn0 = jitted_sbr_apply(bool(d['out_int16']))
        fn = lambda c, st: fn0(c, dense, st, cfg)
        args = (core, state)

    def run_k(k):
        nonlocal args
        out = None
        for _ in range(k):
            out = fn(*args)
            args = (args[0],) + tuple(out[1:])   # states are donated
        # block_until_ready alone does NOT drain the tunneled axon
        # queue (measured 0.13 ms/step for a 22 ms program); a real
        # D2H read is the only trustworthy sync on this platform
        np.asarray(jax.device_get(out[0][:1, :1]))
        return out

    t0 = time.time()
    out = run_k(1)
    print(f'compile+first: {time.time() - t0:.1f}s', flush=True)
    # the sync read's RPC roundtrip rides the chain total once —
    # measure it on the already-ready output and subtract
    t0 = time.time()
    np.asarray(jax.device_get(out[0][:1, :1]))
    rtt = time.time() - t0
    print(f'sync rtt: {rtt * 1e3:.1f} ms', flush=True)
    K = 30
    t0 = time.time()
    run_k(K)
    dt = (time.time() - t0 - rtt) / K
    B, T, _ = d['core'].shape
    # B counts channel slots: stereo pairs (SBR) or mono source + stereo
    # output slot (PS) -> B//2 streams either way
    audio_s = (B // 2) * T * 2048 / 44100.0
    print(f'{"SBR+PS" if ps else "SBR"} program: {dt * 1e3:.1f} ms/step  '
          f'B={B} T={T}  (device-only {audio_s / dt:.0f}x realtime)',
          flush=True)
    if trace:
        with jax.profiler.trace('/tmp/heprof_trace'):
            run_k(3)
        f = sorted(glob.glob('/tmp/heprof_trace/**/*.trace.json.gz',
                             recursive=True))[-1]
        ev = json.loads(gzip.open(f).read())['traceEvents']
        tot = {}
        for e in ev:
            if e.get('ph') == 'X' and 'dur' in e:
                key = (e.get('pid'), e.get('name', ''))
                tot.setdefault(key, [0, 0])
                tot[key][0] += e['dur']
                tot[key][1] += 1
        for (pid, name), (dur, c) in sorted(tot.items(),
                                            key=lambda kv: -kv[1][0])[:35]:
            print(f'{dur / 1e3:9.2f} ms x{c:4d} pid={pid} {name[:110]}',
                  flush=True)


def _flag(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


if __name__ == '__main__':
    ps = '--ps' in sys.argv
    if len(sys.argv) > 1 and sys.argv[1] == 'capture':
        capture(ps, n_streams=_flag('--streams', 128),
                chunk=_flag('--chunk', 16))
    elif len(sys.argv) > 1 and sys.argv[1] == 'time':
        time_program(ps, '--trace' in sys.argv)
    else:
        print(__doc__)
        sys.exit(2)
