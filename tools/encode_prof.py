#!/usr/bin/env python3
"""Per-stage profile of the batched encoder's two device dispatches.

Mirrors encode_chunk's stage boundaries by hand (H2D of the int16 PCM
plane, analysis compute, est D2H, quantize compute, packed q/sf D2H) so
tunnel-transfer cost is separated from MXU compute — the companion of
tools/he_prof.py for the encode direction.  The q D2H figure shows the
coded-region packing win (encode_batch._quantize_fn w8): only bins
below the rate cutoff cross the link.
"""
import time, numpy as np, jax
from aacjax.encode_batch import BatchEncoder, _jitted_analysis, FRAME

S, ch, sr = 128, 2, 44100
chunk = 16
enc = BatchEncoder(sample_rate=sr, channels=ch, n_streams=S, bitrate=130000)
rng = np.random.default_rng(0)
n = chunk * 1024
t = np.arange(n + 1024) / sr
pcm = np.stack([(7000*np.sin(2*np.pi*440*t[:n]) + 900*rng.standard_normal(n))]*ch, axis=-1)
pcm = np.repeat(pcm[None], S, 0).astype(np.float32)
# warm
enc.encode_chunk(pcm)
for k in enc.stats: enc.stats[k] = 0.0 if isinstance(enc.stats[k], float) else 0

# manual sub-stage timing mirroring encode_chunk
full = np.concatenate([enc._carry, pcm], axis=1)
nF = chunk
seqs = enc._plan(full, nF)
pcm_i16 = np.clip(np.round(full.transpose(0,2,1)), -32768, 32767).astype(np.int16).reshape(S*ch, n+1024)
w_idx = np.zeros((S*ch, nF), np.int32); is_short = np.zeros((S*ch, nF), bool)
analysis = _jitted_analysis(enc._si, enc._cutoff_bin, FRAME, nF,
                            (enc._psy.smr_db, enc._psy.spread_up_db, enc._psy.spread_down_db))
for rep in range(3):
    t0 = time.perf_counter()
    dev_pcm = jax.block_until_ready(jax.device_put(pcm_i16))
    t1 = time.perf_counter()
    outs = analysis(dev_pcm, w_idx, is_short)
    outs = jax.block_until_ready(outs)
    t2 = time.perf_counter()
    est_np = np.asarray(outs[3])
    t3 = time.perf_counter()
    coefs, base, fit_sf, est, bin_band = outs
    off = np.zeros(S*ch*nF, np.float32)
    q_dev, sf_dev = enc._quantize(coefs, base, fit_sf, bin_band, off,
                                  is_short.reshape(-1))
    q_dev = jax.block_until_ready((q_dev, sf_dev))
    t4 = time.perf_counter()
    q = np.asarray(q_dev[0]); sf = np.asarray(q_dev[1])
    t5 = time.perf_counter()
    print(f"rep{rep}: h2d={t1-t0:.3f} analysis_compute={t2-t1:.3f} est_d2h={t3-t2:.3f} "
          f"quant_compute={t4-t3:.3f} q_d2h={t5-t4:.3f} "
          f"(pcm {pcm_i16.nbytes/1e6:.1f}MB, q {q.nbytes/1e6:.1f}MB, est {est_np.nbytes/1e6:.2f}MB)")
