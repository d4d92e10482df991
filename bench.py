#!/usr/bin/env python3
"""Headline benchmark: aggregate decode throughput on one chip.

Decodes N concurrent AAC-LC stereo ADTS streams end-to-end — native C++
bitstream parse (threaded across streams) + dense packing + the jitted
device pipeline (dequant / stereo / TNS / IMDCT / overlap-add) + PCM
delivery back to the host as int16 — and reports aggregate realtime×:
audio seconds decoded per wall second.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

vs_baseline is value / 1000 — the north-star target from BASELINE.json
(>= 1000x realtime, AAC-LC stereo, 512 streams, one TPU v5e chip).  The
reference publishes no numbers (BASELINE.md), so the target is the
baseline.

The default (argument-less) run measures ALL FOUR programs — AAC-LC
decode (headline), HE-AAC v1, HE-AAC v2 (PS) and the batched encoder —
under one global time budget (AACJAX_BENCH_BUDGET seconds, default 900)
and reports them in a single line: the headline keys stay the LC
end-to-end number for round-over-round comparability, `modes` carries
the sub-benches.  Every mode records its per-rep values (`reps`) and
the median alongside the best: the dev tunnel's bandwidth swings 2-3x
between identical runs (ARCHITECTURE.md §7.2), so a single throw is
noise — compare medians and check the recorded spread before reading a
delta as real.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_corpus(n_unique: int, seconds: float, sr: int = 44100):
    """Encode n_unique distinct stereo streams with realistic content
    (tones + noise with per-stream character)."""
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.testing.encoder import encode_pcm

    config = parse_asc(make_asc(2, 4, 2))
    n = int(seconds * sr) // 1024 * 1024
    t = np.arange(n) / sr
    streams = []
    for i in range(n_unique):
        rng = np.random.default_rng(1000 + i)
        f0 = 200.0 * (1.3 ** i)
        x = (7000 * np.sin(2 * np.pi * f0 * t)
             + 2500 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.3)
             + 900 * rng.standard_normal(n))
        pcm = np.stack([x, np.roll(x, 64) * 0.85], axis=1)
        # target_sf=146 lands around 500-700 bytes/frame (~200 kbps stereo),
        # the realistic high-quality streaming operating point
        streams.append(encode_pcm(pcm, config, target_sf=146))
    return config, streams


def _rtt_and_sync():
    """Return (sync, rtt_s): `sync(x)` forces a REAL 1-element D2H —
    jax.block_until_ready alone can return before the tunneled axon
    queue drains (measured 0.13 ms/"step" for a program whose trace
    shows 22 ms/step), silently under-reporting every chained-compute
    stage — and rtt_s is the cost of that sync on an already-ready
    buffer, subtracted from chain totals so the 1-element read's RPC
    roundtrip doesn't pollute the amortized per-step figure."""
    import jax

    ready = jax.device_put(np.zeros(1, np.float32))
    np.asarray(ready)

    def sync(x):
        np.asarray(jax.device_get(jax.numpy.ravel(x)[:1]))

    t0 = time.perf_counter()
    np.asarray(ready)
    rtt = time.perf_counter() - t0
    return sync, rtt


def measure_stages(dec, chunk, use_pallas, compact, reps: int = 3) -> dict:
    """Decompose one chunk's decode into parse / H2D / device-compute /
    D2H wall seconds (min over reps, each stage synced) so the recorded
    bench JSON itself shows where time goes — separating host, link and
    chip.  Uses the same code path as the timed loop (native parse +
    jitted_decode_spec_step), just with explicit synchronization."""
    import jax
    from aacjax.kernels.pipeline import PipelineFlags, jitted_decode_spec_step

    sync, rtt = _rtt_and_sync()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        parsed = dec._parse_native(chunk, compact=compact)
        t1 = time.perf_counter()
        has_tns = parsed.pop("_has_tns")
        has_short = parsed.pop("_has_short")
        spec_i16 = parsed.pop("_spec_i16")
        for k in ("_parse_seconds", "_n_stream_frames", "_n_channel_frames",
                  "_has_cce_post", "_has_cce_time", "_spec_qsf"):
            parsed.pop(k, None)
        dev_batch = jax.block_until_ready(jax.device_put(parsed))
        t2 = time.perf_counter()
        flags = PipelineFlags(has_stereo=False, has_tns=has_tns,
                              has_cce=False, out_int16=True,
                              use_pallas=use_pallas, spec_i16=spec_i16,
                              has_short=has_short)
        fn = jitted_decode_spec_step(flags)
        pcm, dec.overlap = fn(dev_batch, dec.overlap)
        jax.block_until_ready(pcm)
        t3 = time.perf_counter()
        np.asarray(pcm)
        t4 = time.perf_counter()
        # amortized device compute: a single synced dispatch includes the
        # host<->device RPC roundtrip (tens of ms over this dev tunnel);
        # chaining steps through the donated overlap state measures the
        # actual per-step device time, which is what a full serving queue
        # pays.  (Verified: N chained steps block in ~N*amortized while
        # the D2H of the final result stays one transfer.)
        n_chain = 16
        ov = dec.overlap
        tc = time.perf_counter()
        for _ in range(n_chain):
            pcm2, ov = fn(dev_batch, ov)
        sync(pcm2)
        dec.overlap = ov
        compute_s = (time.perf_counter() - tc - rtt) / n_chain
        # A/B the fused Pallas decode tail against the XLA pipeline on the
        # same device-resident batch (VERDICT r3 #7: record the comparison
        # honestly; the faster one should be the serving default)
        alt_flags = PipelineFlags(has_stereo=False, has_tns=has_tns,
                                  has_cce=False, out_int16=True,
                                  use_pallas=not use_pallas,
                                  spec_i16=spec_i16, has_short=has_short)
        alt_fn = jitted_decode_spec_step(alt_flags)
        # side-effect-free A/B: the alternate (differently-rounded)
        # kernel must not advance the decoder state the rest of the run
        # consumes — snapshot the overlap and restore it after (ADVICE r4)
        ov_snap = dec.overlap
        ov = ov_snap + 0.0                     # fresh buffer (donation-safe)
        pcm2, ov = alt_fn(dev_batch, ov)       # compile outside the timer
        sync(pcm2)
        tc = time.perf_counter()
        for _ in range(n_chain):
            pcm2, ov = alt_fn(dev_batch, ov)
        sync(pcm2)
        dec.overlap = ov_snap
        alt_s = (time.perf_counter() - tc - rtt) / n_chain
        cur = dict(parse_s=t1 - t0, h2d_s=t2 - t1, dispatch_s=t3 - t2,
                   compute_s=compute_s,
                   d2h_s=t4 - t3)
        cur["compute_pallas_s" if not use_pallas else "compute_xla_s"] = alt_s
        if best is None:
            best = cur
        else:
            best = {k: min(best[k], cur[k]) for k in best}
    return {k: round(v, 4) for k, v in best.items()}


def measure_stages_he(dec, chunk_payloads, ps: bool, reps: int = 2) -> dict:
    """Decompose one HE chunk into host / core+H2D / SBR-H2D /
    SBR-compute / D2H wall seconds (min over reps, each stage synced),
    mirroring measure_stages for the LC path.  SBR compute is amortized
    over a chained queue through the donated device state — a single
    synced dispatch would read the tunnel's ~30 ms RPC roundtrip, not
    the chip."""
    import jax

    sync, rtt = _rtt_and_sync()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        parsed, dense, ctx = dec._he_host_phase(chunk_payloads)
        t1 = time.perf_counter()
        parsed_snap = dict(parsed)  # _device_step pops the _flags
        core_pcm = dec._device_step(parsed, out_int16=False)
        jax.block_until_ready(core_pcm)
        t2 = time.perf_counter()
        # amortized CORE device compute: chain steps on a device-resident
        # batch through the donated overlap (a single synced dispatch
        # reads the tunnel's ~30 ms RPC roundtrip, not the chip)
        core_dev = dec._upload_batch(parsed_snap)
        n_core = 8
        tc0 = time.perf_counter()
        for _ in range(n_core):
            pcm_c = dec._device_step(dict(core_dev), out_int16=False)
        sync(pcm_c)
        core_amortized = (time.perf_counter() - tc0 - rtt) / n_core
        t2b = time.perf_counter()  # sbr-h2d baseline: excludes the chain
        dense_dict = dense if isinstance(dense, dict) else vars(dense)
        dense_dev = jax.block_until_ready(jax.device_put(dense_dict))
        if ps:
            # the PS planes are part of the chunk's H2D (the production
            # pipeline uploads them under the same transfer lock as the
            # SBR planes), so they belong in sbr_h2d_s — not in the
            # dispatch window
            from aacjax.kernels.ps_batch import jitted_sbr_ps_apply
            ps_mode = bool((ctx["ps_modes"] or [False])[0])
            dec._ps_mode_begin([ps_mode], dec._sbr_dev_state)
            d = ctx["ps_dense"]
            out_src = np.arange(dec.C, dtype=np.int32)
            out_role = np.zeros(dec.C, np.int32)
            for s, p in enumerate(ctx["ps_pair"]):
                if p >= 0:
                    out_src[p] = s
                    out_role[p] = 1
            from aacjax.host import ps_pack as PP
            ps_dense = jax.block_until_ready(jax.device_put(
                PP.dense_to_dict(d, ctx["ps_himag"], out_src, out_role)))
        t3 = time.perf_counter()
        cfg_dev = dec._cfg_planes_device()
        if ps:
            fn0 = jitted_sbr_ps_apply(True, ps_mode)
            step = lambda st: fn0(core_pcm, dense_dev, ps_dense,
                                  st[0], st[1], cfg_dev)
            st = (dec._sbr_dev_state, dec._ps_dev_states[ps_mode])
            unpack = lambda out: (out[1], out[2])
        else:
            from aacjax.kernels.sbr_batch import jitted_sbr_apply
            fn0 = jitted_sbr_apply(True)
            step = lambda st: fn0(core_pcm, dense_dev, st[0], cfg_dev)
            st = (dec._sbr_dev_state,)
            unpack = lambda out: (out[1],)
        out = step(st)
        jax.block_until_ready(out[0])
        t4 = time.perf_counter()
        n_chain = 8
        tc = time.perf_counter()
        st = unpack(out)
        for _ in range(n_chain):
            out = step(st)
            st = unpack(out)
        sync(out[0])
        sbr_amortized = (time.perf_counter() - tc - rtt) / n_chain
        t5 = time.perf_counter()
        np.asarray(out[0])
        t6 = time.perf_counter()
        if ps:
            dec._sbr_dev_state, dec._ps_dev_states[ps_mode] = st
        else:
            (dec._sbr_dev_state,) = st
        cur = dict(host_s=t1 - t0, core_s=t2 - t1,
                   core_compute_s=core_amortized, sbr_h2d_s=t3 - t2b,
                   sbr_dispatch_s=t4 - t3, sbr_compute_s=sbr_amortized,
                   d2h_s=t6 - t5)
        best = cur if best is None else {k: min(best[k], cur[k])
                                         for k in best}
    return {k: round(v, 4) for k, v in best.items()}


def measure_stages_encode(enc, pcm_chunk, reps: int = 2) -> dict:
    """Decompose one encode chunk into prep / H2D / analysis-compute /
    est-D2H / rate / quantize-compute / q-D2H / write wall seconds (min
    over reps, each stage synced; the two device stages additionally
    amortized over a chained queue — a single synced dispatch reads the
    tunnel's ~30 ms RPC roundtrip, not the chip).  Mirrors
    measure_stages for the decode side (VERDICT r4 #3: the conflated
    h2d_analysis bucket made the encoder unoptimizable)."""
    import jax

    sync, rtt = _rtt_and_sync()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        seqs, pcm_i16, w_idx, is_short, nF = enc._prep_chunk(pcm_chunk)
        t1 = time.perf_counter()
        analysis = enc._analysis_for(nF)
        dev = jax.block_until_ready(jax.device_put(pcm_i16))
        t2 = time.perf_counter()
        outs = analysis(dev, w_idx, is_short)
        jax.block_until_ready(outs[3])
        t3 = time.perf_counter()
        n_chain = 8
        tc = time.perf_counter()
        for _ in range(n_chain):
            outs = analysis(dev, w_idx, is_short)
        sync(outs[3])
        analysis_compute = (time.perf_counter() - tc - rtt) / n_chain
        t3b = time.perf_counter()
        est_np = np.asarray(outs[3])
        t4 = time.perf_counter()
        off, chosen_est = enc._rate_choice(est_np, nF)
        t5 = time.perf_counter()
        coefs, base, fit_sf, _est, bin_band = outs
        short_flat = is_short.reshape(-1)
        q_dev, sf_dev = enc._quantize(coefs, base, fit_sf, bin_band,
                                      off, short_flat)
        jax.block_until_ready((q_dev, sf_dev))
        t6 = time.perf_counter()
        tc = time.perf_counter()
        for _ in range(n_chain):
            q_dev, sf_dev = enc._quantize(coefs, base, fit_sf, bin_band,
                                          off, short_flat)
        sync(q_dev)
        quant_compute = (time.perf_counter() - tc - rtt) / n_chain
        t6b = time.perf_counter()
        q_packed = np.asarray(q_dev)
        sf = np.asarray(sf_dev).reshape(enc.S, enc.channels, nF, -1)
        t7 = time.perf_counter()
        q = enc._unpack_q(q_packed, short_flat).reshape(
            enc.S, enc.channels, nF, 1024)
        enc._write_out(seqs, q, sf, chosen_est)
        t8 = time.perf_counter()
        cur = dict(prep_s=t1 - t0, h2d_s=t2 - t1,
                   analysis_dispatch_s=t3 - t2,
                   analysis_compute_s=analysis_compute,
                   est_d2h_s=t4 - t3b, rate_s=t5 - t4,
                   quantize_dispatch_s=t6 - t5,
                   quantize_compute_s=quant_compute,
                   q_d2h_s=t7 - t6b, write_s=t8 - t7)
        best = cur if best is None else {k: min(best[k], cur[k])
                                         for k in best}
    return {k: round(v, 4) for k, v in best.items()}


def _median(vals):
    return round(float(np.median(vals)), 1) if vals else None


def bench_he(n_streams: int, seconds: float, chunk: int, repeats: int,
             ps: bool = False, pipelined: bool = True,
             rep_budget_s: float = 330.0) -> dict:
    """HE-AAC batched throughput: host parse + the chained device
    programs (core decode -> batched SBR [-> batched Parametric Stereo
    with --ps: mono v2 streams emitting stereo]), 2x output rate.

    The reference cannot decode HE-AAC at all (decoder.js:279-280), so
    there is no baseline; vs_baseline uses the same >=1000x target."""
    import numpy as np
    from scipy import signal as sig

    from aacjax.host import adts, sbr as S
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload

    from aacjax.testing.sbr_encoder import PSSpec

    core_cfg = parse_asc(make_asc(2, 7, 1 if ps else 2))  # 22050 -> 44100
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
    n_frames = len(frames) // chunk * chunk

    slots = dict(cce_slots=1) if ps else {}
    warm = BatchDecoder([core_cfg] * n_streams, chunk_frames=chunk, **slots)
    warm.step_he_raw([p[:chunk] for p in per_stream], out_int16=True)

    vals = []
    t_reps0 = time.time()
    for _rep in range(repeats):
        if _rep and time.time() - t_reps0 > rep_budget_s:
            break   # congestion guard (see main())
        dec = BatchDecoder([core_cfg] * n_streams, chunk_frames=chunk,
                           **slots)
        t1 = time.time()
        if pipelined and dec.use_native:
            it = ([p[lo:lo + chunk] for p in per_stream]
                  for lo in range(0, n_frames, chunk))
            for _pcm in dec.decode_he_pipelined(it, out_int16=True):
                pass
        else:
            for lo in range(0, n_frames, chunk):
                dec.step_he_raw([p[lo:lo + chunk] for p in per_stream],
                                out_int16=True)
        wall = time.time() - t1
        audio_seconds = n_streams * n_frames * 2048 / 44100.0
        vals.append(round(audio_seconds / wall, 1))
    best = max(vals)
    label = ("HE-AAC v2 mono->stereo (SBR+PS)" if ps
             else "HE-AAC v1 stereo")
    stages = {}
    if warm.use_native:
        try:
            stages = measure_stages_he(
                warm, [p[:chunk] for p in per_stream], ps)
            chunk_audio_s = n_streams * chunk * 2048 / 44100.0
            stages["chunk_audio_s"] = round(chunk_audio_s, 2)
            dev = stages["core_compute_s"] + stages["sbr_compute_s"]
            stages["compute_realtime_x"] = (round(chunk_audio_s / dev, 1)
                                            if dev else None)
        except Exception as e:           # stage split is informational
            print(f"# stage split failed: {e!r}", file=sys.stderr)
    return {
        "metric": ("he_aac_v2_aggregate_realtime_x" if ps
                   else "he_aac_aggregate_realtime_x"),
        "value": best,
        "median": _median(vals),
        "reps": vals,
        "unit": f"x_realtime ({n_streams} {label} streams, 1 chip, "
                "end-to-end incl. python host parse; reference has no SBR)",
        "vs_baseline": round(best / 1000.0, 3),
        **({"stages": stages} if stages else {}),
    }


def bench_encode(n_streams: int, seconds: float, chunk: int,
                 repeats: int, bitrate: int = 128_000,
                 rep_budget_s: float = 330.0,
                 pipelined: bool = True) -> dict:
    """TPU-batched ENCODE throughput: device analysis (MDCT + band
    energies + psy + quant trials + Huffman-cost grid over rate
    offsets), host rate choice + bitstream write (encode_batch.py),
    run through encode_pipelined (prep / H2D+analysis / rate+D2H+write
    overlapped across chunks) unless pipelined=False.  The reference
    has no encoder at all; vs_baseline uses the same >=1000x target
    axis."""
    from aacjax.encode_batch import BatchEncoder

    sr = 44100
    n = int(seconds * sr) // 1024 * 1024
    t = np.arange(n) / sr
    rng = np.random.default_rng(11)
    # per-stream character, shared base buffer (content realism without
    # 512x the synthesis cost)
    base = (6000 * np.sin(2 * np.pi * 440 * t)
            + 2000 * np.sin(2 * np.pi * 1230 * t)
            + 500 * rng.standard_normal(n))
    pcm = np.empty((n_streams, n, 2), np.float32)
    for s in range(n_streams):
        r = np.roll(base, 97 * s)
        pcm[s, :, 0] = r
        pcm[s, :, 1] = 0.8 * np.roll(r, 41)

    warm = BatchEncoder(sr, 2, bitrate, n_streams=n_streams)
    warm.encode_chunk(pcm[:, : chunk * 1024])

    vals = []
    stats = None
    n_chunks = n // (chunk * 1024)
    t_reps0 = time.time()
    for _rep in range(repeats):
        if _rep and time.time() - t_reps0 > rep_budget_s:
            break   # congestion guard (see main())
        enc = BatchEncoder(sr, 2, bitrate, n_streams=n_streams)
        t1 = time.time()
        total_bytes = 0
        chunks = (pcm[:, k * chunk * 1024:(k + 1) * chunk * 1024]
                  for k in range(n_chunks))
        outs = (enc.encode_pipelined(chunks) if pipelined
                else map(enc.encode_chunk, chunks))
        for out in outs:
            total_bytes += sum(len(p) for o in out for p in o)
        wall = time.time() - t1
        audio_seconds = n_streams * n_chunks * chunk * 1024 / sr
        rt = audio_seconds / wall
        vals.append(round(rt, 1))
        if rt >= max(vals):
            stats = dict(enc.stats)
    best = max(vals)
    kbps = total_bytes * 8 / (n_chunks * chunk * 1024 / sr) / 1000 \
        / n_streams
    result = {
        "metric": "encode_aggregate_realtime_x",
        "value": best,
        "median": _median(vals),
        "reps": vals,
        "unit": f"x_realtime ({n_streams} AAC-LC stereo streams encoded "
                f"at ~{kbps:.0f} kbps, 1 chip device analysis + host "
                "bitstream write; reference has no encoder)",
        "vs_baseline": round(best / 1000.0, 3),
    }
    if stats:
        fr = max(stats.pop("frames"), 1)
        result["stages"] = {k: round(v, 4) for k, v in stats.items()}
        result["stages"]["frames"] = fr
    try:
        split = measure_stages_encode(warm, pcm[:, : chunk * 1024])
        chunk_audio_s = n_streams * chunk * 1024 / sr
        split["chunk_audio_s"] = round(chunk_audio_s, 2)
        dev = split["analysis_compute_s"] + split["quantize_compute_s"]
        split["compute_realtime_x"] = (round(chunk_audio_s / dev, 1)
                                       if dev else None)
        result["stages_split"] = split
    except Exception as e:               # stage split is informational
        print(f"# encode stage split failed: {e!r}", file=sys.stderr)
    return result


def _parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=512)
    # 8s -> ~21 chunks per rep: the pipeline's fill/drain edges are <5%
    # of the run, so the number reflects steady-state continuous serving
    # (at 4s/10 chunks the edges understated it by ~7%)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--unique", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    # best-of-4: the dev tunnel's bandwidth swings 2-3x between reps;
    # extra reps hedge congestion noise (total stays < 350 s)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--no-native", action="store_true")
    ap.add_argument("--no-stages", action="store_true",
                    help="skip the per-stage breakdown pass")
    ap.add_argument("--no-compact", action="store_false", dest="compact",
                    help="transfer exact f32 spectra instead of per-row "
                         "int16 fixed point (compact halves H2D; ~1.5e-5 "
                         "rel err, below the codec's own noise floor)")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="use the fused Pallas decode-tail kernel for the "
                         "headline LC run (default: on — it wins the "
                         "recorded A/B on hardware; --no-pallas reverts to "
                         "the XLA pipeline)")
    ap.add_argument("--no-pipelined", action="store_false", dest="pipelined",
                    help="disable the parse/device overlap (pipelined is the "
                         "default: parse of chunk k+1 overlaps chunk k's "
                         "link+device work — measured +60%% end-to-end even "
                         "on a 1-core host, where parse fills the idle "
                         "socket waits)")
    ap.add_argument("--profile", metavar="LOGDIR", default=None,
                    help="capture a jax.profiler trace of the timed reps")
    ap.add_argument("--he", action="store_true",
                    help="benchmark the batched HE-AAC (SBR) pipeline "
                         "instead of AAC-LC")
    ap.add_argument("--ps", action="store_true",
                    help="with --he: HE-AAC v2 (Parametric Stereo) "
                         "mono->stereo streams")
    ap.add_argument("--encode", action="store_true",
                    help="benchmark the TPU-batched ENCODER "
                         "(encode_batch.py) instead of decode")
    ap.add_argument("--lc-only", action="store_true",
                    help="headline LC decode only (the default run adds "
                         "he/ps/encode sub-benches under the global "
                         "AACJAX_BENCH_BUDGET)")
    ap.add_argument("--verbose", action="store_true")
    return ap.parse_args()


def bench_lc(args, rep_budget_s: float = 330.0) -> dict:
    from aacjax.host import adts, native
    from aacjax.runtime.batch import BatchDecoder

    t0 = time.time()
    config, corpus = make_corpus(args.unique, args.seconds)
    if args.verbose:
        print(f"# corpus: {args.unique} unique streams x {args.seconds}s "
              f"encoded in {time.time()-t0:.1f}s", file=sys.stderr)

    # segment each stream's ADTS frames once (demux is not the bottleneck;
    # segmentation cost is included in the timed loop via re-slicing)
    per_stream_payloads = []
    for i in range(args.streams):
        data = corpus[i % args.unique]
        frames = adts.split_frames(data)
        per_stream_payloads.append([data[s:e] for _, s, e in frames])
    n_frames = min(len(p) for p in per_stream_payloads)
    n_chunks = n_frames // args.chunk
    n_frames = n_chunks * args.chunk
    sr = config.sample_rate

    use_native = native.available() and not args.no_native
    if args.verbose:
        print(f"# native parser: {use_native}; {args.streams} streams x "
              f"{n_frames} frames, chunk={args.chunk}", file=sys.stderr)

    if args.pallas is not None:
        use_pallas = args.pallas
    else:
        # the ONE shared default (library == bench): Pallas on real TPU
        # (wins the recorded stages A/B, BASELINE.md), XLA elsewhere;
        # AACJAX_PALLAS=1/0 overrides for A/B runs
        from aacjax.kernels.pallas_tail import default_on
        use_pallas = default_on()

    # warmup/compile with a small throwaway pass
    warm = BatchDecoder([config] * args.streams, chunk_frames=args.chunk,
                        use_native=use_native)
    warm.step_raw([p[:args.chunk] for p in per_stream_payloads],
                  out_int16=True, use_pallas=use_pallas,
                  compact=args.compact)

    def chunks():
        for c in range(n_chunks):
            lo = c * args.chunk
            yield [p[lo:lo + args.chunk] for p in per_stream_payloads]

    profiler_ctx = None
    if args.profile:
        import jax
        profiler_ctx = jax.profiler.trace(args.profile)
        profiler_ctx.__enter__()

    vals = []
    t_reps0 = time.time()
    for _rep in range(args.repeats):
        if _rep and time.time() - t_reps0 > rep_budget_s:
            # congested-tunnel guard: keep the whole bench inside the
            # runner's budget; best-of the reps that fit
            break
        dec = BatchDecoder([config] * args.streams, chunk_frames=args.chunk,
                           use_native=use_native)
        t1 = time.time()
        if use_native and args.pipelined:
            # host parse of chunk k+1 overlaps device/link work of chunk k
            # (wins on multi-core hosts; on a 1-core host the link transfer
            # itself is CPU-bound and overlap just thrashes)
            for _pcm in dec.decode_pipelined(chunks(), out_int16=True,
                                             compact=args.compact,
                                             use_pallas=use_pallas):
                pass
        else:
            pending = None
            for chunk in chunks():
                pcm = dec.step_raw(chunk, out_int16=True, materialize=False,
                                   use_pallas=use_pallas,
                                   compact=args.compact)
                if pending is not None:
                    dec.finalize_step(pending)
                pending = pcm
            if pending is not None:
                dec.finalize_step(pending)
        wall = time.time() - t1
        audio_seconds = args.streams * n_frames * 1024 / sr
        rt = audio_seconds / wall
        if args.verbose:
            print(f"# rep: {wall*1e3:.0f} ms for {audio_seconds:.0f}s audio "
                  f"-> {rt:.0f}x", file=sys.stderr)
        vals.append(round(rt, 1))
    if profiler_ctx is not None:
        profiler_ctx.__exit__(None, None, None)

    best = max(vals)
    result = {
        "metric": "aggregate_realtime_x",
        "value": best,
        "median": _median(vals),
        "reps": vals,
        "unit": f"x_realtime ({args.streams} AAC-LC stereo streams, 1 chip, "
                f"end-to-end incl. host parse + int16 PCM D2H"
                f"{', compact i16 H2D' if args.compact else ''}"
                f"{', fused pallas tail' if use_pallas else ''})",
        "vs_baseline": round(best / 1000.0, 3),
    }
    if use_native and not args.no_stages:
        # auditable per-stage accounting for ONE chunk (min over reps):
        # where the wall time actually goes on this host/link/chip
        stages = measure_stages(warm, next(chunks()), use_pallas,
                                args.compact)
        chunk_audio_s = args.streams * args.chunk * 1024 / sr
        stages["chunk_audio_s"] = round(chunk_audio_s, 2)
        stages["compute_realtime_x"] = round(
            chunk_audio_s / stages["compute_s"], 1) if stages["compute_s"] else None
        # steady-state pipeline accounting (VERDICT r4 #6): the best
        # rep's wall per chunk against two floors — the fully-serialized
        # stage sum and the overlapped floor (the link is half-duplex,
        # so H2D+D2H serialize and the floor is the largest of host
        # parse, link, device compute).  overlap_eff 1.0 = wall at the
        # overlapped floor, 0.0 = no overlap at all, <0 = wall beyond
        # even the serial sum: tunnel congestion, not pipeline shortfall.
        wall_chunk = audio_seconds / best / n_chunks
        ser = (stages["parse_s"] + stages["h2d_s"]
               + stages["compute_s"] + stages["d2h_s"])
        floor = max(stages["h2d_s"] + stages["d2h_s"],
                    stages["parse_s"], stages["compute_s"])
        stages["wall_chunk_s"] = round(wall_chunk, 4)
        stages["serial_floor_s"] = round(ser, 4)
        stages["overlap_floor_s"] = round(floor, 4)
        stages["pipeline_overlap_eff"] = (
            round((ser - wall_chunk) / (ser - floor), 3)
            if ser - floor > 1e-9 else None)
        result["stages"] = stages
    return result


def main() -> int:
    import os
    t_main0 = time.time()
    args = _parse_args()

    if args.encode:
        print(json.dumps(bench_encode(args.streams, args.seconds,
                                      args.chunk, args.repeats,
                                      pipelined=args.pipelined)))
        return 0
    if args.he or args.ps:
        print(json.dumps(bench_he(args.streams, args.seconds, args.chunk,
                                  args.repeats, ps=args.ps,
                                  pipelined=args.pipelined)))
        return 0

    result = bench_lc(args)
    if not args.lc_only:
        # the sub-benches run with smaller corpora (128 streams x 4 s,
        # 2 reps) so the whole artifact fits the budget; each mode is
        # individually guarded — a failure or an exhausted budget is
        # recorded instead of losing the artifact
        budget = float(os.environ.get("AACJAX_BENCH_BUDGET", "900"))
        modes = {}
        # HE/PS sub-benches run at HEADLINE scale (512 streams — the
        # compute-bound regime a production PCIe host sees); encode
        # stays at 128 to fit the budget
        sub = [
            ("he", lambda rb: bench_he(512, 4.0, 8, 2, ps=False,
                                       rep_budget_s=rb)),
            ("ps", lambda rb: bench_he(512, 4.0, 8, 2, ps=True,
                                       rep_budget_s=rb)),
            ("encode", lambda rb: bench_encode(128, 4.0, 8, 2,
                                               rep_budget_s=rb)),
        ]
        for name, fn in sub:
            remaining = budget - (time.time() - t_main0)
            if remaining < 150:
                modes[name] = {"skipped": f"budget ({remaining:.0f}s left)"}
                continue
            try:
                modes[name] = fn(min(330.0, remaining - 90))
            except Exception as e:  # noqa: BLE001 — keep the artifact
                modes[name] = {"error": repr(e)}
        result["modes"] = modes
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
