#!/usr/bin/env python3
"""Differential fuzz campaign: native C++ parser vs python parser vs the
fp64 model decoder, across profiles, frame lengths, channel modes and
coding tools.

For each case a random conformant stream is generated
(aacjax.testing.specgen), then:
  1. native parse + device step  ==  python parse + device step
     (bit-identical — same float32 operation order by construction)
  2. device step  ~=  fp64 model decoder (rel err < 2e-5)
  3. a bit-flipped mutant of the same stream must decode, conceal, or
     fail cleanly on both parsers (finite outputs, no crashes)

Usage:  python tools/diff_fuzz.py [--cases N] [--seed S]
Exits nonzero on the first divergence, printing a reproducer line.
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))


def run_case(seed: int) -> str:
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.host.bitio import BitWriter
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing import encoder as enc
    from aacjax.testing.specgen import (legal_sequence_chain,
                                        random_channel_spec,
                                        random_cpe_spec)
    from model_decoder import ModelDecoder

    rng = np.random.default_rng(seed)
    profile, frame_length = [
        (2, 1024), (2, 1024), (2, 1024), (2, 960),
        (17, 1024), (17, 960), (23, 512), (23, 480),
        (39, 512), (39, 480),
    ][int(rng.integers(0, 10))]
    si = int(rng.integers(0, 12))
    stereo = bool(rng.integers(0, 2))
    from aacjax.host.asc import UnsupportedError
    try:
        cfg = parse_asc(make_asc(profile, si, 2 if stereo else 1,
                                 frame_length=frame_length))
    except UnsupportedError:
        # LD/ELD are undefined at some sampling indices — legal rejection
        si = 4
        cfg = parse_asc(make_asc(profile, si, 2 if stereo else 1,
                                 frame_length=frame_length))
    n_frames = int(rng.integers(2, 6))
    er = profile in (17, 23, 39)
    eld = profile == 39
    kw = dict(allow_pulse=not er, allow_noise=not er)
    seqs = (legal_sequence_chain(rng, n_frames)
            if profile in (2, 17) and frame_length == 1024
            else [0] * n_frames)
    payloads = []
    for s in seqs:
        if stereo:
            if er:
                left = random_channel_spec(rng, cfg, window_sequence=s, **kw)
                right = random_channel_spec(
                    rng, cfg, window_sequence=s, grouping=left.grouping,
                    max_sfb=left.max_sfb,
                    window_shape=left.window_shape, allow_intensity=True,
                    **kw)
                ms_type = int(rng.integers(0, 3))
                ms_used = ((rng.random(left.max_sfb * left.group_count)
                            < 0.5).astype(np.int64)
                           if ms_type == 1 else None)
                spec = enc.CPESpec(left=left, right=right,
                                   common_window=True, ms_type=ms_type,
                                   ms_used=ms_used)
                payloads.append(enc.write_eld_frame([("CPE", spec)], cfg)
                                if eld
                                else enc.write_er_frame([("CPE", spec)],
                                                        cfg))
            else:
                w = BitWriter()
                enc.write_cpe(w, random_cpe_spec(rng, cfg), cfg)
                payloads.append(enc.end_frame(w))
        else:
            spec = random_channel_spec(rng, cfg, window_sequence=s, **kw)
            if eld:
                payloads.append(enc.write_eld_frame([("SCE", spec)], cfg))
            elif er:
                payloads.append(enc.write_er_frame([("SCE", spec)], cfg))
            else:
                w = BitWriter()
                enc.write_sce(w, spec, cfg)
                payloads.append(enc.end_frame(w))

    label = (f"seed={seed} AOT{profile} F={frame_length} si={si} "
             f"{'CPE' if stereo else 'SCE'} frames={n_frames}")

    # 1) native == python (bit-exact on the exact-f32 transfer; the
    #    DEFAULT compact int16 transfer is deliberately lossy, so it is
    #    checked separately against its documented fidelity bound)
    nat = BatchDecoder([cfg], chunk_frames=n_frames)
    ref = BatchDecoder([cfg], chunk_frames=n_frames, use_native=False)
    frames = ref.parse_stream_frames(0, payloads)
    want = ref.stream_pcm(ref.step([frames]), 0, n_frames)
    if nat.use_native:
        got = nat.stream_pcm(nat.step_raw([payloads], compact=False),
                             0, n_frames)
        if int(nat._last_status[0]) != 0:
            return f"{label}: native status {nat._last_status[0]}"
        if not np.array_equal(got, want):
            d = float(np.abs(got - want).max())
            return f"{label}: native != python (max abs {d})"
        # compact leg: block-scaled int16 spectra, <= 2 LSB of each
        # 16-bin block's max |coeff| through the decode chain
        # (tests/test_native.py::test_compact_spec_transfer_close_to_exact).
        # Engineering bound for the harness: per-bin error <= 2*specmax/
        # 32767; the IMDCT row sums give <= 4x that in time domain, and
        # the PCM-peak term covers TNS/coupling gain (error and signal
        # ride the same filters).
        natc = BatchDecoder([cfg], chunk_frames=n_frames)
        gotc = natc.stream_pcm(natc.step_raw([payloads], compact=True),
                               0, n_frames)
        nats = BatchDecoder([cfg], chunk_frames=n_frames)
        specmax = float(np.abs(
            nats._parse_native([payloads], compact=False)['spec']).max())
        bound = (2.5 / 32767.0) * max(1.0, float(np.abs(want).max()),
                                      4.0 * specmax)
        dc = float(np.abs(gotc - want).max())
        if dc > bound:
            return (f"{label}: compact transfer err {dc:.3g} "
                    f"> bound {bound:.3g}")

    # 2) device ~= fp64 model
    model = ModelDecoder(cfg, n_channels=2 if stereo else 1)
    exact = np.concatenate([model.decode_frame(f) for f in frames], axis=0)
    scale = max(1.0, float(np.abs(exact).max()))
    err = float(np.abs(want - exact).max()) / scale
    if err > 2e-5:
        return f"{label}: device vs fp64 model rel err {err:.2e}"

    # 3) mutants stay clean on both parsers
    mut = [bytearray(p) for p in payloads]
    for p in mut:
        pos = int(rng.integers(0, len(p)))
        p[pos] ^= 1 << int(rng.integers(8))
    mut = [bytes(p) for p in mut]
    nat2 = BatchDecoder([cfg], chunk_frames=n_frames)
    pcm2 = nat2.step_raw([mut])
    if not np.isfinite(pcm2).all():
        return f"{label}: native mutant produced non-finite output"
    py2 = BatchDecoder([cfg], chunk_frames=n_frames, use_native=False)
    pcm3 = py2.step_raw([mut])
    if not np.isfinite(pcm3).all():
        return f"{label}: python mutant produced non-finite output"
    return ""


def run_he_case(seed: int) -> str:
    """Randomized HE-AAC differential: the batched device SBR program
    (decode_adts -> step_he_raw) vs the per-channel numpy reference
    (AACDecoder streaming path, itself held sample-exact vs libavcodec
    in tests/test_sbr.py), over random headers, envelope grids (all four
    VAR classes with overhanging borders), inverse-filter transitions,
    harmonics and noise floors; plus batched chunk-size invariance."""
    import numpy as np
    from aacjax.api import AACDecoder, decode_adts
    from aacjax.host import sbr as S
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import SBRFrameSpec, sbr_payload
    from test_sbr import _lowpass_noise

    rng = np.random.default_rng(seed)
    ch = int(rng.integers(1, 3))
    h = S.SBRHeader(amp_res=int(rng.integers(0, 2)),
                    start_freq=int(rng.integers(2, 7)),
                    stop_freq=int(rng.integers(1, 5)), xover_band=0)
    core_cfg = parse_asc(make_asc(2, 7, ch))
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    n_frames = int(rng.integers(6, 10))
    label = (f"seed={seed} HE ch={ch} amp={h.amp_res} "
             f"sf={h.start_freq}/{h.stop_freq} frames={n_frames}")

    def rand_spec(first):
        fres = int(rng.integers(0, 2))
        nb = t.n_bands(fres)
        kw = dict(frame_class=S.FIXFIX, num_env=int(rng.choice([1, 2, 4])))
        if not first and rng.random() < 0.6:
            fc = int(rng.integers(1, 4))
            ne = 1 if fc == S.VARVAR else int(rng.integers(1, 3))
            kw = dict(frame_class=fc, num_env=ne)
            if fc in (S.FIXVAR, S.VARVAR):
                vb = int(rng.integers(0, 4))
                kw["var_bord_1"] = vb
                kw["rel_widths"] = ([2 * int(rng.integers(1, 5))]
                                    if ne == 2 and fc == S.FIXVAR else [])
                kw["pointer"] = int(rng.integers(0, ne + 1))
            if fc in (S.VARFIX, S.VARVAR):
                kw["abs_bord_0"] = int(rng.integers(0, 4))
                kw["rel_widths_lead"] = ([2 * int(rng.integers(1, 5))]
                                         if ne == 2 and fc == S.VARFIX
                                         else [])
        ne = kw["num_env"]
        nn = 2 if ne > 1 else 1
        # envelope/noise values as bounded random walks: the writer
        # freq-delta-codes adjacent bands, so steps must stay inside the
        # Huffman books; even values keep the amp_res=0 halving exact
        hi = (40 if h.amp_res else 80) // 2
        env = np.clip(rng.integers(5, hi - 5)
                      + np.cumsum(rng.integers(-3, 4, (ne, nb)), axis=1),
                      0, hi) * 2
        nz = np.clip(15 + np.cumsum(rng.integers(-3, 4, (nn, t.n_q)),
                                    axis=1), 0, 30)
        return SBRFrameSpec(
            freq_res=fres, invf=list(rng.integers(0, 4, t.n_q)),
            env_q=env.astype(np.int64), noise_q=nz.astype(np.int64),
            add_harmonic=(rng.random(t.n_high) < 0.15),
            **kw)

    pays = []
    for f in range(n_frames):
        sp = [rand_spec(f == 0)] if ch == 1 else \
             [rand_spec(f == 0), rand_spec(f == 0)]
        pays.append(sbr_payload(sp, h, 2 * core_cfg.sample_rate,
                                write_header=(f == 0)))
    x = _lowpass_noise(rng, 1024 * n_frames, ch)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)

    dec = AACDecoder()
    dec.feed(stream)
    chunks = []
    while (c := dec.read_chunk()) is not None:
        chunks.append(c.reshape(-1, ch))
    want = np.concatenate(chunks, axis=0)

    got, rate = decode_adts(stream, chunk_frames=3)
    if rate != 44100 or got.shape[1] != ch:
        return f"{label}: batched emitted {got.shape} @ {rate}"
    n = min(len(want), len(got))
    sl = slice(2 * 2048, n - 64)   # QMF warm-up convention (test_sbr)
    scale = max(float(np.abs(want[sl]).max()), 1e-3)
    err = float(np.abs(got[sl] - want[sl]).max()) / scale
    if not np.isfinite(got).all() or err > 1e-3:
        return f"{label}: batched vs numpy rel err {err:.2e}"

    got2, _ = decode_adts(stream, chunk_frames=n_frames)
    n2 = min(len(got), len(got2))
    err2 = float(np.abs(got[:n2] - got2[:n2]).max()) / scale
    if err2 > 3e-4:
        return f"{label}: chunk-size variance {err2:.2e}"
    return ""


def run_ps_case(seed: int) -> str:
    """Randomized HE-AAC v2 differential: the batched SBR+PS device
    program vs the numpy reference (AACDecoder streaming path, held
    sample-exact vs libavcodec in tests/test_ps.py) over random IID/ICC
    modes and band counts (10/20/34), envelope counts, IPD/OPD phase
    tracks, and occasional mid-stream band-mode flips (which divert the
    slot to the sticky numpy path inside the batched decoder)."""
    import numpy as np
    from aacjax.api import AACDecoder, decode_adts
    from aacjax.host import sbr as S
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.testing import encoder as enc
    from aacjax.testing.sbr_encoder import PSSpec, SBRFrameSpec, sbr_payload
    from test_sbr import _lowpass_noise

    rng = np.random.default_rng(seed)
    core_cfg = parse_asc(make_asc(2, 7, 1))
    h = S.SBRHeader(amp_res=1, start_freq=4, stop_freq=3, xover_band=0)
    t = S.derive_tables(h, 2 * core_cfg.sample_rate)
    nb = t.n_bands(1)
    n_frames = int(rng.integers(6, 10))
    mode = int(rng.integers(0, 3))
    label = f"seed={seed} PS mode={mode} frames={n_frames}"

    def rand_ps(mode):
        # parameters as small-step walks (delta-coded payloads must fit
        # the 270-byte FIL budget) and <=2 envelopes at the wide modes
        nr = (10, 20, 34)[mode]
        ne = int(rng.choice([1, 2, 4] if mode == 0 else [1, 2]))
        iid = np.clip(np.cumsum(rng.integers(-2, 3, (ne, nr)), axis=1),
                      -7, 7)
        icc = np.clip(3 + np.cumsum(rng.integers(-2, 3, (ne, nr)), axis=1),
                      0, 7)
        kw = dict(iid_mode=mode, num_env=ne, iid_par=iid,
                  icc_mode=mode, icc_par=icc)
        if rng.random() < 0.6:
            nri = (5, 11, 17)[mode]
            kw["ipd_par"] = np.clip(
                np.cumsum(rng.integers(-1, 2, (ne, nri)), axis=1) % 8,
                0, 7)
            kw["opd_par"] = np.clip(
                np.cumsum(rng.integers(-1, 2, (ne, nri)), axis=1) % 8,
                0, 7)
        return PSSpec(**kw)

    pays, modes = [], []
    for f in range(n_frames):
        m = mode
        if f > 2 and rng.random() < 0.15:      # mid-stream mode flip
            m = int(rng.integers(0, 3))
        modes.append(m)
        spec = SBRFrameSpec(num_env=2, freq_res=1, invf=[1] * t.n_q,
                            env_q=np.full((2, nb), 25, np.int64),
                            noise_q=np.full((2, t.n_q), 30, np.int64))
        pays.append(sbr_payload([spec], h, 2 * core_cfg.sample_rate,
                                ps=rand_ps(m), write_header=(f == 0)))
    x = _lowpass_noise(rng, 1024 * n_frames, 1)
    frames = enc.encode_pcm_frames(x, core_cfg, target_sf=118,
                                   fil_payloads=pays)
    stream = b"".join(enc.adts_frame(p, core_cfg) for p in frames)

    dec = AACDecoder()
    dec.feed(stream)
    chunks = []
    while (c := dec.read_chunk()) is not None:
        chunks.append(c.reshape(-1, 2))
    want = np.concatenate(chunks, axis=0)

    got, rate = decode_adts(stream, chunk_frames=3)
    if rate != 44100 or got.shape[1] != 2:
        return f"{label}: batched emitted {got.shape} @ {rate}"
    if not np.isfinite(got).all():
        return f"{label}: non-finite batched output"
    n = min(len(want), len(got))
    scale = max(float(np.abs(want[2 * 2048: n - 64]).max()), 1e-3)
    # no exclusion around band-mode flips: the sticky transition seeds
    # the numpy fallback WARM from the batched state (runtime.batch
    # _seed_ps_np), so even the flip chunk stays at float noise
    for f in range(2, n_frames):
        sl = slice(f * 2048 + 64, min((f + 1) * 2048, n - 64))
        if sl.start >= sl.stop:
            continue
        err = float(np.abs(got[sl] - want[sl]).max()) / scale
        if err > 3e-3:
            return f"{label}: batched vs numpy rel err {err:.2e} at f{f}"

    # re-adoption: a flipped slot rides the numpy fallback for AT MOST
    # its flip chunk — the next chunk boundary re-elects the kernel band
    # mode and rebuilds the device state (_readopt_sticky); no slot may
    # remain a permanent numpy resident
    import aacjax.host.adts as adts
    from aacjax.runtime.batch import BatchDecoder
    fr = adts.split_frames(stream)
    bd = BatchDecoder([parse_asc(adts.synthesize_cookie(fr[0][0]))],
                      chunk_frames=3, cce_slots=1)
    payloads = [stream[s:e] for _, s, e in fr]
    flip_chunks = {f // 3 for f in range(1, len(modes))
                   if modes[f] != modes[f - 1]}
    for k in range(0, len(payloads), 3):
        bd.step_he_raw([payloads[k: k + 3]])
        if any(bd._sbr_np_sticky) and (k // 3) not in flip_chunks:
            return (f"{label}: slot still sticky after chunk {k // 3} "
                    f"(flips at {sorted(flip_chunks)})")
    return ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--encoders", action="store_true",
                    help="fuzz the encoder roundtrips instead of the parsers")
    ap.add_argument("--he", action="store_true",
                    help="fuzz the HE-AAC batched-vs-numpy decode paths")
    ap.add_argument("--ps", action="store_true",
                    help="fuzz the HE-AAC v2 (PS) batched-vs-numpy paths")
    args = ap.parse_args()
    case_fn = (run_ps_case if args.ps
               else run_he_case if args.he
               else run_encoder_case if args.encoders else run_case)
    fails = 0
    for i in range(args.cases):
        msg = case_fn(args.seed * 1_000_000 + i)
        if msg:
            print("FAIL", msg)
            fails += 1
            if fails >= 5:
                break
        elif (i + 1) % 50 == 0:
            print(f"# {i + 1}/{args.cases} ok")
    print(f"{args.cases - fails}/{args.cases} cases clean")
    return 1 if fails else 0




def run_encoder_case(seed: int) -> str:
    """Randomized encoder roundtrip: random content/profile/bitrate ->
    encode -> strict decode -> finite output with sane energy."""
    from scipy import signal as sig
    from aacjax import decode_adts, decode_loas
    from aacjax.encode import AACEncoder
    from aacjax.encode_he import HEAACEncoder

    rng = np.random.default_rng(seed)
    sr = [44100, 48000, 32000][int(rng.integers(0, 3))]
    n = 2048 * int(rng.integers(3, 7))
    t = np.arange(n) / sr
    x = np.zeros(n)
    for _ in range(int(rng.integers(1, 4))):
        f0 = float(rng.uniform(80, sr * 0.4))
        x += float(rng.uniform(500, 12000)) * np.sin(2 * np.pi * f0 * t)
    if rng.random() < 0.7:
        x += sig.lfilter(*sig.butter(4, float(rng.uniform(0.1, 0.9))),
                         rng.standard_normal(n)) * float(rng.uniform(100, 4000))
    if rng.random() < 0.3:   # clicks
        x[::int(rng.integers(1500, 4000))] += 20000.0
    x = np.clip(x, -32768, 32767)
    stereo = bool(rng.integers(0, 2))
    pcm = (np.stack([x, x * float(rng.uniform(-1, 1))], axis=1)
           if stereo else x.reshape(-1, 1))
    nch = pcm.shape[1]
    br = int(rng.integers(24, 256)) * 1000
    kind = ["lc", "lc960", "ld", "eld", "he", "hev2"][int(rng.integers(0, 6))]
    label = f"enc seed={seed} {kind} sr={sr} ch={nch} br={br}"
    try:
        if kind == "lc":
            out, _ = decode_adts(AACEncoder(sr, nch, br).encode(pcm),
                                 on_error="raise")
        elif kind == "lc960":
            enc = AACEncoder(sr, nch, br, frame_length=960)
            out, _ = decode_loas(enc.encode_loas(pcm), on_error="raise")
        elif kind == "ld":
            enc = AACEncoder(sr, nch, br, profile=23)
            out, _ = decode_loas(enc.encode_loas(pcm), on_error="raise")
        elif kind == "eld":
            enc = AACEncoder(sr, nch, br, profile=39)
            out, _ = decode_loas(enc.encode_loas(pcm), on_error="raise")
        elif kind == "he":
            out, _ = decode_adts(HEAACEncoder(sr, nch, min(br, 64000))
                                 .encode(pcm), on_error="raise")
        else:
            if nch != 2:
                return ""
            out, _ = decode_adts(
                HEAACEncoder(sr, 2, min(br, 48000), ps=True).encode(pcm),
                on_error="raise")
    except Exception as e:  # noqa: BLE001 — any crash is a finding
        return f"{label}: {type(e).__name__}: {e}"
    if not np.isfinite(out).all():
        return f"{label}: non-finite decode"
    if float(np.abs(pcm).max()) > 100 and float(np.abs(out).max()) < 1e-5:
        return f"{label}: decode is silent for loud input"
    # third-party acceptance: libavcodec must also decode the stream
    # (ADTS container kinds only; it catches writer bugs our own
    # decoder might tolerate)
    from aacjax.testing import ffmpeg_oracle
    if ffmpeg_oracle.available() and kind in ("lc", "he", "hev2"):
        try:
            ref, _ = ffmpeg_oracle.decode_adts(
                AACEncoder(sr, nch, br).encode(pcm) if kind == "lc"
                else HEAACEncoder(sr, nch, min(br, 64000),
                                  ps=kind == "hev2").encode(pcm))
        except Exception as e:  # noqa: BLE001
            return f"{label}: libavcodec rejected: {type(e).__name__}: {e}"
        if not np.isfinite(ref).all():
            return f"{label}: libavcodec produced non-finite output"
    return ""


if __name__ == "__main__":
    sys.exit(main())
