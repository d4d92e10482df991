#!/usr/bin/env python3
"""Dump a parser corpus for native/sanitize_harness.cc: valid streams
across every profile family / frame length with the per-stream table
rows the native ABI takes.

    python tools/gen_sanitize_corpus.py [outdir=/tmp/corpus] [n=160]
    g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
        -fno-sanitize-recover=all -pthread \
        -o /tmp/sanitize_harness native/sanitize_harness.cc
    ASAN_OPTIONS=detect_leaks=0 /tmp/sanitize_harness /tmp/corpus

File format: u32 profile, frame_len, sample_index, chan_config,
n_frames; per frame u32 len + bytes; then the stream_tables row
(swb_long[64], swb_long_count, swb_short[20], swb_short_count,
tns_max[2]) as little-endian i32.
"""
from __future__ import annotations

import os
import pathlib
import struct
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus"
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 160

    from aacjax.host import native
    from aacjax.host.asc import UnsupportedError, make_asc, parse_asc
    from aacjax.host.bitio import BitWriter
    from aacjax.testing import encoder as enc
    from aacjax.testing.specgen import (legal_sequence_chain,
                                        random_channel_spec,
                                        random_cpe_spec)

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(7)
    for case in range(total):
        profile, fl = [(2, 1024), (2, 960), (17, 1024), (17, 960),
                       (23, 512), (23, 480), (39, 512), (39, 480),
                       (1, 1024), (4, 1024)][case % 10]
        si = int(rng.integers(0, 12))
        ch = 2 if case % 3 else 1
        try:
            cfg = parse_asc(make_asc(profile, si, ch, frame_length=fl))
        except UnsupportedError:
            si = 4
            cfg = parse_asc(make_asc(profile, si, ch, frame_length=fl))
        er, eld = profile in (17, 23, 39), profile == 39
        kw = dict(allow_pulse=not er, allow_noise=not er)
        seqs = (legal_sequence_chain(rng, 3)
                if profile in (1, 2, 4, 17) and fl == 1024 else [0] * 3)
        def add_pred(spec, seq):
            """Predictive-profile side info (exercises the new native
            predictor/ltp_data parse incl. its mutant bit patterns)."""
            if seq == 2:
                return
            if profile == 1:
                n = min(spec.max_sfb, cfg.pred_sfb_max)
                spec.pred_used = rng.integers(0, 2, n) > 0
                if rng.random() < 0.5:
                    spec.pred_reset_group = int(rng.integers(1, 31))
            elif profile == 4:
                spec.ltp_lag = int(rng.integers(0, 2048))
                spec.ltp_coef_idx = int(rng.integers(8))
                spec.ltp_used = rng.integers(0, 2, 40) > 0

        pays = []
        for s in seqs:
            if ch == 2 and not er:
                cpe = random_cpe_spec(rng, cfg)
                if profile in (1, 4) and cpe.common_window:
                    add_pred(cpe.left, cpe.left.window_sequence)
                    add_pred(cpe.right, cpe.right.window_sequence)
                w = BitWriter()
                enc.write_cpe(w, cpe, cfg)
                pays.append(enc.end_frame(w))
            elif ch == 2:
                left = random_channel_spec(rng, cfg, window_sequence=s, **kw)
                right = random_channel_spec(
                    rng, cfg, window_sequence=s, grouping=left.grouping,
                    max_sfb=left.max_sfb, window_shape=left.window_shape,
                    **kw)
                spec = enc.CPESpec(left=left, right=right,
                                   common_window=True, ms_type=2)
                pays.append(enc.write_eld_frame([("CPE", spec)], cfg)
                            if eld
                            else enc.write_er_frame([("CPE", spec)], cfg))
            else:
                spec = random_channel_spec(rng, cfg, window_sequence=s, **kw)
                if profile in (1, 4):
                    add_pred(spec, s)
                if eld:
                    pays.append(enc.write_eld_frame([("SCE", spec)], cfg))
                elif er:
                    pays.append(enc.write_er_frame([("SCE", spec)], cfg))
                else:
                    w = BitWriter()
                    enc.write_sce(w, spec, cfg)
                    pays.append(enc.end_frame(w))
        tp = native.stream_tables([cfg])
        with open(os.path.join(outdir, f"{case:03d}.bin"), "wb") as f:
            f.write(struct.pack("<5I", profile, fl, si, cfg.chan_config,
                                len(pays)))
            for p in pays:
                f.write(struct.pack("<I", len(p)))
                f.write(p)
            f.write(tp["swb_long"].astype("<i4").tobytes())
            f.write(tp["swb_long_count"].astype("<i4").tobytes())
            f.write(tp["swb_short"].astype("<i4").tobytes())
            f.write(tp["swb_short_count"].astype("<i4").tobytes())
            f.write(tp["tns_max"].astype("<i4").tobytes())
    print(f"wrote {total} corpus files to {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
