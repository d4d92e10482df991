#!/usr/bin/env python3
"""Pre-warm the persistent XLA compile cache for the serving programs.

The batched codec programs are large enough that a cold XLA compile
through a remote backend takes minutes; aacjax enables JAX's
persistent compilation cache by default (aacjax/__init__.py), so one
run of this tool makes every later process — serving, bench, driver —
start compile-free.

    python tools/warm_compile_cache.py              # decode programs
    python tools/warm_compile_cache.py --encode     # + batch encoder
    python tools/warm_compile_cache.py --streams 512 --chunk 4
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def warm_decode(n_streams: int, chunk: int) -> None:
    import jax
    from aacjax.host import adts
    from aacjax.host.asc import make_asc, parse_asc
    from aacjax.runtime.batch import BatchDecoder
    from aacjax.testing.encoder import encode_pcm

    cfg = parse_asc(make_asc(2, 4, 2))
    t = np.arange(1024 * chunk) / cfg.sample_rate
    x = 8000 * np.sin(2 * np.pi * 440 * t)
    data = encode_pcm(np.stack([x, 0.8 * x], axis=1), cfg, target_sf=130)
    frames = [data[s:e] for _, s, e in adts.split_frames(data)]
    dec = BatchDecoder([cfg] * n_streams, chunk_frames=chunk)
    t0 = time.time()
    out = dec.step_raw([frames[:chunk]] + [None] * (n_streams - 1),
                       out_int16=True)
    jax.block_until_ready(out)
    print(f"decode step ({n_streams} streams x {chunk} frames): "
          f"{time.time() - t0:.1f}s", flush=True)


def warm_encode(n_streams: int, chunk: int) -> None:
    import jax
    from aacjax.encode_batch import BatchEncoder

    enc = BatchEncoder(44100, 2, 128_000, n_streams=n_streams)
    pcm = np.zeros((n_streams, chunk * 1024, 2), np.float32)
    t0 = time.time()
    enc.encode_chunk(pcm)
    jax.block_until_ready(())
    print(f"encode analysis+quantize ({n_streams} streams x {chunk} "
          f"frames): {time.time() - t0:.1f}s", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--encode", action="store_true")
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args()
    import aacjax  # noqa: F401 — wires the persistent cache config
    import jax
    print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)
    if not args.no_decode:
        warm_decode(args.streams, args.chunk)
    if args.encode:
        warm_encode(args.streams, args.chunk)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
