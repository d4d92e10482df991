"""Command-line interface: decode / probe / bench / info.

  python -m aacjax.cli decode input.aac output.pcm [--int16]
  python -m aacjax.cli probe input.aac
  python -m aacjax.cli info
"""
from __future__ import annotations

import argparse
import json
import sys


def cmd_decode(args) -> int:
    import numpy as np
    from aacjax.api import decode_adts

    data = open(args.input, "rb").read()
    pcm, rate = decode_adts(data, chunk_frames=args.chunk)
    if args.int16:
        out = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16)
    else:
        out = pcm.astype(np.float32)
    out.tofile(args.output)
    print(json.dumps({
        "samples": int(pcm.shape[0]),
        "channels": int(pcm.shape[1]),
        "sample_rate": rate,
        "format": "int16" if args.int16 else "float32",
        "output": args.output,
    }))
    return 0


def cmd_probe(args) -> int:
    from aacjax.host import adts
    from aacjax.host.asc import parse_asc

    data = open(args.input, "rb").read()
    ok = adts.probe(data)
    result = {"adts": bool(ok)}
    if ok:
        frames = adts.split_frames(data)
        if frames:
            header = frames[0][0]
            cfg = parse_asc(adts.synthesize_cookie(header))
            result.update(sample_rate=cfg.sample_rate,
                          channels=cfg.chan_config,
                          profile=cfg.profile,
                          frames=len(frames))
    print(json.dumps(result))
    return 0 if ok else 1


def cmd_info(args) -> int:
    import jax

    from aacjax.host import native

    print(json.dumps({
        "version": __import__("aacjax").__version__,
        "native_parser": native.available(),
        "jax_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="aacjax")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("decode", help="decode an ADTS .aac file to raw PCM")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--chunk", type=int, default=64)
    d.add_argument("--int16", action="store_true")
    d.set_defaults(fn=cmd_decode)

    p = sub.add_parser("probe", help="probe a file for ADTS AAC")
    p.add_argument("input")
    p.set_defaults(fn=cmd_probe)

    i = sub.add_parser("info", help="environment / backend info")
    i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
