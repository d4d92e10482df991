"""SBR bitstream writer (test corpus generation only).

Emits sbr_extension_data payloads inside FIL elements — the implicit
HE-AAC signaling that ADTS streams use.  Scope: FIXFIX frame classes with
chosen envelope/noise scalefactors; enough to build conformance streams
that libavcodec accepts and decodes, arbitrating aacjax's SBR decoder
(the reference has no SBR at all, decoder.js:279-280).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from aacjax.host.bitio import BitWriter
from aacjax.host import sbr as sbrmod


def _enc(writer: BitWriter, book, value: int) -> None:
    lav = (len(book.values) - 1) // 2
    ln, code = book.enc[(int(value),)]
    del lav
    writer.write(code, ln)


def _enc_delta(writer: BitWriter, book, delta: int) -> None:
    ln, code = book.enc[(int(delta),)]
    writer.write(code, ln)


@dataclass
class SBRFrameSpec:
    """One channel's SBR payload: FIXFIX grid with quantized values."""
    num_env: int = 1                      # 1, 2 or 4 (FIXFIX)
    freq_res: int = 1                     # single flag for all envelopes
    invf: list[int] = field(default_factory=lambda: [1])   # per noise band
    env_q: np.ndarray | None = None       # [num_env, n_bands] quantized
    noise_q: np.ndarray | None = None     # [num_noise, n_q] quantized
    df_env_time: bool = False             # delta-time coding (needs history)


def write_sbr_header(w: BitWriter, h: sbrmod.SBRHeader) -> None:
    w.write(h.amp_res, 1)
    w.write(h.start_freq, 4)
    w.write(h.stop_freq, 4)
    w.write(h.xover_band, 3)
    w.write(0, 2)  # reserved
    defaults1 = (h.freq_scale, h.alter_scale, h.noise_bands) == (2, 1, 2)
    defaults2 = (h.limiter_bands, h.limiter_gains, h.interpol_freq,
                 h.smoothing_mode) == (2, 2, 1, 1)
    w.write(0 if defaults1 else 1, 1)
    w.write(0 if defaults2 else 1, 1)
    if not defaults1:
        w.write(h.freq_scale, 2)
        w.write(h.alter_scale, 1)
        w.write(h.noise_bands, 2)
    if not defaults2:
        w.write(h.limiter_bands, 2)
        w.write(h.limiter_gains, 2)
        w.write(h.interpol_freq, 1)
        w.write(h.smoothing_mode, 1)


def _write_grid(w: BitWriter, spec: SBRFrameSpec) -> None:
    w.write(0, 2)  # FIXFIX
    w.write({1: 0, 2: 1, 4: 2}[spec.num_env], 2)
    w.write(spec.freq_res, 1)


def _write_channel(w: BitWriter, spec: SBRFrameSpec, h: sbrmod.SBRHeader,
                   t: sbrmod.SBRTables) -> None:
    books = sbrmod._books()
    amp_res = 0 if spec.num_env == 1 else h.amp_res
    _write_grid(w, spec)
    num_noise = 2 if spec.num_env > 1 else 1
    for _ in range(spec.num_env):
        w.write(0, 1)   # bs_df_env: delta-freq (PCM start value)
    for _ in range(num_noise):
        w.write(0, 1)   # bs_df_noise
    for v in spec.invf:
        w.write(v, 2)
    # envelopes (delta-freq coded)
    if amp_res:
        bits, fh = 6, books["f_huffman_env_3_0dB"]
    else:
        bits, fh = 7, books["f_huffman_env_1_5dB"]
    n = t.n_bands(spec.freq_res)
    env_q = spec.env_q
    assert env_q.shape[1] >= n
    for e in range(spec.num_env):
        w.write(int(env_q[e, 0]), bits)
        for j in range(1, n):
            _enc_delta(w, fh, int(env_q[e, j]) - int(env_q[e, j - 1]))
    # noise floors (delta-freq coded)
    fh_n = books["f_huffman_env_3_0dB"]
    noise_q = spec.noise_q
    for e in range(num_noise):
        w.write(int(noise_q[e, 0]), 5)
        for j in range(1, t.n_q):
            _enc_delta(w, fh_n, int(noise_q[e, j]) - int(noise_q[e, j - 1]))
    w.write(0, 1)  # bs_add_harmonic_flag
    # NOTE: bs_extended_data is written by the caller once per element


def sbr_payload(specs: list[SBRFrameSpec], h: sbrmod.SBRHeader,
                sample_rate_out: int, write_header: bool = True) -> bytes:
    """Build the sbr_extension_data bits for an SCE (1 spec) or CPE
    (2 specs, non-coupled).  Returns whole bytes (caller wraps in FIL)."""
    t = sbrmod.derive_tables(h, sample_rate_out)
    w = BitWriter()
    w.write(sbrmod.EXT_SBR_DATA, 4)     # extension_type
    w.write(1 if write_header else 0, 1)
    if write_header:
        write_sbr_header(w, h)
    if len(specs) == 1:
        w.write(0, 1)  # bs_data_extra
        _write_channel(w, specs[0], h, t)
    else:
        w.write(0, 1)  # bs_data_extra
        w.write(0, 1)  # bs_coupling = 0
        _write_grid(w, specs[0])
        _write_grid(w, specs[1])
        for spec in specs:
            for _ in range(spec.num_env):
                w.write(0, 1)
            for _ in range(2 if spec.num_env > 1 else 1):
                w.write(0, 1)
        del spec
        for s in specs:
            for v in s.invf:
                w.write(v, 2)
        books = sbrmod._books()
        for s in specs:
            amp_res = 0 if s.num_env == 1 else h.amp_res
            if amp_res:
                bits, fh = 6, books["f_huffman_env_3_0dB"]
            else:
                bits, fh = 7, books["f_huffman_env_1_5dB"]
            n = t.n_bands(s.freq_res)
            for e in range(s.num_env):
                w.write(int(s.env_q[e, 0]), bits)
                for j in range(1, n):
                    _enc_delta(w, fh, int(s.env_q[e, j]) - int(s.env_q[e, j - 1]))
        fh_n = books["f_huffman_env_3_0dB"]
        for s in specs:
            for e in range(2 if s.num_env > 1 else 1):
                w.write(int(s.noise_q[e, 0]), 5)
                for j in range(1, t.n_q):
                    _enc_delta(w, fh_n,
                               int(s.noise_q[e, j]) - int(s.noise_q[e, j - 1]))
        w.write(0, 1)  # add_harmonic ch0
        w.write(0, 1)  # add_harmonic ch1
    w.write(0, 1)      # bs_extended_data
    w.align()
    return w.getvalue()


def write_sbr_fil(w: BitWriter, payload: bytes) -> None:
    """Wrap an sbr_extension_data payload in a FIL element
    (decoder.js:187-193 framing; count covers the payload bytes)."""
    count = len(payload)
    w.write(6, 3)  # FIL
    if count >= 15:
        w.write(15, 4)
        w.write(count - 14, 8)
    else:
        w.write(count, 4)
    for b in payload:
        w.write(b, 8)
