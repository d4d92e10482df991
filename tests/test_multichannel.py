"""Extended channel configurations 11/12/13 (6.1, 7.1-back, 22.2 —
ISO/IEC 14496-3 Amd.4 Table 1.19 additions; the reference handles only
1..8, decoder.js:40-47).  ADTS cannot express these (3-bit field), so
they travel via LOAS/LATM or raw ASC.

Output permutations in api.CANONICAL_ORDER were pinned empirically
against libavcodec by giving every element channel a distinct spectral
marker band and matching each oracle output channel's peak.
"""
import numpy as np
import pytest

from aacjax import decode_loas
from aacjax.api import CANONICAL_ORDER, to_canonical_order
from aacjax.host.asc import UnsupportedError, make_asc, parse_asc
from aacjax.host.bitio import BitWriter
from aacjax.testing import encoder as enc
from aacjax.testing import ffmpeg_oracle
from aacjax.testing.specgen import random_channel_spec

HAVE_ORACLE = ffmpeg_oracle.available()

# ISO/IEC 14496-3 Table 1.19 element layouts (matches libavcodec's
# aac_channel_layout_map, extracted from aacdec.o)
LAYOUTS = {
    11: [("SCE", 0), ("CPE", 0), ("CPE", 1), ("SCE", 1), ("LFE", 0)],
    12: [("SCE", 0), ("CPE", 0), ("CPE", 1), ("CPE", 2), ("LFE", 0)],
    13: [("SCE", 0), ("CPE", 0), ("CPE", 1), ("CPE", 2), ("CPE", 3),
         ("SCE", 1), ("LFE", 0), ("LFE", 1), ("SCE", 2), ("CPE", 4),
         ("CPE", 5), ("SCE", 3), ("CPE", 6), ("SCE", 4), ("SCE", 5),
         ("CPE", 7)],
}
N_CH = {11: 7, 12: 8, 13: 24}


def build_stream(rng, cfg, layout, n_frames=4):
    payloads = []
    for _ in range(n_frames):
        w = BitWriter()
        for kind, inst in layout:
            if kind in ("SCE", "LFE"):
                s = random_channel_spec(rng, cfg, window_sequence=0,
                                        allow_pulse=False,
                                        allow_noise=False)
                enc.write_sce(w, s, cfg, instance=inst, lfe=kind == "LFE")
            else:
                left = random_channel_spec(rng, cfg, window_sequence=0,
                                           allow_pulse=False,
                                           allow_noise=False)
                right = random_channel_spec(
                    rng, cfg, window_sequence=0, max_sfb=left.max_sfb,
                    window_shape=left.window_shape, allow_pulse=False,
                    allow_noise=False)
                enc.write_cpe(w, enc.CPESpec(left=left, right=right,
                                             common_window=True,
                                             ms_type=0), cfg, instance=inst)
        payloads.append(enc.end_frame(w))
    return enc.loas_stream(payloads, cfg)


def test_channel_counts_and_perms():
    for cc, n in N_CH.items():
        cfg = parse_asc(make_asc(2, 4, cc))
        assert cfg.channels == n
        assert sorted(CANONICAL_ORDER[cc]) == list(range(n))


def test_reserved_configs_rejected():
    for cc in (9, 10, 14):
        with pytest.raises(UnsupportedError):
            parse_asc(make_asc(2, 4, cc))


@pytest.mark.skipif(not HAVE_ORACLE, reason="libavcodec oracle not built")
@pytest.mark.parametrize("cc", [11, 12, 13])
def test_extended_config_oracle(cc):
    rng = np.random.default_rng(61 + cc)
    cfg = parse_asc(make_asc(2, 4, cc))
    loas = build_stream(rng, cfg, LAYOUTS[cc])
    mine, rate = decode_loas(loas)
    assert rate == 44100
    mine = to_canonical_order(mine, cc)
    ref, _ = ffmpeg_oracle.decode_loas(loas)
    assert mine.shape[1] == ref.shape[1] == N_CH[cc]
    n = min(len(ref), len(mine))
    err = float(np.abs(ref[:n] - mine[:n]).max())
    peak = max(float(np.abs(ref[:n]).max()), 1e-9)
    # tolerance covers libavcodec's own f32 TNS drift on random filters
    assert err / peak < 2e-4, err / peak
