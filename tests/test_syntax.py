"""Syntax-layer roundtrip: random valid specs -> bitstream writer ->
host parser -> structural equality (band types, scalefactor gains,
quantized values, window info, TNS side info)."""
import numpy as np
import pytest

from aacjax import tables
from aacjax.host.asc import make_asc, parse_asc
from aacjax.host.bitio import BitReader, BitWriter
from aacjax.host.syntax import (
    INTENSITY_BT, INTENSITY_BT2, NOISE_BT, SCEData, CPEData, ZERO_BT,
    decode_frame,
)
from aacjax.testing import encoder as enc
from aacjax.testing.specgen import random_channel_spec, random_cpe_spec


def _cfg(si=4, ch=2):
    return parse_asc(make_asc(2, si, ch))


def _expected_sf_gain(book, sf):
    if book == enc.ZERO:
        return 0.0
    if book in (enc.INTENSITY, enc.INTENSITY2):
        tmp = min(max(sf, -155), 100)
        return np.float32(tables.scalefactor_gain(-tmp + 200))
    if book == enc.NOISE:
        tmp = min(max(sf, -100), 155)
        return np.float32(-tables.scalefactor_gain(tmp + 200))
    return np.float32(tables.scalefactor_gain(sf - 100 + 200))


def _check_channel(spec, ch, config):
    info = ch.info
    assert info.window_sequence == spec.window_sequence
    assert info.window_shape == spec.window_shape
    assert info.max_sfb == spec.max_sfb
    if spec.grouping:
        assert info.group_count == len(spec.grouping)
        assert list(info.group_length[:info.group_count]) == spec.grouping
    n_idx = spec.group_count * spec.max_sfb
    for idx in range(n_idx):
        assert ch.band_types[idx] == spec.band_books[idx], f"band {idx}"
        expected = _expected_sf_gain(int(spec.band_books[idx]),
                                     int(spec.band_sf[idx]))
        assert ch.sf_gain[idx] == pytest.approx(expected, rel=1e-6), \
            f"sf band {idx}"
    if spec.pulse is None:
        np.testing.assert_array_equal(ch.quant, spec.quant)


@pytest.mark.parametrize("seed", range(30))
def test_sce_roundtrip(seed):
    rng = np.random.default_rng(seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=1)
    spec = random_channel_spec(rng, config, allow_pulse=False)
    w = BitWriter()
    enc.write_sce(w, spec, config)
    payload = enc.end_frame(w)
    frame = decode_frame(BitReader(payload), config, [0])
    assert len(frame.elements) == 1
    _check_channel(spec, frame.elements[0].ics, config)


@pytest.mark.parametrize("seed", range(30))
def test_cpe_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    config = _cfg(si=int(rng.integers(0, 12)), ch=2)
    spec = random_cpe_spec(rng, config)
    w = BitWriter()
    enc.write_cpe(w, spec, config)
    payload = enc.end_frame(w)
    frame = decode_frame(BitReader(payload), config, [0, 0])
    assert len(frame.elements) == 1
    cpe = frame.elements[0]
    assert isinstance(cpe, CPEData)
    assert cpe.common_window == spec.common_window
    _check_channel(spec.left, cpe.left, config)
    _check_channel(spec.right, cpe.right, config)
    if spec.common_window and spec.ms_type == 1:
        n = spec.left.group_count * spec.left.max_sfb
        np.testing.assert_array_equal(cpe.ms_used[:n].astype(int),
                                      spec.ms_used[:n])
    elif spec.common_window and spec.ms_type == 2:
        assert np.all(cpe.ms_used)


def test_pulse_data_applied():
    """Pulse amplitudes add to |quant| with the coefficient's sign
    (spec-correct; reference throws — SURVEY.md §7)."""
    rng = np.random.default_rng(5)
    config = _cfg(ch=1)
    spec = random_channel_spec(rng, config, window_sequence=0,
                               allow_tns=False, allow_pulse=False)
    # hand-build a pulse onto known coefficients
    offsets = config.swb_offsets_long
    # find a coded band
    coded = [i for i in range(spec.max_sfb)
             if 1 <= spec.band_books[i] <= 11]
    if not coded:
        spec.band_books[0] = 11
        spec.band_sf[0] = spec.global_gain
        spec.quant[offsets[0]:offsets[1]] = 3
        coded = [0]
    sfb = coded[0]
    base = int(offsets[sfb])
    spec.pulse = (sfb, [2, 1], [5, 7])
    w = BitWriter()
    enc.write_sce(w, spec, config)
    frame = decode_frame(BitReader(enc.end_frame(w)), config, [0])
    ch = frame.elements[0].ics
    q0 = int(spec.quant[base + 2])
    q1 = int(spec.quant[base + 3])
    assert ch.quant[base + 2] == (q0 + 5 if q0 >= 0 else q0 - 5)
    assert ch.quant[base + 3] == (q1 + 7 if q1 >= 0 else q1 - 7)


def test_tns_side_info_roundtrip():
    rng = np.random.default_rng(11)
    config = _cfg(ch=1)
    for _ in range(20):
        spec = random_channel_spec(rng, config, allow_tns=True,
                                   force_tns=True, allow_pulse=False)
        w = BitWriter()
        enc.write_sce(w, spec, config)
        frame = decode_frame(BitReader(enc.end_frame(w)), config, [0])
        ch = frame.elements[0].ics
        if spec.tns and any(spec.tns):
            assert ch.tns_present
            # filters with order 0 or empty regions are dropped at
            # resolve time; just verify resolution doesn't crash and
            # regions are sane
            for f in ch.tns_filters:
                assert 0 <= f.start < f.end <= 1024
                assert 1 <= f.order <= 20
                assert f.inc in (-1, 1)


def test_dse_and_fil_skipped():
    rng = np.random.default_rng(3)
    config = _cfg(ch=1)
    spec = random_channel_spec(rng, config, allow_pulse=False)
    w = BitWriter()
    enc.write_fil(w, 20)
    enc.write_dse(w, b"hello world", align=True)
    enc.write_sce(w, spec, config)
    enc.write_fil(w, 3)
    payload = enc.end_frame(w)
    frame = decode_frame(BitReader(payload), config, [0])
    assert len(frame.elements) == 1
    _check_channel(spec, frame.elements[0].ics, config)


def test_multichannel_51_layout():
    """SCE + CPE + CPE + LFE element sequence (5.1, chanConfig 6)."""
    rng = np.random.default_rng(9)
    config = _cfg(ch=6)
    w = BitWriter()
    center = random_channel_spec(rng, config, allow_pulse=False)
    front = random_cpe_spec(rng, config)
    rear = random_cpe_spec(rng, config)
    lfe = random_channel_spec(rng, config, window_sequence=0,
                              allow_tns=False, allow_pulse=False,
                              allow_noise=False)
    enc.write_sce(w, center, config, instance=0)
    enc.write_cpe(w, front, config, instance=0)
    enc.write_cpe(w, rear, config, instance=1)
    enc.write_sce(w, lfe, config, instance=0, lfe=True)
    payload = enc.end_frame(w)
    frame = decode_frame(BitReader(payload), config, [0] * 6)
    assert len(frame.elements) == 4
    assert isinstance(frame.elements[0], SCEData)
    assert isinstance(frame.elements[1], CPEData)
    assert isinstance(frame.elements[2], CPEData)
    assert frame.elements[3].is_lfe
