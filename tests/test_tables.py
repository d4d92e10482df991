"""Table-layer tests: closed forms vs independently computed references.

The IMDCT matrix is validated against a from-scratch implementation of the
reference's twiddle + complex-FFT pipeline (mdct.js:62-115) — if either
implementation had a sign/ordering/scale error they would not agree.
"""
import numpy as np
import pytest

from aacjax import tables


def ref_style_imdct(X: np.ndarray, N: int) -> np.ndarray:
    """N-point IMDCT via the N/4-point complex-IFFT formulation the
    reference uses (pre-twiddle -> IFFT -> post-twiddle -> reorder),
    implemented independently in numpy fp64."""
    N2, N4, N8 = N // 2, N // 4, N // 8
    k = np.arange(N4)
    tw = np.sqrt(2.0 / N) * np.exp(1j * 2 * np.pi * (k + 1.0 / 8) / N)
    c, s = tw.real, tw.imag
    re = X[N2 - 1 - 2 * k] * c - X[2 * k] * s
    im = X[2 * k] * c + X[N2 - 1 - 2 * k] * s
    buf = np.fft.ifft(re + 1j * im) * N4  # non-scaling inverse FFT
    re2 = buf.real * c - buf.imag * s
    im2 = buf.imag * c + buf.real * s
    out = np.zeros(N)
    for kk in range(N8):
        out[2 * kk] = im2[N8 + kk]
        out[1 + 2 * kk] = -re2[N8 - 1 - kk]
        out[N4 + 2 * kk] = re2[kk]
        out[N4 + 1 + 2 * kk] = -im2[N4 - 1 - kk]
        out[N2 + 2 * kk] = re2[N8 + kk]
        out[N2 + 1 + 2 * kk] = -im2[N8 - 1 - kk]
        out[N2 + N4 + 2 * kk] = -im2[kk]
        out[N2 + N4 + 1 + 2 * kk] = re2[N4 - 1 - kk]
    return out


@pytest.mark.parametrize("n", [256, 2048])
def test_imdct_matrix_matches_fft_pipeline(n):
    rng = np.random.default_rng(42)
    X = rng.standard_normal(n // 2)
    direct = X @ tables.imdct_matrix(n)
    via_fft = ref_style_imdct(X, n)
    np.testing.assert_allclose(direct, via_fft, atol=1e-11)


def test_imdct_perfect_reconstruction():
    """Windowed MDCT analysis/synthesis with 50% overlap-add must
    reconstruct the input (Princen-Bradley)."""
    rng = np.random.default_rng(0)
    n = 2048
    w = tables.sine_window(1024)
    wfull = np.concatenate([w, w[::-1]])
    x = rng.standard_normal(4 * 1024)
    analysis = tables.imdct_matrix(n).T * float(n)
    synth = tables.imdct_matrix(n)
    # overlapping frames at hop 1024
    recon = np.zeros(5 * 1024)
    for f in range(4):
        seg = np.zeros(2048)
        lo = f * 1024
        seg[:min(2048, len(x) - lo)] = x[lo:lo + 2048]
        X = (seg * wfull) @ analysis
        recon[lo:lo + 2048] += (X @ synth) * wfull
    # interior fully-overlapped samples reconstruct exactly
    np.testing.assert_allclose(recon[1024:4 * 1024], x[1024:], atol=1e-10)


def test_sine_window_closed_form():
    w = tables.sine_window(1024)
    assert w[0] == pytest.approx(np.sin(0.5 * np.pi / 2048))
    assert w[-1] == pytest.approx(np.sin(1023.5 * np.pi / 2048))
    # Princen-Bradley: w[n]^2 + w[N-1-n]^2 == 1
    np.testing.assert_allclose(w**2 + w[::-1]**2, 1.0, atol=1e-12)


def test_kbd_window_properties():
    for alpha, n in ((4.0, 1024), (6.0, 128)):
        w = tables.kbd_window(alpha, n)
        assert np.all(np.diff(w) > 0)          # monotone rising half
        assert w[-1] < 1.0
        np.testing.assert_allclose(w**2 + w[::-1]**2, 1.0, atol=1e-9)


def test_kbd_window_reference_values():
    """Spot values computed by the reference's generator algorithm
    (filter_bank.js:54-79), evaluated independently here in fp64."""
    w = tables.kbd_window(4.0, 1024)
    # independent recomputation with mpmath-free double loop
    pin = np.pi / 1024
    alpha2 = (4.0 * pin) ** 2
    acc = 0.0
    f = []
    for nn in range(1024):
        tmp = nn * (1024 - nn) * alpha2
        b = 1.0
        for j in range(50, 0, -1):
            b = b * tmp / (j * j) + 1.0
        acc += b
        f.append(acc)
    expected = np.sqrt(np.array(f) / (acc + 1.0))
    np.testing.assert_allclose(w, expected, rtol=1e-12)


def test_tns_tables_match_reference_values():
    """tns.js:50-63 constants."""
    np.testing.assert_allclose(
        tables.TNS_TABLES[0],
        [0.0, -0.43388373, -0.78183150, -0.97492790,
         0.98480773, 0.86602539, 0.64278758, 0.34202015], atol=1e-7)
    np.testing.assert_allclose(
        tables.TNS_TABLES[2],
        [0.0, -0.43388373, 0.64278758, 0.34202015], atol=1e-7)
    assert len(tables.TNS_TABLES[1]) == 16
    assert len(tables.TNS_TABLES[3]) == 8
    np.testing.assert_allclose(
        tables.TNS_TABLES[1][8], 0.99573416, atol=1e-7)


def test_scalefactor_and_iq():
    assert tables.scalefactor_gain(200) == 1.0
    assert tables.scalefactor_gain(204) == 2.0
    np.testing.assert_allclose(tables.inverse_quantize(np.array([8, -8])),
                               [8**(4 / 3), -(8**(4 / 3))])


def test_swb_tables_consistent():
    for i in range(12):
        lo = tables.SWB_OFFSET_1024[i]
        sh = tables.SWB_OFFSET_128[i]
        assert lo[0] == 0 and lo[-1] == 1024
        assert sh[0] == 0 and sh[-1] == 128
        assert np.all(np.diff(lo) > 0) and np.all(np.diff(sh) > 0)
        assert len(lo) - 1 == tables.SWB_LONG_WINDOW_COUNT[i]
        assert len(sh) - 1 == tables.SWB_SHORT_WINDOW_COUNT[i]


def test_extracted_tables_cross_check():
    """The libavcodec-extracted table file's 1024/128 entries must equal
    the independently embedded spec tables bit-for-bit — this is what
    validates the extractor that sourced the 960/120 tables
    (tools/extract_ffmpeg_tables.py)."""
    import pathlib
    d = np.load(pathlib.Path(tables.__file__).parent / "host"
                / "aac_960_tables.npz")
    for i in range(13):
        n = int(d["num_swb_1024"][i])
        assert n == int(tables.SWB_LONG_WINDOW_COUNT[i])
        assert np.array_equal(tables.SWB_OFFSET_1024[i][:n + 1],
                              d["swb_offset_1024"][i][:n + 1])
        ns = int(d["num_swb_128"][i])
        assert ns == int(tables.SWB_SHORT_WINDOW_COUNT[i])
        assert np.array_equal(tables.SWB_OFFSET_128[i][:ns + 1],
                              d["swb_offset_128"][i][:ns + 1])
    # 960 tables are self-consistent: monotone offsets ending at the frame
    for i in range(13):
        n = int(d["num_swb_960"][i])
        offs = d["swb_offset_960"][i][:n + 1]
        assert offs[0] == 0 and offs[-1] == 960
        assert (np.diff(offs) > 0).all()
        ns = int(d["num_swb_120"][i])
        offs = d["swb_offset_120"][i][:ns + 1]
        assert offs[0] == 0 and offs[-1] == 120
        assert (np.diff(offs) > 0).all()
