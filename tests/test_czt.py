"""Chirp-Z transform / zoom FFT vs scipy.signal and np.fft.

The headline property: czt with defaults is the EXACT DFT of any
length — the one transform the pow2-padding public fft family does not
provide.
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import CZT, czt, zoom_fft


def _rel(got, ref):
    return np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)


@pytest.mark.parametrize('n', [331, 1000, 4097])
def test_czt_is_exact_dft_of_any_length(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    got = czt(dsc.from_numpy(x)).numpy()
    ref = np.fft.fft(x.astype(np.complex128))
    assert _rel(got, ref) < 1e-5


def test_czt_real_input_custom_points():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(500).astype(np.float32)
    w, a = np.exp(-2j * np.pi / 300), np.exp(1j * 0.3)
    got = czt(dsc.from_numpy(x), m=219, w=w, a=a).numpy()
    ref = sps.czt(x.astype(np.float64), 219, w, a)
    assert _rel(got, ref) < 1e-5


def test_czt_batched_and_plan_reuse():
    rng = np.random.default_rng(2)
    plan = CZT(777)
    for seed in range(3):
        xb = np.random.default_rng(seed).standard_normal(
            (3, 777)).astype(np.float32)
        got = plan(dsc.from_numpy(xb)).numpy()
        ref = sps.czt(xb.astype(np.float64), axis=-1)
        assert got.shape == ref.shape
        assert _rel(got, ref) < 1e-5
    assert plan._run.n_programs == 1  # one compiled program, reused
    del rng


def test_czt_matches_padded_fft_at_pow2():
    # at pow2 lengths the czt and the engine's fft agree
    x = np.random.default_rng(3).standard_normal(1024).astype(np.float32)
    got = czt(dsc.from_numpy(x)).numpy()
    ref = dsc.fft(dsc.from_numpy(x.astype(np.complex64))).numpy()
    assert _rel(got, ref) < 1e-5


@pytest.mark.parametrize('fn,m,endpoint', [
    ([0.1, 0.3], 128, False), ([0.1, 0.3], 128, True), (0.4, 64, False),
])
def test_zoom_fft_matches_scipy(fn, m, endpoint):
    x = np.random.default_rng(4).standard_normal(500).astype(np.float32)
    got = zoom_fft(dsc.from_numpy(x), fn, m=m, endpoint=endpoint).numpy()
    ref = sps.zoom_fft(x.astype(np.float64), fn, m=m, endpoint=endpoint)
    assert _rel(got, ref) < 1e-5


def test_zoom_fft_finds_a_tone_off_grid():
    # a tone at a frequency the pow2 grid cannot represent lands on the
    # zoomed grid's bin exactly
    fs, n = 1000.0, 900
    f_tone = 123.456
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * f_tone * t).astype(np.float32)
    m = 2048
    z = zoom_fft(dsc.from_numpy(x), [100.0, 150.0], m=m, fs=fs).numpy()
    freqs = 100.0 + np.arange(m) * (150.0 - 100.0) / m
    assert abs(freqs[np.argmax(np.abs(z))] - f_tone) < 0.05


def test_czt_rejects_bad_args():
    x = dsc.from_numpy(np.zeros(16, np.float32))
    with pytest.raises(RuntimeError):
        CZT(0)
    with pytest.raises(RuntimeError):
        CZT(16, m=0)
    with pytest.raises(RuntimeError):
        CZT(8)(x)  # planned length mismatch
    with pytest.raises(RuntimeError):
        zoom_fft(x, [0.1, 0.2, 0.3])


def test_zoomfft_class_and_points():
    from dsc_tpu import models

    rng = np.random.default_rng(12)
    x = rng.standard_normal(64).astype(np.float32)
    zf = models.ZoomFFT(64, [0.1, 0.4], m=33, fs=2.0)
    ref = sps.ZoomFFT(64, [0.1, 0.4], m=33, fs=2)
    got = zf(dsc.from_numpy(x)).numpy()
    exp = ref(x.astype(np.float64))
    assert np.abs(got - exp).max() < 1e-4 * np.abs(exp).max()
    assert np.abs(zf.points() - ref.points()).max() < 1e-12
    c = models.CZT(64, 20, w=0.99 * np.exp(-2j * np.pi / 30), a=1.1)
    cr = sps.CZT(64, 20, w=0.99 * np.exp(-2j * np.pi / 30), a=1.1)
    assert np.abs(c.points() - cr.points()).max() < 1e-12
