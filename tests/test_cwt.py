"""CWT family: ricker/cwt/find_peaks_cwt vs scipy (its internal _cwt
machinery remains the executable spec for the retired public names)."""

import numpy as np
import pytest
import scipy.signal as sps
from scipy.signal._peak_finding import _cwt as sp_cwt
from scipy.signal._peak_finding import _ricker as sp_ricker

import dsc_tpu as dsc
from dsc_tpu.models import cwt, find_peaks_cwt, morlet2, ricker


def test_ricker_matches_scipy():
    for m, a in [(100, 7.0), (55, 3.5), (10, 1.0)]:
        assert np.allclose(ricker(m, a), sp_ricker(m, a))


def test_morlet2_properties():
    w = morlet2(201, 20.0)
    assert w.dtype.kind == 'c'
    # envelope peaks at the center; center value is pi^-1/4/sqrt(s)
    assert np.argmax(np.abs(w)) == 100
    assert abs(w[100] - np.pi ** -0.25 / np.sqrt(20.0)) < 1e-12


def test_cwt_matches_scipy():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 600)
    x = (np.sin(2 * np.pi * 7 * t)
         + 0.3 * rng.standard_normal(600)).astype(np.float32)
    widths = np.arange(1, 31)
    got = cwt(dsc.from_numpy(x), ricker, widths).numpy()
    ref = sp_cwt(x.astype(np.float64), sp_ricker, widths)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        cwt(dsc.from_numpy(x), morlet2, widths)  # complex wavelet


@pytest.mark.parametrize('seed', range(8))
def test_find_peaks_cwt_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 800))
    t = np.linspace(0, 1, n)
    sig = np.zeros(n)
    for _ in range(int(rng.integers(2, 6))):
        c = rng.uniform(0.1, 0.9)
        w = rng.uniform(0.01, 0.05)
        a = rng.uniform(0.5, 2.0)
        sig += a * np.exp(-((t - c) / w) ** 2)
    sig += 0.05 * rng.standard_normal(n)
    widths = np.arange(1, 20)
    got = find_peaks_cwt(sig.astype(np.float32), widths)
    ref = np.asarray(sps.find_peaks_cwt(sig, widths))
    assert np.array_equal(got, ref)


def test_find_peaks_cwt_options():
    # a little noise keeps the CWT away from exact-tie flat regions,
    # where the position of the algorithm's own artifact ridges depends
    # on f32-vs-f64 rounding (scipy itself reports a spurious peak
    # between the true ones on the noiseless version)
    rng = np.random.default_rng(42)
    t = np.linspace(0, 1, 500)
    sig = (np.exp(-((t - 0.3) / 0.02) ** 2)
           + np.exp(-((t - 0.7) / 0.04) ** 2)
           + 0.02 * rng.standard_normal(t.size))
    widths = np.arange(1, 25)
    for kw in [dict(min_snr=2.0), dict(noise_perc=25),
               dict(min_length=10), dict(gap_thresh=3.0)]:
        got = find_peaks_cwt(sig.astype(np.float32), widths, **kw)
        ref = np.asarray(sps.find_peaks_cwt(sig, widths, **kw))
        assert np.array_equal(got, ref), kw
    with pytest.raises(RuntimeError):
        find_peaks_cwt(sig, [-1.0])
