"""Multitaper PSD and Lomb-Scargle periodogram vs their specifications.

scipy.signal.lombscargle is the executable spec for lombscargle; for the
Thomson multitaper (which scipy does not ship) the oracle is the direct
NumPy computation over scipy's dpss tapers (same philosophy as the
reference's NumPy-oracle op tests, reference README.md:173-180).
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import lombscargle, multitaper


def _sig(n, fs, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 60.0 * t) + 0.5 * rng.standard_normal(n)
    return x.astype(np.float32)


# --------------------------------------------------------------- multitaper

@pytest.mark.parametrize('weighting', ['unity', 'eigen'])
def test_multitaper_matches_direct_pmtm(weighting):
    n, fs, k = 1024, 500.0, 7
    x = _sig(n, fs)
    tapers, lam = sps.windows.dpss(n, 4.0, k, return_ratios=True)
    s = np.abs(np.fft.rfft(tapers * x[None, :].astype(np.float64),
                           axis=-1)) ** 2
    if weighting == 'unity':
        ref = s.mean(axis=0)
    else:
        ref = ((lam / lam.sum())[:, None] * s).sum(axis=0)
    ref = ref / fs
    ref[1:-1] *= 2.0

    f, p = multitaper(dsc.from_numpy(x), fs=fs, nw=4.0, k=k,
                      weighting=weighting)
    assert np.allclose(f.numpy(), np.fft.rfftfreq(n, 1 / fs))
    assert np.abs(p.numpy() - ref).max() < 1e-5 * ref.max()


def test_multitaper_adaptive_properties():
    n, fs = 2048, 1000.0
    x = _sig(n, fs, seed=1)
    f, p = multitaper(dsc.from_numpy(x), fs=fs, nw=3.5)
    fr, pa = f.numpy(), p.numpy()
    # peak at the 60 Hz line
    assert abs(fr[np.argmax(pa)] - 60.0) < 2.0
    # total one-sided power integrates to the signal variance (Parseval)
    assert abs(pa.sum() * fs / n / np.var(x) - 1.0) < 0.05
    # adaptive weighting suppresses broadband leakage vs unity at least
    # as well away from the line
    _, pu = multitaper(dsc.from_numpy(x), fs=fs, nw=3.5, weighting='unity')
    mask = np.abs(fr - 60.0) > 100.0
    assert pa[mask].mean() <= pu.numpy()[mask].mean() * 1.5


def test_multitaper_batched_and_errors():
    n, fs = 512, 100.0
    xb = np.stack([_sig(n, fs, s) for s in range(3)])
    f, p = multitaper(dsc.from_numpy(xb), fs=fs, nw=3.0, k=4,
                      weighting='unity')
    assert p.shape == (3, n // 2 + 1)
    for i in range(3):
        _, pi = multitaper(dsc.from_numpy(xb[i]), fs=fs, nw=3.0, k=4,
                           weighting='unity')
        assert np.allclose(p.numpy()[i], pi.numpy(), rtol=1e-5, atol=1e-8)
    with pytest.raises(RuntimeError):
        multitaper(dsc.from_numpy(_sig(1000, fs)))  # not pow2
    with pytest.raises(RuntimeError):
        multitaper(dsc.from_numpy(_sig(n, fs)), weighting='bogus')


# -------------------------------------------------------------- lombscargle

def test_lombscargle_matches_scipy():
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0.0, 10.0, 700))
    y = np.cos(2 * np.pi * 3.0 * t) + 0.4 * rng.standard_normal(700)
    freqs = np.linspace(0.5, 40.0, 1000) * 2 * np.pi
    ref = sps.lombscargle(t, y, freqs)
    got = lombscargle(dsc.from_numpy(t), dsc.from_numpy(y),
                      dsc.from_numpy(freqs)).numpy()
    assert np.abs(got - ref).max() < 1e-6 * np.abs(ref).max()

    refn = sps.lombscargle(t, y - y.mean(), freqs, normalize=True)
    gotn = lombscargle(dsc.from_numpy(t), dsc.from_numpy(y),
                       dsc.from_numpy(freqs), precenter=True,
                       normalize=True).numpy()
    assert np.abs(gotn - refn).max() < 1e-6 * np.abs(refn).max()


def test_lombscargle_non_tile_multiple_and_errors():
    # nfreq not a multiple of the scan tile exercises the pad/crop path
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0.0, 4.0, 129))
    y = np.sin(2 * np.pi * 5.0 * t)
    freqs = np.linspace(1.0, 80.0, 777)
    ref = sps.lombscargle(t, y, freqs)
    got = lombscargle(dsc.from_numpy(t), dsc.from_numpy(y),
                      dsc.from_numpy(freqs)).numpy()
    assert got.shape == (777,)
    assert np.abs(got - ref).max() < 1e-6 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        lombscargle(dsc.from_numpy(t), dsc.from_numpy(y[:-1]),
                    dsc.from_numpy(freqs))
