"""Spline / symmetric-IIR family vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    cspline1d,
    cspline1d_eval,
    gauss_spline,
    qspline1d,
    qspline1d_eval,
    symiirorder1,
    symiirorder2,
)


def _sig(n=200, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


@pytest.mark.parametrize('c0,z1', [(2.0, 0.5), (1.0, -0.268), (0.7, 0.8)])
def test_symiirorder1_matches_scipy(c0, z1):
    x = _sig()
    got = symiirorder1(dsc.from_numpy(x), c0, z1).numpy()
    ref = sps.symiirorder1(x.astype(np.float64), c0, z1)
    assert np.abs(got - ref).max() < 1e-6 * np.abs(ref).max()


def test_symiirorder1_nonconvergent_raises():
    # scipy raises the same way when the boundary series cannot converge
    # within the signal length
    with pytest.raises(RuntimeError):
        symiirorder1(dsc.from_numpy(_sig()), 0.7, 0.9)
    with pytest.raises(ValueError):
        sps.symiirorder1(_sig().astype(np.float64), 0.7, 0.9)
    with pytest.raises(RuntimeError):
        symiirorder1(dsc.from_numpy(_sig()), 1.0, 1.5)


@pytest.mark.parametrize('r,omega', [(0.5, 0.3), (0.8, 1.2), (0.3, 2.0),
                                     (0.284, 1.256)])
def test_symiirorder2_matches_scipy(r, omega):
    x = _sig()
    got = symiirorder2(dsc.from_numpy(x), r, omega).numpy()
    ref = sps.symiirorder2(x.astype(np.float64), r, omega)
    assert np.abs(got - ref).max() < 2e-6 * np.abs(ref).max()


@pytest.mark.parametrize('lamb', [0.0, 0.1, 1.0, 5.0])
def test_cspline1d_matches_scipy(lamb):
    x = _sig()
    got = cspline1d(dsc.from_numpy(x), lamb=lamb).numpy()
    ref = sps.cspline1d(x.astype(np.float64), lamb=lamb)
    assert np.abs(got - ref).max() < 1e-6 * np.abs(ref).max()


def test_qspline1d_and_errors():
    x = _sig()
    got = qspline1d(dsc.from_numpy(x)).numpy()
    ref = sps.qspline1d(x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-6 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        qspline1d(dsc.from_numpy(x), lamb=1.0)
    with pytest.raises(RuntimeError):
        cspline1d(dsc.from_numpy(x), lamb=1e-4)  # below 1/144


def test_spline_eval_roundtrip():
    x = _sig()
    cj = sps.cspline1d(x.astype(np.float64))
    newx = np.linspace(-5, 210, 500)  # crosses both mirror boundaries
    got = cspline1d_eval(cj, newx)
    ref = sps.cspline1d_eval(cj, newx)
    assert np.abs(got - ref).max() < 1e-12
    # Tensor coefficients accepted, exact interpolation at the samples
    cj_t = cspline1d(dsc.from_numpy(x))
    at_samples = cspline1d_eval(cj_t, np.arange(200.0))
    assert np.abs(at_samples - x).max() < 1e-4
    qj = sps.qspline1d(x.astype(np.float64))
    got = qspline1d_eval(qj, newx)
    ref = sps.qspline1d_eval(qj, newx)
    assert np.abs(got - ref).max() < 1e-12


def test_gauss_spline():
    x = np.linspace(-3, 3, 50)
    for n in (1, 3, 5):
        assert np.allclose(gauss_spline(x, n), sps.gauss_spline(x, n))


def test_batched_rows():
    xb = np.stack([_sig(seed=s) for s in range(3)])
    got = symiirorder1(dsc.from_numpy(xb), 2.0, 0.5).numpy()
    for i in range(3):
        ref = sps.symiirorder1(xb[i].astype(np.float64), 2.0, 0.5)
        assert np.abs(got[i] - ref).max() < 1e-6 * np.abs(ref).max()
    got = cspline1d(dsc.from_numpy(xb)).numpy()
    for i in range(3):
        ref = sps.cspline1d(xb[i].astype(np.float64))
        assert np.abs(got[i] - ref).max() < 1e-6 * np.abs(ref).max()


def test_2d_splines_match_scipy():
    im = np.random.default_rng(4).standard_normal((32, 48)).astype(
        np.float32)
    from dsc_tpu.models import (cspline2d, qspline2d, sepfir2d,
                                spline_filter)
    for lamb in (0.0, 1.0 / 200.0):
        got = cspline2d(dsc.from_numpy(im), lamb).numpy()
        ref = sps.cspline2d(im.astype(np.float64), lamb)
        assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max(), lamb
    got = qspline2d(dsc.from_numpy(im)).numpy()
    ref = sps.qspline2d(im.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    # smoothing case: scipy's C truncates the boundary series at its
    # first small term; we sum the tail, so edges differ at ~1e-6 abs
    got = cspline2d(dsc.from_numpy(im), 1.0).numpy()
    ref = sps.cspline2d(im.astype(np.float64), 1.0)
    assert np.abs(got - ref).max() < 5e-3 * np.abs(ref).max()
    d = np.abs(got - ref)
    assert d[4:-4, 4:-4].max() < 5e-4 * np.abs(ref).max()  # interior tight
    h = np.array([0.25, 0.5, 0.15])
    got = sepfir2d(dsc.from_numpy(im), h, h).numpy()
    ref = sps.sepfir2d(im.astype(np.float64), h, h)
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    got = spline_filter(dsc.from_numpy(im), 5.0).numpy()
    ref = sps.spline_filter(im.astype(np.float64), 5.0)
    assert np.abs(got - ref).max() < 5e-3 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        qspline2d(dsc.from_numpy(im), lamb=1.0)
    with pytest.raises(RuntimeError):
        sepfir2d(dsc.from_numpy(im), np.ones(4), h)  # even kernel
