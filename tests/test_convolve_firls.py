"""convolve/oaconvolve wrappers, hilbert2 and firls vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    convolve,
    fft_convolve,
    firls,
    hilbert2,
    oaconvolve,
)


@pytest.mark.parametrize('mode', ['full', 'same', 'valid'])
def test_convolve_1d_matches_scipy(mode):
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(65).astype(np.float32)
    ref = sps.convolve(a.astype(np.float64), b.astype(np.float64),
                       mode=mode)
    for fn in (convolve, oaconvolve, fft_convolve):
        got = fn(dsc.from_numpy(a), dsc.from_numpy(b), mode=mode).numpy()
        assert got.shape == ref.shape, (fn.__name__, mode)
        assert np.abs(got - ref).max() < 2e-6 * np.abs(ref).max()


def test_convolve_2d_and_blocking_path():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((64, 128)).astype(np.float32)
    k = rng.standard_normal((5, 7)).astype(np.float32)
    got = convolve(dsc.from_numpy(a), dsc.from_numpy(k), mode='same').numpy()
    ref = sps.convolve(a.astype(np.float64), k.astype(np.float64),
                       mode='same')
    assert np.abs(got - ref).max() < 2e-5 * np.abs(ref).max()
    # long signal forces the overlap-save blocking branch
    x = rng.standard_normal(1 << 16).astype(np.float32)
    h = rng.standard_normal(129).astype(np.float32)
    got = oaconvolve(dsc.from_numpy(x), dsc.from_numpy(h)).numpy()
    ref = sps.oaconvolve(x.astype(np.float64), h.astype(np.float64))
    assert np.abs(got - ref).max() < 2e-5 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        convolve(dsc.from_numpy(x), dsc.from_numpy(h), method='bogus')


def test_hilbert2_matches_scipy():
    x = np.random.default_rng(2).standard_normal((64, 128)).astype(
        np.float32)
    got = hilbert2(dsc.from_numpy(x)).numpy()
    ref = sps.hilbert2(x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        hilbert2(dsc.from_numpy(x[0]))
    with pytest.raises(RuntimeError):
        hilbert2(dsc.from_numpy(np.ones((60, 64), np.float32)))


@pytest.mark.parametrize('args', [
    (31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], None),
    (51, [0, 0.3, 0.4, 0.7, 0.8, 1.0], [0, 0, 1, 1, 0, 0],
     [1.0, 2.0, 0.5]),
    (25, [0, 0.5, 0.6, 1.0], [1, 0.5, 0, 0], None),
    (101, [0, 0.1, 0.15, 1.0], [1, 1, 0, 0], [1, 10]),
], ids=str)
def test_firls_matches_scipy(args):
    nt, bands, des, w = args
    got = firls(nt, bands, des, weight=w)
    ref = sps.firls(nt, bands, des, weight=w)
    assert np.abs(got - ref).max() < 1e-12


def test_firls_fs_and_errors():
    got = firls(31, [0, 100, 150, 500], [1, 1, 0, 0], fs=1000)
    ref = sps.firls(31, [0, 100, 150, 500], [1, 1, 0, 0], fs=1000)
    assert np.abs(got - ref).max() < 1e-12
    with pytest.raises(RuntimeError):
        firls(30, [0, 0.5, 0.6, 1.0], [1, 1, 0, 0])  # even numtaps
    with pytest.raises(RuntimeError):
        firls(31, [0, 0.6, 0.5, 1.0], [1, 1, 0, 0])  # non-monotone


def test_gammatone_matches_scipy():
    import warnings
    from dsc_tpu.models import gammatone, lfilter

    for ft in ('fir', 'iir'):
        for f, fs in [(440.0, 16000.0), (1000.0, 44100.0), (0.3, 2.0)]:
            b1, a1 = gammatone(f, ft, fs=fs)
            with warnings.catch_warnings():
                warnings.simplefilter('ignore')
                b2, a2 = sps.gammatone(f, ft, fs=fs)
            assert np.allclose(b1, b2, atol=1e-15), (ft, f)
            assert np.allclose(a1, np.asarray(a2), atol=1e-12), (ft, f)
    # end-to-end: the IIR gammatone filters on device through biquads
    # (the 8th-order TF with near-unit poles is f32-unstable direct,
    # like any high-order TF -- the classic reason for sos form)
    from dsc_tpu.models import sosfilt, tf2sos

    b, a = gammatone(440.0, 'iir', fs=16000.0)
    x = np.random.default_rng(0).standard_normal(2048).astype(np.float32)
    y = sosfilt(tf2sos(b, a), dsc.from_numpy(x)).numpy()
    yr = sps.lfilter(b, a, x.astype(np.float64))
    assert np.abs(y - yr).max() < 1e-4 * np.abs(yr).max()
    del lfilter
    with pytest.raises(RuntimeError):
        gammatone(3000.0, 'fir', fs=2000.0)
    with pytest.raises(RuntimeError):
        gammatone(440.0, 'bogus', fs=16000.0)
