"""Waveform generators vs scipy.signal."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import chirp, gausspulse, sawtooth, square


def _t(n=2048, fs=8000.0):
    return np.arange(n) / fs


@pytest.mark.parametrize('method', ['linear', 'quadratic', 'logarithmic',
                                    'hyperbolic'])
def test_chirp_matches_scipy(method):
    t = _t()
    got = chirp(dsc.from_numpy(t.astype(np.float32)), f0=100.0, t1=t[-1],
                f1=900.0, method=method).numpy()
    ref = sps.chirp(t, f0=100.0, t1=t[-1], f1=900.0, method=method)
    assert np.abs(got - ref).max() < 1e-4


def test_chirp_phi_and_array_t():
    t = _t(512)
    got = chirp(t, f0=50.0, t1=t[-1], f1=200.0, phi=90.0).numpy()
    ref = sps.chirp(t, f0=50.0, t1=t[-1], f1=200.0, phi=90.0)
    assert np.abs(got - ref).max() < 1e-4


def test_chirp_constant_frequency_log_sweep():
    t = _t(256)
    got = chirp(t, f0=100.0, t1=t[-1], f1=100.0, method='logarithmic').numpy()
    ref = sps.chirp(t, f0=100.0, t1=t[-1], f1=100.0, method='logarithmic')
    assert np.abs(got - ref).max() < 1e-4


@pytest.mark.parametrize('duty', [0.25, 0.5, 0.9])
def test_square_matches_scipy(duty):
    t = 2 * np.pi * 5.3 * _t()
    got = square(t, duty=duty).numpy()
    ref = sps.square(t, duty=duty)
    # compare away from the jump discontinuities (edge rounding differs)
    mask = np.abs(got - ref) > 0
    assert mask.mean() < 0.005


def test_sawtooth_matches_scipy():
    t = 2 * np.pi * 3.7 * _t()
    for width in (1.0, 0.5, 0.0, 0.3):
        got = sawtooth(t, width=width).numpy()
        ref = sps.sawtooth(t, width=width)
        err = np.abs(got - ref)
        assert np.percentile(err, 99.5) < 1e-4, width  # jumps excluded


def test_gausspulse_matches_scipy():
    t = np.linspace(-0.01, 0.01, 2001)
    got = gausspulse(t, fc=1000.0, bw=0.5).numpy()
    ref = sps.gausspulse(t, fc=1000.0, bw=0.5)
    assert np.abs(got - ref).max() < 1e-4


def test_waveforms_reject_bad_args():
    t = _t(64)
    with pytest.raises(RuntimeError):
        chirp(t, 100.0, t[-1], 900.0, method='nope')
    with pytest.raises(RuntimeError):
        chirp(t, -1.0, t[-1], 900.0, method='logarithmic')
    with pytest.raises(RuntimeError):
        square(t, duty=1.5)
    with pytest.raises(RuntimeError):
        sawtooth(t, width=-0.1)
    with pytest.raises(RuntimeError):
        gausspulse(t, fc=-5.0)


def test_chirp_feeds_stft_pipeline():
    # synthesis -> analysis round trip: the linear sweep shows up as a
    # moving ridge in dsc's own spectrogram
    from dsc_tpu.models import spectrogram

    fs, n = 8192.0, 2**14
    t = np.arange(n) / fs
    x = chirp(dsc.from_numpy(t.astype(np.float32)), f0=200.0, t1=t[-1],
              f1=3000.0)
    S = spectrogram(x, frame=512, hop=256, mode='power')
    ridge = np.argmax(S.numpy(), axis=1) * fs / 512
    # ridge frequency must increase monotonically (allowing bin noise)
    d = np.diff(ridge)
    assert (d >= -fs / 512).all() and ridge[-1] > ridge[0] + 2000.0
