"""iirdesign, analog/zpk frequency responses, bode, correlation_lags,
czt_points vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

from dsc_tpu.models import (
    bode,
    correlation_lags,
    czt_points,
    freqresp,
    freqs,
    freqs_zpk,
    freqz_zpk,
    iirdesign,
)


def _resp(sos, w):
    z = np.exp(1j * w)
    h = np.ones_like(z, complex)
    for r in np.atleast_2d(sos):
        h *= (r[0] + r[1] / z + r[2] / z ** 2) / \
             (r[3] + r[4] / z + r[5] / z ** 2)
    return h


@pytest.mark.parametrize('ftype', ['ellip', 'cheby1', 'cheby2', 'butter'])
def test_iirdesign_matches_scipy(ftype):
    w = np.linspace(1e-3, np.pi - 1e-3, 512)
    for wp, ws in [(0.2, 0.3), (0.5, 0.35), ([0.2, 0.5], [0.1, 0.6])]:
        got = iirdesign(wp, ws, 1.0, 40.0, ftype=ftype)
        ref = sps.iirdesign(wp, ws, 1.0, 40.0, ftype=ftype, output='sos')
        assert np.abs(np.abs(_resp(got, w))
                      - np.abs(_resp(ref, w))).max() < 1e-9, (wp, ws)
    with pytest.raises(RuntimeError):
        iirdesign(0.2, 0.3, 1.0, 40.0, ftype='bessel')


def test_analog_responses():
    b, a = [1.0, 2.0], [1.0, 1.4, 1.0]
    w = np.logspace(-2, 2, 200)
    _, h1 = freqs(b, a, worN=w)
    _, h2 = sps.freqs(b, a, worN=w)
    assert np.allclose(h1, h2)
    z, p, k = sps.butter(4, 3.0, analog=True, output='zpk')
    _, h1 = freqs_zpk(z, p, k, worN=w)
    _, h2 = sps.freqs_zpk(z, p, k, worN=w)
    assert np.allclose(h1, h2)


def test_freqz_zpk():
    z, p, k = sps.butter(4, 0.3, output='zpk')
    for kw in [dict(), dict(worN=256, fs=1000.0)]:
        w1, h1 = freqz_zpk(z, p, k, **kw)
        w2, h2 = sps.freqz_zpk(z, p, k, **kw)
        assert np.allclose(w1, w2) and np.allclose(h1, h2)


def test_freqresp_and_bode():
    A, B, C, D = sps.tf2ss([1.0, 3.0, 3.0], [1.0, 2.0, 1.0])
    w = np.logspace(-2, 2, 100)
    _, h1 = freqresp((A, B, C, D), w=w)
    _, h2 = sps.freqresp((A, B, C, D), w=w)
    assert np.allclose(h1, h2)
    _, m1, p1 = bode((A, B, C, D), w=w)
    _, m2, p2 = sps.bode((A, B, C, D), w=w)
    assert np.allclose(m1, m2) and np.allclose(p1, p2)


def test_correlation_lags_and_czt_points():
    for mode in ('full', 'same', 'valid'):
        for n1, n2 in [(10, 4), (4, 10), (7, 7), (10, 10), (9, 4),
                       (5, 3), (3, 5)]:
            assert np.array_equal(
                correlation_lags(n1, n2, mode),
                sps.correlation_lags(n1, n2, mode)), (mode, n1, n2)
    assert np.allclose(czt_points(16), sps.czt_points(16))
    w0, a0 = np.exp(-2j * np.pi / 32), 0.5
    assert np.allclose(czt_points(16, w=w0, a=a0),
                       sps.czt_points(16, w=w0, a=a0))
