"""LTI representation conversions vs scipy (the executable spec)."""

import numpy as np
import pytest
import scipy.signal as sps

from dsc_tpu.models import (
    bilinear,
    deconvolve,
    normalize,
    sos2tf,
    sos2zpk,
    tf2zpk,
    unit_impulse,
    zpk2sos,
    zpk2tf,
)


def _resp(sos, w):
    z = np.exp(1j * w)
    h = np.ones_like(z, complex)
    for r in np.atleast_2d(sos):
        h *= (r[0] + r[1] / z + r[2] / z ** 2) / \
             (r[3] + r[4] / z + r[5] / z ** 2)
    return h


def test_normalize_and_tf2zpk():
    b, a = [0.0, 2.0, 4.0, 2.0], [2.0, 1.0, 0.5, 0.25]
    bn, an = normalize(b, a)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        bn2, an2 = sps.normalize(b, a)
    assert np.allclose(bn, bn2) and np.allclose(an, an2)
    z1, p1, k1 = tf2zpk(b, a)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        z2, p2, k2 = sps.tf2zpk(b, a)
    assert np.allclose(np.sort_complex(z1), np.sort_complex(z2))
    assert np.allclose(np.sort_complex(p1), np.sort_complex(p2))
    assert abs(k1 - k2) < 1e-14
    with pytest.raises(RuntimeError):
        normalize([1.0, 2.0, 3.0], [1.0, 2.0])  # improper
    with pytest.raises(RuntimeError):
        normalize([1.0], [0.0, 1.0])  # a[0] == 0


def test_zpk_tf_roundtrip():
    z, p, k = sps.butter(5, 0.3, output='zpk')
    b1, a1 = zpk2tf(z, p, k)
    b2, a2 = sps.zpk2tf(z, p, k)
    assert b1.dtype == np.float64  # conjugate-symmetric -> real coeffs
    assert np.allclose(b1, b2) and np.allclose(a1, a2)
    z1, p1, k1 = tf2zpk(b1, a1)
    assert np.allclose(np.sort_complex(p1), np.sort_complex(p)) and \
        abs(k1 - k) < 1e-12


def test_sos_zpk_conversions():
    sos = sps.butter(5, 0.3, output='sos')
    z1, p1, k1 = sos2zpk(sos)
    z2, p2, k2 = sps.sos2zpk(sos)
    assert np.allclose(np.sort_complex(z1), np.sort_complex(z2))
    assert np.allclose(np.sort_complex(p1), np.sort_complex(p2))
    assert abs(k1 - k2) < 1e-14
    # zpk2sos realizes the same transfer function as scipy's pairing
    z, p, k = sps.butter(4, [0.2, 0.5], btype='bandpass', output='zpk')
    w = np.linspace(1e-3, np.pi - 1e-3, 1024)
    assert np.abs(_resp(zpk2sos(z, p, k), w)
                  - _resp(sps.zpk2sos(z, p, k), w)).max() < 1e-12
    # roundtrip through tf
    b1, a1 = sos2tf(zpk2sos(z, p, k))
    b2, a2 = sps.zpk2tf(z, p, k)
    assert np.allclose(b1, b2, atol=1e-12) and np.allclose(a1, a2,
                                                           atol=1e-12)


@pytest.mark.parametrize('ba,aa,fs', [
    ([1.0, 2.0], [1.0, 1.5, 3.0], 10.0),
    ([0.5], [1.0, 0.2], 2.0),
    ([1.0, 0.0, 4.0], [1.0, 0.1, 9.0], 5.0),
])
def test_bilinear_matches_scipy(ba, aa, fs):
    b1, a1 = bilinear(ba, aa, fs=fs)
    b2, a2 = sps.bilinear(ba, aa, fs=fs)
    assert np.allclose(b1, b2, atol=1e-14)
    assert np.allclose(a1, a2, atol=1e-14)


def test_deconvolve_matches_scipy():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(50)
    div = np.array([1.0, 0.5, -0.2])
    q1, r1 = deconvolve(sig, div)
    q2, r2 = sps.deconvolve(sig, div)
    assert np.allclose(q1, q2) and np.allclose(r1, r2, atol=1e-12)
    # defining property
    assert np.allclose(np.convolve(div, q1) + r1, sig, atol=1e-10)
    # short signal: zero quotient, remainder = signal
    q, r = deconvolve([1.0, 2.0], [1.0, 0.0, 0.0])
    assert np.allclose(q, [0.0]) and np.allclose(r, [1.0, 2.0])


def test_unit_impulse():
    for args in [(7,), (7, 'mid'), ((3, 3), (1, 2)), (5, 2)]:
        assert np.array_equal(unit_impulse(*args), sps.unit_impulse(*args))


def test_bad_coefficients_warning():
    import warnings

    from dsc_tpu.models import BadCoefficients, normalize

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        b, a = normalize([0.0, 1.0], [2.0, 0.5])
    assert any(issubclass(r.category, BadCoefficients) for r in rec)
    assert np.allclose(b, [0.5]) and np.allclose(a, [1.0, 0.25])
