"""Analog prototypes, lp2* transforms, lfiltic, unique_roots, findfreqs,
dfreqresp/dbode and aliases vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    abcd_normalize,
    besselap,
    bilinear_zpk,
    buttap,
    cheb1ap,
    cheb2ap,
    choose_conv_method,
    dbode,
    dfreqresp,
    ellipap,
    fftconvolve,
    findfreqs,
    freqz_sos,
    lfilter,
    lfiltic,
    lp2bp,
    lp2bp_zpk,
    lp2bs,
    lp2bs_zpk,
    lp2hp,
    lp2hp_zpk,
    lp2lp,
    lp2lp_zpk,
    sosfreqz,
    unique_roots,
)


def _zpk_close(g, w, tol=1e-10):
    z1, p1, k1 = g
    z2, p2, k2 = w
    if np.atleast_1d(z2).size:
        assert np.allclose(np.sort_complex(np.atleast_1d(z1)),
                           np.sort_complex(np.atleast_1d(z2)), atol=tol)
    assert np.allclose(np.sort_complex(np.atleast_1d(p1)),
                       np.sort_complex(np.atleast_1d(p2)), atol=tol)
    assert abs(k1 - k2) < tol * max(abs(k2), 1.0)


@pytest.mark.parametrize('n', [1, 2, 5, 8])
def test_analog_prototypes(n):
    _zpk_close(buttap(n), sps.buttap(n))
    _zpk_close(cheb1ap(n, 1.0), sps.cheb1ap(n, 1.0))
    _zpk_close(cheb2ap(n, 40.0), sps.cheb2ap(n, 40.0))
    _zpk_close(ellipap(n, 1.0, 40.0), sps.ellipap(n, 1.0, 40.0), 1e-9)
    _zpk_close(besselap(n), sps.besselap(n), 1e-9)


def test_lp_transforms():
    b, a = sps.butter(3, 1.0, analog=True)
    for mine, ref, args in [
        (lp2lp, sps.lp2lp, (2.0,)), (lp2hp, sps.lp2hp, (2.0,)),
        (lp2bp, sps.lp2bp, (2.0, 0.5)), (lp2bs, sps.lp2bs, (2.0, 0.5)),
    ]:
        b1, a1 = mine(b, a, *args)
        b2, a2 = ref(b, a, *args)
        # same transfer function up to common normalization
        assert np.allclose(b1 / b1[0], np.atleast_1d(b2) / b2[0],
                           atol=1e-10), mine.__name__
        assert np.allclose(a1 / a1[0], a2 / a2[0], atol=1e-10)
    z, p, k = sps.buttap(4)
    for mine, ref, args in [
        (lp2lp_zpk, sps.lp2lp_zpk, (2.0,)),
        (lp2hp_zpk, sps.lp2hp_zpk, (2.0,)),
        (lp2bp_zpk, sps.lp2bp_zpk, (2.0, 0.5)),
        (lp2bs_zpk, sps.lp2bs_zpk, (2.0, 0.5)),
    ]:
        _zpk_close(mine(z, p, k, *args), ref(z, p, k, *args))
    _zpk_close(bilinear_zpk(z, p, k, 10.0),
               sps.bilinear_zpk(z, p, k, 10.0))


def test_lfiltic_continues_a_filter():
    b, a = sps.butter(4, 0.3)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(10)
    x = rng.standard_normal(10)
    assert np.allclose(lfiltic(b, a, y, x), sps.lfiltic(b, a, y, x))
    assert np.allclose(lfiltic(b, a, y), sps.lfiltic(b, a, y))
    # end-to-end: split filtering with the computed state
    sig = rng.standard_normal(128).astype(np.float32)
    full = sps.lfilter(b, a, sig.astype(np.float64))
    first = sps.lfilter(b, a, sig[:64].astype(np.float64))
    zi = lfiltic(b, a, first[::-1], sig[:64][::-1])
    cont, _ = lfilter(b, a, dsc.from_numpy(sig[64:]), zi=zi)
    assert np.abs(cont.numpy() - full[64:]).max() < 1e-4


def test_unique_roots_and_findfreqs():
    u1, m1 = unique_roots([1.0, 1.0001, 2.0, 2.0, 3.0], tol=1e-3)
    u2, m2 = sps.unique_roots([1.0, 1.0001, 2.0, 2.0, 3.0], tol=1e-3)
    assert np.allclose(np.sort(u1.real), np.sort(np.asarray(u2).real),
                       atol=1e-3)
    assert sorted(m1) == sorted(m2)
    for bb, aa in [([1.0, 2.0], [1.0, 1.4, 1.0]),
                   ([1.0], [1.0, 8.0, 25.0])]:
        assert np.allclose(findfreqs(bb, aa, 15),
                           sps.findfreqs(bb, aa, 15))


def test_discrete_responses():
    sysd = sps.cont2discrete(sps.tf2ss([1.0, 3.0, 3.0], [1.0, 2.0, 1.0]),
                             0.1)
    w1, h1 = dfreqresp(sysd, n=200)
    w2, h2 = sps.dfreqresp(sysd, n=200)
    assert np.allclose(w1, w2) and np.allclose(h1, h2)
    w1, m1, p1 = dbode(sysd, n=100)
    w2, m2, p2 = sps.dbode(sysd, n=100)
    assert np.allclose(w1, w2) and np.allclose(m1, m2) \
        and np.allclose(p1, p2)


def test_aliases_and_abcd():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(500).astype(np.float32)
    b = rng.standard_normal(33).astype(np.float32)
    got = fftconvolve(dsc.from_numpy(a), dsc.from_numpy(b)).numpy()
    ref = sps.fftconvolve(a.astype(np.float64), b.astype(np.float64))
    assert np.abs(got - ref).max() < 2e-6 * np.abs(ref).max()
    assert choose_conv_method(a, b) == 'fft'
    sos = sps.butter(4, 0.3, output='sos')
    w1, h1 = freqz_sos(sos)
    w2, h2 = sosfreqz(sos)
    assert np.allclose(h1, h2)
    g = abcd_normalize(A=np.eye(2), B=np.ones((2, 1)), C=np.ones((1, 2)))
    w = sps.abcd_normalize(A=np.eye(2), B=np.ones((2, 1)),
                           C=np.ones((1, 2)))
    for x, y in zip(g, w):
        assert np.allclose(x, y)
    with pytest.raises(RuntimeError):
        abcd_normalize(A=np.eye(2), B=np.ones((2, 1)))
