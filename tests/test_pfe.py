"""Partial-fraction expansion vs scipy (residue/residuez/invres/invresz)."""

import numpy as np
import pytest
import scipy.signal as sps

from dsc_tpu.models import invres, invresz, residue, residuez


def _canon(r, p):
    r, p = np.asarray(r), np.asarray(p)
    o = np.lexsort((r.round(8).imag, r.round(8).real,
                    p.round(6).imag, p.round(6).real))
    return r[o], p[o]


S_CASES = [
    ([1.0, 2.0], np.poly([-1.0, -2.0, -3.0])),
    ([1.0, 0.5, 2.0], np.poly([-1.0, -1.0, -2.0])),   # double pole
    ([3.0, 1.0], np.poly([-1.0, -1.0, -1.0])),        # triple pole
    ([1.0, 1.0, 1.0, 1.0], [1.0, 2.0, 1.0]),          # improper
    (np.poly([-0.5 + 1j, -0.5 - 1j]),
     np.poly([-1 + 2j, -1 - 2j, -3.0])),              # complex pairs
]


@pytest.mark.parametrize('b,a', S_CASES, ids=range(len(S_CASES)))
def test_residue_and_invres(b, a):
    r1, p1, k1 = residue(b, a)
    r2, p2, k2 = sps.residue(b, a)
    (r1, p1), (r2, p2) = _canon(r1, p1), _canon(r2, p2)
    assert np.allclose(r1, r2, atol=1e-8) and np.allclose(p1, p2,
                                                          atol=1e-8)
    assert np.asarray(k1).size == np.asarray(k2).size
    if np.asarray(k1).size:
        assert np.allclose(np.atleast_1d(k1), np.atleast_1d(k2))
    b1, a1 = invres(r2, p2, k2)
    b2, a2 = sps.invres(r2, p2, k2)
    assert np.allclose(np.trim_zeros(np.atleast_1d(b1), 'f'),
                       np.trim_zeros(np.atleast_1d(b2), 'f'), atol=1e-8)
    assert np.allclose(a1, a2, atol=1e-8)


Z_CASES = [
    ([1.0, -0.5], np.poly([0.5, -0.3])[::-1]),
    ([1.0, 0.2, 0.1], [1.0, -1.0, 0.25]),    # double pole at z = 0.5
    ([2.0, 1.0, 0.0, 0.5], [1.0, -0.8]),     # improper: direct z^-i terms
]


@pytest.mark.parametrize('b,a', Z_CASES, ids=range(len(Z_CASES)))
def test_residuez_and_invresz(b, a):
    b = np.asarray(b, float)
    a = np.asarray(a, float)
    r1, p1, k1 = residuez(b, a)
    r2, p2, k2 = sps.residuez(b, a)
    (r1, p1), (r2, p2) = _canon(r1, p1), _canon(r2, p2)
    assert np.allclose(r1, r2, atol=1e-8) and np.allclose(p1, p2,
                                                          atol=1e-8)
    assert np.asarray(k1).size == np.asarray(k2).size
    if np.asarray(k1).size:
        assert np.allclose(np.atleast_1d(k1), np.atleast_1d(k2))
    b1, a1 = invresz(r2, p2, k2)
    b2, a2 = sps.invresz(r2, p2, k2)
    assert np.allclose(b1, b2, atol=1e-8) and np.allclose(a1, a2,
                                                          atol=1e-8)


def test_pfe_errors():
    with pytest.raises(RuntimeError):
        residue([1.0], [0.0])
    with pytest.raises(RuntimeError):
        invres([1.0, 2.0], [0.5], 0.0)  # size mismatch
    with pytest.raises(RuntimeError):
        residue([1.0], [1.0, 1.0], rtype='bogus')
