"""Pole placement: SISO exact vs scipy (Ackermann unique), MIMO by the
placed-poles contract (K is non-unique; scipy's own tests check the
same property)."""

import numpy as np
import pytest
import scipy.signal as sps

from dsc_tpu.models import place_poles


def _poles(rng, n):
    p = np.unique(np.round(-rng.uniform(0.5, 3.0, n), 3))[:n]
    while p.size < n:
        p = np.append(p, p.min() * 1.13 - 0.1)
    return p


@pytest.mark.parametrize('seed', range(5))
def test_siso_matches_scipy_exactly(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 6))
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, 1))
    poles = _poles(rng, n)
    got = place_poles(a, b, poles)
    ref = sps.place_poles(a, b, poles)
    assert np.allclose(got.gain_matrix, ref.gain_matrix, atol=1e-6,
                       rtol=1e-6)
    assert np.abs(np.sort_complex(got.computed_poles)
                  - np.sort_complex(np.asarray(poles, complex))).max() < 1e-6


@pytest.mark.parametrize('seed', range(8))
def test_mimo_places_requested_poles(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(3, 7))
    m = int(rng.integers(2, min(n, 4)))
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, m))
    poles = _poles(rng, n)
    got = place_poles(a, b, poles)
    assert np.abs(np.sort_complex(got.computed_poles)
                  - np.sort_complex(np.asarray(poles, complex))).max() < 1e-8
    assert got.gain_matrix.shape == (m, n)
    assert np.isrealobj(got.gain_matrix)


def test_complex_pairs_and_errors():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((4, 4))
    b = rng.standard_normal((4, 2))
    poles = np.array([-1 + 2j, -1 - 2j, -3.0, -4.0])
    got = place_poles(a, b, poles)
    assert np.abs(np.sort_complex(got.computed_poles)
                  - np.sort_complex(poles)).max() < 1e-8
    assert np.isrealobj(got.gain_matrix)
    with pytest.raises(RuntimeError):
        place_poles(a, b, [-1 + 2j, -1 + 2j, -3.0, -4.0])  # unpaired
    with pytest.raises(RuntimeError):
        place_poles(a, b, [-1.0, -2.0])  # wrong count
    # uncontrollable SISO
    a2 = np.diag([1.0, 2.0])
    b2 = np.asarray([[1.0], [0.0]])
    with pytest.raises(RuntimeError):
        place_poles(a2, b2, [-1.0, -2.0])
