"""Signal utilities vs scipy: sweep_poly, max_len_seq, vectorstrength,
minimum_phase."""

import numpy as np
import pytest
import scipy.signal as sps

from dsc_tpu.models import (
    max_len_seq,
    minimum_phase,
    sweep_poly,
    vectorstrength,
)


def test_sweep_poly_matches_scipy():
    t = np.linspace(0, 2, 1501)
    p = [0.05, -0.75, 2.5, 1.0]
    got = sweep_poly(t, p, phi=30.0).numpy()
    ref = sps.sweep_poly(t, np.poly1d(p), phi=30.0)
    assert np.abs(got - ref).max() < 1e-6
    got = sweep_poly(t, [2.0]).numpy()  # constant frequency
    ref = sps.sweep_poly(t, np.poly1d([2.0]))
    assert np.abs(got - ref).max() < 1e-6


@pytest.mark.parametrize('nbits', [2, 3, 5, 8, 12])
def test_max_len_seq_matches_scipy(nbits):
    s1, st1 = max_len_seq(nbits)
    s2, st2 = sps.max_len_seq(nbits)
    assert np.array_equal(s1, s2) and np.array_equal(st1, st2)
    # maximal period: every nonzero state visited once
    assert s1.size == 2 ** nbits - 1


def test_max_len_seq_custom_state_and_errors():
    s1, st1 = max_len_seq(6, state=[1, 0, 1, 1, 0, 1], length=37)
    s2, st2 = sps.max_len_seq(6, state=np.array([1, 0, 1, 1, 0, 1]),
                              length=37)
    assert np.array_equal(s1, s2) and np.array_equal(st1, st2)
    with pytest.raises(RuntimeError):
        max_len_seq(6, state=[0] * 6)
    with pytest.raises(RuntimeError):
        max_len_seq(40)  # beyond the built-in taps table, no taps given


def test_vectorstrength_matches_scipy():
    ev = np.sort(np.random.default_rng(0).uniform(0, 100, 400))
    s1, p1 = vectorstrength(ev, 7.3)
    s2, p2 = sps.vectorstrength(ev, 7.3)
    assert abs(s1 - s2) < 1e-12 and abs(p1 - p2) < 1e-10
    s1, p1 = vectorstrength(ev, [3.0, 7.3, 11.0])
    s2, p2 = sps.vectorstrength(ev, [3.0, 7.3, 11.0])
    assert np.abs(s1 - s2).max() < 1e-12
    assert np.abs(p1 - p2).max() < 1e-10
    # perfect locking
    s, _ = vectorstrength(np.arange(50) * 2.5, 2.5)
    assert abs(s - 1.0) < 1e-12


def test_minimum_phase_matches_scipy():
    h = sps.remez(151, [0, 0.2, 0.3, 1.0], [1, 0], fs=2.0)
    for half in (True, False):
        g1 = minimum_phase(h, half=half)
        g2 = sps.minimum_phase(h, half=half)
        assert g1.shape == np.asarray(g2).shape
        assert np.abs(g1 - g2).max() < 1e-10, half
    g1 = minimum_phase(h, method='hilbert')
    g2 = sps.minimum_phase(h, method='hilbert')
    # the DHT construction is itself approximate; agree to 1e-4
    assert np.abs(g1 - g2).max() < 1e-4
    # the minimum-phase property: zeros (approximately — the
    # homomorphic construction is itself approximate, and scipy's own
    # output has the same slight excursions) inside the unit circle
    z = np.roots(minimum_phase(h))
    assert np.abs(z).max() < 1.01
    with pytest.raises(RuntimeError):
        minimum_phase(h, method='bogus')
    with pytest.raises(RuntimeError):
        minimum_phase(h, n_fft=64)  # < len(h)
