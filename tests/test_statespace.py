"""State-space conversions, discretization and simulators vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    cont2discrete,
    dimpulse,
    dlsim,
    dstep,
    impulse,
    lsim,
    ss2tf,
    ss2zpk,
    step,
    tf2ss,
    zpk2ss,
)


B_A = ([1.0, 3.0, 3.0], [1.0, 2.0, 1.0])


def _abcd():
    return sps.tf2ss(*B_A)


def test_tf_ss_roundtrips():
    got = tf2ss(*B_A)
    want = sps.tf2ss(*B_A)
    for g, w in zip(got, want):
        assert np.allclose(g, w)
    n1, d1 = ss2tf(*got)
    n2, d2 = sps.ss2tf(*want)
    assert np.allclose(n1, n2) and np.allclose(d1, d2)
    z, p, k = sps.butter(4, 0.3, output='zpk')
    got = zpk2ss(z, p, k)
    z1, p1, k1 = ss2zpk(*got)
    assert np.allclose(np.sort_complex(p1), np.sort_complex(p))
    assert abs(k1 - k) < 1e-10


@pytest.mark.parametrize('method,alpha', [
    ('zoh', None), ('foh', None), ('impulse', None), ('bilinear', None),
    ('euler', None), ('backward_diff', None), ('gbt', 0.3),
])
def test_cont2discrete_matches_scipy(method, alpha):
    A, B, C, D = _abcd()
    if method == 'impulse':
        D = np.zeros((1, 1))
    kw = {} if alpha is None else {'alpha': alpha}
    got = cont2discrete((A, B, C, D), 0.1, method=method, **kw)
    want = sps.cont2discrete((A, B, C, D), 0.1, method=method, **kw)
    for g, w in zip(got[:-1], want[:-1]):
        assert np.allclose(np.asarray(g), np.asarray(w), atol=1e-12), method
    assert got[-1] == want[-1]


def test_cont2discrete_tf_and_zpk_forms():
    num, den, dt = cont2discrete(B_A, 0.1)
    num2, den2, dt2 = sps.cont2discrete(B_A, 0.1)
    assert np.allclose(num, num2) and np.allclose(den, den2)
    z, p, k = sps.butter(3, 2.0, analog=True, output='zpk')
    g = cont2discrete((z, p, k), 0.1)
    w = sps.cont2discrete((z, p, k), 0.1)
    assert np.allclose(np.sort_complex(np.atleast_1d(g[1])),
                       np.sort_complex(np.atleast_1d(w[1])))


def test_dlsim_matches_scipy():
    A, B, C, D = _abcd()
    sysd = sps.cont2discrete((A, B, C, D), 0.05)
    u = np.random.default_rng(0).standard_normal(300)
    t1, y1, x1 = dlsim(sysd, u)
    t2, y2, x2 = sps.dlsim(sysd, u)
    assert np.allclose(y1, y2, atol=1e-12)
    assert np.allclose(x1, x2, atol=1e-12)
    assert np.allclose(t1, t2)
    # nonzero initial state
    t1, y1, _ = dlsim(sysd, u, x0=[1.0, -0.5])
    t2, y2, _ = sps.dlsim(sysd, u, x0=[1.0, -0.5])
    assert np.allclose(y1, y2, atol=1e-12)


def test_dlsim_device_tensor_path():
    A, B, C, D = _abcd()
    sysd = sps.cont2discrete((A, B, C, D), 0.05)
    u = np.random.default_rng(1).standard_normal(256).astype(np.float32)
    _, y2, x2 = sps.dlsim(sysd, u.astype(np.float64))
    _, yt, xt = dlsim(sysd, dsc.from_numpy(u))
    assert isinstance(yt, dsc.Tensor) and isinstance(xt, dsc.Tensor)
    scale = np.abs(y2).max()
    assert np.abs(yt.numpy() - y2).max() < 1e-5 * scale
    assert np.abs(xt.numpy() - x2).max() < 1e-5 * max(np.abs(x2).max(), 1.0)


def test_lsim_step_impulse_match_scipy():
    A, B, C, D = _abcd()
    T = np.arange(200) * 0.05
    U = np.sin(T * 2.0)
    for interp in (True, False):
        t1, y1, _ = lsim((A, B, C, D), U, T, interp=interp)
        t2, y2, _ = sps.lsim((A, B, C, D), U, T, interp=interp)
        assert np.allclose(y1, y2, atol=1e-12), interp
    t1, y1 = step((A, B, C, D), T=T)
    t2, y2 = sps.step((A, B, C, D), T=T)
    assert np.allclose(y1, y2, atol=1e-12)
    t1, y1 = step((A, B, C, D))  # default horizon heuristic
    t2, y2 = sps.step((A, B, C, D))
    assert np.allclose(t1, t2) and np.allclose(y1, y2, atol=1e-12)
    t1, y1 = impulse((A, B, C, D), T=T)
    t2, y2 = sps.impulse((A, B, C, D), T=T)
    assert np.allclose(y1, y2, atol=1e-12)


def test_dstep_dimpulse():
    A, B, C, D = _abcd()
    sysd = sps.cont2discrete((A, B, C, D), 0.05)
    t1, y1 = dstep(sysd, n=64)
    t2, y2 = sps.dstep(sysd, n=64)
    assert np.allclose(y1, np.asarray(y2[0])[:, 0], atol=1e-12)
    t1, y1 = dimpulse(sysd, n=64)
    t2, y2 = sps.dimpulse(sysd, n=64)
    assert np.allclose(y1, np.asarray(y2[0])[:, 0], atol=1e-12)


def test_errors():
    A, B, C, D = _abcd()
    with pytest.raises(RuntimeError):
        cont2discrete((A, B, C, D), 0.1, method='bogus')
    with pytest.raises(RuntimeError):
        cont2discrete((A, B, C, D), 0.1, method='impulse')  # D != 0
    with pytest.raises(RuntimeError):
        lsim((A, B, C, D), np.ones(5), np.array([0.0, 0.1, 0.3, 0.4, 0.5]))
    with pytest.raises(RuntimeError):
        dlsim(sps.cont2discrete((A, B, C, D), 0.1), np.ones((5, 2)))
