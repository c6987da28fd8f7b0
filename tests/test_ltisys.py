"""lti/dlti object API vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

from dsc_tpu.models import StateSpace, TransferFunction, dlti, lti


B_A = ([1.0, 3.0, 3.0], [1.0, 2.0, 1.0])


def test_continuous_responses_match_scipy():
    mine = lti(*B_A)
    ref = sps.lti(*B_A)
    assert np.allclose(np.sort_complex(mine.poles),
                       np.sort_complex(ref.poles))
    assert np.allclose(np.sort_complex(mine.zeros),
                       np.sort_complex(ref.zeros))
    T = np.arange(100) * 0.05
    for meth in ('step', 'impulse'):
        t1, y1 = getattr(mine, meth)(T=T)
        t2, y2 = getattr(ref, meth)(T=T)
        assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)
    w = np.logspace(-1, 2, 60)
    w1, m1, p1 = mine.bode(w=w)
    w2, m2, p2 = ref.bode(w=w)
    assert np.allclose(m1, m2) and np.allclose(p1, p2)
    _, h1 = mine.freqresp(w=w)
    _, h2 = ref.freqresp(w=w)
    assert np.allclose(h1, h2)
    U = np.sin(T * 2.0)
    _, y1, _ = mine.output(U, T)
    _, y2, _ = ref.output(U, T)
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)


def test_discrete_responses_match_scipy():
    sd = sps.cont2discrete(sps.tf2ss(*B_A), 0.1)
    mine = dlti(*list(sd[:4]), dt=0.1)
    ref = sps.dlti(*list(sd[:4]), dt=0.1)
    t1, y1 = mine.step(N=50)
    t2, y2 = ref.step(n=50)
    assert np.allclose(np.asarray(y1), np.asarray(y2[0]).ravel())
    t1, y1 = mine.impulse(N=50)
    t2, y2 = ref.impulse(n=50)
    assert np.allclose(np.asarray(y1), np.asarray(y2[0]).ravel())
    w1, m1, p1 = mine.bode(n=60)
    w2, m2, p2 = ref.bode(n=60)
    assert np.allclose(w1, w2) and np.allclose(m1, m2)


def test_conversions_and_factories():
    sys_tf = lti(*B_A)
    assert isinstance(sys_tf, TransferFunction)
    ss = sys_tf.to_ss()
    assert isinstance(ss, StateSpace) and not ss.is_discrete
    back = ss.to_tf()
    assert np.allclose(back.num, sys_tf.num) and np.allclose(back.den,
                                                             sys_tf.den)
    zpk = lti([], [-1.0, -2.0], 3.0)
    assert zpk.to_tf().den.size == 3
    d = ss.to_discrete(0.1)
    r = sps.StateSpace(*sps.tf2ss(*B_A)).to_discrete(0.1)
    assert np.allclose(d.A, r.A) and d.dt == r.dt
    with pytest.raises(RuntimeError):
        d.to_ss().to_discrete(0.1)  # already discrete
    with pytest.raises(RuntimeError):
        lti([1.0])  # 1 argument is not a system
