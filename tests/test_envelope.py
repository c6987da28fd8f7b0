"""envelope and firwin_2d vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import envelope, firwin_2d


def _am(n=500):
    t = np.arange(n) / n
    return (np.cos(2 * np.pi * 30 * t)
            * (1 + 0.5 * np.cos(2 * np.pi * 3 * t))
            + 0.2 * t).astype(np.float32)


@pytest.mark.parametrize('kw', [
    dict(), dict(bp_in=(5, 60)), dict(squared=True),
    dict(residual='all'), dict(residual=None), dict(n_out=250),
    dict(n_out=1000), dict(bp_in=(None, 50)),
], ids=str)
def test_envelope_matches_scipy(kw):
    x = _am()
    got = envelope(dsc.from_numpy(x), **kw).numpy()
    ref = np.asarray(sps.envelope(x.astype(np.float64), **kw))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * max(np.abs(ref).max(), 1e-30)


def test_envelope_batched_and_errors():
    xb = np.stack([_am(), _am()[::-1].copy()])
    got = envelope(dsc.from_numpy(xb)).numpy()
    ref = np.asarray(sps.envelope(xb.astype(np.float64)))
    # scipy stacks (env, res) on axis 0 ahead of the batch dim
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        envelope(dsc.from_numpy(_am()), residual='bogus')
    with pytest.raises(RuntimeError):
        envelope(dsc.from_numpy(_am()), bp_in=(400, 10))


def test_firwin_2d_matches_scipy():
    got = firwin_2d((15, 17), ('hamming', 'hann'), fc=0.3)
    ref = sps.firwin_2d((15, 17), ('hamming', 'hann'), fc=0.3)
    assert np.abs(got - ref).max() < 1e-6
    got = firwin_2d((15, 15), 'hamming', fc=0.4, circular=True)
    ref = sps.firwin_2d((15, 15), 'hamming', fc=0.4, circular=True)
    assert np.abs(got - ref).max() < 1e-6
    with pytest.raises(RuntimeError):
        firwin_2d((15, 17), ('hamming', 'hann'))  # fc required
