"""scipy.signal.windows parity for the dsc window tier.

scipy.signal is the executable specification (same philosophy as the
reference's NumPy-oracle op tests, reference README.md:173-180): every
generator and the get_window dispatcher must match scipy bit-for-bit at
f64 and to f32 rounding otherwise, in both symmetric and periodic
(fftbins) conventions.
"""

import numpy as np
import pytest
import scipy.signal as sps
import scipy.signal.windows as spw

import dsc_tpu as dsc
import dsc_tpu.models as models
from dsc_tpu import windows as W


def _close(got, ref, tol=2e-6):
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(np.asarray(got, np.float64) - ref).max() <= tol * scale


# --------------------------------------------------- parameter-free family

PLAIN = ['flattop', 'blackmanharris', 'nuttall', 'boxcar', 'triang',
         'barthann', 'bohman', 'parzen', 'cosine', 'lanczos']


@pytest.mark.parametrize('name', PLAIN)
@pytest.mark.parametrize('n', [2, 63, 64])
def test_plain_windows_match_scipy(name, n):
    maker = getattr(W, name)
    ref_maker = getattr(spw, name)
    for sym in (True, False):
        got = maker(n, sym=sym).numpy()
        _close(got, ref_maker(n, sym=sym))
    # f64 must be exact
    got64 = maker(n, sym=True, dtype=dsc.Dtype.F64).numpy()
    assert np.abs(got64 - ref_maker(n, sym=True)).max() < 1e-14


def test_single_sample_and_empty():
    for name in PLAIN:
        assert getattr(W, name)(1).numpy().tolist() == [1.0]
        assert getattr(W, name)(0).shape == (0,)


# --------------------------------------------------- parameterized family

@pytest.mark.parametrize('n', [32, 65])
def test_parameterized_windows_match_scipy(n):
    _close(W.gaussian(n, 7.5).numpy(), spw.gaussian(n, 7.5))
    _close(W.gaussian(n, 7.5, sym=False).numpy(),
           spw.gaussian(n, 7.5, sym=False))
    _close(W.general_gaussian(n, 1.5, 7.0).numpy(),
           spw.general_gaussian(n, 1.5, 7.0))
    _close(W.general_hamming(n, 0.7).numpy(), spw.general_hamming(n, 0.7))
    _close(W.general_cosine(n, [0.4, 0.5, 0.1]).numpy(),
           spw.general_cosine(n, [0.4, 0.5, 0.1]))
    _close(W.exponential(n, tau=9.0).numpy(), spw.exponential(n, tau=9.0))
    _close(W.exponential(n, center=4.0, tau=9.0, sym=False).numpy(),
           spw.exponential(n, center=4.0, tau=9.0, sym=False))
    _close(W.taylor(n, 5, 40.0).numpy(), spw.taylor(n, 5, 40.0), tol=4e-6)
    _close(W.chebwin(n, 80.0).numpy(), spw.chebwin(n, 80.0))
    _close(W.chebwin(n, 80.0, sym=False).numpy(),
           spw.chebwin(n, 80.0, sym=False))


def test_kbd_and_dpss():
    _close(W.kaiser_bessel_derived(64, 9.0).numpy(),
           spw.kaiser_bessel_derived(64, 9.0))
    with pytest.raises(RuntimeError):
        W.kaiser_bessel_derived(63, 9.0)
    # single taper
    _close(np.abs(W.dpss(128, 3.0).numpy()),
           np.abs(spw.dpss(128, 3.0)), tol=1e-5)
    # multitaper basis: orthonormal columns, scipy parity per order
    got = W.dpss(128, 3.0, 4, dtype=dsc.Dtype.F64).numpy()
    ref = spw.dpss(128, 3.0, 4)
    assert got.shape == (4, 128)
    _close(got, ref, tol=1e-7)
    gram = got @ got.T
    assert np.abs(gram - np.eye(4)).max() < 1e-8


# --------------------------------------------------- get_window dispatcher

GET_SPECS = ['hann', 'hamming', 'blackman', 'flattop', 'boxcar', 'triang',
             'blackmanharris', 'nuttall', 'barthann', 'bohman', 'parzen',
             'cosine', 'lanczos', 'bartlett',
             ('kaiser', 8.6), ('gaussian', 7.0), ('tukey', 0.33),
             ('chebwin', 90.0), ('exponential', None, 12.0),
             ('general hamming', 0.62), 4.2]


@pytest.mark.parametrize('spec', GET_SPECS, ids=str)
@pytest.mark.parametrize('fftbins', [True, False])
def test_get_window_matches_scipy(spec, fftbins):
    n = 64
    ref = sps.get_window(spec, n, fftbins=fftbins)
    got = dsc.get_window(spec, n, fftbins=fftbins).numpy()
    _close(got, ref)
    # design_window is the host-side f64 path get_window uploads
    host = W.design_window(spec, n, fftbins=fftbins)
    assert np.abs(host - ref).max() < 1e-13


def test_get_window_errors():
    with pytest.raises(RuntimeError):
        dsc.get_window('not_a_window', 32)
    with pytest.raises(RuntimeError):
        dsc.get_window('kaiser', 32)  # needs a parameter
    with pytest.raises(RuntimeError):
        dsc.get_window(('kbd', 5.0), 32)  # periodic kbd undefined


# --------------------------------------------------- model integration

def test_welch_accepts_scipy_window_names():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2048).astype(np.float32)
    for win in ['flattop', ('gaussian', 24.0), ('chebwin', 80.0)]:
        f_ref, p_ref = sps.welch(x.astype(np.float64), fs=1000.0,
                                 window=win, nperseg=256)
        f, p = models.welch(dsc.from_numpy(x), fs=1000.0,
                                window=win, nperseg=256)
        assert np.allclose(f.numpy(), f_ref)
        scale = p_ref.max()
        assert np.abs(p.numpy() - p_ref).max() < 2e-4 * scale


def test_firwin_accepts_scipy_window_names():
    ref = sps.firwin(65, 0.3, window='flattop')
    got = models.firwin(65, 0.3, window='flattop').numpy()
    assert np.abs(got - ref).max() < 2e-6
    ref = sps.firwin(64, 0.25, window=('chebwin', 70.0))
    got = models.firwin(64, 0.25, window=('chebwin', 70.0)).numpy()
    assert np.abs(got - ref).max() < 2e-6


def test_hann_public():
    import scipy.signal.windows as w

    from dsc_tpu.windows import hann

    for sym in (True, False):
        got = hann(33, sym=sym).numpy()
        assert np.abs(got - w.hann(33, sym=sym)).max() < 1e-6
