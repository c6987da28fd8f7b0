"""scipy.signal.stft / istft / check_COLA / check_NOLA parity.

scipy is the executable spec: Zxx values, f/t vectors, boundary modes,
padding, psd scaling and the NOLA least-squares inverse are all compared
directly.
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import check_COLA, check_NOLA, istft, stft


def _sig(n=3000, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


STFT_CONFIGS = [
    dict(),
    dict(noverlap=192),
    dict(boundary='even'),
    dict(boundary='odd'),
    dict(boundary='constant'),
    dict(boundary=None),
    dict(padded=False),
    dict(nfft=512),
    dict(scaling='psd'),
    dict(detrend='linear'),
    dict(window=('tukey', 0.4)),
    dict(nperseg=200, nfft=256),
    dict(return_onesided=False),
]


@pytest.mark.parametrize('kw', STFT_CONFIGS, ids=str)
def test_stft_matches_scipy(kw):
    x = _sig()
    f1, t1, z1 = stft(dsc.from_numpy(x), fs=100.0, **kw)
    f2, t2, z2 = sps.stft(x.astype(np.float64), fs=100.0, **kw)
    assert np.allclose(f1.numpy(), f2)
    assert np.allclose(t1.numpy(), t2, atol=1e-5)
    scale = max(np.abs(z2).max(), 1e-30)
    assert np.abs(z1.numpy() - z2).max() < 1e-5 * scale


@pytest.mark.parametrize('kw', [
    dict(nperseg=256),
    dict(nperseg=256, noverlap=192),
    dict(nperseg=256, scaling='psd'),
    dict(nperseg=128, noverlap=96),
], ids=str)
def test_istft_roundtrip_and_scipy(kw):
    x = _sig()
    _, _, z = stft(dsc.from_numpy(x), fs=100.0, **kw)
    t1, xr = istft(z, fs=100.0, **kw)
    t2, x2 = sps.istft(
        sps.stft(x.astype(np.float64), fs=100.0, **kw)[2], fs=100.0, **kw)
    assert xr.shape == x2.shape
    assert np.abs(xr.numpy()[:x.size] - x).max() < 1e-5
    assert np.abs(xr.numpy() - x2).max() < 1e-5
    assert np.allclose(t1.numpy(), t2, atol=1e-5)


def test_stft_batched():
    xb = np.random.default_rng(1).standard_normal((3, 2000)).astype(
        np.float32)
    f, t, z = stft(dsc.from_numpy(xb), nperseg=256)
    assert z.shape[0] == 3 and z.shape[1] == 129
    _, xr = istft(z, nperseg=256)
    assert np.abs(xr.numpy()[:, :2000] - xb).max() < 1e-5
    # per-row equality with the unbatched path
    _, _, z0 = stft(dsc.from_numpy(xb[0]), nperseg=256)
    assert np.allclose(z.numpy()[0], z0.numpy(), atol=1e-6)


def test_cola_nola_parity():
    cases = [('hann', 256, 128), ('hann', 256, 192), ('boxcar', 256, 0),
             ('hann', 256, 100), (('tukey', 0.5), 256, 64),
             ('hann', 255, 127), ('blackman', 256, 192),
             ('hamming', 256, 128)]
    for w, n, no in cases:
        assert check_COLA(w, n, no) == sps.check_COLA(w, n, no), (w, n, no)
        assert check_NOLA(w, n, no) == sps.check_NOLA(w, n, no), (w, n, no)


def test_stft_errors():
    x = dsc.from_numpy(_sig(512))
    with pytest.raises(RuntimeError):
        stft(x, nperseg=200)  # nfft defaults to nperseg: not pow2
    with pytest.raises(RuntimeError):
        stft(x, boundary='bogus')
    with pytest.raises(RuntimeError):
        stft(x, scaling='bogus')
    _, _, z = stft(x, nperseg=256)
    with pytest.raises(RuntimeError):
        istft(z, nperseg=256, window=np.zeros(256))  # fails NOLA


def test_dual_windows_match_scipy():
    from scipy.signal._short_time_fft import _calc_dual_canonical_window

    from dsc_tpu.models import closest_STFT_dual_window, stft_dual_window

    rng = np.random.default_rng(0)
    for win, hop in [(np.hanning(64), 16), (np.hamming(48), 12),
                     (rng.uniform(0.2, 1.0, 40), 8)]:
        d = stft_dual_window(win, hop)
        assert np.allclose(
            d, _calc_dual_canonical_window(np.asarray(win, np.float64),
                                           hop))
        for kw in [dict(), dict(scaled=False),
                   dict(desired_dual=np.hanning(len(win)))]:
            g, ga = closest_STFT_dual_window(win, hop, **kw)
            r, ra = sps.closest_STFT_dual_window(win, hop, **kw)
            assert np.allclose(g, r) and abs(ga - ra) < 1e-12
    with pytest.raises(RuntimeError):
        stft_dual_window(np.hanning(64), 64)  # hop too large: zeros
