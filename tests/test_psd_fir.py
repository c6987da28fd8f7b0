"""PSD estimators (welch/periodogram) and FIR design (firwin) vs scipy.

scipy.signal is the executable specification for these pipelines, the
same way NumPy is for the op set (reference README.md:173-180 testing
philosophy extended to the model layer).
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import coherence, csd, firwin, periodogram, welch


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 1000.0
    x = np.sin(2 * np.pi * 97.0 * t) + 0.5 * rng.standard_normal(n)
    return x.astype(np.float32)


def _close(got, ref, tol=2e-4):
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(got - ref).max() < tol * scale


# ---------------------------------------------------------------- welch

@pytest.mark.parametrize('nperseg,noverlap', [(256, None), (512, 384), (1024, 0)])
def test_welch_matches_scipy(nperseg, noverlap):
    x = _sig(8192)
    f, pxx = welch(dsc.from_numpy(x), fs=1000.0, nperseg=nperseg,
                   noverlap=noverlap)
    f_ref, p_ref = sps.welch(x, fs=1000.0, nperseg=nperseg,
                             noverlap=noverlap)
    assert np.allclose(f.numpy(), f_ref)
    _close(pxx.numpy(), p_ref)


@pytest.mark.parametrize('window', ['hamming', 'blackman', None])
def test_welch_windows(window):
    x = _sig(4096, seed=1)
    _, pxx = welch(dsc.from_numpy(x), window=window, nperseg=256)
    _, p_ref = sps.welch(x, window=window or 'boxcar', nperseg=256)
    _close(pxx.numpy(), p_ref)


def test_welch_spectrum_scaling():
    x = _sig(4096, seed=2)
    _, pxx = welch(dsc.from_numpy(x), fs=8.0, nperseg=512,
                   scaling='spectrum')
    _, p_ref = sps.welch(x, fs=8.0, nperseg=512, scaling='spectrum')
    _close(pxx.numpy(), p_ref)


@pytest.mark.parametrize('detrend', ['constant', 'linear', False])
def test_welch_detrend(detrend):
    # add a strong trend so detrending is load-bearing
    x = _sig(4096, seed=3) + np.linspace(0, 50, 4096, dtype=np.float32)
    _, pxx = welch(dsc.from_numpy(x), nperseg=256, detrend=detrend)
    _, p_ref = sps.welch(x, nperseg=256, detrend=detrend)
    _close(pxx.numpy(), p_ref, tol=5e-4)


def test_welch_median_average():
    x = _sig(8192, seed=4)
    _, pxx = welch(dsc.from_numpy(x), nperseg=256, average='median')
    _, p_ref = sps.welch(x, nperseg=256, average='median')
    _close(pxx.numpy(), p_ref)


def test_welch_batched_matches_rowwise():
    xs = np.stack([_sig(4096, seed=s) for s in range(3)])
    _, pxx = welch(dsc.from_numpy(xs), nperseg=256)
    _, p_ref = sps.welch(xs, nperseg=256, axis=-1)
    assert pxx.shape == p_ref.shape
    _close(pxx.numpy(), p_ref)


def test_welch_rejects_bad_args():
    x = dsc.from_numpy(_sig(1024))
    with pytest.raises(RuntimeError):
        welch(x, nperseg=300)  # non-pow2
    with pytest.raises(RuntimeError):
        welch(x, nperseg=2048)  # longer than the signal
    with pytest.raises(RuntimeError):
        welch(x, nperseg=256, noverlap=256)
    with pytest.raises(RuntimeError):
        welch(x, nperseg=256, scaling='nope')


@pytest.mark.parametrize('kw', [
    dict(), dict(nperseg=512, noverlap=256), dict(scaling='spectrum'),
    dict(mode='magnitude'), dict(window='hann', nperseg=128),
])
def test_psd_spectrogram_matches_scipy(kw):
    from dsc_tpu.models import psd_spectrogram

    x = _sig(8192, seed=30)
    f, t, S = psd_spectrogram(dsc.from_numpy(x), fs=100.0, **kw)
    f_ref, t_ref, s_ref = sps.spectrogram(x, fs=100.0, **kw)
    assert S.shape == s_ref.shape
    assert np.allclose(f.numpy(), f_ref)
    assert np.allclose(t.numpy(), t_ref.astype(np.float32))
    assert np.abs(S.numpy() - s_ref).max() < 5e-4 * s_ref.max()


def test_psd_spectrogram_complex_and_batched():
    from dsc_tpu.models import psd_spectrogram

    x = _sig(8192, seed=31)
    _, _, Z = psd_spectrogram(dsc.from_numpy(x), mode='complex', nperseg=256)
    _, _, z_ref = sps.spectrogram(x, mode='complex', nperseg=256)
    assert np.abs(Z.numpy() - z_ref).max() < 5e-4 * np.abs(z_ref).max()
    xb = np.stack([x[:4096], x[4096:]])
    _, _, S = psd_spectrogram(dsc.from_numpy(xb))
    _, _, s_ref = sps.spectrogram(xb, axis=-1)
    assert S.shape == s_ref.shape
    assert np.abs(S.numpy() - s_ref).max() < 5e-4 * s_ref.max()


def test_periodogram_matches_scipy():
    x = _sig(4096, seed=5)
    f, pxx = periodogram(dsc.from_numpy(x), fs=100.0)
    f_ref, p_ref = sps.periodogram(x, fs=100.0)
    assert np.allclose(f.numpy(), f_ref)
    _close(pxx.numpy(), p_ref)


def test_periodogram_windowed():
    x = _sig(2048, seed=6)
    _, pxx = periodogram(dsc.from_numpy(x), window='hann')
    _, p_ref = sps.periodogram(x, window='hann')
    _close(pxx.numpy(), p_ref)


# ----------------------------------------------------------- csd / coherence

def _pair(n, seed=0):
    rng = np.random.default_rng(seed)
    x = _sig(n, seed)
    # y = delayed, filtered x + noise so Pxy and Cxy are nontrivial
    y = (np.roll(x, 7) * 0.8 + 0.2 * rng.standard_normal(n)).astype(np.float32)
    return x, y


def test_csd_matches_scipy():
    x, y = _pair(8192)
    f, pxy = csd(dsc.from_numpy(x), dsc.from_numpy(y), fs=500.0, nperseg=512)
    f_ref, p_ref = sps.csd(x, y, fs=500.0, nperseg=512)
    assert np.allclose(f.numpy(), f_ref)
    got = pxy.numpy()
    scale = np.abs(p_ref).max()
    assert np.abs(got - p_ref).max() < 2e-4 * scale


def test_csd_of_self_is_welch():
    x = _sig(4096, seed=8)
    _, pxx = welch(dsc.from_numpy(x), nperseg=256)
    _, pself = csd(dsc.from_numpy(x), dsc.from_numpy(x), nperseg=256)
    pz = pself.numpy()
    assert np.abs(pz.real - pxx.numpy()).max() < 1e-6 * pxx.numpy().max()
    assert np.abs(pz.imag).max() < 1e-6 * pxx.numpy().max()


def test_csd_batched():
    xs = np.stack([_pair(4096, s)[0] for s in range(2)])
    ys = np.stack([_pair(4096, s)[1] for s in range(2)])
    _, pxy = csd(dsc.from_numpy(xs), dsc.from_numpy(ys), nperseg=256)
    _, p_ref = sps.csd(xs, ys, nperseg=256, axis=-1)
    assert pxy.shape == p_ref.shape
    assert np.abs(pxy.numpy() - p_ref).max() < 2e-4 * np.abs(p_ref).max()


def test_coherence_matches_scipy():
    x, y = _pair(16384, seed=9)
    f, cxy = coherence(dsc.from_numpy(x), dsc.from_numpy(y), nperseg=512)
    f_ref, c_ref = sps.coherence(x, y, nperseg=512)
    assert np.allclose(f.numpy(), f_ref)
    got = cxy.numpy()
    assert np.abs(got - c_ref).max() < 5e-4
    assert got.min() >= 0.0 and got.max() <= 1.0 + 1e-6


def test_csd_rejects_shape_mismatch():
    x = dsc.from_numpy(_sig(1024))
    y = dsc.from_numpy(_sig(2048))
    with pytest.raises(RuntimeError):
        csd(x, y, nperseg=256)


# --------------------------------------------------------------- firwin

@pytest.mark.parametrize(
    'numtaps,cutoff,pass_zero',
    [
        (65, 0.3, True),       # lowpass
        (64, 0.25, True),      # even-tap lowpass
        (65, 0.3, False),      # highpass (odd taps required)
        (64, [0.2, 0.5], False),  # bandpass
        (65, [0.2, 0.5], True),   # bandstop
        (33, [0.1, 0.3, 0.6], False),  # multi-band
    ],
)
def test_firwin_matches_scipy(numtaps, cutoff, pass_zero):
    got = firwin(numtaps, cutoff, pass_zero=pass_zero).numpy()
    ref = sps.firwin(numtaps, cutoff, pass_zero=pass_zero)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5


@pytest.mark.parametrize('window', ['hann', 'blackman', ('kaiser', 8.6), None])
def test_firwin_windows(window):
    got = firwin(65, 0.4, window=window).numpy()
    ref = sps.firwin(65, 0.4, window=window or 'boxcar')
    assert np.abs(got - ref).max() < 1e-5


def test_firwin_fs_units():
    got = firwin(51, 100.0, fs=1000.0).numpy()
    ref = sps.firwin(51, 100.0, fs=1000.0)
    assert np.abs(got - ref).max() < 1e-5


def test_firwin_no_scale():
    got = firwin(65, 0.3, scale=False).numpy()
    ref = sps.firwin(65, 0.3, scale=False)
    assert np.abs(got - ref).max() < 1e-5


def test_firwin_rejects_bad_args():
    with pytest.raises(RuntimeError):
        firwin(64, 0.3, pass_zero=False)  # even-tap highpass
    with pytest.raises(RuntimeError):
        firwin(65, 1.5)  # cutoff outside (0, 1)
    with pytest.raises(RuntimeError):
        firwin(65, [0.5, 0.2])  # non-increasing
    with pytest.raises(RuntimeError):
        firwin(0, 0.3)


# ------------------------------------------------- detrend / resample_poly

def test_detrend_matches_scipy():
    from dsc_tpu.models import detrend

    x = (_sig(2048, seed=20)
         + np.linspace(0, 10, 2048, dtype=np.float32) + 5.0)
    for kind in ('constant', 'linear'):
        got = detrend(dsc.from_numpy(x), type=kind).numpy()
        ref = sps.detrend(x.astype(np.float64), type=kind)
        assert np.abs(got - ref).max() < 1e-3
    with pytest.raises(RuntimeError):
        detrend(dsc.from_numpy(x), type='nope')


def test_detrend_batched():
    from dsc_tpu.models import detrend

    xs = np.stack([_sig(512, seed=s) + s * 3.0 for s in range(3)])
    got = detrend(dsc.from_numpy(xs), type='linear').numpy()
    ref = sps.detrend(xs.astype(np.float64), type='linear', axis=-1)
    assert np.abs(got - ref).max() < 1e-3


@pytest.mark.parametrize('n,up,down', [
    (1000, 2, 3), (1000, 3, 2), (999, 7, 5), (512, 1, 2), (512, 5, 1),
    (1000, 4, 6),  # non-reduced ratio
])
def test_resample_poly_matches_scipy(n, up, down):
    from dsc_tpu.models import resample_poly

    x = _sig(n, seed=n + up + down)
    got = resample_poly(dsc.from_numpy(x), up, down).numpy()
    ref = sps.resample_poly(x.astype(np.float64), up, down)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_resample_poly_batched_and_identity():
    from dsc_tpu.models import resample_poly

    xs = np.stack([_sig(777, seed=s) for s in range(2)])
    got = resample_poly(dsc.from_numpy(xs), 3, 4).numpy()
    ref = sps.resample_poly(xs.astype(np.float64), 3, 4, axis=-1)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
    x1 = dsc.from_numpy(xs[0])
    assert resample_poly(x1, 2, 2) is x1
    with pytest.raises(RuntimeError):
        resample_poly(x1, 0, 1)


# ------------------------------------------------------------ correlate

@pytest.mark.parametrize('mode', ['full', 'same', 'valid'])
@pytest.mark.parametrize('n,k', [(100, 7), (100, 8), (333, 64)])
def test_correlate_matches_numpy(mode, n, k):
    from dsc_tpu.models import correlate

    rng = np.random.default_rng(n + k)
    a = rng.standard_normal(n).astype(np.float32)
    v = rng.standard_normal(k).astype(np.float32)
    got = correlate(dsc.from_numpy(a), dsc.from_numpy(v), mode=mode).numpy()
    ref = np.correlate(a, v, mode)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


@pytest.mark.parametrize('mode', ['full', 'same', 'valid'])
def test_correlate2d_matches_scipy(mode):
    from dsc_tpu.models import correlate2d

    rng = np.random.default_rng(40)
    a = rng.standard_normal((40, 50)).astype(np.float32)
    k = rng.standard_normal((5, 7)).astype(np.float32)
    got = correlate2d(dsc.from_numpy(a), dsc.from_numpy(k), mode=mode)
    ref = sps.correlate2d(a, k, mode=mode)
    assert got.shape == ref.shape
    assert np.abs(got.numpy() - ref).max() < 1e-3 * np.abs(ref).max()


def test_correlate_peak_finds_delay():
    from dsc_tpu.models import correlate

    rng = np.random.default_rng(3)
    v = rng.standard_normal(256).astype(np.float32)
    a = np.zeros(1024, np.float32)
    a[100 : 100 + 256] = v  # v embedded at offset 100
    c = correlate(dsc.from_numpy(a), dsc.from_numpy(v), mode='valid').numpy()
    assert int(np.argmax(c)) == 100


def test_correlate_rejects_bad_args():
    from dsc_tpu.models import correlate

    a = dsc.from_numpy(np.zeros(8, np.float32))
    v = dsc.from_numpy(np.zeros(16, np.float32))
    with pytest.raises(RuntimeError):
        correlate(a, v)
    with pytest.raises(RuntimeError):
        correlate(v, a, mode='nope')


# ------------------------------------------------------ medfilt / wiener

@pytest.mark.parametrize('k', [3, 5, 9])
def test_medfilt_matches_scipy(k):
    from dsc_tpu.models import medfilt

    x = _sig(501, seed=k)
    got = medfilt(dsc.from_numpy(x), k).numpy()
    ref = sps.medfilt(x.astype(np.float64), k)
    assert np.abs(got - ref).max() == 0.0  # medians are exact picks


def test_medfilt_batched_and_errors():
    from dsc_tpu.models import medfilt

    xs = np.random.default_rng(1).standard_normal((3, 128)).astype(np.float32)
    got = medfilt(dsc.from_numpy(xs), 5).numpy()
    for i in range(3):
        assert np.array_equal(got[i], sps.medfilt(xs[i].astype(np.float64), 5)
                              .astype(np.float32))
    with pytest.raises(RuntimeError):
        medfilt(dsc.from_numpy(xs), 4)


@pytest.mark.parametrize('k,noise', [(3, None), (5, 0.5), (9, None)])
def test_wiener_matches_scipy(k, noise):
    from dsc_tpu.models import wiener

    x = _sig(501, seed=k + 10)
    got = wiener(dsc.from_numpy(x), k, noise).numpy()
    ref = sps.wiener(x.astype(np.float64), k, noise)
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


# --------------------------------------------------------- fft_convolve2

@pytest.mark.parametrize('mode', ['full', 'same', 'valid'])
@pytest.mark.parametrize('shape', [(64, 80, 5, 7), (33, 47, 8, 8)])
def test_fft_convolve2_matches_scipy(mode, shape):
    from dsc_tpu.models import fft_convolve2

    m, n, p, q = shape
    rng = np.random.default_rng(m * n)
    a = rng.standard_normal((m, n)).astype(np.float32)
    k = rng.standard_normal((p, q)).astype(np.float32)
    got = fft_convolve2(dsc.from_numpy(a), dsc.from_numpy(k), mode=mode)
    ref = sps.fftconvolve(a, k, mode=mode)
    assert got.shape == ref.shape
    assert np.abs(got.numpy() - ref).max() < 1e-3 * np.abs(ref).max()


def test_fft_convolve2_gaussian_blur():
    # a separable blur through the 2-D path equals two 1-D passes
    from dsc_tpu.models import fft_convolve2

    rng = np.random.default_rng(9)
    img = rng.standard_normal((96, 128)).astype(np.float32)
    g = np.exp(-0.5 * (np.arange(-3, 4) / 1.5) ** 2)
    g = (g / g.sum()).astype(np.float32)
    got = fft_convolve2(dsc.from_numpy(img),
                        dsc.from_numpy(np.outer(g, g)), mode='same').numpy()
    ref = sps.fftconvolve(img, np.outer(g, g), mode='same')
    assert np.abs(got - ref).max() < 1e-4


def test_fft_convolve2_rejects_bad_args():
    from dsc_tpu.models import fft_convolve2

    a = dsc.from_numpy(np.zeros((8, 8), np.float32))
    v = dsc.from_numpy(np.zeros(8, np.float32))
    with pytest.raises(RuntimeError):
        fft_convolve2(a, v)
    big = dsc.from_numpy(np.zeros((16, 16), np.float32))
    with pytest.raises(RuntimeError):
        fft_convolve2(a, big, mode='valid')


# ----------------------------------------------------------------- fuzz

def test_fuzz_welch_configs_vs_scipy():
    rng = np.random.default_rng(42)
    x = _sig(8192, seed=42)
    for _ in range(10):
        nperseg = int(2 ** rng.integers(5, 11))
        noverlap = int(rng.integers(0, nperseg))
        windows = ['hann', 'hamming', 'blackman', None]
        detrends = ['constant', 'linear', False]
        window = windows[int(rng.integers(len(windows)))]
        detrend = detrends[int(rng.integers(len(detrends)))]
        scaling = ['density', 'spectrum'][int(rng.integers(2))]
        _, p = welch(dsc.from_numpy(x), fs=123.0, window=window,
                     nperseg=nperseg, noverlap=noverlap, detrend=detrend,
                     scaling=scaling)
        _, p_ref = sps.welch(x, fs=123.0, window=window or 'boxcar',
                             nperseg=nperseg, noverlap=noverlap,
                             detrend=detrend, scaling=scaling)
        assert np.abs(p.numpy() - p_ref).max() < 5e-4 * p_ref.max(), (
            nperseg, noverlap, window, detrend, scaling)


@pytest.mark.parametrize('numtaps,freq,gain', [
    (65, [0.0, 0.3, 0.5, 1.0], [1.0, 1.0, 0.0, 0.0]),
    (33, [0.0, 0.2, 0.4, 0.6, 1.0], [0.0, 1.0, 0.5, 1.0, 0.0]),
    (64, [0.0, 0.5, 1.0], [1.0, 0.5, 0.0]),
])
def test_firwin2_matches_scipy(numtaps, freq, gain):
    from dsc_tpu.models import firwin2

    got = firwin2(numtaps, freq, gain).numpy()
    ref = sps.firwin2(numtaps, freq, gain)
    assert np.abs(got - ref).max() < 1e-5


def test_firwin2_rejects_bad_args():
    from dsc_tpu.models import firwin2

    with pytest.raises(RuntimeError):
        firwin2(65, [0.1, 1.0], [1.0, 0.0])  # freq not starting at 0
    with pytest.raises(RuntimeError):
        firwin2(64, [0.0, 1.0], [1.0, 1.0])  # even taps, Nyquist gain != 0
    with pytest.raises(RuntimeError):
        firwin2(65, [0.0, 0.5, 0.4, 1.0], [1, 1, 0, 0])  # non-monotone


# ---------------------------------------------------------------- remez

def _ripple(taps, bands, desired, weight):
    w = np.linspace(0, 0.5, 4001)
    h = np.abs(np.polyval(taps[::-1], np.exp(-2j * np.pi * w))
               * np.exp(1j * np.pi * w * (len(taps) - 1)))
    e = 0.0
    for i in range(len(desired)):
        m = (w >= bands[2 * i]) & (w <= bands[2 * i + 1])
        e = max(e, (np.abs(h[m] - desired[i]) * weight[i]).max())
    return e


@pytest.mark.parametrize('numtaps,bands,desired,weight', [
    (73, [0, 0.2, 0.25, 0.5], [1, 0], [1, 1]),
    (65, [0, 0.1, 0.15, 0.35, 0.4, 0.5], [0, 1, 0], [1, 1, 1]),
    (64, [0, 0.2, 0.3, 0.5], [1, 0], [1, 2]),   # even taps (type II)
    (31, [0, 0.15, 0.2, 0.5], [1, 0], [1, 10]),
])
def test_remez_matches_scipy(numtaps, bands, desired, weight):
    from dsc_tpu.models import remez

    got = remez(numtaps, bands, desired, weight=weight).numpy()
    ref = sps.remez(numtaps, bands, desired, weight=weight, fs=1.0)
    assert np.abs(got - ref).max() < 1e-4
    # equiripple optimality: our achieved ripple within 1% of scipy's
    e_got = _ripple(got.astype(np.float64), bands, desired, weight)
    e_ref = _ripple(ref, bands, desired, weight)
    assert e_got < e_ref * 1.01 + 1e-9


def test_remez_fs_units_and_errors():
    from dsc_tpu.models import remez

    got = remez(51, [0, 200, 250, 500], [1, 0], fs=1000.0).numpy()
    ref = sps.remez(51, [0, 200, 250, 500], [1, 0], fs=1000.0)
    assert np.abs(got - ref).max() < 1e-4
    with pytest.raises(RuntimeError):
        remez(51, [0, 0.2, 0.25], [1, 0])  # odd edge count
    with pytest.raises(RuntimeError):
        remez(51, [0, 0.2, 0.25, 0.5], [1])  # desired size mismatch
    with pytest.raises(RuntimeError):
        remez(64, [0, 0.2, 0.25, 0.5], [1, 1])  # even taps, Nyquist gain


# --------------------------------------------------------------- savgol

def test_savgol_coeffs_exact():
    from dsc_tpu.models import savgol_coeffs

    for wl, po, d, dt in [(11, 3, 0, 1.0), (9, 4, 2, 0.5), (5, 2, 1, 2.0)]:
        got = savgol_coeffs(wl, po, deriv=d, delta=dt)
        ref = sps.savgol_coeffs(wl, po, deriv=d, delta=dt)
        assert np.abs(got - ref).max() < 1e-12


@pytest.mark.parametrize('wl,po,d', [(11, 3, 0), (21, 4, 0), (9, 4, 2),
                                     (5, 2, 1)])
def test_savgol_filter_matches_scipy(wl, po, d):
    from dsc_tpu.models import savgol_filter

    rng = np.random.default_rng(wl)
    x = (np.sin(np.linspace(0, 6, 500))
         + 0.1 * rng.standard_normal(500)).astype(np.float32)
    got = savgol_filter(dsc.from_numpy(x), wl, po, deriv=d,
                        delta=0.3).numpy()
    ref = sps.savgol_filter(x.astype(np.float64), wl, po, deriv=d,
                            delta=0.3)
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1e-9)


def test_savgol_filter_batched_and_errors():
    from dsc_tpu.models import savgol_filter

    xs = np.random.default_rng(5).standard_normal((3, 256)).astype(np.float32)
    got = savgol_filter(dsc.from_numpy(xs), 11, 3).numpy()
    ref = sps.savgol_filter(xs.astype(np.float64), 11, 3, axis=-1)
    assert np.abs(got - ref).max() < 1e-4
    x1 = dsc.from_numpy(xs[0])
    with pytest.raises(RuntimeError):
        savgol_filter(x1, 10, 3)  # even window
    with pytest.raises(RuntimeError):
        savgol_filter(x1, 11, 11)  # polyorder >= window
    with pytest.raises(RuntimeError):
        savgol_filter(x1, 257, 3)  # window > signal
    with pytest.raises(RuntimeError):
        savgol_filter(x1, 11, 3, mode='mirror')


def test_fft_convolve_batched():
    from dsc_tpu.models import fft_convolve

    sig = np.random.default_rng(6).standard_normal((3, 777)).astype(np.float32)
    taps = np.random.default_rng(7).standard_normal(64).astype(np.float32)
    for mode in ('full', 'same'):
        got = fft_convolve(dsc.from_numpy(sig), dsc.from_numpy(taps),
                           mode=mode).numpy()
        ref = np.stack([np.convolve(row, taps, mode) for row in sig])
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


def test_firwin_feeds_overlap_save():
    # the designed taps drive the block convolver end-to-end
    from dsc_tpu.models import overlap_save_convolve

    taps = firwin(33, 0.25)
    sig = _sig(2048, seed=7)
    got = overlap_save_convolve(dsc.from_numpy(sig), taps).numpy()
    ref = np.convolve(sig, taps.numpy())
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)
