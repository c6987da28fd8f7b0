"""scipy.signal.ShortTimeFFT parity (the class itself).

scipy is the executable spec: index/border arithmetic, f/t vectors,
every fft_mode, scaling, phase_shift, padding modes, detrending, the
canonical dual window, istft slicing (k0/k1) and the alternate
constructors are all compared directly against scipy's class.
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import ShortTimeFFT


def _sig(n=801, seed=3, cplx=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    if cplx:
        x = x + 1j * rng.standard_normal(n)
    return x.astype(np.complex64 if cplx else np.float32)


def _pair(win, hop, fs, **kw):
    return (sps.ShortTimeFFT(np.asarray(win, np.float64), hop, fs, **kw),
            ShortTimeFFT(np.asarray(win, np.float64), hop, fs, **kw))


def _close(ours, ref, tol=2e-4):
    got = ours.numpy() if hasattr(ours, 'numpy') else np.asarray(ours)
    ref = np.asarray(ref)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = max(1.0, float(np.max(np.abs(ref))))
    assert np.max(np.abs(got - ref)) < tol * scale


GEOM_CASES = [
    dict(m=64, hop=16),
    dict(m=63, hop=17),     # odd window, hop not dividing m
    dict(m=48, hop=48),     # non-overlapping
    dict(m=33, hop=5, mfft=64),
    dict(m=40, hop=8, mfft=50),   # non-pow2 mfft
]


@pytest.mark.parametrize('case', GEOM_CASES)
def test_index_and_border_properties(case):
    win = sps.windows.gaussian(case['m'], std=case['m'] / 6, sym=True)
    kw = {'mfft': case['mfft']} if 'mfft' in case else {}
    ref, ours = _pair(win, case['hop'], 8.0, **kw)
    n = 5 * case['m'] + 3
    assert ours.m_num == ref.m_num
    assert ours.m_num_mid == ref.m_num_mid
    assert ours.k_min == ref.k_min
    assert ours.p_min == ref.p_min
    assert ours.k_max(n) == ref.k_max(n)
    assert ours.p_max(n) == ref.p_max(n)
    assert ours.p_num(n) == ref.p_num(n)
    assert ours.lower_border_end == ref.lower_border_end
    assert ours.upper_border_begin(n) == ref.upper_border_begin(n)
    assert ours.delta_t == ref.delta_t
    assert ours.delta_f == ref.delta_f
    assert ours.f_pts == ref.f_pts
    assert ours.p_range(n) == ref.p_range(n)
    np.testing.assert_allclose(ours.f, ref.f)
    np.testing.assert_allclose(ours.t(n), ref.t(n))
    np.testing.assert_allclose(ours.t(n, k_offset=7), ref.t(n, k_offset=7))
    assert ours.nearest_k_p(37) == ref.nearest_k_p(37)
    assert ours.nearest_k_p(37, left=False) == ref.nearest_k_p(
        37, left=False)
    assert ours.extent(n) == ref.extent(n)
    assert ours.extent(n, 'ft', True) == ref.extent(n, 'ft', True)
    np.testing.assert_allclose(ours.dual_win, ref.dual_win, rtol=1e-12)
    assert ours.invertible == ref.invertible


def test_zero_padded_window_borders():
    # leading/trailing zeros exercise the zero-aware border scans
    win = np.zeros(50)
    win[10:40] = sps.windows.hann(30, sym=True)
    ref, ours = _pair(win, 8, 1.0)
    n = 200
    assert ours.k_min == ref.k_min
    assert ours.p_min == ref.p_min
    assert ours.k_max(n) == ref.k_max(n)
    assert ours.p_max(n) == ref.p_max(n)
    assert ours.lower_border_end == ref.lower_border_end
    assert ours.upper_border_begin(n) == ref.upper_border_begin(n)


# each case costs a multi-second XLA:CPU compile; the fast CI job keeps
# a covering subset (every fft_mode / scaling / phase_shift / mfft route
# once) and the full suite runs the whole list
_slow = pytest.mark.slow
STFT_CASES = [
    dict(),
    dict(fft_mode='twosided'),
    dict(fft_mode='centered'),
    dict(fft_mode='onesided2X', scale_to='psd'),
    pytest.param(dict(fft_mode='onesided2X', scale_to='magnitude'),
                 marks=_slow),
    pytest.param(dict(scale_to='psd'), marks=_slow),
    dict(phase_shift=None),
    pytest.param(dict(phase_shift=5), marks=_slow),
    pytest.param(dict(phase_shift=-3), marks=_slow),
    pytest.param(dict(mfft=128), marks=_slow),
    dict(mfft=100),              # non-pow2 -> CZT route
    pytest.param(dict(mfft=77, fft_mode='twosided'),   # odd non-pow2
                 marks=_slow),
]


@pytest.mark.parametrize('kw', STFT_CASES)
def test_stft_matches_scipy(kw):
    win = sps.windows.hann(64, sym=True)
    ref, ours = _pair(win, 16, 500.0, **kw)
    x = _sig(777)
    _close(ours.stft(x), ref.stft(x.astype(np.float64)))


@pytest.mark.parametrize('padding', [
    'zeros', pytest.param('edge', marks=_slow),
    pytest.param('even', marks=_slow), 'odd'])
def test_stft_padding_modes(padding):
    win = sps.windows.hamming(48, sym=True)
    ref, ours = _pair(win, 12, 1.0)
    x = _sig(301, seed=9)
    _close(ours.stft(x, padding=padding),
           ref.stft(x.astype(np.float64), padding=padding))


def test_stft_slice_range_and_k_offset():
    win = sps.windows.hann(32, sym=True)
    ref, ours = _pair(win, 8, 2.0)
    x = _sig(260, seed=5)
    _close(ours.stft(x, p0=2, p1=20, k_offset=16),
           ref.stft(x.astype(np.float64), p0=2, p1=20, k_offset=16))


def test_stft_detrend_modes():
    win = sps.windows.hann(64, sym=True)
    ref, ours = _pair(win, 32, 1.0)
    x = (_sig(600, seed=1) + np.linspace(0, 4, 600)).astype(np.float32)
    for detr in ('constant', 'linear'):
        _close(ours.stft_detrend(x, detr),
               ref.stft_detrend(x.astype(np.float64), detr))
    fn = lambda seg: seg - np.mean(seg, axis=-1, keepdims=True)  # noqa: E731
    _close(ours.stft_detrend(x, fn), ref.stft_detrend(
        x.astype(np.float64), fn))


def test_stft_complex_input_twosided():
    win = sps.windows.hann(32, sym=True)
    for mode in ('twosided', 'centered'):
        ref, ours = _pair(win, 8, 1.0, fft_mode=mode)
        x = _sig(300, seed=2, cplx=True)
        _close(ours.stft(x), ref.stft(x.astype(np.complex128)))
        with pytest.raises(ValueError):
            ShortTimeFFT(win, 8, 1.0).stft(x)


def test_stft_batched_and_axis():
    win = sps.windows.hann(32, sym=True)
    ref, ours = _pair(win, 16, 1.0)
    x = np.stack([_sig(300, seed=s) for s in range(3)])
    _close(ours.stft(x), ref.stft(x.astype(np.float64)))
    _close(ours.stft(x.T, axis=0), ref.stft(x.T.astype(np.float64),
                                            axis=0))


def test_spectrogram_and_cross():
    win = sps.windows.hann(64, sym=True)
    ref, ours = _pair(win, 16, 1.0)
    x, y = _sig(500, seed=4), _sig(500, seed=7)
    _close(ours.spectrogram(x), ref.spectrogram(x.astype(np.float64)))
    _close(ours.spectrogram(x, y),
           ref.spectrogram(x.astype(np.float64), y.astype(np.float64)))


ISTFT_CASES = [
    dict(),
    pytest.param(dict(fft_mode='twosided'), marks=_slow),
    dict(fft_mode='centered'),
    dict(fft_mode='onesided2X', scale_to='psd'),
    pytest.param(dict(phase_shift=None), marks=_slow),
    pytest.param(dict(phase_shift=4), marks=_slow),
    dict(mfft=80),               # non-pow2 inverse via CZT
    pytest.param(dict(mfft=81, fft_mode='twosided'), marks=_slow),
]


@pytest.mark.parametrize('kw', ISTFT_CASES)
def test_istft_roundtrip_matches_scipy(kw):
    win = sps.windows.hann(48, sym=True)
    ref, ours = _pair(win, 12, 1.0, **kw)
    x = _sig(400, seed=11)
    S_ref = ref.stft(x.astype(np.float64))
    S_ours = ours.stft(x)
    _close(ours.istft(S_ours), ref.istft(S_ref), tol=5e-4)
    # and the roundtrip itself reconstructs the signal
    got = ours.istft(S_ours, k1=len(x)).numpy()
    assert np.max(np.abs(got - x)) < 5e-4


def test_istft_k0_k1_slicing():
    win = sps.windows.hann(32, sym=True)
    ref, ours = _pair(win, 8, 1.0)
    x = _sig(300, seed=13)
    S_ref = ref.stft(x.astype(np.float64))
    S_ours = ours.stft(x)
    for k0, k1 in [(0, 300), (40, 200), (16, None), (0, None)]:
        _close(ours.istft(S_ours, k0=k0, k1=k1),
               ref.istft(S_ref, k0=k0, k1=k1), tol=5e-4)


def test_istft_batched_axes():
    win = sps.windows.hann(32, sym=True)
    ref, ours = _pair(win, 8, 1.0)
    x = np.stack([_sig(260, seed=s) for s in range(2)])
    S_ref = ref.stft(x.astype(np.float64))
    S_ours = ours.stft(x)
    _close(ours.istft(S_ours), ref.istft(S_ref), tol=5e-4)


def test_scaling_factors_and_scale_to():
    win = sps.windows.hann(64, sym=True)
    ref, ours = _pair(win, 16, 250.0)
    assert np.isclose(ours.fac_magnitude, ref.fac_magnitude)
    assert np.isclose(ours.fac_psd, ref.fac_psd)
    ref.scale_to('psd'), ours.scale_to('psd')
    assert ours.scaling == ref.scaling == 'psd'
    np.testing.assert_allclose(ours.win, ref.win)
    np.testing.assert_allclose(ours.dual_win, ref.dual_win)
    assert ours.fac_psd == ref.fac_psd == 1


def test_setters_and_validation():
    win = sps.windows.hann(32, sym=True)
    sft = ShortTimeFFT(win, 8, 4.0)
    assert sft.T == 0.25
    sft.T = 0.5
    assert sft.fs == 2.0
    sft.fs = 8.0
    assert sft.T == 0.125
    with pytest.raises(ValueError):
        sft.fs = -1
    with pytest.raises(ValueError):
        sft.T = 0
    with pytest.raises(ValueError):
        sft.mfft = 16        # < m_num
    with pytest.raises(ValueError):
        sft.fft_mode = 'bogus'
    with pytest.raises(ValueError):
        sft.fft_mode = 'onesided2X'   # scaling is None
    with pytest.raises(ValueError):
        sft.phase_shift = 99
    with pytest.raises(ValueError):
        sft.phase_shift = 1.5
    with pytest.raises(ValueError):
        ShortTimeFFT(win, 0, 1.0)
    with pytest.raises(ValueError):
        ShortTimeFFT(np.ones((4, 4)), 2, 1.0)
    with pytest.raises(ValueError):
        ShortTimeFFT(win * np.nan, 2, 1.0)
    with pytest.raises(ValueError):
        sft.stft(_sig(200), p0=-99, p1=1)


def test_non_invertible_window():
    win = np.zeros(32)
    win[:8] = 1.0      # hop 16 leaves uncovered samples
    ref, ours = _pair(win, 16, 1.0)
    assert ours.invertible == ref.invertible == False  # noqa: E712
    with pytest.raises(ValueError):
        _ = ours.dual_win


def test_from_window_and_from_dual():
    ref = sps.ShortTimeFFT.from_window('hann', 100.0, 64, 48)
    ours = ShortTimeFFT.from_window('hann', 100.0, 64, 48)
    np.testing.assert_allclose(ours.win, ref.win, rtol=1e-12)
    assert ours.hop == ref.hop
    ref = sps.ShortTimeFFT.from_window(('kaiser', 8.0), 1.0, 50, 25,
                                       symmetric_win=True)
    ours = ShortTimeFFT.from_window(('kaiser', 8.0), 1.0, 50, 25,
                                    symmetric_win=True)
    np.testing.assert_allclose(ours.win, ref.win, rtol=1e-9)

    dual = sps.windows.gaussian(51, std=8, sym=True)
    ref = sps.ShortTimeFFT.from_dual(dual, 10, 1.0)
    ours = ShortTimeFFT.from_dual(dual, 10, 1.0)
    np.testing.assert_allclose(ours.win, ref.win, rtol=1e-12)
    np.testing.assert_allclose(ours.dual_win, ref.dual_win, rtol=1e-12)


def test_from_win_equals_dual():
    desired = sps.windows.hann(48, sym=True) + 0.1
    for scale in (None, 'magnitude', 'psd', 'unitary'):
        ref = sps.ShortTimeFFT.from_win_equals_dual(
            desired, 12, 1.0, scale_to=scale)
        ours = ShortTimeFFT.from_win_equals_dual(
            desired, 12, 1.0, scale_to=scale)
        np.testing.assert_allclose(ours.win, ref.win, rtol=1e-12)
        np.testing.assert_allclose(ours.dual_win, ref.dual_win,
                                   rtol=1e-12)
        assert ours.scaling == ref.scaling
    x = _sig(300, seed=21)
    ref_S = ref.stft(x.astype(np.float64))
    _close(ours.stft(x), ref_S)


def test_complex_window_twosided():
    win = sps.windows.hann(32, sym=True) * np.exp(
        1j * np.linspace(0, np.pi, 32))
    ref = sps.ShortTimeFFT(win, 8, 1.0, fft_mode='twosided')
    ours = ShortTimeFFT(win, 8, 1.0, fft_mode='twosided')
    with pytest.raises(ValueError):
        ShortTimeFFT(win, 8, 1.0, fft_mode='onesided')
    x = _sig(200, seed=17)
    _close(ours.stft(x), ref.stft(x.astype(np.float64)))
    S_ref = ref.stft(x.astype(np.float64))
    _close(ours.istft(ours.stft(x)), ref.istft(S_ref), tol=5e-4)
