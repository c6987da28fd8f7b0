"""IIR filtering (lfilter/sosfilt via associative scan) and Butterworth
design vs scipy.signal.

Design parity is pinned on BEHAVIOR (transfer function), which is
invariant to section-pairing choices; filter parity against scipy's f64
sequential implementation at f32 tolerances.
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    butter,
    cheby1,
    cheby2,
    decimate,
    freqz,
    lfilter,
    sos2tf,
    sosfilt,
    sosfiltfilt,
    sosfreqz,
    tf2sos,
)


def _resp(sos, w):
    z = np.exp(-1j * w)
    h = np.ones_like(z, dtype=complex)
    for b0, b1, b2, a0, a1, a2 in np.atleast_2d(sos):
        h *= (b0 + b1 * z + b2 * z**2) / (a0 + a1 * z + a2 * z**2)
    return h


def _sig(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


# --------------------------------------------------------------- butter

@pytest.mark.parametrize(
    'order,wn,btype',
    [
        (4, 0.3, 'low'), (5, 0.3, 'low'), (1, 0.5, 'low'), (8, 0.6, 'low'),
        (4, 0.2, 'high'), (5, 0.35, 'high'), (1, 0.5, 'high'),
        (3, [0.2, 0.5], 'bandpass'), (2, [0.05, 0.9], 'bandpass'),
        (4, [0.25, 0.45], 'bandstop'), (3, [0.3, 0.6], 'bandstop'),
    ],
)
def test_butter_transfer_function_matches_scipy(order, wn, btype):
    w = np.linspace(1e-3, np.pi - 1e-3, 513)
    got = _resp(butter(order, wn, btype), w)
    ref = _resp(sps.butter(order, wn, btype, output='sos'), w)
    assert np.abs(got - ref).max() < 1e-10


def test_butter_fs_units():
    w = np.linspace(1e-3, np.pi - 1e-3, 257)
    got = _resp(butter(4, 100.0, 'low', fs=1000.0), w)
    ref = _resp(sps.butter(4, 100.0, 'low', fs=1000.0, output='sos'), w)
    assert np.abs(got - ref).max() < 1e-10


def test_butter_rejects_bad_args():
    with pytest.raises(RuntimeError):
        butter(0, 0.5)
    with pytest.raises(RuntimeError):
        butter(4, 1.5)
    with pytest.raises(RuntimeError):
        butter(4, 0.5, 'nope')
    with pytest.raises(RuntimeError):
        butter(4, [0.2, 0.5], 'low')
    with pytest.raises(RuntimeError):
        butter(4, 0.5, 'bandpass')


@pytest.mark.parametrize(
    'order,rp,wn,btype',
    [
        (4, 1.0, 0.3, 'low'), (5, 0.5, 0.4, 'low'), (5, 1.0, 0.3, 'high'),
        (3, 0.05, [0.2, 0.5], 'bandpass'), (2, 2.0, [0.3, 0.6], 'bandstop'),
    ],
)
def test_cheby1_transfer_function_matches_scipy(order, rp, wn, btype):
    w = np.linspace(1e-3, np.pi - 1e-3, 257)
    got = _resp(cheby1(order, rp, wn, btype), w)
    ref = _resp(sps.cheby1(order, rp, wn, btype, output='sos'), w)
    assert np.abs(got - ref).max() < 1e-10


@pytest.mark.parametrize(
    'order,rs,wn,btype',
    [
        (4, 40.0, 0.3, 'low'), (5, 30.0, 0.4, 'low'),
        (4, 40.0, 0.3, 'high'), (2, 25.0, [0.3, 0.7], 'bandpass'),
        (3, 35.0, [0.25, 0.6], 'bandstop'),
    ],
)
def test_cheby2_transfer_function_matches_scipy(order, rs, wn, btype):
    w = np.linspace(1e-3, np.pi - 1e-3, 257)
    got = _resp(cheby2(order, rs, wn, btype), w)
    ref = _resp(sps.cheby2(order, rs, wn, btype, output='sos'), w)
    assert np.abs(got - ref).max() < 1e-10


def test_cheby_rejects_bad_ripple():
    with pytest.raises(RuntimeError):
        cheby1(4, 0.0, 0.3)
    with pytest.raises(RuntimeError):
        cheby2(4, -3.0, 0.3)


def test_decimate_matches_scipy():
    x = _sig(4096, seed=11)
    for q in (2, 4):
        got = decimate(dsc.from_numpy(x), q).numpy()
        ref = sps.decimate(x.astype(np.float64), q)
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()


def test_decimate_batched_and_identity():
    xs = np.stack([_sig(2048, seed=s) for s in range(2)])
    got = decimate(dsc.from_numpy(xs), 2).numpy()
    ref = sps.decimate(xs.astype(np.float64), 2, axis=-1)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()
    x1 = dsc.from_numpy(xs[0])
    assert decimate(x1, 1) is x1


# -------------------------------------------------------------- sosfilt

@pytest.mark.parametrize('method', ['parallel', 'sequential'])
def test_sosfilt_matches_scipy(method):
    x = _sig(4096)
    sos = butter(4, 0.25, 'low')
    got = sosfilt(sos, dsc.from_numpy(x), method=method).numpy()
    ref = sps.sosfilt(sos, x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


def test_sosfilt_parallel_equals_sequential():
    x = _sig(2048, seed=1)
    sos = butter(6, [0.2, 0.6], 'bandpass')
    yp = sosfilt(sos, dsc.from_numpy(x), method='parallel').numpy()
    ys = sosfilt(sos, dsc.from_numpy(x), method='sequential').numpy()
    assert np.abs(yp - ys).max() < 1e-4 * max(np.abs(ys).max(), 1e-6)


def test_sosfilt_batched_matches_rowwise():
    xs = np.stack([_sig(1024, seed=s) for s in range(3)])
    sos = butter(3, 0.4, 'high')
    got = sosfilt(sos, dsc.from_numpy(xs)).numpy()
    for i in range(3):
        ref = sps.sosfilt(sos, xs[i].astype(np.float64))
        assert np.abs(got[i] - ref).max() < 1e-4 * np.abs(ref).max()


def test_sosfilt_streaming_state():
    # filtering in two halves with carried zi == one-shot
    x = _sig(2048, seed=2)
    sos = butter(4, 0.3, 'low')
    y1, zf = sosfilt(sos, dsc.from_numpy(x[:1024]),
                     zi=np.zeros((sos.shape[0], 2)))
    y2, _ = sosfilt(sos, dsc.from_numpy(x[1024:]), zi=zf.numpy())
    ycat = np.concatenate([y1.numpy(), y2.numpy()])
    yone = sosfilt(sos, dsc.from_numpy(x)).numpy()
    assert np.abs(ycat - yone).max() < 1e-5


def test_sosfilt_zi_matches_scipy():
    x = _sig(1024, seed=3)
    sos = butter(2, 0.2, 'low')
    zi = np.random.default_rng(4).standard_normal((sos.shape[0], 2))
    got, gzf = sosfilt(sos, dsc.from_numpy(x), zi=zi.astype(np.float32))
    ref, rzf = sps.sosfilt(sos, x.astype(np.float64), zi=zi)
    assert np.abs(got.numpy() - ref).max() < 1e-4 * np.abs(ref).max()
    assert np.abs(gzf.numpy() - rzf).max() < 1e-3 * max(np.abs(rzf).max(), 1.0)


def test_sosfilt_rejects_bad_args():
    x = dsc.from_numpy(_sig(128))
    with pytest.raises(RuntimeError):
        sosfilt(np.zeros((2, 5)), x)  # not 6 columns
    bad = np.array([[1.0, 0, 0, 0.0, 0, 0]])  # a0 == 0
    with pytest.raises(RuntimeError):
        sosfilt(bad, x)
    with pytest.raises(RuntimeError):
        sosfilt(butter(2, 0.5), x, method='nope')


# -------------------------------------------------------------- lfilter

@pytest.mark.parametrize('method', ['parallel', 'sequential'])
def test_lfilter_matches_scipy(method):
    x = _sig(4096, seed=5)
    b, a = sps.butter(3, 0.3)
    got = lfilter(b, a, dsc.from_numpy(x), method=method).numpy()
    ref = sps.lfilter(b, a, x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


def test_lfilter_fir_taps():
    # pure-FIR denominator (a = [1]) also runs
    x = _sig(512, seed=6)
    b = sps.firwin(9, 0.4)
    got = lfilter(b, [1.0], dsc.from_numpy(x)).numpy()
    ref = sps.lfilter(b, [1.0], x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-5 * max(np.abs(ref).max(), 1.0)


def test_lfilter_higher_order_state():
    # m = 5 exercises the generic companion matrix, not just biquads
    x = _sig(1024, seed=7)
    b, a = sps.butter(5, 0.25)
    got = lfilter(b, a, dsc.from_numpy(x)).numpy()
    ref = sps.lfilter(b, a, x.astype(np.float64))
    assert np.abs(got - ref).max() < 2e-4 * np.abs(ref).max()


def test_lfilter_zi_streaming():
    x = _sig(1024, seed=8)
    b, a = sps.butter(2, 0.35)
    y1, zf = lfilter(b, a, dsc.from_numpy(x[:512]), zi=np.zeros(2))
    y2, _ = lfilter(b, a, dsc.from_numpy(x[512:]), zi=zf.numpy())
    yone = lfilter(b, a, dsc.from_numpy(x)).numpy()
    assert np.abs(np.concatenate([y1.numpy(), y2.numpy()]) - yone).max() < 1e-5


def test_zi_helpers_match_scipy():
    from dsc_tpu.models import lfilter_zi, sosfilt_zi

    b, a = sps.butter(4, 0.3)
    assert np.abs(lfilter_zi(b, a) - sps.lfilter_zi(b, a)).max() < 1e-12
    sos = sps.butter(5, 0.25, output='sos')
    assert np.abs(sosfilt_zi(sos) - sps.sosfilt_zi(sos)).max() < 1e-12
    # steady start: a constant input passes through with no transient
    x = np.ones(64, np.float32)
    y, _ = sosfilt(sos, dsc.from_numpy(x),
                   zi=sosfilt_zi(sos).astype(np.float32))
    assert np.abs(y.numpy() - 1.0).max() < 1e-5  # DC gain 1 lowpass


@pytest.mark.parametrize('up,down', [(1, 1), (3, 1), (1, 4), (3, 2), (7, 5)])
def test_upfirdn_matches_scipy(up, down):
    from dsc_tpu.models import upfirdn

    rng = np.random.default_rng(up * 10 + down)
    x = rng.standard_normal(777).astype(np.float32)
    h = rng.standard_normal(31).astype(np.float32)
    got = upfirdn(h, dsc.from_numpy(x), up, down).numpy()
    ref = sps.upfirdn(h.astype(np.float64), x.astype(np.float64), up, down)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


def test_upfirdn_batched():
    from dsc_tpu.models import upfirdn

    rng = np.random.default_rng(50)
    xs = rng.standard_normal((2, 300)).astype(np.float32)
    h = rng.standard_normal(9).astype(np.float32)
    got = upfirdn(h, dsc.from_numpy(xs), 2, 3).numpy()
    ref = sps.upfirdn(h.astype(np.float64), xs.astype(np.float64), 2, 3,
                      axis=-1)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


# ------------------------------------------- tf2sos / sos2tf / filtfilt

def test_tf2sos_roundtrip_preserves_response():
    w = np.linspace(1e-3, np.pi - 1e-3, 101)
    z = np.exp(-1j * w)
    for b, a in [sps.butter(5, 0.3), sps.cheby1(4, 1.0, 0.4),
                 (sps.firwin(7, 0.3), [1.0])]:
        b2, a2 = sos2tf(tf2sos(b, a))
        h1 = (np.polyval(np.atleast_1d(b)[::-1], z)
              / np.polyval(np.atleast_1d(a)[::-1], z))
        h2 = np.polyval(b2[::-1], z) / np.polyval(a2[::-1], z)
        assert np.abs(h1 - h2).max() < 1e-10


def test_tf2sos_leading_zero_matches_scipy_behavior():
    # scipy strips leading numerator zeros (dropping the pure delay);
    # we pin the SAME behavior, not the original transfer function
    import warnings

    b, a = [0.0, 0.5, 0.25], [1.0, -0.3]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        ref_b, ref_a = sps.sos2tf(sps.tf2sos(b, a))
    got_b, got_a = sos2tf(tf2sos(b, a))
    w = np.linspace(1e-3, np.pi - 1e-3, 33)
    z = np.exp(-1j * w)
    h_ref = np.polyval(ref_b[::-1], z) / np.polyval(ref_a[::-1], z)
    h_got = np.polyval(got_b[::-1], z) / np.polyval(got_a[::-1], z)
    assert np.abs(h_got - h_ref).max() < 1e-12


def test_filtfilt_ba_matches_scipy():
    from dsc_tpu.models import filtfilt

    x = _sig(2048, seed=21)
    b, a = sps.butter(4, 0.3)
    got = filtfilt(b, a, dsc.from_numpy(x)).numpy()
    ref = sps.filtfilt(b, a, x.astype(np.float64))
    assert np.abs(got - ref).max() < 2e-4 * np.abs(ref).max()


def test_filtfilt_fir_taps():
    from dsc_tpu.models import filtfilt

    x = _sig(1024, seed=22)
    taps = sps.firwin(21, 0.4)
    got = filtfilt(taps, [1.0], dsc.from_numpy(x)).numpy()
    ref = sps.filtfilt(taps, [1.0], x.astype(np.float64))
    assert np.abs(got - ref).max() < 2e-4 * max(np.abs(ref).max(), 1e-6)


# ----------------------------------------------------------------- fuzz

def test_fuzz_random_stable_sos_vs_scipy():
    # random stable biquad cascades (poles at radius <= 0.9, zeros in the
    # unit disk): the associative-scan filter must track scipy's f64
    # sequential implementation at f32 tolerances
    rng = np.random.default_rng(7)
    x = _sig(2048, seed=7)
    for trial in range(10):
        ns = int(rng.integers(1, 4))
        rows = []
        for _ in range(ns):
            rp_, thp = rng.uniform(0.1, 0.9), rng.uniform(0, np.pi)
            rz_, thz = rng.uniform(0.0, 1.0), rng.uniform(0, np.pi)
            rows.append([
                1.0, -2 * rz_ * np.cos(thz), rz_ * rz_,
                1.0, -2 * rp_ * np.cos(thp), rp_ * rp_,
            ])
        sos = np.asarray(rows)
        got = sosfilt(sos, dsc.from_numpy(x)).numpy()
        ref = sps.sosfilt(sos, x.astype(np.float64))
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(got - ref).max() < 1e-3 * scale, trial


def test_fuzz_random_butter_designs_roundtrip():
    # random designs: transfer function equals scipy's, and the device
    # filter output matches scipy's sosfilt on the same design
    rng = np.random.default_rng(11)
    w = np.linspace(1e-3, np.pi - 1e-3, 129)
    x = _sig(1024, seed=11)
    for trial in range(8):
        order = int(rng.integers(1, 9))
        btype = rng.choice(['low', 'high', 'bandpass', 'bandstop'])
        if btype in ('low', 'high'):
            wn = float(rng.uniform(0.05, 0.95))
        else:
            lohi = np.sort(rng.uniform(0.05, 0.95, 2))
            while lohi[1] - lohi[0] < 0.05:
                lohi = np.sort(rng.uniform(0.05, 0.95, 2))
            wn = lohi.tolist()
        sos = butter(order, wn, btype)
        ref_sos = sps.butter(order, wn, btype, output='sos')
        assert np.abs(_resp(sos, w) - _resp(ref_sos, w)).max() < 1e-9, trial
        got = sosfilt(sos, dsc.from_numpy(x)).numpy()
        ref = sps.sosfilt(sos, x.astype(np.float64))
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(got - ref).max() < 2e-3 * scale, (trial, order, btype)


# -------------------------------------------- compile / mesh composition

def test_iir_psd_compose_under_compile():
    # design -> filter -> PSD as ONE traced program
    from dsc_tpu.models import welch

    x = np.random.default_rng(12).standard_normal((4, 4096)).astype(np.float32)
    sos = butter(4, 0.3)

    @dsc.compile
    def pipe(s):
        y = sosfilt(sos, s)
        _, p = welch(y, nperseg=256)
        return p

    got = pipe(dsc.from_numpy(x)).numpy()
    ref = sps.welch(sps.sosfilt(sos, x.astype(np.float64), axis=-1),
                    nperseg=256, axis=-1)[1]
    assert np.abs(got - ref).max() < 2e-4 * ref.max()
    assert pipe.n_programs == 1


def test_compile_mesh_shards_batched_sosfilt():
    # the associative-scan IIR partitions over the batch axis unchanged
    import jax
    from jax.sharding import PartitionSpec as P

    xs = np.random.default_rng(13).standard_normal((8, 1024)).astype(np.float32)
    sos = butter(3, 0.25)

    def pipe(v):
        return sosfilt(sos, v)

    mesh = dsc.make_mesh((len(jax.devices()), 1))
    f = dsc.compile(pipe, mesh=mesh, in_specs=(P('data'),))
    got = f(dsc.from_numpy(xs)).numpy()
    ref = sps.sosfilt(sos, xs.astype(np.float64), axis=-1)
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


# ---------------------------------------------------- sosfiltfilt / freqz

def test_sosfiltfilt_matches_scipy():
    x = _sig(2048, seed=10)
    sos = butter(4, 0.3, 'low')
    got = sosfiltfilt(sos, dsc.from_numpy(x)).numpy()
    ref = sps.sosfiltfilt(sos, x.astype(np.float64))
    assert np.abs(got - ref).max() < 2e-4 * np.abs(ref).max()


def test_sosfiltfilt_batched_and_padlen():
    xs = np.stack([_sig(1024, seed=s) for s in range(2)])
    sos = butter(3, [0.2, 0.5], 'bandpass')
    got = sosfiltfilt(sos, dsc.from_numpy(xs), padlen=100).numpy()
    ref = sps.sosfiltfilt(sos, xs.astype(np.float64), padlen=100, axis=-1)
    assert np.abs(got - ref).max() < 5e-4 * np.abs(ref).max()


def test_sosfiltfilt_zero_phase():
    # a passband tone comes back UNSHIFTED (the whole point)
    t = np.arange(4096)
    lo = np.sin(0.05 * np.pi * t).astype(np.float32)
    sos = butter(6, 0.25, 'low')
    y = sosfiltfilt(sos, dsc.from_numpy(lo)).numpy()
    assert np.abs(y[512:-512] - lo[512:-512]).max() < 5e-3


def test_sosfiltfilt_rejects_short_signal():
    sos = butter(4, 0.3)
    with pytest.raises(RuntimeError):
        sosfiltfilt(sos, dsc.from_numpy(_sig(8)))


def test_sosfreqz_matches_scipy():
    sos = butter(5, [0.2, 0.6], 'bandpass')
    w, h = sosfreqz(sos, worN=256)
    w_ref, h_ref = sps.sosfreqz(sos, worN=256)
    assert np.allclose(w, w_ref)
    assert np.abs(h - h_ref).max() < 1e-12


def test_group_delay_matches_scipy():
    from dsc_tpu.models import group_delay

    b, a = sps.butter(4, 0.3)
    w1, g1 = group_delay((b, a), worN=64)
    w2, g2 = sps.group_delay((b, a), w=64)
    assert np.allclose(w1, w2) and np.abs(g1 - g2).max() < 1e-10
    taps = sps.firwin(31, 0.4)  # linear phase: constant delay (N-1)/2
    _, gf = group_delay((taps, [1.0]), worN=32)
    assert np.abs(gf - 15.0).max() < 1e-8


def test_kaiserord_family_matches_scipy():
    from dsc_tpu.models import kaiser_atten, kaiser_beta, kaiserord

    for r, w in [(60.0, 0.1), (30.0, 0.05), (80.0, 0.02), (15.0, 0.2)]:
        assert kaiserord(r, w) == sps.kaiserord(r, w)
    for a in (10.0, 21.5, 60.0):
        assert abs(kaiser_beta(a) - sps.kaiser_beta(a)) < 1e-12
    assert abs(kaiser_atten(101, 0.1) - sps.kaiser_atten(101, 0.1)) < 1e-12
    with pytest.raises(RuntimeError):
        kaiserord(5.0, 0.1)


def test_kaiserord_drives_firwin_design():
    # the classic flow: spec -> kaiserord -> firwin(kaiser) -> filter
    from dsc_tpu.models import firwin, kaiserord

    numtaps, beta = kaiserord(60.0, 0.1)
    numtaps += 1 - numtaps % 2  # odd for a type-I lowpass
    got = firwin(numtaps, 0.35, window=('kaiser', beta)).numpy()
    ref = sps.firwin(numtaps, 0.35, window=('kaiser', beta))
    assert np.abs(got - ref).max() < 1e-5


def test_freqz_matches_scipy():
    b, a = sps.butter(4, 0.35)
    w, h = freqz(b, a, worN=128, fs=48000.0)
    w_ref, h_ref = sps.freqz(b, a, worN=128, fs=48000.0)
    assert np.allclose(w, w_ref)
    assert np.abs(h - h_ref).max() < 1e-12


def test_designed_filter_attenuates_stopband():
    # end-to-end sanity in the spectrum (the passband tone is phase-
    # delayed, so pointwise comparison is wrong even for scipy): the
    # 0.8*Nyquist tone through a 0.25 lowpass loses >60 dB, the 0.05
    # tone keeps its magnitude
    n = 4096
    t = np.arange(n)
    lo = np.sin(0.05 * np.pi * t).astype(np.float32)
    hi = np.sin(0.80 * np.pi * t).astype(np.float32)
    sos = butter(6, 0.25, 'low')

    def steady_rms(sig):
        y = sosfilt(sos, dsc.from_numpy(sig)).numpy()[512:]
        return float(np.sqrt(np.mean(y * y)))

    rms_in = float(np.sqrt(np.mean(lo[512:] ** 2)))
    assert abs(steady_rms(lo) - rms_in) < 0.01 * rms_in  # passband intact
    assert steady_rms(hi) < 1e-3 * rms_in  # stopband > 60 dB down


def test_filtfilt_padtypes_match_scipy():
    import scipy.signal as sps

    from dsc_tpu.models import butter, filtfilt, sosfiltfilt

    x = (np.cumsum(np.random.default_rng(0).standard_normal(256))
         * 0.3).astype(np.float32)
    sos = butter(4, 0.1)
    outs = {}
    for pt in ('odd', 'even', 'constant', None):
        got = sosfiltfilt(sos, dsc.from_numpy(x), padtype=pt).numpy()
        ref = sps.sosfiltfilt(sos, x.astype(np.float64), padtype=pt)
        assert np.abs(got - ref).max() < 2e-5 * max(np.abs(ref).max(), 1.0)
        outs[pt] = got
    # padtypes genuinely differ at the edges of a trending signal
    assert np.abs(outs['odd'] - outs['even']).max() > 1e-3
    b, a = butter(4, 0.1, output='ba')
    got = filtfilt(b, a, dsc.from_numpy(x), padtype='even').numpy()
    ref = sps.filtfilt(b, a, x.astype(np.float64), padtype='even')
    assert np.abs(got - ref).max() < 2e-5 * max(np.abs(ref).max(), 1.0)
    with pytest.raises(RuntimeError):
        sosfiltfilt(sos, dsc.from_numpy(x), padtype='bogus')


def test_decimate_fir_and_array_window():
    import scipy.signal as sps

    from dsc_tpu.models import decimate, resample_poly

    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    for q in (2, 4, 5):
        for zp in (True, False):
            got = decimate(dsc.from_numpy(x), q, ftype='fir',
                           zero_phase=zp).numpy()
            ref = sps.decimate(x.astype(np.float64), q, ftype='fir',
                               zero_phase=zp)
            assert got.shape == ref.shape, (q, zp)
            assert np.abs(got - ref).max() < 2e-6 * np.abs(ref).max()
    h = sps.firwin(31, 0.4)
    got = resample_poly(dsc.from_numpy(x), 2, 3, window=h).numpy()
    ref = sps.resample_poly(x.astype(np.float64), 2, 3, window=h)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-6 * np.abs(ref).max()
    with pytest.raises(RuntimeError):
        decimate(dsc.from_numpy(x), 2, ftype='bogus')
