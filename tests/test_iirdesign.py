"""Elliptic/Bessel design, order selection and notch/peak/comb vs scipy.

scipy.signal is the executable specification (reference README.md:173-180
testing philosophy). The Jacobi elliptic machinery (Landen transforms,
AGM elliptic integral) is from scratch — scipy only ever appears here,
as the oracle.
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    bessel,
    buttord,
    cheb1ord,
    cheb2ord,
    ellip,
    ellipord,
    iircomb,
    iirfilter,
    iirnotch,
    iirpeak,
    sosfilt,
    sosfreqz,
)


def _sos_response(sos, w):
    z = np.exp(1j * w)
    h = np.ones_like(z, complex)
    for s in np.atleast_2d(sos):
        h *= (s[0] + s[1] / z + s[2] / z ** 2) / \
             (s[3] + s[4] / z + s[5] / z ** 2)
    return h


W = np.linspace(1e-3, np.pi - 1e-3, 2048)


# ------------------------------------------------------------------ ellip

@pytest.mark.parametrize('n,btype,wn', [
    (1, 'low', 0.3), (2, 'low', 0.2), (4, 'low', 0.3), (7, 'low', 0.55),
    (5, 'high', 0.4), (4, 'bandpass', [0.2, 0.5]),
    (3, 'bandstop', [0.3, 0.6]),
])
def test_ellip_matches_scipy(n, btype, wn):
    sos = ellip(n, 0.5, 50.0, wn, btype=btype)
    ref = sps.ellip(n, 0.5, 50.0, wn, btype=btype, output='sos')
    h = np.abs(_sos_response(sos, W))
    hr = np.abs(_sos_response(ref, W))
    assert np.abs(h - hr).max() < 1e-9


def test_ellip_equiripple_properties():
    # passband ripple exactly rp dB, stopband floor exactly rs dB down
    sos = ellip(6, 1.0, 60.0, 0.4)
    h = np.abs(_sos_response(sos, W))
    pb = h[W <= 0.4 * np.pi * 0.999]
    assert pb.min() > 10 ** (-1.05 / 20)
    assert pb.max() < 1.0 + 1e-6
    # the N=6/rp=1/rs=60 transition ends at ~0.4926*pi; the floor beyond
    # is equiripple at exactly -60 dB
    sb = h[W >= 0.494 * np.pi]
    assert sb.max() < 10 ** (-59.0 / 20)
    assert sb.max() > 10 ** (-61.0 / 20)


def test_ellip_fs_units_and_errors():
    sos = ellip(4, 0.5, 40.0, 100.0, fs=1000.0)
    ref = sps.ellip(4, 0.5, 40.0, 100.0, fs=1000.0, output='sos')
    h = np.abs(_sos_response(sos, W))
    assert np.abs(h - np.abs(_sos_response(ref, W))).max() < 1e-9
    with pytest.raises(RuntimeError):
        ellip(4, 0.0, 40.0, 0.3)
    with pytest.raises(RuntimeError):
        ellip(4, 2.0, 1.0, 0.3)  # rs <= rp


# ----------------------------------------------------------------- bessel

@pytest.mark.parametrize('n', [1, 2, 3, 5, 8, 12])
def test_bessel_matches_scipy(n):
    sos = bessel(n, 0.3)
    ref = sps.bessel(n, 0.3, output='sos')
    h = np.abs(_sos_response(sos, W))
    assert np.abs(h - np.abs(_sos_response(ref, W))).max() < 1e-9


def test_bessel_band_and_errors():
    sos = bessel(4, [0.2, 0.5], btype='bandpass')
    ref = sps.bessel(4, [0.2, 0.5], btype='bandpass', output='sos')
    h = np.abs(_sos_response(sos, W))
    assert np.abs(h - np.abs(_sos_response(ref, W))).max() < 1e-9
    with pytest.raises(RuntimeError):
        bessel(30, 0.3)  # above the f64-accuracy order cap


# -------------------------------------------------------------- iirfilter

def test_iirfilter_dispatch():
    for ft, kw in [('butter', {}), ('cheby1', {'rp': 1.0}),
                   ('cheby2', {'rs': 40.0}),
                   ('ellip', {'rp': 1.0, 'rs': 40.0}), ('bessel', {})]:
        sos = iirfilter(4, 0.3, btype='low', ftype=ft, **kw)
        ref = sps.iirfilter(4, 0.3, btype='low', ftype=ft, output='sos',
                            **kw)
        h = np.abs(_sos_response(sos, W))
        assert np.abs(h - np.abs(_sos_response(ref, W))).max() < 1e-9, ft
    with pytest.raises(RuntimeError):
        iirfilter(4, 0.3, ftype='nope')
    with pytest.raises(RuntimeError):
        iirfilter(4, 0.3, ftype='ellip')  # missing rp/rs


# --------------------------------------------------------- order selection

ORD_CASES = [(0.2, 0.3), (0.4, 0.25), ([0.2, 0.5], [0.1, 0.6]),
             ([0.1, 0.6], [0.2, 0.5]), (0.11, 0.13),
             ([0.3, 0.4], [0.25, 0.5])]


@pytest.mark.parametrize('wp,ws', ORD_CASES, ids=str)
def test_order_selection_matches_scipy(wp, ws):
    for mine, ref in [(buttord, sps.buttord), (cheb1ord, sps.cheb1ord),
                      (cheb2ord, sps.cheb2ord), (ellipord, sps.ellipord)]:
        n1, wn1 = mine(wp, ws, 3, 40)
        n2, wn2 = ref(wp, ws, 3, 40)
        assert n1 == n2, (mine.__name__, wp, ws)
        # bandstop edges come from a bounded scalar optimization on both
        # sides; agree to the optimizer tolerance
        assert np.abs(np.atleast_1d(wn1)
                      - np.atleast_1d(wn2)).max() < 2e-4, mine.__name__


def test_order_selection_fs_units():
    n1, wn1 = buttord(200, 300, 3, 40, fs=2000)
    n2, wn2 = sps.buttord(200, 300, 3, 40, fs=2000)
    assert n1 == n2 and abs(wn1 - wn2) < 1e-9


def test_spec_to_filter_end_to_end():
    # spec -> ellipord -> ellip meets the spec (classic design loop)
    n, wn = ellipord(0.2, 0.3, 1.0, 50.0)
    sos = ellip(n, 1.0, 50.0, wn)
    h = np.abs(_sos_response(sos, W))
    assert h[W <= 0.2 * np.pi].min() > 10 ** (-1.01 / 20)
    assert h[W >= 0.3 * np.pi].max() < 10 ** (-49.9 / 20)


# ---------------------------------------------------- notch / peak / comb

def test_notch_peak_comb_match_scipy():
    b, a = iirnotch(0.3, 30.0)
    br, ar = sps.iirnotch(0.3, 30.0)
    assert np.abs(b - br).max() < 1e-14 and np.abs(a - ar).max() < 1e-14
    b, a = iirpeak(60.0, 25.0, fs=1000.0)
    br, ar = sps.iirpeak(60.0, 25.0, fs=1000.0)
    assert np.abs(b - br).max() < 1e-14 and np.abs(a - ar).max() < 1e-14
    for ft in ('notch', 'peak'):
        for pz in (False, True):
            b, a = iircomb(100.0, 30.0, ftype=ft, fs=1000.0, pass_zero=pz)
            br, ar = sps.iircomb(100.0, 30.0, ftype=ft, fs=1000.0,
                                 pass_zero=pz)
            assert np.abs(b - br).max() < 1e-14, (ft, pz)
            assert np.abs(a - ar).max() < 1e-14, (ft, pz)
    with pytest.raises(RuntimeError):
        iircomb(101.0, 30.0, fs=1000.0)  # fs not divisible by w0


# -------------------------------------------------- device integration

def test_ellip_filters_on_device():
    # design host-side, filter on device, check against scipy end-to-end
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    sos = ellip(5, 0.5, 45.0, 0.25)
    y = sosfilt(sos, dsc.from_numpy(x))
    yr = sps.sosfilt(sos, x.astype(np.float64))
    assert np.abs(y.numpy() - yr).max() < 2e-4 * np.abs(yr).max()
    # sosfreqz agrees with the direct evaluation
    wq, h = sosfreqz(sos, worN=512)
    href = _sos_response(sos, np.asarray(wq, np.float64))
    assert np.abs(np.asarray(h) - href).max() < 1e-5


@pytest.mark.parametrize('output', ['ba', 'zpk'])
def test_output_forms_match_scipy(output):
    from dsc_tpu.models import bessel, butter, iirdesign

    for mine, ref, args in [
        (butter, sps.butter, (4, 0.3)),
        (ellip, sps.ellip, (4, 1.0, 40.0, 0.3)),
        (bessel, sps.bessel, (4, 0.3)),
    ]:
        got = mine(*args, output=output)
        want = ref(*args, output=output)
        if output == 'ba':
            assert np.allclose(got[0], want[0], atol=1e-12)
            assert np.allclose(got[1], want[1], atol=1e-12)
        else:
            assert np.allclose(np.sort_complex(got[0]),
                               np.sort_complex(want[0]), atol=1e-10)
            assert np.allclose(np.sort_complex(got[1]),
                               np.sort_complex(want[1]), atol=1e-10)
            assert abs(got[2] - want[2]) < 1e-10
    got = iirdesign(0.2, 0.3, 1.0, 40.0, output=output)
    want = sps.iirdesign(0.2, 0.3, 1.0, 40.0, output=output)
    if output == 'ba':
        assert np.allclose(got[0], want[0], atol=1e-10)
    with pytest.raises(RuntimeError):
        butter(4, 0.3, output='bogus')


def test_band_stop_obj_public():
    from dsc_tpu.models import band_stop_obj

    passb = np.array([0.3, 2.0])
    stopb = np.array([0.5, 1.2])
    for typ, wp, ind, gp, gs in [('butter', 0.3, 0, 1.0, 40.0),
                                 ('cheby', 1.8, 1, 2.0, 30.0),
                                 ('ellip', 0.28, 0, 1.0, 40.0)]:
        got = band_stop_obj(wp, ind, passb, stopb, gp, gs, typ)
        exp = sps.band_stop_obj(wp, ind, passb, stopb, gp, gs, typ)
        assert abs(got - exp) < 1e-10 * max(1.0, abs(exp))
    with pytest.raises(RuntimeError):
        band_stop_obj(0.3, 0, passb, stopb, 1.0, 40.0, 'bogus')
