"""Peak detection family vs scipy (the executable spec).

Covers the full find_peaks condition matrix via fuzzing (every property
key compared), prominence/width standalone calls, argrel* modes, and
Tensor input (the device->host path).
"""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import (
    argrelmax,
    argrelmin,
    find_peaks,
    peak_prominences,
    peak_widths,
)


def test_find_peaks_simple_and_plateaus():
    x = np.array([0, 1, 0, 2, 2, 2, 0, 3, 0, 1, 1, 0], np.float64)
    p1, _ = find_peaks(x)
    p2, _ = sps.find_peaks(x)
    assert np.array_equal(p1, p2)  # plateau midpoints included
    p1, pr1 = find_peaks(x, plateau_size=2)
    p2, pr2 = sps.find_peaks(x, plateau_size=2)
    assert np.array_equal(p1, p2)
    for k in pr2:
        assert np.allclose(pr1[k], pr2[k]), k


@pytest.mark.parametrize('seed', range(40))
def test_find_peaks_fuzz_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 400))
    x = np.cumsum(rng.standard_normal(n))
    if rng.random() < 0.3:
        x = np.round(x * 2) / 2  # plateaus
    kw = {}
    if rng.random() < 0.5:
        kw['height'] = float(rng.normal(0, 2))
    if rng.random() < 0.4:
        kw['threshold'] = float(rng.uniform(0, 0.5))
    if rng.random() < 0.5:
        kw['distance'] = int(rng.integers(1, 10))
    if rng.random() < 0.5:
        kw['prominence'] = float(rng.uniform(0, 2))
    if rng.random() < 0.4:
        kw['width'] = float(rng.uniform(0, 4))
    if rng.random() < 0.3:
        kw['wlen'] = int(rng.integers(3, 50))
    if rng.random() < 0.3:
        kw['rel_height'] = float(rng.uniform(0.1, 1.0))
    p1, pr1 = find_peaks(x, **kw)
    p2, pr2 = sps.find_peaks(x, **kw)
    assert np.array_equal(p1, p2), kw
    for k in pr2:
        assert np.allclose(pr1[k], pr2[k], atol=1e-10), (k, kw)


def test_prominences_and_widths_standalone():
    rng = np.random.default_rng(7)
    x = np.cumsum(rng.standard_normal(256))
    pk = sps.find_peaks(x)[0]
    for wlen in (None, 21):
        a = peak_prominences(x, pk, wlen)
        b = sps.peak_prominences(x, pk, wlen=wlen)
        for u, v in zip(a, b):
            assert np.allclose(u, v)
    for rh in (0.3, 0.5, 1.0):
        a = peak_widths(x, pk, rel_height=rh)
        b = sps.peak_widths(x, pk, rel_height=rh)
        for u, v in zip(a, b):
            assert np.allclose(u, v)
    with pytest.raises(RuntimeError):
        peak_prominences(x, [len(x) + 5])
    with pytest.raises(RuntimeError):
        peak_prominences(x, pk, wlen=2)


def test_argrel_modes():
    rng = np.random.default_rng(9)
    x = rng.standard_normal(128)
    for order in (1, 2, 3):
        for mode in ('clip', 'wrap'):
            assert np.array_equal(
                argrelmax(x, order, mode)[0],
                sps.argrelmax(x, order=order, mode=mode)[0])
            assert np.array_equal(
                argrelmin(x, order, mode)[0],
                sps.argrelmin(x, order=order, mode=mode)[0])


def test_find_peaks_tensor_input():
    # device pipeline -> host peak list: the intended workflow
    rng = np.random.default_rng(1)
    fs = 1000.0
    t = np.arange(4096) / fs
    x = (np.sin(2 * np.pi * 60.0 * t)
         + 0.2 * rng.standard_normal(t.size)).astype(np.float32)
    from dsc_tpu.models import welch
    f, p = welch(dsc.from_numpy(x), fs=fs, nperseg=512)
    peaks, props = find_peaks(p, height=0.001, distance=5)
    assert peaks.size >= 1
    assert abs(float(f.numpy()[peaks[np.argmax(props['peak_heights'])]])
               - 60.0) < 3.0
    with pytest.raises(RuntimeError):
        find_peaks(dsc.from_numpy(x.reshape(2, -1)))
