"""2-D rank filters and boundary-mode convolution vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps

import dsc_tpu as dsc
from dsc_tpu.models import convolve2d, medfilt2d, order_filter


def _im(shape=(40, 56), seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


@pytest.mark.parametrize('ks', [3, 5, (3, 5)], ids=str)
def test_medfilt2d_matches_scipy(ks):
    im = _im()
    got = medfilt2d(dsc.from_numpy(im), kernel_size=ks).numpy()
    assert np.array_equal(got, sps.medfilt2d(im, kernel_size=ks))


def test_medfilt2d_errors():
    with pytest.raises(RuntimeError):
        medfilt2d(dsc.from_numpy(_im()), kernel_size=4)
    with pytest.raises(RuntimeError):
        medfilt2d(dsc.from_numpy(_im()[0]))


def test_order_filter_matches_scipy():
    im = _im()
    dom = np.ones((3, 3))
    dom[0, 0] = 0
    for rank in (0, 3, 7):
        got = order_filter(dsc.from_numpy(im), dom, rank).numpy()
        assert np.array_equal(got, sps.order_filter(im, dom, rank)), rank
    x = _im((100,), 1)
    got = order_filter(dsc.from_numpy(x), np.ones(5), 2).numpy()
    assert np.array_equal(got, sps.order_filter(x, np.ones(5), 2))
    with pytest.raises(RuntimeError):
        order_filter(dsc.from_numpy(im), np.ones((2, 3)), 0)
    with pytest.raises(RuntimeError):
        order_filter(dsc.from_numpy(im), dom, 99)


@pytest.mark.parametrize('boundary,fv', [
    ('fill', 0.0), ('fill', 1.5), ('wrap', 0.0), ('symm', 0.0)], ids=str)
@pytest.mark.parametrize('mode', ['full', 'same', 'valid'])
def test_convolve2d_boundaries(boundary, fv, mode):
    im = _im()
    k = _im((5, 7), 2)
    got = convolve2d(dsc.from_numpy(im), dsc.from_numpy(k), mode=mode,
                     boundary=boundary, fillvalue=fv).numpy()
    ref = sps.convolve2d(im.astype(np.float64), k.astype(np.float64),
                         mode=mode, boundary=boundary, fillvalue=fv)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * max(np.abs(ref).max(), 1e-30)


def test_convolve2d_errors():
    im = dsc.from_numpy(_im())
    k = dsc.from_numpy(_im((3, 3), 3))
    with pytest.raises(RuntimeError):
        convolve2d(im, k, boundary='bogus')
    with pytest.raises(RuntimeError):
        convolve2d(im, k, mode='bogus')
