"""dsc_tpu.transforms (scipy.fft-parity tier) — scipy.fft is the oracle.

Exact-length transforms for any n (pow2 engine / Bluestein), norms,
Hermitian family, n-D, shifts, fast-length helpers.
"""

import numpy as np
import pytest
import scipy.fft as sft

import dsc_tpu as dsc
from dsc_tpu import transforms as tf

# pow2, even composite, odd, prime, tiny
SIZES = [16, 12, 15, 17, 1]
NORMS = [None, 'backward', 'ortho', 'forward']


def _cover(names, avals, bvals, fast, unpack=False):
    """Full (a x b) cross product with only the ``fast`` pairs unmarked;
    the rest run under -m slow. Each case costs a 2-7 s XLA:CPU compile,
    so the fast CI job takes a covering subset (every a with one b,
    every b with one a) and the full suite keeps the whole matrix.
    ``fast`` pairs key on the a value itself or its index in avals;
    ``unpack=True`` spreads tuple-valued a across multiple argnames."""
    params = []
    for ia, a in enumerate(avals):
        for b in bvals:
            marks = () if (ia, b) in fast or (a, b) in fast \
                else (pytest.mark.slow,)
            aa = a if unpack and isinstance(a, tuple) else (a,)
            params.append(pytest.param(*aa, b, marks=marks))
    return pytest.mark.parametrize(names, params)


def _sig(n, seed=0, cplx=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    if cplx:
        x = x + 1j * rng.standard_normal(n)
    return x.astype(np.complex64 if cplx else np.float32)


def _close(got, want, tol=2e-4):
    got = np.asarray(got.numpy())
    scale = max(np.abs(want).max(), 1e-30)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.abs(got - want).max() < tol * scale


@_cover('n,norm', SIZES, NORMS,
        fast={(n, None) for n in SIZES}
        | {(12, 'backward'), (12, 'ortho'), (12, 'forward')})
def test_fft_ifft_exact(n, norm):
    x = _sig(n, cplx=True)
    _close(tf.fft(dsc.from_numpy(x), norm=norm), sft.fft(x, norm=norm))
    _close(tf.ifft(dsc.from_numpy(x), norm=norm), sft.ifft(x, norm=norm))


@pytest.mark.parametrize('n', SIZES)
def test_fft_real_input(n):
    x = _sig(n)
    _close(tf.fft(dsc.from_numpy(x)), sft.fft(x))


@pytest.mark.parametrize('n_arg', [8, 12, 20, 5])
def test_fft_n_pad_truncate(n_arg):
    x = _sig(13, cplx=True)
    _close(tf.fft(dsc.from_numpy(x), n=n_arg), sft.fft(x, n=n_arg))


@pytest.mark.parametrize('axis', [0, 1, -1, -2])
def test_fft_axis(axis):
    x = _sig(6 * 10, cplx=True).reshape(6, 10)
    _close(tf.fft(dsc.from_numpy(x), axis=axis), sft.fft(x, axis=axis))


@_cover('n,norm', SIZES, NORMS,
        fast={(n, None) for n in SIZES}
        | {(17, 'backward'), (17, 'ortho'), (17, 'forward')})
def test_rfft_irfft(n, norm):
    x = _sig(n)
    _close(tf.rfft(dsc.from_numpy(x), norm=norm), sft.rfft(x, norm=norm))
    spec = sft.rfft(x).astype(np.complex64)
    if n > 1:
        _close(tf.irfft(dsc.from_numpy(spec), n=n, norm=norm),
               sft.irfft(spec, n=n, norm=norm))


def test_irfft_default_even():
    spec = sft.rfft(_sig(24)).astype(np.complex64)
    _close(tf.irfft(dsc.from_numpy(spec)), sft.irfft(spec))


@_cover('n,norm', [16, 15, 12], NORMS,
        fast={(16, None), (15, None), (12, None), (15, 'ortho')})
def test_hfft_ihfft(n, norm):
    m = n // 2 + 1
    spec = _sig(m, cplx=True)
    _close(tf.hfft(dsc.from_numpy(spec), n=n, norm=norm),
           sft.hfft(spec, n=n, norm=norm))
    x = _sig(n, seed=3)
    _close(tf.ihfft(dsc.from_numpy(x), norm=norm), sft.ihfft(x, norm=norm))


def test_roundtrips():
    x = _sig(15, cplx=True)
    _close(tf.ifft(tf.fft(dsc.from_numpy(x))), x.astype(np.complex128))
    xr = _sig(18)
    _close(tf.irfft(tf.rfft(dsc.from_numpy(xr)), n=18),
           xr.astype(np.float64))


@_cover('shape,axes,s,norm', [
    ((6, 10), None, None),
    ((6, 10), (0,), None),
    ((6, 10), (-2, -1), (4, 12)),
    ((3, 5, 8), (1, 2), None),
    ((3, 5, 8), None, (2, 6, 8)),
], [None, 'ortho'], fast={(0, None), (2, None), (4, None), (1, 'ortho')},
    unpack=True)
def test_fftn_ifftn(shape, axes, s, norm):
    x = _sig(int(np.prod(shape)), cplx=True).reshape(shape)
    _close(tf.fftn(dsc.from_numpy(x), s=s, axes=axes, norm=norm),
           sft.fftn(x, s=s, axes=axes, norm=norm))
    _close(tf.ifftn(dsc.from_numpy(x), s=s, axes=axes, norm=norm),
           sft.ifftn(x, s=s, axes=axes, norm=norm))


@_cover('shape,norm', [(6, 10), (4, 9)], [None, 'ortho'],
        fast={(0, None), (1, 'ortho')})
def test_fft2_rfft2_irfft2(shape, norm):
    x = _sig(int(np.prod(shape))).reshape(shape)
    _close(tf.fft2(dsc.from_numpy(x), norm=norm), sft.fft2(x, norm=norm))
    _close(tf.rfft2(dsc.from_numpy(x), norm=norm), sft.rfft2(x, norm=norm))
    spec = sft.rfft2(x).astype(np.complex64)
    _close(tf.irfft2(dsc.from_numpy(spec), s=shape, norm=norm),
           sft.irfft2(spec, s=shape, norm=norm))


def test_rfftn_irfftn_3d():
    x = _sig(3 * 5 * 8).reshape(3, 5, 8)
    _close(tf.rfftn(dsc.from_numpy(x)), sft.rfftn(x))
    spec = sft.rfftn(x).astype(np.complex64)
    _close(tf.irfftn(dsc.from_numpy(spec), s=(3, 5, 8)),
           sft.irfftn(spec, s=(3, 5, 8)))


def test_hfft2_ihfft2():
    x = _sig(5 * 9, cplx=True).reshape(5, 9)
    _close(tf.hfft2(dsc.from_numpy(x), s=(5, 16)),
           sft.hfft2(x, s=(5, 16)))
    xr = _sig(5 * 16, seed=2).reshape(5, 16)
    _close(tf.ihfft2(dsc.from_numpy(xr)), sft.ihfft2(xr))


@pytest.mark.parametrize('shape,axes', [
    ((8,), None), ((9,), None), ((6, 10), None), ((6, 9), (1,)),
    ((5, 7), 0),
])
def test_fftshift_ifftshift(shape, axes):
    x = _sig(int(np.prod(shape)), cplx=True).reshape(shape)
    _close(tf.fftshift(dsc.from_numpy(x), axes=axes),
           sft.fftshift(x, axes=axes))
    _close(tf.ifftshift(dsc.from_numpy(x), axes=axes),
           sft.ifftshift(x, axes=axes))
    # real input path
    xr = _sig(int(np.prod(shape)), seed=1).reshape(shape)
    _close(tf.fftshift(dsc.from_numpy(xr), axes=axes),
           sft.fftshift(xr, axes=axes))


def test_shift_roundtrip_odd():
    x = _sig(11)
    got = tf.ifftshift(tf.fftshift(dsc.from_numpy(x)))
    assert np.allclose(got.numpy(), x)


def test_fftfreq_rfftfreq():
    assert np.allclose(tf.fftfreq(10, 0.25).numpy(), sft.fftfreq(10, 0.25),
                       atol=1e-6)
    assert np.allclose(tf.rfftfreq(9, 2.0).numpy(), sft.rfftfreq(9, 2.0),
                       atol=1e-6)


def test_fast_len():
    # engine-truthful answer: next/prev power of two (radix-2 engine),
    # documented divergence from scipy's 5-smooth lengths
    assert tf.next_fast_len(1000) == 1024
    assert tf.next_fast_len(1024) == 1024
    assert tf.next_fast_len(1) == 1
    assert tf.prev_fast_len(1000) == 512
    assert tf.prev_fast_len(1024) == 1024
    assert tf.prev_fast_len(1) == 1


def test_errors():
    x = dsc.from_numpy(_sig(8))
    with pytest.raises(RuntimeError):
        tf.fft(x, norm='bogus')
    with pytest.raises(RuntimeError):
        tf.fft(x, axis=2)
    with pytest.raises(RuntimeError):
        tf.rfft(dsc.from_numpy(_sig(8, cplx=True)))
    with pytest.raises(RuntimeError):
        tf.fftn(x, s=(4, 4), axes=(0,))
    with pytest.raises(RuntimeError):
        tf.next_fast_len(0)


def test_large_pow2_rides_engine():
    # a 2^16 exact transform must go through the pow2 planar engine path
    x = _sig(2**16)
    got = tf.rfft(dsc.from_numpy(x))
    want = sft.rfft(x)
    scale = np.abs(want).max()
    assert np.abs(got.numpy() - want).max() < 1e-4 * scale


def test_plan_cache_bounded():
    from dsc_tpu.transforms import _dft

    for n in range(20, 60):
        _dft.dft_plan(n)
    assert len(_dft._plans) <= 16


# --------------------------------------------------------------------------
# DCT/DST (trig.py) — scipy.fft.dct/dst/idct/idst are the oracle
# --------------------------------------------------------------------------


@_cover('n,type_', [16, 12, 7, 1], [1, 2, 3, 4],
        fast={(12, 1), (12, 2), (12, 3), (12, 4),
              (16, 2), (7, 3), (1, 2)})
def test_dct_dst_types(n, type_):
    if type_ == 1 and n < 2:
        return
    x = _sig(n, seed=3)
    x64 = x.astype(np.float64)
    _close(tf.dct(dsc.from_numpy(x), type=type_),
           sft.dct(x64, type=type_))
    _close(tf.dst(dsc.from_numpy(x), type=type_),
           sft.dst(x64, type=type_))


@_cover('norm,type_', NORMS, [1, 2, 3, 4],
        fast={(None, 1), ('backward', 2), ('ortho', 3), ('forward', 4)})
def test_dct_dst_norms_and_inverse(norm, type_):
    n = 11
    x = _sig(n, seed=4)
    x64 = x.astype(np.float64)
    _close(tf.dct(dsc.from_numpy(x), type=type_, norm=norm),
           sft.dct(x64, type=type_, norm=norm))
    _close(tf.idct(dsc.from_numpy(x), type=type_, norm=norm),
           sft.idct(x64, type=type_, norm=norm))
    _close(tf.idst(dsc.from_numpy(x), type=type_, norm=norm),
           sft.idst(x64, type=type_, norm=norm))


@pytest.mark.parametrize('type_', [
    pytest.param(1, marks=pytest.mark.slow), 2, 3,
    pytest.param(4, marks=pytest.mark.slow)])
def test_dct_roundtrip(type_):
    x = _sig(24, seed=5)
    got = tf.idct(tf.dct(dsc.from_numpy(x), type=type_), type=type_)
    _close(got, x.astype(np.float64))
    got = tf.idst(tf.dst(dsc.from_numpy(x), type=type_), type=type_)
    _close(got, x.astype(np.float64))


def test_dct_axis_n_orthogonalize():
    x = _sig(4 * 6 * 5, seed=6).reshape(4, 6, 5)
    x64 = x.astype(np.float64)
    _close(tf.dct(dsc.from_numpy(x), type=2, n=9, axis=1,
                  orthogonalize=True),
           sft.dct(x64, type=2, n=9, axis=1, orthogonalize=True))
    _close(tf.dst(dsc.from_numpy(x), type=3, n=4, axis=0, norm='ortho',
                  orthogonalize=False),
           sft.dst(x64, type=3, n=4, axis=0, norm='ortho',
                   orthogonalize=False))


def test_dct_complex_input():
    z = _sig(12, seed=7, cplx=True)
    _close(tf.dct(dsc.from_numpy(z), type=2, norm='ortho'),
           sft.dct(z.astype(np.complex128), type=2, norm='ortho'))
    _close(tf.dst(dsc.from_numpy(z), type=3),
           sft.dst(z.astype(np.complex128), type=3))


def test_dctn_dstn():
    x = _sig(4 * 6 * 5, seed=8).reshape(4, 6, 5)
    x64 = x.astype(np.float64)
    _close(tf.dctn(dsc.from_numpy(x), type=3, s=(5, 4), axes=(0, 2),
                   norm='ortho'),
           sft.dctn(x64, type=3, s=(5, 4), axes=(0, 2), norm='ortho'))
    _close(tf.idstn(dsc.from_numpy(x), type=4, norm='forward'),
           sft.idstn(x64, type=4, norm='forward'))


@pytest.mark.slow
def test_dctn_dstn_more():
    x = _sig(4 * 6 * 5, seed=8).reshape(4, 6, 5)
    x64 = x.astype(np.float64)
    _close(tf.idctn(dsc.from_numpy(x), type=2),
           sft.idctn(x64, type=2))
    _close(tf.dstn(dsc.from_numpy(x), type=2, axes=(1,)),
           sft.dstn(x64, type=2, axes=(1,)))


def test_dct_errors():
    x = dsc.from_numpy(_sig(8))
    with pytest.raises(RuntimeError):
        tf.dct(x, type=5)
    with pytest.raises(RuntimeError):
        tf.dct(_sig(1), type=1)
    with pytest.raises(RuntimeError):
        tf.dst(x, norm='bogus')


# --------------------------------------------------------------------------
# fht/ifht/fhtoffset (fftlog.py) — scipy.fft FFTLog is the oracle
# --------------------------------------------------------------------------


@_cover('n,mu', [16, 15], [0.0, 0.5, 2.0],
        fast={(16, 0.0), (15, 0.5), (16, 2.0)})
def test_fht_ifht(n, mu):
    a = _sig(n, seed=9).astype(np.float32)
    a64 = a.astype(np.float64)
    dln = 0.1
    _close(tf.fht(dsc.from_numpy(a), dln, mu), sft.fht(a64, dln, mu))
    _close(tf.ifht(dsc.from_numpy(a), dln, mu), sft.ifht(a64, dln, mu))


def test_fht_offset_bias_batched():
    rng = np.random.default_rng(10)
    a = rng.standard_normal((3, 16)).astype(np.float32)
    a64 = a.astype(np.float64)
    dln, mu, bias = 0.08, 0.5, 0.4
    off = tf.fhtoffset(dln, mu, initial=0.2, bias=bias)
    assert abs(off - sft.fhtoffset(dln, mu, initial=0.2, bias=bias)) < 1e-12
    _close(tf.fht(dsc.from_numpy(a), dln, mu, offset=off, bias=bias),
           sft.fht(a64, dln, mu, offset=off, bias=bias))
    _close(tf.ifht(dsc.from_numpy(a), dln, mu, offset=off, bias=bias),
           sft.ifht(a64, dln, mu, offset=off, bias=bias))


def test_fht_roundtrip():
    a = _sig(32, seed=11)
    dln, mu = 0.05, 1.0
    off = tf.fhtoffset(dln, mu)
    got = tf.ifht(tf.fht(dsc.from_numpy(a), dln, mu, offset=off),
                  dln, mu, offset=off)
    _close(got, a.astype(np.float64))


def test_workers_context():
    assert tf.get_workers() == 1
    with tf.set_workers(4):
        assert tf.get_workers() == 4
        with tf.set_workers(-1):
            assert tf.get_workers() == -1
    assert tf.get_workers() == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        with tf.set_workers(0):
            pass
