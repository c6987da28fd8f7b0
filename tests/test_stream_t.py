"""Transposed / hermitian-half layout streaming kernels (interpret mode).

The T layout stores X_T[k1, k2] = X[k1 + n1*k2] as (n1, n2) row-major;
half additionally keeps only columns [0, n2/2] (+ lane padding) of a
real-input spectrum (pallas_stream_t.py). Values must equal np.fft up to
the split-bf16 DFT tolerance; the inverse must reproduce the input from
the stored (half) layout alone — including the k1 = 0 mirror special
and the mixed direct/mirror block at column n2/2.
"""

import numpy as np
import pytest

import jax

from dsc_tpu.fourier import pallas_stream_t as pst

N1 = N2 = 512
N = N1 * N2
NC = pst.nc_for(N2, True)


@pytest.fixture(scope='module')
def sig():
    rng = np.random.default_rng(17)
    return rng.standard_normal(N).astype(np.float32)


def _ref_t(x):
    """np.fft spectrum in T layout (n1, n2)."""
    return np.fft.fft(x).reshape(N2, N1).T


def test_forward_full_t(sig):
    hr, hi = jax.jit(
        lambda v: pst.fourstep_to_t_p(v, None, N1, N2, half=False)
    )(sig)
    assert hr.shape == (N1, N2)
    ref = _ref_t(sig)
    got = np.asarray(hr) + 1j * np.asarray(hi)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5


def test_forward_half_t(sig):
    hr, hi = jax.jit(
        lambda v: pst.fourstep_to_t_p(v, None, N1, N2, half=True)
    )(sig)
    assert hr.shape == (N1 + pst.PAD_ROWS, NC)
    ref = _ref_t(sig)[:, : N2 // 2 + 1]
    got = (np.asarray(hr) + 1j * np.asarray(hi))[:N1, : N2 // 2 + 1]
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5


def test_inverse_full_t_roundtrip():
    rng = np.random.default_rng(21)
    xr = rng.standard_normal(N).astype(np.float32)
    xi = rng.standard_normal(N).astype(np.float32)
    hr, hi = jax.jit(
        lambda a, b: pst.fourstep_to_t_p(a, b, N1, N2, half=False)
    )(xr, xi)
    yr, yi = jax.jit(
        lambda a, b: pst.fourstep_from_t_p(a, b, N1, N2, half=False,
                                           real_output=False)
    )(hr, hi)
    z = np.asarray(yr) + 1j * np.asarray(yi)
    ref = xr + 1j * xi
    assert np.abs(z - ref).max() < 5e-4


def test_inverse_half_t_roundtrip(sig):
    hr, hi = jax.jit(
        lambda v: pst.fourstep_to_t_p(v, None, N1, N2, half=True)
    )(sig)
    yr, _ = jax.jit(
        lambda a, b: pst.fourstep_from_t_p(a, b, N1, N2, half=True,
                                           real_output=True)
    )(hr, hi)
    assert yr.shape == (N,)
    assert np.abs(np.asarray(yr) - sig).max() < 5e-4


def test_inverse_half_from_exact_spectrum(sig):
    # feed the inverse an EXACT (np.fft) half-T spectrum so mirror
    # synthesis errors aren't masked by forward kernel error; pad rows
    # carry garbage on purpose (they must never influence the result)
    ref = _ref_t(sig)[:, : N2 // 2 + 1]
    hr = np.full((N1 + pst.PAD_ROWS, NC), np.nan, np.float32)
    hi = np.full((N1 + pst.PAD_ROWS, NC), np.nan, np.float32)
    hr[:N1, : N2 // 2 + 1] = ref.real.astype(np.float32)
    hi[:N1, : N2 // 2 + 1] = ref.imag.astype(np.float32)
    # padding columns must also be ignored — poison stays NaN there
    yr, _ = jax.jit(
        lambda a, b: pst.fourstep_from_t_p(a, b, N1, N2, half=True,
                                           real_output=True)
    )(hr, hi)
    assert np.isfinite(np.asarray(yr)).all()
    assert np.abs(np.asarray(yr) - sig).max() < 2e-4


def test_batched_axis0_streaming(monkeypatch):
    # non-last-axis batches route through the streaming kernels with the
    # moveaxis fused into the same jit (VERDICT r2 item 5; reference
    # axis uniformity, dsc.cpp:2121-2142)
    import dsc_tpu as dsc
    from dsc_tpu.fourier import config as fft_config

    monkeypatch.setattr(fft_config, 'STREAM_MODE', 'on')
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2**18, 3)).astype(np.float32)
    got = dsc.rfft(dsc.from_numpy(x), axis=0)
    ref = np.fft.rfft(x, axis=0)
    assert got.shape == ref.shape
    assert np.abs(got.numpy() - ref).max() / np.abs(ref).max() < 3e-5
    back = dsc.irfft(got, axis=0)
    assert np.abs(back.numpy() - x).max() < 5e-4
    xc = (x[:, :2] + 1j * x[:, 1:]).astype(np.complex64)
    gf = dsc.fft(dsc.from_numpy(xc), axis=0)
    rf = np.fft.fft(xc, axis=0)
    assert np.abs(gf.numpy() - rf).max() / np.abs(rf).max() < 3e-5
    gb = dsc.ifft(gf, axis=0)
    assert np.abs(gb.numpy() - xc).max() < 5e-4


def test_asymmetric_factors():
    # n = 2^19 -> n1=1024, n2=512: jm, nc, pairing all exercise the
    # non-square path
    n1, n2 = 1024, 512
    n = n1 * n2
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n).astype(np.float32)
    hr, hi = jax.jit(
        lambda v: pst.fourstep_to_t_p(v, None, n1, n2, half=True)
    )(x)
    ref = np.fft.rfft(x)
    # natural prefix: X[k] = H[k % n1, k // n1]
    got_t = (np.asarray(hr) + 1j * np.asarray(hi))[:n1, : n2 // 2 + 1]
    got = got_t.T.reshape(-1)[: n // 2 + 1]
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5
    yr, _ = jax.jit(
        lambda a, b: pst.fourstep_from_t_p(a, b, n1, n2, half=True,
                                           real_output=True)
    )(hr, hi)
    assert np.abs(np.asarray(yr) - x).max() < 5e-4
