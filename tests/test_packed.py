"""Packed half-size real FFT engine (fourier/packed.py, interpret mode).

rfft_n as one n/2-point complex four-step + T-coordinate untangle. The
output planes must be layout-compatible with the full-size engine's
hermitian-half T layout — cross-consumption in BOTH directions (packed
forward -> legacy inverse kernel, legacy forward -> packed inverse) is
the contract that makes the packed engine a drop-in on the public path.
Reference half-size r2c: dsc_fft.h:178-238.
"""

import numpy as np
import pytest

import jax

from dsc_tpu.fourier import config as fft_config
from dsc_tpu.fourier import packed
from dsc_tpu.fourier import pallas_stream_t as pst

N1, N2 = 512, 1024  # inner engine at (512, 512), the interpret-mode size
N = N1 * N2


@pytest.fixture(scope='module')
def sig():
    rng = np.random.default_rng(29)
    return rng.standard_normal(N).astype(np.float32)


def _ref_half_t(x):
    """np.fft spectrum in half-T layout over the FULL nc columns (the
    lane-padding columns hold the true spectrum continuation)."""
    nc = pst.nc_for(N2, True)
    full = np.fft.fft(x)
    k = np.arange(N1)[:, None] + N1 * np.arange(nc)[None, :]
    return full[k % N]


@pytest.mark.parametrize('impl', ['u64', 'mm', 'tr'])
def test_deinterleave_roundtrip(impl, monkeypatch):
    monkeypatch.setattr(packed, 'DEINT_IMPL', impl)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4096).astype(np.float32)
    e, o = jax.jit(packed.deinterleave)(x)
    np.testing.assert_array_equal(np.asarray(e), x[0::2])
    np.testing.assert_array_equal(np.asarray(o), x[1::2])
    back = jax.jit(packed.interleave)(e, o)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_forward_matches_numpy(sig):
    hr, hi = jax.jit(
        lambda v: packed.rfft_half_t_packed(v, N1, N2))(sig)
    assert hr.shape == (N1 + pst.PAD_ROWS, pst.nc_for(N2, True))
    ref = _ref_half_t(sig)
    got = (np.asarray(hr) + 1j * np.asarray(hi))[:N1]
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 3e-5, err


def test_roundtrip_packed_both_ways(sig):
    hr, hi = jax.jit(
        lambda v: packed.rfft_half_t_packed(v, N1, N2))(sig)
    back = jax.jit(
        lambda r, i: packed.irfft_from_half_t_packed(r, i, N1, N2)
    )(hr, hi)
    assert np.abs(np.asarray(back) - sig).max() < 2e-4


def test_packed_forward_legacy_inverse(sig):
    """Layout contract: the legacy half-T inverse kernel (in-kernel
    mirror + roll row) reconstructs from PACKED forward planes."""
    hr, hi = jax.jit(
        lambda v: packed.rfft_half_t_packed(v, N1, N2))(sig)
    yr, _ = jax.jit(
        lambda r, i: pst.fourstep_from_t_p(
            r, i, N1, N2, half=True, real_output=True))(hr, hi)
    assert np.abs(np.asarray(yr) - sig).max() < 2e-4


def test_legacy_forward_packed_inverse(sig):
    hr, hi = jax.jit(
        lambda v: pst.fourstep_to_t_p(v, None, N1, N2, half=True))(sig)
    back = jax.jit(
        lambda r, i: packed.irfft_from_half_t_packed(r, i, N1, N2)
    )(hr, hi)
    assert np.abs(np.asarray(back) - sig).max() < 2e-4


def test_use_packed_gating():
    assert packed.supported(512, 1024)
    assert packed.supported(4096, 4096)
    assert not packed.supported(512, 512)      # inner m2 = 256 < FACTOR_MIN
    assert not packed.supported(512, 768)      # non-pow2 inner factor
    # mode 'off' always wins; 'on' forces regardless of backend
    old = fft_config.PACKED_MODE
    try:
        fft_config.PACKED_MODE = 'off'
        assert not fft_config.use_packed(4096, 4096)
        fft_config.PACKED_MODE = 'on'
        assert fft_config.use_packed(4096, 4096)
        assert not fft_config.use_packed(512, 512)
    finally:
        fft_config.PACKED_MODE = old
