"""Fused packed half-size real FFT engine (fourier/packed_fused.py,
interpret mode).

Same contract as tests/test_packed.py, but with the even/odd selection,
the hermitian untangle/entangle, and the final interleave all folded
into the Pallas phases (zero XLA passes). Cross-consumption with BOTH
the XLA-composed packed engine and the legacy full-size half-T kernels
pins the layout contract. Reference half-size r2c: dsc_fft.h:178-238.
"""

import numpy as np
import pytest

import jax

from dsc_tpu.fourier import packed, packed_fused
from dsc_tpu.fourier import pallas_stream_t as pst

N1, N2 = 512, 1024  # inner engine at (512, 512)
N = N1 * N2


@pytest.fixture(scope='module')
def sig():
    rng = np.random.default_rng(41)
    return rng.standard_normal(N).astype(np.float32)


def _ref_half_t(x):
    nc = pst.nc_for(N2, True)
    full = np.fft.fft(x)
    k = np.arange(N1)[:, None] + N1 * np.arange(nc)[None, :]
    return full[k % N]


def test_supported():
    assert packed_fused.supported(512, 1024)
    assert packed_fused.supported(4096, 4096)      # 2^24
    assert not packed_fused.supported(256, 1024)   # T/2 odd
    assert not packed_fused.supported(512, 256)    # m2 too small


def test_forward_matches_numpy(sig):
    hr, hi = jax.jit(
        lambda v: packed_fused.rfft_half_t_packed_fused(v, N1, N2))(sig)
    assert hr.shape == (N1 + pst.PAD_ROWS, pst.nc_for(N2, True))
    ref = _ref_half_t(sig)
    got = (np.asarray(hr) + 1j * np.asarray(hi))[:N1]
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 3e-5, err


def test_roundtrip_fused_both_ways(sig):
    hr, hi = jax.jit(
        lambda v: packed_fused.rfft_half_t_packed_fused(v, N1, N2))(sig)
    back = jax.jit(
        lambda r, i: packed_fused.irfft_from_half_t_packed_fused(
            r, i, N1, N2))(hr, hi)
    assert np.abs(np.asarray(back) - sig).max() < 2e-4


def test_fused_forward_legacy_inverse(sig):
    """Layout contract: the legacy half-T inverse kernel reconstructs
    from FUSED packed forward planes."""
    hr, hi = jax.jit(
        lambda v: packed_fused.rfft_half_t_packed_fused(v, N1, N2))(sig)
    yr, _ = jax.jit(
        lambda r, i: pst.fourstep_from_t_p(
            r, i, N1, N2, half=True, real_output=True))(hr, hi)
    assert np.abs(np.asarray(yr) - sig).max() < 2e-4


def test_legacy_forward_fused_inverse(sig):
    """And the other direction: fused inverse consumes legacy planes."""
    hr, hi = jax.jit(
        lambda v: pst.fourstep_to_t_p(v, None, N1, N2, half=True))(sig)
    back = jax.jit(
        lambda r, i: packed_fused.irfft_from_half_t_packed_fused(
            r, i, N1, N2))(hr, hi)
    assert np.abs(np.asarray(back) - sig).max() < 2e-4


def test_fused_matches_xla_packed(sig):
    """Fused forward planes == the XLA-composed packed engine's planes
    (same math, same layout) to kernel precision."""
    hr_f, hi_f = jax.jit(
        lambda v: packed_fused.rfft_half_t_packed_fused(v, N1, N2))(sig)
    hr_x, hi_x = jax.jit(
        lambda v: packed.rfft_half_t_packed(v, N1, N2))(sig)
    scale = max(np.abs(np.asarray(hr_x)).max(),
                np.abs(np.asarray(hi_x)).max())
    assert np.abs(np.asarray(hr_f)[:N1] - np.asarray(hr_x)[:N1]).max() \
        / scale < 3e-5
    assert np.abs(np.asarray(hi_f)[:N1] - np.asarray(hi_x)[:N1]).max() \
        / scale < 3e-5
