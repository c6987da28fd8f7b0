"""FFT compute core: Stockham autosort + Bailey four-step, pure JAX.

TPU-native rebuild of the reference FFT engine (dsc/include/dsc_fft.h,
dsc/src/dsc.cpp:1955-2340). The reference uses a recursive radix-2 DIT
split with per-row scratch copies; that shape is hostile to XLA (dynamic
recursion, strided scalar loops), so the rebuild uses:

- **Stockham autosort** (iterative, no bit-reversal, unit-stride batches) for
  transforms that fit on-chip — every stage is a dense vector op over the
  whole batch, exactly what the VPU wants;
- **Bailey four-step** (n = n1*n2: column FFTs -> twiddle -> row FFTs ->
  transpose) for large transforms, the same decomposition logic the survey
  maps to blockwise/sequence-parallel processing (SURVEY §5.7);
- an optional Pallas base-case kernel on TPU (see pallas_kernels.py) that
  fuses an entire base transform in VMEM.

Everything here is shape-static, jit-traceable, and operates on native
complex arrays (complex64/complex128); the Pallas kernels switch to planar
(re, im) float pairs internally since TPU vector registers have no complex.

Inverse transforms use the conjugation identity ifft(x) = conj(fft(conj(x)))/n
so a single forward code path serves both directions.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from . import config


def _c(table) -> jax.Array:
    """Recombine a planar (re, im) twiddle table inside the jitted kernel —
    complex arrays can't cross the TPU transfer boundary (see interop.py),
    so plans store float pairs and pay one fused lax.complex here."""
    return jax.lax.complex(table[0], table[1])


def stockham_fft(x: jax.Array, w: jax.Array) -> jax.Array:
    """Forward DFT of each row of ``x`` (shape (B, n), complex), Stockham
    autosort radix-2 DIF.

    ``w`` is the stage twiddle table w[p] = exp(-2i*pi*p/n), p < n/2; stage
    with current length ``cur`` uses the strided subset w[::n//cur][:cur//2].
    Output is in natural order — no bit-reversal pass.
    """
    b, n = x.shape
    if n == 1:
        return x
    cur, s = n, 1
    while cur > 1:
        m = cur // 2
        x3 = x.reshape(b, cur, s)
        a = x3[:, :m]
        bb = x3[:, m:]
        wp = w[::s][:m].reshape(1, m, 1)
        y = jnp.stack([a + bb, (a - bb) * wp], axis=2)
        x = y.reshape(b, n)
        cur, s = m, s * 2
    return x


def _base_fft(x: jax.Array, w: jax.Array, n: int) -> jax.Array:
    """Base-case n-point batched FFT; routes to the Pallas kernel on TPU
    when enabled, otherwise the Stockham XLA path."""
    if config.use_pallas(x.dtype, n):
        from . import pallas_kernels

        return pallas_kernels.fft_base(x, n)
    return stockham_fft(x, w)


def fft_apply(x: jax.Array, spec: Tuple, tables: Any) -> jax.Array:
    """Forward FFT of each row of x (B, n) following the factorization
    ``spec`` with twiddle ``tables`` (see plan.build_spec)."""
    kind = spec[0]
    if kind == 'base':
        return _base_fft(x, _c(tables), spec[1])

    _, n1, n2, s1, s2 = spec
    tt, t1, t2 = tables
    tt = _c(tt)
    b = x.shape[0]
    n = n1 * n2

    # x[j] with j = n2*j1 + j2  ->  M[j1, j2]
    m = x.reshape(b, n1, n2)
    # column FFTs (over j1): batch the n2 columns as rows
    mt = m.transpose(0, 2, 1).reshape(b * n2, n1)
    a = fft_apply(mt, s1, t1).reshape(b, n2, n1)
    # inter-stage twiddle Tt[j2, k1] = exp(-2i*pi*k1*j2/n)
    a = a * tt[None]
    # row FFTs (over j2)
    bm = a.transpose(0, 2, 1).reshape(b * n1, n2)
    c = fft_apply(bm, s2, t2).reshape(b, n1, n2)
    # X[k1 + n1*k2] = C[k1, k2]  ->  flatten transposed
    return c.transpose(0, 2, 1).reshape(b, n)


def fft_batched(x: jax.Array, spec: Tuple, tables: Any, inverse: bool) -> jax.Array:
    """(B, n) complex -> (B, n) complex, forward or inverse (1/n scaled)."""
    n = x.shape[-1]
    if inverse:
        y = jnp.conj(fft_apply(jnp.conj(x), spec, tables))
        return y * (1.0 / n)
    return fft_apply(x, spec, tables)


def rfft_batched(
    x: jax.Array, spec: Tuple, tables: Any, n: int
) -> jax.Array:
    """(B, n) real -> (B, n/2+1) complex.

    Small n: half-size complex transform + untangling pass (reference
    dsc_real_fft, dsc_fft.h:178-238). Large n: full-size complex transform
    of x+0i — the even/odd packing is a stride-2 lane gather that XLA lowers
    pathologically at scale (157 ms at 2^24), while the 2x-flops full
    transform runs at memory speed.
    """
    w_tables, wu = tables
    b = x.shape[0]
    nh = n // 2
    if wu is None:
        z = jax.lax.complex(x, jnp.zeros_like(x))
        return fft_apply(z, spec, w_tables)[:, : nh + 1]
    wu = _c(wu)
    if nh == 0:
        return x.astype(wu.dtype)
    z = jax.lax.complex(x[:, 0::2], x[:, 1::2]).astype(wu.dtype)
    zf = fft_apply(z, spec, w_tables)
    # extend with Z[nh] = Z[0], then Zr[k] = conj(Z[nh-k])
    ze = jnp.concatenate([zf, zf[:, :1]], axis=1)
    zr = jnp.conj(ze[:, ::-1])
    even = 0.5 * (ze + zr)
    odd = -0.5j * wu[None] * (ze - zr)
    return even + odd


def irfft_batched(
    x: jax.Array, spec: Tuple, tables: Any, n: int
) -> jax.Array:
    """(B, n/2+1) complex -> (B, n) real: inverse untangle + half-size
    inverse transform (small n), or full-spectrum reconstruction + full-size
    inverse transform (large n; see rfft_batched)."""
    w_tables, wu = tables
    b = x.shape[0]
    nh = n // 2
    if wu is None:
        # X[n-k] = conj(X[k]) for k = 1..nh-1; the reversal runs as a DMA
        # kernel — XLA's lane-gather lowering costs ~15 ms at 2^24
        from .pallas_reconstruct import reconstruct_spectrum

        full = reconstruct_spectrum(x, n)
        y = jnp.conj(fft_apply(jnp.conj(full), spec, w_tables)) * (1.0 / n)
        return jnp.real(y)
    wu = _c(wu)
    if nh == 0:
        return jnp.real(x)
    xr = jnp.conj(x[:, ::-1])  # Xr[k] = conj(X[nh-k]), k = 0..nh
    xf = x[:, :nh]
    even = 0.5 * (xf + xr[:, :nh])
    odd = 0.5j * jnp.conj(wu[None, :nh]) * (xf - xr[:, :nh])
    z = even + odd
    zi = jnp.conj(fft_apply(jnp.conj(z), spec, w_tables)) * (1.0 / nh)
    out = jnp.stack([jnp.real(zi), jnp.imag(zi)], axis=-1).reshape(b, n)
    return out


# ---------------------------------------------------------------------------
# N-D entry points: pad/crop + axis handling, fully jitted
# ---------------------------------------------------------------------------


def _to_batch(x: jax.Array, axis: int) -> Tuple[jax.Array, Tuple[int, ...]]:
    xm = jnp.moveaxis(x, axis, -1)
    lead = xm.shape[:-1]
    return xm.reshape(-1, xm.shape[-1]), lead


def _from_batch(y: jax.Array, lead: Tuple[int, ...], axis: int) -> jax.Array:
    y = y.reshape(*lead, y.shape[-1])
    return jnp.moveaxis(y, -1, axis)


def _pad_crop(x: jax.Array, target: int) -> jax.Array:
    """Crop or zero-pad the last axis to ``target`` (reference pad/crop to
    pow2, dsc.cpp:2019-2032)."""
    cur = x.shape[-1]
    if cur == target:
        return x
    if cur > target:
        return x[..., :target]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - cur)]
    return jnp.pad(x, pad)


@partial(jax.jit, static_argnames=('spec', 'n', 'axis', 'inverse', 'cdtype'))
def fft_nd(x, tables, spec, n, axis, inverse, cdtype):
    # input cast happens inside jit: complex arrays must not materialize
    # eagerly at the transfer boundary (interop.py)
    x = x.astype(cdtype)
    x = _pad_crop(jnp.moveaxis(x, axis, -1), n)
    xb, lead = x.reshape(-1, n), x.shape[:-1]
    y = fft_batched(xb, spec, tables, inverse)
    return _from_batch(y, lead, axis)


@partial(jax.jit, static_argnames=('spec', 'n', 'axis'))
def rfft_nd(x, tables, spec, n, axis):
    x = _pad_crop(jnp.moveaxis(x, axis, -1), n)
    xb, lead = x.reshape(-1, n), x.shape[:-1]
    y = rfft_batched(xb, spec, tables, n)
    return _from_batch(y, lead, axis)


@partial(jax.jit, static_argnames=('spec', 'n', 'axis', 'cdtype'))
def irfft_nd(x, tables, spec, n, axis, cdtype):
    x = x.astype(cdtype)
    x = _pad_crop(jnp.moveaxis(x, axis, -1), n // 2 + 1)
    xb, lead = x.reshape(-1, n // 2 + 1), x.shape[:-1]
    y = irfft_batched(xb, spec, tables, n)
    return _from_batch(y, lead, axis)
