"""Planar complex storage: (re, im) float planes behind a C32 Tensor.

TPU vector registers have no complex type, the PJRT transfer path cannot
move complex arrays (interop.py), and every planar<->complex64
materialization of a 2^24-point spectrum costs two full HBM passes. The
FFT engine is planar end-to-end (fourier/core.py); this module lets the
*public* Tensor boundary stay planar too, so chains like the README
filterFFT pipeline (rfft -> multiply -> irfft, reference README.md:110-137)
never materialize complex64 on device.

A ``Planar`` value is two same-shape float32 planes plus a LOGICAL shape.
Physical storage may be wider than the logical value along the LAST axis
("prefix" semantics): the logical data is ``planes[..., :shape[-1]]``.
Leading dims must match, so batched spectra work row-wise.

The key layout is the **hermitian-full spectrum**: a large rfft keeps the
entire n-point spectrum (natural order, flat (n,) planes) and exposes the
logical n/2+1 prefix (reference rfft shape rule, dsc.cpp:2194-2197). While
``hermitian`` holds, the upper half is the exact conjugate mirror of the
lower half, so irfft of such a tensor is a straight full-size inverse with
a real output — the Hermitian reconstruction pass (pallas_reconstruct.py)
is skipped entirely. Elementwise ops between hermitian spectra (and with
real scalars) preserve the mirror property; anything else drops the flag
and irfft falls back to reconstruction.

Ops run on the FULL physical planes (the redundant upper half is valid
spectrum data, so this wastes at most 2x elementwise work on the pad) and
XLA fuses the prefix slice into consumers for the ops that leave planar
form (abs/angle/real/imag).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Planar:
    """Two float planes representing a complex64 value of ``shape``."""

    __slots__ = ('re', 'im', 'shape', 'hermitian', '_dense')

    def __init__(
        self,
        re: jax.Array,
        im: jax.Array,
        shape: Tuple[int, ...],
        hermitian: bool = False,
    ):
        assert re.shape == im.shape and re.dtype == im.dtype
        shape = tuple(shape)
        assert tuple(re.shape[:-1]) == shape[:-1], (re.shape, shape)
        assert shape[-1] <= re.shape[-1], (re.shape, shape)
        self.re = re
        self.im = im
        self.shape = shape
        self.hermitian = hermitian
        self._dense: Optional[jax.Array] = None

    # -- metadata (what _Buffer / Tensor need) ------------------------------

    @property
    def dtype(self):
        return np.dtype(
            np.complex64 if self.re.dtype == jnp.float32 else np.complex128
        )

    @property
    def nbytes(self) -> int:
        return int(self.re.nbytes) + int(self.im.nbytes)

    @property
    def ne(self) -> int:
        """Logical element count."""
        return int(math.prod(self.shape))

    @property
    def physical_ne(self) -> int:
        return int(self.re.size)

    @property
    def full_n(self) -> int:
        """For hermitian-full spectra: the transform length n (last plane
        dim); logical last dim is n//2 + 1."""
        return int(self.re.shape[-1])

    # -- materialization ------------------------------------------------------

    def materialize(self) -> jax.Array:
        """Dense complex array of the logical shape (cached)."""
        if self._dense is None:
            self._dense = _materialize(
                self.re, self.im, ne=self.ne, shape=self.shape
            )
        return self._dense

    def to_numpy(self) -> np.ndarray:
        """Host complex array — downloads the float planes (complex can't
        cross the TPU transfer boundary, interop.py) and combines on host."""
        m = self.shape[-1]
        re = np.asarray(self.re)[..., :m]
        im = np.asarray(self.im)[..., :m]
        out = np.empty(self.shape, dtype=self.dtype)
        out.real = re
        out.imag = im
        return out


def _prefix(p, shape):
    m = shape[-1]
    if m != p.shape[-1]:
        p = p[..., :m]
    return p.reshape(shape)


@partial(jax.jit, static_argnames=('ne', 'shape'))
def _materialize(re, im, *, ne, shape):
    return jax.lax.complex(_prefix(re, shape), _prefix(im, shape))


# ---------------------------------------------------------------------------
# plane arithmetic (complex formulas on planes; reference functor math,
# dsc_ops.h:46-90)
# ---------------------------------------------------------------------------


def _complex_math(ar, ai, br, bi, name):
    if name == 'add':
        return ar + br, ai + bi
    if name == 'sub':
        return ar - br, ai - bi
    if name == 'mul':
        return ar * br - ai * bi, ar * bi + ai * br
    if name == 'div':
        d = br * br + bi * bi
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d
    if name == 'pow':
        from .ops.kernels import _cpow_planes

        return _cpow_planes(ar, ai, br, bi)
    raise AssertionError(name)


def _herm_preserved(name: str) -> bool:
    """Ops that keep the hermitian mirror property of both-hermitian
    operands. pow does not: log's branch cut breaks conj(x)^s ==
    conj(x^s) for negative-real spectrum values."""
    return name in ('add', 'sub', 'mul', 'div')


@partial(jax.jit, static_argnames=('name',))
def _pp_jit(ar, ai, br, bi, *, name):
    from .ops import pallas_map

    shapes = (ar.shape, ai.shape, br.shape, bi.shape)
    dtypes = (ar.dtype, ai.dtype, br.dtype, bi.dtype)
    if _herm_preserved(name) and pallas_map.eligible(shapes, dtypes):
        # pow is excluded: its formula needs atan2, which has no proven
        # Mosaic lowering on this backend; the XLA real-formula path below
        # is still wedge-safe (no native complex transcendentals)
        # 4 planes in, 2 out: DMA-streamed (~2x XLA's fused-loop BW)
        return pallas_map.stream_map_multi(
            lambda a, b, c, d: _complex_math(a, b, c, d, name),
            (ar, ai, br, bi),
            (ar.dtype, ar.dtype),
        )
    return _complex_math(ar, ai, br, bi, name)


def binary_pp(name: str, a: Planar, b: Planar) -> Optional[Planar]:
    """Planar x planar elementwise op; None if shapes are incompatible."""
    if a.re.shape != b.re.shape or a.shape != b.shape:
        return None
    if a.re.dtype != b.re.dtype:
        return None
    yr, yi = _pp_jit(a.re, a.im, b.re, b.im, name=name)
    herm = a.hermitian and b.hermitian and _herm_preserved(name)
    return Planar(yr, yi, a.shape, hermitian=herm)


def binary_ps(name: str, a: Planar, s: complex, reverse: bool) -> Planar:
    """Planar x python-scalar op (scalar on the right unless ``reverse``)."""
    fdt = np.float32 if a.re.dtype == jnp.float32 else np.float64
    br = fdt(s.real)
    bi = fdt(s.imag)
    if reverse:
        yr, yi = _sp_jit(br, bi, a.re, a.im, name=name)
    else:
        yr, yi = _pp_jit(a.re, a.im, br, bi, name=name)
    herm = a.hermitian and s.imag == 0 and _herm_preserved(name)
    return Planar(yr, yi, a.shape, hermitian=herm)


@partial(jax.jit, static_argnames=('name',))
def _sp_jit(sr, si, ar, ai, *, name):
    # scalar on the LEFT (reverse orientation): s <op> a
    from .ops import pallas_map

    shapes = ((), (), ar.shape, ai.shape)
    dtypes = (ar.dtype,) * 4
    if _herm_preserved(name) and pallas_map.eligible(shapes, dtypes):
        return pallas_map.stream_map_multi(
            lambda a, b, c, d: _complex_math(a, b, c, d, name),
            (sr, si, ar, ai),
            (ar.dtype, ar.dtype),
        )
    return _complex_math(sr, si, ar, ai, name)


# ---------------------------------------------------------------------------
# unary plane ops (the reference's complex conventions, dsc.cpp:1444-1622)
# ---------------------------------------------------------------------------


@jax.jit
def neg_im(im):
    return -im


@partial(jax.jit, static_argnames=('ne', 'shape'))
def prefix_plane(p, *, ne, shape):
    """One plane's logical prefix as a dense real array (XLA fuses the
    slice into the reshape/consumer)."""
    return _prefix(p, shape)


@partial(jax.jit, static_argnames=('ne', 'shape'))
def abs_planes(re, im, *, ne, shape):
    fr = _prefix(re, shape)
    fi = _prefix(im, shape)
    return jnp.sqrt(fr * fr + fi * fi)


@partial(jax.jit, static_argnames=('ne', 'shape'))
def angle_planes(re, im, *, ne, shape):
    return jnp.arctan2(_prefix(im, shape), _prefix(re, shape))
