"""scipy.fft-parity DCT/DST: types 1-4, 1-D and n-D, all norms.

Every transform reduces to the tier's exact DFT engine (_dft.py — pow2
rides the planar FFT engine, other lengths Bluestein): types I/II embed
the signal in a symmetric/antisymmetric extension and take one real FFT
of length 2n or 2(n±1); types III/IV pre-twiddle into a complex
length-2n positive-exponent DFT and read the answer off one plane.
Extension, twiddles, boundary terms and the norm scale all fuse with the
DFT into ONE XLA program per call. Twiddle tables are computed host-side
in f64 at plan time and passed to jit as arguments (plan.py cache
discipline — eviction cannot invalidate compiled code).

scipy.fft.dct/idct/dst/idst/dctn/idctn/dstn/idstn are the executable
spec (tests/test_transforms.py), including the ``orthogonalize``
boundary-element sqrt(2) factors and the backward/ortho/forward norms.
The reference has no trigonometric transforms at all — this tier exists
because scipy.fft is the de-facto contract a NumPy-ecosystem user
expects next to the FFT family (reference README.md:15 positioning).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracing
from ..tensor import Tensor, _finish
from . import _dft
from .exact import (
    _as_tensor,
    _norm_scale,  # noqa: F401  (re-exported convention anchor)
    _planes_of,
    _resolve_axes,
    _resolve_axis,
    _rows,
    _unrows,
    _wrap_planar,
)

__all__ = [
    'dct', 'idct', 'dst', 'idst',
    'dctn', 'idctn', 'dstn', 'idstn',
]

_NORMS = ('backward', 'ortho', 'forward')


def _logical_len(kind: str, type_: int, n: int) -> int:
    """The transform's natural denominator M (scipy's forward norm is
    1/M, ortho is sqrt(1/M)): 2(n-1) for DCT-I, 2(n+1) for DST-I, 2n
    for every other type."""
    if type_ == 1:
        return 2 * (n - 1) if kind == 'dct' else 2 * (n + 1)
    return 2 * n


def _f32(a: np.ndarray) -> jax.Array:
    return jnp.asarray(np.ascontiguousarray(a, dtype=np.float32))


def _trig_plan(kind: str, type_: int, n: int) -> Tuple[Tuple, Any]:
    """(static, tables) for a length-n DCT/DST of the given type over
    (B, n) rows. static = (kind, type, n, inner-DFT static); tables =
    (inner tabs, *twiddle planes)."""
    if type_ not in (1, 2, 3, 4):
        raise RuntimeError(f'{kind}: type {type_} is invalid (scipy.fft '
                           'defines types 1-4)')
    if n < 1:
        raise RuntimeError(f'{kind}: n ({n}) must be >= 1')
    if kind == 'dct' and type_ == 1 and n < 2:
        raise RuntimeError('dct: type I requires n >= 2 (scipy.fft '
                           'raises here too)')
    key = ('trig', kind, type_, n)
    hit = _dft._cache_get(key)
    if hit is not None:
        return hit
    m = _logical_len(kind, type_, n)
    k = np.arange(n, dtype=np.int64)
    if type_ in (1, 2):
        # real symmetric/antisymmetric extension -> one real FFT
        istatic, itabs = _dft.rdft_plan(m)
        if type_ == 2:
            # post-twiddle exp(-i*pi*(k + dst)/ (2n)); DST-II reads
            # bins 1..n so its table is indexed k+1
            off = 0 if kind == 'dct' else 1
            red = np.mod(k + off, 4 * n).astype(np.float64)
            tw = np.exp(-1j * np.pi * red / (2 * n))
            tabs = (itabs, _f32(tw.real), _f32(tw.imag))
        else:
            tabs = (itabs,)
    else:
        # complex pre-twiddled positive-exponent DFT of length 2n
        istatic, itabs = _dft.dft_plan(m)
        if type_ == 3:
            off = 0 if kind == 'dct' else 1
            pre = np.exp(1j * np.pi * (k + off).astype(np.float64)
                         / (2 * n))
            tabs = (itabs, _f32(pre.real), _f32(pre.imag))
        else:
            pre = np.exp(1j * np.pi * (2 * k + 1).astype(np.float64)
                         / (4 * n))
            post = np.exp(1j * np.pi * k.astype(np.float64) / (2 * n))
            tabs = (itabs, _f32(pre.real), _f32(pre.imag),
                    _f32(post.real), _f32(post.imag))
    entry = ((kind, type_, n, istatic), tabs)
    _dft._cache_put(key, entry)
    return entry


def _trig_rows(x: jax.Array, tabs: Any, static: Tuple) -> jax.Array:
    """(B, n) real rows -> (B, n) unnormalized scipy 'backward' DCT/DST
    (trace-time building block; callers jit)."""
    kind, type_, n, istatic = static
    if type_ == 1:
        (itabs,) = tabs
        if kind == 'dct':
            # even extension [x, x[n-2:0:-1]] of length 2(n-1)
            ext = jnp.concatenate([x, x[:, -2:0:-1]], axis=1)
            fr, _ = _dft.rdft_rows(ext, itabs, istatic)
            return fr[:, :n]
        # odd extension [0, x, 0, -rev(x)] of length 2(n+1)
        z = jnp.zeros_like(x[:, :1])
        ext = jnp.concatenate([z, x, z, -x[:, ::-1]], axis=1)
        _, fi = _dft.rdft_rows(ext, itabs, istatic)
        return -fi[:, 1:n + 1]
    if type_ == 2:
        itabs, twr, twi = tabs
        if kind == 'dct':
            ext = jnp.concatenate([x, x[:, ::-1]], axis=1)
            fr, fi = _dft.rdft_rows(ext, itabs, istatic)
            return fr[:, :n] * twr - fi[:, :n] * twi
        ext = jnp.concatenate([x, -x[:, ::-1]], axis=1)
        fr, fi = _dft.rdft_rows(ext, itabs, istatic)
        # y = -Im(tw * F[k+1])
        return -(fr[:, 1:n + 1] * twi + fi[:, 1:n + 1] * twr)
    m = 2 * n
    if type_ == 3:
        itabs, pr, pi = tabs
        cr, ci = x * pr, x * pi
        if kind == 'dst':
            # the twiddled sequence lives at positions 1..n of the
            # length-2n input (m - n - 1 zeros after it; m = 2n > n)
            z = jnp.zeros_like(x[:, :1])
            pad = ((0, 0), (0, m - n - 1))
            cr = jnp.pad(jnp.concatenate([z, cr], axis=1), pad)
            ci = jnp.pad(jnp.concatenate([z, ci], axis=1), pad)
        else:
            pad = ((0, 0), (0, m - n))
            cr, ci = jnp.pad(cr, pad), jnp.pad(ci, pad)
        sr, si = _dft.dft_rows(cr, ci, itabs, istatic, inverse=True)
        sr, si = sr * np.float32(m), si * np.float32(m)
        if kind == 'dct':
            return 2.0 * sr[:, :n] - x[:, :1]
        sgn = (1 - 2 * (jnp.arange(n) % 2)).astype(x.dtype)
        return 2.0 * si[:, :n] - sgn * x[:, n - 1:n]
    itabs, pr, pi, qr, qi = tabs
    pad = ((0, 0), (0, m - n))
    cr = jnp.pad(x * pr, pad)
    ci = jnp.pad(x * pi, pad)
    sr, si = _dft.dft_rows(cr, ci, itabs, istatic, inverse=True)
    sr, si = sr[:, :n] * np.float32(m), si[:, :n] * np.float32(m)
    if kind == 'dct':
        return 2.0 * (qr * sr - qi * si)
    return 2.0 * (qr * si + qi * sr)


@partial(jax.jit, static_argnames=('static', 'meta'))
def _trig_prog(x, tabs, static, meta):
    """One fused program: fit-to-n, orthogonalize input factor, the
    transform, orthogonalize output factor, norm scale."""
    n, axis, scale, ortho = meta
    kind, type_, _, _ = static
    x, lead = _rows(x, axis, n)
    r2 = np.float32(math.sqrt(2.0))
    if ortho:
        # input-side boundary factors (scipy ``orthogonalize``):
        # DCT-I: x[0], x[-1] *= sqrt2; DCT-III: x[0] *= sqrt2;
        # DST-III: x[-1] *= sqrt2
        if kind == 'dct' and type_ == 1:
            x = x.at[:, 0].mul(r2)
            x = x.at[:, -1].mul(r2)
        elif type_ == 3:
            j = 0 if kind == 'dct' else n - 1
            x = x.at[:, j].mul(r2)
    y = _trig_rows(x, tabs, static)
    if ortho:
        # output-side: DCT-I: y[0], y[-1] /= sqrt2; DCT-II: y[0] /=
        # sqrt2; DST-II: y[-1] /= sqrt2
        ir2 = np.float32(1.0 / math.sqrt(2.0))
        if kind == 'dct' and type_ == 1:
            y = y.at[:, 0].mul(ir2)
            y = y.at[:, -1].mul(ir2)
        elif type_ == 2:
            j = 0 if kind == 'dct' else n - 1
            y = y.at[:, j].mul(ir2)
    if scale != 1.0:
        y = y * np.float32(scale)
    return _unrows(y, lead, axis)


def _trig_scale(kind: str, type_: int, n: int, norm: Optional[str],
                inverse: bool, who: str) -> float:
    if norm is None:
        norm = 'backward'
    if norm not in _NORMS:
        raise RuntimeError(f"{who}: invalid norm {norm!r} (use "
                           "'backward', 'ortho' or 'forward')")
    m = _logical_len(kind, type_, n)
    if norm == 'ortho':
        return 1.0 / math.sqrt(m)
    forward_scaled = (norm == 'forward') != inverse
    return 1.0 / m if forward_scaled else 1.0


_INV_TYPE = {1: 1, 2: 3, 3: 2, 4: 4}


def _trig_1d(x, kind, type_, n, axis, norm, orthogonalize, inverse,
             who) -> Tensor:
    type_ = int(type_)
    x = _as_tensor(x)
    ax = _resolve_axis(x.n_dim, axis, who)
    nn = x.shape[ax] if n is None else int(n)
    eff_type = _INV_TYPE[type_] if inverse else type_
    if orthogonalize is None:
        orthogonalize = (norm == 'ortho')
    scale = _trig_scale(kind, eff_type, nn, norm, inverse, who)
    static, tabs = _trig_plan(kind, eff_type, nn)
    meta = (nn, ax, scale, bool(orthogonalize))
    xr, xi = _planes_of(x)
    with tracing.trace_op(who, 'op;transforms', tracing.tensor_args(x=x)):
        yr = _trig_prog(xr, tabs, static, meta)
        if xi is not None:
            yi = _trig_prog(xi, tabs, static, meta)
            return _wrap_planar(yr, yi)
    return _finish(yr, None)


def dct(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
        norm: Optional[str] = None,
        orthogonalize: Optional[bool] = None) -> Tensor:
    """Discrete cosine transform, types I-IV (scipy.fft.dct
    semantics incl. norm and orthogonalize)."""
    return _trig_1d(x, 'dct', type, n, axis, norm, orthogonalize,
                    inverse=False, who='tf.dct')


def idct(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None,
         orthogonalize: Optional[bool] = None) -> Tensor:
    """Inverse DCT: the type-(1,3,2,4) transform with the backward
    1/M scale (scipy.fft.idct semantics)."""
    return _trig_1d(x, 'dct', type, n, axis, norm, orthogonalize,
                    inverse=True, who='tf.idct')


def dst(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
        norm: Optional[str] = None,
        orthogonalize: Optional[bool] = None) -> Tensor:
    """Discrete sine transform, types I-IV (scipy.fft.dst semantics)."""
    return _trig_1d(x, 'dst', type, n, axis, norm, orthogonalize,
                    inverse=False, who='tf.dst')


def idst(x, type: int = 2, n: Optional[int] = None, axis: int = -1,
         norm: Optional[str] = None,
         orthogonalize: Optional[bool] = None) -> Tensor:
    """Inverse DST (scipy.fft.idst semantics)."""
    return _trig_1d(x, 'dst', type, n, axis, norm, orthogonalize,
                    inverse=True, who='tf.idst')


def _trig_nd(x, kind, type_, s, axes, norm, orthogonalize, inverse,
             who) -> Tensor:
    x = _as_tensor(x)
    s_r, axes_r = _resolve_axes(x.n_dim, s, axes, who)
    fn = {('dct', False): dct, ('dct', True): idct,
          ('dst', False): dst, ('dst', True): idst}[(kind, inverse)]
    y = x
    for i, ax in enumerate(axes_r):
        nn = s_r[i] if s_r is not None else None
        y = fn(y, type=type_, n=nn, axis=ax, norm=norm,
               orthogonalize=orthogonalize)
    return y


def dctn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None,
         orthogonalize: Optional[bool] = None) -> Tensor:
    """n-D DCT over ``axes`` (scipy.fft.dctn semantics)."""
    return _trig_nd(x, 'dct', type, s, axes, norm, orthogonalize,
                    inverse=False, who='tf.dctn')


def idctn(x, type: int = 2, s=None, axes=None,
          norm: Optional[str] = None,
          orthogonalize: Optional[bool] = None) -> Tensor:
    """n-D inverse DCT (scipy.fft.idctn semantics)."""
    return _trig_nd(x, 'dct', type, s, axes, norm, orthogonalize,
                    inverse=True, who='tf.idctn')


def dstn(x, type: int = 2, s=None, axes=None, norm: Optional[str] = None,
         orthogonalize: Optional[bool] = None) -> Tensor:
    """n-D DST over ``axes`` (scipy.fft.dstn semantics)."""
    return _trig_nd(x, 'dst', type, s, axes, norm, orthogonalize,
                    inverse=False, who='tf.dstn')


def idstn(x, type: int = 2, s=None, axes=None,
          norm: Optional[str] = None,
          orthogonalize: Optional[bool] = None) -> Tensor:
    """n-D inverse DST (scipy.fft.idstn semantics)."""
    return _trig_nd(x, 'dst', type, s, axes, norm, orthogonalize,
                    inverse=True, who='tf.idstn')
