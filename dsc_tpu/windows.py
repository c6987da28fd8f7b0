"""Window functions (hanning/hamming/blackman/kaiser).

The reference has no window module — its README filterFFT example reaches
for ``np.blackman`` directly (reference README.md:110-137) and the STFT
models here previously did the same host-side. These generators produce
the windows as dsc Tensors computed ON DEVICE in one jitted program each,
matching ``np.hanning/np.hamming/np.blackman/np.kaiser`` bit-for-bit at
f64 and to f32 rounding otherwise. ``kaiser`` rides the same Bessel-I0
kernel as the public ``dsc.i0`` op (reference dsc.cpp:1624-1721 is the
polynomial analog).

All four follow NumPy's symmetric convention: ``n == 1`` returns ``[1.0]``
and the generic formula uses ``n - 1`` in the denominator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import tracing
from .dtype import DTYPE_TO_NP, Dtype
from .ops import kernels as K
from .tensor import Tensor, _creation_ctx


@partial(jax.jit, static_argnames=('kind', 'n', 'dtype'))
def _cosine_window(*, kind, n, dtype):
    # a0 - a1*cos(2*pi*k/(n-1)) + a2*cos(4*pi*k/(n-1)); angles computed in
    # f64 (x64 mode is globally on) then cast, so f32 windows carry only
    # the final rounding step.
    a0, a1, a2 = {
        'hanning': (0.5, 0.5, 0.0),
        'hamming': (0.54, 0.46, 0.0),
        'blackman': (0.42, 0.5, 0.08),
    }[kind]
    k = jnp.arange(n, dtype=jnp.float64)
    th = 2.0 * jnp.pi * k / (n - 1)
    w = a0 - a1 * jnp.cos(th) + a2 * jnp.cos(2.0 * th)
    return w.astype(dtype)


@partial(jax.jit, static_argnames=('n', 'dtype'))
def _kaiser_window(beta, *, n, dtype):
    k = jnp.arange(n, dtype=jnp.float64)
    r = 2.0 * k / (n - 1) - 1.0
    arg = beta * jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
    w = K.i0(arg) / K.i0(beta)
    return w.astype(dtype)


def _window(kind: str, n: int, dtype: Dtype, beta=None) -> Tensor:
    if Dtype(dtype).is_complex:
        raise RuntimeError(f'{kind} window requires a real dtype, got {dtype}')
    np_dt = DTYPE_TO_NP[Dtype(dtype)]
    args = {'n': n} if beta is None else {'n': n, 'beta': beta}
    with tracing.trace_op(kind, 'op;creation', args) as tr:
        with _creation_ctx(Dtype(dtype)):
            if n < 1:
                res = jnp.zeros((0,), np_dt)
            elif n == 1:
                res = jnp.ones((1,), np_dt)
            elif beta is None:
                res = _cosine_window(kind=kind, n=n, dtype=np_dt)
            else:
                res = _kaiser_window(jnp.float64(beta), n=n, dtype=np_dt)
        if tr:
            tr.result = res
    return Tensor._from_jax(res)


def hanning(n: int, dtype: Dtype = Dtype.F32) -> Tensor:
    """Hann window of length n (np.hanning semantics)."""
    return _window('hanning', n, dtype)


def hamming(n: int, dtype: Dtype = Dtype.F32) -> Tensor:
    """Hamming window of length n (np.hamming semantics)."""
    return _window('hamming', n, dtype)


def blackman(n: int, dtype: Dtype = Dtype.F32) -> Tensor:
    """Blackman window of length n (np.blackman semantics)."""
    return _window('blackman', n, dtype)


def kaiser(n: int, beta: float, dtype: Dtype = Dtype.F32) -> Tensor:
    """Kaiser window of length n with shape parameter beta (np.kaiser
    semantics), computed through the same Bessel-I0 kernel as dsc.i0."""
    return _window('kaiser', n, dtype, beta=float(beta))


@partial(jax.jit, static_argnames=('n', 'dtype'))
def _bartlett_window(*, n, dtype):
    k = jnp.arange(n, dtype=jnp.float64)
    w = 1.0 - jnp.abs(2.0 * k / (n - 1) - 1.0)
    return w.astype(dtype)


@partial(jax.jit, static_argnames=('n', 'dtype'))
def _tukey_window(alpha, *, n, dtype):
    k = jnp.arange(n, dtype=jnp.float64)
    edge = alpha * (n - 1) / 2.0
    # symmetric tapered-cosine: cosine ramps over the first/last
    # alpha/2 fraction, flat top between (scipy.signal.windows.tukey)
    left = 0.5 * (1.0 + jnp.cos(jnp.pi * (k / jnp.maximum(edge, 1e-300) - 1.0)))
    right = 0.5 * (1.0 + jnp.cos(
        jnp.pi * ((k - (n - 1 - edge)) / jnp.maximum(edge, 1e-300))
    ))
    w = jnp.where(k < edge, left, jnp.where(k > n - 1 - edge, right, 1.0))
    return w.astype(dtype)


def bartlett(n: int, dtype: Dtype = Dtype.F32) -> Tensor:
    """Bartlett (triangular) window of length n (np.bartlett semantics)."""
    if Dtype(dtype).is_complex:
        raise RuntimeError(f'bartlett window requires a real dtype, got {dtype}')
    np_dt = DTYPE_TO_NP[Dtype(dtype)]
    with tracing.trace_op('bartlett', 'op;creation', {'n': n}) as tr:
        with _creation_ctx(Dtype(dtype)):
            if n < 1:
                res = jnp.zeros((0,), np_dt)
            elif n == 1:
                res = jnp.ones((1,), np_dt)
            else:
                res = _bartlett_window(n=n, dtype=np_dt)
        if tr:
            tr.result = res
    return Tensor._from_jax(res)


def tukey(n: int, alpha: float = 0.5, dtype: Dtype = Dtype.F32) -> Tensor:
    """Tukey (tapered-cosine) window (scipy.signal.windows.tukey
    symmetric semantics): ``alpha=0`` is rectangular, ``alpha=1`` is
    Hann."""
    if not 0.0 <= alpha <= 1.0:
        raise RuntimeError(f'tukey: alpha ({alpha}) must be in [0, 1]')
    if Dtype(dtype).is_complex:
        raise RuntimeError(f'tukey window requires a real dtype, got {dtype}')
    np_dt = DTYPE_TO_NP[Dtype(dtype)]
    with tracing.trace_op('tukey', 'op;creation',
                          {'n': n, 'alpha': alpha}) as tr:
        with _creation_ctx(Dtype(dtype)):
            if n < 1:
                res = jnp.zeros((0,), np_dt)
            elif n == 1 or alpha == 0.0:
                res = jnp.ones((max(n, 0),), np_dt)
            else:
                res = _tukey_window(jnp.float64(alpha), n=n, dtype=np_dt)
        if tr:
            tr.result = res
    return Tensor._from_jax(res)
