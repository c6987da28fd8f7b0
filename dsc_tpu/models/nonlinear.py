"""Sliding-window nonlinear/adaptive filters: ``medfilt``, ``wiener``.

scipy.signal semantics (1-D, optionally batched). Both are
shift-and-stack formulations — the k window taps become k shifted
full-length slices (pure layout data movement XLA fuses), so the median
reduces over a small leading axis and the Wiener local moments are two
running sums; no gather, no serial loop.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracing
from ..tensor import Tensor


def _check_1d2d(x: Tensor, who: str):
    if x.n_dim > 2:
        raise RuntimeError(f'{who}: expected a 1-D or 2-D signal, got {x.n_dim}-D')
    if x.dtype.is_complex:
        raise RuntimeError(f'{who} expects a real signal')
    return x.n_dim == 2


def _shift_stack(xp, k: int, n: int):
    """(b, n + k - 1) zero-padded signal -> (k, b, n) shifted views."""
    return jnp.stack([xp[:, i : i + n] for i in range(k)], axis=0)


@partial(jax.jit, static_argnames=('k',))
def _medfilt_program(x, k):
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    return jnp.median(_shift_stack(xp, k, x.shape[1]), axis=0)


def medfilt(x: Tensor, kernel_size: int = 3) -> Tensor:
    """Sliding-window median filter (scipy.signal.medfilt semantics:
    zero-padded edges, odd ``kernel_size``). x: (n,) or (batch, n)."""
    if kernel_size < 1 or kernel_size % 2 == 0:
        raise RuntimeError(
            f'medfilt: kernel_size ({kernel_size}) must be odd and >= 1'
        )
    batched = _check_1d2d(x, 'medfilt')
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'medfilt', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _medfilt_program(xj, int(kernel_size))
        if tr:
            tr.result = out
    return Tensor._from_jax(out if batched else out[0])


@partial(jax.jit, static_argnames=('k', 'auto_noise'))
def _wiener_program(x, noise, k, auto_noise):
    pad = k // 2
    n = x.shape[1]
    s1 = jnp.sum(_shift_stack(jnp.pad(x, ((0, 0), (pad, pad))), k, n), axis=0)
    s2 = jnp.sum(
        _shift_stack(jnp.pad(x * x, ((0, 0), (pad, pad))), k, n), axis=0
    )
    l_mean = s1 / k
    l_var = s2 / k - l_mean * l_mean
    if auto_noise:
        noise = jnp.mean(l_var)
    res = l_mean + (1.0 - noise / jnp.maximum(l_var, 1e-30)) * (x - l_mean)
    return jnp.where(l_var < noise, l_mean, res)


def wiener(x: Tensor, mysize: int = 3,
           noise: Optional[float] = None) -> Tensor:
    """Adaptive Wiener filter (scipy.signal.wiener 1-D semantics):
    local mean/variance over a ``mysize`` window (zero-padded edges),
    noise power estimated as the mean local variance when not given.
    x: (n,) or (batch, n)."""
    if mysize < 1 or mysize % 2 == 0:
        raise RuntimeError(
            f'wiener: mysize ({mysize}) must be odd and >= 1'
        )
    batched = _check_1d2d(x, 'wiener')
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'wiener', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _wiener_program(
            xj, np.float32(0.0 if noise is None else noise), int(mysize),
            noise is None,
        )
        if tr:
            tr.result = out
    return Tensor._from_jax(out if batched else out[0])


def _shift_stack_2d(xp, k1: int, k2: int, m: int, n: int):
    """(m + k1 - 1, n + k2 - 1) padded image -> (k1*k2, m, n) shifted
    views (pure layout slices, no gather)."""
    return jnp.stack([
        xp[i:i + m, j:j + n]
        for i in range(k1) for j in range(k2)
    ], axis=0)


@partial(jax.jit, static_argnames=('k1', 'k2'))
def _medfilt2d_program(x, k1, k2):
    p1, p2 = k1 // 2, k2 // 2
    xp = jnp.pad(x, ((p1, p1), (p2, p2)))
    return jnp.median(_shift_stack_2d(xp, k1, k2, x.shape[0], x.shape[1]),
                      axis=0)


def medfilt2d(x: Tensor, kernel_size=3) -> Tensor:
    """2-D median filter (scipy.signal.medfilt2d semantics: zero-padded
    edges, odd kernel sides). x: (m, n) real; ``kernel_size`` a scalar
    or (k1, k2). The k1*k2 window taps become shifted full-image slices
    and the median reduces over the small leading axis — one fused XLA
    program, no gathers."""
    if x.n_dim != 2:
        raise RuntimeError(f'medfilt2d: expected a 2-D image, got {x.n_dim}-D')
    if x.dtype.is_complex:
        raise RuntimeError('medfilt2d expects a real image')
    ks = (int(kernel_size), int(kernel_size)) \
        if np.isscalar(kernel_size) else tuple(int(k) for k in kernel_size)
    if len(ks) != 2 or any(k < 1 or k % 2 == 0 for k in ks):
        raise RuntimeError(
            f'medfilt2d: kernel_size ({kernel_size}) must be odd and >= 1')
    with tracing.trace_op(
        'medfilt2d', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _medfilt2d_program(x.jax, ks[0], ks[1])
        if tr:
            tr.result = out
    return Tensor._from_jax(out)


@partial(jax.jit, static_argnames=('offsets', 'rank', 'shape'))
def _order_filter_program(x, offsets, rank, shape):
    if len(shape) == 1:
        (k,) = shape
        pad = k // 2
        xp = jnp.pad(x, (pad, pad))
        stack = jnp.stack([xp[i:i + x.shape[0]] for (i,) in offsets],
                          axis=0)
    else:
        k1, k2 = shape
        xp = jnp.pad(x, ((k1 // 2, k1 // 2), (k2 // 2, k2 // 2)))
        stack = jnp.stack([
            xp[i:i + x.shape[0], j:j + x.shape[1]] for i, j in offsets
        ], axis=0)
    return jnp.sort(stack, axis=0)[rank]


def order_filter(x: Tensor, domain, rank: int) -> Tensor:
    """Rank-order filter (scipy.signal.order_filter semantics): at each
    position, sort the neighbors selected by the nonzero entries of the
    odd-shaped 0/1 ``domain`` mask (zero-padded edges) and keep the
    ``rank``-th smallest. 1-D or 2-D real input; the selected taps
    become shifted slices and one in-program sort."""
    if x.dtype.is_complex:
        raise RuntimeError('order_filter expects a real signal')
    dom = np.asarray(domain)
    if x.n_dim != dom.ndim or x.n_dim not in (1, 2):
        raise RuntimeError(
            f'order_filter: input is {x.n_dim}-D but domain is '
            f'{dom.ndim}-D (1-D and 2-D supported)')
    if any(s % 2 == 0 for s in dom.shape):
        raise RuntimeError('order_filter: domain sides must be odd')
    offsets = tuple(tuple(int(i) for i in idx)
                    for idx in np.argwhere(dom != 0))
    if not offsets:
        raise RuntimeError('order_filter: domain selects no samples')
    if not 0 <= rank < len(offsets):
        raise RuntimeError(
            f'order_filter: rank ({rank}) out of range for '
            f'{len(offsets)} selected samples')
    with tracing.trace_op(
        'order_filter', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _order_filter_program(x.jax, offsets, int(rank), dom.shape)
        if tr:
            tr.result = out
    return Tensor._from_jax(out)
