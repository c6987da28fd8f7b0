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
