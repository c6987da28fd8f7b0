"""On-chip micro-profile of _linrec_scalar's pieces (models/iir.py).

Each variant is a jitted straight-line chain of 4 dependent calls
(feedback through y so the runtime cannot cache); variants round-robin
in one process. Run on the real TPU.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsc_tpu.models.iir import _apow_chain, _linrec_scalar, _linrec_vec  # noqa: E402

hp = jax.lax.Precision.HIGHEST
M = 256


def variant_full(x, A, c, zi):
    y, zf = _linrec_scalar(x, A, c, jnp.float32(0.5), zi, hp)
    return y


def variant_matmul_only(x, A, c, zi):
    bsz, n = x.shape
    K = n // M
    P = _apow_chain(A, M, hp)
    v = jnp.einsum('pde,e->pd', P, c, precision=hp)
    ii = jnp.arange(M)
    expo = ii[None, :] - ii[:, None] - 1
    W0 = jnp.where(expo >= 0, v[jnp.clip(expo, 0, M), 0], 0.0)
    WL = v[M - 1 - ii]
    Wmat = jnp.concatenate([W0, WL], axis=1)
    out = jnp.matmul(x.reshape(bsz * K, M), Wmat, precision=hp)
    return out.reshape(bsz, -1)[:, :n]


def variant_matmul_default_prec(x, A, c, zi):
    bsz, n = x.shape
    K = n // M
    P = _apow_chain(A, M, hp)
    v = jnp.einsum('pde,e->pd', P, c, precision=hp)
    ii = jnp.arange(M)
    expo = ii[None, :] - ii[:, None] - 1
    W0 = jnp.where(expo >= 0, v[jnp.clip(expo, 0, M), 0], 0.0)
    WL = v[M - 1 - ii]
    Wmat = jnp.concatenate([W0, WL], axis=1)
    out = jnp.matmul(x.reshape(bsz * K, M), Wmat)
    return out.reshape(bsz, -1)[:, :n]


def variant_no_recursion(x, A, c, zi):
    bsz, n = x.shape
    K = n // M
    P = _apow_chain(A, M, hp)
    v = jnp.einsum('pde,e->pd', P, c, precision=hp)
    ii = jnp.arange(M)
    expo = ii[None, :] - ii[:, None] - 1
    W0 = jnp.where(expo >= 0, v[jnp.clip(expo, 0, M), 0], 0.0)
    WL = v[M - 1 - ii]
    Wmat = jnp.concatenate([W0, WL], axis=1)
    out = jnp.matmul(x.reshape(bsz * K, M), Wmat, precision=hp)
    out = out.reshape(bsz, K, M + 2)
    s0_loc, L = out[..., :M], out[..., M:]
    e_pre = jnp.zeros((bsz, K, 2), x.dtype)  # recursion stubbed
    corr0 = jnp.einsum('je,bke->bkj', P[:M, 0, :], e_pre, precision=hp)
    xc = x.reshape(bsz, K, M)
    y = (0.5 * xc + s0_loc + corr0).reshape(bsz, K * M)
    return y


def variant_recursion_only(x, A, c, zi):
    bsz, n = x.shape
    K = n // M
    L = x.reshape(bsz, K, M)[..., :2] * 0.01
    e_pre, e_T = _linrec_vec(L, A, zi, hp)
    return e_pre.reshape(bsz, -1)


def bench(fn, x, A, c, zi, reps=3):
    @jax.jit
    def chain(x):
        s = x
        for _ in range(4):
            s = fn(s, A, c, zi) * 1e-3  # keep bounded
        return s

    y = chain(x)
    np.asarray(y.ravel()[:1])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chain(x)
        np.asarray(y.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / 4


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(np.array([[1.43, 1.0], [-0.57, 0.0]], np.float32) * 0.6)
    c = jnp.asarray(np.array([0.1, 0.05], np.float32))
    variants = [
        ('full', variant_full),
        ('matmul_only', variant_matmul_only),
        ('matmul_defprec', variant_matmul_default_prec),
        ('no_recursion', variant_no_recursion),
        ('recursion_only', variant_recursion_only),
    ]
    for bsz, n in ((1, 2**22),):
        x = jnp.asarray(rng.standard_normal((bsz, n)).astype(np.float32))
        zi = jnp.zeros((bsz, 2), jnp.float32)
        rows = {k: 1e9 for k, _ in variants}
        for rep in range(3):
            for name, fn in variants:
                rows[name] = min(rows[name], bench(fn, x, A, c, zi))
        print(f'config {bsz}x2^{int(np.log2(n))}:')
        for name, _ in variants:
            print(f'  {name:16s}: {rows[name]*1e3:8.3f} ms')


if __name__ == '__main__':
    main()
