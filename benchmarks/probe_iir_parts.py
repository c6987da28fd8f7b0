"""On-chip micro-profile of the plan-based _linrec_scalar (models/iir.py).

Round 4 history: the first Toeplitz implementation built its weight
matrices IN-JIT via a (256, 256[, m, m]) gather — measured here at ~7 ms
at 2^22 for every variant (the gather dominated; the matmul itself is
~0.1 ms). The plan now comes from host numpy. Each variant is a jitted
straight-line chain of 4 dependent calls; variants round-robin in one
process. Run on the real TPU.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsc_tpu.models.iir import (  # noqa: E402
    _linrec_apply_vec,
    _linrec_plan,
    _linrec_scalar,
)

hp = jax.lax.Precision.HIGHEST


def make_variants(plan):
    def full(x, zi):
        y, zf = _linrec_scalar(x, plan, jnp.float32(0.5), zi, hp)
        return y

    def matmul_only(x, zi):
        Wmat = plan[0][0]
        bsz, n = x.shape
        M = Wmat.shape[0]
        K = n // M
        out = jnp.matmul(x.reshape(bsz * K, M), Wmat, precision=hp)
        return out.reshape(bsz, -1)[:, :n]

    def no_recursion(x, zi):
        Wmat, C, _, _ = plan[0]
        bsz, n = x.shape
        m = C.shape[1]
        M = Wmat.shape[0]
        K = n // M
        out = jnp.matmul(x.reshape(bsz * K, M), Wmat, precision=hp)
        out = out.reshape(bsz, K, M + m)
        s0_loc = out[..., :M]
        e_pre = jnp.zeros((bsz, K, m), x.dtype)
        corr0 = jnp.einsum('je,bke->bkj', C, e_pre, precision=hp)
        y = (0.5 * x.reshape(bsz, K, M) + s0_loc + corr0)
        return y.reshape(bsz, n)

    def recursion_only(x, zi):
        bsz, n = x.shape
        M = plan[0][0].shape[0]
        K = n // M
        L = x.reshape(bsz, K, M)[..., :2] * 0.01
        e_pre, e_T = _linrec_apply_vec(L, plan[1:], zi, hp)
        return e_pre

    return [('full', full), ('matmul_only', matmul_only),
            ('no_recursion', no_recursion),
            ('recursion_only', recursion_only)]


def bench(fn, x, zi, reps=3):
    @jax.jit
    def chain(x):
        s = x
        for _ in range(4):
            out = fn(s, zi)
            s = s + out.ravel()[0] * 1e-20  # dependent, shape-preserving
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
    A = np.array([[1.43, 1.0], [-0.57, 0.0]], np.float64) * 0.6
    c = np.array([0.1, 0.05], np.float64)
    for bsz, n in ((1, 2**22),):
        plan = _linrec_plan(A, c, n)
        variants = make_variants(plan)
        x = jnp.asarray(rng.standard_normal((bsz, n)).astype(np.float32))
        zi = jnp.zeros((bsz, 2), jnp.float32)
        rows = {k: 1e9 for k, _ in variants}
        for rep in range(3):
            for name, fn in variants:
                rows[name] = min(rows[name], bench(fn, x, zi))
        print(f'config {bsz}x2^{int(np.log2(n))}:')
        for name, _ in variants:
            print(f'  {name:16s}: {rows[name]*1e3:8.3f} ms')


if __name__ == '__main__':
    main()
