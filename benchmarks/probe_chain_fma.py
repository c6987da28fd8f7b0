"""A/B: eager streaming-map add vs jit-chained add at 2^26 f32.

Round-5 question: the honest-drain jit chain measured fma at 1.36 ms
(591 GB/s) while round-4's eager probe_fma sweep medianed 858 GB/s.
Same kernel (pallas_map DEPTH=8/CHUNK=4096) — is the chain composition
slower on-device, or is it cross-run drift? Interleave both estimators
round-robin in ONE process so drift hits both equally.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from dsc_tpu.ops import kernels as ops_kernels  # noqa: E402

K = 4
NE = 2**26


def drain(t):
    if isinstance(t, (tuple, list)):
        t = t[0]
    np.asarray(t.ravel()[:1])


def marginal(step, state, m=3, reps=5):
    state = step(state)
    drain(state)

    def t(k, s):
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        drain(s)
        return time.perf_counter() - t0, s

    _, state = t(m, state)
    t1s, t2s = [], []
    for _ in range(reps):
        t1, state = t(m, state)
        t2, state = t(2 * m, state)
        t1s.append(t1)
        t2s.append(t2)
    return (sorted(t2s)[len(t2s) // 2] - sorted(t1s)[len(t1s) // 2]) / m


def main():
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(ka, (NE,), jnp.float32)
    b = jax.random.normal(kb, (NE,), jnp.float32)

    def eager_step(c):
        v, w = c
        return ops_kernels.add(v, w, np.float32), w

    @jax.jit
    def chain_step(c):
        v, w = c
        for _ in range(K):
            v = ops_kernels.add(v, w, np.float32)
        return v, w

    gb = 3 * NE * 4 / 1e9
    for rnd in range(3):
        te = marginal(eager_step, (a, b), m=8)
        tc = marginal(chain_step, (a, b), m=3) / K
        print(f'round {rnd}: eager {te*1e3:7.3f} ms {gb/te:6.1f} GB/s | '
              f'chain {tc*1e3:7.3f} ms {gb/tc:6.1f} GB/s', flush=True)


if __name__ == '__main__':
    main()
