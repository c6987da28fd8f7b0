"""Today's-conditions HBM ceiling: chain-instrument a pure streamed copy
(1R+1W, the kernel's best case) against the fma (2R+1W) round-robin.
If copy reads ~X GB/s, the fma's achievable bound under the same HBM
tenancy is ~X (same aggregate traffic rate), and the gap fma shows vs
its 819-GB/s-peak target is drift, not kernel inefficiency."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from dsc_tpu.ops import kernels, pallas_map  # noqa: E402

K = 4
NE = 2**26


def drain(t):
    if isinstance(t, (tuple, list)):
        t = t[0]
    np.asarray(t.ravel()[:1])


def marginal(step, state, m=3, reps=5):
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

    @jax.jit
    def copy_chain(v):
        for _ in range(K):
            v = pallas_map.stream_map(lambda x: x + 1.0, v)
        return v

    @jax.jit
    def fma_chain(c):
        v, w = c
        for _ in range(K):
            v = kernels.add(v, w, np.float32)
        return v, w

    drain(copy_chain(a))
    drain(fma_chain((a, b)))
    for rnd in range(4):
        tc = marginal(copy_chain, a) / K
        tf = marginal(fma_chain, (a, b)) / K
        print(f'round {rnd}: copy {tc*1e3:7.3f} ms {2*NE*4/tc/1e9:6.1f} GB/s'
              f' | fma {tf*1e3:7.3f} ms {3*NE*4/tf/1e9:6.1f} GB/s',
              flush=True)


if __name__ == '__main__':
    main()
