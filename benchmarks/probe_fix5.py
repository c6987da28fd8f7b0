"""Post-fix validation: the eqn-count-reserved kernel configs compile and
perform. Chain-instrument timings for fma (defaults -> D3/C16384) and the
Cody-Waite sin (rows auto-shrunk to 4096)."""
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

    # accuracy first: streamed sin vs np.sin on a slice
    t0 = time.time()
    y = kernels.sin(a)
    drain(y)
    print(f'# sin compiled+ran in {time.time()-t0:.0f}s', flush=True)
    ys = np.asarray(y[:2**20])
    ref = np.sin(np.asarray(a[:2**20], np.float64))
    print(f'# sin max abs err: {np.abs(ys - ref).max():.3e}', flush=True)

    @jax.jit
    def sin_chain(v):
        for _ in range(K):
            v = kernels.sin(v)
        return v

    @jax.jit
    def fma_chain(c):
        v, w = c
        for _ in range(K):
            v = kernels.add(v, w, np.float32)
        return v, w

    t0 = time.time()
    drain(sin_chain(a))
    drain(fma_chain((a, b)))
    print(f'# chains compiled in {time.time()-t0:.0f}s', flush=True)

    for rnd in range(3):
        ts = marginal(sin_chain, a) / K
        tf = marginal(fma_chain, (a, b)) / K
        print(f'round {rnd}: sin {ts*1e3:7.3f} ms {2*NE*4/ts/1e9:6.1f} GB/s'
              f' | fma {tf*1e3:7.3f} ms {3*NE*4/tf/1e9:6.1f} GB/s',
              flush=True)


if __name__ == '__main__':
    main()
