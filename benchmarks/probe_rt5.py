"""Round-5 headline instrument: jit-chained rfft/irfft pair time at 2^24
via the half-T streaming engines (the exact chain bench.py --chain
times), plus accuracy of the chained roundtrip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from dsc_tpu.fourier import core as fft_core  # noqa: E402
from dsc_tpu.fourier import pallas_stream as fft_ps  # noqa: E402

K = 4
N = 2**24


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
    x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    n1, n2 = fft_ps.factors(N)
    print(f'# factors: {n1} x {n2}', flush=True)

    def rt_step(v):
        hr, hi = fft_core.rfft_stream_half_t(v, n1, n2)
        return fft_core.irfft_stream_from_half_t(hr, hi, n1, n2)

    @jax.jit
    def rt_chain(v):
        for _ in range(K):
            v = rt_step(v)
        return v

    t0 = time.time()
    y = rt_chain(x)
    drain(y)
    print(f'# compiled in {time.time()-t0:.0f}s', flush=True)
    # chained-roundtrip accuracy: K passes of rfft+irfft
    err = float(jnp.abs(y - x).max())
    print(f'# {K}x roundtrip max abs err: {err:.3e}', flush=True)

    flops_pair = 2 * 2.5 * N * 24
    for rnd in range(4):
        tp = marginal(rt_chain, x) / K
        print(f'round {rnd}: pair {tp*1e3:7.3f} ms  '
              f'{flops_pair/tp/1e9/2:7.1f} GFLOP/s per transform', flush=True)


if __name__ == '__main__':
    main()
