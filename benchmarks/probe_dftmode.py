"""Same-process round-robin A/B of DFT stage-table modes on the headline
rt chain (rfft+irfft pair at 2^24). Modes are read at trace time from
three modules' globals; set all of them per chain build."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from dsc_tpu.fourier import core as fft_core  # noqa: E402
from dsc_tpu.fourier import packed_fused as pf  # noqa: E402
from dsc_tpu.fourier import pallas_stream as ps  # noqa: E402
from dsc_tpu.fourier import pallas_stream_t as pst  # noqa: E402

K = 4
N = 2**24
MODES = ['bf16', 'pair']


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


def set_mode(mode):
    ps.DFT_MODE = mode
    pst.DFT_MODE = mode
    pf.DFT_MODE = mode


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
    n1, n2 = ps.factors(N)

    def rt_step(v):
        hr, hi = fft_core.rfft_stream_half_t(v, n1, n2)
        return fft_core.irfft_stream_from_half_t(hr, hi, n1, n2)

    chains = {}
    for mode in MODES:
        set_mode(mode)

        @jax.jit
        def rt_chain(v):
            for _ in range(K):
                v = rt_step(v)
            return v

        t0 = time.time()
        drain(rt_chain(x))
        print(f'# {mode} compiled in {time.time()-t0:.0f}s', flush=True)
        chains[mode] = rt_chain

    res = {m: [] for m in MODES}
    for rnd in range(4):
        for mode in MODES:
            tp = marginal(chains[mode], x) / K
            res[mode].append(tp)
            print(f'round {rnd} {mode}: pair {tp*1e3:7.3f} ms '
                  f'({2*2.5*N*24/tp/1e9:7.1f} GFLOP/s headline)', flush=True)
    print('--- medians ---')
    for mode in MODES:
        ts = sorted(res[mode])
        tp = ts[len(ts) // 2]
        print(f'{mode}: {tp*1e3:7.3f} ms  {2*2.5*N*24/tp/1e9:7.1f} GFLOP/s')


if __name__ == '__main__':
    main()
