"""On-chip A/B: broadcast-row replication strategies in pallas_map vs
the same-shape baseline, round-robin at 256 MiB.

Each variant is traced ONCE inside a jax.jit wrapper (the production
path, kernels._binary, jits around stream_map so tracing is cached);
timing is the eager pipelined-dispatch marginal (t(2K)-t(K))/K ended
with a 1-element drain (benchmarks/PERF.md methodology).

Usage: python -u benchmarks/probe_brow.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import dsc_tpu.ops.pallas_map as pm  # noqa: E402

K = 8
REPS = 5
IMPLS = ('vrep', 'b3d', 'bcast', 'repeat')


def _drain(a):
    np.asarray(jax.device_get(a.ravel()[:1]))


def main():
    rng = np.random.default_rng(0)
    ne = 2**26
    rows, cols = ne // 4096, 4096
    x = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((1, cols)), jnp.float32)
    _drain(x)

    def mk(kind):
        @jax.jit
        def f(a, b):
            return pm.stream_map(jnp.add, a, b)
        return f

    live = {}
    for name in ('same',) + IMPLS:
        fn = mk(name)
        args = (x, y) if name == 'same' else (x, r)
        pm.BROW_IMPL = name  # read at trace time (first call)
        t0 = time.time()
        try:
            got = np.asarray(fn(*args))
            want = np.asarray(x) + np.asarray(args[1])
            err = np.abs(got - want).max()
            print(f'{name}: err {err:.2e} (compile+run {time.time()-t0:.0f}s)',
                  flush=True)
            if err < 1e-5:
                live[name] = (fn, args)
        except Exception as e:  # noqa: BLE001
            print(f'{name}: FAILED {str(e)[:200]}', flush=True)

    def marginal(fn, args):
        def t(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(*args)
            _drain(o)
            return time.perf_counter() - t0
        t(K)
        t1, t2 = t(K), t(2 * K)
        return (t2 - t1) / K

    samples = {n: [] for n in live}
    for rep in range(REPS):
        for name, (fn, args) in live.items():
            samples[name].append(marginal(fn, args))
        print(f'rep {rep}: ' + '  '.join(
            f'{k}={v[-1]*1e3:.2f}ms' for k, v in samples.items()),
            flush=True)
    print('--- medians (3*ne*4 bytes nominal) ---', flush=True)
    for name, v in samples.items():
        med = sorted(v)[len(v) // 2]
        print(f'{name:>7}: {med*1e3:6.2f} ms  {3*ne*4/med/1e9:6.1f} GB/s',
              flush=True)


if __name__ == '__main__':
    main()
