"""On-chip A/B: DFT-stage mode (g3 vs bf16) x spectrum layout (half-T vs
natural) for the 2^24 rfft/irfft pair.

Compile-light by design (slow-compile days killed the chain version):
each variant is ONE jitted single-step program; timing is the eager
pipelined-dispatch marginal (t(2k)-t(k))/k with a 1-element drain,
round-robin across variants per rep so tunnel drift cancels.

Usage: python -u benchmarks/probe_g3.py [n_log2]   (prints as it goes)
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsc_tpu.fourier import core as fc  # noqa: E402
from dsc_tpu.fourier import pallas_stream as ps  # noqa: E402

K = 4
REPS = 5


def _drain(arr):
    np.asarray(arr.ravel()[:1])


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << logn
    n1, n2 = ps.factors(n)
    print(f'n = 2^{logn}, factors {n1}x{n2}', flush=True)
    rng = np.random.default_rng(3)
    x_np = rng.standard_normal(n).astype(np.float32)
    x = jnp.asarray(x_np)
    _drain(x)

    def rt_t(mode):
        @jax.jit
        def step(v):
            from dsc_tpu.fourier import pallas_stream_t as pst
            hr, hi = pst.fourstep_to_t_p(v, None, n1, n2, half=True,
                                         mode=mode)
            yr, _ = pst.fourstep_from_t_p(hr, hi, n1, n2, half=True,
                                          real_output=True, mode=mode)
            return yr
        return step

    def rt_nat(mode):
        @jax.jit
        def step(v):
            fr, fi = ps.fourstep_stream_p(v, None, n1, n2, False,
                                          mode=mode)
            yr, _ = ps.fourstep_stream_p(fr, fi, n1, n2, True, True,
                                         mode=mode)
            return yr
        return step

    variants = {
        'half-T bf16': rt_t('bf16'),
        'nat    bf16': rt_nat('bf16'),
        'half-T g3': rt_t('g3'),
    }

    # warm + accuracy (forward compared via a roundtrip-of-known-signal:
    # the step is fwd+inv, so max|step(x) - x| bounds both directions)
    live = {}
    for name, step in variants.items():
        t0 = time.time()
        try:
            y = step(x)
            err = float(np.abs(np.asarray(y) - x_np).max())
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f'{name}: FAILED {str(e)[:200]}', flush=True)
            continue
        print(f'{name}: roundtrip abs err {err:.3e} '
              f'(compile+run {time.time()-t0:.0f}s)', flush=True)
        live[name] = step

    def marginal(step):
        def t(k):
            s = x
            t0 = time.perf_counter()
            for _ in range(k):
                s = step(s)
            _drain(s)
            return time.perf_counter() - t0
        t(K)
        t1, t2 = t(K), t(2 * K)
        return (t2 - t1) / K

    samples = {name: [] for name in live}
    for r in range(REPS):
        for name, step in live.items():
            samples[name].append(marginal(step))
        print(f'rep {r}: ' + '  '.join(
            f'{k}={v[-1]*1e3:.2f}ms' for k, v in samples.items()),
            flush=True)

    print('--- medians (ms/pair; per-transform GF/s rfft formula) ---',
          flush=True)
    for name, v in samples.items():
        med = sorted(v)[len(v) // 2]
        gfs = 2.5 * n * logn / (med / 2) / 1e9
        print(f'{name:>10}: {med*1e3:7.2f} ms/pair  {gfs:7.1f} GF/s',
              flush=True)


if __name__ == '__main__':
    main()
