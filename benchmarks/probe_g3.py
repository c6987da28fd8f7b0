"""On-chip A/B: Gauss 3-mult ('g3') vs stacked-real ('bf16') DFT stages.

Round-robin in ONE process (cross-run drift is +-30-50%, PERF.md):
rfft+irfft pair chains and cfft fwd+inv chains at 2^24, both modes,
plus accuracy of each vs np.fft.

Usage: python -u benchmarks/probe_g3.py [n_log2]
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])
sys.path.insert(0, __file__.rsplit('/', 1)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsc_tpu.fourier import pallas_stream as ps  # noqa: E402
from dsc_tpu.fourier import plan as fft_plan  # noqa: E402
from probe_stream import bench_chained_multi  # noqa: E402


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << logn
    spec = fft_plan.build_spec(n)
    n1, n2 = spec[1], spec[2]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    np.asarray(x[:1])  # establish d2h sync

    def rt_step(mode):
        def step(v):
            fr, fi = ps.fourstep_stream_p(v, None, n1, n2, False, mode=mode)
            yr, _ = ps.fourstep_stream_p(fr, fi, n1, n2, True, True,
                                         mode=mode)
            return yr
        return step

    def cf_step(mode):
        def step(c):
            fr, fi = ps.fourstep_stream_p(c[0], c[1], n1, n2, False,
                                          mode=mode)
            return ps.fourstep_stream_p(fr, fi, n1, n2, True, mode=mode)
        return step

    # accuracy first (also warms the compiles)
    ref = np.fft.rfft(np.asarray(x))
    nh = n // 2
    for mode in ('bf16', 'g3'):
        fr, fi = jax.jit(
            lambda v, m=mode: ps.fourstep_stream_p(v, None, n1, n2, False,
                                                   mode=m))(x)
        got = np.asarray(fr)[:nh + 1] + 1j * np.asarray(fi)[:nh + 1]
        err = np.abs(got - ref).max() / np.abs(ref).max()
        yr = jax.jit(
            lambda a, b, m=mode: ps.fourstep_stream_p(a, b, n1, n2, True,
                                                      True, mode=m)[0]
        )(fr, fi)
        rterr = np.abs(np.asarray(yr) - np.asarray(x)).max()
        print(f'{mode:>5}: rfft rel err {err:.3e}  roundtrip abs {rterr:.3e}',
              flush=True)

    res = bench_chained_multi(
        {'rt_bf16': rt_step('bf16'), 'rt_g3': rt_step('g3')}, x, k_base=4)
    for k, v in res.items():
        print(f'{k:>8}: {v*1e3:7.3f} ms/pair  ({2.5*n*logn/(v/2)/1e9:7.1f} '
              f'GF/s per transform)', flush=True)

    xc = (jnp.asarray(rng.standard_normal(n), jnp.float32),
          jnp.asarray(rng.standard_normal(n), jnp.float32))
    res = bench_chained_multi(
        {'cf_bf16': cf_step('bf16'), 'cf_g3': cf_step('g3')}, xc, k_base=4)
    for k, v in res.items():
        print(f'{k:>8}: {v*1e3:7.3f} ms/pair  ({5.0*n*logn/(v/2)/1e9:7.1f} '
              f'GF/s per transform)', flush=True)


if __name__ == '__main__':
    main()
