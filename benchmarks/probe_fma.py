"""Probe: fma streaming-map tuning sweep + sin VPU roofline (VERDICT r4).

1. fma sweep — round-robin A/B of (DEPTH, CHUNK_ROWS) for the streaming
   elementwise kernel at 256 MiB, timed as jit chains of dependent adds
   (PERF.md methodology: straight-line chain, k-differenced, one process
   so drift hits every variant equally). Target: >= 90% of the ~819 GB/s
   nominal v5e HBM peak = 737 GB/s.

2. sin roofline — is sin's ~324 GB/s HBM-path rate compute-bound? Time
   a chained jnp.sin on a 16 MiB array: chain intermediates <= 32 MiB
   stay VMEM-RESIDENT on this chip (PERF.md device-sweep trap #3), so
   the chained rate is the pure VPU transcendental rate with ~zero HBM
   traffic. If elements/s there matches the HBM-path elements/s, the op
   is VPU-bound and no memory-path tuning can move it.

Run on the chip: python benchmarks/probe_fma.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dsc_tpu  # noqa: F401  — enables x64 + the TPU compile cache
from dsc_tpu.ops import pallas_map as pm

NE = 2**26  # 256 MiB f32


def chain_time(step, state, k_base=4, reps=3):
    @functools.partial(jax.jit, static_argnames=('k',))
    def chain(s, k):
        for _ in range(k):
            s = step(s)
        return s

    def t(k):
        jax.block_until_ready(chain(state, k=k))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain(state, k=k)
            leaf = jax.tree_util.tree_leaves(r)[0]
            np.asarray(leaf.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(2 * k_base) - t(k_base)) / k_base, 1e-9)


def main():
    rng = np.random.default_rng(0)
    print(f'backend: {jax.default_backend()}')
    a = jnp.asarray(rng.standard_normal(NE), jnp.float32)
    b = jnp.asarray(rng.standard_normal(NE), jnp.float32)
    np.asarray(a[:1])

    def add_step(s):
        (x, y) = s
        out = pm.stream_map(jnp.add, x, y)
        return (out, y)

    configs = [(4, 2048), (4, 4096), (6, 2048), (8, 2048), (4, 1024),
               (6, 4096), (8, 4096), (2, 2048)]
    results = {c: [] for c in configs}
    for rnd in range(3):
        for depth, chunk in configs:
            pm.DEPTH, pm.CHUNK_ROWS = depth, chunk
            d = chain_time(add_step, (a, b))
            gbs = 3 * NE * 4 / d / 1e9
            results[(depth, chunk)].append(gbs)
            print(f'  r{rnd} DEPTH={depth} CHUNK={chunk}: {d * 1e3:6.2f} ms '
                  f'{gbs:6.1f} GB/s')
    pm.DEPTH, pm.CHUNK_ROWS = 4, 2048
    print('medians:')
    for c, v in sorted(results.items(),
                       key=lambda kv: -sorted(kv[1])[len(kv[1]) // 2]):
        print(f'  DEPTH={c[0]} CHUNK={c[1]}: '
              f'{sorted(v)[len(v) // 2]:6.1f} GB/s')

    # --- sin VPU roofline ---------------------------------------------
    small = jnp.asarray(rng.standard_normal(2**22), jnp.float32)  # 16 MiB
    d_vmem = chain_time(lambda s: jnp.sin(s), small, k_base=8)
    eps_vmem = 2**22 / d_vmem / 1e9
    d_hbm = chain_time(lambda s: pm.stream_map(jnp.sin, s), a)
    eps_hbm = NE / d_hbm / 1e9
    gbs_hbm = 2 * NE * 4 / d_hbm / 1e9
    print(f'sin VMEM-resident (pure VPU): {eps_vmem:6.2f} Gelem/s')
    print(f'sin HBM streaming-map:        {eps_hbm:6.2f} Gelem/s '
          f'({gbs_hbm:5.1f} GB/s)')
    print(f'-> sin is {"VPU-bound" if eps_hbm > 0.8 * eps_vmem else "NOT VPU-bound"}'
          f' (HBM-path rate is {100 * eps_hbm / eps_vmem:.0f}% of the pure-VPU rate)')


if __name__ == '__main__':
    main()
