"""dsc_tpu headline benchmark (BASELINE.md north star).

Measures on the default backend (the real TPU chip under the driver):
  - 1-D rfft/irfft of 2^24 float32 (GFLOP/s via 2.5*N*log2(N), the same
    formula the reference uses, benchmarks/python/bench_fft.py:32-78)
  - elementwise add/mul/exp bandwidth (GB/s) at 256 MiB
  - accuracy of the 2^24 rfft vs np.fft (north-star bound: 1e-4)

vs_baseline = dsc rfft GFLOP/s / NumPy rfft GFLOP/s on this host — the
reference's own positioning metric ("NumPy is X.XX x faster",
bench_fft.py:67-78), inverted so >1 means we beat NumPy.

Prints exactly ONE JSON line to stdout; the detail table goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

WARMUP = 2  # reference methodology: 2 warmup calls, min of 5 (perf.md:18-24)
ITERS = 5


def _best(fn) -> float:
    for _ in range(WARMUP):
        fn()
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    import jax

    import dsc_tpu as dsc

    dsc.init(int(8 * 2**30))
    backend = jax.default_backend()
    print(f'# backend: {backend} {jax.devices()}', file=sys.stderr)

    n = 2**24
    logn = 24
    rng = np.random.default_rng(42)
    x_np = rng.standard_normal(n).astype(np.float32)
    x = dsc.from_numpy(x_np)

    # ---- accuracy first (also compiles/warms the plan) -------------------
    t0 = time.perf_counter()
    spec = dsc.rfft(x)
    spec_np = spec.numpy()
    print(f'# first rfft incl compile: {time.perf_counter()-t0:.1f}s',
          file=sys.stderr)
    ref = np.fft.rfft(x_np)
    rfft_err = float(np.abs(spec_np - ref).max() / np.abs(ref).max())
    back = dsc.irfft(spec)
    irfft_err = float(np.abs(back.numpy() - x_np).max())
    print(f'# rfft 2^24 rel err vs NumPy: {rfft_err:.3e} '
          f'(bound 1e-4) | irfft roundtrip abs err: {irfft_err:.3e}',
          file=sys.stderr)

    # ---- rfft / irfft throughput -----------------------------------------
    flops_r = 2.5 * n * logn

    def run_rfft():
        jax.block_until_ready(dsc.rfft(x).jax)

    t_rfft = _best(run_rfft)
    gflops_rfft = flops_r / t_rfft / 1e9

    def run_irfft():
        jax.block_until_ready(dsc.irfft(spec).jax)

    t_irfft = _best(run_irfft)
    gflops_irfft = flops_r / t_irfft / 1e9

    # complex fft 2^24 as well (5*N*log2 N)
    c = dsc.cast(x, dsc.Dtype.C32)

    def run_fft():
        jax.block_until_ready(dsc.fft(c).jax)

    t_fft = _best(run_fft)
    gflops_fft = 5.0 * n * logn / t_fft / 1e9

    # ---- elementwise bandwidth -------------------------------------------
    ne = 2**26  # 256 MiB f32
    a = dsc.from_numpy(rng.standard_normal(ne).astype(np.float32))
    b = dsc.from_numpy(rng.standard_normal(ne).astype(np.float32))
    out = dsc.zeros((ne,))

    def run_add():
        jax.block_until_ready(dsc.add(a, b, out=out).jax)

    t_add = _best(run_add)
    gbs_add = 3 * ne * 4 / t_add / 1e9  # 2 reads + 1 write

    def run_exp():
        jax.block_until_ready(dsc.exp(a, out=out).jax)

    t_exp = _best(run_exp)
    gbs_exp = 2 * ne * 4 / t_exp / 1e9

    # ---- NumPy baseline on this host --------------------------------------
    t_np = _best(lambda: np.fft.rfft(x_np))
    gflops_np = flops_r / t_np / 1e9

    print(
        f'# rfft  2^24: {t_rfft*1e3:8.2f} ms  {gflops_rfft:8.1f} GFLOP/s\n'
        f'# irfft 2^24: {t_irfft*1e3:8.2f} ms  {gflops_irfft:8.1f} GFLOP/s\n'
        f'# fft   2^24: {t_fft*1e3:8.2f} ms  {gflops_fft:8.1f} GFLOP/s\n'
        f'# add  256MB: {t_add*1e3:8.2f} ms  {gbs_add:8.1f} GB/s\n'
        f'# exp  256MB: {t_exp*1e3:8.2f} ms  {gbs_exp:8.1f} GB/s\n'
        f'# numpy rfft: {t_np*1e3:8.2f} ms  {gflops_np:8.1f} GFLOP/s',
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                'metric': 'rfft_2^24_f32',
                'value': round(gflops_rfft, 2),
                'unit': 'GFLOP/s',
                'vs_baseline': round(gflops_rfft / gflops_np, 3),
            }
        )
    )


if __name__ == '__main__':
    main()
