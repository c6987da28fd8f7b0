"""FFT benchmark vs NumPy (reference benchmarks/python/bench_fft.py:
forward only, GFLOPS via 5*N*log2(N) for fft and 2.5*N*log2(N) for rfft;
sweep extended to 2^24 per BASELINE.json config 3, with plan-cache stress)."""

import math
import sys

import numpy as np

import dsc_tpu as dsc
from utils import bench, bench_host


def main():
    dsc.init(int(8 * 2**30))

    print('== 1-D fft/rfft forward, f32/c32 ==')
    print(f'{"N":>9} {"dsc fft":>12} {"np fft":>12} {"dsc GF/s":>9} '
          f'{"np GF/s":>9} {"rfft GF/s":>10}')
    for e in range(8, 25, 2):
        n = 2**e
        flops_c = 5 * n * e
        flops_r = 2.5 * n * e

        xc = (np.random.randn(n) + 1j * np.random.randn(n)).astype(np.complex64)
        xr = np.random.randn(n).astype(np.float32)
        xcd = dsc.from_numpy(xc)
        xrd = dsc.from_numpy(xr)

        td = bench(lambda: dsc.fft(xcd).jax)
        tn = bench_host(lambda: np.fft.fft(xc))
        tr = bench(lambda: dsc.rfft(xrd).jax)

        print(f'2^{e:<7} {td * 1e6:10.1f}us {tn * 1e6:10.1f}us '
              f'{flops_c / td / 1e9:9.1f} {flops_c / tn / 1e9:9.1f} '
              f'{flops_r / tr / 1e9:10.1f}')

    print('\n== batched fft 2^12 x batch ==')
    for b in (8, 128, 2048):
        x = (np.random.randn(b, 4096) + 1j * np.random.randn(b, 4096)).astype(
            np.complex64
        )
        xd = dsc.from_numpy(x)
        td = bench(lambda: dsc.fft(xd).jax)
        tn = bench_host(lambda: np.fft.fft(x, axis=-1))
        gf = 5 * 4096 * 12 * b / td / 1e9
        print(f'  batch {b:5d}: dsc {td * 1e3:8.2f} ms ({gf:7.1f} GF/s)  '
              f'numpy {tn * 1e3:8.2f} ms  ({tn / td:5.2f}x)')

    print('\n== plan-cache stress (>16 plans) ==')
    import time

    t0 = time.perf_counter()
    for e in range(6, 16):
        for kind in ('c', 'r'):
            n = 2**e
            if kind == 'c':
                x = dsc.from_numpy(
                    (np.random.randn(n) + 0j).astype(np.complex64))
                dsc.fft(x).jax.block_until_ready()
            else:
                x = dsc.from_numpy(np.random.randn(n).astype(np.float32))
                dsc.rfft(x).jax.block_until_ready()
    print(f'  20 distinct plans executed in {time.perf_counter() - t0:.1f}s '
          f'(cache holds {dsc.fft.__module__ and 16})')


if __name__ == '__main__':
    sys.exit(main())
