"""Elementwise / unary / reduction benchmark vs NumPy
(reference benchmarks/python/bench_simple.py: x = [60, 60000], 4 dtypes,
out= where possible; here extended with a 1 KB - 256 MB size sweep per
BASELINE.json config 2)."""

import sys

import numpy as np

import dsc_tpu as dsc
from utils import bench, bench_host


def fmt(t: float) -> str:
    return f'{t * 1e6:9.1f} us'


def main():
    dsc.init(int(4 * 2**30))

    shape = (60, 60000)
    print(f'== binary/unary/reduction @ {shape} ==')
    for np_dt, dsc_dt in [
        (np.float32, dsc.Dtype.F32),
        (np.complex64, dsc.Dtype.C32),
    ]:
        x = np.random.randn(*shape).astype(np_dt)
        y = np.random.randn(*shape).astype(np_dt)
        xd, yd = dsc.from_numpy(x), dsc.from_numpy(y)
        out = dsc.empty(shape, dtype=dsc_dt)
        npo = np.empty_like(x)

        for name, dfn, nfn in [
            ('add', lambda: dsc.add(xd, yd, out=out).jax, lambda: np.add(x, y, out=npo)),
            ('mul', lambda: dsc.mul(xd, yd, out=out).jax, lambda: np.multiply(x, y, out=npo)),
            ('exp', lambda: dsc.exp(xd, out=out).jax, lambda: np.exp(x, out=npo)),
            ('sqrt', lambda: dsc.sqrt(dsc.absolute(xd)).jax, lambda: np.sqrt(np.abs(x))),
        ]:
            td = bench(dfn)
            tn = bench_host(nfn)
            print(f'{np_dt.__name__:>10} {name:>5}: dsc {fmt(td)}  numpy {fmt(tn)}'
                  f'  ({tn / td:5.2f}x)')

        for name, dfn, nfn in [
            ('sum', lambda: dsc.sum(xd, axis=0).jax, lambda: x.sum(axis=0)),
            ('mean', lambda: dsc.mean(xd, axis=0).jax, lambda: x.mean(axis=0)),
        ]:
            td = bench(dfn)
            tn = bench_host(nfn)
            print(f'{np_dt.__name__:>10} {name:>5}: dsc {fmt(td)}  numpy {fmt(tn)}'
                  f'  ({tn / td:5.2f}x)')

    print('\n== elementwise bandwidth sweep (add, f32) ==')
    for log2n in range(8, 27, 2):
        ne = 2**log2n
        x = dsc.randn(ne)
        y = dsc.randn(ne)
        out = dsc.empty((ne,))
        t = bench(lambda: dsc.add(x, y, out=out).jax)
        gbs = 3 * ne * 4 / t / 1e9
        print(f'  2^{log2n:2d} ({ne * 4 / 2**20:8.2f} MiB): {t * 1e6:9.1f} us'
              f'  {gbs:7.1f} GB/s')


if __name__ == '__main__':
    sys.exit(main())
