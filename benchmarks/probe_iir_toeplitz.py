"""On-chip probe: Toeplitz-matmul linear recurrence (models/iir.py
_linrec_scalar) vs scipy, per section and full sosfilt.

Run on the real TPU: `python -u benchmarks/probe_iir_toeplitz.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dsc_tpu as dsc  # noqa: E402
from dsc_tpu.models import sosfilt  # noqa: E402


def main():
    import scipy.signal as ss
    dsc.init(int(2**32))
    rng = np.random.default_rng(0)
    sos = ss.butter(6, 0.12, output='sos').astype(np.float32)
    for bsz, n in ((1, 2**22), (8, 2**20)):
        x = rng.standard_normal((bsz, n)).astype(np.float32)
        xd = dsc.from_numpy(x if bsz > 1 else x[0])
        y_ref = ss.sosfilt(sos.astype(np.float64), x.astype(np.float64),
                           axis=-1)
        y = sosfilt(sos, xd)
        yn = y.numpy().reshape(bsz, n)
        rel = np.abs(yn - y_ref).max() / np.abs(y_ref).max()
        best = 1e9
        for _ in range(7):
            t0 = time.perf_counter()
            y = sosfilt(sos, xd)
            _ = float(y[0]) if bsz == 1 else float(y[0, 0])
            best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        ss.sosfilt(sos, x, axis=-1)
        sp = time.perf_counter() - t0
        print(f'sosfilt {bsz}x2^{int(np.log2(n))}: rel {rel:.2e}  '
              f'dsc {best*1e3:8.3f} ms ({bsz*n/best/1e6:8.1f} Msamp/s)  '
              f'scipy {sp*1e3:8.1f} ms  -> {sp/best:6.1f}x')


if __name__ == '__main__':
    main()
