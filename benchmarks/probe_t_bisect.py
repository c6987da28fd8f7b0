"""Bisect which T-layout kernel construct crashes the Mosaic compiler
(SIGABRT seen compiling the half-T pair at 2^24 in g3 mode).

Tests each kernel in isolation at n = 2^20 (1024 x 1024), printing
progressively. Usage: python -u benchmarks/probe_t_bisect.py [mode]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsc_tpu.fourier import pallas_stream_t as pst  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else 'bf16'
N1 = N2 = 1024
N = N1 * N2


def run(name, fn, check):
    t0 = time.time()
    try:
        out = fn()
        out = [np.asarray(o) for o in out if o is not None]
        err = check(*out)
        print(f'{name}: OK err {err:.3e} ({time.time()-t0:.0f}s)',
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001 — bisect tool
        print(f'{name}: FAILED ({time.time()-t0:.0f}s) {str(e)[:300]}',
              flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)
    xj = jnp.asarray(x)
    np.asarray(xj[:1])
    ref = np.fft.fft(x)
    ref_t = ref.reshape(N2, N1).T
    nh2 = N2 // 2

    full = run(
        '1 fwd full-T ',
        lambda: jax.jit(
            lambda v: pst.fourstep_to_t_p(v, None, N1, N2, False,
                                          mode=MODE))(xj),
        lambda hr, hi: np.abs(hr + 1j * hi - ref_t).max()
        / np.abs(ref_t).max(),
    )

    if full is not None:
        hr, hi = full
        run(
            '2 inv full-T ',
            lambda: jax.jit(
                lambda a, b: pst.fourstep_from_t_p(a, b, N1, N2, False,
                                                   False, mode=MODE)
            )(hr, hi),
            lambda yr, yi: np.abs(yr + 1j * yi - x).max(),
        )

    halfo = run(
        '3 fwd half-T ',
        lambda: jax.jit(
            lambda v: pst.fourstep_to_t_p(v, None, N1, N2, True,
                                          mode=MODE))(xj),
        lambda hr, hi: np.abs(
            (hr + 1j * hi)[:N1, :nh2 + 1] - ref_t[:, :nh2 + 1]).max()
        / np.abs(ref_t).max(),
    )

    if halfo is not None:
        hr, hi = halfo
        run(
            '4 inv half-T ',
            lambda: jax.jit(
                lambda a, b: pst.fourstep_from_t_p(a, b, N1, N2, True,
                                                   True, mode=MODE)
            )(hr, hi),
            lambda yr: np.abs(yr - x).max(),
        )


if __name__ == '__main__':
    main()
