"""Probe: packed half-size rfft engine vs full-size engine, on-chip.

Round-robin in ONE process (same-process marginals, PERF.md
methodology): jit-chained k=2/4 differencing of the rfft+irfft pair at
2^24 through both engines, plus each deinterleave formulation in
isolation (u64 / mm / tr) at 2^24 so the winner can be pinned as
packed._impl()'s 'auto' resolution.

Run: python benchmarks/probe_packed.py [n_log2]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import dsc_tpu as dsc  # noqa: F401  (enables x64, cache, init)
import jax
import jax.numpy as jnp

from dsc_tpu.fourier import core as fft_core
from dsc_tpu.fourier import packed
from dsc_tpu.fourier import pallas_stream as ps
from dsc_tpu.fourier import pallas_stream_t as pst

dsc.init(int(8 * 2**30))

NLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = 1 << NLOG
N1, N2 = ps.factors(N)
print(f'n = 2^{NLOG}, factors ({N1}, {N2}), inner ({N1}, {N2 // 2})')

rng = np.random.default_rng(7)
x = jnp.asarray(rng.standard_normal(N), jnp.float32)
np.asarray(x[:1])


def chain_time(step, state, k_base=2, reps=3):
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
            jax.block_until_ready(r)
            np.asarray(r.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(2 * k_base) - t(k_base)) / k_base, 1e-9)


def pair_legacy(v):
    hr, hi = pst.fourstep_to_t_p(v, None, N1, N2, half=True)
    yr, _ = pst.fourstep_from_t_p(hr, hi, N1, N2, half=True,
                                  real_output=True)
    return yr


def pair_packed(v):
    hr, hi = packed.rfft_half_t_packed(v, N1, N2)
    return packed.irfft_from_half_t_packed(hr, hi, N1, N2)


def main():
    # accuracy first (also compiles)
    ref = np.fft.rfft(np.asarray(x))
    hr, hi = jax.jit(
        lambda v: packed.rfft_half_t_packed(v, N1, N2))(x)
    m2 = N2 // 2
    k = np.arange(N1)[:, None] + N1 * np.arange(m2 + 1)[None, :]
    got = (np.asarray(hr) + 1j * np.asarray(hi))[:N1, :m2 + 1]
    mask = k <= N // 2
    full = np.fft.fft(np.asarray(x))
    err = np.abs(got - full[k % N]).max() / np.abs(ref).max()
    print(f'packed forward rel err vs np.fft: {err:.3e}')
    back = jax.jit(
        lambda r, i: packed.irfft_from_half_t_packed(r, i, N1, N2))(hr, hi)
    print(f'packed roundtrip abs err: {np.abs(np.asarray(back) - np.asarray(x)).max():.3e}')
    del mask

    # deint impls in isolation
    for impl in ('u64', 'mm', 'tr'):
        packed.DEINT_IMPL = impl

        def deint_step(v, _impl=impl):
            e, o = packed.deinterleave(v)
            return packed.interleave(e, o)

        try:
            dt = chain_time(deint_step, x)
            gbs = 4 * N * 4 / dt / 1e9  # deint(r+w) + inter(r+w)
            print(f'deint+inter [{impl}]: {dt * 1e3:7.3f} ms  {gbs:6.1f} GB/s')
        except Exception as e:  # noqa: BLE001
            print(f'deint+inter [{impl}]: FAILED {type(e).__name__}: {e}')
    packed.DEINT_IMPL = 'auto'

    results = {}
    for name, fn in (('legacy', pair_legacy), ('packed', pair_packed)):
        dt = chain_time(fn, x)
        results[name] = dt
        gfl = 2 * 2.5 * N * NLOG / dt / 1e9
        print(f'pair [{name}]: {dt * 1e3:7.3f} ms  '
              f'({gfl:7.1f} GFLOP/s per-transform-equiv)')
    # second round-robin pass to confirm ordering isn't drift
    for name, fn in (('legacy', pair_legacy), ('packed', pair_packed)):
        dt = chain_time(fn, x)
        print(f'pair [{name}] (2nd): {dt * 1e3:7.3f} ms')
    sp = results['legacy'] / results['packed']
    print(f'packed speedup: {sp:.3f}x')


if __name__ == '__main__':
    main()
