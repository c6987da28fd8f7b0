"""Probe: FUSED packed half-size rfft engine vs legacy + XLA-packed,
on-chip.

Round-robin in ONE process (same-process marginals, PERF.md
methodology): jit-chained k-differencing at 2^24 of (a) the rfft+irfft
pair and (b) each direction separately, through three engines:
  legacy — full-size real engine (pallas_stream_t half-T)
  xla    — packed half-size with XLA deint/untangle (packed.py)
  fused  — packed half-size, everything in-kernel (packed_fused.py)

Plus accuracy: fused forward vs np.fft, fused roundtrip, and
cross-consumption legacy<->fused.

Run: python benchmarks/probe_fused.py [n_log2]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import dsc_tpu as dsc  # noqa: F401  (enables x64, cache, init)
import jax
import jax.numpy as jnp

from dsc_tpu.fourier import packed, packed_fused
from dsc_tpu.fourier import pallas_stream as ps
from dsc_tpu.fourier import pallas_stream_t as pst

dsc.init(int(8 * 2**30))

NLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = 1 << NLOG
N1, N2 = ps.factors(N)
print(f'n = 2^{NLOG}, factors ({N1}, {N2}), inner ({N1}, {N2 // 2})',
      flush=True)

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


def fwd_legacy(v):
    hr, hi = pst.fourstep_to_t_p(v, None, N1, N2, half=True)
    return hr + hi  # consume both planes, keep shape chainable


def pair_legacy(v):
    hr, hi = pst.fourstep_to_t_p(v, None, N1, N2, half=True)
    yr, _ = pst.fourstep_from_t_p(hr, hi, N1, N2, half=True,
                                  real_output=True)
    return yr


def fwd_fused(v):
    hr, hi = packed_fused.rfft_half_t_packed_fused(v, N1, N2)
    return hr + hi


def pair_fused(v):
    hr, hi = packed_fused.rfft_half_t_packed_fused(v, N1, N2)
    return packed_fused.irfft_from_half_t_packed_fused(hr, hi, N1, N2)


def pair_xla(v):
    hr, hi = packed.rfft_half_t_packed(v, N1, N2)
    return packed.irfft_from_half_t_packed(hr, hi, N1, N2)


def main():
    # accuracy first (also compiles the fused programs)
    t0 = time.time()
    hr, hi = jax.jit(
        lambda v: packed_fused.rfft_half_t_packed_fused(v, N1, N2))(x)
    jax.block_until_ready(hr)
    print(f'fused fwd compile+run: {time.time() - t0:.1f}s', flush=True)
    m2 = N2 // 2
    k = np.arange(N1)[:, None] + N1 * np.arange(m2 + 1)[None, :]
    got = (np.asarray(hr) + 1j * np.asarray(hi))[:N1, :m2 + 1]
    full = np.fft.fft(np.asarray(x))
    ref = np.fft.rfft(np.asarray(x))
    err = np.abs(got - full[k % N]).max() / np.abs(ref).max()
    print(f'fused forward rel err vs np.fft: {err:.3e}', flush=True)
    back = jax.jit(
        lambda r, i: packed_fused.irfft_from_half_t_packed_fused(
            r, i, N1, N2))(hr, hi)
    print(f'fused roundtrip abs err: '
          f'{np.abs(np.asarray(back) - np.asarray(x)).max():.3e}',
          flush=True)
    # cross-consumption: legacy inverse from fused planes
    ylc, _ = jax.jit(lambda r, i: pst.fourstep_from_t_p(
        r, i, N1, N2, half=True, real_output=True))(hr, hi)
    print(f'fused fwd -> legacy inv abs err: '
          f'{np.abs(np.asarray(ylc) - np.asarray(x)).max():.3e}',
          flush=True)

    results = {}
    for rnd in (1, 2):
        for name, fn in (('legacy', pair_legacy), ('fused', pair_fused),
                         ('xla', pair_xla)):
            dt = chain_time(fn, x)
            results[name] = min(results.get(name, float('inf')), dt)
            gfl = 2 * 2.5 * N * NLOG / dt / 1e9
            print(f'pair [{name}] r{rnd}: {dt * 1e3:7.3f} ms  '
                  f'({gfl:7.1f} GFLOP/s per-transform-equiv)', flush=True)
    for name, fn in (('legacy', fwd_legacy), ('fused', fwd_fused)):
        dt = chain_time(fn, x)
        gfl = 2.5 * N * NLOG / dt / 1e9
        print(f'fwd  [{name}]: {dt * 1e3:7.3f} ms  ({gfl:7.1f} GFLOP/s)',
              flush=True)
    sp = results['legacy'] / results['fused']
    print(f'fused speedup vs legacy: {sp:.3f}x', flush=True)


if __name__ == '__main__':
    main()
