"""Probe: even/odd deinterleave + interleave formulations at 2^24 (f32).

The half-size real-FFT engine (reference dsc_fft.h:178-238) needs
z[j] = x[2j] + i*x[2j+1]: a stride-2 deinterleave on the way in and the
matching interleave on the way out. Round-2 measured the naive lane
slice x[0::2] at 157 ms (XLA gather lowering) and declared the packing
blocked; this probe tests the formulations that AVOID lane gathers:

  u64   — bitcast_convert_type(x.reshape(m, 2) -> u64), then mask/shift:
          the pair split becomes elementwise u64 ops (vreg selects on a
          32-bit machine), one HBM round trip.
  tr    — x.reshape(m, 2) transposed to (2, m) by XLA (transpose emitter,
          not gather).
  slice — the known-bad x[0::2] baseline for reference.

Each timed as a jit chain per PERF.md methodology (straight-line, no
while-carry), k=4/8 differencing, round-robin in one process.

Run: python benchmarks/probe_deint.py
"""

import time

import jax

jax.config.update('jax_enable_x64', True)  # u64 needs x64 (as dsc_tpu sets)

import jax.numpy as jnp
import numpy as np

N = 2**24


def bench_chain(fn, x, k_base=4, reps=3):
    import functools

    @functools.partial(jax.jit, static_argnames=('k',))
    def chain(v, k):
        for _ in range(k):
            a, b = fn(v)
            v = inter_u64(a, b)  # feed back so nothing folds away
        return v

    def t(k):
        jax.block_until_ready(chain(x, k=k))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(x, k=k))
            np.asarray(chain(x, k=k)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(2 * k_base) - t(k_base)) / k_base, 1e-9)


def deint_u64(x):
    m = x.shape[0] // 2
    v = jax.lax.bitcast_convert_type(x.reshape(m, 2), jnp.uint64)  # (m,)
    lo = jax.lax.bitcast_convert_type(
        (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (v >> jnp.uint64(32)).astype(jnp.uint32), jnp.float32)
    return lo, hi


def inter_u64(a, b):
    m = a.shape[0]
    av = jax.lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
    bv = jax.lax.bitcast_convert_type(b, jnp.uint32).astype(jnp.uint64)
    v = av | (bv << jnp.uint64(32))
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(v, jnp.uint32), jnp.float32
    ).reshape(2 * m)


def deint_tr(x):
    m = x.shape[0] // 2
    t = x.reshape(m, 2).T
    return t[0], t[1]


def deint_slice(x):
    return x[0::2], x[1::2]


def main():
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    np.asarray(x[:1])
    print(f'backend: {jax.default_backend()}  N=2^24')

    # correctness first
    for name, fn in (('u64', deint_u64), ('tr', deint_tr)):
        a, b = jax.jit(fn)(x)
        ok_a = np.array_equal(np.asarray(a), x_np[0::2])
        ok_b = np.array_equal(np.asarray(b), x_np[1::2])
        rt = np.asarray(jax.jit(inter_u64)(a, b))
        ok_rt = np.array_equal(rt, x_np)
        print(f'  {name:5s} deint ok={ok_a and ok_b}  roundtrip ok={ok_rt}')

    variants = [('u64', deint_u64), ('tr', deint_tr)]
    if jax.default_backend() != 'tpu':
        variants.append(('slice', deint_slice))  # 157 ms on TPU, skip
    for rounds in range(2):
        for name, fn in variants:
            d = bench_chain(fn, x)
            gbs = 4 * N * 4 / d / 1e9  # deint r+w + inter r+w per iter
            print(f'  round{rounds} {name:5s}: {d * 1e3:7.2f} ms/iter '
                  f'({gbs:6.1f} GB/s incl. re-interleave)')


if __name__ == '__main__':
    main()
