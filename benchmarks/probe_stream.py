"""On-chip microprobes for the streaming kernels (PERF.md backlog 1/4).

Ablation variants of the four-step phase-A kernel isolate where the
per-phase time goes beyond the DMA bound:

  dma    : stream in -> store -> stream out (no compute)
  dft    : + the two stacked-real MXU matmul stages (_dft_slab)
  twid   : + the factored four-step twiddle generation + multiply
  full   : + a monolithic (n1, L).T transpose (slow: serializes vs DMA)
  fblk   : + per-(L, L)-block vreg transposes (production phase A)
  fmxu   : + exact MXU dot-transpose (3-pass bf16 split vs identity)

plus DMA depth/split variants and a pallas_map CHUNK_ROWS sweep.

Cross-run drift on this chip is +-30-50%: only compare variants from ONE
round-robin run (bench_chained_multi).

Usage: python benchmarks/probe_stream.py [fft|dma|map|all]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsc_tpu.fourier.pallas_stream import (
    LANES, _dft_slab, _ds0, _gen_dft_tables, _iota_trig, _pipe2,
)

K_BASE = 8


def bench_looped(step, state, k_base=K_BASE):
    @jax.jit
    def loop(s, k):
        return jax.lax.fori_loop(0, k, lambda i, v: step(v), s)

    def t(k):
        jax.block_until_ready(loop(state, k))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(state, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(2 * k_base) - t(k_base)) / k_base, 1e-9)


def bench_chained(step, state, k_base=K_BASE):
    """Straight-line chain of k dependent calls — unlike fori_loop there is
    no while-carry buffer constraint, so XLA never copies the output back
    into a carry slot. Isolates kernel time from loop-carry artifacts."""
    (t,) = bench_chained_multi({'x': step}, state, k_base).values()
    return t


def bench_chained_multi(steps: dict, state, k_base=K_BASE, reps=5):
    """Round-robin chained timing of several variants in ONE process run:
    cross-run clock/tunnel drift on this setup is +-50%, so variants are
    only comparable when interleaved. Returns {name: per-op seconds} using
    the median of per-rep differenced estimates."""
    import functools as ft

    chains = {}
    for name, step in steps.items():
        @ft.partial(jax.jit, static_argnames=('k',))
        def chain(s, k, _step=step):
            for _ in range(k):
                s = _step(s)
            return s

        try:
            # compile + warm both trip counts
            jax.block_until_ready(chain(state, k=k_base))
            jax.block_until_ready(chain(state, k=2 * k_base))
        except Exception as e:  # noqa: BLE001 — probe tool, keep going
            print(f'  [{name}] failed to compile: {str(e)[:120]}')
            continue
        chains[name] = chain

    samples = {name: [] for name in chains}
    for _ in range(reps):
        for name, chain in chains.items():
            t0 = time.perf_counter()
            jax.block_until_ready(chain(state, k=k_base))
            t1 = time.perf_counter()
            jax.block_until_ready(chain(state, k=2 * k_base))
            t2 = time.perf_counter()
            samples[name].append(((t2 - t1) - (t1 - t0)) / k_base)
    return {
        name: max(sorted(v)[len(v) // 2], 1e-9)
        for name, v in samples.items()
    }


def _dma_var_kernel(n1, n2, depth, split, *refs):
    """DMA-only streaming variants: ``depth`` static buffer sets (2 or 3),
    ``split`` sub-DMAs per plane tile (1 or 2). Measures how deep the
    in-flight queue must be to saturate strided 512-B-row reads."""
    (xr, xi, zr, zi) = refs
    n_tiles = n2 // LANES
    half = n1 // split

    def body(*scratch):
        bufs_r = scratch[:depth]
        bufs_i = scratch[depth:2 * depth]
        outs_r = scratch[2 * depth:3 * depth]
        outs_i = scratch[3 * depth:4 * depth]
        in_sems, out_sems = scratch[-2], scratch[-1]

        def in_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            cps = []
            for p in range(split):
                r0 = pl.multiple_of(jnp.int32(p * half), 8)
                cps.append(pltpu.make_async_copy(
                    xr.at[pl.ds(r0, half), pl.ds(off, LANES)],
                    bufs_r[s].at[pl.ds(jnp.int32(p * half), half)],
                    in_sems.at[jnp.int32(s), jnp.int32(2 * p)]))
                cps.append(pltpu.make_async_copy(
                    xi.at[pl.ds(r0, half), pl.ds(off, LANES)],
                    bufs_i[s].at[pl.ds(jnp.int32(p * half), half)],
                    in_sems.at[jnp.int32(s), jnp.int32(2 * p + 1)]))
            return cps

        def out_dma(s, t):
            # strided 512-B-row write (same pattern as the baseline 'dma'
            # ablation in _probe_a_kernel, so depth/split deltas compare)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    outs_r[s], zr.at[_ds0(n1), pl.ds(off, LANES)],
                    out_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    outs_i[s], zi.at[_ds0(n1), pl.ds(off, LANES)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        def step(s, tt):
            yr = bufs_r[s][:]
            yi = bufs_i[s][:]

            @pl.when(tt >= depth)
            def _():
                for cp in out_dma(s, tt - depth):
                    cp.wait()

            outs_r[s][:] = yr
            outs_i[s][:] = yi
            for cp in out_dma(s, tt):
                cp.start()

        # depth-deep static software pipeline
        assert n_tiles % depth == 0
        for p in range(depth - 1):
            for cp in in_dma(p, jnp.int32(p)):
                cp.start()

        def loop_body(i, carry):
            for s in range(depth):
                t = depth * i + s

                @pl.when(t + depth - 1 < n_tiles)
                def _():
                    for cp in in_dma((s + depth - 1) % depth,
                                     t + (depth - 1)):
                        cp.start()

                for cp in in_dma(s, t):
                    cp.wait()
                step(s, t)
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles // depth),
                          loop_body, jnp.int32(0))
        for tt in range(n_tiles - depth, n_tiles):
            for cp in out_dma(tt % depth, jnp.int32(tt)):
                cp.wait()

    scratch = (
        [pltpu.VMEM((n1, LANES), jnp.float32) for _ in range(4 * depth)]
        + [pltpu.SemaphoreType.DMA((depth, 2 * split)),
           pltpu.SemaphoreType.DMA((depth, 2))]
    )
    pl.run_scoped(body, *scratch)


def dma_variants():
    n1 = n2 = 4096
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((n1, n2)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n1, n2)), jnp.float32)
    np.asarray(xr[:8, :8])
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    print('== DMA-only variants (strided read + contig write, 512 MiB) ==')
    for depth, split in ((2, 1), (3, 1), (2, 2), (3, 2)):
        def call(a, b, depth=depth, split=split):
            return pl.pallas_call(
                functools.partial(_dma_var_kernel, n1, n2, depth, split),
                in_specs=[anyspec, anyspec],
                out_specs=(anyspec, anyspec),
                out_shape=(
                    jax.ShapeDtypeStruct((n2, n1), jnp.float32),
                    jax.ShapeDtypeStruct((n2, n1), jnp.float32),
                ),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True, vmem_limit_bytes=100 * 2**20),
            )(a, b)

        tc = bench_chained(lambda s: call(*s), (xr, xi))
        gbs = 4 * n1 * n2 * 4 / tc / 1e9
        print(f'  depth={depth} split={split}: chain {tc * 1e3:7.3f} ms '
              f'{gbs:6.1f} GB/s')


def _probe_a_kernel(n1, n2, sign, stages, lanes, *refs):
    """Phase-A ablation. stages in {'dma','dft','twid','full',...}."""
    (xr, xi, zr, zi) = refs
    n_tiles = n2 // lanes
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1
    n = n1 * n2
    # output slab (lanes, n1) vs (n1, lanes)
    transposed = stages in ('full', 'fblk', 'fmxu')

    def body(br0, br1, bi0, bi1, or0, or1, oi0, oi1, in_sems, out_sems):
        bufs_r, bufs_i = (br0, br1), (bi0, bi1)
        outs_r, outs_i = (or0, or1), (oi0, oi1)

        def in_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(lanes), lanes)
            return [
                pltpu.make_async_copy(
                    xr.at[_ds0(n1), pl.ds(off, lanes)], bufs_r[s],
                    in_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    xi.at[_ds0(n1), pl.ds(off, lanes)], bufs_i[s],
                    in_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        def out_dma(s, t):
            if transposed:
                roff = pl.multiple_of(t * jnp.int32(lanes), lanes)
                return [
                    pltpu.make_async_copy(
                        outs_r[s], zr.at[pl.ds(roff, lanes), _ds0(n1)],
                        out_sems.at[jnp.int32(s), jnp.int32(0)]),
                    pltpu.make_async_copy(
                        outs_i[s], zi.at[pl.ds(roff, lanes), _ds0(n1)],
                        out_sems.at[jnp.int32(s), jnp.int32(1)]),
                ]
            # untransposed slab: strided 512-B-row write to Z'[:, tile]
            off = pl.multiple_of(t * jnp.int32(lanes), lanes)
            return [
                pltpu.make_async_copy(
                    outs_r[s], zr.at[_ds0(n1), pl.ds(off, lanes)],
                    out_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    outs_i[s], zi.at[_ds0(n1), pl.ds(off, lanes)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        # tables mirror production (post factored-twiddle): only the small
        # DFT matrices + inner twiddle are hoisted — the old (n1, 128)
        # blr/bli generation cost ~0.2 ms/invocation even when dead
        # (Mosaic did not DCE it; that was the phantom 'DMA floor')
        two_pi_over_n = jnp.float32(sign * 2.0 * np.pi / n)
        k1_io = jax.lax.broadcasted_iota(jnp.int32, (r1, lanes), 0)
        cu_io = jax.lax.broadcasted_iota(jnp.int32, (r1, lanes), 1)
        k2r1_io = jax.lax.broadcasted_iota(
            jnp.int32, (r2, lanes), 0) * jnp.int32(r1)
        cv_io = jax.lax.broadcasted_iota(jnp.int32, (r2, lanes), 1)
        if stages != 'dma':
            mats1, mats2, tr, ti = _gen_dft_tables(n1, r1, r2, sign, 'bf16')

        def step(s, tt):
            if stages == 'dma':
                yr, yi = bufs_r[s][:], bufs_i[s][:]
            else:
                yr, yi = _dft_slab(bufs_r[s][:], bufs_i[s][:], n1, r1, r2,
                                   mats1, mats2, tr, ti)
                if stages in ('twid', 'full'):
                    col = jnp.int32(lanes) * tt
                    phu = jax.lax.rem(
                        k1_io * (col + cu_io), jnp.int32(n)
                    ).astype(jnp.float32) * two_pi_over_n
                    phv = jax.lax.rem(
                        k2r1_io * (col + cv_io), jnp.int32(n)
                    ).astype(jnp.float32) * two_pi_over_n
                    ur, ui = jnp.cos(phu), jnp.sin(phu)
                    vr_, vi_ = jnp.cos(phv), jnp.sin(phv)
                    y3r = yr.reshape(r2, r1, lanes)
                    y3i = yi.reshape(r2, r1, lanes)
                    ar_ = y3r * ur[None] - y3i * ui[None]
                    ai_ = y3r * ui[None] + y3i * ur[None]
                    yr = (ar_ * vr_[:, None]
                          - ai_ * vi_[:, None]).reshape(n1, lanes)
                    yi = (ar_ * vi_[:, None]
                          + ai_ * vr_[:, None]).reshape(n1, lanes)

            @pl.when(tt >= 2)
            def _():
                for cp in out_dma(s, tt - 2):
                    cp.wait()

            if stages == 'full':
                outs_r[s][:] = yr.T
                outs_i[s][:] = yi.T
            elif stages == 'fblk':
                # per-(128,128)-block vreg transpose (static slices)
                for j in range(n1 // lanes):
                    lo, hi = j * lanes, (j + 1) * lanes
                    outs_r[s][:, lo:hi] = yr[lo:hi, :].T
                    outs_i[s][:, lo:hi] = yi[lo:hi, :].T
            elif stages == 'fmxu':
                # exact MXU transpose: blk^T = sum of 3 bf16 dot passes
                # against the identity (split3 terms are exact, identity is
                # exact in bf16, each product selects one element)
                eye = (
                    jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
                ).astype(jnp.bfloat16)

                def tmxu(blk):
                    from dsc_tpu.fourier.pallas_reconstruct import _split3
                    # out[i, j] = sum_m blk[m, i] eye[m, j] = blk[j, i]
                    return sum(
                        jax.lax.dot_general(
                            h, eye, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for h in _split3(blk))

                for j in range(n1 // lanes):
                    lo, hi = j * lanes, (j + 1) * lanes
                    outs_r[s][:, lo:hi] = tmxu(yr[lo:hi, :])
                    outs_i[s][:, lo:hi] = tmxu(yi[lo:hi, :])
            else:
                outs_r[s][:] = yr
                outs_i[s][:] = yi
            for cp in out_dma(s, tt):
                cp.start()

        _pipe2(
            n_tiles,
            lambda s, t: [cp.start() for cp in in_dma(s, t)],
            lambda s, t: [cp.wait() for cp in in_dma(s, t)],
            step,
            lambda s, t: [cp.wait() for cp in out_dma(s, t)],
        )

    oshape = (lanes, n1) if transposed else (n1, lanes)
    pl.run_scoped(
        body,
        br0=pltpu.VMEM((n1, lanes), jnp.float32),
        br1=pltpu.VMEM((n1, lanes), jnp.float32),
        bi0=pltpu.VMEM((n1, lanes), jnp.float32),
        bi1=pltpu.VMEM((n1, lanes), jnp.float32),
        or0=pltpu.VMEM(oshape, jnp.float32),
        or1=pltpu.VMEM(oshape, jnp.float32),
        oi0=pltpu.VMEM(oshape, jnp.float32),
        oi1=pltpu.VMEM(oshape, jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _probe_a_call(n1, n2, stages, lanes=LANES):
    anyspec = pl.BlockSpec(memory_space=pl.ANY)

    def call(s):
        xr, xi = s
        return pl.pallas_call(
            functools.partial(_probe_a_kernel, n1, n2, -1, stages, lanes),
            in_specs=[anyspec, anyspec],
            out_specs=(anyspec, anyspec),
            out_shape=(
                jax.ShapeDtypeStruct((n2, n1), jnp.float32),
                jax.ShapeDtypeStruct((n2, n1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 2**20),
        )(xr, xi)

    return call


def fft_probes():
    n1 = n2 = 4096
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((n1, n2)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n1, n2)), jnp.float32)
    np.asarray(xr)  # force one real download before timing
    print(f'== phase-A ablation at n1=n2={n1} (256 MiB traffic/phase, '
          f'round-robin) ==')
    variants = {
        'dft': _probe_a_call(n1, n2, 'dft'),
        'dft@256': _probe_a_call(n1, n2, 'dft', lanes=256),
        'twid@256': _probe_a_call(n1, n2, 'twid', lanes=256),
        'fblk': _probe_a_call(n1, n2, 'fblk'),
        'fblk@256': _probe_a_call(n1, n2, 'fblk', lanes=256),
    }
    times = bench_chained_multi(variants, (xr, xi))
    for st, tc in times.items():
        gbsc = 4 * n1 * n2 * 4 / tc / 1e9
        print(f'  phaseA[{st:>8}]: {tc * 1e3:7.3f} ms {gbsc:6.1f} GB/s')


def map_probes():
    import importlib

    from dsc_tpu.ops import pallas_map as pm

    rng = np.random.default_rng(0)
    ne = 2**26
    a = jnp.asarray(rng.standard_normal(ne), jnp.float32)
    b = jnp.asarray(rng.standard_normal(ne), jnp.float32)
    np.asarray(a[:8])
    print('== pallas_map CHUNK_ROWS round-robin (256 MiB operands) ==')

    def fma_step(rows):
        def step(c):
            v, w = c
            pm.CHUNK_ROWS = rows  # read at trace time
            return pm.stream_map(jnp.add, v, w), w
        return step

    def copy_step(rows):
        def step(c):
            v, w = c
            pm.CHUNK_ROWS = rows
            return pm.stream_map(lambda p: p, v), w
        return step

    def fma_step_d(rows, depth):
        def step(c):
            v, w = c
            pm.CHUNK_ROWS = rows  # read at trace time
            pm.DEPTH = depth
            return pm.stream_map(jnp.add, v, w), w
        return step

    variants = {}
    for rows in (1024, 2048, 4096, 8192):
        variants[f'fma@{rows}'] = fma_step(rows)
        variants[f'copy@{rows}'] = copy_step(rows)
    times = bench_chained_multi(variants, (a, b))
    importlib.reload(pm)  # restore CHUNK_ROWS default
    for name, t in times.items():
        passes = 3 if name.startswith('fma') else 2
        gbs = passes * ne * 4 / t / 1e9
        print(f'  {name:>10}: {t * 1e3:7.3f} ms   {gbs:6.1f} GB/s')

    print('== pallas_map (CHUNK_ROWS x DEPTH) grid, fma ==')
    variants = {}
    for rows in (1024, 2048, 4096):
        for depth in (2, 4, 6, 8):
            if rows * depth > 2048 * 8:  # VMEM: ~depth*(2 in + 1 out) bufs
                continue
            variants[f'fma@{rows}x{depth}'] = fma_step_d(rows, depth)
    times = bench_chained_multi(variants, (a, b))
    importlib.reload(pm)
    for name, t in times.items():
        gbs = 3 * ne * 4 / t / 1e9
        print(f'  {name:>12}: {t * 1e3:7.3f} ms   {gbs:6.1f} GB/s')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print(f'# backend: {jax.default_backend()}')
    if which in ('fft', 'all'):
        fft_probes()
    if which in ('dma', 'all'):
        dma_variants()
    if which in ('map', 'all'):
        map_probes()
