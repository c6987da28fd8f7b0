"""Tile-width A/B for the packed forward phase A: W = half-size column
tiles per step. W=1 is the production kernel shape (128-lane slabs, 16
steps); W=2 feeds 512-lane input slabs (one DFT dot at N=16384 instead
of two at 8192, half the loop/DMA-descriptor/table overhead). The
probe_pa ablation put compute at ~26 us/tile serial vs a ~14 us DMA
floor; wider tiles attack the fixed per-tile costs.

Usage: python -u benchmarks/probe_pw.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dsc_tpu.fourier.packed_fused import (  # noqa: E402
    BREP, _sel_dot, _sel_even_odd, _vmem_fused)
from dsc_tpu.fourier.pallas_stream import (  # noqa: E402
    LANES, _dft_slab, _ds0, _gen_dft_tables, _pipe2)

N1, M2 = 4096, 2048
MODE = 'pair'
K = 16


def _pa_w_kernel(n1, m2, mode, W, *refs):
    """Production phase A composition at tile width W*128 lanes."""
    (x2, zr, zi, zbr, zbi) = refs
    WL = W * LANES
    n_tiles = m2 // WL
    T = n1 // LANES
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1
    n = n1 * m2

    def body(bufs0, bufs1, outs_r0, outs_r1, outs_i0, outs_i1,
             zb_r0, zb_r1, zb_i0, zb_i1, in_sems, out_sems):
        bufs = (bufs0, bufs1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)
        zb_r = (zb_r0, zb_r1)
        zb_i = (zb_i0, zb_i1)

        def in_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(2 * WL), 2 * WL)
            return [pltpu.make_async_copy(
                x2.at[_ds0(n1), pl.ds(off, 2 * WL)], bufs[s],
                in_sems.at[jnp.int32(s), jnp.int32(0)])]

        def out_dma(s, t):
            roff = pl.multiple_of(t * jnp.int32(WL), WL)
            coff = pl.multiple_of(t * jnp.int32(WL), WL)
            return [
                pltpu.make_async_copy(
                    outs_r[s], zr.at[pl.ds(roff, WL), _ds0(n1)],
                    out_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    outs_i[s], zi.at[pl.ds(roff, WL), _ds0(n1)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]),
                pltpu.make_async_copy(
                    zb_r[s], zbr.at[_ds0(BREP * T), pl.ds(coff, WL)],
                    out_sems.at[jnp.int32(s), jnp.int32(2)]),
                pltpu.make_async_copy(
                    zb_i[s], zbi.at[_ds0(BREP * T), pl.ds(coff, WL)],
                    out_sems.at[jnp.int32(s), jnp.int32(3)]),
            ]

        mats1, mats2, tr, ti = _gen_dft_tables(n1, r1, r2, -1, mode)
        sel = _sel_even_odd(False)
        two_pi_over_n = jnp.float32(-2.0 * np.pi / n)
        k1_io = jax.lax.broadcasted_iota(jnp.int32, (r1, WL), 0)
        cu_io = jax.lax.broadcasted_iota(jnp.int32, (r1, WL), 1)
        k2r1_io = jax.lax.broadcasted_iota(
            jnp.int32, (r2, WL), 0) * jnp.int32(r1)
        cv_io = jax.lax.broadcasted_iota(jnp.int32, (r2, WL), 1)

        def step(s, t):
            col = jnp.int32(WL) * t
            phu = jax.lax.rem(k1_io * (col + cu_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            phv = jax.lax.rem(k2r1_io * (col + cv_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            ur, ui = jnp.cos(phu), jnp.sin(phu)
            vr_, vi_ = jnp.cos(phv), jnp.sin(phv)

            @pl.when(t >= 2)
            def _():
                for cp in out_dma(s, t - 2):
                    cp.wait()

            # even/odd selection per 256-lane input group; lanes of er/oi
            # are then half-size columns WL*t .. WL*t + WL-1 in order
            if W == 1:
                eo = _sel_dot(bufs[s][:], sel)
                er, oi = eo[:, :LANES], eo[:, LANES:]
            else:
                eos = [_sel_dot(
                    bufs[s][:, 2 * LANES * w:2 * LANES * (w + 1)], sel)
                    for w in range(W)]
                er = jnp.concatenate([e[:, :LANES] for e in eos], axis=1)
                oi = jnp.concatenate([e[:, LANES:] for e in eos], axis=1)
            cr, ci = _dft_slab(er, oi, n1, r1, r2, mats1, mats2, tr, ti)
            y3r = cr.reshape(r2, r1, WL)
            y3i = ci.reshape(r2, r1, WL)
            ar_ = y3r * ur[None] - y3i * ui[None]
            ai_ = y3r * ui[None] + y3i * ur[None]
            yr = (ar_ * vr_[:, None] - ai_ * vi_[:, None]).reshape(n1, WL)
            yi = (ar_ * vi_[:, None] + ai_ * vr_[:, None]).reshape(n1, WL)
            zb_r[s][:] = jnp.concatenate(
                [yr[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            zb_i[s][:] = jnp.concatenate(
                [yi[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            for j in range(T):
                lo, hi = j * LANES, (j + 1) * LANES
                for w in range(W):
                    wl, wh = w * LANES, (w + 1) * LANES
                    outs_r[s][wl:wh, lo:hi] = yr[lo:hi, wl:wh].T
                    outs_i[s][wl:wh, lo:hi] = yi[lo:hi, wl:wh].T
            for cp in out_dma(s, t):
                cp.start()

        _pipe2(
            n_tiles,
            lambda s, t: [cp.start() for cp in in_dma(s, t)],
            lambda s, t: [cp.wait() for cp in in_dma(s, t)],
            step,
            lambda s, t: [cp.wait() for cp in out_dma(s, t)],
        )

    WL_ = W * LANES
    pl.run_scoped(
        body,
        bufs0=pltpu.VMEM((N1, 2 * WL_), jnp.float32),
        bufs1=pltpu.VMEM((N1, 2 * WL_), jnp.float32),
        outs_r0=pltpu.VMEM((WL_, N1), jnp.float32),
        outs_r1=pltpu.VMEM((WL_, N1), jnp.float32),
        outs_i0=pltpu.VMEM((WL_, N1), jnp.float32),
        outs_i1=pltpu.VMEM((WL_, N1), jnp.float32),
        zb_r0=pltpu.VMEM((BREP * (N1 // LANES), WL_), jnp.float32),
        zb_r1=pltpu.VMEM((BREP * (N1 // LANES), WL_), jnp.float32),
        zb_i0=pltpu.VMEM((BREP * (N1 // LANES), WL_), jnp.float32),
        zb_i1=pltpu.VMEM((BREP * (N1 // LANES), WL_), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 1)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def make_call(W):
    T = N1 // LANES
    kern = functools.partial(_pa_w_kernel, N1, M2, MODE, W)

    def call(x2):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 4,
            out_shape=(
                jax.ShapeDtypeStruct((M2, N1), jnp.float32),
                jax.ShapeDtypeStruct((M2, N1), jnp.float32),
                jax.ShapeDtypeStruct((BREP * T, M2), jnp.float32),
                jax.ShapeDtypeStruct((BREP * T, M2), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_vmem_fused(2 * N1)),  # w4 needs ~68 MiB
        )(x2)

    return call


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N1, 2 * M2), jnp.float32)
    np.asarray(x[:1, :1])

    import os

    widths = [int(w) for w in
              os.environ.get('DSC_PW_WIDTHS', '1,2').split(',')]
    calls = {f'w{w}': make_call(w) for w in widths}
    ref = None
    for name in list(calls):
        t0 = time.time()
        try:
            o = jax.jit(calls[name])(x)
            zr = np.asarray(o[0])
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f'{name}: FAILED {str(e)[:200]}', flush=True)
            del calls[name]
            continue
        if ref is None:
            ref = zr
            print(f'{name}: ref ok ({time.time() - t0:.1f}s)', flush=True)
        else:
            err = np.abs(zr - ref).max() / np.abs(ref).max()
            print(f'{name}: rel err vs w1 {err:.2e} '
                  f'({time.time() - t0:.1f}s)', flush=True)

    chains = {}
    for name, call in calls.items():
        @jax.jit
        def chain(v, _call=call):
            acc = jnp.float32(0)
            for _ in range(K):
                o = _call(v)
                acc = acc + o[0][0, 0]
            return acc

        np.asarray(chain(x))
        chains[name] = chain

    m, reps = 2, 5

    def t(chain, k):
        t0 = time.perf_counter()
        v = None
        for _ in range(k):
            v = chain(x)
        np.asarray(v)
        return time.perf_counter() - t0

    for c in chains.values():
        t(c, m)
    samples = {name: [] for name in chains}
    for _ in range(reps):
        for name, chain in chains.items():
            t1 = t(chain, m)
            t2 = t(chain, 2 * m)
            samples[name].append((t2 - t1) / m / K)
    for name, v in samples.items():
        med = sorted(v)[len(v) // 2]
        print(f'{name:4s} {med * 1e3:7.3f} ms/phase '
              f'(all: {[f"{x*1e3:.3f}" for x in v]})', flush=True)


if __name__ == '__main__':
    main()
