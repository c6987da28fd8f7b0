"""Component-ablated timing of the packed forward phase A (the hot
kernel of the 2^24 rfft chain): where do the ~27 us/tile go?

Variants remove one in-tile component each (selection matmul, DFT slab,
four-step twiddle, vreg transposes, boundary-row concat) while keeping
the DMA schedule IDENTICAL, so (full - no_X) is component X's serial
cost per phase. 'dma' is the floor (minimal compute, same transfers).

Estimator: one jitted chain of K kernel calls per variant (side-effect
ordered, outputs folded into a scalar to defeat DCE), marginal over the
number of chain calls with a 1-element d2h drain — the only estimator
that stayed inside physical bounds on this tunnel (benchmarks/PERF.md
"the estimator wars").

Usage: python -u benchmarks/probe_pa.py
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

N1, M2 = 4096, 2048  # the 2^24 rfft's half-size engine factors
MODE = 'pair'
K = 32  # phases per jitted chain: 32 x ~0.4 ms >> tunnel jitter


def _pa_kernel(n1, m2, mode, parts, *refs):
    """packed_fused._phase_a_packed_kernel with component switches.
    parts is a frozenset drawn from {sel, dft, tw, tr, zb}."""
    (x2, zr, zi, zbr, zbi) = refs
    n_tiles = m2 // LANES
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
            off = pl.multiple_of(t * jnp.int32(2 * LANES), 2 * LANES)
            return [pltpu.make_async_copy(
                x2.at[_ds0(n1), pl.ds(off, 2 * LANES)], bufs[s],
                in_sems.at[jnp.int32(s), jnp.int32(0)])]

        def out_dma(s, t):
            roff = pl.multiple_of(t * jnp.int32(LANES), LANES)
            coff = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    outs_r[s], zr.at[pl.ds(roff, LANES), _ds0(n1)],
                    out_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    outs_i[s], zi.at[pl.ds(roff, LANES), _ds0(n1)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]),
                pltpu.make_async_copy(
                    zb_r[s], zbr.at[_ds0(BREP * T), pl.ds(coff, LANES)],
                    out_sems.at[jnp.int32(s), jnp.int32(2)]),
                pltpu.make_async_copy(
                    zb_i[s], zbi.at[_ds0(BREP * T), pl.ds(coff, LANES)],
                    out_sems.at[jnp.int32(s), jnp.int32(3)]),
            ]

        mats1, mats2, tr, ti = _gen_dft_tables(n1, r1, r2, -1, mode)
        sel = _sel_even_odd(False)
        two_pi_over_n = jnp.float32(-2.0 * np.pi / n)
        k1_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 0)
        cu_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 1)
        k2r1_io = jax.lax.broadcasted_iota(
            jnp.int32, (r2, LANES), 0) * jnp.int32(r1)
        cv_io = jax.lax.broadcasted_iota(jnp.int32, (r2, LANES), 1)

        def step(s, t):
            col = jnp.int32(LANES) * t
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

            if 'sel' in parts:
                eo = _sel_dot(bufs[s][:], sel)
                er, oi = eo[:, :LANES], eo[:, LANES:]
            else:
                er, oi = bufs[s][:, :LANES], bufs[s][:, LANES:]
            if 'dft' in parts:
                cr, ci = _dft_slab(er, oi, n1, r1, r2,
                                   mats1, mats2, tr, ti)
            else:
                cr, ci = er, oi
            if 'tw' in parts:
                y3r = cr.reshape(r2, r1, LANES)
                y3i = ci.reshape(r2, r1, LANES)
                ar_ = y3r * ur[None] - y3i * ui[None]
                ai_ = y3r * ui[None] + y3i * ur[None]
                yr = (ar_ * vr_[:, None]
                      - ai_ * vi_[:, None]).reshape(n1, LANES)
                yi = (ar_ * vi_[:, None]
                      + ai_ * vr_[:, None]).reshape(n1, LANES)
            else:
                yr, yi = cr, ci
            if 'zb' in parts:
                zb_r[s][:] = jnp.concatenate(
                    [yr[j * LANES:j * LANES + BREP, :] for j in range(T)],
                    axis=0)
                zb_i[s][:] = jnp.concatenate(
                    [yi[j * LANES:j * LANES + BREP, :] for j in range(T)],
                    axis=0)
            for j in range(T):
                lo, hi = j * LANES, (j + 1) * LANES
                if 'tr' in parts:
                    outs_r[s][:, lo:hi] = yr[lo:hi, :].T
                    outs_i[s][:, lo:hi] = yi[lo:hi, :].T
                else:
                    outs_r[s][:, lo:hi] = yr[lo:hi, :]
                    outs_i[s][:, lo:hi] = yi[lo:hi, :]
            for cp in out_dma(s, t):
                cp.start()

        _pipe2(
            n_tiles,
            lambda s, t: [cp.start() for cp in in_dma(s, t)],
            lambda s, t: [cp.wait() for cp in in_dma(s, t)],
            step,
            lambda s, t: [cp.wait() for cp in out_dma(s, t)],
        )

    pl.run_scoped(
        body,
        bufs0=pltpu.VMEM((N1, 2 * LANES), jnp.float32),
        bufs1=pltpu.VMEM((N1, 2 * LANES), jnp.float32),
        outs_r0=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_r1=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_i0=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_i1=pltpu.VMEM((LANES, N1), jnp.float32),
        zb_r0=pltpu.VMEM((BREP * T, LANES), jnp.float32),
        zb_r1=pltpu.VMEM((BREP * T, LANES), jnp.float32),
        zb_i0=pltpu.VMEM((BREP * T, LANES), jnp.float32),
        zb_i1=pltpu.VMEM((BREP * T, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 1)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def pa_call(parts):
    T = N1 // LANES
    kern = functools.partial(_pa_kernel, N1, M2, MODE, parts)

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
                has_side_effects=True, vmem_limit_bytes=_vmem_fused(N1)),
        )(x2)

    return call


def marginal(chain, state, m=3, reps=5):
    def drain(v):
        np.asarray(v.ravel()[:1])

    drain(chain(state))

    def t(k):
        t0 = time.perf_counter()
        v = None
        for _ in range(k):
            v = chain(state)
        drain(v)
        return time.perf_counter() - t0

    t(m)
    best = None
    t2_med = None
    for _ in range(3):
        t1s, t2s = [], []
        for _ in range(reps):
            t1s.append(t(m))
            t2s.append(t(2 * m))
        t2_med = sorted(t2s)[len(t2s) // 2]
        d = (t2_med - sorted(t1s)[len(t1s) // 2]) / m
        if d > 0:
            best = d if best is None else min(best, d)
    return best if best is not None else t2_med / (2 * m)


VARIANTS = {
    'full': frozenset({'sel', 'dft', 'tw', 'tr', 'zb'}),
    'no_sel': frozenset({'dft', 'tw', 'tr', 'zb'}),
    'no_dft': frozenset({'sel', 'tw', 'tr', 'zb'}),
    'no_tw': frozenset({'sel', 'dft', 'tr', 'zb'}),
    'no_tr': frozenset({'sel', 'dft', 'tw', 'zb'}),
    'no_zb': frozenset({'sel', 'dft', 'tw', 'tr'}),
    'dma': frozenset(),
}


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N1, 2 * M2), jnp.float32)
    np.asarray(x[:1, :1])
    chains = {}
    for name, parts in VARIANTS.items():
        call = pa_call(parts)

        @jax.jit
        def chain(v, _call=call):
            acc = jnp.float32(0)
            for _ in range(K):
                o = _call(v)
                acc = acc + o[0][0, 0]
            return acc

        t0 = time.time()
        try:
            np.asarray(chain(x))
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f'{name}: compile failed: {str(e)[:160]}', flush=True)
            continue
        print(f'# {name} compiled in {time.time() - t0:.1f}s', flush=True)
        chains[name] = chain

    # interleaved round-robin differenced marginal: each K=32 chain call
    # is ~13 ms of device time, so t(2m)-t(m) at m=2 is ~26 ms of signal
    # against the tunnel's few-ms jitter
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
    results = {}
    for name, v in samples.items():
        med = sorted(v)[len(v) // 2]
        results[name] = med
        print(f'{name:8s} {med * 1e3:7.3f} ms/phase '
              f'(all: {[f"{x*1e3:.3f}" for x in v]})', flush=True)

    if 'full' in results and 'dma' in results:
        full = results['full']
        print('\n# component serial costs (full - no_X):')
        for name in ('no_sel', 'no_dft', 'no_tw', 'no_tr', 'no_zb'):
            if name in results:
                print(f'{name[3:]:6s} {(full - results[name]) * 1e3:7.3f} ms')
        print(f'dma floor {results["dma"] * 1e3:7.3f} ms')


if __name__ == '__main__':
    main()
