"""Software-pipelined phase A: overlap MXU (selection + DFT) of tile t
with VPU/XLU (twiddle + transpose + boundary) of tile t-2.

The probe_pa ablation showed the packed forward phase A is
serialization-bound: sel ~0.29 ms + dft ~0.32 ms (MXU) and tr ~0.13 ms
(XLU transposes) execute back-to-back per tile against a 0.225 ms DMA
floor. The in-order core CAN overlap MXU and VPU work when the
instruction stream interleaves independent ops: with a distance-2
pipeline (vpu(t-2) issued before mxu(t) each iteration), mxu(t-? )'s
matmuls stream in the MXU while the next iteration's vpu work issues.

Variants (interleaved round-robin, single process — cross-run drift on
this tunnel is +-50%):
  full  — current production kernel composition (_phase_a_packed_kernel)
  pipe  — distance-2 software pipeline, same math
  sel1  — selection as ONE k=512 dot ([xh|xl] @ [sel;sel])
Correctness: pipe/sel1 outputs compared to full (must be exact — same
partial products in a different order).

Usage: python -u benchmarks/probe_pa2.py
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
    BREP, _phase_a_packed_kernel, _sel_dot, _sel_even_odd, _vmem_fused)
from dsc_tpu.fourier.pallas_stream import (  # noqa: E402
    LANES, _dft_slab, _ds0, _gen_dft_tables, _split_bf16)
from dsc_tpu.fourier.pallas_stream_t import _dot  # noqa: E402

N1, M2 = 4096, 2048
MODE = 'pair'
K = 16


def _pa_pipe2_kernel(n1, m2, mode, *refs):
    """Distance-2 software-pipelined packed phase A, take 2:

    - c scratch over FOUR sets (t % 4): vpu(t-2) reads set (t-2)%4 while
      mxu(t) writes set t%4 — different memrefs, so no WAR hazard can
      make Mosaic serialize the matmuls behind the reads (the take-1
      kernel shared one set per parity).
    - in-DMA keeps the full one-tile lead of _pipe2 (take 1 started the
      copy in the same iteration that waits it — the vpu_part between
      start and wait gave only ~12 us of lead for a ~13 us transfer).
    """
    (x2, zr, zi, zbr, zbi) = refs
    n_tiles = m2 // LANES
    T = n1 // LANES
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1
    n = n1 * m2

    def body(bufs0, bufs1, c_r0, c_r1, c_r2, c_r3, c_i0, c_i1, c_i2, c_i3,
             outs_r0, outs_r1, outs_i0, outs_i1,
             zb_r0, zb_r1, zb_i0, zb_i1, in_sems, out_sems):
        bufs = (bufs0, bufs1)
        c_r = (c_r0, c_r1, c_r2, c_r3)
        c_i = (c_i0, c_i1, c_i2, c_i3)
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

        def mxu_part(s2, s4, t):
            eo = _sel_dot(bufs[s2][:], sel)
            cr, ci = _dft_slab(eo[:, :LANES], eo[:, LANES:], n1, r1, r2,
                               mats1, mats2, tr, ti)
            c_r[s4][:] = cr
            c_i[s4][:] = ci

        def vpu_part(s4, u):
            col = jnp.int32(LANES) * u
            phu = jax.lax.rem(k1_io * (col + cu_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            phv = jax.lax.rem(k2r1_io * (col + cv_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            ur, ui = jnp.cos(phu), jnp.sin(phu)
            vr_, vi_ = jnp.cos(phv), jnp.sin(phv)
            so = s4 % 2  # python int: u % 2 == s4 % 2 by construction

            @pl.when(u >= 2)
            def _():
                for cp in out_dma(so, u - 2):
                    cp.wait()

            y3r = c_r[s4][:].reshape(r2, r1, LANES)
            y3i = c_i[s4][:].reshape(r2, r1, LANES)
            ar_ = y3r * ur[None] - y3i * ui[None]
            ai_ = y3r * ui[None] + y3i * ur[None]
            yr = (ar_ * vr_[:, None]
                  - ai_ * vi_[:, None]).reshape(n1, LANES)
            yi = (ar_ * vi_[:, None]
                  + ai_ * vr_[:, None]).reshape(n1, LANES)
            zb_r[so][:] = jnp.concatenate(
                [yr[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            zb_i[so][:] = jnp.concatenate(
                [yi[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            for j in range(T):
                lo, hi = j * LANES, (j + 1) * LANES
                outs_r[so][:, lo:hi] = yr[lo:hi, :].T
                outs_i[so][:, lo:hi] = yi[lo:hi, :].T
            for cp in out_dma(so, u):
                cp.start()

        # prologue: tiles 0, 1 mxu-only, with in(2) started after mxu(0)
        # frees bufs[0]
        for cp in in_dma(0, jnp.int32(0)):
            cp.start()
        for cp in in_dma(1, jnp.int32(1)):
            cp.start()
        for cp in in_dma(0, jnp.int32(0)):
            cp.wait()
        mxu_part(0, 0, jnp.int32(0))
        for cp in in_dma(0, jnp.int32(2)):
            cp.start()
        for cp in in_dma(1, jnp.int32(1)):
            cp.wait()
        mxu_part(1, 1, jnp.int32(1))

        # main loop: tiles 2..n_tiles-1, 4-way parity unroll
        def body4(i, carry):
            for j in range(4):
                t = 4 * i + j + 2  # traced; buffer sets from python j
                s2 = j % 2
                s4 = (j + 2) % 4

                @pl.when(t < n_tiles)
                def _():
                    @pl.when(t + 1 < n_tiles)
                    def _():
                        for cp in in_dma(1 - s2, t + 1):
                            cp.start()
                    vpu_part(j, t - 2)  # (t-2) % 4 == j
                    for cp in in_dma(s2, t):
                        cp.wait()
                    mxu_part(s2, s4, t)
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32((n_tiles - 2 + 3) // 4),
                          body4, jnp.int32(0))
        vpu_part((n_tiles - 2) % 4, jnp.int32(n_tiles - 2))
        vpu_part((n_tiles - 1) % 4, jnp.int32(n_tiles - 1))
        for u in (n_tiles - 2, n_tiles - 1):
            for cp in out_dma(u % 2, jnp.int32(u)):
                cp.wait()

    pl.run_scoped(
        body,
        bufs0=pltpu.VMEM((N1, 2 * LANES), jnp.float32),
        bufs1=pltpu.VMEM((N1, 2 * LANES), jnp.float32),
        c_r0=pltpu.VMEM((N1, LANES), jnp.float32),
        c_r1=pltpu.VMEM((N1, LANES), jnp.float32),
        c_r2=pltpu.VMEM((N1, LANES), jnp.float32),
        c_r3=pltpu.VMEM((N1, LANES), jnp.float32),
        c_i0=pltpu.VMEM((N1, LANES), jnp.float32),
        c_i1=pltpu.VMEM((N1, LANES), jnp.float32),
        c_i2=pltpu.VMEM((N1, LANES), jnp.float32),
        c_i3=pltpu.VMEM((N1, LANES), jnp.float32),
        outs_r0=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_r1=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_i0=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_i1=pltpu.VMEM((LANES, N1), jnp.float32),
        zb_r0=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        zb_r1=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        zb_i0=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        zb_i1=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 1)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def _pa_pipe_kernel(n1, m2, mode, sel_mode, *refs):
    """Distance-2 software-pipelined packed phase A."""
    (x2, zr, zi, zbr, zbi) = refs
    n_tiles = m2 // LANES
    T = n1 // LANES
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1
    n = n1 * m2

    def body(bufs0, bufs1, c_r0, c_r1, c_i0, c_i1,
             outs_r0, outs_r1, outs_i0, outs_i1,
             zb_r0, zb_r1, zb_i0, zb_i1, in_sems, out_sems):
        bufs = (bufs0, bufs1)
        c_r = (c_r0, c_r1)
        c_i = (c_i0, c_i1)
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
        if sel_mode == 'sel1':
            sel2 = jnp.concatenate([sel, sel], axis=0)  # (512, 256)

        def mxu_part(s, t):
            """tile t: selection + DFT -> c scratch (set s = t%2)."""
            if sel_mode == 'sel1':
                xh, xl = _split_bf16(bufs[s][:])
                eo = _dot()(jnp.concatenate([xh, xl], axis=1), sel2)
            else:
                eo = _sel_dot(bufs[s][:], sel)
            cr, ci = _dft_slab(eo[:, :LANES], eo[:, LANES:], n1, r1, r2,
                               mats1, mats2, tr, ti)
            c_r[s][:] = cr
            c_i[s][:] = ci

        def vpu_part(s, u):
            """tile u (set s = u%2): twiddle + boundary + transpose +
            out DMA. Reads c scratch written by mxu_part(s, u)."""
            col = jnp.int32(LANES) * u
            phu = jax.lax.rem(k1_io * (col + cu_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            phv = jax.lax.rem(k2r1_io * (col + cv_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            ur, ui = jnp.cos(phu), jnp.sin(phu)
            vr_, vi_ = jnp.cos(phv), jnp.sin(phv)

            @pl.when(u >= 2)
            def _():
                for cp in out_dma(s, u - 2):
                    cp.wait()

            y3r = c_r[s][:].reshape(r2, r1, LANES)
            y3i = c_i[s][:].reshape(r2, r1, LANES)
            ar_ = y3r * ur[None] - y3i * ui[None]
            ai_ = y3r * ui[None] + y3i * ur[None]
            yr = (ar_ * vr_[:, None]
                  - ai_ * vi_[:, None]).reshape(n1, LANES)
            yi = (ar_ * vi_[:, None]
                  + ai_ * vr_[:, None]).reshape(n1, LANES)
            zb_r[s][:] = jnp.concatenate(
                [yr[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            zb_i[s][:] = jnp.concatenate(
                [yi[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            for j in range(T):
                lo, hi = j * LANES, (j + 1) * LANES
                outs_r[s][:, lo:hi] = yr[lo:hi, :].T
                outs_i[s][:, lo:hi] = yi[lo:hi, :].T
            for cp in out_dma(s, u):
                cp.start()

        # prologue: tiles 0 and 1 mxu-only
        for cp in in_dma(0, jnp.int32(0)):
            cp.start()
        for cp in in_dma(1, jnp.int32(1)):
            cp.start()
        for cp in in_dma(0, jnp.int32(0)):
            cp.wait()
        mxu_part(0, jnp.int32(0))
        for cp in in_dma(1, jnp.int32(1)):
            cp.wait()
        mxu_part(1, jnp.int32(1))

        # unrolled-parity loop: tiles 2..n_tiles-1, vpu runs at dist 2
        def body2(i, carry):
            for s in (0, 1):
                t = 2 * i + s + 2

                @pl.when(t < n_tiles)
                def _():
                    for cp in in_dma(s, t):
                        cp.start()
                    # vpu for tile t-2 (same buffer set s) — issued
                    # BEFORE mxu(t); reads c_sc[s] then mxu overwrites
                    vpu_part(s, t - 2)
                    for cp in in_dma(s, t):
                        cp.wait()
                    mxu_part(s, t)
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32((n_tiles - 2 + 1) // 2),
                          body2, jnp.int32(0))
        # epilogue: vpu for the last two tiles
        vpu_part((n_tiles - 2) % 2, jnp.int32(n_tiles - 2))
        vpu_part((n_tiles - 1) % 2, jnp.int32(n_tiles - 1))
        for u in (n_tiles - 2, n_tiles - 1):
            for cp in out_dma(u % 2, jnp.int32(u)):
                cp.wait()

    pl.run_scoped(
        body,
        bufs0=pltpu.VMEM((N1, 2 * LANES), jnp.float32),
        bufs1=pltpu.VMEM((N1, 2 * LANES), jnp.float32),
        c_r0=pltpu.VMEM((N1, LANES), jnp.float32),
        c_r1=pltpu.VMEM((N1, LANES), jnp.float32),
        c_i0=pltpu.VMEM((N1, LANES), jnp.float32),
        c_i1=pltpu.VMEM((N1, LANES), jnp.float32),
        outs_r0=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_r1=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_i0=pltpu.VMEM((LANES, N1), jnp.float32),
        outs_i1=pltpu.VMEM((LANES, N1), jnp.float32),
        zb_r0=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        zb_r1=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        zb_i0=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        zb_i1=pltpu.VMEM((BREP * (N1 // LANES), LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 1)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def make_call(kern_factory):
    T = N1 // LANES

    def call(x2):
        return pl.pallas_call(
            kern_factory,
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


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N1, 2 * M2), jnp.float32)
    np.asarray(x[:1, :1])

    calls = {
        'full': make_call(
            functools.partial(_phase_a_packed_kernel, N1, M2, MODE)),
        'pipe2': make_call(
            functools.partial(_pa_pipe2_kernel, N1, M2, MODE)),
    }

    # correctness: pipe/sel1 vs full (same partial products -> exact for
    # pipe; sel1 regroups the k-accumulation -> tiny reassociation)
    ref = None
    for name, call in calls.items():
        try:
            o = jax.jit(call)(x)
            zr = np.asarray(o[0])
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f'{name}: FAILED {str(e)[:200]}', flush=True)
            calls[name] = None
            continue
        if ref is None:
            ref = zr
            print(f'{name}: ref norm {np.abs(ref).max():.3f}', flush=True)
        else:
            err = np.abs(zr - ref).max() / np.abs(ref).max()
            print(f'{name}: rel err vs full {err:.2e}', flush=True)
    calls = {k: v for k, v in calls.items() if v is not None}

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

    # interleaved round-robin marginal (m vs 2m chain calls)
    m, reps = 3, 5

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
        print(f'{name:6s} {med * 1e3:7.3f} ms/phase '
              f'(all: {[f"{x*1e3:.3f}" for x in v]})', flush=True)


if __name__ == '__main__':
    main()
