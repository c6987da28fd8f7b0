"""Fused packed half-size real FFT: rfft_n as one n/2 complex engine with
the even/odd packing and the untangle folded INTO the Pallas phases.

packed.py proved the math (T-coordinate untangle identity, exact host
phasors, the classic z[t] = x[2t] + i*x[2t+1] packing of the reference's
r2c path, dsc_fft.h:178-238) but paid ~0.74 ms of XLA deint/interleave
plus ~1 ms of XLA untangle/entangle flip passes at 2^24 — losing its
1.0-vs-1.5 MXU-unit advantage per direction. This module removes every
XLA pass (the round-4 "recorded path to the win", benchmarks/PERF.md):

  forward phase A   DMA (n1, 256) INTERLEAVED natural slabs and split
                    even/odd lanes in-kernel with the exact 0/1
                    selection matmul (0/1 is exact in bf16; the data
                    gets the usual hi/lo split — inside the kernel the
                    f32->bf16 converts are explicit Mosaic ops that
                    ROUND, so the XLA-fusion truncation trap that broke
                    packed.py's 'mm' path cannot occur). Also emits the
                    boundary columns Z[:, ::128] as a tiny side output
                    (free sublane slices of the pre-transpose slab).
  XLA glue          one batched m2-point DFT of the (T, m2) boundary
                    columns -> the mirror boundary rows Z_T[128v] that
                    tile pairing cannot see, plus the k1 = 0 untangle
                    row (exact host phasors) — O(T*m2) work on an
                    O(n1*m2) problem.
  forward phase B   processes k1-tile pairs (t, T-1-t): both DFT'd
                    slabs live in VMEM, so the hermitian untangle
                    mirror B[k] = Z[(n/2-k) mod n/2] is one sublane
                    flip (exchange matmul) over the partner tile's
                    129-row window (127 partner rows + 1 boundary row)
                    plus per-block lane flips — writing the size-n
                    half-T spectrum directly. The untangle twiddle
                    W_n^{-k} factors per 128-lane block into a per-tile
                    (128, 128) iota-trig table times a STATIC per-block
                    scalar (i32 residues are exact for pow2 n).
  inverse phase A   reads the half-T spectrum in the same paired
                    129-row windows the legacy inverse uses
                    (pallas_stream_t._inv_phase_a_t_kernel), synthesizes
                    the entangle Z = (A+conj(B))/2 + i*W*(A-conj(B))/2
                    in-kernel, then runs the m2-point inverse DFT +
                    four-step twiddle.
  inverse phase B   the half-size inverse's real plane IS the even
                    samples and its imag plane the odd samples — one
                    selection-matmul transpose interleaves them in-VMEM
                    and the output DMA writes natural (n1, 256) tiles.

HBM ledger at 2^24 (f32 planes, MiB): forward 64(r) + 64(w) + 64(r) +
68(w) = 260 vs 396 for the full-size engine; MXU ~2.0 size-n phase
equivalents per rfft/irfft pair vs 3.0.

Layout contract: output planes are bit-compatible with the half-T
layout of pallas_stream_t.fourstep_to_t_p(half=True) (cross-consumption
tested both ways in tests/test_packed_fused.py).

batch == 1 only; batched transforms keep the natural-layout path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stream import (
    LANES,
    _dft_slab,
    _ds0,
    _gen_dft_tables,
    _interpret,
    _pipe2,
    _split_bf16,
    DFT_MODE,
)
from .pallas_stream_t import (
    PAD_ROWS,
    _dot,
    _exchange,
    _flip_dot,
    nc_for,
)

# sublane replication of the boundary rows so a traced row offset stays
# 8-aligned (DMA sublane granularity)
BREP = 8


def _r1r2(nf: int):
    r1 = 1 << ((nf.bit_length() - 1) // 2)
    return r1, nf // r1


def _sel_even_odd(transpose: bool):
    """In-kernel (256, 256) 0/1 selection matrix from iotas: columns
    0..127 pick even lanes, 128..255 odd (transpose=False); its
    transpose re-interleaves ([e | o] @ P^T). 0/1 is exact in bf16."""
    i = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, 2 * LANES), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, 2 * LANES), 1)
    if transpose:
        i, j = j, i
    jm = jax.lax.rem(j, jnp.int32(LANES))
    jd = j // jnp.int32(LANES)
    return (i == 2 * jm + jd).astype(jnp.bfloat16)


def _sel_dot(x, sel):
    """x (rows, 256) f32 @ sel (256, 256) 0/1-bf16, exact to the hi/lo
    split residual (~2^-16 relative): in-kernel converts ROUND."""
    dot = _dot()
    xh, xl = _split_bf16(x)
    return dot(xh, sel) + dot(xl, sel)


# ---------------------------------------------------------------------------
# forward phase A: natural x (n1, 2*m2) -> Z (m2, n1) + boundary cols
# ---------------------------------------------------------------------------


def _phase_a_packed_kernel(n1, m2, mode, *refs):
    """Interleaved slab DMA + in-kernel even/odd selection + the
    half-size engine's column DFT / four-step twiddle / transpose.
    Side output: zb (BREP*T, m2) holding the pre-transpose slab rows
    ::128 — i.e. the boundary columns Z[:, 128j] phase B's tile pairing
    cannot reach (row group j's first row is the data; the other
    BREP-1 rows are alignment filler)."""
    (x2, zr, zi, zbr, zbi) = refs
    n_tiles = m2 // LANES
    T = n1 // LANES
    r1, r2 = _r1r2(n1)
    n = n1 * m2  # twiddle period of the half-size engine

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

            # even/odd split: z = x[2t] + i*x[2t+1]
            eo = _sel_dot(bufs[s][:], sel)
            cr, ci = _dft_slab(eo[:, :LANES], eo[:, LANES:], n1, r1, r2,
                               mats1, mats2, tr, ti)
            y3r = cr.reshape(r2, r1, LANES)
            y3i = ci.reshape(r2, r1, LANES)
            ar_ = y3r * ur[None] - y3i * ui[None]
            ai_ = y3r * ui[None] + y3i * ur[None]
            yr = (ar_ * vr_[:, None]
                  - ai_ * vi_[:, None]).reshape(n1, LANES)
            yi = (ar_ * vi_[:, None]
                  + ai_ * vr_[:, None]).reshape(n1, LANES)
            # boundary side rows: pre-transpose rows ::128 hold
            # Z[j2-tile, 128j] (aligned 8-row chunks; row 0 of each is
            # the payload)
            zb_r[s][:] = jnp.concatenate(
                [yr[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            zb_i[s][:] = jnp.concatenate(
                [yi[j * LANES:j * LANES + BREP, :] for j in range(T)],
                axis=0)
            for j in range(n1 // LANES):
                lo, hi = j * LANES, (j + 1) * LANES
                outs_r[s][:, lo:hi] = yr[lo:hi, :].T
                outs_i[s][:, lo:hi] = yi[lo:hi, :].T
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
        bufs0=pltpu.VMEM((n1, 2 * LANES), jnp.float32),
        bufs1=pltpu.VMEM((n1, 2 * LANES), jnp.float32),
        outs_r0=pltpu.VMEM((LANES, n1), jnp.float32),
        outs_r1=pltpu.VMEM((LANES, n1), jnp.float32),
        outs_i0=pltpu.VMEM((LANES, n1), jnp.float32),
        outs_i1=pltpu.VMEM((LANES, n1), jnp.float32),
        zb_r0=pltpu.VMEM((BREP * (n1 // LANES), LANES), jnp.float32),
        zb_r1=pltpu.VMEM((BREP * (n1 // LANES), LANES), jnp.float32),
        zb_i0=pltpu.VMEM((BREP * (n1 // LANES), LANES), jnp.float32),
        zb_i1=pltpu.VMEM((BREP * (n1 // LANES), LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 1)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


# ---------------------------------------------------------------------------
# forward phase B: Z (m2, n1) + boundary rows -> X half-T (n1 + pad, nc)
# ---------------------------------------------------------------------------


def _phase_b_t_packed_kernel(n1, m2, mode, *refs):
    """Row DFT of k1-tile PAIRS (t, T-1-t) + in-kernel hermitian
    untangle + contiguous half-T row-tile writes.

    The mirror operand B[k1, k2] = Z_T[n1-k1, (m2-1-k2) mod m2] for an
    output tile needs the PARTNER tile's rows 1..127 (in VMEM, just
    DFT'd) plus ONE boundary row Z_T[128v] (v = T-u and u+1 for the two
    members) delivered via bnd8 (XLA-precomputed, see module doc). The
    k1 = 0 row's different mirror (same-row, one-column shift) arrives
    precomputed as fx and is blended with an iota-folded row test
    (scalar broadcasts have no Mosaic lowering — see pallas_stream_t
    notes)."""
    (zr, zi, bn8r, bn8i, fxr, fxi, hr, hi) = refs
    T = n1 // LANES
    K = m2 // LANES
    nc = m2 + LANES
    r1, r2 = _r1r2(m2)
    n_units = T // 2
    n = 2 * n1 * m2  # FULL transform length (untangle twiddle period)

    def body(wa_r0, wa_r1, wa_i0, wa_i1, wb_r0, wb_r1, wb_i0, wb_i1,
             ba_r0, ba_r1, ba_i0, ba_i1, bb_r0, bb_r1, bb_i0, bb_i1,
             fix_r, fix_i, outs_r0, outs_r1, outs_i0, outs_i1,
             in_sems, out_sems, fix_sems):
        wa_r = (wa_r0, wa_r1)
        wa_i = (wa_i0, wa_i1)
        wb_r = (wb_r0, wb_r1)
        wb_i = (wb_i0, wb_i1)
        ba_r = (ba_r0, ba_r1)
        ba_i = (ba_i0, ba_i1)
        bb_r = (bb_r0, bb_r1)
        bb_i = (bb_i0, bb_i1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)

        fcps = [
            pltpu.make_async_copy(fxr, fix_r, fix_sems.at[jnp.int32(0)]),
            pltpu.make_async_copy(fxi, fix_i, fix_sems.at[jnp.int32(1)]),
        ]
        for cp in fcps:
            cp.start()
        for cp in fcps:
            cp.wait()

        def in_dma(s, u):
            ca = u * jnp.int32(LANES)
            cb = jnp.int32((T - 1) * LANES) - u * jnp.int32(LANES)
            # boundary rows: member1 (tile u) mirrors into Z_T[128(T-u)],
            # member2 (tile T-1-u) into Z_T[128(u+1)]
            va = jax.lax.rem(jnp.int32(T) - u, jnp.int32(T)) \
                * jnp.int32(BREP)
            vb = (u + jnp.int32(1)) * jnp.int32(BREP)
            cps = []
            for k, (coff, dst_r, dst_i, voff, bdst_r, bdst_i) in enumerate((
                (ca, wa_r[s], wa_i[s], va, ba_r[s], ba_i[s]),
                (cb, wb_r[s], wb_i[s], vb, bb_r[s], bb_i[s]),
            )):
                off = pl.multiple_of(coff, LANES)
                cps.append(pltpu.make_async_copy(
                    zr.at[_ds0(m2), pl.ds(off, LANES)], dst_r,
                    in_sems.at[jnp.int32(s), jnp.int32(4 * k)]))
                cps.append(pltpu.make_async_copy(
                    zi.at[_ds0(m2), pl.ds(off, LANES)], dst_i,
                    in_sems.at[jnp.int32(s), jnp.int32(4 * k + 1)]))
                bo = pl.multiple_of(voff, BREP)
                cps.append(pltpu.make_async_copy(
                    bn8r.at[pl.ds(bo, BREP), _ds0(m2)], bdst_r,
                    in_sems.at[jnp.int32(s), jnp.int32(4 * k + 2)]))
                cps.append(pltpu.make_async_copy(
                    bn8i.at[pl.ds(bo, BREP), _ds0(m2)], bdst_i,
                    in_sems.at[jnp.int32(s), jnp.int32(4 * k + 3)]))
            return cps

        def out_dma(s, u):
            ra = u * jnp.int32(LANES)
            rb = jnp.int32((T - 1) * LANES) - u * jnp.int32(LANES)
            cps = []
            for k, roff in enumerate((ra, rb)):
                off = pl.multiple_of(roff, LANES)
                src = pl.ds(k * LANES, LANES)
                cps.append(pltpu.make_async_copy(
                    outs_r[s].at[src, :], hr.at[pl.ds(off, LANES), _ds0(nc)],
                    out_sems.at[jnp.int32(s), jnp.int32(2 * k)]))
                cps.append(pltpu.make_async_copy(
                    outs_i[s].at[src, :], hi.at[pl.ds(off, LANES), _ds0(nc)],
                    out_sems.at[jnp.int32(s), jnp.int32(2 * k + 1)]))
            return cps

        mats1, mats2, tr, ti = _gen_dft_tables(m2, r1, r2, -1, mode)
        e128 = _exchange(LANES, jnp.bfloat16)
        # untangle twiddle W_n^{-(k1 + n1*k2)} factored per 128-lane
        # block: U[i, l] = W_n^{-(128t + i + n1*l)} (per-tile iota trig,
        # exact i32 residues) times static s_j = W_n^{-n1*128*j}
        two_pi_over_n = jnp.float32(-2.0 * np.pi / n)
        row_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        lane_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        sj = [(float(np.cos(-2.0 * np.pi * (n1 * LANES * j % n) / n)),
               float(np.sin(-2.0 * np.pi * (n1 * LANES * j % n) / n)))
              for j in range(K + 1)]

        def member(s, u, first, c_r, c_i, p_r, p_i, bndr, bndi, t):
            """One output tile (128, nc) from its own DFT'd slab (c_*,
            (m2, 128)), the partner's transposed tile (p_*, (128, m2)),
            and the boundary row."""
            # direct tile, transposed blocks
            d_r = jnp.concatenate(
                [c_r[j * LANES:(j + 1) * LANES, :].T for j in range(K)],
                axis=1)
            d_i = jnp.concatenate(
                [c_i[j * LANES:(j + 1) * LANES, :].T for j in range(K)],
                axis=1)
            # mirror row window: partner rows 1..127 + the boundary row,
            # sublane-flipped: F[i] = Z_T[n1 - 128t - i]
            s_r = jnp.concatenate([p_r[1:LANES, :], bndr[0:1, :]], axis=0)
            s_i = jnp.concatenate([p_i[1:LANES, :], bndi[0:1, :]], axis=0)
            f_r = _flip_dot(e128, s_r)
            f_i = _flip_dot(e128, s_i)
            ph = jax.lax.rem(
                row_io + jnp.int32(LANES) * t + jnp.int32(n1) * lane_io,
                jnp.int32(n)).astype(jnp.float32) * two_pi_over_n
            u_r, u_i = jnp.cos(ph), jnp.sin(ph)
            blocks_r = []
            blocks_i = []
            for j in range(K + 1):
                jj = j % K
                a_r = d_r[:, jj * LANES:(jj + 1) * LANES]
                a_i = d_i[:, jj * LANES:(jj + 1) * LANES]
                src = K - 1 - jj
                m_r = _flip_dot(
                    e128, f_r[:, src * LANES:(src + 1) * LANES], right=True)
                m_i = _flip_dot(
                    e128, f_i[:, src * LANES:(src + 1) * LANES], right=True)
                er = 0.5 * (a_r + m_r)
                ei = 0.5 * (a_i - m_i)
                dr = 0.5 * (a_r - m_r)
                di = 0.5 * (a_i + m_i)
                sr_, si_ = sj[j]
                w_r = jnp.float32(sr_) * u_r - jnp.float32(si_) * u_i
                w_i = jnp.float32(sr_) * u_i + jnp.float32(si_) * u_r
                h_r = er + w_r * di + w_i * dr
                h_i = ei - (w_r * dr - w_i * di)
                if first:
                    # k1 = 0 (pair 0, member 1, row 0): blended
                    # precomputed row — (u==0 AND i==0) via iota fold
                    cond = (row_io + jnp.int32(LANES) * u) == 0
                    h_r = jnp.where(
                        cond,
                        jnp.broadcast_to(
                            fix_r[0:1, j * LANES:(j + 1) * LANES],
                            (LANES, LANES)),
                        h_r)
                    h_i = jnp.where(
                        cond,
                        jnp.broadcast_to(
                            fix_i[0:1, j * LANES:(j + 1) * LANES],
                            (LANES, LANES)),
                        h_i)
                blocks_r.append(h_r)
                blocks_i.append(h_i)
            return (jnp.concatenate(blocks_r, axis=1),
                    jnp.concatenate(blocks_i, axis=1))

        def step(s, u):
            @pl.when(u >= 2)
            def _():
                for cp in out_dma(s, u - 2):
                    cp.wait()

            ca_r, ca_i = _dft_slab(wa_r[s][:], wa_i[s][:], m2, r1, r2,
                                   mats1, mats2, tr, ti)
            cb_r, cb_i = _dft_slab(wb_r[s][:], wb_i[s][:], m2, r1, r2,
                                   mats1, mats2, tr, ti)
            tb_r = jnp.concatenate(
                [cb_r[j * LANES:(j + 1) * LANES, :].T for j in range(K)],
                axis=1)
            tb_i = jnp.concatenate(
                [cb_i[j * LANES:(j + 1) * LANES, :].T for j in range(K)],
                axis=1)
            ta_r = jnp.concatenate(
                [ca_r[j * LANES:(j + 1) * LANES, :].T for j in range(K)],
                axis=1)
            ta_i = jnp.concatenate(
                [ca_i[j * LANES:(j + 1) * LANES, :].T for j in range(K)],
                axis=1)
            for k, (first, c_r, c_i, p_r, p_i, bndr, bndi, t) in enumerate((
                (True, ca_r, ca_i, tb_r, tb_i, ba_r[s], ba_i[s], u),
                (False, cb_r, cb_i, ta_r, ta_i, bb_r[s], bb_i[s],
                 jnp.int32(T - 1) - u),
            )):
                o_r, o_i = member(s, u, first, c_r, c_i, p_r, p_i,
                                  bndr, bndi, t)
                outs_r[s][k * LANES:(k + 1) * LANES, :] = o_r
                outs_i[s][k * LANES:(k + 1) * LANES, :] = o_i
            for cp in out_dma(s, u):
                cp.start()

        _pipe2(
            n_units,
            lambda s, u: [cp.start() for cp in in_dma(s, u)],
            lambda s, u: [cp.wait() for cp in in_dma(s, u)],
            step,
            lambda s, u: [cp.wait() for cp in out_dma(s, u)],
        )

    pl.run_scoped(
        body,
        wa_r0=pltpu.VMEM((m2, LANES), jnp.float32),
        wa_r1=pltpu.VMEM((m2, LANES), jnp.float32),
        wa_i0=pltpu.VMEM((m2, LANES), jnp.float32),
        wa_i1=pltpu.VMEM((m2, LANES), jnp.float32),
        wb_r0=pltpu.VMEM((m2, LANES), jnp.float32),
        wb_r1=pltpu.VMEM((m2, LANES), jnp.float32),
        wb_i0=pltpu.VMEM((m2, LANES), jnp.float32),
        wb_i1=pltpu.VMEM((m2, LANES), jnp.float32),
        ba_r0=pltpu.VMEM((BREP, m2), jnp.float32),
        ba_r1=pltpu.VMEM((BREP, m2), jnp.float32),
        ba_i0=pltpu.VMEM((BREP, m2), jnp.float32),
        ba_i1=pltpu.VMEM((BREP, m2), jnp.float32),
        bb_r0=pltpu.VMEM((BREP, m2), jnp.float32),
        bb_r1=pltpu.VMEM((BREP, m2), jnp.float32),
        bb_i0=pltpu.VMEM((BREP, m2), jnp.float32),
        bb_i1=pltpu.VMEM((BREP, m2), jnp.float32),
        fix_r=pltpu.VMEM((BREP, nc), jnp.float32),
        fix_i=pltpu.VMEM((BREP, nc), jnp.float32),
        outs_r0=pltpu.VMEM((2 * LANES, nc), jnp.float32),
        outs_r1=pltpu.VMEM((2 * LANES, nc), jnp.float32),
        outs_i0=pltpu.VMEM((2 * LANES, nc), jnp.float32),
        outs_i1=pltpu.VMEM((2 * LANES, nc), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 8)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
        fix_sems=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# inverse phase A: X half-T (n1 + pad, nc) -> Z' tile-blocked (n/2/128, 128)
# ---------------------------------------------------------------------------


def _inv_phase_a_t_packed_kernel(n1, m2, mode, *refs):
    """Paired 129-row window reads of the half-T spectrum (the legacy
    inverse's DMA pattern), in-kernel ENTANGLE synthesis
    Z = (A + conj(B))/2 + i*W+*(A - conj(B))/2 (the packed inverse's
    combine, packed.py irfft_from_half_t_packed), then the m2-point
    inverse DFT + four-step twiddle to tile-blocked Z'."""
    (hr, hi, fxr, fxi, zr, zi) = refs
    T = n1 // LANES
    K = m2 // LANES
    nc = m2 + LANES
    r1, r2 = _r1r2(m2)
    n_units = T // 2
    n = 2 * n1 * m2
    nh = n1 * m2

    def body(wa_r0, wa_r1, wa_i0, wa_i1, wb_r0, wb_r1, wb_i0, wb_i1,
             ea_r0, ea_r1, ea_i0, ea_i1, eb_r0, eb_r1, eb_i0, eb_i1,
             fix_r, fix_i, outs_r0, outs_r1, outs_i0, outs_i1,
             in_sems, out_sems, fix_sems):
        wa_r = (wa_r0, wa_r1)
        wa_i = (wa_i0, wa_i1)
        wb_r = (wb_r0, wb_r1)
        wb_i = (wb_i0, wb_i1)
        ea_r = (ea_r0, ea_r1)
        ea_i = (ea_i0, ea_i1)
        eb_r = (eb_r0, eb_r1)
        eb_i = (eb_i0, eb_i1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)

        fcps = [
            pltpu.make_async_copy(fxr, fix_r, fix_sems.at[jnp.int32(0)]),
            pltpu.make_async_copy(fxi, fix_i, fix_sems.at[jnp.int32(1)]),
        ]
        for cp in fcps:
            cp.start()
        for cp in fcps:
            cp.wait()

        def in_dma(s, u):
            ra = u * jnp.int32(LANES)
            rb = jnp.int32((T - 1) * LANES) - u * jnp.int32(LANES)
            cps = []
            for k, (row0, dst_r, dst_i, ext_r, ext_i) in enumerate(
                ((ra, wa_r[s], wa_i[s], ea_r[s], ea_i[s]),
                 (rb, wb_r[s], wb_i[s], eb_r[s], eb_i[s]))
            ):
                roff = pl.multiple_of(row0, LANES)
                cps.append(pltpu.make_async_copy(
                    hr.at[pl.ds(roff, LANES), _ds0(nc)], dst_r,
                    in_sems.at[jnp.int32(s), jnp.int32(2 * k)]))
                cps.append(pltpu.make_async_copy(
                    hi.at[pl.ds(roff, LANES), _ds0(nc)], dst_i,
                    in_sems.at[jnp.int32(s), jnp.int32(2 * k + 1)]))
                eoff = pl.multiple_of(row0 + jnp.int32(LANES), PAD_ROWS)
                cps.append(pltpu.make_async_copy(
                    hr.at[pl.ds(eoff, PAD_ROWS), _ds0(nc)], ext_r,
                    in_sems.at[jnp.int32(s), jnp.int32(4 + 2 * k)]))
                cps.append(pltpu.make_async_copy(
                    hi.at[pl.ds(eoff, PAD_ROWS), _ds0(nc)], ext_i,
                    in_sems.at[jnp.int32(s), jnp.int32(5 + 2 * k)]))
            return cps

        def out_dma(s, u):
            ta = u * jnp.int32(m2)
            tb = jnp.int32((T - 1) * m2) - u * jnp.int32(m2)
            cps = []
            for k, roff in enumerate((ta, tb)):
                off = pl.multiple_of(roff, m2)
                cps.append(pltpu.make_async_copy(
                    outs_r[s].at[pl.ds(k * m2, m2), :],
                    zr.at[pl.ds(off, m2), :],
                    out_sems.at[jnp.int32(s), jnp.int32(2 * k)]))
                cps.append(pltpu.make_async_copy(
                    outs_i[s].at[pl.ds(k * m2, m2), :],
                    zi.at[pl.ds(off, m2), :],
                    out_sems.at[jnp.int32(s), jnp.int32(2 * k + 1)]))
            return cps

        mats1, mats2, tr, ti = _gen_dft_tables(m2, r1, r2, 1, mode)
        e128 = _exchange(LANES, jnp.bfloat16)
        two_pi_over_n = jnp.float32(2.0 * np.pi / n)
        row_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        lane_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        row_iom = jax.lax.broadcasted_iota(jnp.int32, (LANES, m2), 0)
        sj = [(float(np.cos(2.0 * np.pi * (n1 * LANES * j % n) / n)),
               float(np.sin(2.0 * np.pi * (n1 * LANES * j % n) / n)))
              for j in range(K)]
        # four-step twiddle of the half-size inverse (period nh)
        tp_nh = jnp.float32(2.0 * np.pi / nh)
        b_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 0)
        cu_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 1)
        ar1_io = jax.lax.broadcasted_iota(
            jnp.int32, (r2, LANES), 0) * jnp.int32(r1)
        cv_io = jax.lax.broadcasted_iota(jnp.int32, (r2, LANES), 1)

        def member(u, first, d_r, d_i, p_r, p_i, pe_r, pe_i, t):
            """Entangled (m2, 128) transposed slab for one tile."""
            src_r = jnp.concatenate([p_r[1:LANES, :m2], pe_r[0:1, :m2]],
                                    axis=0)
            src_i = jnp.concatenate([p_i[1:LANES, :m2], pe_i[0:1, :m2]],
                                    axis=0)
            if first:
                # unit 0's partner extension row is storage row n1 — a
                # PAD row backing only the k1=0 special (replaced by the
                # fix blend): zero it so NaN*0 cannot poison the flip
                # matmul
                gcond = (jnp.int32(LANES - 1) - row_iom
                         + jnp.int32(LANES) * u) == 0
                src_r = jnp.where(gcond, 0.0, src_r)
                src_i = jnp.where(gcond, 0.0, src_i)
            f_r = _flip_dot(e128, src_r)
            f_i = _flip_dot(e128, src_i)
            ph = jax.lax.rem(
                row_io + jnp.int32(LANES) * t + jnp.int32(n1) * lane_io,
                jnp.int32(n)).astype(jnp.float32) * two_pi_over_n
            u_r, u_i = jnp.cos(ph), jnp.sin(ph)
            blocks_r = []
            blocks_i = []
            for j in range(K):
                a_r = d_r[:, j * LANES:(j + 1) * LANES]
                a_i = d_i[:, j * LANES:(j + 1) * LANES]
                src = K - 1 - j
                m_r = _flip_dot(
                    e128, f_r[:, src * LANES:(src + 1) * LANES], right=True)
                m_i = _flip_dot(
                    e128, f_i[:, src * LANES:(src + 1) * LANES], right=True)
                if first:
                    cond = (row_io + jnp.int32(LANES) * u) == 0
                    m_r = jnp.where(
                        cond,
                        jnp.broadcast_to(
                            fix_r[0:1, j * LANES:(j + 1) * LANES],
                            (LANES, LANES)),
                        m_r)
                    m_i = jnp.where(
                        cond,
                        jnp.broadcast_to(
                            fix_i[0:1, j * LANES:(j + 1) * LANES],
                            (LANES, LANES)),
                        m_i)
                er = 0.5 * (a_r + m_r)
                ei = 0.5 * (a_i - m_i)
                dr = 0.5 * (a_r - m_r)
                di = 0.5 * (a_i + m_i)
                sr_, si_ = sj[j]
                w_r = jnp.float32(sr_) * u_r - jnp.float32(si_) * u_i
                w_i = jnp.float32(sr_) * u_i + jnp.float32(si_) * u_r
                z_r = er - (w_r * di + w_i * dr)
                z_i = ei + (w_r * dr - w_i * di)
                blocks_r.append(z_r.T)
                blocks_i.append(z_i.T)
            return (jnp.concatenate(blocks_r, axis=0),
                    jnp.concatenate(blocks_i, axis=0))

        def step(s, u):
            @pl.when(u >= 2)
            def _():
                for cp in out_dma(s, u - 2):
                    cp.wait()

            for k, (first, d_r, d_i, p_r, p_i, pe_r, pe_i, t) in enumerate((
                (True, wa_r[s], wa_i[s], wb_r[s], wb_i[s],
                 eb_r[s], eb_i[s], u),
                (False, wb_r[s], wb_i[s], wa_r[s], wa_i[s],
                 ea_r[s], ea_i[s], jnp.int32(T - 1) - u),
            )):
                s_r, s_i = member(u, first, d_r, d_i, p_r, p_i,
                                  pe_r, pe_i, t)
                c_r, c_i = _dft_slab(s_r, s_i, m2, r1, r2,
                                     mats1, mats2, tr, ti)
                col = jnp.int32(LANES) * t
                phu = jax.lax.rem(b_io * (col + cu_io), jnp.int32(nh)) \
                    .astype(jnp.float32) * tp_nh
                phv = jax.lax.rem(ar1_io * (col + cv_io), jnp.int32(nh)) \
                    .astype(jnp.float32) * tp_nh
                ur, ui = jnp.cos(phu), jnp.sin(phu)
                vr_, vi_ = jnp.cos(phv), jnp.sin(phv)
                y3r = c_r.reshape(r2, r1, LANES)
                y3i = c_i.reshape(r2, r1, LANES)
                ar_ = y3r * ur[None] - y3i * ui[None]
                ai_ = y3r * ui[None] + y3i * ur[None]
                yr = (ar_ * vr_[:, None]
                      - ai_ * vi_[:, None]).reshape(m2, LANES)
                yi = (ar_ * vi_[:, None]
                      + ai_ * vr_[:, None]).reshape(m2, LANES)
                outs_r[s][k * m2:(k + 1) * m2, :] = yr
                outs_i[s][k * m2:(k + 1) * m2, :] = yi
            for cp in out_dma(s, u):
                cp.start()

        _pipe2(
            n_units,
            lambda s, u: [cp.start() for cp in in_dma(s, u)],
            lambda s, u: [cp.wait() for cp in in_dma(s, u)],
            step,
            lambda s, u: [cp.wait() for cp in out_dma(s, u)],
        )

    pl.run_scoped(
        body,
        wa_r0=pltpu.VMEM((LANES, nc), jnp.float32),
        wa_r1=pltpu.VMEM((LANES, nc), jnp.float32),
        wa_i0=pltpu.VMEM((LANES, nc), jnp.float32),
        wa_i1=pltpu.VMEM((LANES, nc), jnp.float32),
        wb_r0=pltpu.VMEM((LANES, nc), jnp.float32),
        wb_r1=pltpu.VMEM((LANES, nc), jnp.float32),
        wb_i0=pltpu.VMEM((LANES, nc), jnp.float32),
        wb_i1=pltpu.VMEM((LANES, nc), jnp.float32),
        ea_r0=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        ea_r1=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        ea_i0=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        ea_i1=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        eb_r0=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        eb_r1=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        eb_i0=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        eb_i1=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        fix_r=pltpu.VMEM((BREP, m2), jnp.float32),
        fix_i=pltpu.VMEM((BREP, m2), jnp.float32),
        outs_r0=pltpu.VMEM((2 * m2, LANES), jnp.float32),
        outs_r1=pltpu.VMEM((2 * m2, LANES), jnp.float32),
        outs_i0=pltpu.VMEM((2 * m2, LANES), jnp.float32),
        outs_i1=pltpu.VMEM((2 * m2, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 8)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
        fix_sems=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# inverse phase B: Z' tile-blocked -> y natural (n1, 2*m2), interleaved
# ---------------------------------------------------------------------------


def _inv_phase_b_zp_packed_kernel(n1, m2, scale, mode, *refs):
    """n1-point inverse DFT per column tile; the result's real plane is
    the even output samples and its imag plane the odd samples — one
    selection-matmul transpose interleaves them and the output DMA
    writes natural (n1, 256) tiles."""
    (zr, zi, yo) = refs
    T = n1 // LANES
    n_tiles = m2 // LANES
    r1, r2 = _r1r2(n1)

    def body(bufs_r0, bufs_r1, bufs_i0, bufs_i1,
             outs0, outs1, in_sems, out_sems):
        bufs_r = (bufs_r0, bufs_r1)
        bufs_i = (bufs_i0, bufs_i1)
        outs = (outs0, outs1)

        def in_dma(s, t):
            cps = []
            for tb in range(T):
                off = pl.multiple_of(
                    jnp.int32(tb * m2) + t * jnp.int32(LANES), LANES)
                dst = pl.ds(tb * LANES, LANES)
                cps.append(pltpu.make_async_copy(
                    zr.at[pl.ds(off, LANES), :], bufs_r[s].at[dst, :],
                    in_sems.at[jnp.int32(s), jnp.int32(0), jnp.int32(tb)]))
                cps.append(pltpu.make_async_copy(
                    zi.at[pl.ds(off, LANES), :], bufs_i[s].at[dst, :],
                    in_sems.at[jnp.int32(s), jnp.int32(1), jnp.int32(tb)]))
            return cps

        def out_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(2 * LANES), 2 * LANES)
            return [pltpu.make_async_copy(
                outs[s], yo.at[_ds0(n1), pl.ds(off, 2 * LANES)],
                out_sems.at[jnp.int32(s)])]

        mats1, mats2, tr, ti = _gen_dft_tables(n1, r1, r2, 1, mode)
        sel_t = _sel_even_odd(True)

        def step(s, t):
            sr = jnp.concatenate(
                [bufs_r[s][tb * LANES:(tb + 1) * LANES, :].T
                 for tb in range(T)], axis=0)
            si = jnp.concatenate(
                [bufs_i[s][tb * LANES:(tb + 1) * LANES, :].T
                 for tb in range(T)], axis=0)
            cr, ci = _dft_slab(sr, si, n1, r1, r2, mats1, mats2, tr, ti)

            @pl.when(t >= 2)
            def _():
                for cp in out_dma(s, t - 2):
                    cp.wait()

            sc = jnp.float32(scale)
            eo = jnp.concatenate([cr * sc, ci * sc], axis=1)
            outs[s][:] = _sel_dot(eo, sel_t)
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
        bufs_r0=pltpu.VMEM((n1, LANES), jnp.float32),
        bufs_r1=pltpu.VMEM((n1, LANES), jnp.float32),
        bufs_i0=pltpu.VMEM((n1, LANES), jnp.float32),
        bufs_i1=pltpu.VMEM((n1, LANES), jnp.float32),
        outs0=pltpu.VMEM((n1, 2 * LANES), jnp.float32),
        outs1=pltpu.VMEM((n1, 2 * LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2, T)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def _vmem_fused(nf: int) -> int:
    return min(max(48 * 2**20, 32 * nf * LANES * 4), 110 * 2**20)


@functools.lru_cache(maxsize=8)
def _host_w_row(nc: int, m2: int, sign: float):
    """k1 = 0 untangle twiddle row W^{sign*n1*k2/n} = W_{2*m2}^{sign*k2}
    (host f64 trig, exact static data)."""
    th = sign * np.pi / m2 * np.arange(nc, dtype=np.float64)
    return (np.cos(th).astype(np.float32)[None, :],
            np.sin(th).astype(np.float32)[None, :])


def _pext(p: jax.Array, ncols: int) -> jax.Array:
    m = p.shape[1]
    if ncols <= m:
        return p[:, :ncols]
    return jnp.concatenate([p, p[:, :ncols - m]], axis=1)


def rfft_half_t_packed_fused(x: jax.Array, n1: int, n2: int,
                             mode: Optional[str] = None):
    """(n,) f32 -> hermitian-half T-layout planes (n1 + PAD_ROWS, nc),
    bit-compatible with pallas_stream_t.fourstep_to_t_p(half=True)."""
    from . import core, plan

    mode = mode or DFT_MODE
    m2 = n2 // 2
    n = n1 * n2
    T = n1 // LANES
    nc = nc_for(n2, True)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    interp = _interpret()

    kernel_a = functools.partial(_phase_a_packed_kernel, n1, m2, mode)
    zr, zi, zbr, zbi = pl.pallas_call(
        kernel_a,
        in_specs=[anyspec],
        out_specs=(anyspec,) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((m2, n1), jnp.float32),
            jax.ShapeDtypeStruct((m2, n1), jnp.float32),
            jax.ShapeDtypeStruct((BREP * T, m2), jnp.float32),
            jax.ShapeDtypeStruct((BREP * T, m2), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_fused(n1)),
        interpret=interp,
    )(x.reshape(n1, n2))

    # boundary rows Z_T[128v] = DFT_m2 of the boundary columns (XLA-side
    # batched small FFT with f64-exact plan twiddles), replicated to
    # 8-row groups so the kernel's traced offsets stay sublane-aligned
    zb_r = zbr.reshape(T, BREP, m2)[:, 0, :]
    zb_i = zbi.reshape(T, BREP, m2)[:, 0, :]
    spec, tables = plan.get_plan(m2, 'complex', np.complex64)
    bnd_r, bnd_i = core.fft_apply_p(zb_r, zb_i, spec, tables)
    bn8r = jnp.broadcast_to(bnd_r[:, None, :],
                            (T, BREP, m2)).reshape(BREP * T, m2)
    bn8i = jnp.broadcast_to(bnd_i[:, None, :],
                            (T, BREP, m2)).reshape(BREP * T, m2)

    # k1 = 0 untangle row (its mirror is the SAME row shifted one
    # column — a cross-block lane shift no Mosaic op expresses)
    a0r, a0i = _pext(bnd_r[0:1], nc), _pext(bnd_i[0:1], nc)
    b0r = _pext(jnp.concatenate(
        [bnd_r[0:1, 0:1], bnd_r[0:1, 1:][:, ::-1]], axis=1), nc)
    b0i = _pext(jnp.concatenate(
        [bnd_i[0:1, 0:1], bnd_i[0:1, 1:][:, ::-1]], axis=1), nc)
    er = 0.5 * (a0r + b0r)
    ei = 0.5 * (a0i - b0i)
    dr = 0.5 * (a0r - b0r)
    di = 0.5 * (a0i + b0i)
    wr, wi = map(jnp.asarray, _host_w_row(nc, m2, -1.0))
    fr0 = er + wr * di + wi * dr
    fi0 = ei - (wr * dr - wi * di)
    fxr = jnp.broadcast_to(fr0, (BREP, nc))
    fxi = jnp.broadcast_to(fi0, (BREP, nc))

    kernel_b = functools.partial(_phase_b_t_packed_kernel, n1, m2, mode)
    hr, hi = pl.pallas_call(
        kernel_b,
        in_specs=[anyspec] * 6,
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((n1 + PAD_ROWS, nc), jnp.float32),
            jax.ShapeDtypeStruct((n1 + PAD_ROWS, nc), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_fused(2 * m2)),
        interpret=interp,
    )(zr, zi, bn8r, bn8i, fxr, fxi)
    return hr, hi


def irfft_from_half_t_packed_fused(hr: jax.Array, hi: jax.Array,
                                   n1: int, n2: int,
                                   mode: Optional[str] = None):
    """Hermitian-half T-layout planes -> (n,) real inverse (1/n scaled
    overall: irfft(rfft(x)) == x)."""
    mode = mode or DFT_MODE
    m2 = n2 // 2
    n = n1 * n2
    nc = nc_for(n2, True)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    interp = _interpret()

    # k1 = 0 entangle mirror row B[0, c] = X_T[0, (m2 - c) mod m2]
    # (uses the stored Nyquist column m2) — a one-column shifted
    # reversal, precomputed XLA-side like the legacy inverse's fix row
    b0r = jnp.concatenate([hr[0:1, m2:m2 + 1], hr[0:1, 1:m2][:, ::-1]],
                          axis=1)
    b0i = jnp.concatenate([hi[0:1, m2:m2 + 1], hi[0:1, 1:m2][:, ::-1]],
                          axis=1)
    fxr = jnp.broadcast_to(b0r, (BREP, m2))
    fxi = jnp.broadcast_to(b0i, (BREP, m2))

    kernel_a = functools.partial(_inv_phase_a_t_packed_kernel, n1, m2, mode)
    zp_rows = (n1 * m2) // LANES
    zr, zi = pl.pallas_call(
        kernel_a,
        in_specs=[anyspec] * 4,
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((zp_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((zp_rows, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_fused(2 * m2)),
        interpret=interp,
    )(hr, hi, fxr, fxi)

    kernel_b = functools.partial(
        _inv_phase_b_zp_packed_kernel, n1, m2, 1.0 / (n1 * m2), mode)
    (yo,) = pl.pallas_call(
        kernel_b,
        in_specs=[anyspec] * 2,
        out_specs=(anyspec,),
        out_shape=(jax.ShapeDtypeStruct((n1, n2), jnp.float32),),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_fused(n1)),
        interpret=interp,
    )(zr, zi)
    return yo.reshape(n)


def supported(n1: int, n2: int) -> bool:
    """Inner factors (n1, n2/2) must be streaming-legal, the tile-pair
    loop needs T/2 even units, and the selection works on 256-lane
    natural tiles."""
    from . import pallas_stream

    m2 = n2 // 2
    return (
        pallas_stream.supported(n1, m2, np.complex64)
        and n1 % (4 * LANES) == 0      # T/2 even (pipe2 double-buffer)
        and m2 % (2 * LANES) == 0      # phase A/B tile counts even
    )
