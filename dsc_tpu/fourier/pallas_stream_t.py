"""Transposed / hermitian-half spectrum layout for the streaming FFT.

The natural-layout streaming kernels (pallas_stream.py) end the forward
pass with a strided write — slab (n2, 128) into X(n2, n1)[:, k1-tile],
512-byte rows — and the inverse starts by re-reading the full n-point
spectrum. This module changes the SPECTRUM layout instead of fighting the
DMA pattern (VERDICT r2 item 1):

  T layout     X_T[k1, k2] = X[k1 + n1*k2], stored (n1, n2) row-major.
               Forward phase B block-transposes its slab in-kernel and
               writes CONTIGUOUS (128, n2) row-tiles.
  half layout  only columns [0, n2/2] are stored (plus lane padding,
               nc = n2/2 + 128): for real input the upper spectrum half
               is the exact conjugate mirror
               X_T[k1, k2] = conj(X_T[n1-k1, n2-1-k2])   (k1 >= 1)
               X_T[0,  k2] = conj(X_T[0,    n2-k2])
               so the forward writes HALF the bytes and computes ~half
               the last DFT stage (out_rows), and every public
               elementwise op on the spectrum touches half the data.

The inverse reads the T/half storage CONTIGUOUSLY (row-tiles), mirrors
the missing half in-kernel (pairing tiles t and T-1-t so every stored
byte is read once), and hands phase B a tile-blocked intermediate Z'
so both its read and phase A's write stay contiguous. Ledger at 2^24
(f32 planes, MiB): forward 64(r) + 128(w) + 128(r) + 68(w), inverse
68(r) + 128(w) + 128(r) + 64(w) -> 776 total vs 896 for the natural
layout, with zero strided writes on the forward path.

Mirror synthesis musts (axon-Mosaic): reversals have no TPU lowering ->
sublane flip is one exchange matmul E_128 @ W, lane flips are per-128-
block right-multiplies by E_128 (the flip maps block j to block T2-1-j
exactly — no cross-block shift); the k1 = 0 row's different mirror
(same-row, shifted by one) is precomputed XLA-side and blended in with
a where(row==0) select (wide in-kernel lane rolls SIGABRT Mosaic).

Reference parity: the spectrum VALUES equal dsc_rfft's output
(dsc.cpp:2173-2244) — only the in-memory order differs, and planar.py
restores natural order at every boundary that needs it (numpy(),
materialize, mixed-layout ops).

batch == 1 only; batched transforms keep the natural-layout path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stream import (
    LANES,
    _dft_slab,
    _ds0,
    _gen_dft_tables,
    _interpret,
    _iota_trig,
    _phase_a_kernel,
    _pipe2,
    _split_bf16,
    _vmem_limit,
    DFT_MODE,
)

# extra rows appended to the half-layout storage so the inverse's 129-row
# mirror windows never read out of bounds (the one value they cover past
# row n1-1 feeds only the k1=0 special row, which is overwritten)
PAD_ROWS = 8


def nc_for(n2: int, half: bool) -> int:
    return (n2 // 2 + LANES) if half else n2


def pad_rows(half: bool) -> int:
    return PAD_ROWS if half else 0


def _dot():
    return functools.partial(jnp.dot, preferred_element_type=jnp.float32)


def _exchange(m, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return (i + j == m - 1).astype(dtype)


def _flip_dot(e_bf, x, right=False):
    """Permutation matmul with a 2-term hi/lo data split: e is 0/1 (exact
    in bf16) so each product is exact; the 2-term split residual (~2^-16
    relative) is below the DFT path's own 1e-5. 2 MXU passes."""
    dot = _dot()
    xh, xl = _split_bf16(x)
    if right:
        return dot(xh, e_bf) + dot(xl, e_bf)
    return dot(e_bf, xh) + dot(e_bf, xl)


# ---------------------------------------------------------------------------
# forward phase B-T: Z (n2, n1) -> X_T / X_half (n1 + pad, nc)
# ---------------------------------------------------------------------------


def _phase_b_t_kernel(n1, n2, sign, scale, half, mode, *refs):
    """Row DFT + in-kernel block transpose + CONTIGUOUS (half-)row-tile
    writes. Replaces the natural layout's strided 512-B-row writes."""
    (zr, zi, xr, xi) = refs
    n_tiles = n1 // LANES
    r1 = 1 << ((n2.bit_length() - 1) // 2)
    r2 = n2 // r1
    nc = nc_for(n2, half)
    # half: produce only natural DFT rows [0, nc) — stage-2 matrices
    # sliced to nc/r1 output rows (g3 AND stacked-bf16, _dft_slab) — the
    # upper spectrum half is the conjugate mirror and is never stored, so
    # computing it wastes ~half the stage-2 MXU passes
    out_rows = nc if half else None

    def body(bufs_r0, bufs_r1, bufs_i0, bufs_i1,
             outs_r0, outs_r1, outs_i0, outs_i1, in_sems, out_sems):
        bufs_r = (bufs_r0, bufs_r1)
        bufs_i = (bufs_i0, bufs_i1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)

        def in_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    zr.at[_ds0(n2), pl.ds(off, LANES)], bufs_r[s],
                    in_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    zi.at[_ds0(n2), pl.ds(off, LANES)], bufs_i[s],
                    in_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        def out_dma(s, t):
            roff = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    outs_r[s], xr.at[pl.ds(roff, LANES), _ds0(nc)],
                    out_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    outs_i[s], xi.at[pl.ds(roff, LANES), _ds0(nc)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        mats1, mats2, tr, ti = _gen_dft_tables(n2, r1, r2, sign, mode)

        def step(s, t):
            cr, ci = _dft_slab(bufs_r[s][:], bufs_i[s][:], n2, r1, r2,
                               mats1, mats2, tr, ti, out_rows=out_rows)

            @pl.when(t >= 2)
            def _():
                for cp in out_dma(s, t - 2):
                    cp.wait()

            sc = jnp.float32(scale)
            for j in range(nc // LANES):
                blk_r = cr[j * LANES:(j + 1) * LANES, :].T
                blk_i = ci[j * LANES:(j + 1) * LANES, :].T
                if scale != 1.0:
                    blk_r = blk_r * sc
                    blk_i = blk_i * sc
                outs_r[s][:, j * LANES:(j + 1) * LANES] = blk_r
                outs_i[s][:, j * LANES:(j + 1) * LANES] = blk_i
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
        bufs_r0=pltpu.VMEM((n2, LANES), jnp.float32),
        bufs_r1=pltpu.VMEM((n2, LANES), jnp.float32),
        bufs_i0=pltpu.VMEM((n2, LANES), jnp.float32),
        bufs_i1=pltpu.VMEM((n2, LANES), jnp.float32),
        outs_r0=pltpu.VMEM((LANES, nc), jnp.float32),
        outs_r1=pltpu.VMEM((LANES, nc), jnp.float32),
        outs_i0=pltpu.VMEM((LANES, nc), jnp.float32),
        outs_i1=pltpu.VMEM((LANES, nc), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


# ---------------------------------------------------------------------------
# inverse phase A-T: X_T / X_half (n1 + pad, nc) -> Z' tile-blocked
# ---------------------------------------------------------------------------


def _inv_phase_a_t_kernel(n1, n2, half, mode, *refs):
    """Contiguous row-tile reads of the T/half spectrum, in-kernel mirror
    synthesis (half), n2-point inverse DFT + four-step twiddle, contiguous
    tile-blocked Z' writes. Tiles are processed in pairs (t, T-1-t) so the
    half storage is read exactly once.

    Mosaic constraints (micro-bisected on hardware, probe_t_micro.py):
    odd-row VMEM windows (129, nc) are rejected and pltpu.roll along
    lanes of a multi-lane-tile array SIGABRTs the compiler — so each
    129-row logical window is TWO aligned DMAs ((128, nc) + (8, nc) from
    the next tile's first rows) and the k1=0 special row (a one-lane
    shift of storage row 0) is computed XLA-side and passed in as a tiny
    (8, nc) input, loaded to VMEM once."""
    if half:
        (hr, hi, fxr, fxi, zr, zi) = refs
    else:
        (hr, hi, zr, zi) = refs
        fxr = fxi = None
    T = n1 // LANES
    T2 = n2 // LANES
    jm = (n2 // 2) // LANES  # the mixed direct/mirror block (col n2/2)
    nc = nc_for(n2, half)
    r1 = 1 << ((n2.bit_length() - 1) // 2)
    r2 = n2 // r1
    n = n1 * n2
    n_units = T // 2

    def body(wa_r0, wa_r1, wa_i0, wa_i1, wb_r0, wb_r1, wb_i0, wb_i1,
             ea_r0, ea_r1, ea_i0, ea_i1, eb_r0, eb_r1, eb_i0, eb_i1,
             fix_r, fix_i,
             outs_r0, outs_r1, outs_i0, outs_i1, in_sems, out_sems,
             fix_sems):
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

        if half:
            fcps = [
                pltpu.make_async_copy(fxr, fix_r,
                                      fix_sems.at[jnp.int32(0)]),
                pltpu.make_async_copy(fxi, fix_i,
                                      fix_sems.at[jnp.int32(1)]),
            ]
            for cp in fcps:
                cp.start()
            for cp in fcps:
                cp.wait()

        def tiles(u):
            return u * jnp.int32(LANES), (jnp.int32(n1 - LANES)
                                          - u * jnp.int32(LANES))

        def in_dma(s, u):
            ra, rb = tiles(u)
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
                if half:
                    # the window's 129th row = next tile's first rows
                    # (aligned 8-row chunk; reads the PAD rows for the
                    # last tile, zero-selected before the flip matmul)
                    eoff = pl.multiple_of(row0 + jnp.int32(LANES), PAD_ROWS)
                    cps.append(pltpu.make_async_copy(
                        hr.at[pl.ds(eoff, PAD_ROWS), _ds0(nc)], ext_r,
                        in_sems.at[jnp.int32(s), jnp.int32(4 + 2 * k)]))
                    cps.append(pltpu.make_async_copy(
                        hi.at[pl.ds(eoff, PAD_ROWS), _ds0(nc)], ext_i,
                        in_sems.at[jnp.int32(s), jnp.int32(5 + 2 * k)]))
            return cps

        def out_dma(s, u):
            # Z' rows [tile*n2, (tile+1)*n2) — contiguous per tile
            cps = []
            ta = u * jnp.int32(n2)
            tb = jnp.int32((T - 1) * n2) - u * jnp.int32(n2)
            for k, roff in enumerate((ta, tb)):
                off = pl.multiple_of(roff, n2)
                cps.append(pltpu.make_async_copy(
                    outs_r[s].at[pl.ds(k * n2, n2), :],
                    zr.at[pl.ds(off, n2), :],
                    out_sems.at[jnp.int32(s), jnp.int32(2 * k)]))
                cps.append(pltpu.make_async_copy(
                    outs_i[s].at[pl.ds(k * n2, n2), :],
                    zi.at[pl.ds(off, n2), :],
                    out_sems.at[jnp.int32(s), jnp.int32(2 * k + 1)]))
            return cps

        mats1, mats2, tr, ti = _gen_dft_tables(n2, r1, r2, 1, mode)
        e128 = _exchange(LANES, jnp.bfloat16)
        # four-step twiddle W_n^{+m2*(128*tile + lane)}, m2 = a*r1 + b,
        # factored into two lane-packed tables (see pallas_stream phase A)
        two_pi_over_n = jnp.float32(2.0 * jnp.pi / n)
        b_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 0)
        cu_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 1)
        ar1_io = jax.lax.broadcasted_iota(
            jnp.int32, (r2, LANES), 0) * jnp.int32(r1)
        cv_io = jax.lax.broadcasted_iota(jnp.int32, (r2, LANES), 1)
        # scalar-dependent masks are built by folding the traced scalar
        # into IOTA ARITHMETIC before the compare: a 0-D bool broadcast
        # against a 2-D array ("(1,1)->(rows,lanes)") has no Mosaic
        # lowering and SIGABRTs the compiler (see pallas_reconstruct
        # notes; reproduced bisecting this kernel)
        row_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, nc), 0)
        lane0 = jax.lax.broadcasted_iota(
            jnp.int32, (LANES, LANES), 1) == 0

        def synth(u, first, dr, di, pr, pi, per, pei):
            """Full (n2, 128) planar slab (transposed) for one tile from
            its direct window (d*) and its partner's window (p*) + the
            partner's 8-row extension (pe*, first row = the 129th window
            row)."""
            if half:
                # partner rows 1..128, sublane-flipped: row i holds
                # H[n1 - 128t - (128 - i)] — mirror source for lane r
                src_r = jnp.concatenate([pr[1:128, :], per[0:1, :]],
                                        axis=0)
                src_i = jnp.concatenate([pi[1:128, :], pei[0:1, :]],
                                        axis=0)
                if first:
                    # unit 0's partner extension row is storage row n1 —
                    # a PAD row. It only backs the k1=0 special (replaced
                    # below), but the flip is a MATMUL: NaN*0 = NaN would
                    # poison every row, so zero it before flipping.
                    # (u==0 AND row==127) without a scalar broadcast:
                    gcond = (jnp.int32(LANES - 1) - row_io
                             + jnp.int32(LANES) * u) == 0
                    src_r = jnp.where(gcond, 0.0, src_r)
                    src_i = jnp.where(gcond, 0.0, src_i)
                wp_r = _flip_dot(e128, src_r)
                wp_i = _flip_dot(e128, src_i)
                if first:
                    # k1 = 0 (tile 0, row 0) mirrors its OWN row shifted
                    # one lane — precomputed XLA-side (fix buffers; a
                    # wide lane roll has no Mosaic lowering) and blended
                    # into the (zero-backed) partner row
                    cond = (row_io + jnp.int32(LANES) * u) == 0
                    wp_r = jnp.where(
                        cond,
                        jnp.broadcast_to(fix_r[0:1, :], (LANES, nc)),
                        wp_r)
                    wp_i = jnp.where(
                        cond,
                        jnp.broadcast_to(fix_i[0:1, :], (LANES, nc)),
                        wp_i)
            blocks_r = []
            blocks_i = []
            for j in range(T2):
                if (not half) or j < jm:
                    br = dr[0:128, j * LANES:(j + 1) * LANES]
                    bi = di[0:128, j * LANES:(j + 1) * LANES]
                else:
                    src = T2 - 1 - j
                    mr = _flip_dot(
                        e128, wp_r[:, src * LANES:(src + 1) * LANES],
                        right=True)
                    mi = _flip_dot(
                        e128, wp_i[:, src * LANES:(src + 1) * LANES],
                        right=True)
                    if j == jm:
                        br = jnp.where(
                            lane0, dr[0:128, j * LANES:(j + 1) * LANES], mr)
                        bi = jnp.where(
                            lane0, di[0:128, j * LANES:(j + 1) * LANES],
                            -mi)
                    else:
                        br, bi = mr, -mi
                blocks_r.append(br.T)
                blocks_i.append(bi.T)
            return (jnp.concatenate(blocks_r, axis=0),
                    jnp.concatenate(blocks_i, axis=0))

        def step(s, u):
            @pl.when(u >= 2)
            def _():
                for cp in out_dma(s, u - 2):
                    cp.wait()

            for k, (first, dr, di, pr, pi, per, pei) in enumerate((
                (True, wa_r[s], wa_i[s], wb_r[s], wb_i[s],
                 eb_r[s], eb_i[s]),
                (False, wb_r[s], wb_i[s], wa_r[s], wa_i[s],
                 ea_r[s], ea_i[s]),
            )):
                sr, si = synth(u, first, dr, di, pr, pi, per, pei)
                cr, ci = _dft_slab(sr, si, n2, r1, r2,
                                   mats1, mats2, tr, ti)
                # tile index: ta = u for the first member, T-1-u second
                tile = u if first else jnp.int32(T - 1) - u
                col = jnp.int32(LANES) * tile
                phu = jax.lax.rem(b_io * (col + cu_io), jnp.int32(n)) \
                    .astype(jnp.float32) * two_pi_over_n
                phv = jax.lax.rem(ar1_io * (col + cv_io), jnp.int32(n)) \
                    .astype(jnp.float32) * two_pi_over_n
                ur, ui = jnp.cos(phu), jnp.sin(phu)
                vr_, vi_ = jnp.cos(phv), jnp.sin(phv)
                y3r = cr.reshape(r2, r1, LANES)
                y3i = ci.reshape(r2, r1, LANES)
                ar_ = y3r * ur[None] - y3i * ui[None]
                ai_ = y3r * ui[None] + y3i * ur[None]
                yr = (ar_ * vr_[:, None]
                      - ai_ * vi_[:, None]).reshape(n2, LANES)
                yi = (ar_ * vi_[:, None]
                      + ai_ * vr_[:, None]).reshape(n2, LANES)
                outs_r[s][k * n2:(k + 1) * n2, :] = yr
                outs_i[s][k * n2:(k + 1) * n2, :] = yi
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
        fix_r=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        fix_i=pltpu.VMEM((PAD_ROWS, nc), jnp.float32),
        outs_r0=pltpu.VMEM((2 * n2, LANES), jnp.float32),
        outs_r1=pltpu.VMEM((2 * n2, LANES), jnp.float32),
        outs_i0=pltpu.VMEM((2 * n2, LANES), jnp.float32),
        outs_i1=pltpu.VMEM((2 * n2, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 8)),
        out_sems=pltpu.SemaphoreType.DMA((2, 4)),
        fix_sems=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# inverse phase B-Z': Z' tile-blocked -> y natural (n1, n2)
# ---------------------------------------------------------------------------


def _inv_phase_b_zp_kernel(n1, n2, scale, real_output, mode, *refs):
    """Contiguous 64-KiB block reads of Z', per-block vreg transposes into
    the (n1, 128) slab, n1-point inverse DFT, natural-order output."""
    if real_output:
        (zr, zi, yor) = refs
        yoi = None
    else:
        (zr, zi, yor, yoi) = refs
    T = n1 // LANES
    n_tiles = n2 // LANES
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1

    def body(bufs_r0, bufs_r1, bufs_i0, bufs_i1,
             outs_r0, outs_r1, outs_i0, outs_i1, in_sems, out_sems):
        bufs_r = (bufs_r0, bufs_r1)
        bufs_i = (bufs_i0, bufs_i1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)

        def in_dma(s, t):
            # block tb of the slab: Z' rows [tb*n2 + t*128, +128)
            cps = []
            for tb in range(T):
                off = pl.multiple_of(
                    jnp.int32(tb * n2) + t * jnp.int32(LANES), LANES)
                dst = pl.ds(tb * LANES, LANES)
                cps.append(pltpu.make_async_copy(
                    zr.at[pl.ds(off, LANES), :], bufs_r[s].at[dst, :],
                    in_sems.at[jnp.int32(s), jnp.int32(0), jnp.int32(tb)]))
                cps.append(pltpu.make_async_copy(
                    zi.at[pl.ds(off, LANES), :], bufs_i[s].at[dst, :],
                    in_sems.at[jnp.int32(s), jnp.int32(1), jnp.int32(tb)]))
            return cps

        def out_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            cps = [pltpu.make_async_copy(
                outs_r[s], yor.at[_ds0(n1), pl.ds(off, LANES)],
                out_sems.at[jnp.int32(s), jnp.int32(0)])]
            if yoi is not None:
                cps.append(pltpu.make_async_copy(
                    outs_i[s], yoi.at[_ds0(n1), pl.ds(off, LANES)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]))
            return cps

        mats1, mats2, tr, ti = _gen_dft_tables(n1, r1, r2, 1, mode)

        def step(s, t):
            # blocks arrive (m2, k1-lane); transpose into (k1, m2-lane)
            sr = jnp.concatenate(
                [bufs_r[s][tb * LANES:(tb + 1) * LANES, :].T
                 for tb in range(T)], axis=0)
            si = jnp.concatenate(
                [bufs_i[s][tb * LANES:(tb + 1) * LANES, :].T
                 for tb in range(T)], axis=0)
            cr, ci = _dft_slab(sr, si, n1, r1, r2, mats1, mats2, tr, ti,
                               real_output=real_output)

            @pl.when(t >= 2)
            def _():
                for cp in out_dma(s, t - 2):
                    cp.wait()

            sc = jnp.float32(scale)
            outs_r[s][:] = cr * sc if scale != 1.0 else cr
            if yoi is not None:
                outs_i[s][:] = ci * sc if scale != 1.0 else ci
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
        outs_r0=pltpu.VMEM((n1, LANES), jnp.float32),
        outs_r1=pltpu.VMEM((n1, LANES), jnp.float32),
        outs_i0=pltpu.VMEM((n1, LANES), jnp.float32),
        outs_i1=pltpu.VMEM((n1, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2, T)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def fourstep_to_t_p(
    xr: jax.Array,
    xi: Optional[jax.Array],
    n1: int,
    n2: int,
    half: bool,
    mode: Optional[str] = None,
):
    """Forward n-point FFT of a flat (n,) planar pair (xi None = real
    input) into T / half-T layout planes of shape (n1 + pad, nc)."""
    mode = mode or DFT_MODE
    if half:
        assert xi is None, 'half layout implies a real input'
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    interp = _interpret()
    nc = nc_for(n2, half)
    rows = n1 + pad_rows(half)

    xr2 = xr.reshape(n1, n2)
    ins_a = (xr2,) if xi is None else (xr2, xi.reshape(n1, n2))
    kernel_a = functools.partial(
        _phase_a_kernel, n1, n2, 1, -1, xi is None, mode)
    zr, zi = pl.pallas_call(
        kernel_a,
        in_specs=[anyspec] * len(ins_a),
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((n2, n1), jnp.float32),
            jax.ShapeDtypeStruct((n2, n1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n1)),
        interpret=interp,
    )(*ins_a)

    kernel_b = functools.partial(
        _phase_b_t_kernel, n1, n2, -1, 1.0, half, mode)
    hr, hi = pl.pallas_call(
        kernel_b,
        in_specs=[anyspec] * 2,
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, nc), jnp.float32),
            jax.ShapeDtypeStruct((rows, nc), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n2)),
        interpret=interp,
    )(zr, zi)
    return hr, hi


def fourstep_from_t_p(
    hr: jax.Array,
    hi: jax.Array,
    n1: int,
    n2: int,
    half: bool,
    real_output: bool,
    mode: Optional[str] = None,
):
    """Inverse n-point FFT from T / half-T layout planes (n1 + pad, nc)
    to a flat natural-order (n,) result (1/n scaled). real_output drops
    the imaginary plane."""
    mode = mode or DFT_MODE
    n = n1 * n2
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    interp = _interpret()

    kernel_a = functools.partial(_inv_phase_a_t_kernel, n1, n2, half, mode)
    # Z' tile-blocked intermediate: tile t's (n2, 128) slab at rows
    # [t*n2, (t+1)*n2) — n/128 rows total
    zp_rows = n // LANES
    ins = (hr, hi)
    if half:
        # the k1=0 special mirror row: storage row 0 shifted one lane —
        # precomputed here (a wide in-kernel lane roll SIGABRTs Mosaic),
        # padded to an aligned 8-row chunk
        nc = nc_for(n2, True)
        fxr = jnp.broadcast_to(jnp.roll(hr[0:1, :nc], -1, axis=1),
                               (PAD_ROWS, nc))
        fxi = jnp.broadcast_to(jnp.roll(hi[0:1, :nc], -1, axis=1),
                               (PAD_ROWS, nc))
        ins = (hr, hi, fxr, fxi)
    zr, zi = pl.pallas_call(
        kernel_a,
        in_specs=[anyspec] * len(ins),
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((zp_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((zp_rows, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(2 * n2)),
        interpret=interp,
    )(*ins)

    kernel_b = functools.partial(
        _inv_phase_b_zp_kernel, n1, n2, 1.0 / n, real_output, mode)
    out_shapes = (jax.ShapeDtypeStruct((n1, n2), jnp.float32),)
    out_specs = (anyspec,)
    if not real_output:
        out_shapes += (jax.ShapeDtypeStruct((n1, n2), jnp.float32),)
        out_specs += (anyspec,)
    outs = pl.pallas_call(
        kernel_b,
        in_specs=[anyspec] * 2,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n1)),
        interpret=interp,
    )(zr, zi)
    if real_output:
        return outs[0].reshape(n), None
    return outs[0].reshape(n), outs[1].reshape(n)
