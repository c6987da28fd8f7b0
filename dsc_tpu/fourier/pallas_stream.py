"""Streaming four-step FFT: the whole large transform in two Pallas passes.

The XLA four-step path (core.fft_apply_p) is correct but pays ~6 HBM
round-trips at 2^24: transpose in, column FFTs, twiddle, transpose,
row FFTs, transpose out. This module collapses that to the 2-pass
minimum — each pass streams HBM->VMEM->HBM once with double-buffered DMA
while the MXU does the butterflies:

  phase A (per 128-column tile of M = x.reshape(n1, n2)):
      strided DMA  M[:, tile]            -> (n1, 128) VMEM slab
      column DFT_{n1} on sublanes        (matrix-DFT, two MXU passes)
      four-step twiddle W_n^{k1*j2}      (generated on the fly, see below)
      VMEM transpose -> contiguous DMA   Z[j2, k1] intermediate
  phase B (per 128-column tile of Z):
      strided DMA  Z[:, k1-tile]         -> (n2, 128) VMEM slab
      row DFT_{n2} on sublanes (+ 1/n scale for inverse)
      strided DMA out: slab == X.reshape(n2, n1)[:, k1-tile] directly
      (X[k1 + n1*k2] is contiguous in k1 — the slab layout IS the output)

The inter-stage twiddle T[k1, j2] = exp(-2i*pi*k1*j2/n) is (n1, n2) — as
big as the data — so it is never materialized: per tile it factors as
T[k, tile*128+c] = A_t[k] * B[k, c] with B = W_n^{k*c} (c < 128) a fixed
(n1, 128) table and A_t[k] = W_n^{128*t*k} generated in-kernel from an
integer iota (exact mod-n reduction keeps the trig argument in [0, 2pi),
so f32 cos/sin stay accurate at n = 2^24).

Inverse transforms use sign-flipped tables (not the conj sandwich — a
conjugation at this size is an extra HBM pass); rfft streams a real-only
phase A (half the matmuls, half the read traffic); irfft writes only the
real output plane.

Reference parity: this is the performance path for dsc_fft/dsc_rfft at
large n (reference dsc.cpp:1955-2340); numerics match the XLA four-step
path (same f64-computed tables downcast to f32).

Mosaic/axon constraints honored (see memory notes): gridless kernels,
fori_loop with i32 bounds, pl.multiple_of hints on DMA offsets, 128-lane
tiles, split-bf16 three-pass matmuls (_dot3).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128



def _ds0(size):
    """i32 full-dim slice: a plain ':' start lowers as i64 under global
    x64 mode and breaks tpu.memref_slice (see memory notes)."""
    return pl.ds(jnp.int32(0), size)

# supported factor range: one slab (n_factor, 128) f32 x small multiple
# must fit VMEM next to the double buffers
FACTOR_MIN = 512
FACTOR_MAX = 4096


def supported(n1: int, n2: int, dtype) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    for f in (n1, n2):
        if not (FACTOR_MIN <= f <= FACTOR_MAX) or f & (f - 1):
            return False
    return n1 % LANES == 0 and n2 % LANES == 0


def _stack_complex(f: np.ndarray) -> np.ndarray:
    """Complex matrix -> real 2x2 block form [[Fr, -Fi], [Fi, Fr]] so the
    complex product is ONE real matmul on stacked planar operands. For
    r = 64 factors this doubles every matmul dim to 128 — a full MXU tile
    instead of a quarter-utilized 64x64 one (the streaming kernel is
    MXU-bound without this: measured 3.48 ms -> compute-limited)."""
    top = np.concatenate([f.real, -f.imag], axis=1)
    bot = np.concatenate([f.imag, f.real], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


def _split_bf16_host(f: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """f32 matrix -> (hi, lo) bf16 pair with hi + lo ~ f to ~16 mantissa
    bits. Three bf16 MXU passes on split operands give ~1e-5 relative
    error at ~2x the throughput of Precision.HIGHEST (which Mosaic lowers
    to 6 passes; measured 18 TFLOP/s vs bf16 peak ~197)."""
    import jax.numpy as _jnp

    hi = np.asarray(f, np.float32).astype(_jnp.bfloat16)
    lo = (f - np.asarray(hi, np.float32)).astype(_jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@functools.lru_cache(maxsize=64)
def _dft_consts(n: int, sign: int) -> Tuple[np.ndarray, ...]:
    """Matrix-DFT tables for an n-point slab transform, n = r1*r2:
    stacked-real F_r1 (2r1, 2r1), F_r2 (2r2, 2r2) as (hi, lo) bf16 splits,
    and the planar inner twiddle T[k1, j2] = W_n^{sign*k1*j2} in f32.
    All f64-computed (dsc_init_plan parity, dsc_fft.h:33-55)."""
    r1 = 1 << ((n.bit_length() - 1) // 2)
    r2 = n // r1
    j1 = np.arange(r1, dtype=np.float64)
    j2 = np.arange(r2, dtype=np.float64)
    s = 2j * np.pi * sign
    f1 = np.exp(s * np.outer(j1, j1) / r1)
    f2 = np.exp(s * np.outer(j2, j2) / r2)
    t = np.exp(s * np.outer(j1, j2) / n)
    to32 = lambda a: np.ascontiguousarray(a).astype(np.float32)
    f1h, f1l = _split_bf16_host(_stack_complex(f1))
    f2h, f2l = _split_bf16_host(_stack_complex(f2))
    return (f1h, f1l, f2h, f2l, to32(t.real), to32(t.imag))


@functools.lru_cache(maxsize=32)
def _wlane(n: int, n1: int, sign: int) -> Tuple[np.ndarray, np.ndarray]:
    """B[k, c] = W_n^{sign*k*c}, k < n1, c < LANES (the lane factor of the
    four-step twiddle)."""
    k = np.arange(n1, dtype=np.float64)
    c = np.arange(LANES, dtype=np.float64)
    b = np.exp(2j * np.pi * sign * np.outer(k, c) / n)
    return (
        np.ascontiguousarray(b.real).astype(np.float32),
        np.ascontiguousarray(b.imag).astype(np.float32),
    )


def _dot():
    return functools.partial(jnp.dot, preferred_element_type=jnp.float32)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(fh, fl, m):
    """F @ m with F pre-split (hi, lo) bf16 and m f32: three native bf16
    MXU passes, f32 accumulate — ~16-bit mantissa product (see
    _split_bf16_host)."""
    dot = _dot()
    mh, ml = _split_bf16(m)
    return dot(fh, mh) + (dot(fl, mh) + dot(fh, ml))


def _dft_slab(sr, si, n, r1, r2, f1h, f1l, f2h, f2l, tr, ti):
    """DFT over the sublane axis of an (n, L) slab; si may be None for
    real input. Returns (n, L) planar slabs in natural order.

    Each complex-matmul stage is one stacked real matmul:
    [ar; ai] = [[Fr, -Fi], [Fi, Fr]] @ [mr; mi] — full 128x128 MXU tiles
    for r = 64 factors."""
    lanes = sr.shape[1]
    mr = sr.reshape(r1, r2 * lanes)
    if si is None:
        # real input: only the left block-column of F1s contributes
        a2 = _dot3(f1h[:, :r1], f1l[:, :r1], mr)
    else:
        mi = si.reshape(r1, r2 * lanes)
        a2 = _dot3(f1h, f1l, jnp.concatenate([mr, mi], axis=0))
    t3r = tr.reshape(r1, r2, 1)
    t3i = ti.reshape(r1, r2, 1)
    a3r = a2[:r1].reshape(r1, r2, lanes)
    a3i = a2[r1:].reshape(r1, r2, lanes)
    br = a3r * t3r - a3i * t3i
    bi = a3r * t3i + a3i * t3r
    b2r = br.transpose(1, 0, 2).reshape(r2, r1 * lanes)
    b2i = bi.transpose(1, 0, 2).reshape(r2, r1 * lanes)
    c2 = _dot3(f2h, f2l, jnp.concatenate([b2r, b2i], axis=0))
    return c2[:r2].reshape(n, lanes), c2[r2:].reshape(n, lanes)


def _phase_a_kernel(n1, n2, sign, real_input, *refs):
    """Column DFT + four-step twiddle + transpose:
    x (n1, n2) planar HBM -> Z (n2, n1) planar HBM."""
    if real_input:
        (xr, f1h, f1l, f2h, f2l, tr, ti, blr, bli, zr, zi) = refs
        xi = None
    else:
        (xr, xi, f1h, f1l, f2h, f2l, tr, ti, blr, bli, zr, zi) = refs
    n_tiles = n2 // LANES
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1
    n = n1 * n2

    def body(bufs_r, bufs_i, outs_r, outs_i, in_sems, out_sems):
        def in_dma(slot, t):
            slot = jnp.asarray(slot, jnp.int32)
            z, o = jnp.int32(0), jnp.int32(1)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            cps = [pltpu.make_async_copy(
                xr.at[_ds0(n1), pl.ds(off, LANES)], bufs_r.at[slot],
                in_sems.at[slot, z])]
            if xi is not None:
                cps.append(pltpu.make_async_copy(
                    xi.at[_ds0(n1), pl.ds(off, LANES)], bufs_i.at[slot],
                    in_sems.at[slot, o]))
            return cps

        def out_dma(slot, t):
            slot = jnp.asarray(slot, jnp.int32)
            z, o = jnp.int32(0), jnp.int32(1)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    outs_r.at[slot], zr.at[pl.ds(off, LANES), _ds0(n1)],
                    out_sems.at[slot, z]),
                pltpu.make_async_copy(
                    outs_i.at[slot], zi.at[pl.ds(off, LANES), _ds0(n1)],
                    out_sems.at[slot, o]),
            ]

        for cp in in_dma(0, 0):
            cp.start()

        # in-kernel twiddle row factor: A_t[k] = W_n^{sign*128*t*k};
        # integer mod keeps the trig argument small and exact
        kio = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
        two_pi_over_n = jnp.float32(sign * 2.0 * np.pi / n)

        def loop(t, carry):
            slot = jax.lax.rem(t, jnp.int32(2))
            nxt = jax.lax.rem(t + 1, jnp.int32(2))

            @pl.when(t + 1 < n_tiles)
            def _():
                for cp in in_dma(nxt, t + 1):
                    cp.start()

            for cp in in_dma(slot, t):
                cp.wait()
            sr = bufs_r[slot]
            si = None if xi is None else bufs_i[slot]
            cr, ci = _dft_slab(sr, si, n1, r1, r2, f1h[:], f1l[:],
                               f2h[:], f2l[:], tr[:], ti[:])
            # four-step twiddle: (A_t[k] * B[k, c]) applied to (n1, L)
            step = jax.lax.rem(jnp.int32(LANES) * t, jnp.int32(n))
            itk = jax.lax.rem(step * kio, jnp.int32(n))
            ph = itk.astype(jnp.float32) * two_pi_over_n
            atr = jnp.cos(ph)
            ati = jnp.sin(ph)
            twr = atr * blr[:] - ati * bli[:]
            twi = atr * bli[:] + ati * blr[:]
            yr = cr * twr - ci * twi
            yi = cr * twi + ci * twr
            # transpose to (L, n1) so the Z write is contiguous; wait for
            # the previous write on this slot to drain first
            @pl.when(t >= 2)
            def _():
                for cp in out_dma(slot, t - 2):
                    cp.wait()

            outs_r[slot] = yr.T
            outs_i[slot] = yi.T
            for cp in out_dma(slot, t):
                cp.start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), loop,
                          jnp.int32(0))
        for tt in (n_tiles - 2, n_tiles - 1):
            if tt >= 0:
                for cp in out_dma(tt % 2, tt):
                    cp.wait()

    pl.run_scoped(
        body,
        bufs_r=pltpu.VMEM((2, n1, LANES), jnp.float32),
        bufs_i=pltpu.VMEM((2, n1, LANES), jnp.float32),
        outs_r=pltpu.VMEM((2, LANES, n1), jnp.float32),
        outs_i=pltpu.VMEM((2, LANES, n1), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _phase_b_kernel(n1, n2, scale, real_output, *refs):
    """Row DFT: Z (n2, n1) planar HBM -> X (n2, n1) planar HBM (slab
    layout == output layout, no transpose)."""
    if real_output:
        (zr, zi, f1h, f1l, f2h, f2l, tr, ti, xor_) = refs
        xoi = None
    else:
        (zr, zi, f1h, f1l, f2h, f2l, tr, ti, xor_, xoi) = refs
    n_tiles = n1 // LANES
    r1 = 1 << ((n2.bit_length() - 1) // 2)
    r2 = n2 // r1

    def body(bufs_r, bufs_i, outs_r, outs_i, in_sems, out_sems):
        def in_dma(slot, t):
            slot = jnp.asarray(slot, jnp.int32)
            z, o = jnp.int32(0), jnp.int32(1)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    zr.at[_ds0(n2), pl.ds(off, LANES)], bufs_r.at[slot],
                    in_sems.at[slot, z]),
                pltpu.make_async_copy(
                    zi.at[_ds0(n2), pl.ds(off, LANES)], bufs_i.at[slot],
                    in_sems.at[slot, o]),
            ]

        def out_dma(slot, t):
            slot = jnp.asarray(slot, jnp.int32)
            z, o = jnp.int32(0), jnp.int32(1)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            cps = [pltpu.make_async_copy(
                outs_r.at[slot], xor_.at[_ds0(n2), pl.ds(off, LANES)],
                out_sems.at[slot, z])]
            if xoi is not None:
                cps.append(pltpu.make_async_copy(
                    outs_i.at[slot], xoi.at[_ds0(n2), pl.ds(off, LANES)],
                    out_sems.at[slot, o]))
            return cps

        for cp in in_dma(0, 0):
            cp.start()

        def loop(t, carry):
            slot = jax.lax.rem(t, jnp.int32(2))
            nxt = jax.lax.rem(t + 1, jnp.int32(2))

            @pl.when(t + 1 < n_tiles)
            def _():
                for cp in in_dma(nxt, t + 1):
                    cp.start()

            for cp in in_dma(slot, t):
                cp.wait()
            cr, ci = _dft_slab(bufs_r[slot], bufs_i[slot], n2, r1, r2,
                               f1h[:], f1l[:], f2h[:], f2l[:], tr[:], ti[:])

            @pl.when(t >= 2)
            def _():
                for cp in out_dma(slot, t - 2):
                    cp.wait()

            if scale != 1.0:
                s = jnp.float32(scale)
                outs_r[slot] = cr * s
                if xoi is not None:
                    outs_i[slot] = ci * s
            else:
                outs_r[slot] = cr
                if xoi is not None:
                    outs_i[slot] = ci
            for cp in out_dma(slot, t):
                cp.start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), loop,
                          jnp.int32(0))
        for tt in (n_tiles - 2, n_tiles - 1):
            if tt >= 0:
                for cp in out_dma(tt % 2, tt):
                    cp.wait()

    pl.run_scoped(
        body,
        bufs_r=pltpu.VMEM((2, n2, LANES), jnp.float32),
        bufs_i=pltpu.VMEM((2, n2, LANES), jnp.float32),
        outs_r=pltpu.VMEM((2, n2, LANES), jnp.float32),
        outs_i=pltpu.VMEM((2, n2, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _vmem_limit(nf: int) -> int:
    # 8 slab buffers of (nf, 128) f32 + ~2x that again in compute
    # temporaries (measured: 42.5M at nf=4096); v5e has 128M physical
    return min(max(32 * 2**20, 24 * nf * LANES * 4), 100 * 2**20)


def _tables(n: int, sign: int):
    a = _dft_consts(n, sign)
    return tuple(jnp.asarray(x) for x in a)


def fourstep_stream_p(
    xr: jax.Array,
    xi: Optional[jax.Array],
    n1: int,
    n2: int,
    inverse: bool,
    real_output: bool = False,
):
    """n-point planar FFT of a flat (n,) pair via two streaming passes.

    xi may be None (real input, forward only). real_output drops the
    imaginary output plane (irfft tail). Inverse applies 1/n scaling via
    sign-flipped tables — no conjugation passes.
    """
    n = n1 * n2
    sign = 1 if inverse else -1
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    interp = _interpret()

    a_consts = _tables(n1, sign)
    blr, bli = (jnp.asarray(t) for t in _wlane(n, n1, sign))
    xr2 = xr.reshape(n1, n2)
    ins_a = (xr2,) if xi is None else (xr2, xi.reshape(n1, n2))
    kernel_a = functools.partial(
        _phase_a_kernel, n1, n2, sign, xi is None)
    zr, zi = pl.pallas_call(
        kernel_a,
        in_specs=[anyspec] * len(ins_a) + [vmem] * 8,
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((n2, n1), jnp.float32),
            jax.ShapeDtypeStruct((n2, n1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n1)
        ),
        interpret=interp,
    )(*ins_a, *a_consts, blr, bli)

    b_consts = _tables(n2, sign)
    scale = (1.0 / n) if inverse else 1.0
    kernel_b = functools.partial(
        _phase_b_kernel, n1, n2, scale, real_output)
    out_shapes = (jax.ShapeDtypeStruct((n2, n1), jnp.float32),)
    out_specs = (anyspec,)
    if not real_output:
        out_shapes += (jax.ShapeDtypeStruct((n2, n1), jnp.float32),)
        out_specs += (anyspec,)
    outs = pl.pallas_call(
        kernel_b,
        in_specs=[anyspec] * 2 + [vmem] * 6,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n2)
        ),
        interpret=interp,
    )(zr, zi, *b_consts)
    if real_output:
        return outs[0].reshape(n), None
    return outs[0].reshape(n), outs[1].reshape(n)
