"""Streaming four-step FFT: the whole large transform in two Pallas passes.

The XLA four-step path (core.fft_apply_p) is correct but pays ~6 HBM
round-trips at 2^24: transpose in, column FFTs, twiddle, transpose,
row FFTs, transpose out. This module collapses that to the 2-pass
minimum — each pass streams HBM->VMEM->HBM once with double-buffered DMA
while the MXU does the butterflies:

  phase A (per 128-column tile of M = x.reshape(n1, n2)):
      strided DMA  M[:, tile]            -> (n1, 128) VMEM slab
      column DFT_{n1} on sublanes        (matrix-DFT, stacked-real MXU)
      four-step twiddle W_n^{k*(128t+c)} (factored, generated in-kernel)
      per-(128,128)-block vreg transposes -> contiguous DMA to Z[j2, k1]
  phase B (per 128-column tile of Z):
      strided DMA  Z[:, k1-tile]         -> (n2, 128) VMEM slab
      row DFT_{n2} on sublanes (+ 1/n scale for inverse)
      strided DMA out: slab == X.reshape(n2, n1)[:, k1-tile] directly
      (X[k1 + n1*k2] is contiguous in k1 — the slab layout IS the output)

The inter-stage twiddle T[k, j2] = exp(-2i*pi*k*j2/n) is (n1, n2) — as
big as the data — so it is never materialized: per tile it FACTORS over
k = k2*r1 + k1 into two (r, 128) lane-packed tables U_t, V_t, both
generated in-kernel from integer iotas (i32 wraparound is exact for
power-of-two n; negative residues shift angles by -2pi, invisible to
cos/sin). Uploading tables instead would embed multi-MiB HLO constants
and overflow the remote-compile body limit (HTTP 413).

Batched rows group up to FACTOR_MAX/n_factor consecutive transforms per
DMA (_group) so small-factor batched transforms keep >= 2 MiB copies.

Inverse transforms use sign-flipped tables (not the conj sandwich — a
conjugation at this size is an extra HBM pass); rfft streams a real-only
phase A (half the matmuls, half the read traffic); irfft writes only the
real output plane.

Reference parity: this is the performance path for dsc_fft/dsc_rfft at
large n (reference dsc.cpp:1955-2340); the XLA four-step path
(core.fft_apply_p) remains the reference numerics and the fallback for
odd-size/CPU cases.

Mosaic/axon constraints honored (see memory notes + PERF.md): gridless
kernels, fori_loop with i32 bounds, pl.multiple_of hints on DMA offsets,
128-lane tiles, split-bf16 three-pass matmuls (_mm), static buffer sets
(_pipe2), block (not monolithic) transposes.
"""

from __future__ import annotations

import functools
import os
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
# must fit VMEM next to the double buffers. 8192 slabs (4 MiB) keep the
# whole pipeline under ~60 MiB of the 128 MiB VMEM and extend the
# 2-pass path to n = 2^26 (VERDICT r2 item 3 — the reference has no
# size cliff below memory, dsc_fft.h:109-135).
FACTOR_MIN = 512
FACTOR_MAX = 8192


def factors(n: int) -> Tuple[int, int]:
    """Balanced (n1, n2) split for the STREAMING kernels — independent of
    plan.build_spec (whose factors are bounded by the base-kernel size
    for the XLA fallback path)."""
    n1 = min(1 << (n.bit_length() // 2), FACTOR_MAX)
    return n1, n // n1

# DFT stage-table mode for the streaming kernels (see _gen_dft_tables).
# 'pair' (round 5) regroups the bf16x3 product into two dots with the
# k=256 accumulation inside the MXU: same-process round-robin on the
# 2^24 rt chain measured 1.72 ms/pair median vs 1.97 for 'bf16' (~13%).
# 'bf16' context (round 3): beats 'g3' 2.49 vs 4.82 ms/pair — g3's
# (r, r) = (64, 64) matrices fill only half the 128-wide MXU, so its
# 25% FLOP saving inverts into a ~2x time loss. All modes stay
# selectable for experiments ('fuse3' — one k=384 dot — loses ~8% to
# 'pair': duplicating the mh block costs more than the saved add).
DFT_MODE = os.environ.get('DSC_FFT_DFT_MODE', 'pair')


def _group(batch: int, nf: int) -> int:
    """Consecutive batch rows grouped per DMA so small-factor batched
    transforms keep >= 2 MiB transfers (one (g*nf, 128) slab per copy)."""
    g = min(batch, max(1, FACTOR_MAX // nf))
    while batch % g:
        g -= 1
    return g


def supported(n1: int, n2: int, dtype, batch: int = 1) -> bool:
    if np.dtype(dtype) != np.complex64:
        return False
    for f in (n1, n2):
        if not (256 <= f <= FACTOR_MAX) or f & (f - 1):
            return False
        # small factors are DMA-latency-bound unless batch grouping can
        # actually reach a >= FACTOR_MIN slab per copy (a batch sharing no
        # divisor with FACTOR_MAX//f degrades _group to 1 — e.g. batch=17
        # at 256x256 — and must take the XLA fallback instead)
        if _group(batch, f) * f < FACTOR_MIN:
            return False
    return n1 % LANES == 0 and n2 % LANES == 0


def _iota_trig(rows, cols, modn, period, sign):
    """(cos, sin) of W_period^{sign*j*k} over a (rows, cols) index grid,
    computed from integer iotas with exact mod-period reduction so the f32
    trig argument stays in (-2pi, 2pi) — accurate even at period = 2^24."""
    a = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * \
        jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ph = jax.lax.rem(a, jnp.int32(modn)).astype(jnp.float32) * \
        jnp.float32(sign * 2.0 * np.pi / period)
    return jnp.cos(ph), jnp.sin(ph)


def _gen_dft_tables(n, r1, r2, sign, mode):
    """Generate the slab-DFT tables IN-KERNEL, plus the planar inner
    twiddle T[k1, j2] = W_n^{sign*k1*j2}. Stage-table modes, tagged by
    tuple structure (strings are not jittable pytree leaves):

    'f32'  — (stacked F,): one Precision.HIGHEST matmul per stacked
             stage (6 MXU passes, ~1e-7; base kernels)
    'bf16' — (hi, lo): stacked-real split-bf16, 3 passes per stacked
             matmul = 12 per complex stage (~1e-5)
    'pair' — ((hi, lo),): same bf16x3 product as 'bf16' but grouped as
             TWO dots — Fh@mh, then [Fl|Fh]@[mh;ml] with the k=256
             accumulation INSIDE the MXU — one VPU output add instead
             of two, identical numerics (same three partial products)
    'fuse3' — ((hi,), (lo,)): ONE dot [Fh|Fl|Fh]@[mh;mh;ml] (k=384) —
             zero VPU output adds, all accumulation in the MXU
    'g3'   — ((Frh,Frl), (Fih,Fil), (Fsh,Fsl)) with Fs = Fr + Fi:
             Gauss 3-mult complex product — re = m1 - m2,
             im = m3 - m1 - m2 with m1 = Fr@xr, m2 = Fi@xi,
             m3 = Fs@(xr+xi) — 9 bf16 passes per complex stage, 25%
             fewer MXU flops than 'bf16'; the im cancellation costs
             ~1 ulp extra

    Generated, not uploaded: dense table constants embed as text in the
    Mosaic MLIR payload, and the remote compiler rejects multi-MiB request
    bodies (HTTP 413) once a chain holds several kernels. The trig costs
    ~40K VPU transcendentals once per kernel invocation — noise."""
    def stage(rr):
        c, s = _iota_trig(rr, rr, rr, rr, sign)
        if mode == 'g3':
            return (_split_bf16(c), _split_bf16(s), _split_bf16(c + s))
        top = jnp.concatenate([c, -s], axis=1)
        bot = jnp.concatenate([s, c], axis=1)
        f = jnp.concatenate([top, bot], axis=0)
        if mode == 'bf16':
            return _split_bf16(f)
        if mode == 'pair':
            return (_split_bf16(f),)
        if mode == 'fuse3':
            fh, fl = _split_bf16(f)
            return ((fh,), (fl,))
        return (f,)

    f1 = stage(r1)
    f2 = stage(r2)
    tr, ti = _iota_trig(r1, r2, n, n, sign)
    return f1, f2, tr, ti


def _dot():
    return functools.partial(jnp.dot, preferred_element_type=jnp.float32)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mmr(fm, x):
    """One real matmul with a 3-pass split-bf16 operand expansion
    (~2x Precision.HIGHEST's six passes; ~1e-5 relative — the hi/lo data
    split's own residual, so a fourth lo*lo pass does not help)."""
    dot = _dot()
    fh, fl = fm
    xh, xl = _split_bf16(x)
    return dot(fh, xh) + (dot(fl, xh) + dot(fh, xl))


def _mm_stage(tab, xr, xi, real_out=False, split=None):
    """One complex DFT stage F @ (xr + i*xi) on separated planes.

    xi None = real input (the Fi@xi term vanishes). real_out=True drops
    the imaginary output — 'g3' skips the m3 matmul entirely and the
    stacked forms SLICE the matrix to its top (re) half before the dot,
    both halving the stage (irfft's last stage needs only the real
    plane). ``split`` is the output re/im boundary row when the caller
    pre-sliced the stacked matrices to a row prefix (out_rows).
    Mode is inferred from the table structure (see _gen_dft_tables)."""
    if len(tab) == 3:  # 'g3'
        fr, fi, fs = tab
        if xi is None:
            return _mmr(fr, xr), (None if real_out else _mmr(fi, xr))
        m1 = _mmr(fr, xr)
        m2 = _mmr(fi, xi)
        if real_out:
            return m1 - m2, None
        m3 = _mmr(fs, xr + xi)
        return m1 - m2, m3 - m1 - m2
    # stacked forms: (hi, lo) = 'bf16', ((hi, lo),) = 'pair',
    # ((hi,), (lo,)) = 'fuse3', (f,) = 'f32'
    pair = len(tab) == 1 and isinstance(tab[0], tuple)
    fuse3 = len(tab) == 2 and isinstance(tab[0], tuple)
    if pair:
        tab = tab[0]
    elif fuse3:
        tab = (tab[0][0], tab[1][0])
    r = xr.shape[0]
    sp = r if split is None else split
    if xi is None:
        m = xr
        mats = tuple(f[:, :r] for f in tab)
    else:
        m = jnp.concatenate([xr, xi], axis=0)
        mats = tab
    if real_out:
        # only the top (re) output rows are wanted: halve the matmul
        mats = tuple(f[:sp] for f in mats)
    if pair:
        fh, fl = mats
        dot = _dot()
        mh, ml = _split_bf16(m)
        # same three bf16 partial products as 'bf16', regrouped so the
        # k=256 dot accumulates two of them inside the MXU
        a2 = dot(fh, mh) + dot(
            jnp.concatenate([fl, fh], axis=1),
            jnp.concatenate([mh, ml], axis=0),
        )
    elif fuse3:
        fh, fl = mats
        mh, ml = _split_bf16(m)
        a2 = _dot()(
            jnp.concatenate([fh, fl, fh], axis=1),
            jnp.concatenate([mh, mh, ml], axis=0),
        )
    elif len(mats) == 2:
        fh, fl = mats
        dot = _dot()
        mh, ml = _split_bf16(m)
        a2 = dot(fh, mh) + (dot(fl, mh) + dot(fh, ml))
    else:
        a2 = jnp.dot(mats[0], m, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return a2[:sp], (None if real_out else a2[sp:])


def _dft_slab(sr, si, n, r1, r2, mats1, mats2, tr, ti, real_output=False,
              out_rows=None):
    """DFT over the sublane axis of an (n, L) slab; si may be None for
    real input, real_output=True returns (re, None) and skips the last
    stage's imaginary matmuls. ``out_rows`` (a multiple of r1) computes
    just the natural-order prefix [0, out_rows) by slicing the stage-2
    matrices (g3 real pairs row-sliced; stacked-real matrices keep their
    re rows [0:ra) AND im rows [r2:r2+ra)) — the hermitian-half forward
    needs only the lower half of the spectrum (pallas_stream_t.py). Returns
    (n|out_rows, L) planar slabs in natural order. Full 128-row MXU
    tiles for r = 64 factors."""
    lanes = sr.shape[1]
    n_out = n
    split2 = None
    if out_rows is not None and out_rows < n:
        assert out_rows % r1 == 0, (out_rows, r1)
        ra = out_rows // r1
        if len(mats2) == 3:  # g3: three (hi, lo) real-matrix pairs
            mats2 = tuple((h[:ra], lo[:ra]) for (h, lo) in mats2)
        else:  # stacked: slice BOTH the re rows [0:ra) and the im rows
            # [r2:r2+ra) of the (2r2, 2r2) stacked-real matrices
            def _rows(f):
                if isinstance(f, tuple):  # 'pair' / 'fuse3' nesting
                    return tuple(_rows(e) for e in f)
                return jnp.concatenate([f[:ra], f[r2:r2 + ra]], axis=0)

            mats2 = tuple(_rows(f) for f in mats2)
            split2 = ra
        n_out = out_rows
    mr = sr.reshape(r1, r2 * lanes)
    mi = None if si is None else si.reshape(r1, r2 * lanes)
    a2r, a2i = _mm_stage(mats1, mr, mi)
    t3r = tr.reshape(r1, r2, 1)
    t3i = ti.reshape(r1, r2, 1)
    a3r = a2r.reshape(r1, r2, lanes)
    a3i = a2i.reshape(r1, r2, lanes)
    br = a3r * t3r - a3i * t3i
    bi = a3r * t3i + a3i * t3r
    b2r = br.transpose(1, 0, 2).reshape(r2, r1 * lanes)
    b2i = bi.transpose(1, 0, 2).reshape(r2, r1 * lanes)
    c2r, c2i = _mm_stage(mats2, b2r, b2i, real_out=real_output,
                         split=split2)
    if real_output:
        return c2r.reshape(n_out, lanes), None
    return c2r.reshape(n_out, lanes), c2i.reshape(n_out, lanes)


def _pipe2(n_tiles, in_start, in_wait, step, out_wait):
    """Software-pipelined streaming loop over two buffer sets with STATIC
    buffer indices.

    The natural dynamic form (``bufs[slot]`` with ``slot = t % 2``) defeats
    Mosaic's memory disambiguation — it cannot prove the in-flight DMA's
    destination slot is disjoint from the slot compute reads, so it
    serializes DMA against compute (measured: each phase costs
    DMA + compute instead of max(DMA, compute)). Unrolling the loop body
    over the two buffer sets makes every buffer reference a distinct
    memref and restores the overlap.

    Callbacks take (s, t): s is the PYTHON-int buffer set (0/1), t the
    traced tile index. ``step`` computes tile t from set s, waits the
    prior out-DMA on that set, stores, and starts the out-DMA.
    ``n_tiles`` must be even.
    """
    assert n_tiles % 2 == 0 and n_tiles >= 2, n_tiles
    in_start(0, jnp.int32(0))

    def body(i, carry):
        for s in (0, 1):
            t = 2 * i + s

            @pl.when(t + 1 < n_tiles)
            def _():
                # fill the OTHER buffer set while this one computes
                in_start(1 - s, t + 1)

            in_wait(s, t)
            step(s, t)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles // 2), body,
                      jnp.int32(0))
    for tt in (n_tiles - 2, n_tiles - 1):
        out_wait(tt % 2, jnp.int32(tt))


def _phase_a_kernel(n1, n2, batch, sign, real_input, mode, *refs,
                    n_total=None, has_col0=False):
    """Column DFT + four-step twiddle + transpose:
    x (batch*n1, n2) planar HBM -> Z (batch*n2, n1) planar HBM.

    Rows [b*n1, (b+1)*n1) of x hold transform b's (n1, n2) matrix; the
    tile loop runs batch*n_tiles iterations with dynamic row offsets, so
    batching adds no compile size (the Mosaic grid bug rules out grid=).

    Sharded four-step (parallel/sharded_fft.py): when this kernel runs on
    one chip's column block of a d-way transform, ``n_total`` is the FULL
    transform length (the twiddle period) and ``has_col0`` prepends an
    SMEM scalar ref holding this chip's global first-column index — the
    twiddle exponent k*(col0 + 128t + c) stays exact in i32 because
    n_total is a power of two dividing 2^32."""
    if has_col0:
        col0_ref, *refs = refs
    if real_input:
        (xr, zr, zi) = refs
        xi = None
    else:
        (xr, xi, zr, zi) = refs
    n_tiles = n2 // LANES
    r1 = 1 << ((n1.bit_length() - 1) // 2)
    r2 = n1 // r1
    n = n_total if n_total is not None else n1 * n2
    g = _group(batch, n1)
    gn1 = g * n1

    def body(bufs_r0, bufs_r1, bufs_i0, bufs_i1,
             outs_r0, outs_r1, outs_i0, outs_i1, in_sems, out_sems):
        bufs_r = (bufs_r0, bufs_r1)
        bufs_i = (bufs_i0, bufs_i1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)

        def _split(tt):
            """tile index -> (batch row-group bg, column tile t)."""
            if batch == g:
                return jnp.int32(0), tt
            nt = jnp.int32(n_tiles)
            return tt // nt, jax.lax.rem(tt, nt)

        def in_dma(s, tt):
            bg, t = _split(tt)
            # g consecutive batch rows share one (g*n1, L) strided copy
            roff = pl.multiple_of(bg * jnp.int32(gn1), gn1)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            cps = [pltpu.make_async_copy(
                xr.at[pl.ds(roff, gn1), pl.ds(off, LANES)], bufs_r[s],
                in_sems.at[jnp.int32(s), jnp.int32(0)])]
            if xi is not None:
                cps.append(pltpu.make_async_copy(
                    xi.at[pl.ds(roff, gn1), pl.ds(off, LANES)], bufs_i[s],
                    in_sems.at[jnp.int32(s), jnp.int32(1)]))
            return cps

        def out_dma(s, tt):
            bg, t = _split(tt)
            # per-segment contiguous (L, n1) writes: segment seg's rows in
            # Z sit at (bg*g + seg)*n2 + t*L — not contiguous across segs
            cps = []
            for seg in range(g):
                roff = pl.multiple_of(
                    (bg * jnp.int32(g) + jnp.int32(seg)) * jnp.int32(n2)
                    + t * jnp.int32(LANES),
                    LANES)
                src = pl.ds(seg * n1, n1)
                cps.append(pltpu.make_async_copy(
                    outs_r[s].at[_ds0(LANES), src],
                    zr.at[pl.ds(roff, LANES), _ds0(n1)],
                    out_sems.at[jnp.int32(s), jnp.int32(0), jnp.int32(seg)]))
                cps.append(pltpu.make_async_copy(
                    outs_i[s].at[_ds0(LANES), src],
                    zi.at[pl.ds(roff, LANES), _ds0(n1)],
                    out_sems.at[jnp.int32(s), jnp.int32(1), jnp.int32(seg)]))
            return cps

        # Four-step twiddle W_n^{k*(128t+c)} FACTORED over k = k2*r1 + k1:
        #   T[k, 128t+c] = U_t[k1, c] * V_t[k2, c]     (complex product)
        # with U_t[k1,c] = W_n^{k1*(128t+c)}, V_t[k2,c] = W_n^{k2*r1*(128t+c)}.
        # Both factors are (r, 128) — fully lane-packed. The unfactored
        # form needs a per-tile (n1, 1) cos/sin whose 1-lane layout wastes
        # 127/128 of the VPU and costs ~0.4 ms/phase at n1=4096 (measured,
        # benchmarks/probe_stream.py ablation). Tables are generated
        # in-kernel from integer iotas: uploading them would embed multi-MiB
        # HLO constants and overflow the remote-compile body limit (413).
        # i32 wraparound in the products is EXACT here: n is a power of two
        # dividing 2^32, so the wrapped residue differs from the true one
        # by a multiple of n, and rem()'s negative residues only shift the
        # angle by -2pi — invisible to cos/sin.
        two_pi_over_n = jnp.float32(sign * 2.0 * np.pi / n)
        k1_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 0)
        cu_io = jax.lax.broadcasted_iota(jnp.int32, (r1, LANES), 1)
        k2r1_io = jax.lax.broadcasted_iota(
            jnp.int32, (r2, LANES), 0) * jnp.int32(r1)
        cv_io = jax.lax.broadcasted_iota(jnp.int32, (r2, LANES), 1)
        mats1, mats2, tr, ti = _gen_dft_tables(n1, r1, r2, sign, mode)

        col0 = col0_ref[0] if has_col0 else jnp.int32(0)

        def step(s, tt):
            _, t = _split(tt)
            col = jnp.int32(LANES) * t + col0
            phu = jax.lax.rem(k1_io * (col + cu_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            phv = jax.lax.rem(k2r1_io * (col + cv_io), jnp.int32(n)) \
                .astype(jnp.float32) * two_pi_over_n
            ur, ui = jnp.cos(phu), jnp.sin(phu)
            vr_, vi_ = jnp.cos(phv), jnp.sin(phv)

            @pl.when(tt >= 2)
            def _():
                for cp in out_dma(s, tt - 2):
                    cp.wait()

            for seg in range(g):
                seg_rows = slice(seg * n1, (seg + 1) * n1)
                si = None if xi is None else bufs_i[s][seg_rows, :]
                cr, ci = _dft_slab(bufs_r[s][seg_rows, :], si, n1, r1, r2,
                                   mats1, mats2, tr, ti)
                # y *= U (broadcast over k2), then *= V (broadcast over
                # k1); the (n1, L) -> (r2, r1, L) reshape splits the
                # sublane axis in place (c2's row index is k2*r1 + k1)
                y3r = cr.reshape(r2, r1, LANES)
                y3i = ci.reshape(r2, r1, LANES)
                ar_ = y3r * ur[None] - y3i * ui[None]
                ai_ = y3r * ui[None] + y3i * ur[None]
                yr = (ar_ * vr_[:, None]
                      - ai_ * vi_[:, None]).reshape(n1, LANES)
                yi = (ar_ * vi_[:, None]
                      + ai_ * vr_[:, None]).reshape(n1, LANES)
                # per-(L, L)-block vreg transposes instead of a monolithic
                # .T: measured 0.32 vs 0.67 ms/phase at n1=4096 — Mosaic's
                # general (n1, L) -> (L, n1) relayout serializes against
                # the DMA pipeline while square block transposes overlap
                # fully (benchmarks/probe_stream.py, 'fblk' vs 'full')
                for j in range(n1 // LANES):
                    lo, hi = seg * n1 + j * LANES, seg * n1 + (j + 1) * LANES
                    outs_r[s][:, lo:hi] = yr[j * LANES:(j + 1) * LANES, :].T
                    outs_i[s][:, lo:hi] = yi[j * LANES:(j + 1) * LANES, :].T
            for cp in out_dma(s, tt):
                cp.start()

        _pipe2(
            (batch // g) * n_tiles,
            lambda s, t: [cp.start() for cp in in_dma(s, t)],
            lambda s, t: [cp.wait() for cp in in_dma(s, t)],
            step,
            lambda s, t: [cp.wait() for cp in out_dma(s, t)],
        )

    pl.run_scoped(
        body,
        bufs_r0=pltpu.VMEM((gn1, LANES), jnp.float32),
        bufs_r1=pltpu.VMEM((gn1, LANES), jnp.float32),
        bufs_i0=pltpu.VMEM((gn1, LANES), jnp.float32),
        bufs_i1=pltpu.VMEM((gn1, LANES), jnp.float32),
        outs_r0=pltpu.VMEM((LANES, gn1), jnp.float32),
        outs_r1=pltpu.VMEM((LANES, gn1), jnp.float32),
        outs_i0=pltpu.VMEM((LANES, gn1), jnp.float32),
        outs_i1=pltpu.VMEM((LANES, gn1), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2, g)),
    )


def _phase_b_kernel(n1, n2, batch, sign, scale, real_output, mode, *refs):
    """Row DFT: Z (batch*n2, n1) planar HBM -> X (batch*n2, n1) planar HBM
    (slab layout == output layout, no transpose)."""
    if real_output:
        (zr, zi, xor_) = refs
        xoi = None
    else:
        (zr, zi, xor_, xoi) = refs
    n_tiles = n1 // LANES
    r1 = 1 << ((n2.bit_length() - 1) // 2)
    r2 = n2 // r1
    g = _group(batch, n2)
    gn2 = g * n2

    def body(bufs_r0, bufs_r1, bufs_i0, bufs_i1,
             outs_r0, outs_r1, outs_i0, outs_i1, in_sems, out_sems):
        bufs_r = (bufs_r0, bufs_r1)
        bufs_i = (bufs_i0, bufs_i1)
        outs_r = (outs_r0, outs_r1)
        outs_i = (outs_i0, outs_i1)

        def _split(tt):
            if batch == g:
                return jnp.int32(0), tt
            nt = jnp.int32(n_tiles)
            return tt // nt, jax.lax.rem(tt, nt)

        def in_dma(s, tt):
            # group rows [bg*g*n2, (bg+1)*g*n2) are contiguous in Z — one
            # strided (g*n2, L) copy per plane
            bg, t = _split(tt)
            roff = pl.multiple_of(bg * jnp.int32(gn2), gn2)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            return [
                pltpu.make_async_copy(
                    zr.at[pl.ds(roff, gn2), pl.ds(off, LANES)], bufs_r[s],
                    in_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    zi.at[pl.ds(roff, gn2), pl.ds(off, LANES)], bufs_i[s],
                    in_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        def out_dma(s, tt):
            # same (g*n2, L) region in X — one strided copy per plane
            bg, t = _split(tt)
            roff = pl.multiple_of(bg * jnp.int32(gn2), gn2)
            off = pl.multiple_of(t * jnp.int32(LANES), LANES)
            cps = [pltpu.make_async_copy(
                outs_r[s], xor_.at[pl.ds(roff, gn2), pl.ds(off, LANES)],
                out_sems.at[jnp.int32(s), jnp.int32(0)])]
            if xoi is not None:
                cps.append(pltpu.make_async_copy(
                    outs_i[s], xoi.at[pl.ds(roff, gn2), pl.ds(off, LANES)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]))
            return cps

        mats1, mats2, tr, ti = _gen_dft_tables(n2, r1, r2, sign, mode)

        def step(s, tt):
            @pl.when(tt >= 2)
            def _():
                for cp in out_dma(s, tt - 2):
                    cp.wait()

            for seg in range(g):
                seg_rows = slice(seg * n2, (seg + 1) * n2)
                # real_output (irfft tail): the last stage computes only
                # the real plane — 2 of g3's 3 matmuls
                cr, ci = _dft_slab(bufs_r[s][seg_rows, :],
                                   bufs_i[s][seg_rows, :], n2, r1, r2,
                                   mats1, mats2, tr, ti,
                                   real_output=real_output)
                if scale != 1.0:
                    sc = jnp.float32(scale)
                    outs_r[s][seg_rows, :] = cr * sc
                    if xoi is not None:
                        outs_i[s][seg_rows, :] = ci * sc
                else:
                    outs_r[s][seg_rows, :] = cr
                    if xoi is not None:
                        outs_i[s][seg_rows, :] = ci
            for cp in out_dma(s, tt):
                cp.start()

        _pipe2(
            (batch // g) * n_tiles,
            lambda s, t: [cp.start() for cp in in_dma(s, t)],
            lambda s, t: [cp.wait() for cp in in_dma(s, t)],
            step,
            lambda s, t: [cp.wait() for cp in out_dma(s, t)],
        )

    pl.run_scoped(
        body,
        bufs_r0=pltpu.VMEM((gn2, LANES), jnp.float32),
        bufs_r1=pltpu.VMEM((gn2, LANES), jnp.float32),
        bufs_i0=pltpu.VMEM((gn2, LANES), jnp.float32),
        bufs_i1=pltpu.VMEM((gn2, LANES), jnp.float32),
        outs_r0=pltpu.VMEM((gn2, LANES), jnp.float32),
        outs_r1=pltpu.VMEM((gn2, LANES), jnp.float32),
        outs_i0=pltpu.VMEM((gn2, LANES), jnp.float32),
        outs_i1=pltpu.VMEM((gn2, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _vmem_limit(nf: int) -> int:
    # 8 slab buffers of (nf, 128) f32 + ~2x that again in compute
    # temporaries (measured: 42.5M at nf=4096); v5e has 128M physical
    return min(max(32 * 2**20, 24 * nf * LANES * 4), 100 * 2**20)


def fourstep_stream_p(
    xr: jax.Array,
    xi: Optional[jax.Array],
    n1: int,
    n2: int,
    inverse: bool,
    real_output: bool = False,
    mode: Optional[str] = None,
):
    """n-point planar FFT via two streaming passes; flat (n,) pair or a
    batched (B, n) pair (each row transformed independently — the tile
    loop runs B*n_tiles iterations, so batching costs no compile size).

    xi may be None (real input). real_output drops the imaginary output
    plane (irfft tail). Inverse applies 1/n scaling via sign-flipped
    tables — no conjugation passes. All tables are generated in-kernel
    (see _gen_dft_tables), so the kernels take only data refs. ``mode``
    overrides the DFT stage-table mode (default DFT_MODE = 'g3').
    """
    n = n1 * n2
    mode = mode or DFT_MODE
    batch = 1 if xr.ndim == 1 else xr.shape[0]
    out_lead = xr.shape[:-1]
    sign = 1 if inverse else -1
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    interp = _interpret()

    xr2 = xr.reshape(batch * n1, n2)
    ins_a = (xr2,) if xi is None else (xr2, xi.reshape(batch * n1, n2))
    kernel_a = functools.partial(
        _phase_a_kernel, n1, n2, batch, sign, xi is None, mode)
    zr, zi = pl.pallas_call(
        kernel_a,
        in_specs=[anyspec] * len(ins_a),
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((batch * n2, n1), jnp.float32),
            jax.ShapeDtypeStruct((batch * n2, n1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(_group(batch, n1) * n1),
        ),
        interpret=interp,
    )(*ins_a)

    scale = (1.0 / n) if inverse else 1.0
    kernel_b = functools.partial(
        _phase_b_kernel, n1, n2, batch, sign, scale, real_output, mode)
    out_shapes = (jax.ShapeDtypeStruct((batch * n2, n1), jnp.float32),)
    out_specs = (anyspec,)
    if not real_output:
        out_shapes += (jax.ShapeDtypeStruct((batch * n2, n1), jnp.float32),)
        out_specs += (anyspec,)
    outs = pl.pallas_call(
        kernel_b,
        in_specs=[anyspec] * 2,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(_group(batch, n2) * n2),
        ),
        interpret=interp,
    )(zr, zi)
    oshape = out_lead + (n,)
    if real_output:
        return outs[0].reshape(oshape), None
    return outs[0].reshape(oshape), outs[1].reshape(oshape)


# ---------------------------------------------------------------------------
# sharded four-step: per-chip halves (parallel/sharded_fft.py)
# ---------------------------------------------------------------------------


def dist_supported(n1: int, n2: int, d: int, dtype) -> bool:
    """Can the streaming kernels run the d-way sharded four-step?
    Each chip's local column/row blocks must keep an even, >= 2 tile
    count (the _pipe2 double-buffer contract) and the factors must be
    kernel-supported."""
    if np.dtype(dtype) != np.complex64:
        return False
    if not supported(n1, n2, np.complex64):
        return False
    for ftot in (n1, n2):
        loc = ftot // d
        if ftot % d or loc % LANES or (loc // LANES) % 2 or loc < LANES * 2:
            return False
    return True


def phase_a_local_p(
    xr: jax.Array,
    xi: Optional[jax.Array],
    n1: int,
    n_total: int,
    col0: jax.Array,
    inverse: bool,
    mode: Optional[str] = None,
):
    """One chip's phase A of a d-way sharded four-step FFT (SURVEY §5.8):
    local column block x[:, col0:col0+n2_local] as an (n1, n2_local)
    planar pair -> local Z rows (n2_local, n1) planar. ``col0`` is a
    TRACED i32 scalar (jax.lax.axis_index(...) * n2_local inside
    shard_map) delivered to the kernel through SMEM; ``n_total`` is the
    full transform length (twiddle period)."""
    mode = mode or DFT_MODE
    n2_local = xr.shape[-1]
    sign = 1 if inverse else -1
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    col0_arr = jnp.asarray(col0, jnp.int32).reshape(1)
    ins = (col0_arr, xr) if xi is None else (col0_arr, xr, xi)
    kernel = functools.partial(
        _phase_a_kernel, n1, n2_local, 1, sign, xi is None, mode,
        n_total=n_total, has_col0=True)
    return pl.pallas_call(
        kernel,
        in_specs=[smem] + [anyspec] * (len(ins) - 1),
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((n2_local, n1), jnp.float32),
            jax.ShapeDtypeStruct((n2_local, n1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n1)),
        interpret=_interpret(),
    )(*ins)


def phase_b_local_p(
    zr: jax.Array,
    zi: jax.Array,
    n2: int,
    n_total: int,
    inverse: bool,
    real_output: bool = False,
    mode: Optional[str] = None,
):
    """One chip's phase B of the d-way sharded four-step: the
    all_to_all-exchanged (n2, n1_local) planar Z block -> the (n2,
    n1_local) planar X block (natural order once column shards are
    re-joined; X.reshape(n2, n1) is sharded over its last axis)."""
    mode = mode or DFT_MODE
    n1_local = zr.shape[-1]
    sign = 1 if inverse else -1
    scale = (1.0 / n_total) if inverse else 1.0
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    kernel = functools.partial(
        _phase_b_kernel, n1_local, n2, 1, sign, scale, real_output, mode)
    out_shapes = (jax.ShapeDtypeStruct((n2, n1_local), jnp.float32),)
    out_specs = (anyspec,)
    if not real_output:
        out_shapes += (jax.ShapeDtypeStruct((n2, n1_local), jnp.float32),)
        out_specs += (anyspec,)
    outs = pl.pallas_call(
        kernel,
        in_specs=[anyspec] * 2,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_vmem_limit(n2)),
        interpret=_interpret(),
    )(zr, zi)
    if real_output:
        return outs[0], None
    return outs[0], outs[1]
