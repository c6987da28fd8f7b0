"""Pallas TPU kernels for the FFT base case.

The reference's hot kernel is a recursive radix-2 butterfly
(dsc_fft.h:57-103) — a scalar-recursion shape that maps terribly to TPU.
The TPU-native formulation executes an entire n-point transform as two
MXU matrix multiplies (Cooley-Tukey with matrix-DFT radices):

    n = r1 * r2, x viewed M[j1, j2] (r1 x r2):
      A = F_r1 @ M                    (column DFTs — one MXU matmul)
      B = A * T,  T[k1,j2]=W_n^{k1*j2} (VPU twiddle)
      C = F_r2 @ B^T                  (row DFTs — one MXU matmul)
      X[k1 + r1*k2] = C[k2, k1]       (free: C's natural layout)

Data is staged through VMEM in *slab* layout (n, lanes): the transform
axis lives on sublanes and independent transforms ride the lanes, so
every reshape keeps the minor dimension fixed and every butterfly is a
dense matmul. Complex math is planar (re, im) float pairs — TPU vector
registers have no complex (SURVEY §7.3 risk 2); each complex-matmul
stage is ONE stacked real [[Fr,-Fi],[Fi,Fr]] matmul (full 128x128 MXU
tiles for r=64 factors) computed as three split-bf16 passes (~1e-5
relative error, ~2x the throughput of Precision.HIGHEST) — shared with
the streaming kernel, see pallas_stream.py.

DFT matrices and twiddles are generated in-kernel from integer iotas
with exact mod-n reduction (f32-trig-accurate, and no dense MLIR
constants — the remote compiler rejects multi-MiB payloads); see
pallas_stream._gen_dft_tables.

Mosaic quirk (axon remote-compile toolchain, observed 2026-08-16): any
``grid=`` + index maps combined with this kernel body fails to legalize
("func.return (i64, i32)"), while the gridless whole-block form compiles
fine — so the kernel is gridless and batching happens via jax.lax.map one
level up (one kernel compile, sequential VMEM-sized blocks).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _radices(n: int) -> Tuple[int, int]:
    r1 = 1 << ((n.bit_length() - 1) // 2)
    return r1, n // r1


def _fft_block_kernel(r1, r2, n, xr_ref, xi_ref, or_ref, oi_ref):
    """One (BB, n) batch block: transposed to slab layout in VMEM (transform
    axis on sublanes, batch on lanes), the shared slab DFT (stacked-real
    complex matmuls at Precision.HIGHEST — keeps the reference's
    per-element atol=rtol=1e-5 test tolerance at small n), transposed back
    on store. Tables are generated in-kernel (no dense MLIR constants —
    the remote compiler 413s on multi-MiB payloads). See
    pallas_stream._dft_slab / _gen_dft_tables."""
    from .pallas_stream import _dft_slab, _gen_dft_tables

    mats1, mats2, tr, ti = _gen_dft_tables(n, r1, r2, -1, 'f32')
    cr, ci = _dft_slab(
        xr_ref[:].T, xi_ref[:].T, n, r1, r2, mats1, mats2, tr, ti,
    )
    or_ref[:] = cr.T
    oi_ref[:] = ci.T


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _block_batch(n: int) -> int:
    """Block batch is pinned to one lane tile (128): the kernel's reshapes
    need the minor dim to stay lane-aligned (bb=64 hits Mosaic's
    "unsupported shape cast"), and larger blocks blow up compile time."""
    return LANES


def _vmem_limit(n: int, bb: int) -> int:
    """~10 live (n, bb) f32 planes; request a raised scoped-VMEM limit for
    blocks that exceed the default 16 MiB (v5e has headroom — 32 MiB
    verified on hardware for n=4096)."""
    need = 10 * n * bb * 4
    return max(16 * 2**20, min(2 * need, 64 * 2**20))


def _pallas_fft_block(xr, xi, n):
    r1, r2 = _radices(n)
    bb = xr.shape[0]
    kernel = functools.partial(_fft_block_kernel, r1, r2, n)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 2,
        out_specs=(full, full),
        out_shape=(
            jax.ShapeDtypeStruct((bb, n), jnp.float32),
            jax.ShapeDtypeStruct((bb, n), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * (r1 + r2) * bb,
            bytes_accessed=4 * n * bb * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n, bb)
        ),
        interpret=_interpret(),
    )(xr, xi)


def fft_base_planar(xr: jax.Array, xi: jax.Array, n: int):
    """Forward DFT of each row (B, n) planar f32 via the block kernel.
    Called from inside jit (fft core). Batches larger than one VMEM block
    are chunked by statically-unrolled slices: lax.map's while-loop makes
    XLA stage the full chunk array in scoped VMEM and OOM (observed on
    v5e); separate pallas calls share one Mosaic kernel compile."""
    b = xr.shape[0]
    bb = _block_batch(n)
    b_pad = max(((b + bb - 1) // bb) * bb, bb)
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    n_chunks = b_pad // bb
    if n_chunks == 1:
        yr, yi = _pallas_fft_block(xr, xi, n)
    else:
        yrs, yis = [], []
        for c in range(n_chunks):
            cr, ci = _pallas_fft_block(
                xr[c * bb:(c + 1) * bb], xi[c * bb:(c + 1) * bb], n
            )
            yrs.append(cr)
            yis.append(ci)
        yr = jnp.concatenate(yrs, axis=0)
        yi = jnp.concatenate(yis, axis=0)
    return yr[:b], yi[:b]


def fft_base(x: jax.Array, n: int) -> jax.Array:
    """Complex-typed convenience wrapper over fft_base_planar."""
    yr, yi = fft_base_planar(jnp.real(x), jnp.imag(x), n)
    return jax.lax.complex(yr, yi)
