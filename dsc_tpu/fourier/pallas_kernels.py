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
registers have no complex (SURVEY §7.3 risk 2); a complex product is
4 real matmuls. Matmuls run at Precision.HIGHEST: on this toolchain it
both meets the 1e-4 accuracy bar (default bf16 passes give ~3e-3) and
compiles an order of magnitude faster.

DFT matrices and twiddles are computed host-side in float64 and downcast
(dsc_init_plan parity, dsc_fft.h:33-55).

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


@functools.lru_cache(maxsize=64)
def _consts(n: int) -> Tuple:
    """Host-precomputed (f64 -> f32) DFT matrices + inner twiddle."""
    r1 = 1 << ((n.bit_length() - 1) // 2)
    r2 = n // r1
    j1 = np.arange(r1, dtype=np.float64)
    j2 = np.arange(r2, dtype=np.float64)
    f1 = np.exp(-2j * np.pi * np.outer(j1, j1) / r1)
    f2 = np.exp(-2j * np.pi * np.outer(j2, j2) / r2)
    t = np.exp(-2j * np.pi * np.outer(j1, j2) / n)  # T[k1, j2]
    to32 = lambda a: a.astype(np.float32)
    return (
        r1,
        r2,
        to32(f1.real), to32(f1.imag),
        to32(f2.real), to32(f2.imag),
        to32(t.real), to32(t.imag),
    )


def _fft_block_kernel(r1, r2, n,
                      xr_ref, xi_ref,
                      f1r_ref, f1i_ref, f2r_ref, f2i_ref, tr_ref, ti_ref,
                      or_ref, oi_ref):
    """One (BB, n) batch block: transposed to slab layout in VMEM, two MXU
    matmul passes, transposed back on store."""
    bb = xr_ref.shape[0]
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # slab layout: transform axis on sublanes, batch on lanes
    xr = xr_ref[:].T
    xi = xi_ref[:].T
    # M[j1, (j2, b)]
    mr = xr.reshape(r1, r2 * bb)
    mi = xi.reshape(r1, r2 * bb)
    f1r, f1i = f1r_ref[:], f1i_ref[:]
    # A = F1 @ M (complex via 4 real matmuls)
    ar = dot(f1r, mr) - dot(f1i, mi)
    ai = dot(f1r, mi) + dot(f1i, mr)
    # twiddle T[k1, j2] broadcast over lanes
    tr = tr_ref[:].reshape(r1, r2, 1)
    ti = ti_ref[:].reshape(r1, r2, 1)
    a3r = ar.reshape(r1, r2, bb)
    a3i = ai.reshape(r1, r2, bb)
    br = a3r * tr - a3i * ti
    bi = a3r * ti + a3i * tr
    # C = F2 @ B^T: rearrange to [j2, (k1, b)]
    b2r = br.transpose(1, 0, 2).reshape(r2, r1 * bb)
    b2i = bi.transpose(1, 0, 2).reshape(r2, r1 * bb)
    f2r, f2i = f2r_ref[:], f2i_ref[:]
    cr = dot(f2r, b2r) - dot(f2i, b2i)
    ci = dot(f2r, b2i) + dot(f2i, b2r)
    # rows of C are k2-major, k1-minor == output index k = k1 + r1*k2
    or_ref[:] = cr.reshape(n, bb).T
    oi_ref[:] = ci.reshape(n, bb).T


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


def _pallas_fft_block(xr, xi, n, consts):
    r1, r2 = _consts(n)[:2]
    bb = xr.shape[0]
    kernel = functools.partial(_fft_block_kernel, r1, r2, n)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 8,
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
    )(xr, xi, *consts)


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
    consts = tuple(jnp.asarray(a) for a in _consts(n)[2:])
    n_chunks = b_pad // bb
    if n_chunks == 1:
        yr, yi = _pallas_fft_block(xr, xi, n, consts)
    else:
        yrs, yis = [], []
        for c in range(n_chunks):
            cr, ci = _pallas_fft_block(
                xr[c * bb:(c + 1) * bb], xi[c * bb:(c + 1) * bb], n, consts
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
