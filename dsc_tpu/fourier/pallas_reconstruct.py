"""Pallas kernel: Hermitian spectrum reconstruction for large irfft.

irfft needs full[k] = X[k] for k <= n/2 and conj(X[n-k]) for k > n/2.
At XLA level the conjugate-reversed tail lowers to lane gathers / shifted
relayouts costing ~15 ms at 2^24 (measured; see benchmarks/PERF.md). This
kernel instead streams aligned HBM windows through VMEM, where the reversal
is two exchange-matrix matmuls on the MXU and the odd offset is absorbed by
a static 127-lane shift (two pltpu.roll ops + a select) — no gathers.

Axon-Mosaic constraints honored (all discovered on hardware):
- 1-D HBM DMA slice sizes AND offsets must be 1024-element aligned: each
  tail chunk loads the aligned superset window x[nh-mc-c : nh-mc+1024) and
  the +1 spectrum offset becomes an in-VMEM shift
- rev has no TPU lowering -> flips are exchange-matrix matmuls
- (1,1)->(rows,lanes) broadcasts are "Broadcast in both sublanes and
  lanes: not implemented" (even staged or via multiply) -> avoided entirely
- i64 anywhere breaks tpu.memref_slice / recurses in convert lowering
  (x64 mode is on) -> i32 loop bounds, i32 roll shifts

Layout: planar (re, im) f32 pairs, 1-D flat arrays in HBM (ANY), staged
through VMEM as (rows, 128) tiles.

Derivation: output window m covers full[nh+mc : nh+(m+1)c) with
content[i] = (m,i)==(0,0) ? x[nh] : conj(x[nh-mc-i]). With
big = x[nh-mc-c : nh-mc+1024) and F = flip(big):
content[i] = big[c-i] = F[1023+i]; dropping F's first 7 rows gives
F7 (rows+1, 128) with content[i] = F7_flat[127+i] — a 127-lane shift:
out[r,c] = (c==0) ? F7[r,127] : F7[r+1,c-1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 2**16  # elements per tail chunk (f32: 256 KiB/plane in VMEM)


def _exchange(m: int, dtype):
    """m x m exchange (anti-identity) matrix built from iota comparisons."""
    i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return (i + j == m - 1).astype(dtype)


def _flip2d(a):
    """Full reversal of a flattened (rows, 128) tile: J_r @ a @ J_c."""
    rows = a.shape[0]
    jr = _exchange(rows, a.dtype)
    jc = _exchange(LANES, a.dtype)
    dot = functools.partial(
        jnp.dot, preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return dot(dot(jr, a), jc)


def _shift127(f7):
    """(rows+1, 128) -> (rows, 128): out_flat[i] = f7_flat[127 + i]."""
    rows = f7.shape[0] - 1
    one = jnp.int32(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows + 1, LANES), 1)
    ra = pltpu.roll(f7, one, 1)                 # ra[r, c] = f7[r, (c-1)%128]
    g = pltpu.roll(f7, jnp.int32(-1), 0)        # g[r, :] = f7[r+1, :]
    rg = pltpu.roll(g, one, 1)                  # rg[r, c] = f7[r+1, (c-1)%128]
    out = jnp.where(col == 0, ra, rg)
    return out[:rows]


def _reconstruct_kernel(n, nh, c, xr, xi, fr, fi):
    """xr/xi: (nh + 1024,) HBM planar halves; fr/fi: (n,) HBM outputs."""
    rows = c // LANES
    big_rows = rows + 8  # c + 1024 elements

    def body(buf_r, buf_i, out_r, out_i,
             sem_ir, sem_ii, sem_or, sem_oi, sem_hr, sem_hi):
        # head: full[0 : nh] = x[0 : nh] — aligned HBM->HBM DMA, disjoint
        # from every tail window
        head_r = pltpu.make_async_copy(
            xr.at[pl.ds(0, nh)], fr.at[pl.ds(0, nh)], sem_hr
        )
        head_r.start()
        head_i = pltpu.make_async_copy(
            xi.at[pl.ds(0, nh)], fi.at[pl.ds(0, nh)], sem_hi
        )
        head_i.start()

        n_chunks = nh // c

        def loop(m, carry):
            # aligned superset window start; Mosaic's divisibility prover
            # needs the explicit multiple_of hint
            src = pl.multiple_of((nh - c) - m * c, 1024)
            cp_r = pltpu.make_async_copy(
                xr.at[pl.ds(src, c + 1024)], buf_r, sem_ir
            )
            cp_i = pltpu.make_async_copy(
                xi.at[pl.ds(src, c + 1024)], buf_i, sem_ii
            )
            cp_r.start()
            cp_i.start()
            cp_r.wait()
            cp_i.wait()
            fbig_r = _flip2d(buf_r[:].reshape(big_rows, LANES))
            fbig_i = _flip2d(buf_i[:].reshape(big_rows, LANES))
            sr = _shift127(fbig_r[7:])
            si = _shift127(fbig_i[7:])
            # conjugate the tail; full[nh] itself (chunk 0, elem 0) should
            # stay unconjugated, but valid Hermitian input has imag==0
            # there, and a scalar-dependent mask would need an unsupported
            # broadcast — numpy-visible difference is O(imag(X[nh])/n)
            out_r[:] = sr.reshape(c)
            out_i[:] = -si.reshape(c)
            dst = pl.multiple_of(nh + m * c, 1024)  # aligned dest window
            wr_r = pltpu.make_async_copy(
                out_r.at[pl.ds(0, c)], fr.at[pl.ds(dst, c)], sem_or
            )
            wr_i = pltpu.make_async_copy(
                out_i.at[pl.ds(0, c)], fi.at[pl.ds(dst, c)], sem_oi
            )
            wr_r.start()
            wr_i.start()
            wr_r.wait()
            wr_i.wait()
            return carry

        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks), loop, jnp.int32(0)
        )
        head_r.wait()
        head_i.wait()

    pl.run_scoped(
        body,
        buf_r=pltpu.VMEM((CHUNK + 1024,), xr.dtype),
        buf_i=pltpu.VMEM((CHUNK + 1024,), xi.dtype),
        out_r=pltpu.VMEM((CHUNK,), xr.dtype),
        out_i=pltpu.VMEM((CHUNK,), xi.dtype),
        sem_ir=pltpu.SemaphoreType.DMA,
        sem_ii=pltpu.SemaphoreType.DMA,
        sem_or=pltpu.SemaphoreType.DMA,
        sem_oi=pltpu.SemaphoreType.DMA,
        sem_hr=pltpu.SemaphoreType.DMA,
        sem_hi=pltpu.SemaphoreType.DMA,
    )


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def reconstruct_spectrum_p(xr: jax.Array, xi: jax.Array, n: int):
    """(B, n/2+1) planar -> (B, n) planar with Hermitian symmetry.

    Kernel path needs n a power of two with n/2 divisible by CHUNK and
    B == 1; anything else falls back to XLA ops. The kernel conjugates
    full[n/2]; valid Hermitian spectra are real there, so the only
    deviation is O(imag(X[n/2])/n) on already-invalid input (see kernel
    note).
    """
    b, _ = xr.shape
    nh = n // 2
    if nh % CHUNK or nh // CHUNK < 1 or b != 1:
        tr = xr[:, 1:nh][:, ::-1]
        ti = -xi[:, 1:nh][:, ::-1]
        return (
            jnp.concatenate([xr, tr], axis=1),
            jnp.concatenate([xi, ti], axis=1),
        )
    # pad so the superset window of chunk 0 (up to x[nh+1024)) is in bounds
    pad = nh + 1024 - (nh + 1)
    xr = jnp.pad(xr.reshape(-1), (0, pad))
    xi = jnp.pad(xi.reshape(-1), (0, pad))
    kernel = functools.partial(_reconstruct_kernel, n, nh, CHUNK)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    fr, fi = pl.pallas_call(
        kernel,
        in_specs=[anyspec, anyspec],
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((n,), xr.dtype),
            jax.ShapeDtypeStruct((n,), xi.dtype),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(xr, xi)
    return fr.reshape(1, n), fi.reshape(1, n)


def reconstruct_spectrum(x: jax.Array, n: int) -> jax.Array:
    """Complex-typed convenience wrapper over reconstruct_spectrum_p."""
    fr, fi = reconstruct_spectrum_p(jnp.real(x), jnp.imag(x), n)
    return jax.lax.complex(fr, fi)
