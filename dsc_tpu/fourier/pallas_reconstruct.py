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


def _split3(x):
    """Exact 3-term bf16 split: h1 + h2 + h3 == x bit-for-bit (3 x 8
    mantissa bits cover f32's 24; round-to-nearest remainders are exactly
    representable)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _perm_dot(j, x, right=False):
    """EXACT permutation matmul j @ x (or x @ j): j is 0/1 (exact in
    bf16), each term's products and single-nonzero sums are exact, so
    three bf16 passes reconstruct x permuted bit-for-bit — at half the
    MXU passes of Precision.HIGHEST (which splits both operands, 6)."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    jb = j.astype(jnp.bfloat16)
    terms = _split3(x)
    if right:
        return sum(dot(h, jb) for h in terms)
    return sum(dot(jb, h) for h in terms)


def _flip2d(a):
    """Full reversal of a flattened (rows, 128) tile: J_r @ a @ J_c."""
    rows = a.shape[0]
    jr = _exchange(rows, jnp.float32)
    jc = _exchange(LANES, jnp.float32)
    return _perm_dot(jc, _perm_dot(jr, a), right=True)


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

    n_chunks = nh // c

    def body(br0, br1, bi0, bi1, or0, or1, oi0, oi1,
             in_sems, out_sems, sem_hr, sem_hi):
        bufs_r, bufs_i = (br0, br1), (bi0, bi1)
        outs_r, outs_i = (or0, or1), (oi0, oi1)
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

        def in_dma(s, m):
            # aligned superset window start; Mosaic's divisibility prover
            # needs the explicit multiple_of hint
            src = pl.multiple_of((nh - c) - m * c, 1024)
            return [
                pltpu.make_async_copy(
                    xr.at[pl.ds(src, c + 1024)], bufs_r[s],
                    in_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    xi.at[pl.ds(src, c + 1024)], bufs_i[s],
                    in_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        def out_dma(s, m):
            dst = pl.multiple_of(nh + m * c, 1024)
            return [
                pltpu.make_async_copy(
                    outs_r[s], fr.at[pl.ds(dst, c)],
                    out_sems.at[jnp.int32(s), jnp.int32(0)]),
                pltpu.make_async_copy(
                    outs_i[s], fi.at[pl.ds(dst, c)],
                    out_sems.at[jnp.int32(s), jnp.int32(1)]),
            ]

        def step(s, m):
            fbig_r = _flip2d(bufs_r[s][:].reshape(big_rows, LANES))
            fbig_i = _flip2d(bufs_i[s][:].reshape(big_rows, LANES))
            sr = _shift127(fbig_r[7:])
            si = _shift127(fbig_i[7:])

            @pl.when(m >= 2)
            def _():
                for cp in out_dma(s, m - 2):
                    cp.wait()

            # conjugate the tail; full[nh] itself (chunk 0, elem 0) should
            # stay unconjugated, but valid Hermitian input has imag==0
            # there, and a scalar-dependent mask would need an unsupported
            # broadcast — numpy-visible difference is O(imag(X[nh])/n)
            outs_r[s][:] = sr.reshape(c)
            outs_i[s][:] = -si.reshape(c)
            for cp in out_dma(s, m):
                cp.start()

        from .pallas_stream import _pipe2

        _pipe2(
            n_chunks,
            lambda s, m: [cp.start() for cp in in_dma(s, m)],
            lambda s, m: [cp.wait() for cp in in_dma(s, m)],
            step,
            lambda s, m: [cp.wait() for cp in out_dma(s, m)],
        )
        head_r.wait()
        head_i.wait()

    pl.run_scoped(
        body,
        br0=pltpu.VMEM((c + 1024,), xr.dtype),
        br1=pltpu.VMEM((c + 1024,), xr.dtype),
        bi0=pltpu.VMEM((c + 1024,), xi.dtype),
        bi1=pltpu.VMEM((c + 1024,), xi.dtype),
        or0=pltpu.VMEM((c,), xr.dtype),
        or1=pltpu.VMEM((c,), xr.dtype),
        oi0=pltpu.VMEM((c,), xi.dtype),
        oi1=pltpu.VMEM((c,), xi.dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, 2)),
        out_sems=pltpu.SemaphoreType.DMA((2, 2)),
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
    if nh % CHUNK or nh // CHUNK < 2 or (nh // CHUNK) % 2 or b != 1:
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
