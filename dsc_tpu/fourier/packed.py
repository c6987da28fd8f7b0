"""Packed half-size real FFT: rfft_n via one n/2-point complex engine.

The classic half-size trick (reference dsc_fft.h:178-238 runs it as the
r2c entry): pack z[t] = x[2t] + i*x[2t+1], run ONE complex FFT of length
n/2, then untangle X[k] from Z[k] and conj(Z[n/2-k]). Versus the
full-size real engine (phase A real-input + full complex phase B =
1.5 MXU units at size n) the packed engine runs 2 complex phases at
size n/2 = 1.0 MXU unit — a 33% cut of the MXU-bound pair time IF the
packing stages are free. Round-4 on-chip A/B: they are not free at
the XLA level — deint+inter cost 0.74 ms and the untangle/entangle
flip/concat passes ~1 ms at 2^24, so the composed pair LOSES to the
full-size engine (config.use_packed defaults off; DSC_FFT_PACKED=on
opts in). The recorded path to the win is folding the selection into
phase A's slab DMA + the untangle into mirror-paired phase-B tiles
(benchmarks/PERF.md round-4 "packed half-size engine").

TPU-native formulation (the part the reference cannot inform): a
stride-2 deinterleave is exactly what this Mosaic/axon stack cannot
express in-kernel (lane rolls SIGABRT, lane-strided DMA is
catastrophic, XLA's x[0::2] lowers as a 157 ms gather — all measured,
probe_deint.py / PERF.md). Three formulations that avoid lane gathers
are implemented and selected by DSC_FFT_DEINT (all three measured
on-chip round 4, probe_packed.py / probe_acc2):

  tr  — XLA transpose of x.reshape(m, 2) to (2, m) (transpose
        emitter, not gather). EXACT and fastest in composition
        (0.74 ms deint+inter at 2^24); the 'auto' default.
  mm  — multiply x.reshape(-1, 256) by the exact 0/1 even/odd
        selection matrix on the MXU (2-term bf16 hi/lo split, the
        _flip_dot trick). Exact as a standalone jit; loses the lo
        correction when fused into the full forward (see _impl).
  u64 — bitcast x.reshape(m, 2) pairs to u64, mask/shift the halves
        back out. Lowers through emulated 64-bit vreg ops at 22 GB/s
        on this stack — correct but not competitive.

The T-layout identity that makes this a drop-in replacement: with
inner factors (n1, n2/2), the n/2-engine's full-T layout
Z_T[j1, j2] = Z[j1 + n1*j2] indexes IDENTICALLY to the size-n half-T
layout X_T[k1, k2] = X[k1 + n1*k2] (pallas_stream_t.py docstring), so
the untangle is an elementwise pass in T coordinates whose mirror
operand B[k] = Z[(n/2 - k) mod n/2] is a row/column flip plus periodic
column extension — all XLA copy ops, no gathers. The untangle twiddle
W = exp(-2i*pi*k/n) factors over k = k1 + n1*k2 into an outer product
of two unit-phasor vectors (n1 + nc transcendentals instead of n1*nc).

Accuracy: the 2^-16 mm-split residual and the f32 outer-product
twiddle sit below the engine's own ~1e-5 relative error (bound 1e-4).
"""

from __future__ import annotations

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_stream_t

LANES = 128

# deinterleave/interleave formulation (see module docstring); 'auto'
# resolves to the on-chip winner recorded in PERF.md (probe_deint.py).
DEINT_IMPL = os.environ.get('DSC_FFT_DEINT', 'auto')


def _impl() -> str:
    if DEINT_IMPL != 'auto':
        return DEINT_IMPL
    # 'tr' measured EXACT and fastest in composition (round 4,
    # probe_acc2: composed forward 6.4e-6; deint+inter 0.74 ms at 2^24).
    # 'mm' is exact in isolation but loses its hi/lo correction when
    # fused into the full forward program (composed err 1.6e-3 — the
    # optimization barrier around the bf16 split holds as a standalone
    # jit yet not inside the larger program on this XLA:axon stack);
    # 'u64' lowers through emulated 64-bit ops at 22 GB/s. Both stay
    # selectable for experiments.
    return 'tr'


@functools.lru_cache(maxsize=2)
def _sel_matrix():
    """(256, 256) 0/1 selection: columns 0..127 pick even lanes,
    128..255 pick odd lanes — ONE matmul deinterleaves both halves
    (its transpose re-interleaves). Host constant, exact in bf16."""
    p = np.zeros((2 * LANES, 2 * LANES), np.float32)
    c = np.arange(LANES)
    p[2 * c, c] = 1.0
    p[2 * c + 1, LANES + c] = 1.0
    return p.astype(jnp.bfloat16), p.T.astype(jnp.bfloat16)


def _split_bf16_x(x):
    """2-term hi/lo bf16 split (residual ~2^-16 relative), with an
    optimization barrier so XLA cannot fold the f32->bf16 converts into
    the consuming dot: the folded form quantizes INSIDE the MXU, which
    TRUNCATES mantissas instead of rounding — measured 2^-8-level error
    that broke the packed engine's 1e-4 budget (probe_mm, round 4).
    Behind the barrier the operands are genuinely bf16, so any further
    hardware quantization is the identity."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jax.lax.optimization_barrier((hi, lo))


def deinterleave(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(n,) f32 -> (even, odd) halves, each (n/2,) f32."""
    n = x.shape[0]
    impl = _impl()
    if impl == 'u64':
        v = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint32).reshape(n // 2, 2),
            jnp.uint64)
        lo = (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (v >> jnp.uint64(32)).astype(jnp.uint32)
        return (jax.lax.bitcast_convert_type(lo, jnp.float32),
                jax.lax.bitcast_convert_type(hi, jnp.float32))
    if impl == 'tr':
        xt = x.reshape(n // 2, 2).T
        return xt[0], xt[1]
    # 'mm': exact 0/1 selection on the MXU, 2-term hi/lo split; the
    # combined (256, 256) matrix yields [even | odd] in one product
    pc, _ = _sel_matrix()
    x4 = x.reshape(-1, 2 * LANES)
    xh, xl = _split_bf16_x(x4)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    eo = dot(xh, pc) + dot(xl, pc)
    return eo[:, :LANES].reshape(n // 2), eo[:, LANES:].reshape(n // 2)


def interleave(e: jax.Array, o: jax.Array) -> jax.Array:
    """(even, odd) halves (m,) f32 -> interleaved (2m,) f32."""
    m = e.shape[0]
    impl = _impl()
    if impl == 'u64':
        lo = jax.lax.bitcast_convert_type(e, jnp.uint32).astype(jnp.uint64)
        hi = jax.lax.bitcast_convert_type(o, jnp.uint32).astype(jnp.uint64)
        v = lo | (hi << jnp.uint64(32))
        w = jax.lax.bitcast_convert_type(v, jnp.uint32)  # (m, 2)
        return jax.lax.bitcast_convert_type(w, jnp.float32).reshape(2 * m)
    if impl == 'tr':
        return jnp.stack([e, o], axis=0).T.reshape(2 * m)
    _, pct = _sel_matrix()
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    eo = jnp.concatenate([e.reshape(-1, LANES), o.reshape(-1, LANES)],
                         axis=1)
    eoh, eol = _split_bf16_x(eo)
    y = dot(eoh, pct) + dot(eol, pct)
    return y.reshape(2 * m)


@functools.lru_cache(maxsize=8)
def _phasor_vectors(n1: int, ncols: int, n: int, sign: float):
    """Host f64 unit-phasor vectors for exp(sign*2i*pi*(k1 + n1*k2)/n),
    factored over the grid: (n1,) column phasors x (ncols,) row phasors.
    Host-side because XLA:TPU's f32 cos/sin lowering costs ~1e-3 of the
    untangle's accuracy (measured, probe_packed.py round 4); these are
    n1 + ncols values of STATIC data — exact f64 trig cast to f32."""
    ta = sign * 2.0 * np.pi / n * np.arange(n1, dtype=np.float64)
    tb = sign * 2.0 * np.pi / (n // n1) * np.arange(ncols, dtype=np.float64)
    return (np.cos(ta).astype(np.float32)[:, None],
            np.sin(ta).astype(np.float32)[:, None],
            np.cos(tb).astype(np.float32)[None, :],
            np.sin(tb).astype(np.float32)[None, :])


def _phasor_outer(n1: int, ncols: int, n: int, sign: float):
    """(Wr, Wi) on the (n1, ncols) grid as an outer product of two unit
    phasors (the k-grid twiddle is never materialized host-side: 25 KiB
    of vectors instead of a multi-MiB HLO constant)."""
    car, sar, cbr, sbr = map(jnp.asarray, _phasor_vectors(n1, ncols, n, sign))
    return car * cbr - sar * sbr, car * sbr + sar * cbr


def _pext(p: jax.Array, ncols: int) -> jax.Array:
    """Periodic column extension of a (r, m) plane to (r, ncols)."""
    m = p.shape[1]
    if ncols <= m:
        return p[:, :ncols]
    assert ncols <= 2 * m
    return jnp.concatenate([p, p[:, :ncols - m]], axis=1)


def rfft_half_t_packed(x: jax.Array, n1: int, n2: int):
    """(n,) f32 -> hermitian-half T-layout planes (n1 + PAD_ROWS, nc),
    bit-compatible with pallas_stream_t.fourstep_to_t_p(half=True)."""
    n = n1 * n2
    m2 = n2 // 2
    nc = pallas_stream_t.nc_for(n2, True)
    e, o = deinterleave(x.reshape(n))
    zr, zi = pallas_stream_t.fourstep_to_t_p(e, o, n1, m2, half=False)

    # A[k1,k2] = Z[(k1 + n1*k2) mod n/2]: periodic extension of Z_T
    ar, ai = _pext(zr, nc), _pext(zi, nc)
    # B[k1,k2] = Z[(n/2 - k) mod n/2]: row 0 is Z[0, (m2-k2) mod m2],
    # rows >= 1 are the double flip of Z[1:], both extended periodically
    b0r = jnp.concatenate([zr[0:1, 0:1], zr[0:1, 1:][:, ::-1]], axis=1)
    b0i = jnp.concatenate([zi[0:1, 0:1], zi[0:1, 1:][:, ::-1]], axis=1)
    yr = zr[1:][::-1, ::-1]
    yi = zi[1:][::-1, ::-1]
    br = jnp.concatenate([_pext(b0r, nc), _pext(yr, nc)], axis=0)
    bi = jnp.concatenate([_pext(b0i, nc), _pext(yi, nc)], axis=0)

    # X = (A + conj(B))/2 - (i/2) * W * (A - conj(B)), W = e^{-2i*pi*k/n}
    er = 0.5 * (ar + br)
    ei = 0.5 * (ai - bi)
    orr = 0.5 * (ar - br)
    oi = 0.5 * (ai + bi)
    wr, wi = _phasor_outer(n1, nc, n, -1.0)
    # -i*W*O = (Wr*Oi + Wi*Or) - i*(Wr*Or - Wi*Oi)
    hr = er + wr * oi + wi * orr
    hi = ei - (wr * orr - wi * oi)
    pad = pallas_stream_t.pad_rows(True)
    hr = jnp.pad(hr, ((0, pad), (0, 0)))
    hi = jnp.pad(hi, ((0, pad), (0, 0)))
    return hr, hi


def irfft_from_half_t_packed(hr: jax.Array, hi: jax.Array,
                             n1: int, n2: int):
    """Hermitian-half T-layout planes -> (n,) real inverse (1/n scaled
    overall, i.e. irfft(rfft(x)) == x)."""
    n = n1 * n2
    m2 = n2 // 2
    xr, xi = hr[:n1], hi[:n1]
    ar, ai = xr[:, :m2], xi[:, :m2]
    # B[k] = X[n/2 - k]: row 0 reads cols m2..1 (incl. the stored
    # Nyquist col), rows >= 1 are the double flip
    b0r = xr[0:1, 1:m2 + 1][:, ::-1]
    b0i = xi[0:1, 1:m2 + 1][:, ::-1]
    br = jnp.concatenate([b0r, xr[1:, :m2][::-1, ::-1]], axis=0)
    bi = jnp.concatenate([b0i, xi[1:, :m2][::-1, ::-1]], axis=0)

    # Z = (A + conj(B))/2 + i * Wc * (A - conj(B))/2, Wc = e^{+2i*pi*k/n}
    er = 0.5 * (ar + br)
    ei = 0.5 * (ai - bi)
    dr = 0.5 * (ar - br)
    di = 0.5 * (ai + bi)
    wr, wi = _phasor_outer(n1, m2, n, +1.0)
    # i*Wc*D = -(Wr*Di + Wi*Dr) + i*(Wr*Dr - Wi*Di)
    zr = er - (wr * di + wi * dr)
    zi = ei + (wr * dr - wi * di)

    yr, yi = pallas_stream_t.fourstep_from_t_p(
        zr, zi, n1, m2, half=False, real_output=False)
    return interleave(yr, yi)


def supported(n1: int, n2: int) -> bool:
    """Inner factors (n1, n2/2) must themselves be streaming-legal."""
    m2 = n2 // 2
    from . import pallas_stream

    return (pallas_stream.supported(n1, m2, np.complex64)
            and n1 % LANES == 0 and m2 % LANES == 0)
