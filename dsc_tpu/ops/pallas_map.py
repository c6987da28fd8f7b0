"""Streaming elementwise map kernel (TPU).

XLA's fused elementwise loops measure ~360 GB/s on v5e for a simple fma
over 256 MiB while double-buffered DMA through VMEM streams at ~790 GB/s
(97% of HBM peak) — see benchmarks/PERF.md. Since the dsc op layer is
eager (one op = one device pass, mirroring the reference's per-op kernel
dispatch, dsc.cpp:1186-1442), each big elementwise op can ride DMA speed:
this kernel streams chunk-sized tiles HBM->VMEM->HBM with two in-flight
buffers per operand and applies the op on the VPU in between.

Used for large contiguous same-shape float ops; everything else falls
back to the plain XLA path (kernels.py).

Mosaic/axon constraints honored (see memory notes): gridless kernel,
i32 loop bounds and slice starts, 1024-element-aligned DMA offsets
(chunks are whole (rows, 128) slabs), no grid index maps.
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK_ROWS = 4096  # (4096, 128) f32 = 2 MiB per buffer per operand

# 'auto' = on TPU for eligible shapes; 'on' forces (interpret off-TPU);
# 'off' disables (escape hatch, SURVEY §5.6-style knob)
MODE = os.environ.get('DSC_MAP_STREAM', 'auto')


def _ds0(size):
    return pl.ds(jnp.int32(0), size)


def _map_kernel(fn, n_in, rows, *refs):
    ins = refs[:n_in]
    out = refs[n_in]
    total_rows = ins[0].shape[0]
    n_chunks = total_rows // rows

    def body(bufs, obufs, in_sems, out_sems):
        def in_dma(slot, t):
            slot = jnp.asarray(slot, jnp.int32)
            off = pl.multiple_of(t * jnp.int32(rows), rows)
            return [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(off, rows), _ds0(LANES)],
                    bufs[j].at[slot],
                    in_sems.at[slot, jnp.int32(j)],
                )
                for j in range(n_in)
            ]

        def out_dma(slot, t):
            slot = jnp.asarray(slot, jnp.int32)
            off = pl.multiple_of(t * jnp.int32(rows), rows)
            return pltpu.make_async_copy(
                obufs.at[slot],
                out.at[pl.ds(off, rows), _ds0(LANES)],
                out_sems.at[slot],
            )

        for cp in in_dma(0, 0):
            cp.start()

        def loop(t, carry):
            slot = jax.lax.rem(t, jnp.int32(2))
            nxt = jax.lax.rem(t + 1, jnp.int32(2))

            @pl.when(t + 1 < n_chunks)
            def _():
                for cp in in_dma(nxt, t + 1):
                    cp.start()

            for cp in in_dma(slot, t):
                cp.wait()
            y = fn(*[bufs[j][slot] for j in range(n_in)])

            @pl.when(t >= 2)
            def _():
                out_dma(slot, t - 2).wait()

            obufs[slot] = y
            out_dma(slot, t).start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), loop,
                          jnp.int32(0))
        for tt in (n_chunks - 2, n_chunks - 1):
            if tt >= 0:
                out_dma(tt % 2, tt).wait()

    pl.run_scoped(
        body,
        bufs=[pltpu.VMEM((2, rows, LANES), ins[j].dtype)
              for j in range(n_in)],
        obufs=pltpu.VMEM((2, rows, LANES), out.dtype),
        in_sems=pltpu.SemaphoreType.DMA((2, n_in)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def eligible(shapes, dtypes) -> bool:
    """Same-shape contiguous float arrays big enough to be DMA-bound."""
    if MODE == 'off':
        return False
    if len({tuple(s) for s in shapes}) != 1:
        return False
    ne = int(np.prod(shapes[0])) if shapes[0] else 0
    if ne < CHUNK_ROWS * LANES * 2 or ne % (CHUNK_ROWS * LANES):
        return False
    if any(np.dtype(d) not in (np.dtype(np.float32),) for d in dtypes):
        return False
    if MODE == 'on':
        return True
    return not _interpret()


def stream_map(fn: Callable, *arrays: jax.Array,
               out_dtype=None) -> jax.Array:
    """Elementwise ``fn`` over same-shape arrays via the streaming kernel.
    Caller must have checked ``eligible()``."""
    shape = arrays[0].shape
    out_dtype = out_dtype or jnp.result_type(*arrays)
    flat = [a.reshape(-1, LANES) for a in arrays]
    total_rows = flat[0].shape[0]
    rows = min(CHUNK_ROWS, total_rows)
    n_in = len(flat)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    out = pl.pallas_call(
        functools.partial(_map_kernel, fn, n_in, rows),
        in_specs=[anyspec] * n_in,
        out_specs=anyspec,
        out_shape=jax.ShapeDtypeStruct((total_rows, LANES), out_dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=_interpret(),
    )(*flat)
    return out.reshape(shape)
