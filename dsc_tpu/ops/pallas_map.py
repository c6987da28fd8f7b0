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
    from dsc_tpu.fourier.pallas_stream import _pipe2

    ins = refs[:n_in]
    out = refs[n_in]
    total_rows = ins[0].shape[0]
    n_chunks = total_rows // rows

    def body(*scratch):
        # separate per-set buffers: static refs keep Mosaic's memory
        # disambiguation happy so DMA overlaps compute (see _pipe2)
        bufs = (scratch[:n_in], scratch[n_in:2 * n_in])
        obufs = scratch[2 * n_in:2 * n_in + 2]
        in_sems, out_sems = scratch[-2], scratch[-1]

        def in_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(rows), rows)
            return [
                pltpu.make_async_copy(
                    ins[j].at[pl.ds(off, rows), _ds0(LANES)],
                    bufs[s][j],
                    in_sems.at[jnp.int32(s), jnp.int32(j)],
                )
                for j in range(n_in)
            ]

        def out_dma(s, t):
            off = pl.multiple_of(t * jnp.int32(rows), rows)
            return [pltpu.make_async_copy(
                obufs[s],
                out.at[pl.ds(off, rows), _ds0(LANES)],
                out_sems.at[jnp.int32(s)],
            )]

        def step(s, t):
            y = fn(*[bufs[s][j][:] for j in range(n_in)])

            @pl.when(t >= 2)
            def _():
                for cp in out_dma(s, t - 2):
                    cp.wait()

            obufs[s][:] = y
            for cp in out_dma(s, t):
                cp.start()

        _pipe2(
            n_chunks,
            lambda s, t: [cp.start() for cp in in_dma(s, t)],
            lambda s, t: [cp.wait() for cp in in_dma(s, t)],
            step,
            lambda s, t: [cp.wait() for cp in out_dma(s, t)],
        )

    scratch = (
        [pltpu.VMEM((rows, LANES), ins[j].dtype) for j in range(n_in)]
        + [pltpu.VMEM((rows, LANES), ins[j].dtype) for j in range(n_in)]
        + [pltpu.VMEM((rows, LANES), out.dtype),
           pltpu.VMEM((rows, LANES), out.dtype)]
        + [pltpu.SemaphoreType.DMA((2, n_in)),
           pltpu.SemaphoreType.DMA((2,))]
    )
    pl.run_scoped(body, *scratch)


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def eligible(shapes, dtypes) -> bool:
    """Same-shape contiguous float arrays big enough to be DMA-bound."""
    if MODE == 'off':
        return False
    if len({tuple(s) for s in shapes}) != 1:
        return False
    ne = int(np.prod(shapes[0])) if shapes[0] else 0
    # an even number of whole chunks (the pipelined loop is unrolled x2)
    if ne < CHUNK_ROWS * LANES * 2 or ne % (2 * CHUNK_ROWS * LANES):
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
