"""Micro-bisect of inverse-half-T constructs that might SIGABRT Mosaic:
  K1: 129-row window DMA + [1:129] sublane-offset slice
  K2: pltpu.roll along lanes of a multi-lane-tile (128, 640) array
  K3: exchange-matmul sublane flip + per-block lane flips
  K4: where() with iota-arithmetic masks folding a traced scalar
Usage: python -u benchmarks/probe_t_micro.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dsc_tpu.fourier.pallas_stream_t import (  # noqa: E402
    _exchange, _flip_dot)
from dsc_tpu.fourier.pallas_stream import _ds0  # noqa: E402

NC = 640
ROWS = 256 + 8  # two 128-row tiles + pad


def _call(kernel, x, out_rows=128):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_rows, NC), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


def k1(x, o):
    def body2(buf, ob, sem, osem):
        cp = pltpu.make_async_copy(
            x.at[pl.ds(jnp.int32(128), 129), _ds0(NC)], buf, sem)
        cp.start()
        cp.wait()
        ob[:] = buf[1:129, :] * 2.0
        oc = pltpu.make_async_copy(ob, o, osem)
        oc.start()
        oc.wait()

    pl.run_scoped(
        body2,
        buf=pltpu.VMEM((129, NC), jnp.float32),
        ob=pltpu.VMEM((128, NC), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        osem=pltpu.SemaphoreType.DMA,
    )


def k2(x, o):
    def body(buf, ob, sem, osem):
        cp = pltpu.make_async_copy(
            x.at[pl.ds(jnp.int32(0), 128), _ds0(NC)], buf, sem)
        cp.start()
        cp.wait()
        ob[:] = pltpu.roll(buf[:], jnp.int32(-1), 1)
        oc = pltpu.make_async_copy(ob, o, osem)
        oc.start()
        oc.wait()

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((128, NC), jnp.float32),
        ob=pltpu.VMEM((128, NC), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        osem=pltpu.SemaphoreType.DMA,
    )


def k3(x, o):
    def body(buf, ob, sem, osem):
        cp = pltpu.make_async_copy(
            x.at[pl.ds(jnp.int32(0), 128), _ds0(NC)], buf, sem)
        cp.start()
        cp.wait()
        e = _exchange(128, jnp.bfloat16)
        w = _flip_dot(e, buf[:])
        blocks = []
        for j in range(NC // 128):
            blocks.append(_flip_dot(
                e, w[:, (NC // 128 - 1 - j) * 128:(NC // 128 - j) * 128],
                right=True))
        ob[:] = jnp.concatenate(blocks, axis=1)
        oc = pltpu.make_async_copy(ob, o, osem)
        oc.start()
        oc.wait()

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((128, NC), jnp.float32),
        ob=pltpu.VMEM((128, NC), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        osem=pltpu.SemaphoreType.DMA,
    )


def k4(x, o):
    def body(buf, ob, sem, osem):
        cp = pltpu.make_async_copy(
            x.at[pl.ds(jnp.int32(0), 128), _ds0(NC)], buf, sem)
        cp.start()
        cp.wait()
        u = jnp.int32(0)

        def loop(i, c):
            row_io = jax.lax.broadcasted_iota(jnp.int32, (128, NC), 0)
            cond = (row_io + jnp.int32(128) * i) == 0
            ob[:] = jnp.where(cond, buf[:] * 3.0, buf[:])
            return c

        jax.lax.fori_loop(u, jnp.int32(1), loop, jnp.int32(0))
        oc = pltpu.make_async_copy(ob, o, osem)
        oc.start()
        oc.wait()

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((128, NC), jnp.float32),
        ob=pltpu.VMEM((128, NC), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        osem=pltpu.SemaphoreType.DMA,
    )


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((ROWS, NC)).astype(np.float32)
    np.asarray(jnp.asarray(x)[:1, :1])
    for name, kern, check in (
        ('K1 129-row window + [1:129] slice', k1,
         lambda y: np.abs(y - x[129:257] * 2.0).max()),
        ('K2 lane roll on (128, 640)', k2,
         lambda y: np.abs(y[:, :-1] - x[:128, 1:]).max()),
        ('K3 exchange flips', k3,
         lambda y: np.abs(y - x[:128][::-1, ::-1]).max()),
        ('K4 iota-arith scalar mask where', k4,
         lambda y: np.abs(
             y - np.where(np.arange(128)[:, None] == 0, x[:128] * 3,
                          x[:128])).max()),
    ):
        t0 = time.time()
        try:
            y = np.asarray(jax.jit(
                lambda v, k=kern: _call(k, v))(jnp.asarray(x)))
            print(f'{name}: OK err {check(y):.2e} ({time.time()-t0:.0f}s)',
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name}: FAILED ({time.time()-t0:.0f}s) '
                  f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
