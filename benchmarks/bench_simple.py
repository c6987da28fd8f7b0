"""Elementwise / unary / reduction benchmark vs NumPy.

Workload parity with the reference (benchmarks/python/bench_simple.py:76-193):
x = [60, 60000], all 4 dtypes, binary ops add/sub/mul/div with tensor AND
scalar RHS (out= where possible), 9 unary ops
(sin/sinc/cos/logn/log2/log10/exp/sqrt/i0), reductions sum/mean/max/min
over axis=0. Methodology: 2 warmups, best of 5 (reference
benchmarks/python/utils.py:11-12).

Plus BASELINE config 2: a 1 KB - 256 MiB size sweep with broadcasting
(same-shape, scalar RHS, broadcast row) and a reduction sweep.

Emits machine-readable JSON to benchmarks/results_simple.json (one entry
per measurement) so one command regenerates every BASELINE workload row.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root
import dsc_tpu as dsc
from utils import bench, bench_host

RESULTS = []

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'results_simple.json')


def record(**kw):
    RESULTS.append(kw)


_EXISTING = set()
if os.environ.get('DSC_BENCH_RESUME') and os.path.exists(OUT_PATH):
    with open(OUT_PATH) as _f:
        _EXISTING = {
            (r.get('bench'), r.get('dtype'), r.get('op'), r.get('rhs'),
             r.get('log2n'))
            for r in json.load(_f)
        }


def have(bench_kind, dtype=None, op=None, rhs=None, log2n=None):
    """True when DSC_BENCH_RESUME=1 and this row is already on disk."""
    return (bench_kind, dtype, op, rhs, log2n) in _EXISTING


def dump():
    """Merge-write after every row so a timed-out run keeps its rows."""
    merged = RESULTS
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            old = json.load(f)
        keys = {(r.get('bench'), r.get('dtype'), r.get('op'), r.get('rhs'),
                 r.get('log2n')) for r in RESULTS}
        merged = [r for r in old if (r.get('bench'), r.get('dtype'),
                                     r.get('op'), r.get('rhs'),
                                     r.get('log2n')) not in keys] + RESULTS
    with open(OUT_PATH, 'w') as f:
        json.dump(merged, f, indent=1)


def fmt(t: float) -> str:
    return f'{t * 1e6:9.1f} us'


DTYPES = [
    (np.float32, dsc.Dtype.F32),
    (np.float64, dsc.Dtype.F64),
    (np.complex64, dsc.Dtype.C32),
    (np.complex128, dsc.Dtype.C64),
]


def _rand(shape, np_dt):
    x = np.random.randn(*shape)
    if np.dtype(np_dt).kind == 'c':
        x = x + 1j * np.random.randn(*shape)
    return x.astype(np_dt)


def reference_workloads():
    """The reference's exact op grid at x = [60, 60000]."""
    shape = (60, 60000)
    only = os.environ.get('DSC_BENCH_DTYPES')  # e.g. 'float32,complex64'
    print(f'== reference workload parity @ {shape} ==')
    for np_dt, dsc_dt in DTYPES:
        if only and np_dt.__name__ not in only.split(','):
            continue
        x, y = _rand(shape, np_dt), _rand(shape, np_dt)
        xd, yd = dsc.from_numpy(x), dsc.from_numpy(y)
        out = dsc.empty(shape, dtype=dsc_dt)
        npo = np.empty_like(x)

        # binary: tensor RHS and scalar RHS (reference :76-122)
        binaries = [
            ('add', dsc.add, np.add),
            ('sub', dsc.sub, np.subtract),
            ('mul', dsc.mul, np.multiply),
            ('div', dsc.true_div, np.true_divide),
        ]
        for name, dfn, nfn in binaries:
            for rhs_kind, rd, rn in (('tensor', yd, y), ('scalar', 1.5, 1.5)):
                if have('binary', np_dt.__name__, name, rhs_kind):
                    continue
                td = bench(lambda: dfn(xd, rd, out=out).jax)
                tn = bench_host(lambda: nfn(x, rn, out=npo))
                record(bench='binary', dtype=np_dt.__name__, op=name,
                       rhs=rhs_kind, shape=list(shape), dsc_s=td, numpy_s=tn)
                dump()
                print(f'{np_dt.__name__:>10} {name:>5}/{rhs_kind:<6}: '
                      f'dsc {fmt(td)}  numpy {fmt(tn)}  ({tn / td:6.2f}x)')

        # unary (reference :125-165)
        unaries = [
            ('sin', dsc.sin, np.sin), ('sinc', dsc.sinc, np.sinc),
            ('cos', dsc.cos, np.cos), ('logn', dsc.logn, np.log),
            ('log2', dsc.log2, np.log2), ('log10', dsc.log10, np.log10),
            ('exp', dsc.exp, np.exp), ('sqrt', dsc.sqrt, np.sqrt),
        ]
        for name, dfn, nfn in unaries:
            if have('unary', np_dt.__name__, name):
                continue
            needs_abs = (name.startswith('log') or name == 'sqrt') \
                and np.dtype(np_dt).kind != 'c'
            xa = np.abs(x) if needs_abs else x
            xda = dsc.from_numpy(xa)
            td = bench(lambda: dfn(xda, out=out).jax)
            tn = bench_host(lambda: nfn(xa))
            record(bench='unary', dtype=np_dt.__name__, op=name,
                   shape=list(shape), dsc_s=td, numpy_s=tn)
            dump()
            print(f'{np_dt.__name__:>10} {name:>5}: dsc {fmt(td)}  '
                  f'numpy {fmt(tn)}  ({tn / td:6.2f}x)')
        if np.dtype(np_dt).kind != 'c' and not have('unary', np_dt.__name__, 'i0'):
            xa = np.abs(x)
            xda = dsc.from_numpy(xa)
            td = bench(lambda: dsc.i0(xda).jax)
            tn = bench_host(lambda: np.i0(xa.reshape(-1)))
            record(bench='unary', dtype=np_dt.__name__, op='i0',
                   shape=list(shape), dsc_s=td, numpy_s=tn)
            dump()
            print(f'{np_dt.__name__:>10}    i0: dsc {fmt(td)}  '
                  f'numpy {fmt(tn)}  ({tn / td:6.2f}x)')

        # reductions over axis=0 (reference :168-193)
        reductions = [
            ('sum', dsc.sum, np.sum), ('mean', dsc.mean, np.mean),
            ('max', dsc.max, np.max), ('min', dsc.min, np.min),
        ]
        for name, dfn, nfn in reductions:
            if have('reduction', np_dt.__name__, name):
                continue
            td = bench(lambda: dfn(xd, axis=0).jax)
            tn = bench_host(lambda: nfn(x, axis=0))
            record(bench='reduction', dtype=np_dt.__name__, op=name,
                   shape=list(shape), dsc_s=td, numpy_s=tn)
            dump()
            print(f'{np_dt.__name__:>10} {name:>5}: dsc {fmt(td)}  '
                  f'numpy {fmt(tn)}  ({tn / td:6.2f}x)')
        dump()


def size_sweep():
    """BASELINE config 2: 1 KB - 256 MiB, f32, with broadcasting.

    DSC_SWEEP_SIZES='16,17' restricts to those log2 sizes: the axon
    backend wedges downloads after many small mixed-shape dispatches in
    one process, so a driver can sweep one size per process."""
    only = os.environ.get('DSC_SWEEP_SIZES')
    sizes = ([int(s) for s in only.split(',')] if only
             else list(range(8, 27)))
    print('\n== elementwise size sweep 1 KB - 256 MiB (f32 add) ==')
    print(f'{"size":>10} {"same-shape":>22} {"scalar RHS":>22} '
          f'{"broadcast row":>22}')
    for log2n in sizes:
        ne = 2**log2n
        rows = max(ne // 4096, 1)
        cols = ne // rows
        x = dsc.randn((rows, cols))
        y = dsc.randn((rows, cols))
        row = dsc.randn((1, cols))
        out = dsc.empty((rows, cols))

        kb = max(8, min(64, 2**24 // ne))
        cells = []
        for label, fn in (
            ('same', lambda: dsc.add(x, y, out=out).jax),
            ('scalar', lambda: dsc.add(x, 1.5, out=out).jax),
            ('bcast', lambda: dsc.add(x, row, out=out).jax),
        ):
            if have('sweep', op=f'add/{label}', log2n=log2n):
                cells.append('(kept)')
                continue
            t = bench(fn, k_base=kb)
            gbs = 3 * ne * 4 / t / 1e9  # 2 reads + 1 write (nominal)
            record(bench='sweep', op=f'add/{label}', log2n=log2n,
                   dsc_s=t, gbs=gbs)
            dump()
            cells.append(f'{t * 1e6:9.1f}us {gbs:6.1f}GB/s')
        dump()
        print(f'2^{log2n:<8} {cells[0]:>22} {cells[1]:>22} {cells[2]:>22}')

    print('\n== f64 add at scale (XLA fused path; Mosaic has no f64 '
          'vector support on this backend — PERF.md backlog #4) ==')
    for log2n in [s for s in sizes if s in (22, 24, 25)]:
        ne = 2**log2n
        rows = max(ne // 4096, 1)
        x64 = dsc.randn((rows, ne // rows), dtype=dsc.Dtype.F64)
        y64 = dsc.randn((rows, ne // rows), dtype=dsc.Dtype.F64)
        o64 = dsc.empty((rows, ne // rows), dtype=dsc.Dtype.F64)
        if have('sweep', op='add/f64', log2n=log2n):
            continue
        t = bench(lambda: dsc.add(x64, y64, out=o64).jax,
                  k_base=max(8, min(64, 2**23 // ne)))
        gbs = 3 * ne * 8 / t / 1e9
        record(bench='sweep', op='add/f64', log2n=log2n, dsc_s=t, gbs=gbs)
        dump()
        print(f'  2^{log2n:2d} ({ne * 8 / 2**20:8.2f} MiB): '
              f'{t * 1e6:9.1f} us  {gbs:7.1f} GB/s')

    print('\n== reduction size sweep (f32 sum, axis=-1) ==')
    for log2n in [s for s in (sizes if only else range(12, 27, 2))
                  if s >= 12]:
        ne = 2**log2n
        rows = max(ne // 65536, 1)
        x = dsc.randn((rows, ne // rows))
        if have('sweep', op='sum', log2n=log2n):
            continue
        t = bench(lambda: dsc.sum(x, axis=-1).jax)
        gbs = ne * 4 / t / 1e9
        record(bench='sweep', op='sum', log2n=log2n, dsc_s=t, gbs=gbs)
        dump()
        print(f'  2^{log2n:2d} ({ne * 4 / 2**20:8.2f} MiB): '
              f'{t * 1e6:9.1f} us  {gbs:7.1f} GB/s')


def device_sweep():
    """Jit-chained DEVICE time at 64-512 MiB (PERF.md measurement level 2).

    The eager sweep above pays the tunnel's ~0.4-1 ms/op client dispatch
    marginal, which floors every size below ~256 MiB at dispatch rate,
    not device rate. This sweep times straight-line chains of k dependent
    kernel calls inside ONE jit (per-op = (t(2k) - t(k))/k, the
    while-carry copy artifact avoided per PERF.md) — the steady-state
    device time a local caller would see. Rows are recorded as
    bench='sweep_device' ALONGSIDE the eager rows: two methodologies,
    both visible, never min()'d together (ADVICE r2)."""
    import functools

    import jax
    import jax.numpy as jnp

    from utils import _rearm
    from utils import bench as ubench
    from dsc_tpu.ops import kernels as ops_kernels

    only = os.environ.get('DSC_SWEEP_SIZES')
    # >= 2^24 only: below that the 32 MiB chain intermediates become
    # VMEM-resident on this 128-MiB-VMEM chip (a real perf feature of
    # in-jit composition, but not a per-op HBM rate — measured 1.4 TB/s
    # "bandwidth" at 2^23)
    sizes = [s for s in ([int(s) for s in only.split(',')] if only
                         else [24, 25, 26]) if s >= 24]

    def chain_time(step, state, extra, kin):
        # ``extra`` is an explicit argument: a device array CLOSED OVER
        # by a jitted chain serializes as an HLO constant, and a 256 MiB
        # constant 413s the remote compiler (PERF.md pathology list).
        #
        # Measurement structure: differencing t(2k)-t(k) of two LONG
        # chains cannot resolve a few-ms difference against the tunnel
        # sync's multi-ms two-sided jitter (tried; min-of-5 still left
        # physically impossible rows). Instead the inner chain is sized
        # so its DEVICE time (~6 ms) dominates the ~1 ms eager dispatch
        # marginal, and the chain itself is timed as one pipelined eager
        # op by the robust utils.bench outer differencing — per-op =
        # chain marginal / kin.
        _rearm()

        @functools.partial(jax.jit, static_argnames=('k',))
        def chain(s, o, k):
            for _ in range(k):
                s = step(s, o)
            return s

        jax.block_until_ready(chain(state, extra, k=kin))  # compile
        # outer FEEDBACK loop: the runtime caches same-arguments
        # executions (the reason bench.py uses dependent chains), so the
        # chain result must become the next call's input
        holder = [state]

        def outer():
            holder[0] = chain(holder[0], extra, k=kin)
            return holder[0]

        return ubench(outer, k_base=8) / kin

    print('\n== device-time sweep (jit chains; bench=sweep_device) ==')
    rng = np.random.default_rng(7)
    for log2n in sizes:
        ne = 2**log2n
        rows = max(ne // 4096, 1)
        cols = ne // rows
        # inner-chain length targeting ~10 ms of device time per chain
        # call (at the ~740 GB/s streaming rate): the chain must dominate
        # both the ~1 ms/dispatch client marginal and the tunnel sync's
        # multi-ms jitter once differenced over k_base=8 outer calls
        kb = max(8, min(72, int(10e-3 / (3 * ne * 4 / 740e9))))
        x = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
        row = jnp.asarray(rng.standard_normal((1, cols)), jnp.float32)
        sca = jnp.float32(1.5).reshape(1, 1)
        np.asarray(x.ravel()[:1])  # establish the d2h sync path
        f32_step = lambda s, o: ops_kernels.add(s, o, np.float32)  # noqa: E731
        variants = [
            ('same', f32_step, y, 3, 4),
            ('scalar', f32_step, sca, 2, 4),
            ('bcast', f32_step, row, 2, 4),
        ]
        # fused elementwise chain (dsc.map tier): one streaming pass for
        # clip(s*0.999 + o, ...) vs the same chain as 3 separate
        # streaming kernel calls (7 HBM passes: 2+3+2). The step decays
        # and re-randomizes s each stage — bounded, non-repeating
        # feedback (same-arguments cache trap, PERF.md)
        from dsc_tpu.ops import pallas_map as pm

        lo_a = jnp.full((1,), -50.0, jnp.float32)
        hi_a = jnp.full((1,), 50.0, jnp.float32)
        dec = jnp.float32(0.999).reshape(1, 1)

        def chain_ops(s, o):
            t1 = ops_kernels.mul(s, dec, np.float32)
            t2 = ops_kernels.add(t1, o, np.float32)
            return ops_kernels.clip(t2, lo_a, hi_a)

        def chain_map(s, o):
            return pm.stream_map(
                lambda a, b: jnp.clip(a * 0.999 + b, -50.0, 50.0), s, o
            )

        variants.append(('chain3_ops', chain_ops, y, 7, 4))
        variants.append(('chain3_map', chain_map, y, 3, 4))
        # XLA-path stages (f64, sum) need an optimization_barrier between
        # chain stages: XLA loop-fuses k chained elementwise stages into
        # ONE pass over the operands (correct, and great for real users,
        # but it measures fusion, not per-op streaming — 2 TB/s "rates").
        # The pallas stages are opaque custom calls and need none.
        barrier = jax.lax.optimization_barrier
        if jax.config.jax_enable_x64:
            x64 = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float64)
            y64 = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float64)
            # f64 rides XLA — no Mosaic f64 vector path (PERF.md backlog)
            variants.append(
                ('f64', lambda s, o: barrier(
                    ops_kernels.add(s, o, np.float64)),
                 y64, 3, 8))
        # axis=-1 reduction: max(o, bcast(s)) feeds the reduced value
        # back in a form the algebraic simplifier cannot rewrite
        # (sum(o + bcast(s)) = sum(o) + n*s WOULD be); 1 read of o/stage.
        # The mod keeps the feedback BOUNDED AND NON-REPEATING — a
        # sum(max(...)) chain saturates to a bitwise-identical fixed
        # point within one call, and identical argument values hit the
        # runtime's same-arguments execution cache (measured 9.5 TB/s)
        variants.append(
            ('sum', lambda s, o: barrier(jnp.mod(
                jnp.sum(jnp.maximum(o, s), axis=-1, keepdims=True) * 1e-3,
                1.0)),
             y, 1, 4))
        sum0 = jnp.zeros((rows, 1), jnp.float32)
        cells = []
        for label, step, extra, passes, width in variants:
            if have('sweep_device', op=f'add/{label}', log2n=log2n):
                cells.append('(kept)')
                continue
            state = sum0 if label == 'sum' else (
                x64 if label == 'f64' else x)
            t = chain_time(step, state, extra, kb)
            # ACTUAL HBM traffic per op (same=2 reads+1 write; scalar and
            # bcast read 1 full operand + write 1 — the row/scalar operand
            # is negligible), unlike the eager sweep's nominal 3-pass
            gbs = passes * ne * width / t / 1e9
            record(bench='sweep_device', op=f'add/{label}', log2n=log2n,
                   dsc_s=t, gbs=gbs, passes=passes, itemsize=width)
            dump()
            cells.append(f'{label} {t * 1e6:8.1f}us {gbs:6.1f}GB/s')
        print(f'2^{log2n:<4} ' + '  '.join(cells))


def main():
    dsc.init(int(8 * 2**30))
    part = os.environ.get('DSC_BENCH_PART', 'all')
    if part in ('all', 'ref'):
        reference_workloads()
    if part in ('all', 'sweep'):
        size_sweep()
    if part in ('all', 'device'):
        device_sweep()
    dump()
    print(f'\n{len(RESULTS)} measurements -> {OUT_PATH}')


if __name__ == '__main__':
    sys.exit(main())
