"""Benchmark helpers.

The reference times each op per-call: 2 warmups, latency = min of 5
(benchmarks/python/utils.py:11-12, perf.md:18-24). Through the axon TPU
tunnel a single dispatch+sync carries ~30 ms of fixed latency, so per-call
wall time is meaningless. Dispatches PIPELINE, though (measured: k chained
eager 256-MiB adds cost 31.7 + 1.3*(k-1) ms), so ``bench`` issues k eager
public-API ops and differences two counts: per-op = (t(2k) - t(k)) / k.
The constant dispatch/sync latency cancels exactly; what remains is the
marginal (steady-state) device time of one eager op — the number a local
(non-tunneled) caller would see per call.

``bench_host`` keeps the reference's per-call methodology for NumPy.
"""

import os
import time

import jax
import numpy as np

WARMUP = 2
BENCH_STEPS = 7
K_BASE = 16

# The remote compile helper occasionally wedges (a single complex-dtype
# compile can hang indefinitely, ~half of process runs). With
# DSC_BENCH_WATCHDOG=<seconds> set, each measurement re-arms a
# faulthandler timer that aborts the process if one measurement exceeds
# the budget — combined with the suites' per-row merge dumps and
# DSC_BENCH_RESUME, repeated runs make monotone progress.
_WATCHDOG = int(os.environ.get('DSC_BENCH_WATCHDOG', '0'))


def _rearm():
    if _WATCHDOG:
        import faulthandler

        faulthandler.dump_traceback_later(_WATCHDOG, exit=True)


def _drain(r) -> None:
    """Force a tiny real device->host download of r's first leaf. On the
    axon backend, block_until_ready alone can return BEFORE side-effecting
    pallas programs have finished; a genuine read drains the execution
    queue. Done inside the timed region its ~30 ms fixed cost is constant
    and cancels exactly in the (t(2k) - t(k)) difference."""
    for leaf in jax.tree_util.tree_leaves(r):
        if hasattr(leaf, 'ravel'):
            x = leaf.ravel()[:1]
            if np.issubdtype(np.dtype(x.dtype), np.complexfloating):
                # complex cannot cross the axon transfer boundary
                import jax.numpy as jnp

                x = jnp.real(x)
            np.asarray(x)
            return


def bench(fn, k_base: int = K_BASE) -> float:
    """Marginal per-op time of the eager op ``fn()`` (public API), via
    pipelined-dispatch differencing: difference of MEDIANS of interleaved
    t(k)/t(2k) samples. (A median of paired differences — the previous
    estimator — goes negative under tunnel latency spikes and used to be
    clamped to 1e-9, leaving physically impossible rows in the results;
    medians of each population first are robust to the spikes.) A
    non-positive difference after 3 attempts raises instead of recording
    garbage — the suites' per-row merge/resume machinery retries it."""
    _rearm()
    for _ in range(WARMUP):
        jax.block_until_ready(fn())

    def t(k: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        _drain(r)
        return time.perf_counter() - t0

    t(k_base)  # one throwaway pair-priming run after warmup
    for _attempt in range(3):
        t1s, t2s = [], []
        for _ in range(BENCH_STEPS):
            t1s.append(t(k_base))
            t2s.append(t(2 * k_base))
        d = (sorted(t2s)[len(t2s) // 2] - sorted(t1s)[len(t1s) // 2]) / k_base
        if d > 0:
            return d
    raise RuntimeError(
        f'bench: non-positive marginal after 3 attempts (k={k_base}); '
        'tunnel too noisy for this measurement')


def bench_host(fn) -> float:
    """Best-of-5 per-call wall time (the reference methodology; fine on
    host where there is no dispatch tunnel)."""
    for _ in range(WARMUP):
        fn()
    best = float('inf')
    for _ in range(BENCH_STEPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best
