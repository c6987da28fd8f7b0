"""Benchmark helpers (reference benchmarks/python/utils.py methodology:
2 warmup calls, latency = min of 5 iterations, perf.md:18-24)."""

import time

import jax

WARMUP = 2
BENCH_STEPS = 5


def bench(fn) -> float:
    """Best-of-5 wall time of fn() with device sync."""
    for _ in range(WARMUP):
        jax.block_until_ready(fn())
    best = float('inf')
    for _ in range(BENCH_STEPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def bench_host(fn) -> float:
    for _ in range(WARMUP):
        fn()
    best = float('inf')
    for _ in range(BENCH_STEPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best
