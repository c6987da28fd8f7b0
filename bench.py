"""dsc_tpu headline benchmark (BASELINE.md north star).

Measures on the default backend (the real TPU chip under the driver):
  - 1-D rfft/irfft of 2^24 float32 (GFLOP/s via 2.5*N*log2(N), the same
    formula the reference uses, benchmarks/python/bench_fft.py:32-78)
  - 2^24-point complex fft (5*N*log2(N))
  - elementwise fma / sin bandwidth (GB/s) at 256 MiB
  - accuracy of the 2^24 rfft vs np.fft (north-star bound: 1e-4)

Timing methodology: the axon TPU tunnel adds ~30 ms of fixed latency to a
dispatch+sync, but eager dispatches PIPELINE (measured: k chained 256-MiB
eager adds cost 31.7 + 1.3*(k-1) ms), so each op is issued k times
through the PUBLIC eager API and differenced: per-op = (t(2k) - t(k))/k.
Each timed region ends with a 1-element device->host read — on this
backend block_until_ready alone returns before side-effecting pallas
programs finish; the constant ~30 ms drain cancels in the difference
(benchmarks/PERF.md "the tunnel lies twice").

Eager (not jit-chained) measurement keeps compile load minimal: the
accuracy phase compiles the public rfft/irfft programs and every timing
loop reuses them — remote compiles have taken 40-475 s for the same
program on different days, so each avoided compile matters.

vs_baseline = dsc rfft GFLOP/s / NumPy rfft GFLOP/s on this host — the
reference's own positioning metric ("NumPy is X.XX x faster",
bench_fft.py:67-78), inverted so >1 means we beat NumPy.

Prints exactly ONE JSON line to stdout; the detail table goes to stderr.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

K_BASE = 8
REPS = 5

# Wall budget for the whole run. After the eager numbers are in hand, a
# chain-measurement subprocess (--chain) runs under the REMAINING budget
# with a hard kill: on fast-compile days it upgrades the headline to the
# jitted device time; on slow/wedged days the eager numbers stand. The
# parent always prints its single JSON line.
BUDGET_S = float(os.environ.get('DSC_BENCH_BUDGET', '480'))


def wait_for_backend(max_wait_s: float = None) -> bool:
    """Block until the default jax backend initializes, probing in fresh
    subprocesses (a failed in-process init poisons jax's backend cache).
    The axon tunnel goes UNAVAILABLE for minutes at a time (observed
    round 3); the driver-run headline must survive such an outage rather
    than record a dead round. Returns True once a probe succeeds."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get('DSC_BENCH_BACKEND_WAIT', '900'))
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, '-c',
                 'import jax; jax.devices()'],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=180,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(f'# backend probe: still unavailable after {attempt} '
                  f'attempts / {max_wait_s:.0f}s — proceeding anyway',
                  file=sys.stderr)
            return False
        print(f'# backend probe {attempt} failed; retrying in 60s',
              file=sys.stderr)
        time.sleep(60)


def _drain(t) -> None:
    """1-element real download of a Tensor/array (or the first leaf of a
    tuple state): forces a true device queue drain (block_until_ready
    lies for side-effecting pallas)."""
    import jax.numpy as jnp

    if isinstance(t, (tuple, list)):
        t = t[0]
    pp = getattr(t, '_planar', None)
    leaf = pp.re if pp is not None else getattr(t, 'jax', t)
    x = leaf.ravel()[:1]
    if np.issubdtype(np.dtype(x.dtype), np.complexfloating):
        x = jnp.real(x)
    np.asarray(x)


def bench_eager(step, state, k_base: int = K_BASE,
                t_floor: float = 0.0) -> float:
    """Marginal per-op time of the eager public-API op ``state = step(state)``
    via pipelined-dispatch differencing: difference of MEDIANS of
    interleaved t(k)/t(2k) samples (robust to tunnel latency spikes that
    drive a median-of-paired-differences negative). The DEPENDENT
    feedback chain rules out any same-arguments execution caching in the
    runtime. Runs 3 interleaved attempt rounds and keeps the MINIMUM
    positive marginal — the reference's own min-of-5 drift defense
    (benchmarks/python/utils.py:11-12).

    ``t_floor`` is the op's PHYSICAL floor (e.g. HBM traffic / 819 GB/s
    peak): a marginal below it is an estimator artifact, not a
    measurement — cheap ops pipeline entirely inside the tunnel's ~30 ms
    fixed latency window, and this run's differenced marginal can then
    collapse to ~0 (a round-5 driver run printed sin at 20721 GB/s).
    Sub-floor marginals are discarded; if every attempt is sub-floor the
    honest fallback is the t(2k)/(2k) upper bound (real wall time)."""
    _drain(step(state))  # warm + establish the d2h sync path
    state = step(state)
    _drain(state)

    def t(k: int, s):
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        _drain(s)
        return time.perf_counter() - t0, s

    _, state = t(k_base, state)  # pair-priming throwaway
    t2_med = None
    best = None
    for _attempt in range(3):
        t1s, t2s = [], []
        for _ in range(REPS):
            t1, state = t(k_base, state)
            t2, state = t(2 * k_base, state)
            t1s.append(t1)
            t2s.append(t2)
        t2_med = sorted(t2s)[len(t2s) // 2]
        d = (t2_med - sorted(t1s)[len(t1s) // 2]) / k_base
        if d >= t_floor:
            best = d if best is None else min(best, d)
    if best is not None:
        return best
    print('# bench_eager: no physically-possible marginal in 3 attempts; '
          'reporting t(2k)/2k upper bound', file=sys.stderr)
    return t2_med / (2 * k_base)


def bench_host(fn) -> float:
    fn()
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def chain_main() -> None:
    """--chain subprocess: jit-chained device time of the public-path
    programs. One chain program per row (K pairs straight-lined inside a
    single jit — no while-carry copy artifact, half the compile surface
    of the old k/2k two-program scheme that blew the round-4 budget),
    marginal measured by pipelined-dispatch differencing over the NUMBER
    OF CHAIN CALLS with a true 1-element d2h drain per sample —
    block_until_ready alone returns before side-effecting pallas
    programs finish on this backend (PERF.md "the tunnel lies twice"; the
    round-4 chain_time used it and read fma at 1172 GB/s, above the 819
    GB/s HBM peak — physically impossible, hence this rewrite).

    Inputs are generated ON DEVICE (values don't affect timing): the old
    host-random h2d of 2x256 MiB through the tunnel wasted a large slice
    of the budget. Each row's result prints as its own flushed JSON line
    so the parent applies whatever milestones landed before a timeout
    kill (partial upgrades instead of all-or-nothing).

    The ACCURACY check also lives here: this subprocess must be the only
    jax client in the bench (the terminal serializes a second client
    behind a live or recently-killed first one — measured 250 s of init
    stall), so everything needing the device happens in this process and
    the parent stays host-only."""
    t_start = time.time()
    # exit cleanly on the parent's SIGTERM so the jax client tears down
    # (atexit runs) instead of leaving a server-side session that stalls
    # the next client
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))

    def ms(tag: str) -> None:
        print(f'# chain: {tag} @ {time.time() - t_start:.0f}s',
              file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    import dsc_tpu as dsc
    from dsc_tpu.fourier import core as fft_core
    from dsc_tpu.fourier import pallas_stream as fft_ps
    from dsc_tpu.ops import kernels as ops_kernels

    dsc.init(int(8 * 2**30))
    K = 4  # pairs per chain program

    # ---- accuracy vs np.fft at 2^24 through the PUBLIC api (compiles +
    # warms the public programs as a side effect; errors land as a row)
    try:
        rng = np.random.default_rng(42)
        acc_np = rng.standard_normal(2**24).astype(np.float32)
        acc_t = dsc.from_numpy(acc_np)
        t0 = time.perf_counter()
        spec_t = dsc.rfft(acc_t)
        spec_np = spec_t.numpy()
        ms(f'first rfft incl compile: {time.perf_counter() - t0:.1f}s')
        ref = np.fft.rfft(acc_np)
        rfft_err = float(np.abs(spec_np - ref).max() / np.abs(ref).max())
        irfft_err = float(np.abs(dsc.irfft(spec_t).numpy() - acc_np).max())
        print(json.dumps({'rfft_err': rfft_err, 'irfft_err': irfft_err}),
              flush=True)
        ms(f'rfft 2^24 rel err {rfft_err:.3e} | irfft rt {irfft_err:.3e}')
        del acc_np, acc_t, spec_t, spec_np, ref
    except Exception as e:  # noqa: BLE001 — timing rows must still run
        ms(f'accuracy failed: {type(e).__name__}: {str(e)[:160]}')

    def marginal(step, state, m=3, reps=5):
        """min-of-3-attempts differenced marginal of one jitted chain
        call (same estimator as bench_eager, same drain)."""
        state = step(state)
        _drain(state)  # compile + warm
        ms('compiled+warm')

        def t(k, s):
            t0 = time.perf_counter()
            for _ in range(k):
                s = step(s)
            _drain(s)
            return time.perf_counter() - t0, s

        _, state = t(m, state)
        best = None
        t2_med = None
        for _ in range(3):
            t1s, t2s = [], []
            for _ in range(reps):
                t1, state = t(m, state)
                t2, state = t(2 * m, state)
                t1s.append(t1)
                t2s.append(t2)
            t2_med = sorted(t2s)[len(t2s) // 2]
            d = (t2_med - sorted(t1s)[len(t1s) // 2]) / m
            if d > 0:
                best = d if best is None else min(best, d)
        return best if best is not None else t2_med / (2 * m)

    n = 2**24
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    np.asarray(x[:1])  # establish the d2h sync path
    ms('input ready')

    n1, n2 = fft_ps.factors(n)

    def rt_step(v):
        # hermitian-half T layout: contiguous half-width spectrum writes
        # forward, contiguous half reads + in-kernel mirror inverse
        hr, hi = fft_core.rfft_stream_half_t(v, n1, n2)
        return fft_core.irfft_stream_from_half_t(hr, hi, n1, n2)

    @jax.jit
    def rt_chain(v):
        for _ in range(K):
            v = rt_step(v)
        return v

    try:
        t_pair = marginal(rt_chain, x) / K
        print(json.dumps({'t_pair': t_pair}), flush=True)
        ms(f'rt pair {t_pair * 1e3:.2f} ms')
    except Exception as e:  # noqa: BLE001 — the fma row must still land
        ms(f'rt chain failed: {type(e).__name__}: {str(e)[:160]}')

    def cpair_step(c):
        vr, vi = c
        zr, zi = fft_core.fft_stream_planar(vr, vi, n1, n2, inverse=False)
        return fft_core.fft_stream_planar(zr, zi, n1, n2, inverse=True)

    @jax.jit
    def cpair_chain(c):
        for _ in range(K):
            c = cpair_step(c)
        return c

    try:
        xi = jax.random.normal(jax.random.PRNGKey(7), (n,), jnp.float32)
        t_cpair = marginal(cpair_chain, (x, xi)) / K
        print(json.dumps({'t_cpair': t_cpair}), flush=True)
        ms(f'cfft pair {t_cpair * 1e3:.2f} ms')
    except Exception as e:  # noqa: BLE001
        ms(f'cfft chain failed: {type(e).__name__}: {str(e)[:160]}')

    ne = 2**26
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(ka, (ne,), jnp.float32)
    b = jax.random.normal(kb, (ne,), jnp.float32)

    @jax.jit
    def fma_chain(c):
        v, w = c
        for _ in range(K):
            v = ops_kernels.add(v, w, np.float32)
        return v, w

    try:
        t_fma = marginal(fma_chain, (a, b)) / K
        print(json.dumps({'t_fma': t_fma}), flush=True)
        ms(f'fma {t_fma * 1e3:.2f} ms')
    except Exception as e:  # noqa: BLE001
        ms(f'fma chain failed: {type(e).__name__}: {str(e)[:160]}')

    @jax.jit
    def sin_chain(v):
        for _ in range(K):
            v = ops_kernels.sin(v)
        return v

    try:
        t_sin = marginal(sin_chain, a) / K
        print(json.dumps({'t_sin': t_sin}), flush=True)
        ms(f'sin {t_sin * 1e3:.2f} ms')
    except Exception as e:  # noqa: BLE001
        ms(f'sin chain failed: {type(e).__name__}: {str(e)[:160]}')


def main() -> None:
    wait_for_backend()  # tunnel outages must not kill the round's record
    t_start = time.time()

    # Mid-run wedge watchdog: the remote execute path can hang FOREVER
    # (observed round 5: a fully-warmed first rfft never returned, and a
    # 1-element eager add on a fresh process wedged too). A hung bench
    # records nothing; this thread guarantees the one JSON line exists
    # and frees the driver's slot. It fires only if main() has not
    # printed by then.
    import threading

    done = threading.Event()

    def _watchdog():
        if not done.wait(BUDGET_S + 300):
            print('# watchdog: bench wedged past budget; recording '
                  'tunnel-outage row', file=sys.stderr, flush=True)
            print(json.dumps({
                'metric': 'rfft_2^24_f32', 'value': 0, 'unit': 'GFLOP/s',
                'vs_baseline': 0, 'error': 'watchdog: device wedge/outage',
            }), flush=True)
            os._exit(1)

    threading.Thread(target=_watchdog, daemon=True).start()

    # ---- PRIMARY instrument: jit-chain device times (subprocess) ---------
    # The chain marginal is the only estimator that has stayed inside
    # physical bounds on this tunnel (PERF.md "the tunnel lies twice");
    # the eager rows below are a fallback for rows the chain did not
    # land. The subprocess (wedge isolation) streams one flushed JSON
    # line per row; a timeout kill keeps the rows already landed.
    #
    # It MUST run before this process initializes its own jax client:
    # the terminal serializes a second client behind a live first one —
    # with the parent's client up, the same chain that finishes all four
    # rows in 92 s standalone made zero progress in 340 s (round 5).
    vals = {}
    if not os.environ.get('DSC_BENCH_NO_CHAIN'):
        import tempfile

        proc = None
        with tempfile.TemporaryFile('w+') as chain_out:
            try:
                proc = subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__), '--chain'],
                    stdout=chain_out, stderr=sys.stderr,
                    start_new_session=True, text=True,
                )
                proc.wait(timeout=max(BUDGET_S - 120, 120))
            except Exception as e:  # noqa: BLE001 — timeout/wedge
                if proc is not None:
                    # SIGTERM first so the jax client closes its terminal
                    # session — a SIGKILLed client lingers server-side
                    # and serializes the NEXT client's init for minutes
                    try:
                        os.killpg(proc.pid, signal.SIGTERM)
                        proc.wait(timeout=10)
                    except Exception:  # noqa: BLE001
                        try:
                            os.killpg(proc.pid, signal.SIGKILL)
                        except OSError:
                            pass
                print(f'# chain run interrupted: {type(e).__name__}',
                      file=sys.stderr)
            chain_out.seek(0)
            for line in chain_out:
                try:
                    vals.update(json.loads(line))
                except ValueError:
                    pass
        if vals:
            print(f'# chain upgrade: applied ({"+".join(sorted(vals))} = '
                  'jit-chain device time)', file=sys.stderr)
        else:
            print('# chain upgrade skipped: no milestone rows landed',
                  file=sys.stderr)

    n = 2**24
    logn = 24
    flops_r = 2.5 * n * logn
    ne = 2**26  # 256 MiB f32
    rng = np.random.default_rng(42)
    x_np = rng.standard_normal(n).astype(np.float32)

    if 'rfft_err' in vals:
        print(f'# rfft 2^24 rel err vs NumPy: {vals["rfft_err"]:.3e} '
              f'(bound 1e-4) | irfft roundtrip abs err: '
              f'{vals["irfft_err"]:.3e}', file=sys.stderr)

    # ---- NumPy baseline on this host -------------------------------------
    t_np = bench_host(lambda: np.fft.rfft(x_np))
    gflops_np = flops_r / t_np / 1e9

    # ---- eager fallback (ONLY if chain rows are missing): this is the
    # bench's second jax client, so it may pay the serialized-init stall
    timing_rows = {'t_pair', 't_cpair', 't_fma', 't_sin'}
    x = None
    if not timing_rows.issubset(vals):
        import jax

        import dsc_tpu as dsc

        dsc.init(int(8 * 2**30))
        print(f'# backend: {jax.default_backend()} {jax.devices()}',
              file=sys.stderr)
        x = dsc.from_numpy(x_np)
        _drain(dsc.rfft(x))  # warm the public programs

    def section(label, fn, fallback=float('inf')):
        """One eager fallback row; a failure (compile OOM, transient
        tunnel error) records inf and moves on instead of killing the
        whole record — a round-4 driver run died at the sin compile and
        lost every number after the accuracy phase."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            print(f'# section {label} failed: {type(e).__name__}: '
                  f'{str(e)[:200]}', file=sys.stderr)
            return fallback

    # physical floors at the 819 GB/s v5e HBM peak (see bench_eager)
    mib = float(2**20)
    floor_pair = 8 * 64 * mib / 819e9   # 4 streamed phases x in+out
    floor_cpair = 8 * 128 * mib / 819e9  # c64 slabs are twice as wide
    floor_fma = 3 * ne * 4 / 819e9
    floor_sin = 2 * ne * 4 / 819e9

    # ---- rfft/irfft roundtrip (public API; 2 transforms per op) ----------
    if 't_pair' in vals:
        t_pair = vals['t_pair']
    else:
        t_pair = section('rfft', lambda: bench_eager(
            lambda v: dsc.irfft(dsc.rfft(v)), x, t_floor=floor_pair))
    t_rfft = t_pair / 2  # rfft and irfft are flop/byte-symmetric here
    gflops_rfft = flops_r / t_rfft / 1e9

    # ---- complex fft 2^24 (public API, planar tensors) -------------------
    # dsc.fft of the real input yields a FULL-logical-length planar C32
    # tensor, so the fft/ifft chain below stays on the planar fast path
    # (a hermitian-full rfft result has physical_ne != ne and would
    # materialize dense complex at the boundary instead)
    def fft_row():
        xc = dsc.fft(x)
        return bench_eager(lambda z: dsc.ifft(dsc.fft(z)), xc,
                           t_floor=floor_cpair) / 2

    if 't_cpair' in vals:
        t_fft = vals['t_cpair'] / 2
    else:
        t_fft = section('cfft', fft_row)
    gflops_fft = 5.0 * n * logn / t_fft / 1e9

    # ---- elementwise bandwidth (public API, streaming map kernel) --------
    if 't_fma' in vals and 't_sin' in vals:
        t_fma, t_sin = vals['t_fma'], vals['t_sin']
    else:
        a = dsc.from_numpy(rng.standard_normal(ne).astype(np.float32))
        b = dsc.from_numpy(rng.standard_normal(ne).astype(np.float32))
        t_fma = vals.get('t_fma') or section('fma', lambda: bench_eager(
            lambda v: dsc.add(v, b), a, t_floor=floor_fma))
        t_sin = vals.get('t_sin') or section('sin', lambda: bench_eager(
            lambda v: dsc.sin(v), a, t_floor=floor_sin))
    gbs_fma = 3 * ne * 4 / t_fma / 1e9  # 2 reads + 1 write
    gbs_sin = 2 * ne * 4 / t_sin / 1e9

    print(
        f'# rfft/irfft 2^24: {t_rfft*1e3:8.2f} ms/transform '
        f'{gflops_rfft:8.1f} GFLOP/s\n'
        f'# cfft  2^24: {t_fft*1e3:8.2f} ms  {gflops_fft:8.1f} GFLOP/s\n'
        f'# fma  256MB: {t_fma*1e3:8.2f} ms  {gbs_fma:8.1f} GB/s\n'
        f'# sin  256MB: {t_sin*1e3:8.2f} ms  {gbs_sin:8.1f} GB/s\n'
        f'# numpy rfft: {t_np*1e3:8.2f} ms  {gflops_np:8.1f} GFLOP/s',
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                'metric': 'rfft_2^24_f32',
                'value': round(gflops_rfft, 2),
                'unit': 'GFLOP/s',
                'vs_baseline': round(gflops_rfft / gflops_np, 3),
            }
        )
    )
    done.set()


if __name__ == '__main__':
    if '--chain' in sys.argv:
        chain_main()
    else:
        try:
            main()
        except Exception as e:  # noqa: BLE001 — the record must exist
            # a dead backend (or mid-run wedge) still yields the one JSON
            # line the driver records, marked invalid via value 0
            print(f'# bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
            print(json.dumps({
                'metric': 'rfft_2^24_f32', 'value': 0, 'unit': 'GFLOP/s',
                'vs_baseline': 0, 'error': f'{type(e).__name__}: {e}'[:200],
            }))
            sys.exit(1)
