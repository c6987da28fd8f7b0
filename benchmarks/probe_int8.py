"""On-chip probe: raw MXU pass rate by input dtype (bf16 vs int8 vs f32).

Decision data for the PERF.md backlog item "int8 3-limb DFT stages":
the streaming FFT's DFT stages are 3 bf16 passes (hi*hi + lo*hi + hi*lo)
per complex stage. A 2-limb int8 scheme (14-bit mantissa, within the
1e-4 north-star error budget) also needs 3 limb passes (a1b1, a1b2,
a2b1), so it only wins if one int8 pass costs ~0.5x one bf16 pass —
the nominal v5e spec (394 TOPS int8 vs 197 TFLOP bf16). This probe
measures whether Mosaic/axon actually delivers that rate for the FFT's
matmul shape, dependent-chained inside one pallas kernel so nothing can
be hoisted or overlapped away.

Method: x_{t+1} = cast(A @ x_t) repeated T times inside one kernel
((128,128) @ (128,512), the DFT-stage LHS shape); eager marginal
(t(2k)-t(k))/k with a 1-element drain, round-robin across dtypes per
rep so tunnel drift cancels (PERF.md methodology).

Usage: python -u benchmarks/probe_int8.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

T = 4096  # dependent matmuls per kernel call
M, K_DIM, N = 128, 128, 512
K = 8
REPS = 5


def _drain(arr):
    np.asarray(arr.ravel()[:1].astype(jnp.float32))


def make_step(in_dtype, acc_dtype):
    def kern(a_ref, x_ref, o_ref):
        a = a_ref[...]

        def body(_, x):
            y = jax.lax.dot_general(
                a, x, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            return y.astype(in_dtype)

        o_ref[...] = jax.lax.fori_loop(0, T, body, x_ref[...])

    @jax.jit
    def step(a, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K_DIM, N), in_dtype),
            in_specs=[
                pl.BlockSpec((M, K_DIM), lambda: (0, 0)),
                pl.BlockSpec((K_DIM, N), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K_DIM, N), lambda: (0, 0)),
        )(a, x)

    return step


def main():
    rng = np.random.default_rng(11)
    variants = {}
    # identity-ish A keeps int8 values bounded through 4096 dependent
    # passes (any fixed point of cast(A@x) works; rate is what's timed)
    a_f = np.eye(M, K_DIM, dtype=np.float32)
    x_f = rng.standard_normal((K_DIM, N)).astype(np.float32)

    specs = [
        ('bf16->f32', jnp.bfloat16, jnp.float32),
        ('int8->i32', jnp.int8, jnp.int32),
        ('f32->f32 ', jnp.float32, jnp.float32),
    ]
    for name, din, dacc in specs:
        step = make_step(din, dacc)
        if np.dtype(din).kind in 'iu':
            a = jnp.asarray(a_f * 3, din)
            x = jnp.asarray(np.clip(x_f * 10, -40, 40), din)
        else:
            a = jnp.asarray(a_f, din)
            x = jnp.asarray(x_f, din)
        t0 = time.time()
        try:
            y = step(a, x)
            jax.block_until_ready(y)
            _drain(y)
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f'{name}: FAILED {str(e)[:300]}', flush=True)
            continue
        print(f'{name}: compiled+ran in {time.time()-t0:.0f}s', flush=True)
        variants[name] = (step, a, x)

    def marginal(step, a, x):
        # x feeds back through the chain: the runtime caches
        # same-arguments executions (identical-args timing loops measure
        # the cache, not the device)
        s = x

        def t(k):
            nonlocal s
            t0 = time.perf_counter()
            for _ in range(k):
                s = step(a, s)
            _drain(s)
            return time.perf_counter() - t0

        t(K)
        t1, t2 = t(K), t(2 * K)
        return (t2 - t1) / K

    samples = {name: [] for name in variants}
    for r in range(REPS):
        for name, (step, a, x) in variants.items():
            samples[name].append(marginal(step, a, x))
        print(f'rep {r}: ' + '  '.join(
            f'{k}={v[-1]*1e3:.3f}ms' for k, v in samples.items()),
            flush=True)

    macs = M * K_DIM * N * T
    print(f'--- medians ({T} chained (128,128)@(128,512) passes/call) ---',
          flush=True)
    meds = {}
    for name, v in samples.items():
        med = sorted(v)[len(v) // 2]
        meds[name] = med
        print(f'{name}: {med*1e3:7.3f} ms/call  '
              f'{2*macs/med/1e12:7.1f} T(FL)OP/s  '
              f'{med/T*1e9:6.1f} ns/pass', flush=True)
    if 'bf16->f32' in meds and 'int8->i32' in meds:
        r = meds['int8->i32'] / meds['bf16->f32']
        print(f'int8 pass / bf16 pass = {r:.2f} '
              f'({"2-limb int8 DFT could win" if r < 0.75 else "no win: keep bf16 3-pass"})',
              flush=True)


if __name__ == '__main__':
    main()
