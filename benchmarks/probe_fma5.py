"""Round-5 DEPTH/CHUNK re-sweep with the jit-chain instrument.

The round-4 sweep (probe_fma.py) optimized with the EAGER differencing
estimator, which probe_chain_fma.py shows drifting 656-1304 GB/s within
one process (1304 > the 819 GB/s HBM peak -> estimator artifact, traced
to early-signaling buffer-definition events on this backend). The chain
estimator is stable to ~3%. Re-tune against it: each config gets its own
jit chain (pallas_map globals are read at trace time), all configs
compile first, then measurement proceeds round-robin so residual drift
hits every config equally.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from dsc_tpu.ops import pallas_map  # noqa: E402

K = 4
NE = 2**26
GB = 3 * NE * 4 / 1e9

CONFIGS = [  # (DEPTH, CHUNK_ROWS)
    (8, 4096),   # round-4 default
    (6, 8192),
    (3, 8192),
    (2, 16384),  # 8 MiB tiles (morning winner)
    (3, 16384),  # current computed default
]


def drain(t):
    if isinstance(t, (tuple, list)):
        t = t[0]
    np.asarray(t.ravel()[:1])


def marginal(step, state, m=3, reps=5):
    def t(k, s):
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        drain(s)
        return time.perf_counter() - t0, s

    _, state = t(m, state)
    t1s, t2s = [], []
    for _ in range(reps):
        t1, state = t(m, state)
        t2, state = t(2 * m, state)
        t1s.append(t1)
        t2s.append(t2)
    return (sorted(t2s)[len(t2s) // 2] - sorted(t1s)[len(t1s) // 2]) / m


def make_chain(depth, chunk):
    @jax.jit
    def chain(c):
        v, w = c
        for _ in range(K):
            v = pallas_map.stream_map(jnp.add, v, w)
        return v, w

    def build_and_warm(state):
        pallas_map.DEPTH, pallas_map.CHUNK_ROWS = depth, chunk
        out = chain(state)
        drain(out)
        return chain

    return build_and_warm


def main():
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(ka, (NE,), jnp.float32)
    b = jax.random.normal(kb, (NE,), jnp.float32)
    state = (a, b)

    chains = []
    for depth, chunk in CONFIGS:
        t0 = time.time()
        chains.append(make_chain(depth, chunk)(state))
        print(f'# compiled D={depth} C={chunk} in {time.time()-t0:.0f}s',
              flush=True)

    results = {cfg: [] for cfg in CONFIGS}
    for rnd in range(3):
        for cfg, chain in zip(CONFIGS, chains):
            t = marginal(chain, state) / K
            results[cfg].append(t)
            print(f'round {rnd} D={cfg[0]} C={cfg[1]}: {t*1e3:7.3f} ms '
                  f'{GB/t:6.1f} GB/s', flush=True)
    print('--- medians ---')
    for cfg, ts in results.items():
        t = sorted(ts)[len(ts) // 2]
        print(f'D={cfg[0]} C={cfg[1]}: {t*1e3:7.3f} ms {GB/t:6.1f} GB/s')


if __name__ == '__main__':
    main()
