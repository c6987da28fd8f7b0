"""Compile-only sweep: which (DEPTH, CHUNK_ROWS) configs of the
streaming map kernel actually fit today's scoped-vmem accounting.

Round-5 regression: the committed D=8->2/C=16384 default compiled and
measured 655 GB/s in the morning probe (probe_fma5.py) but OOMs the
scoped-vmem stack (127.59M > 96M) under the afternoon compile helper —
the Mosaic stack accounting changed out from under the tune. This probe
only compiles (AOT, ~15 s/config) and prints OK/OOM + the demand, so the
default can be re-picked against reality before any timing.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from dsc_tpu.ops import pallas_map  # noqa: E402

NE = 2**26

CONFIGS = [  # (DEPTH, CHUNK_ROWS)
    (2, 16384),
    (3, 8192),
    (4, 8192),
    (8, 4096),
    (4, 4096),
    (8, 2048),
]


def main():
    a = jnp.ones((NE,), jnp.float32)
    b = jnp.ones((NE,), jnp.float32)
    for depth, chunk in CONFIGS:
        pallas_map.DEPTH, pallas_map.CHUNK_ROWS = depth, chunk

        @jax.jit
        def f(v, w):
            return pallas_map.stream_map(jnp.add, v, w)

        try:
            f.lower(a, b).compile()
            print(f'D={depth} C={chunk}: OK', flush=True)
        except Exception as e:
            msg = str(e)
            i = msg.find('Scoped allocation')
            print(f'D={depth} C={chunk}: OOM {msg[i:i+80] if i >= 0 else msg[:120]}',
                  flush=True)


if __name__ == '__main__':
    main()
