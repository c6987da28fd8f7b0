"""FFT engine configuration knobs.

The reference's knobs are compile-time defines (DSC_MAX_FFT_PLANS etc.,
Makefile:28-40); here they are a small module of runtime flags + env vars
(SURVEY §5.6).
"""

from __future__ import annotations

import os

import numpy as np

# 'auto': Pallas base kernels on TPU, XLA Stockham elsewhere.
# 'on' / 'off' force it (off is also the escape hatch for debugging,
# the analog of the reference's jax_disable_jit note in SURVEY §5.2).
PALLAS_MODE = os.environ.get('DSC_FFT_PALLAS', 'auto')

# Pallas base kernel supports f32/c32 lanes; sizes must fit VMEM staging.
PALLAS_MIN_N = 256
PALLAS_MAX_N = 4096


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == 'tpu'


def use_pallas(dtype, n: int) -> bool:
    if PALLAS_MODE == 'off':
        return False
    if np.dtype(dtype) != np.complex64:
        return False
    if not (PALLAS_MIN_N <= n <= PALLAS_MAX_N):
        return False
    if PALLAS_MODE == 'on':
        return True
    return _on_tpu()
