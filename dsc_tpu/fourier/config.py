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


# 'auto': streaming two-pass four-step kernel for large single-vector
# transforms on TPU (pallas_stream.py); 'on' forces it (interpret mode off
# TPU), 'off' falls back to the XLA four-step.
STREAM_MODE = os.environ.get('DSC_FFT_STREAM', 'auto')


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == 'tpu'


def use_pallas(dtype, n: int) -> bool:
    from .. import flags

    if PALLAS_MODE == 'off' or flags.xla_only_active():
        return False
    if np.dtype(dtype) != np.complex64:
        return False
    if not (PALLAS_MIN_N <= n <= PALLAS_MAX_N):
        return False
    if PALLAS_MODE == 'on':
        return True
    return _on_tpu()


# Half-size packed real FFT (rfft_n as one n/2 complex engine +
# untangle) for single-vector streaming rfft/irfft. Three settings:
#   'auto'  — the FUSED engine (packed_fused.py: selection/untangle/
#             entangle/interleave all inside the Pallas phases; ~2.0 vs
#             3.0 size-n MXU phase-equivalents per pair) when its shape
#             constraints hold, else the full-size engine.
#   'xla'   — the XLA-composed packed engine (packed.py) — kept for
#             A/B experiments; loses at 2^24 (round-4 measurement:
#             ~1.7 ms of XLA deint/untangle passes per pair).
#   'on'    — force fused (interpret mode off TPU); 'off' — full-size.
# Read at trace time: flipping it mid-process does not retrace
# already-jitted shapes.
PACKED_MODE = os.environ.get('DSC_FFT_PACKED', 'auto')


def packed_impl(n1: int, n2: int):
    """Which packed engine handles a single-vector half-T rfft/irfft:
    'fused' | 'xla' | None (full-size engine)."""
    from .. import flags

    if PACKED_MODE == 'off' or flags.xla_only_active():
        return None
    if PACKED_MODE == 'xla':
        from . import packed

        return 'xla' if packed.supported(n1, n2) else None
    from . import packed_fused

    if not packed_fused.supported(n1, n2):
        return None
    if PACKED_MODE in ('auto', 'on'):
        return 'fused'
    return None


def use_packed(n1: int, n2: int) -> bool:
    return packed_impl(n1, n2) is not None


# Largest batch*n the streaming kernel takes on at once: the planar
# intermediate is 8 bytes/element (2 f32 planes in + 2 out), so 2^27
# elements keeps it within ~1 GiB of the 16 GiB HBM.
STREAM_MAX_ELEMS = 2**27


def use_stream(dtype, batch: int, n: int) -> bool:
    """Route an n-point transform — single vector or a batch of rows —
    to the streaming two-pass kernel. Factors come from
    pallas_stream.factors(n) (up to FACTOR_MAX^2 = 2^26), independent of
    the XLA path's base-kernel-bounded plan spec."""
    from .. import flags

    if STREAM_MODE == 'off' or flags.xla_only_active() or batch < 1:
        return False
    if n & (n - 1) or batch * n > STREAM_MAX_ELEMS:
        return False
    from . import pallas_stream

    n1, n2 = pallas_stream.factors(n)
    if not pallas_stream.supported(n1, n2, dtype, batch):
        return False
    if STREAM_MODE == 'on':
        return True
    return _on_tpu()
