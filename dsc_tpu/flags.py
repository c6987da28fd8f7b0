"""Process-wide engine-selection flags.

``xla_only()`` forces every engine gate (Pallas FFT base kernels, the
two-pass streaming FFT, the DMA-streaming elementwise map) to route
through the pure-XLA implementations for the duration of the context.

Why it exists: a Pallas kernel is an opaque custom call to XLA's SPMD
partitioner, so a program compiled over a multi-device mesh
(``dsc.compile(mesh=...)``) cannot shard it — the partitioner would have
to gather the operand onto every chip. Tracing such programs under
``xla_only()`` keeps every op in plain XLA HLO, which the partitioner
splits across the mesh with ICI collectives as usual. Single-device
programs keep the Pallas fast paths.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_tls = threading.local()


def xla_only_active() -> bool:
    return getattr(_tls, 'depth', 0) > 0


@contextmanager
def xla_only():
    _tls.depth = getattr(_tls, 'depth', 0) + 1
    try:
        yield
    finally:
        _tls.depth -= 1


def kernel_trace_active() -> bool:
    """True while tracing a user function INSIDE a Pallas kernel body
    (dsc.map tiles). Ops must lower to plain vector code: no nested
    pallas_call, no jit boundaries, and Python scalars must stay jaxpr
    literals (a shaped constant captured by a kernel is an error)."""
    return getattr(_tls, 'kdepth', 0) > 0


@contextmanager
def kernel_trace():
    _tls.kdepth = getattr(_tls, 'kdepth', 0) + 1
    try:
        yield
    finally:
        _tls.kdepth -= 1
