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
