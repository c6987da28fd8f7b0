"""dsc_tpu — a TPU-native, NumPy-compatible array framework.

A from-scratch rebuild of dspcraft/dsc for TPU: the op set dispatches to
XLA, the FFT engine is Stockham/four-step with Pallas base kernels staged
through VMEM, memory lives in the XLA-managed HBM arena with dsc-style byte
accounting, and the Perfetto tracer is reimplemented host-side (plus xprof
integration).

Public API parity checklist: SURVEY Appendix A
(reference python/dsc/__init__.py:7-57).
"""

from .context import (
    clear,
    init,
    manual_seed,
    print_mem_usage,
    shutdown,
    used_mem,
)
from .dtype import Dtype
from .fourier import fft, fftfreq, ifft, irfft, plan_fft, rfft, rfftfreq
from .fuse import compile  # noqa: A004 — dsc.compile, the fusion tier
from .parallel import make_mesh
from .profiler import profile, start_recording, stop_recording
from .tensor import (
    Tensor,
    absolute,
    add,
    angle,
    arange,
    cast,
    clip,
    concat,
    conj,
    cos,
    empty,
    empty_like,
    exp,
    from_numpy,
    full,
    full_like,
    i0,
    imag,
    log2,
    log10,
    logn,
    max,
    mean,
    min,
    mul,
    ones,
    ones_like,
    power,
    randn,
    real,
    reshape,
    sin,
    sinc,
    sqrt,
    sub,
    sum,
    transpose,
    true_div,
    view,
    zeros,
    zeros_like,
)

__version__ = '0.1.0'

__all__ = [
    'init',
    'clear',
    'shutdown',
    'used_mem',
    'print_mem_usage',
    'manual_seed',
    'compile',
    'make_mesh',
    'Tensor',
    'Dtype',
    'from_numpy',
    'reshape',
    'concat',
    'transpose',
    'view',
    'cast',
    'arange',
    'randn',
    'cos',
    'sin',
    'sinc',
    'logn',
    'log2',
    'log10',
    'exp',
    'sqrt',
    'absolute',
    'angle',
    'conj',
    'real',
    'imag',
    'plan_fft',
    'fft',
    'ifft',
    'rfft',
    'irfft',
    'fftfreq',
    'rfftfreq',
    'add',
    'sub',
    'mul',
    'true_div',
    'sum',
    'mean',
    'max',
    'min',
    'clip',
    'power',
    'i0',
    'ones',
    'ones_like',
    'zeros',
    'zeros_like',
    'full',
    'full_like',
    'empty',
    'empty_like',
    'profile',
    'start_recording',
    'stop_recording',
]
