"""dsc.compile — whole-pipeline fusion over the public Tensor API.

The reference is eager by construction: every op is one C call, and its
only ahead-of-time hook is the FFT plan cache (``dsc_plan_fft``,
dsc/src/dsc.cpp:218-267). On this backend eager dispatch has two costs
the reference never pays: the tunnel's per-op client marginal
(~0.4-1 ms, benchmarks/PERF.md) and one full HBM round-trip per op for
every intermediate. ``dsc.compile`` is the TPU-idiomatic answer: trace a
Python function of Tensors ONCE into a single XLA program, so a whole
pipeline (e.g. the README filterFFT chain, reference README.md:110-137)
runs as one device dispatch with its intermediates fused or
VMEM-resident (measured: chained 32 MiB elementwise intermediates never
touch HBM on this 128-MiB-VMEM chip).

Semantics:

- ``dsc.compile(fn)`` returns a callable. Arguments may be dsc Tensors,
  NumPy arrays (converted to Tensors), or Python scalars. Tensors trace
  as dynamic inputs; scalars are STATIC — each distinct scalar value
  compiles a separate program (pass a 1-element Tensor instead if the
  value changes every call).
- ``fn`` must be FUNCTIONAL: return every Tensor you need. In-place
  writes (``out=``, ``__setitem__``) to tensors created *inside* the
  traced function work as usual, but writes to *argument* tensors do not
  propagate back to the caller's tensors (XLA programs are pure).
- Anything that needs a concrete value mid-trace — ``.numpy()``,
  1-element unwrap via ``__getitem__``, ``print(t)`` — raises JAX's
  ConcretizationTypeError; compute values on device and return them.
- ``randn``/``from_numpy``/creation ops inside ``fn`` bake in as
  program CONSTANTS (same values every call); create varying data
  outside and pass it in.
- Complex tensors cross the boundary in planar form (planar.py), so
  compiled pipelines keep the planar/hermitian fast paths end-to-end —
  including the transposed fourstep spectrum layout of large rffts.

Programs are cached per compiled wrapper, keyed by every argument's
(shape, dtype, storage layout) plus static scalar values, with bounded
LRU eviction mirroring the FFT plan cache contract (dsc.cpp:182-267);
cap via DSC_MAX_PROGRAMS (default 32). Traced ops record their tracing
events once at trace time; each call of the compiled program records a
single ``compile:<name>`` event instead (tracing.py).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from . import tracing
from .planar import Planar
from .tensor import Tensor, from_numpy

__all__ = ['compile']


def _max_programs() -> int:
    try:
        return max(1, int(os.environ.get('DSC_MAX_PROGRAMS', '32')))
    except ValueError:
        return 32


def _spec_of(t: Tensor) -> Tuple[Tuple, Tuple[jax.Array, ...]]:
    """(hashable layout spec, leaf arrays) for one Tensor.

    The spec carries everything ``_rebuild`` needs that is NOT in the
    leaves themselves: the view shape (reshape views share a physical
    buffer of a different shape) and, for planar storage, the logical
    shape / hermitian flag / fourstep layout."""
    pp = t._planar
    if pp is None:
        arr = t._buf.arr
        return ('d', t._shape, t._dtype), (arr,)
    return (
        ('p', t._shape, pp.shape, pp.hermitian, pp.fourstep),
        (pp.re, pp.im),
    )


def _rebuild(spec: Tuple, leaves: Tuple) -> Tensor:
    """Tensor over (possibly traced) leaves, matching ``_spec_of``.
    With tracers, _Buffer skips arena accounting (tensor.py); with the
    concrete output arrays it performs it, like any eager result."""
    if spec[0] == 'd':
        _, view_shape, dtype = spec
        t = Tensor._from_jax(leaves[0])
        t._shape = view_shape
        t._dtype = dtype
        return t
    _, view_shape, pshape, herm, fourstep = spec
    t = Tensor._from_planar(Planar(leaves[0], leaves[1], pshape, herm,
                                   fourstep))
    t._shape = view_shape
    return t


def _leaf_count(spec: Tuple) -> int:
    return 1 if spec[0] == 'd' else 2


def _flatten_result(res) -> Tuple[Tuple, List]:
    """(structure, leaves) of the traced function's return value.
    Supports a Tensor or arbitrarily nested tuples/lists of Tensors."""
    if isinstance(res, Tensor):
        spec, leaves = _spec_of(res)
        return ('t', spec), list(leaves)
    if isinstance(res, (tuple, list)):
        kind = 'tuple' if isinstance(res, tuple) else 'list'
        structs, leaves = [], []
        for r in res:
            s, ls = _flatten_result(r)
            structs.append(s)
            leaves.extend(ls)
        return (kind, tuple(structs)), leaves
    raise RuntimeError(
        'dsc.compile functions must return a Tensor or a tuple/list of '
        f'Tensors, got {type(res).__name__}'
    )


def _unflatten_result(struct: Tuple, it) -> Any:
    kind = struct[0]
    if kind == 't':
        spec = struct[1]
        return _rebuild(spec, tuple(next(it) for _ in range(_leaf_count(spec))))
    children = [_unflatten_result(s, it) for s in struct[1]]
    return tuple(children) if kind == 'tuple' else children


# argument slots: how each call argument enters the traced program
_SLOT_TENSOR = 't'
_SLOT_STATIC = 's'


class _Compiled:
    """One compiled wrapper: spec-keyed LRU of jitted programs."""

    def __init__(self, fn):
        self._fn = fn
        self._name = getattr(fn, '__name__', 'fn')
        self.__doc__ = getattr(fn, '__doc__', None)
        self.__name__ = self._name
        self._programs: 'OrderedDict[Tuple, Tuple]' = OrderedDict()

    # -- call ---------------------------------------------------------------

    def __call__(self, *args, **kwargs):
        slots: List[Tuple] = []  # (kind, name_or_None, spec_or_value)
        leaves: List = []
        for name, a in [(None, a) for a in args] + sorted(kwargs.items()):
            if isinstance(a, np.ndarray):
                a = from_numpy(a)
            if isinstance(a, Tensor):
                spec, ls = _spec_of(a)
                slots.append((_SLOT_TENSOR, name, spec))
                leaves.extend(ls)
            elif isinstance(a, (bool, int, float, complex, str, type(None))):
                slots.append((_SLOT_STATIC, name, a))
            else:
                raise RuntimeError(
                    'dsc.compile arguments must be Tensors, NumPy arrays '
                    f'or Python scalars, got {type(a).__name__}'
                )
        key = tuple(slots)
        prog = self._programs.get(key)
        if prog is None:
            prog = self._make_program(tuple(slots))
            while len(self._programs) >= _max_programs():
                self._programs.popitem(last=False)
            self._programs[key] = prog
        else:
            self._programs.move_to_end(key)
        jitted, out_cell = prog
        with tracing.trace_op(
            f'compile:{self._name}', 'op;compile',
            {'n_leaves': len(leaves)},
        ) as holder:
            out_leaves = jitted(*leaves)
            if holder is not None and out_leaves:
                holder.result = out_leaves[0]
        return _unflatten_result(out_cell['struct'], iter(out_leaves))

    # -- program construction -------------------------------------------------

    def _make_program(self, slots: Tuple) -> Tuple:
        fn = self._fn
        out_cell: Dict[str, Tuple] = {}

        def run(*in_leaves):
            it = iter(in_leaves)
            call_args: List = []
            call_kwargs: Dict[str, Any] = {}
            for kind, name, payload in slots:
                if kind == _SLOT_STATIC:
                    v: Any = payload
                else:
                    v = _rebuild(
                        payload,
                        tuple(next(it) for _ in range(_leaf_count(payload))),
                    )
                if name is None:
                    call_args.append(v)
                else:
                    call_kwargs[name] = v
            res = fn(*call_args, **call_kwargs)
            struct, out_leaves = _flatten_result(res)
            out_cell['struct'] = struct
            return tuple(out_leaves)

        return jax.jit(run), out_cell

    # -- introspection ---------------------------------------------------------

    @property
    def n_programs(self) -> int:
        return len(self._programs)

    def clear_cache(self) -> None:
        self._programs.clear()


def compile(fn=None):  # noqa: A001 — dsc.compile is the public name
    """Compile ``fn(*tensors) -> Tensor(s)`` into one fused XLA program
    per argument signature. Usable as a decorator::

        @dsc.compile
        def pipeline(sig, flt):
            spec = dsc.rfft(sig) * dsc.rfft(flt)
            return dsc.irfft(spec)

    See the module docstring for tracing semantics and restrictions."""
    if fn is None:
        return compile
    return _Compiled(fn)
