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
- ``dsc_tpu.models`` pipelines are ordinary Tensor->Tensor callables and
  compose under ``dsc.compile`` (e.g. STFT -> mask -> ISTFT as one
  program; tests/test_models.py).

Programs are cached per compiled wrapper, keyed by every argument's
(shape, dtype, storage layout) plus static scalar values, with bounded
LRU eviction mirroring the FFT plan cache contract (dsc.cpp:182-267);
cap via DSC_MAX_PROGRAMS (default 32). Traced ops record their tracing
events once at trace time; each call of the compiled program records a
single ``compile:<name>`` event instead (tracing.py).
"""

from __future__ import annotations

import functools
import os
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from . import flags, tracing
from .planar import Planar
from .tensor import Tensor, from_numpy

__all__ = ['compile', 'map']


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


def _leaf_shardings_of(spec: Tuple, pspec, mesh: Mesh, leaves) -> List:
    """Per-leaf placement for one argument Tensor whose layout spec is
    ``spec`` and whose user-requested logical PartitionSpec is ``pspec``.
    Returns one entry per leaf: a NamedSharding to ``device_put`` to, or
    None meaning LEAVE THE LEAF WHERE IT IS.

    Dense tensors have one leaf of the logical shape; plain planar complex
    tensors have two leaves each of the logical shape, so the same
    PartitionSpec applies to both planes. Hermitian-half / fourstep layouts
    store planes whose shape differs from the logical one — a logical spec
    cannot be mapped onto them, so sharded complex arguments must enter in
    the plain planar layout (any freshly uploaded complex tensor is).

    When no explicit spec was given and every leaf is ALREADY placed with
    a NamedSharding on this mesh (e.g. the sharded output of a previous
    compiled call), the placement is kept — chained mesh pipelines stay
    device-resident with zero host round-trips instead of being gathered
    back to replicated between calls (tests/test_compile.py)."""
    n_leaves = _leaf_count(spec)
    if pspec is None:
        if all(
            isinstance(getattr(l, 'sharding', None), NamedSharding)
            and l.sharding.mesh == mesh
            for l in leaves
        ):
            return [None] * n_leaves
        pspec = PartitionSpec()
    s = NamedSharding(mesh, pspec)
    if spec[0] == 'd':
        return [s]
    _, _view, _pshape, herm, fourstep = spec
    if herm or fourstep:
        raise RuntimeError(
            'dsc.compile(mesh=...): cannot shard a hermitian-half/fourstep '
            'planar tensor; pass the plain complex tensor instead'
        )
    return [s, s]


def _constrain_out(struct: Tuple, leaves: List, out_specs, mesh: Mesh) -> List:
    """Apply ``with_sharding_constraint`` to output leaves, walking the
    result structure. ``out_specs`` is one PartitionSpec for every output
    tensor, or a flat sequence matching the tensor outputs in order."""
    specs: List = []

    def collect(st):
        if st[0] == 't':
            specs.append(st[1])
        else:
            for c in st[1]:
                collect(c)

    collect(struct)
    if isinstance(out_specs, PartitionSpec) or out_specs is None:
        per_tensor = [out_specs] * len(specs)
    else:
        per_tensor = list(out_specs)
        if len(per_tensor) != len(specs):
            raise RuntimeError(
                f'dsc.compile out_specs has {len(per_tensor)} entries for '
                f'{len(specs)} output tensors'
            )
    out, i = list(leaves), 0
    for spec, ps in zip(specs, per_tensor):
        nl = _leaf_count(spec)
        if ps is not None:
            s = NamedSharding(mesh, ps)
            for j in range(i, i + nl):
                out[j] = jax.lax.with_sharding_constraint(out[j], s)
        i += nl
    return out


class _Compiled:
    """One compiled wrapper: spec-keyed LRU of jitted programs."""

    def __init__(self, fn, mesh: Optional[Mesh] = None,
                 in_specs: Optional[Sequence] = None,
                 out_specs=None):
        self._fn = fn
        self._name = getattr(fn, '__name__', 'fn')
        self.__doc__ = getattr(fn, '__doc__', None)
        self.__name__ = self._name
        self._programs: 'OrderedDict[Tuple, Tuple]' = OrderedDict()
        self._mesh = mesh
        self._in_specs = tuple(in_specs) if in_specs is not None else None
        self._out_specs = out_specs
        if mesh is None and (in_specs is not None or out_specs is not None):
            raise RuntimeError('dsc.compile: in_specs/out_specs need mesh=')

    # -- call ---------------------------------------------------------------

    def __call__(self, *args, **kwargs):
        slots: List[Tuple] = []  # (kind, name_or_None, spec_or_value)
        leaves: List = []
        shardings: List = []  # per-leaf NamedSharding when mesh is set
        tensor_slots: List = []  # (tensor, leaf_start, n_leaves)
        if self._in_specs is not None and len(self._in_specs) > len(args):
            raise RuntimeError(
                f'dsc.compile in_specs has {len(self._in_specs)} entries '
                f'for {len(args)} positional arguments'
            )
        for pos, (name, a) in enumerate(
            [(None, a) for a in args] + sorted(kwargs.items())
        ):
            if isinstance(a, np.ndarray):
                a = from_numpy(a)
            if isinstance(a, Tensor):
                spec, ls = _spec_of(a)
                slots.append((_SLOT_TENSOR, name, spec))
                tensor_slots.append((a, len(leaves), len(ls)))
                leaves.extend(ls)
                if self._mesh is not None:
                    ps = None
                    if (self._in_specs is not None and name is None
                            and pos < len(self._in_specs)):
                        ps = self._in_specs[pos]
                    shardings.extend(
                        _leaf_shardings_of(spec, ps, self._mesh, ls)
                    )
            elif isinstance(a, (bool, int, float, complex, str, type(None))):
                slots.append((_SLOT_STATIC, name, a))
            else:
                raise RuntimeError(
                    'dsc.compile arguments must be Tensors, NumPy arrays '
                    f'or Python scalars, got {type(a).__name__}'
                )
        if self._mesh is not None:
            placed = [
                l if s is None else jax.device_put(l, s)
                for l, s in zip(leaves, shardings)
            ]
            # sticky placement: write the placed leaves back into the
            # argument Tensors, so a replicated weight/filter tensor
            # uploads to the mesh ONCE and later calls see it already
            # resident (values are identical — only placement changes)
            for t, i0, nl in tensor_slots:
                if any(placed[i] is not leaves[i] for i in range(i0, i0 + nl)):
                    pp = t._planar
                    if pp is None:
                        t._buf.arr = placed[i0]
                    else:
                        pp.re, pp.im = placed[i0], placed[i0 + 1]
                        pp._dense = None
                    t._buf.version += 1  # derived caches refresh lazily
            leaves = placed
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
            if self._mesh is not None:
                # Pallas kernels are opaque custom calls to the SPMD
                # partitioner — trace mesh programs through the pure-XLA
                # engines so GSPMD can split every op (flags.py).
                with flags.xla_only():
                    res = fn(*call_args, **call_kwargs)
                    struct, out_leaves = _flatten_result(res)
                    if self._out_specs is not None:
                        out_leaves = _constrain_out(
                            struct, out_leaves, self._out_specs, self._mesh
                        )
            else:
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


def compile(fn=None, *, mesh=None, in_specs=None,  # noqa: A001 — public name
            out_specs=None):
    """Compile ``fn(*tensors) -> Tensor(s)`` into one fused XLA program
    per argument signature. Usable as a decorator::

        @dsc.compile
        def pipeline(sig, flt):
            spec = dsc.rfft(sig) * dsc.rfft(flt)
            return dsc.irfft(spec)

    With ``mesh=`` the program compiles SPMD over a ``jax.sharding.Mesh``
    (the reference has no distributed story, SURVEY §2.4; this is the
    TPU-native scaling path — XLA inserts ICI collectives where the
    sharded dataflow needs them)::

        mesh = dsc.make_mesh((8, 1))                  # 8 chips on 'data'
        pipe = dsc.compile(pipeline, mesh=mesh,
                           in_specs=(P('data'), P()),  # batch-shard sig,
                           out_specs=P('data'))        # replicate flt

    ``in_specs`` aligns with the positional arguments (None/P() =
    replicated); input leaves are device_put to the requested layout on
    every call, a no-op when already placed. An argument with NO explicit
    spec that already carries a ``NamedSharding`` on this mesh — e.g. the
    sharded output of a previous compiled call — is consumed IN PLACE, so
    chained mesh pipelines stay device-resident (zero gathers / host
    round-trips between steps); otherwise unspecified arguments (and all
    keyword tensors) are replicated. ``out_specs`` is one PartitionSpec
    for all outputs or
    a sequence matching the returned tensors; omitted means GSPMD
    propagation decides. Mesh traces route through the pure-XLA engines
    (Pallas custom calls cannot be partitioned — flags.py), so
    single-device latency is better WITHOUT mesh; use it to scale.

    See the module docstring for tracing semantics and restrictions."""
    if fn is None:
        return functools.partial(
            compile, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )
    return _Compiled(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


class _Mapped:
    """One fused-elementwise wrapper: signature-keyed LRU of programs.

    Each cached program is either a jitted single-pass streaming kernel
    (('stream', jitted, struct)) or the whole-pipeline XLA fallback
    (('xla',), executed through a private _Compiled)."""

    def __init__(self, fn):
        self._fn = fn
        self._name = getattr(fn, '__name__', 'fn')
        self.__doc__ = getattr(fn, '__doc__', None)
        self.__name__ = self._name
        self._programs: 'OrderedDict[Tuple, Tuple]' = OrderedDict()
        self._fallback = _Compiled(fn)

    def _tile_fn(self, n_out: int):
        """fn over kernel operands: full/broadcast-row tiles arrive as
        (rows, 128) f32 slabs, 1-element operands as scalars — wrapped
        back into Tensors so the user's elementwise body runs unchanged
        on tiles (a (1, 1) Tensor broadcasts like the original scalar)."""
        import jax.numpy as jnp

        def tile_g(*ops):
            ts = [
                Tensor._from_jax(
                    o if getattr(o, 'ndim', 0) >= 1 else jnp.reshape(o, (1, 1))
                )
                for o in ops
            ]
            # ops on tiles must lower to plain vector code INSIDE this
            # kernel: raw unjitted jnp, scalars as literals, no nested
            # pallas_call (flags.kernel_trace -> tensor.py raw paths)
            with flags.kernel_trace():
                _, leaves = _flatten_result(self._fn(*ts))
            return leaves[0] if n_out == 1 else tuple(leaves)

        return tile_g

    def _make_program(self, args: Sequence[Tensor]) -> Tuple:
        from .ops import pallas_map

        shapes = [a._shape for a in args]
        from .dtype import DTYPE_TO_NP

        npdts = [DTYPE_TO_NP[a._dtype] for a in args]
        dense = all(a._planar is None for a in args)
        if not (
            dense
            and pallas_map.eligible(shapes, npdts)
            and pallas_map.BROW_IMPL != 'b3d'
        ):
            return ('xla',)

        # validate at full shapes: every output must be a dense f32
        # tensor of the broadcast target shape (elementwise contract).
        # the result structure is static — captured via a cell because
        # eval_shape outputs must be arrays only
        cell: Dict[str, Tuple] = {}

        def full_g(*arrs):
            ts = [Tensor._from_jax(a) for a in arrs]
            with flags.xla_only():
                struct, leaves = _flatten_result(self._fn(*ts))
            cell['struct'] = struct
            return tuple(leaves)

        try:
            out_leaves = jax.eval_shape(
                full_g,
                *[jax.ShapeDtypeStruct(s, d) for s, d in zip(shapes, npdts)],
            )
        except Exception:
            return ('xla',)
        struct = cell['struct']
        target = np.broadcast_shapes(*shapes)
        if not out_leaves or any(
            o.shape != target or np.dtype(o.dtype) != np.dtype(np.float32)
            for o in out_leaves
        ):
            return ('xla',)
        n_out = len(out_leaves)
        tile_g = self._tile_fn(n_out)

        @jax.jit
        def run(*arrays):
            return pallas_map.stream_map_multi(
                tile_g, arrays, (np.float32,) * n_out
            )

        return ('stream', run, struct)

    def __call__(self, *args):
        args = tuple(
            from_numpy(a) if isinstance(a, np.ndarray) else a for a in args
        )
        if not args or not all(isinstance(a, Tensor) for a in args):
            raise RuntimeError(
                'dsc.map takes one or more Tensor/ndarray arguments '
                '(bake scalar constants into the function body)'
            )
        key = tuple(
            (a._shape, a._dtype, a._planar is not None) for a in args
        )
        prog = self._programs.get(key)
        if prog is None:
            prog = self._make_program(args)
            while len(self._programs) >= _max_programs():
                self._programs.popitem(last=False)
            self._programs[key] = prog
        else:
            self._programs.move_to_end(key)
        if prog[0] == 'xla':
            return self._fallback(*args)
        _, run, struct = prog
        with tracing.trace_op(
            f'map:{self._name}', 'op;map', {'n_args': len(args)}
        ) as holder:
            try:
                outs = run(*[a.jax for a in args])
            except Exception:
                # an op in fn has no kernel-trace lowering (raw-table
                # miss etc.) — downgrade this signature to the XLA path
                self._programs[key] = ('xla',)
                return self._fallback(*args)
            if holder is not None and outs:
                holder.result = outs[0]
        return _unflatten_result(struct, iter(outs))

    @property
    def n_programs(self) -> int:
        return len(self._programs)


def map(fn, *tensors):  # noqa: A001 — public name, mirrors dsc.compile
    """Fuse an elementwise Tensor pipeline into ONE streaming pass.

    ``dsc.map(fn)`` returns a reusable wrapper; ``dsc.map(fn, x, y)``
    applies immediately. ``fn`` must be ELEMENTWISE — every output
    element depends only on the same-position input elements (chained
    +-*/, clip, transcendentals; no reductions/FFT/slicing — those
    compose under ``dsc.compile`` instead). Eager chains pay one HBM
    read+write per op; under ``dsc.map`` the whole chain runs inside the
    DMA-streaming kernel (ops/pallas_map.py), touching HBM once each
    way — e.g. ``dsc.map(lambda x: dsc.clip(x * 2.0 + 1.0, 0.0))`` is a
    single pass instead of three. The reference has no analog (its ops
    are one C call each); this is the TPU-native fusion the VPU makes
    free.

    Operand shapes follow the streaming eligibility rules (f32, dense,
    full/scalar/broadcast-row mixes); anything else — including every
    shape on non-TPU backends — falls back to one fused XLA program with
    identical semantics (a private ``dsc.compile`` of the same fn)."""
    wrapper = _Mapped(fn)
    if tensors:
        return wrapper(*tensors)
    return wrapper
