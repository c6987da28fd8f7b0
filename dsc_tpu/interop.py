"""Host<->device interop + dtype-based device routing.

The reference crosses one FFI boundary (Python -> libdsc.so via ctypes,
_bindings.py:31-35); here the boundary is host<->HBM through PJRT. Two
hardware realities shape this module:

1. TPU PJRT transfer paths may not implement complex dtypes (observed:
   complex64 upload AND download raise UNIMPLEMENTED on TPU while complex
   *compute* works fine). All complex transfers are therefore staged as
   planar (real, imag) float pairs, with lax.complex / real+imag split
   executed device-side.

2. TPU has no complex128 compute at all. C64 tensors are routed to the
   host CPU device of the same process (visible via jax.devices('cpu')
   alongside the TPU), keeping full 4-dtype parity with the reference
   (dsc_dtype.h:51-56) on TPU hosts: F32/F64/C32 run on the chip, C64 runs
   on the host. Tests sweep all four dtypes (test_ops.py:42) either way.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_COMPLEX_KINDS = ('c',)


def _is_complex(arr) -> bool:
    return np.dtype(arr.dtype).kind == 'c'


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(c):
    return jnp.real(c), jnp.imag(c)


def _cpu_device():
    return jax.devices('cpu')[0]


def device_for_np_dtype(np_dtype) -> Optional[jax.Device]:
    """Placement rule: complex128 must live on the CPU device when the
    default backend can't compute it. None = default device."""
    if np.dtype(np_dtype) == np.complex128 and jax.default_backend() != 'cpu':
        return _cpu_device()
    return None


def put(host_arr: np.ndarray, device: Optional[jax.Device] = None) -> jax.Array:
    """Upload a host array, staging complex dtypes as planar floats when the
    target device can't transfer them directly."""
    if device is None:
        device = device_for_np_dtype(host_arr.dtype)
    if _is_complex(host_arr) and (device is None or device.platform != 'cpu'):
        re = jax.device_put(np.ascontiguousarray(host_arr.real), device)
        im = jax.device_put(np.ascontiguousarray(host_arr.imag), device)
        return _combine(re, im)
    return jax.device_put(host_arr, device)


def get(arr: jax.Array) -> np.ndarray:
    """Download to host, staging complex through planar floats when needed."""
    if _is_complex(arr):
        dev = next(iter(arr.devices()))
        if dev.platform != 'cpu':
            re, im = _split(arr)
            out = np.asarray(re).astype(_complex_np(arr.dtype))
            out.imag = np.asarray(im)
            return out
    return np.asarray(arr)


def _complex_np(dtype):
    return np.complex64 if np.dtype(dtype) == np.complex64 else np.complex128


def move(arr: jax.Array, device: Optional[jax.Device]) -> jax.Array:
    """Cross-device move; complex arrays hop through planar floats."""
    if device is None:
        return arr
    if device in arr.devices():
        return arr
    if _is_complex(arr):
        re, im = _split(arr)
        re = jax.device_put(re, device)
        im = jax.device_put(im, device)
        return _combine(re, im)
    return jax.device_put(arr, device)


def ensure_placement(arr: jax.Array) -> jax.Array:
    """Move an array to its dtype's home device if it isn't already there."""
    return move(arr, device_for_np_dtype(arr.dtype))
