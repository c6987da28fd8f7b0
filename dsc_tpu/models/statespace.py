"""State-space systems: tf2ss / ss2tf / cont2discrete and the
lsim / dlsim / step / impulse simulators.

scipy.signal semantics throughout. Representation conversions and
discretization are host f64 (design-time tier, like the filter
designers) — including a from-scratch Pade scaling-and-squaring matrix
exponential for the zoh/foh/impulse maps. The SIMULATION recurrence
x[k+1] = A x[k] + B u[k] is the hot path, and it runs ON DEVICE as a
``lax.associative_scan`` over affine (M, v) pairs — the same log-depth
parallelization as the IIR engine (models/iir.py), so a length-n
simulation is O(log n) scan steps of small matmuls instead of an n-step
sequential loop, and it GSPMD-partitions over batched inputs unchanged.

``dlsim`` accepts NumPy arrays or dsc Tensors for ``u`` (Tensor keeps
everything device-resident); ``lsim``/``step``/``impulse`` discretize
(zoh/foh) then ride the same scan.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracing
from ..tensor import Tensor
from .lti import normalize, tf2zpk, zpk2tf


def _expm(m: np.ndarray) -> np.ndarray:
    """Matrix exponential via Pade(13) scaling-and-squaring (the
    Higham 2005 algorithm, f64 host). Good to ~1e-14 for the
    well-scaled discretization blocks this module builds."""
    m = np.asarray(m, np.float64)
    norm = np.linalg.norm(m, 1)
    s = max(0, int(np.ceil(np.log2(norm / 5.4))) if norm > 5.4 else 0)
    a = m / (2.0 ** s)
    b = (64764752532480000., 32382376266240000., 7771770303897600.,
         1187353796428800., 129060195264000., 10559470521600.,
         670442572800., 33522128640., 1323241920., 40840800., 960960.,
         16380., 182., 1.)
    ident = np.eye(a.shape[0])
    a2 = a @ a
    a4 = a2 @ a2
    a6 = a4 @ a2
    u = a @ (a6 @ (b[13] * a6 + b[11] * a4 + b[9] * a2)
             + b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * ident)
    v = a6 @ (b[12] * a6 + b[10] * a4 + b[8] * a2) \
        + b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * ident
    r = np.linalg.solve(v - u, v + u)
    for _ in range(s):
        r = r @ r
    return r


def tf2ss(b, a):
    """Transfer function -> controller-canonical state space
    (scipy.signal.tf2ss): A (n,n), B (n,1), C (1,n), D (1,1)."""
    b, a = normalize(b, a)
    n = a.size - 1
    if n == 0:
        return (np.zeros((0, 0)), np.zeros((0, 1)), np.zeros((1, 0)),
                np.asarray([[b[0]]]))
    bf = np.zeros(n + 1)
    bf[n + 1 - b.size:] = b
    d = bf[0]
    A = np.zeros((n, n))
    A[0, :] = -a[1:]
    A[1:, :-1] = np.eye(n - 1)
    B = np.zeros((n, 1))
    B[0, 0] = 1.0
    C = (bf[1:] - d * a[1:])[None, :]
    D = np.asarray([[d]])
    return A, B, C, D


def ss2tf(A, B, C, D):
    """State space -> transfer function (scipy.signal.ss2tf for the
    first input): num (n_out, n+1), den (n+1,), via the
    det-identity num_k = poly(A - B C_k) + (D_k - 1) poly(A)."""
    A = np.atleast_2d(np.asarray(A, np.float64))
    B = np.atleast_2d(np.asarray(B, np.float64))
    C = np.atleast_2d(np.asarray(C, np.float64))
    D = np.atleast_2d(np.asarray(D, np.float64))
    if B.shape[1] != 1:
        raise RuntimeError('ss2tf: single-input systems only (B is (n, 1))')
    den = np.poly(A) if A.size else np.ones(1)
    nout = C.shape[0]
    num = np.empty((nout, den.size))
    for k in range(nout):
        ck = C[k:k + 1, :]
        dk = D[k, 0]
        if A.size:
            num[k] = np.poly(A - B @ ck) + (dk - 1.0) * den
        else:
            num[k] = np.asarray([dk])
    return num, den


def zpk2ss(z, p, k):
    """(z, p, k) -> state space (scipy.signal.zpk2ss)."""
    return tf2ss(*zpk2tf(z, p, k))


def ss2zpk(A, B, C, D):
    """State space -> (z, p, k) (scipy.signal.ss2zpk, first output)."""
    num, den = ss2tf(A, B, C, D)
    return tf2zpk(num[0], den)


def _as_ss(system):
    """Normalize a scipy-style system spec to (A, B, C, D [, dt])."""
    if isinstance(system, (tuple, list)):
        if len(system) == 2:
            return tf2ss(*system)
        if len(system) == 3:
            return zpk2ss(*system)
        if len(system) in (4, 5):
            out = tuple(np.atleast_2d(np.asarray(m, np.float64))
                        for m in system[:4])
            return out + tuple(system[4:])
    raise RuntimeError(
        'expected a (b, a), (z, p, k), (A, B, C, D) or (A, B, C, D, dt) '
        'system tuple')


def cont2discrete(system, dt: float, method: str = 'zoh',
                  alpha: Optional[float] = None):
    """Continuous -> discrete state space (scipy.signal.cont2discrete):
    methods 'zoh' (default), 'foh', 'impulse', 'euler'/'forward_diff',
    'backward_diff', 'bilinear'/'tustin', 'gbt' (with ``alpha``).
    Accepts (b, a) / (z, p, k) / (A, B, C, D); returns the discretized
    system in the SAME representation with dt appended (tf and zpk
    inputs convert through state space, like scipy)."""
    kind = len(system) if isinstance(system, (tuple, list)) else 0
    A, B, C, D = _as_ss(system)[:4]
    n = A.shape[0]
    if method in ('bilinear', 'tustin'):
        method, alpha = 'gbt', 0.5
    elif method in ('euler', 'forward_diff'):
        method, alpha = 'gbt', 0.0
    elif method == 'backward_diff':
        method, alpha = 'gbt', 1.0
    if method == 'gbt':
        if alpha is None or not 0 <= alpha <= 1:
            raise RuntimeError('cont2discrete: gbt needs alpha in [0, 1]')
        ima = np.eye(n) - alpha * dt * A
        ad = np.linalg.solve(ima, np.eye(n) + (1.0 - alpha) * dt * A)
        bd = np.linalg.solve(ima, dt * B)
        cd = np.linalg.solve(ima.T, C.T).T
        dd = D + alpha * (C @ bd)
    elif method == 'zoh':
        blk = np.zeros((n + B.shape[1], n + B.shape[1]))
        blk[:n, :n] = A * dt
        blk[:n, n:] = B * dt
        em = _expm(blk)
        ad, bd = em[:n, :n], em[:n, n:]
        cd, dd = C, D
    elif method == 'foh':
        nb = B.shape[1]
        blk = np.zeros((n + 2 * nb, n + 2 * nb))
        blk[:n, :n] = A * dt
        blk[:n, n:n + nb] = B * dt
        blk[n:n + nb, n + nb:] = np.eye(nb)
        em = _expm(blk)
        ad = em[:n, :n]
        g2 = em[:n, n + nb:]  # Gamma2 / dt
        g1 = em[:n, n:n + nb]  # Gamma1
        bd = g1 + ad @ g2 - g2
        cd = C
        dd = D + C @ g2
    elif method == 'impulse':
        if not np.allclose(D, 0.0):
            raise RuntimeError('cont2discrete: impulse needs D == 0')
        ad = _expm(A * dt)
        bd = ad @ B * dt
        cd, dd = C, C @ B * dt
    else:
        raise RuntimeError(f'cont2discrete: unknown method {method!r}')
    if kind == 2:
        num, den = ss2tf(ad, bd, cd, dd)
        return num, den, dt
    if kind == 3:
        z, p, k = ss2zpk(ad, bd, cd, dd)
        return z, p, k, dt
    return ad, bd, cd, dd, dt


@partial(jax.jit, static_argnames=())
def _dlsim_scan(ad, bu, x0):
    """All states of x[k+1] = A x[k] + bu[k] from x[0] = x0, as a
    log-depth associative scan over affine maps (M, v):
    (M2, v2) o (M1, v1) = (M2 M1, M2 v1 + v2). bu is (steps, n)."""
    steps, n = bu.shape
    ms = jnp.broadcast_to(ad[None], (steps, n, n))
    # fold x0 into the first element so the scan yields x[1..steps]
    vs = bu.at[0].add(ad @ x0)
    hp = jax.lax.Precision.HIGHEST  # default bf16 compounds over the scan
    mm, vv = jax.lax.associative_scan(
        lambda a, b: (jnp.einsum('snm,smk->snk', b[0], a[0], precision=hp),
                      jnp.einsum('snm,sm->sn', b[0], a[1],
                                 precision=hp) + b[1]),
        (ms, vs))
    del mm
    return vv  # (steps, n): x[1..steps]


def dlsim(system, u, t=None, x0=None):
    """Simulate a discrete-time system (scipy.signal.dlsim semantics):
    ``system`` is (A, B, C, D, dt) (or (num, den, dt) / (z, p, k, dt),
    converted). ``u`` is (steps,) or (steps, n_inputs), NumPy or dsc
    Tensor. Returns (tout, yout, xout) NumPy arrays — or, when ``u`` is
    a Tensor, yout/xout come back as Tensors with the recurrence run on
    device via the log-depth affine scan."""
    if not isinstance(system, (tuple, list)) or len(system) not in (3, 4, 5):
        raise RuntimeError('dlsim: expected a system tuple ending in dt')
    dt = float(system[-1])
    if len(system) == 3:
        A, B, C, D = tf2ss(system[0], system[1])
    elif len(system) == 4:
        A, B, C, D = zpk2ss(system[0], system[1], system[2])
    else:
        A, B, C, D = (np.atleast_2d(np.asarray(m, np.float64))
                      for m in system[:4])
    device_io = isinstance(u, Tensor)
    uj = u.jax if device_io else jnp.asarray(np.asarray(u, np.float64))
    if uj.ndim == 1:
        uj = uj[:, None]
    steps = uj.shape[0]
    if uj.shape[1] != B.shape[1]:
        raise RuntimeError(
            f'dlsim: u has {uj.shape[1]} inputs, B expects {B.shape[1]}')
    n = A.shape[0]
    x0v = np.zeros(n) if x0 is None else np.asarray(x0, np.float64).ravel()
    if x0v.size != n:
        raise RuntimeError(f'dlsim: x0 must have {n} entries')
    with tracing.trace_op('dlsim', 'op;pipeline',
                          {'steps': steps, 'n': n}) as tr:
        uj = uj.astype(jnp.float64)
        bu = uj @ jnp.asarray(B.T)  # (steps, n)
        if n:
            xs_tail = _dlsim_scan(jnp.asarray(A), bu[:-1],
                                  jnp.asarray(x0v)) if steps > 1 else \
                jnp.zeros((0, n))
            xs = jnp.concatenate([jnp.asarray(x0v)[None], xs_tail], axis=0)
        else:
            xs = jnp.zeros((steps, 0))
        ys = xs @ jnp.asarray(C.T) + uj @ jnp.asarray(D.T)
        if tr:
            tr.result = ys
    tout = np.arange(steps) * dt if t is None else np.asarray(t)[:steps]
    if device_io:
        return tout, Tensor._from_jax(ys.astype(jnp.float32)), \
            Tensor._from_jax(xs.astype(jnp.float32))
    return tout, np.asarray(ys), np.asarray(xs)


def dstep(system, x0=None, n: int = 100):
    """Discrete step response (scipy.signal.dstep): returns (t, y)
    with y a 1-D array (single-output systems)."""
    u = np.ones((n, 1))
    tout, y, _ = dlsim(_dl_tuple(system), u, x0=x0)
    return tout, y[:, 0]


def _dl_tuple(system):
    if not isinstance(system, (tuple, list)):
        raise RuntimeError('expected a discrete system tuple ending in dt')
    if len(system) == 3:
        A, B, C, D = tf2ss(system[0], system[1])
    elif len(system) == 4:
        A, B, C, D = zpk2ss(system[0], system[1], system[2])
    elif len(system) == 5:
        return system
    else:
        raise RuntimeError('expected a discrete system tuple ending in dt')
    return (A, B, C, D, float(system[-1]))


def dimpulse(system, x0=None, n: int = 100):
    """Discrete impulse response (scipy.signal.dimpulse): (t, y)."""
    u = np.zeros((n, 1))
    u[0, 0] = 1.0
    tout, y, _ = dlsim(_dl_tuple(system), u, x0=x0)
    return tout, y[:, 0]


def lsim(system, U, T, X0=None, interp: bool = True):
    """Simulate a continuous-time LTI system over uniformly spaced times
    (scipy.signal.lsim semantics): first-order-hold input interpolation
    by default (``interp=True``), zero-order hold otherwise. Returns
    (T, yout, xout); the recurrence runs through the device scan."""
    A, B, C, D = _as_ss(system)[:4]
    T = np.asarray(T, np.float64)
    if T.ndim != 1 or T.size < 2:
        raise RuntimeError('lsim: T must be 1-D with >= 2 points')
    dts = np.diff(T)
    if not np.allclose(dts, dts[0], rtol=1e-6):
        raise RuntimeError('lsim: T must be uniformly spaced')
    dt = float(dts[0])
    U = np.asarray(U, np.float64)
    if U.ndim == 1:
        U = U[:, None]
    if U.shape[0] != T.size:
        raise RuntimeError('lsim: U and T lengths differ')
    method = 'foh' if interp else 'zoh'
    ad, bd, cd, dd, _ = cont2discrete((A, B, C, D), dt, method=method)
    tout, y, x = dlsim((ad, bd, cd, dd, dt), U, x0=X0)
    return T, y[:, 0] if y.shape[1] == 1 else y, x


def step(system, X0=None, T=None, N: int = 100):
    """Continuous step response (scipy.signal.step): (T, yout).
    Uses zero-order hold like scipy (its step calls lsim with
    interp=False)."""
    A, B, C, D = _as_ss(system)[:4]
    if T is None:
        T = _default_T(A, N)
    T = np.asarray(T, np.float64)
    _, y, _ = lsim((A, B, C, D), np.ones((T.size, B.shape[1])), T, X0=X0,
                   interp=False)
    return T, y


def impulse(system, X0=None, T=None, N: int = 100):
    """Continuous impulse response (scipy.signal.impulse): simulated as
    the zero-input response from x0 + B (the delta loads the state)."""
    A, B, C, D = _as_ss(system)[:4]
    if T is None:
        T = _default_T(A, N)
    T = np.asarray(T, np.float64)
    x0 = B[:, 0] if X0 is None else np.asarray(X0, np.float64) + B[:, 0]
    _, y, _ = lsim((A, B, C, D), np.zeros((T.size, B.shape[1])), T, X0=x0)
    return T, y


def _default_T(A: np.ndarray, n: int) -> np.ndarray:
    """scipy's heuristic horizon: 7 time constants of the slowest stable
    mode."""
    if A.size == 0:
        return np.linspace(0, 1, n)
    ev = np.linalg.eigvals(A)
    r = np.min(np.abs(ev.real[ev.real != 0])) if np.any(ev.real != 0) \
        else 1.0
    tc = 1.0 / max(r, 1e-12)
    return np.linspace(0.0, 7.0 * tc, n)
