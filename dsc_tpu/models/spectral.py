"""FFT-domain signal utilities: ``resample`` and ``hilbert``.

Classic DSP pipelines the reference leaves to the user (its op set stops
at the raw FFT family, dsc.h:384-424); here each runs as ONE jitted
program over the planar rfft/irfft engines — no complex64 materializes
on device and batched input rides the batched FFT engine as one pass.

Both require power-of-two lengths: the dsc FFT identity is "sizes round
up to the next power of two" (dsc.cpp:2023-2028), and silently padding
would change what resample/hilbert compute — so non-pow2 lengths raise
instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracing
from ..fourier import core as fft_core
from ..fourier import plan as fft_plan
from ..planar import Planar
from ..tensor import Tensor


def _check_signal(x: Tensor, who: str) -> tuple:
    if x.n_dim > 2:
        raise RuntimeError(f'{who}: expected a 1-D or 2-D signal, got {x.n_dim}-D')
    n = x.shape[-1]
    if n < 2 or n & (n - 1):
        raise RuntimeError(
            f'{who}: length {n} is not a power of two (the dsc FFT family '
            'is power-of-two; pad/crop explicitly first)'
        )
    return x.n_dim == 2, n


@partial(jax.jit, static_argnames=('n', 'num', 'spec_in', 'spec_out'))
def _resample_program(x, tables_in, tables_out, n, num, spec_in, spec_out):
    """(b, n) real -> (b, num) real, Fourier method (the scipy.signal
    .resample algorithm on the half spectrum): crop or zero-pad the
    spectrum, fold/split the Nyquist bin, inverse, scale by num/n."""
    xr, xi = fft_core.rfft_batched_p(x, spec_in, tables_in, n)
    nb = num // 2 + 1
    if num < n:
        yr, yi = xr[:, :nb], xi[:, :nb]
        # the new Nyquist bin aggregates X[num/2] and its mirror
        # X[n - num/2] = conj(X[num/2]) -> 2*Re (pow2 num is even)
        yr = yr.at[:, -1].set(2.0 * xr[:, num // 2])
        yi = yi.at[:, -1].set(0.0)
    elif num > n:
        pad = nb - (n // 2 + 1)
        yr = jnp.pad(xr, ((0, 0), (0, pad)))
        yi = jnp.pad(xi, ((0, 0), (0, pad)))
        # the old Nyquist energy splits between bin n/2 and its new
        # mirror num - n/2; the half representation stores only bin n/2
        yr = yr.at[:, n // 2].mul(0.5)
        yi = yi.at[:, n // 2].mul(0.5)
    else:
        yr, yi = xr, xi
    y = fft_core.irfft_batched_p(yr, yi, spec_out, tables_out, num)
    return y * np.float32(num / n)


def resample(x: Tensor, num: int) -> Tensor:
    """Resample a real signal to ``num`` samples via the Fourier method
    (scipy.signal.resample semantics). x: (n,) or (batch, n) f32 with n
    and num powers of two; returns (num,) / (batch, num) f32."""
    batched, n = _check_signal(x, 'resample')
    if num < 2 or num & (num - 1):
        raise RuntimeError(f'resample: num ({num}) must be a power of two >= 2')
    if x.dtype.is_complex:
        raise RuntimeError('resample expects a real signal')
    spec_in, tables_in = fft_plan.get_plan(n, 'real', np.complex64)
    spec_out, tables_out = fft_plan.get_plan(num, 'real', np.complex64)
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'resample', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _resample_program(
            xj.astype(jnp.float32), tables_in, tables_out, n, num,
            spec_in, spec_out,
        )
        if tr:
            tr.result = out
    return Tensor._from_jax(out if batched else out[0])


@partial(
    jax.jit,
    static_argnames=('up', 'down', 'n_out', 'spec', 'fft_n', 'hl'),
)
def _resample_poly_program(x, h, tables, up, down, n_out, spec, fft_n, hl):
    """(b, n) real -> (b, n_out) real: zero-stuff by ``up``, convolve
    with the anti-alias taps ``h`` (length 2*hl+1) in the frequency
    domain, pick every ``down``-th sample starting at the filter center
    — upfirdn's polyphase result computed as one batched-FFT program
    (the polyphase decomposition is a serial-loop optimization for CPUs;
    on this hardware the batched planar rfft IS the fast path)."""
    b, n = x.shape
    if up > 1:
        xu = jnp.concatenate(
            [x[:, :, None], jnp.zeros((b, n, up - 1), x.dtype)], axis=2
        ).reshape(b, n * up)
    else:
        xu = x
    xr, xi = fft_core.rfft_batched_p(
        jnp.pad(xu, ((0, 0), (0, fft_n - n * up))), spec, tables, fft_n
    )
    hr, hi = fft_core.rfft_batched_p(
        jnp.pad(h[None, :], ((0, 0), (0, fft_n - h.shape[0]))), spec,
        tables, fft_n,
    )
    yr = xr * hr - xi * hi
    yi = xr * hi + xi * hr
    conv = fft_core.irfft_batched_p(yr, yi, spec, tables, fft_n)
    return conv[:, hl : hl + (n_out - 1) * down + 1 : down]


@partial(
    jax.jit,
    static_argnames=('up', 'down', 'n_out', 'spec', 'fft_n'),
)
def _upfirdn_program(x, h, tables, up, down, n_out, spec, fft_n):
    b, n = x.shape
    if up > 1:
        xu = jnp.concatenate(
            [x[:, :, None], jnp.zeros((b, n, up - 1), x.dtype)], axis=2
        ).reshape(b, n * up)[:, : (n - 1) * up + 1]
    else:
        xu = x
    xr, xi = fft_core.rfft_batched_p(
        jnp.pad(xu, ((0, 0), (0, fft_n - xu.shape[1]))), spec, tables, fft_n
    )
    hr, hi = fft_core.rfft_batched_p(
        jnp.pad(h[None, :], ((0, 0), (0, fft_n - h.shape[0]))), spec,
        tables, fft_n,
    )
    conv = fft_core.irfft_batched_p(
        xr * hr - xi * hi, xr * hi + xi * hr, spec, tables, fft_n
    )
    return conv[:, : (n_out - 1) * down + 1 : down]


def upfirdn(h, x: Tensor, up: int = 1, down: int = 1) -> Tensor:
    """Upsample by ``up``, FIR filter with ``h``, downsample by ``down``
    (scipy.signal.upfirdn semantics, incl. the full-convolution output
    length ceil(((n-1)*up + len(h)) / down)) — computed as one
    batched planar-FFT program, like :func:`resample_poly`."""
    if up < 1 or down < 1:
        raise RuntimeError(
            f'upfirdn: up ({up}) and down ({down}) must be >= 1'
        )
    if x.n_dim > 2:
        raise RuntimeError(
            f'upfirdn: expected a 1-D or 2-D signal, got {x.n_dim}-D'
        )
    if x.dtype.is_complex:
        raise RuntimeError('upfirdn expects a real signal')
    h_np = np.asarray(
        h.numpy() if isinstance(h, Tensor) else h, np.float32
    )
    if h_np.ndim != 1 or h_np.size == 0:
        raise RuntimeError('upfirdn: h must be a nonempty 1-D filter')
    n = x.shape[-1]
    full = (n - 1) * up + len(h_np)
    n_out = -(-full // down)
    fft_n = fft_plan.next_pow2(full)
    spec, tables = fft_plan.get_plan(fft_n, 'real', np.complex64)
    batched = x.n_dim == 2
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'upfirdn', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _upfirdn_program(
            xj.astype(jnp.float32), jnp.asarray(h_np), tables, int(up),
            int(down), n_out, spec, fft_n,
        )
        if tr:
            tr.result = out
    return Tensor._from_jax(out if batched else out[0])


def resample_poly(x: Tensor, up: int, down: int,
                  window=('kaiser', 5.0)) -> Tensor:
    """Polyphase rational-rate resampling
    (scipy.signal.resample_poly semantics): upsample by ``up``, apply a
    zero-phase kaiser-windowed anti-alias FIR (designed by
    :func:`~dsc_tpu.models.firwin` at cutoff 1/max(up, down)), downsample
    by ``down``. Unlike the Fourier :func:`resample`, any positive
    integer rates work — the internal FFT pads to the next power of two.
    x: (n,) or (batch, n) real; returns ceil(n*up/down) samples."""
    import math

    if up < 1 or down < 1:
        raise RuntimeError(
            f'resample_poly: up ({up}) and down ({down}) must be >= 1'
        )
    if x.n_dim > 2:
        raise RuntimeError(
            f'resample_poly: expected a 1-D or 2-D signal, got {x.n_dim}-D'
        )
    if x.dtype.is_complex:
        raise RuntimeError('resample_poly expects a real signal')
    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == 1 and down == 1:
        return x
    from ..dtype import Dtype
    from .fir import firwin

    n = x.shape[-1]
    max_rate = max(up, down)
    if isinstance(window, (str, tuple)) or window is None:
        hl = 10 * max_rate
        h64 = firwin(2 * hl + 1, 1.0 / max_rate, window=window,
                     dtype=Dtype.F64)
        h = (h64 * float(up)).cast(Dtype.F32)
        hj = h.jax
    else:
        # explicit FIR taps (scipy array-window semantics): the window
        # IS the anti-alias filter, scaled by the upsampling gain
        taps = np.asarray(window.numpy() if isinstance(window, Tensor)
                          else window, np.float64) * float(up)
        if taps.ndim != 1 or taps.size < 1:
            raise RuntimeError('resample_poly: window taps must be 1-D')
        hl = (taps.size - 1) // 2
        hj = jnp.asarray(taps.astype(np.float32))
    n_out = -(-n * up // down)
    fft_n = fft_plan.next_pow2(n * up + 2 * hl)
    spec, tables = fft_plan.get_plan(fft_n, 'real', np.complex64)
    batched = x.n_dim == 2
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'resample_poly', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _resample_poly_program(
            xj.astype(jnp.float32), hj, tables, up, down, n_out, spec,
            fft_n, hl,
        )
        if tr:
            tr.result = out
    return Tensor._from_jax(out if batched else out[0])


@partial(jax.jit, static_argnames=('n', 'spec'))
def _hilbert_program(x, tables, n, spec):
    """(b, n) real -> (re, im) planes of the analytic signal. The
    Hilbert transform is the inverse of -i*sign(k)*X, which on the half
    spectrum is (Zr, Zi) = (Im X, -Re X) with DC and Nyquist zeroed —
    one extra irfft, everything real-typed."""
    xr, xi = fft_core.rfft_batched_p(x, spec, tables, n)
    zr = xi.at[:, 0].set(0.0).at[:, -1].set(0.0)
    zi = (-xr).at[:, 0].set(0.0).at[:, -1].set(0.0)
    ht = fft_core.irfft_batched_p(zr, zi, spec, tables, n)
    return x.astype(ht.dtype), ht


def hilbert(x: Tensor) -> Tensor:
    """Analytic signal x + i*HT(x) (scipy.signal.hilbert semantics).
    x: (n,) or (batch, n) f32, n a power of two; returns a c32 tensor of
    the same shape, stored planar (real plane IS the input signal)."""
    batched, n = _check_signal(x, 'hilbert')
    if x.dtype.is_complex:
        raise RuntimeError('hilbert expects a real signal')
    spec, tables = fft_plan.get_plan(n, 'real', np.complex64)
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'hilbert', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        re, im = _hilbert_program(xj.astype(jnp.float32), tables, n, spec)
        if tr:
            tr.result = im
    if not batched:
        re, im = re[0], im[0]
    return Tensor._from_planar(Planar(re, im, tuple(re.shape)))


def hilbert2(x: Tensor) -> Tensor:
    """2-D analytic signal (scipy.signal.hilbert2 semantics):
    ifft2(fft2(x) * h_m x h_n) with the classic 1-D analytic step
    vectors h = [1, 2...2, 1, 0...0] on each axis, composed from the
    public fft2/ifft2 (planar complex engine). x: (m, n) real with
    power-of-two sides; returns a c32 Tensor."""
    from ..fourier import fft2, ifft2
    from ..tensor import from_numpy, mul

    if x.n_dim != 2:
        raise RuntimeError(f'hilbert2: expected a 2-D signal, got {x.n_dim}-D')
    if x.dtype.is_complex:
        raise RuntimeError('hilbert2 expects a real signal')
    m, n = x.shape
    if m & (m - 1) or n & (n - 1) or m < 2 or n < 2:
        raise RuntimeError(
            f'hilbert2: shape {x.shape} must have power-of-two sides')

    def steps(sz):
        # (1 + s(p)) with the modified sign: +1 on positive bins, -1 on
        # negative AND Nyquist (scipy >= 1.17 single-orthant convention)
        h = np.zeros(sz, np.float32)
        h[0] = 1.0
        h[1:sz // 2] = 2.0
        return h

    mask = from_numpy(np.outer(steps(m), steps(n)))
    with tracing.trace_op(
        'hilbert2', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = ifft2(mul(fft2(x), mask))
        if tr:
            tr.result = out.jax
    return out


@partial(jax.jit, static_argnames=('n', 'n_out', 'b0', 'b1', 'squared',
                                   'residual'))
def _envelope_program(x, n, n_out, b0, b1, squared, residual):
    fak = n_out / n
    zf = jnp.fft.rfft(x)  # (b, n//2+1)
    nb = n // 2 + 1
    full = jnp.zeros((x.shape[0], n), jnp.complex128 if
                     x.dtype == jnp.float64 else jnp.complex64)
    full = full.at[:, :nb].set(zf)
    if b0 > 0:
        full = full.at[:, b0:b1].multiply(2.0)
    elif b1 > 0:
        full = full.at[:, 1:b1].multiply(2.0)
    if not (b0 <= 0 < b1):
        zbb = jnp.fft.ifft(full[:, b0:b1], n=n_out, axis=-1) * fak
    else:
        shifted = jnp.fft.fftshift(full, axes=-1)
        zbb = jnp.fft.ifft(shifted[:, b0 + n // 2:b1 + n // 2],
                           n=n_out, axis=-1) * fak
    env = (jnp.real(zbb) ** 2 + jnp.imag(zbb) ** 2) if squared \
        else jnp.abs(zbb)
    if residual is None:
        return env, None
    if not (b0 <= 0 < b1):
        full = full.at[:, b0:b1].set(0.0)
    else:
        full = full.at[:, :b1].set(0.0)
        full = full.at[:, b0:].set(0.0)
    if residual == 'lowpass':
        if b1 > 0:
            full = full.at[:, b1:(n + 1) // 2].set(0.0)
        else:
            full = full.at[:, b0:].set(0.0)
            full = full.at[:, 0:(n + 1) // 2].set(0.0)
    m = min(n, n_out)
    zc = full[:, :n_out // 2 + 1]
    if n_out != n and m % 2 == 0:
        zc = zc.at[:, m // 2].multiply(2.0 if n_out < n else 0.5)
    res = fak * jnp.fft.irfft(zc, n=n_out, axis=-1)
    return env, res


def envelope(z: Tensor, bp_in=(1, None), n_out: Optional[int] = None,
             squared: bool = False, residual: str = 'lowpass'):
    """Envelope + residual of a real signal (scipy.signal.envelope
    semantics): band-limit to the ``bp_in`` bin range, take the
    analytic-signal magnitude (optionally squared, optionally resampled
    to ``n_out``), and return the out-of-band ``residual`` ('lowpass' |
    'all' | None). x: (n,) or (batch, n) real. Returns a stacked
    (2, ...) Tensor of (envelope, residual), or just the envelope when
    ``residual=None``. Uses XLA's native FFT (exact-length bin slicing,
    not the pow2 dsc engine — a parity path, not a hot path)."""
    if z.dtype.is_complex:
        raise RuntimeError('envelope: complex input not supported (the '
                           'real rfft construction)')
    if z.n_dim > 2:
        raise RuntimeError(f'envelope: expected 1-D or 2-D, got {z.n_dim}-D')
    if residual not in ('lowpass', 'all', None):
        raise RuntimeError(f'envelope: unknown residual {residual!r}')
    if len(bp_in) != 2:
        raise RuntimeError('envelope: bp_in must be a 2-tuple')
    n = z.shape[-1]
    n_out = n if n_out is None else int(n_out)
    b0 = bp_in[0] if bp_in[0] is not None else -(n // 2)
    b1 = bp_in[1] if bp_in[1] is not None else (n + 1) // 2
    if not -(n // 2) <= b0 < b1 <= (n + 1) // 2:
        raise RuntimeError(f'envelope: invalid bp_in {bp_in} for n={n}')
    batched = z.n_dim == 2
    xj = z.jax if batched else z.jax[None, :]
    with tracing.trace_op(
        'envelope', 'op;pipeline', tracing.tensor_args(x=z)
    ) as tr:
        env, res = _envelope_program(
            xj.astype(jnp.float32), n, n_out, int(b0), int(b1),
            bool(squared), residual)
        if tr:
            tr.result = env
    if res is None:
        return Tensor._from_jax(env if batched else env[0])
    out = jnp.stack([env, res], axis=0)
    return Tensor._from_jax(out if batched else out[:, 0, :])
