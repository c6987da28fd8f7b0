"""Power spectral density estimators: ``periodogram`` and ``welch``.

The reference stops at the raw FFT family (dsc.h:384-424) and leaves PSD
estimation to the user; these run the classic estimators as ONE jitted
program each (frame -> detrend -> window -> rfft -> |.|^2 -> average ->
scale), with scipy.signal semantics as the executable specification.
Framing reuses the STFT's dense shifted-slice formulation (pure data
movement XLA fuses into the rfft input pass) and all segments ride the
batched FFT engine as one pass.

Power-of-two segment lengths only: the dsc FFT identity is "sizes round
up to the next power of two" (reference dsc.cpp:2023-2028), and silently
padding a PSD segment would change the estimate — so non-pow2 raises.
Unlike scipy, a signal shorter than ``nperseg`` raises instead of
auto-shrinking the segment (fail-fast, reference DSC_ASSERT ethos).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracing
from ..fourier import core as fft_core
from ..fourier import plan as fft_plan
from ..tensor import Tensor
from ..windows import design_window
from .stft import _frame_dense, _make_window


def _spectral_window(window, nperseg: int) -> np.ndarray:
    """Window spec -> f32 host array under scipy.signal's PSD convention:
    named windows are PERIODIC (``get_window(..., fftbins=True)``), i.e.
    the length-(n+1) symmetric window with the last sample dropped — not
    the symmetric np.* forms the STFT models use. Accepts every
    scipy.signal.get_window name / (name, *params) tuple / bare kaiser
    beta via ``dsc_tpu.windows.design_window``; Tensors and array-likes
    pass through as given."""
    if isinstance(window, str) or (
        isinstance(window, tuple) and window
        and isinstance(window[0], str)
    ) or (isinstance(window, (int, float))
          and not isinstance(window, bool)):
        return design_window(window, nperseg,
                             fftbins=True).astype(np.float32)
    return _make_window(window, nperseg)


def _median_bias(n: int) -> float:
    """Bias of the median of n chi^2_2 variates relative to their mean
    (scipy.signal._spectral_py._median_bias)."""
    ii_2 = 2.0 * np.arange(1.0, (n - 1) // 2 + 1)
    return float(1.0 + np.sum(1.0 / (ii_2 + 1.0) - 1.0 / ii_2))


def _detrend_segs(segs, nperseg: int, detrend: str):
    """Per-segment detrend: 'constant' subtracts the mean, 'linear' a
    closed-form least-squares line fit over k=0..nperseg-1."""
    if detrend == 'constant':
        return segs - jnp.mean(segs, axis=-1, keepdims=True)
    if detrend == 'linear':
        k = jnp.arange(nperseg, dtype=segs.dtype)
        kc = k - (nperseg - 1) / 2.0
        denom = jnp.sum(kc * kc)
        slope = jnp.sum(segs * kc, axis=-1, keepdims=True) / denom
        mean = jnp.mean(segs, axis=-1, keepdims=True)
        return segs - (mean + slope * kc)
    return segs


@partial(
    jax.jit,
    static_argnames=('nperseg', 'hop', 'n_frames', 'spec', 'detrend',
                     'average'),
)
def _welch_program(x, window, tables, scale, bias, nperseg, hop, n_frames,
                   spec, detrend, average):
    """(b, n) real -> (b, nperseg//2+1) PSD. One XLA program."""
    segs = _frame_dense(x, nperseg, hop, n_frames)  # (b, n_frames, nperseg)
    segs = _detrend_segs(segs, nperseg, detrend)
    fx = (segs * window[None, None, :]).reshape(-1, nperseg)
    z = fft_core.rfft_batched(fx, spec, tables, nperseg)
    power = (jnp.real(z) ** 2 + jnp.imag(z) ** 2).reshape(
        x.shape[0], n_frames, -1
    )
    if average == 'median':
        pxx = jnp.median(power, axis=1) / bias
    else:
        pxx = jnp.mean(power, axis=1)
    # one-sided doubling: every bin but DC and Nyquist carries its mirror
    pxx = pxx * scale
    return pxx.at[:, 1:-1].mul(2.0)


@partial(
    jax.jit,
    static_argnames=('nperseg', 'hop', 'n_frames', 'spec', 'detrend',
                     'mode'),
)
def _csd_program(x, y, window, tables, scale, nperseg, hop, n_frames, spec,
                 detrend, mode='csd'):
    """(b, n) real pairs -> (re, im) planes of the (b, nperseg//2+1)
    cross-spectral density mean(conj(X)*Y) (``mode='csd'``), or the real
    magnitude-squared coherence |Pxy|^2/(Pxx*Pyy) (``mode='coherence'``).
    One XLA program; both signals' segments ride the batched FFT engine
    together as one 2*b*n_frames-row pass."""
    segs = _frame_dense(jnp.concatenate([x, y], axis=0), nperseg, hop,
                        n_frames)
    segs = _detrend_segs(segs, nperseg, detrend)
    fx = (segs * window[None, None, :]).reshape(-1, nperseg)
    z = fft_core.rfft_batched(fx, spec, tables, nperseg)
    b = x.shape[0]
    zx = z[: b * n_frames].reshape(b, n_frames, -1)
    zy = z[b * n_frames :].reshape(b, n_frames, -1)
    # conj(X)*Y on real planes
    re = jnp.mean(
        jnp.real(zx) * jnp.real(zy) + jnp.imag(zx) * jnp.imag(zy), axis=1
    )
    im = jnp.mean(
        jnp.real(zx) * jnp.imag(zy) - jnp.imag(zx) * jnp.real(zy), axis=1
    )
    if mode == 'coherence':
        # the scale and one-sided doubling cancel in the ratio
        pxx = jnp.mean(jnp.real(zx) ** 2 + jnp.imag(zx) ** 2, axis=1)
        pyy = jnp.mean(jnp.real(zy) ** 2 + jnp.imag(zy) ** 2, axis=1)
        return (re * re + im * im) / (pxx * pyy)
    re = re * scale
    im = im * scale
    return re.at[:, 1:-1].mul(2.0), im.at[:, 1:-1].mul(2.0)


def _psd_args(x, who, nperseg, noverlap, scaling, detrend):
    if x.n_dim > 2:
        raise RuntimeError(f'{who}: expected a 1-D or 2-D signal, got {x.n_dim}-D')
    if x.dtype.is_complex:
        raise RuntimeError(f'{who} expects a real signal')
    if nperseg < 2 or nperseg & (nperseg - 1):
        raise RuntimeError(
            f'{who}: nperseg ({nperseg}) is not a power of two (the dsc '
            'FFT family is power-of-two)'
        )
    n = x.shape[-1]
    if n < nperseg:
        raise RuntimeError(f'{who}: signal ({n}) shorter than nperseg ({nperseg})')
    if noverlap is None:
        noverlap = nperseg // 2
    if not 0 <= noverlap < nperseg:
        raise RuntimeError(f'{who}: noverlap ({noverlap}) must be in [0, nperseg)')
    if scaling not in ('density', 'spectrum'):
        raise RuntimeError(f'{who}: unknown scaling {scaling!r}')
    if detrend in (False, None):
        detrend = 'none'
    if detrend not in ('constant', 'linear', 'none'):
        raise RuntimeError(f'{who}: unknown detrend {detrend!r}')
    hop = nperseg - noverlap
    return n, hop, 1 + (n - nperseg) // hop, detrend


def _psd_scale(win: np.ndarray, fs: float, scaling: str) -> float:
    w64 = win.astype(np.float64)
    if scaling == 'density':
        return 1.0 / (fs * float(np.sum(w64 * w64)))
    return 1.0 / float(np.sum(w64)) ** 2


def welch(
    x: Tensor,
    fs: float = 1.0,
    window='hann',
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    detrend='constant',
    scaling: str = 'density',
    average: str = 'mean',
) -> tuple:
    """Welch average-periodogram PSD estimate (scipy.signal.welch
    semantics, one-sided). x: (n,) or (batch, n) real; ``nperseg`` a
    power of two. Returns ``(f, Pxx)`` Tensors: f is (nperseg//2+1,)
    sample frequencies, Pxx is (nperseg//2+1,) (or batched) in units of
    V**2/Hz (``scaling='density'``) or V**2 (``'spectrum'``)."""
    if average not in ('mean', 'median'):
        raise RuntimeError(f'welch: unknown average {average!r}')
    n, hop, n_frames, detrend = _psd_args(
        x, 'welch', nperseg, noverlap, scaling, detrend
    )
    win = _spectral_window(window, nperseg)
    scale = _psd_scale(win, fs, scaling)
    bias = _median_bias(n_frames) if average == 'median' else 1.0
    batched = x.n_dim == 2
    spec, tables = fft_plan.get_plan(nperseg, 'real', np.complex64)
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'welch', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        pxx = _welch_program(
            xj.astype(jnp.float32), jnp.asarray(win), tables,
            np.float32(scale), np.float32(bias), nperseg, hop, n_frames,
            spec, detrend, average,
        )
        if tr:
            tr.result = pxx
    from .. import fourier as _fourier

    f = _fourier.rfftfreq(nperseg, d=1.0 / fs)
    return f, Tensor._from_jax(pxx if batched else pxx[0])


@partial(jax.jit, static_argnames=('kind',))
def _detrend_program(x, kind):
    return _detrend_segs(x[:, None, :], x.shape[-1], kind)[:, 0, :]


def detrend(x: Tensor, type: str = 'linear') -> Tensor:  # noqa: A002
    """Remove the mean (``type='constant'``) or a least-squares line
    (``type='linear'``) from a signal (scipy.signal.detrend semantics
    over the last axis). x: (n,) or (batch, n) real."""
    if type not in ('constant', 'linear'):
        raise RuntimeError(f'detrend: unknown type {type!r}')
    if x.n_dim > 2:
        raise RuntimeError(f'detrend: expected a 1-D or 2-D signal, got {x.n_dim}-D')
    if x.dtype.is_complex:
        raise RuntimeError('detrend expects a real signal')
    batched = x.n_dim == 2
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'detrend', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _detrend_program(xj, type)
        if tr:
            tr.result = out
    return Tensor._from_jax(out if batched else out[0])


def _csd_common(x, y, who, fs, window, nperseg, noverlap, detrend, scaling,
                mode):
    if x.shape != y.shape:
        raise RuntimeError(
            f'{who}: x and y must have the same shape, got {x.shape} vs '
            f'{y.shape}'
        )
    if y.dtype.is_complex:
        raise RuntimeError(f'{who} expects real signals')
    _, hop, n_frames, detrend = _psd_args(
        x, who, nperseg, noverlap, scaling, detrend
    )
    win = _spectral_window(window, nperseg)
    scale = _psd_scale(win, fs, scaling)
    batched = x.n_dim == 2
    spec, tables = fft_plan.get_plan(nperseg, 'real', np.complex64)
    xj = x.jax if batched else x.jax[None, :]
    yj = y.jax if batched else y.jax[None, :]
    with tracing.trace_op(
        who, 'op;pipeline', tracing.tensor_args(x=x, y=y)
    ) as tr:
        out = _csd_program(
            xj.astype(jnp.float32), yj.astype(jnp.float32),
            jnp.asarray(win), tables, np.float32(scale), nperseg, hop,
            n_frames, spec, detrend, mode=mode,
        )
        if tr:
            tr.result = out[0] if mode == 'csd' else out
    return out, batched


def csd(
    x: Tensor,
    y: Tensor,
    fs: float = 1.0,
    window='hann',
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    detrend='constant',
    scaling: str = 'density',
) -> tuple:
    """Cross-spectral density Pxy = mean(conj(X)*Y) over Welch segments
    (scipy.signal.csd semantics, one-sided). x, y: same-shape (n,) or
    (batch, n) real signals; returns ``(f, Pxy)`` with Pxy a c32 Tensor
    stored planar (welch(x) == csd(x, x).real)."""
    from ..planar import Planar

    (re, im), batched = _csd_common(
        x, y, 'csd', fs, window, nperseg, noverlap, detrend, scaling, 'csd'
    )
    from .. import fourier as _fourier

    f = _fourier.rfftfreq(nperseg, d=1.0 / fs)
    if not batched:
        re, im = re[0], im[0]
    return f, Tensor._from_planar(Planar(re, im, tuple(re.shape)))


def coherence(
    x: Tensor,
    y: Tensor,
    fs: float = 1.0,
    window='hann',
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    detrend='constant',
) -> tuple:
    """Magnitude-squared coherence Cxy = |Pxy|^2 / (Pxx*Pyy)
    (scipy.signal.coherence semantics), computed in ONE program — the
    scale and one-sided doubling cancel in the ratio. Returns (f, Cxy)
    real Tensors."""
    cxy, batched = _csd_common(
        x, y, 'coherence', fs, window, nperseg, noverlap, detrend,
        'density', 'coherence',
    )
    from .. import fourier as _fourier

    f = _fourier.rfftfreq(nperseg, d=1.0 / fs)
    return f, Tensor._from_jax(cxy if batched else cxy[0])


@partial(
    jax.jit,
    static_argnames=('nperseg', 'hop', 'n_frames', 'spec', 'detrend',
                     'mode'),
)
def _specgram_program(x, window, tables, scale, nperseg, hop, n_frames,
                      spec, detrend, mode):
    segs = _frame_dense(x, nperseg, hop, n_frames)
    segs = _detrend_segs(segs, nperseg, detrend)
    fx = (segs * window[None, None, :]).reshape(-1, nperseg)
    z = fft_core.rfft_batched(fx, spec, tables, nperseg)
    zr = jnp.real(z).reshape(x.shape[0], n_frames, -1)
    zi = jnp.imag(z).reshape(x.shape[0], n_frames, -1)
    if mode == 'complex':
        srt = jnp.sqrt(scale)
        # (b, bins, frames): scipy's f-by-t orientation
        return (jnp.swapaxes(zr, 1, 2) * srt, jnp.swapaxes(zi, 1, 2) * srt)
    if mode == 'magnitude':
        mag = jnp.sqrt(zr * zr + zi * zi) * jnp.sqrt(scale)
        return jnp.swapaxes(mag, 1, 2)
    pxx = (zr * zr + zi * zi) * scale
    pxx = pxx.at[:, :, 1:-1].mul(2.0)  # one-sided doubling (psd mode)
    return jnp.swapaxes(pxx, 1, 2)


def psd_spectrogram(
    x: Tensor,
    fs: float = 1.0,
    window=('tukey', 0.25),
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    detrend='constant',
    scaling: str = 'density',
    mode: str = 'psd',
) -> tuple:
    """scipy.signal.spectrogram semantics: per-segment one-sided spectra
    with PSD/magnitude/complex scaling, tukey(0.25) default window and
    ``noverlap = nperseg // 8``. Returns ``(f, t, Sxx)`` with Sxx shaped
    (bins, n_frames) — frequency by time, scipy's orientation — plus a
    leading batch dim for (batch, n) input. (The dsc-native
    :func:`~dsc_tpu.models.spectrogram` is the log-power STFT pipeline;
    this is the scipy-parity estimator.)"""
    if mode not in ('psd', 'magnitude', 'complex'):
        raise RuntimeError(f'psd_spectrogram: unknown mode {mode!r}')
    if noverlap is None:
        noverlap = nperseg // 8
    n, hop, n_frames, detrend = _psd_args(
        x, 'psd_spectrogram', nperseg, noverlap, scaling, detrend
    )
    win = _spectral_window(window, nperseg)
    scale = _psd_scale(win, fs, scaling)
    batched = x.n_dim == 2
    spec, tables = fft_plan.get_plan(nperseg, 'real', np.complex64)
    xj = x.jax if batched else x.jax[None, :]
    with tracing.trace_op(
        'psd_spectrogram', 'op;pipeline', tracing.tensor_args(x=x)
    ) as tr:
        out = _specgram_program(
            xj.astype(jnp.float32), jnp.asarray(win), tables,
            np.float32(scale), nperseg, hop, n_frames, spec, detrend, mode,
        )
        if tr:
            tr.result = out[0] if mode == 'complex' else out
    from .. import fourier as _fourier

    f = _fourier.rfftfreq(nperseg, d=1.0 / fs)
    t_np = (np.arange(n_frames) * hop + nperseg / 2.0) / fs
    t = Tensor._from_jax(jnp.asarray(t_np.astype(np.float32)))
    if mode == 'complex':
        from ..planar import Planar

        re, im = out
        if not batched:
            re, im = re[0], im[0]
        return f, t, Tensor._from_planar(Planar(re, im, tuple(re.shape)))
    return f, t, Tensor._from_jax(out if batched else out[0])


def periodogram(
    x: Tensor,
    fs: float = 1.0,
    window=None,
    detrend='constant',
    scaling: str = 'density',
) -> tuple:
    """Single-segment PSD estimate (scipy.signal.periodogram semantics,
    one-sided; scipy's default boxcar window == ``window=None``).
    x: (n,) or (batch, n) real with n a power of two. Returns (f, Pxx)."""
    n = x.shape[-1]
    return welch(
        x, fs=fs, window=window, nperseg=n, noverlap=0, detrend=detrend,
        scaling=scaling,
    )
