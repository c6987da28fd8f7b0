"""STFT / spectrogram pipeline (BASELINE.json config 4: sliding-window rfft
+ |.|^2 + log over streaming audio, traced end-to-end with dsc.profile()).

Framing uses a strided gather expressed as reshape+slice so XLA lowers it to
pure data movement; the window multiply fuses into the rfft input pass.
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


@partial(
    jax.jit,
    static_argnames=('frame', 'hop', 'n_frames', 'spec', 'fft_n', 'log_eps'),
)
def _stft_program(x, window, tables, frame, hop, n_frames, spec, fft_n,
                  log_eps):
    """The whole pipeline (frame -> window -> rfft -> power -> log) as ONE
    XLA program: framing lowers to pure data movement that feeds the rfft
    input pass directly, and the power/log epilogue fuses into the last
    FFT stage's output — one device dispatch per call."""
    idx = jnp.arange(n_frames) * hop
    frames = jax.vmap(lambda i: jax.lax.dynamic_slice(x, (i,), (frame,)))(idx)
    fx = frames * window[None, :]
    z = fft_core.rfft_batched(fx, spec, tables, fft_n)
    power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    if log_eps is not None:
        power = jnp.log(power + log_eps)
    return power


class STFT:
    """Short-time Fourier transform producing (log-)power spectrograms."""

    def __init__(
        self,
        frame: int = 1024,
        hop: int = 256,
        window: str = 'hann',
        log: bool = True,
        log_eps: float = 1e-10,
    ):
        self.frame = frame
        self.hop = hop
        self.fft_n = fft_plan.next_pow2(frame)
        self.log_eps = log_eps if log else None
        if window == 'hann':
            win = np.hanning(frame)
        elif window == 'blackman':
            win = np.blackman(frame)
        elif window in (None, 'rect'):
            win = np.ones(frame)
        else:
            raise RuntimeError(f'unknown window {window!r}')
        self._window = jnp.asarray(win.astype(np.float32))

    def __call__(self, x: Tensor) -> Tensor:
        """x: (n,) f32 -> (n_frames, fft_n//2+1) f32 (log-)power."""
        n = x.shape[-1]
        if n < self.frame:
            raise RuntimeError(f'signal ({n}) shorter than frame ({self.frame})')
        n_frames = 1 + (n - self.frame) // self.hop
        spec, tables = fft_plan.get_plan(self.fft_n, 'real', np.complex64)
        with tracing.trace_op(
            'stft', 'op;pipeline', tracing.tensor_args(x=x)
        ) as tr:
            out = _stft_program(
                x.jax, self._window, tables, self.frame, self.hop,
                n_frames, spec, self.fft_n, self.log_eps,
            )
            if tr:
                tr.result = out
        return Tensor._from_jax(out)


def spectrogram(x: Tensor, frame: int = 1024, hop: int = 256, **kw) -> Tensor:
    return STFT(frame=frame, hop=hop, **kw)(x)
