"""High-level DSP pipelines ("model" layer) for dsc_tpu.

The reference framework has no neural models (SURVEY §0); its flagship
end-to-end workloads are the README filterFFT convolution
(reference README.md:110-137) and the STFT spectrogram pipeline
(BASELINE.json configs 1 and 4). These pipelines are the framework's
model family: stateful, reusable, jit-friendly graphs built on the dsc op
set.
"""

from .czt import CZT, czt, zoom_fft
from .filter_fft import (
    FilterFFT,
    correlate,
    correlate2d,
    fft_convolve,
    fft_convolve2,
)
from .fir import (
    firwin,
    firwin2,
    kaiser_atten,
    kaiser_beta,
    kaiserord,
    minimum_phase,
    savgol_coeffs,
    savgol_filter,
)
from .iir import (
    butter,
    cheby1,
    cheby2,
    decimate,
    filtfilt,
    freqz,
    group_delay,
    lfilter,
    lfilter_zi,
    sosfilt_zi,
    sos2tf,
    sosfilt,
    sosfiltfilt,
    sosfreqz,
    tf2sos,
)
from .iirdesign import (
    bessel,
    buttord,
    cheb1ord,
    cheb2ord,
    ellip,
    ellipord,
    iircomb,
    iirfilter,
    iirnotch,
    iirpeak,
)
from .lti import (
    bilinear,
    deconvolve,
    normalize,
    sos2zpk,
    tf2zpk,
    unit_impulse,
    zpk2sos,
    zpk2tf,
)
from .multitaper import lombscargle, multitaper
from .peaks import (
    argrelextrema,
    argrelmax,
    argrelmin,
    find_peaks,
    peak_prominences,
    peak_widths,
)
from .nonlinear import medfilt, wiener
from .ola import OverlapSave, overlap_save_convolve
from .remez import remez
from .psd import (
    coherence,
    csd,
    detrend,
    periodogram,
    psd_spectrogram,
    welch,
)
from .spectral import hilbert, resample, resample_poly, upfirdn
from .stft import ISTFT, STFT, spectrogram
from .stft_scipy import check_COLA, check_NOLA, istft, stft
from .waveforms import (
    chirp,
    gausspulse,
    max_len_seq,
    sawtooth,
    square,
    sweep_poly,
    vectorstrength,
)

__all__ = [
    'FilterFFT',
    'fft_convolve',
    'fft_convolve2',
    'correlate',
    'correlate2d',
    'OverlapSave',
    'overlap_save_convolve',
    'STFT',
    'ISTFT',
    'spectrogram',
    'stft',
    'istft',
    'check_COLA',
    'check_NOLA',
    'resample',
    'resample_poly',
    'upfirdn',
    'hilbert',
    'detrend',
    'medfilt',
    'wiener',
    'welch',
    'periodogram',
    'csd',
    'coherence',
    'psd_spectrogram',
    'multitaper',
    'lombscargle',
    'find_peaks',
    'peak_prominences',
    'peak_widths',
    'argrelextrema',
    'argrelmax',
    'argrelmin',
    'firwin',
    'firwin2',
    'remez',
    'kaiserord',
    'kaiser_beta',
    'kaiser_atten',
    'savgol_coeffs',
    'savgol_filter',
    'butter',
    'cheby1',
    'cheby2',
    'ellip',
    'bessel',
    'iirfilter',
    'buttord',
    'cheb1ord',
    'cheb2ord',
    'ellipord',
    'iirnotch',
    'iirpeak',
    'iircomb',
    'decimate',
    'lfilter',
    'sosfilt',
    'sosfiltfilt',
    'filtfilt',
    'lfilter_zi',
    'sosfilt_zi',
    'tf2sos',
    'sos2tf',
    'tf2zpk',
    'zpk2tf',
    'sos2zpk',
    'zpk2sos',
    'normalize',
    'bilinear',
    'deconvolve',
    'unit_impulse',
    'sosfreqz',
    'freqz',
    'group_delay',
    'CZT',
    'czt',
    'zoom_fft',
    'chirp',
    'square',
    'sawtooth',
    'gausspulse',
    'sweep_poly',
    'max_len_seq',
    'vectorstrength',
    'minimum_phase',
]
