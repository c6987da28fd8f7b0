"""dsc_tpu.transforms — the scipy.fft-parity tier.

Exact-length transforms for ANY n (the dsc FFT surface keeps the
reference's pad-to-pow2 identity, reference dsc.cpp:2023-2028; this tier
mirrors scipy.fft instead): the full DFT family with norms and n-D
variants, DCT/DST types 1-4, shifts, and fast-length helpers. scipy.fft
is the executable spec (tests/test_transforms.py); powers of two ride
the planar FFT engine, everything else Bluestein (_dft.py).
"""

from .fftlog import (
    fht,
    fhtoffset,
    ifht,
)
from .trig import (
    dct,
    dctn,
    dst,
    dstn,
    idct,
    idctn,
    idst,
    idstn,
)
from .exact import (
    fft,
    get_workers,
    set_workers,
    fft2,
    fftfreq,
    fftn,
    fftshift,
    hfft,
    hfft2,
    hfftn,
    ifft,
    ifft2,
    ifftn,
    ifftshift,
    ihfft,
    ihfft2,
    ihfftn,
    irfft,
    irfft2,
    irfftn,
    next_fast_len,
    prev_fast_len,
    rfft,
    rfft2,
    rfftfreq,
    rfftn,
)

__all__ = [
    'fft', 'ifft', 'rfft', 'irfft', 'hfft', 'ihfft',
    'fft2', 'ifft2', 'rfft2', 'irfft2', 'hfft2', 'ihfft2',
    'fftn', 'ifftn', 'rfftn', 'irfftn', 'hfftn', 'ihfftn',
    'fftshift', 'ifftshift', 'fftfreq', 'rfftfreq',
    'next_fast_len', 'prev_fast_len',
    'dct', 'idct', 'dst', 'idst',
    'dctn', 'idctn', 'dstn', 'idstn',
    'fht', 'ifht', 'fhtoffset',
    'get_workers', 'set_workers',
]
