"""High-resolution tone measurement: czt exact DFT + zoom_fft.

Two things the pow2 FFT grid cannot do directly: (1) the exact DFT of a
non-pow2 recording, (2) resolving two tones 0.4 Hz apart without
computing a million-point spectrum. The chirp-z transform does both —
czt evaluates the exact length-n DFT, zoom_fft spends all m bins on a
50 Hz band of interest.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

import dsc_tpu as dsc
from dsc_tpu.models import czt, zoom_fft

dsc.init(int(2**30))

fs = 1000.0
n = 9000  # 9 s, NOT a power of two
t = np.arange(n) / fs
x = (np.sin(2 * np.pi * 123.400 * t)
     + 0.8 * np.sin(2 * np.pi * 123.800 * t)
     + 0.05 * np.random.default_rng(0).standard_normal(n)).astype(np.float32)
xd = dsc.from_numpy(x)

# exact length-9000 DFT (the public fft would pad to 16384, moving bins)
X = czt(xd)
k = np.argmax(np.abs(X.numpy()[: n // 2]))
print(f'czt exact DFT: strongest bin {k} -> {k * fs / n:.3f} Hz '
      f'(grid step {fs / n:.3f} Hz)')

# zoom: 4096 bins across [100, 150] Hz -> 12.2 mHz grid
m = 4096
z = np.abs(zoom_fft(xd, [100.0, 150.0], m=m, fs=fs).numpy())
freqs = 100.0 + np.arange(m) * 50.0 / m
p1 = int(np.argmax(z))
z2 = z.copy()
z2[max(0, p1 - 16) : p1 + 16] = 0  # mask the first peak's neighborhood
p2 = int(np.argmax(z2))
lo, hi = sorted([freqs[p1], freqs[p2]])
print(f'zoom_fft [100, 150] Hz with {m} bins ({50.0 / m * 1e3:.1f} mHz '
      f'grid): tones at {lo:.3f} Hz and {hi:.3f} Hz')
assert abs(lo - 123.4) < 0.05 and abs(hi - 123.8) < 0.05
print('both tones resolved to within 50 mHz')
