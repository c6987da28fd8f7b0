"""Filter design studio: butter/cheby design -> scan-parallel IIR ->
Welch PSD verification.

End-to-end demo of the IIR model layer: design a Butterworth bandpass
and a Chebyshev-II bandstop from scratch (no scipy), inspect their
responses with sosfreqz, run the filters as log-depth associative scans
on device (sosfilt / zero-phase sosfiltfilt), and verify the result in
the spectrum with dsc's own Welch estimator — then decimate the cleaned
band down to a lower rate.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

import dsc_tpu as dsc
from dsc_tpu.models import butter, cheby2, decimate, sosfiltfilt, sosfreqz, welch

dsc.init(int(2**30))

fs = 8192.0
n = 2**16
rng = np.random.default_rng(0)
t = np.arange(n) / fs
# a wanted 500 Hz tone buried in broadband noise plus 2 kHz interference
sig = (np.sin(2 * np.pi * 500.0 * t)
       + 2.0 * np.sin(2 * np.pi * 2000.0 * t)
       + 0.5 * rng.standard_normal(n)).astype(np.float32)

# 1. design: 6th-order Butterworth bandpass around the wanted tone,
#    5th-order Chebyshev-II notch (40 dB) on the interferer
bp = butter(6, [300.0, 800.0], 'bandpass', fs=fs)
notch = cheby2(5, 40.0, [1800.0, 2200.0], 'bandstop', fs=fs)

w, h = sosfreqz(bp, worN=512, fs=fs)
print(f'bandpass: {bp.shape[0]} sections, '
      f'|H(500 Hz)| = {np.abs(h[np.argmin(np.abs(w - 500))]):.3f}, '
      f'|H(2 kHz)| = {np.abs(h[np.argmin(np.abs(w - 2000))]):.2e}')

# 2. filter on device: zero-phase cascade of both designs (one program
#    per cascade; the recurrence runs as an associative scan)
x = dsc.from_numpy(sig)
clean = sosfiltfilt(np.vstack([bp, notch]), x)

# 3. verify in the spectrum with dsc's own estimator
f, p_in = welch(x, fs=fs, nperseg=2048)
_, p_out = welch(clean, fs=fs, nperseg=2048)
fi = f.numpy()
k500, k2k = np.argmin(np.abs(fi - 500)), np.argmin(np.abs(fi - 2000))
pin, pout = p_in.numpy(), p_out.numpy()
print(f'PSD @500 Hz: {pin[k500]:.3e} -> {pout[k500]:.3e} (kept)')
print(f'PSD @2 kHz:  {pin[k2k]:.3e} -> {pout[k2k]:.3e} '
      f'({10 * np.log10(pout[k2k] / pin[k2k]):.0f} dB)')

# 4. the surviving band lives below 1 kHz — decimate 4x
low_rate = decimate(clean, 4)
print(f'decimated: {clean.shape} @ {fs:.0f} Hz -> {low_rate.shape} '
      f'@ {fs / 4:.0f} Hz')
