"""Spectral-gate denoising: STFT -> magnitude mask -> ISTFT.

End-to-end demo of the invertible STFT surface (dsc_tpu.models.STFT
mode='complex' + ISTFT): a noisy tone is transformed to the
time-frequency plane, bins below a noise-floor estimate are attenuated
on the complex spectrogram with public Tensor ops, and the signal is
reconstructed by windowed overlap-add. The mask arithmetic runs on the
planar complex spectrogram exactly like the reference's filterFFT
spectrum multiply (reference README.md:110-137) — no dense complex
materialization anywhere.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

import dsc_tpu as dsc
from dsc_tpu.models import ISTFT, STFT

dsc.init(int(2**30))

fs = 16_000.0
n = 4 * 16_000
rng = np.random.default_rng(7)
t = np.arange(n, dtype=np.float32) / fs
clean = (0.8 * np.sin(2 * np.pi * 440.0 * t)
         + 0.4 * np.sin(2 * np.pi * 1320.0 * t)).astype(np.float32)
noisy = clean + 0.25 * rng.standard_normal(n).astype(np.float32)

frame, hop = 512, 128
stft = STFT(frame=frame, hop=hop, window='hann', mode='complex')
istft = ISTFT(frame=frame, hop=hop, window='hann')

Z = stft(dsc.from_numpy(noisy))                    # (n_frames, 257) c32

# per-frame noise floor: mean |Z| ACROSS BINS (noise spreads its energy
# over all 257 bins, the tones concentrate theirs in a few, so tone bins
# sit far above the mean), then a soft gate on bins > 2x the floor
mag = dsc.absolute(Z)                              # f32, same shape
floor = dsc.mean(mag, axis=1, keepdims=True)       # (n_frames, 1)
gate = dsc.clip(dsc.sub(dsc.true_div(mag, floor), 2.0), 0.0, 1.0)
Zc = dsc.mul(Z, gate)                              # mask the c32 spectrogram

den = istft(Zc, length=n).numpy()

# SNR improvement over the valid interior (OLA edges excluded)
sl = slice(frame, n - frame)
snr = lambda x: 10 * np.log10(  # noqa: E731
    float(np.sum(clean[sl] ** 2))
    / max(float(np.sum((x[sl] - clean[sl]) ** 2)), 1e-12)
)
print(f'input SNR:    {snr(noisy):6.1f} dB')
print(f'denoised SNR: {snr(den):6.1f} dB')
assert snr(den) > snr(noisy) + 6.0, 'spectral gate should gain >= 6 dB'
print('ok: spectral gate recovered the tones')
