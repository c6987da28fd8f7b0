"""Model-layer pipelines vs NumPy references."""

import numpy as np

import dsc_tpu as dsc
from dsc_tpu.models import STFT, FilterFFT, fft_convolve

from conftest import all_close


def test_fft_convolve_full():
    sig = np.random.randn(1000).astype(np.float32)
    taps = np.random.randn(31).astype(np.float32)
    got = fft_convolve(dsc.from_numpy(sig), dsc.from_numpy(taps)).numpy()
    ref = np.convolve(sig, taps)
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_fft_convolve_same():
    sig = np.random.randn(777).astype(np.float32)
    taps = np.random.randn(64).astype(np.float32)
    got = fft_convolve(
        dsc.from_numpy(sig), dsc.from_numpy(taps), mode='same'
    ).numpy()
    ref = np.convolve(sig, taps, mode='same')
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_filter_fft_streaming_matches_convolve():
    taps = np.random.randn(33).astype(np.float32)
    filt = FilterFFT(taps, block_size=256)
    block = np.random.randn(256).astype(np.float32)
    got = filt(dsc.from_numpy(block)).numpy()
    ref = np.convolve(block, taps)
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_filter_fft_one_program_across_blocks():
    # the streaming step is ONE dsc.compile program (rfft+mul+irfft+crop
    # fused); repeated blocks of the same shape must reuse it, and every
    # block must still match np.convolve
    taps = np.random.randn(17).astype(np.float32)
    filt = FilterFFT(taps, block_size=128)
    for _ in range(3):
        block = np.random.randn(128).astype(np.float32)
        got = filt(dsc.from_numpy(block)).numpy()
        ref = np.convolve(block, taps)
        assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)
    assert filt._step.n_programs == 1


def _np_stft_power(x, frame, hop, window):
    n_frames = 1 + (len(x) - frame) // hop
    out = []
    for i in range(n_frames):
        seg = x[i * hop : i * hop + frame] * window
        out.append(np.abs(np.fft.rfft(seg)) ** 2)
    return np.stack(out)


def test_stft_matches_numpy():
    x = np.random.randn(4096).astype(np.float32)
    frame, hop = 256, 64
    stft = STFT(frame=frame, hop=hop, window='hann', log=False)
    got = stft(dsc.from_numpy(x)).numpy()
    ref = _np_stft_power(x, frame, hop, np.hanning(frame).astype(np.float32))
    assert got.shape == ref.shape
    assert all_close(got, ref, eps=1e-3)


def test_stft_log_and_trace(tmp_path):
    x = np.random.randn(2048).astype(np.float32)
    stft = STFT(frame=256, hop=128, log=True)
    with dsc.profile(str(tmp_path / 't.json'), serve=False):
        spec = stft(dsc.from_numpy(x))
    assert spec.shape == (1 + (2048 - 256) // 128, 129)
    import json

    events = json.loads((tmp_path / 't.json').read_text())['traceEvents']
    assert any(e['name'] == 'stft' for e in events)
