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


def test_overlap_save_matches_convolve():
    from dsc_tpu.models import OverlapSave, overlap_save_convolve

    sig = np.random.randn(10000).astype(np.float32)
    taps = np.random.randn(65).astype(np.float32)
    ref = np.convolve(sig, taps)
    # class form with an explicit small FFT (many blocks)
    ola = OverlapSave(taps, fft_n=256)
    got = ola(dsc.from_numpy(sig)).numpy()
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)
    # free-function form with the default FFT size
    got2 = overlap_save_convolve(
        dsc.from_numpy(sig), dsc.from_numpy(taps)
    ).numpy()
    assert np.abs(got2 - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_overlap_save_block_invariance():
    # the result must not depend on the block size
    from dsc_tpu.models import OverlapSave

    sig = np.random.randn(3000).astype(np.float32)
    taps = np.random.randn(31).astype(np.float32)
    outs = [
        OverlapSave(taps, fft_n=f)(dsc.from_numpy(sig)).numpy()
        for f in (64, 512, 4096)
    ]
    for o in outs[1:]:
        assert np.abs(o - outs[0]).max() < 1e-4


def test_overlap_save_validation():
    from dsc_tpu.models import OverlapSave

    taps = np.random.randn(65).astype(np.float32)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match='power of two'):
        OverlapSave(taps, fft_n=200)
    with _pytest.raises(RuntimeError, match='too small'):
        OverlapSave(taps, fft_n=64)


def test_stft_complex_istft_roundtrip():
    from dsc_tpu.models import ISTFT

    frame, hop = 256, 64
    x = np.random.randn(4096).astype(np.float32)
    z = STFT(frame=frame, hop=hop, window='hann', mode='complex')(
        dsc.from_numpy(x)
    )
    assert z.dtype == dsc.Dtype.C32
    # the complex spectrogram matches the NumPy STFT
    n_frames = 1 + (4096 - frame) // hop
    win = np.hanning(frame).astype(np.float32)
    ref = np.stack([
        np.fft.rfft(x[i * hop : i * hop + frame] * win)
        for i in range(n_frames)
    ])
    zn = z.numpy()
    assert np.abs(zn - ref).max() < 1e-3 * max(np.abs(ref).max(), 1.0)
    # round-trip: exact wherever window coverage is full
    y = ISTFT(frame=frame, hop=hop, window='hann')(z).numpy()
    span = (n_frames - 1) * hop + frame
    assert y.shape == (span,)
    interior = slice(frame, span - frame)
    assert np.abs(y[interior] - x[interior]).max() < 1e-4


def test_filter_fft_batched_blocks():
    taps = np.random.randn(33).astype(np.float32)
    xs = np.random.randn(4, 256).astype(np.float32)
    filt = FilterFFT(taps, block_size=256)
    got = filt(dsc.from_numpy(xs)).numpy()
    assert got.shape == (4, 256 + 32)
    for i in range(4):
        ref = np.convolve(xs[i], taps)
        assert np.abs(got[i] - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_models_accept_batched_input():
    # (batch, n) inputs ride the batched FFT engine as one program;
    # results match the per-signal 1-D calls exactly
    from dsc_tpu.models import ISTFT, OverlapSave

    b, n, frame, hop = 3, 2048, 128, 32
    xs = np.random.randn(b, n).astype(np.float32)

    stft = STFT(frame=frame, hop=hop, mode='complex')
    istft = ISTFT(frame=frame, hop=hop)
    Z = stft(dsc.from_numpy(xs))
    assert Z.n_dim == 3 and Z.shape[0] == b
    for i in range(b):
        zi = stft(dsc.from_numpy(xs[i])).numpy()
        assert np.abs(Z.numpy()[i] - zi).max() == 0.0
    y = istft(Z, length=n)
    assert y.shape == (b, n)
    for i in range(b):
        yi = istft(stft(dsc.from_numpy(xs[i])), length=n).numpy()
        assert np.abs(y.numpy()[i] - yi).max() == 0.0

    # batched log-power spectrogram
    S = STFT(frame=frame, hop=hop)(dsc.from_numpy(xs))
    S0 = STFT(frame=frame, hop=hop)(dsc.from_numpy(xs[0]))
    assert S.shape == (b,) + S0.shape
    assert np.abs(S.numpy()[0] - S0.numpy()).max() == 0.0

    # batched overlap-save equals np.convolve row-wise
    taps = np.random.randn(33).astype(np.float32)
    yo = OverlapSave(taps, fft_n=256)(dsc.from_numpy(xs)).numpy()
    assert yo.shape == (b, n + 32)
    for i in range(b):
        ref = np.convolve(xs[i], taps)
        assert np.abs(yo[i] - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_model_pipelines_compose_under_compile():
    # model __call__s are ordinary Tensor->Tensor functions, so a whole
    # STFT -> mask -> ISTFT chain traces into ONE fused program and
    # matches its eager execution
    from dsc_tpu.models import ISTFT, OverlapSave

    n, frame, hop = 8192, 256, 64
    x = np.random.randn(n).astype(np.float32)
    stft = STFT(frame=frame, hop=hop, mode='complex')
    istft = ISTFT(frame=frame, hop=hop)

    def gate_pipe(v):
        Z = stft(v)
        mag = dsc.absolute(Z)
        floor = dsc.mean(mag, axis=1, keepdims=True)
        gate = dsc.clip(dsc.sub(dsc.true_div(mag, floor), 2.0), 0.0, 1.0)
        return istft(dsc.mul(Z, gate))

    want = gate_pipe(dsc.from_numpy(x)).numpy()
    got = dsc.compile(gate_pipe)(dsc.from_numpy(x)).numpy()
    assert np.abs(got - want).max() < 1e-4

    taps = np.random.randn(65).astype(np.float32)
    ola = OverlapSave(taps, fft_n=512)
    yo = dsc.compile(lambda v: ola(v))(dsc.from_numpy(x)).numpy()
    ref = np.convolve(x, taps)
    assert np.abs(yo - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_istft_non_dividing_hop():
    # hop that does not divide frame takes the scatter overlap-add
    # fallback; WLS reconstruction is still exact in the interior
    from dsc_tpu.models import ISTFT

    frame, hop = 128, 48
    x = np.random.randn(2048).astype(np.float32)
    z = STFT(frame=frame, hop=hop, mode='complex')(dsc.from_numpy(x))
    y = ISTFT(frame=frame, hop=hop)(z).numpy()
    n_frames = z.shape[0]
    span = (n_frames - 1) * hop + frame
    interior = slice(frame, span - frame)
    assert np.abs(y[interior] - x[interior]).max() < 1e-4


def test_istft_length_and_validation():
    from dsc_tpu.models import ISTFT

    frame, hop = 128, 32
    x = np.random.randn(1024).astype(np.float32)
    z = STFT(frame=frame, hop=hop, mode='complex')(dsc.from_numpy(x))
    y = ISTFT(frame=frame, hop=hop)(z, length=512)
    assert y.shape == (512,)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match='bins'):
        ISTFT(frame=64, hop=32)(z)
