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


def test_resample():
    """Fourier resampling vs a full-spectrum NumPy oracle (the
    scipy.signal.resample algorithm)."""
    import numpy as np

    import dsc_tpu as dsc
    from dsc_tpu.models import resample

    def np_resample(x, num):
        n = x.shape[-1]
        X = np.fft.fft(x, axis=-1)
        Y = np.zeros(x.shape[:-1] + (num,), complex)
        N = min(n, num)
        nyq = N // 2
        Y[..., :nyq] = X[..., :nyq]
        Y[..., -(nyq - 1):] = X[..., -(nyq - 1):]
        if num < n:
            Y[..., nyq] = X[..., nyq] + X[..., n - nyq]
        elif num > n:
            Y[..., nyq] = 0.5 * X[..., nyq]
            Y[..., num - nyq] = np.conj(Y[..., nyq])
        else:
            Y[..., nyq] = X[..., nyq]
        return np.fft.ifft(Y, axis=-1).real * (num / n)

    rng = np.random.default_rng(11)
    x = rng.standard_normal(512).astype(np.float32)
    xd = dsc.from_numpy(x)
    for num in (128, 512, 2048):
        got = resample(xd, num).numpy()
        want = np_resample(x, num)
        assert got.shape == (num,)
        assert np.abs(got - want).max() < 1e-4, num

    xb = rng.standard_normal((3, 256)).astype(np.float32)
    got = resample(dsc.from_numpy(xb), 64).numpy()
    assert got.shape == (3, 64)
    assert np.abs(got - np_resample(xb, 64)).max() < 1e-4

    try:
        resample(dsc.from_numpy(x[:500]), 128)
        raise AssertionError('non-pow2 length must raise')
    except RuntimeError:
        pass


def test_hilbert():
    """Analytic signal vs the classic FFT-multiplier oracle."""
    import numpy as np

    import dsc_tpu as dsc
    from dsc_tpu.models import hilbert

    def np_hilbert(x):
        n = x.shape[-1]
        X = np.fft.fft(x, axis=-1)
        h = np.zeros(n)
        h[0] = h[n // 2] = 1
        h[1:n // 2] = 2
        return np.fft.ifft(X * h, axis=-1)

    rng = np.random.default_rng(12)
    x = rng.standard_normal(1024).astype(np.float32)
    got = hilbert(dsc.from_numpy(x)).numpy()
    want = np_hilbert(x)
    assert got.dtype == np.complex64
    assert np.abs(got - want).max() < 1e-4
    # the real plane is the input signal itself
    assert np.abs(got.real - x).max() < 1e-5
    # envelope of a chirp is smooth and positive
    t = np.arange(2048) / 2048
    chirp = np.sin(2 * np.pi * (50 * t + 200 * t**2)).astype(np.float32)
    env = np.abs(hilbert(dsc.from_numpy(chirp)).numpy())
    assert env.min() > 0.2 and env.max() < 1.3

    xb = rng.standard_normal((2, 512)).astype(np.float32)
    gotb = hilbert(dsc.from_numpy(xb)).numpy()
    assert gotb.shape == (2, 512)
    assert np.abs(gotb - np_hilbert(xb)).max() < 1e-4
