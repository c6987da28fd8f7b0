"""Pallas FFT base kernel in interpreter mode (the kernel-correctness story
from SURVEY §5.2: Pallas interpret mode on CPU; compiled-path validation
runs on hardware via bench.py / the verify flow)."""

import numpy as np
import pytest

import dsc_tpu as dsc
from dsc_tpu.fourier import config as fft_config
from dsc_tpu.fourier import pallas_kernels as pk

from conftest import all_close


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setattr(fft_config, 'PALLAS_MODE', 'on')
    yield


@pytest.mark.parametrize('n', [256, 512, 1024, 4096])
def test_fft_base_matches_numpy(n):
    x = (np.random.randn(4, n) + 1j * np.random.randn(4, n)).astype(
        np.complex64
    )
    got = np.asarray(pk.fft_base(np.asarray(x), n))
    ref = np.fft.fft(x, axis=-1)
    scale = max(np.abs(ref).max(), 1.0)
    # split-bf16 three-pass matmuls: ~1e-5 relative (north star: 1e-4)
    assert np.abs(got - ref).max() / scale < 3e-5


def test_fft_base_chunked():
    # batch > block size exercises the unrolled-chunk path
    n = 256
    bb = pk._block_batch(n)
    b = 2 * bb + 7  # non-multiple => padding too
    x = (np.random.randn(b, n) + 1j * np.random.randn(b, n)).astype(
        np.complex64
    )
    got = np.asarray(pk.fft_base(np.asarray(x), n))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1.0) < 3e-5


def test_full_fft_via_pallas_path():
    # end-to-end dsc.fft with the pallas base forced on (interpret on CPU);
    # error is relative to the spectrum scale (near-zero bins carry the
    # kernel's absolute error, so plain atol=1e-5 is draw-dependent)
    x = (np.random.randn(3, 1024) + 1j * np.random.randn(3, 1024)).astype(
        np.complex64
    )
    got = dsc.fft(dsc.from_numpy(x)).numpy()
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5


def test_generated_tables_accurate():
    # the in-kernel table generator (integer iota + exact mod-n + trig)
    # must reproduce the f64 DFT matrices to f32 precision (SURVEY §7.3
    # risk 1); both the f32 ('f32'/HIGHEST, base kernel) and split-bf16
    # ('bf16', streaming kernel) forms
    import jax

    from dsc_tpu.fourier.pallas_stream import _gen_dft_tables

    r1 = r2 = 32
    n = r1 * r2
    ref = np.exp(-2j * np.pi * np.outer(np.arange(r1), np.arange(r1)) / r1)
    top = np.concatenate([ref.real, -ref.imag], axis=1)
    bot = np.concatenate([ref.imag, ref.real], axis=1)
    stacked = np.concatenate([top, bot], axis=0)

    (f1s,), _, tr, ti = jax.jit(
        lambda: _gen_dft_tables(n, r1, r2, -1, 'f32')
    )()
    assert np.abs(np.asarray(f1s) - stacked).max() < 1e-6
    tref = np.exp(
        -2j * np.pi * np.outer(np.arange(r1), np.arange(r2)) / n
    )
    assert np.abs(np.asarray(tr) - tref.real).max() < 1e-6

    (f1h, f1l), *_ = jax.jit(
        lambda: _gen_dft_tables(n, r1, r2, -1, 'bf16')
    )()
    rec = np.asarray(f1h, np.float32) + np.asarray(f1l, np.float32)
    assert np.abs(rec - stacked).max() < 2 ** -15

    # g3 (Gauss 3-mult) tables: Fr, Fi, Fr+Fi split pairs
    (fr, fi, fs), *_ = jax.jit(
        lambda: _gen_dft_tables(n, r1, r2, -1, 'g3')
    )()
    rr = np.asarray(fr[0], np.float32) + np.asarray(fr[1], np.float32)
    ri = np.asarray(fi[0], np.float32) + np.asarray(fi[1], np.float32)
    rs = np.asarray(fs[0], np.float32) + np.asarray(fs[1], np.float32)
    assert np.abs(rr - ref.real).max() < 2 ** -15
    assert np.abs(ri - ref.imag).max() < 2 ** -15
    assert np.abs(rs - (ref.real + ref.imag)).max() < 2 ** -14


def test_reconstruct_spectrum_kernel():
    # Hermitian reconstruction DMA kernel (interpret mode; small chunks)
    import jax
    import jax.numpy as jnp

    import dsc_tpu.fourier.pallas_reconstruct as pr

    old = pr.CHUNK
    pr.CHUNK = 1024
    try:
        n = 8192
        x = (
            np.random.randn(1, n // 2 + 1) + 1j * np.random.randn(1, n // 2 + 1)
        ).astype(np.complex64)
        x[0, n // 2] = x[0, n // 2].real  # valid Hermitian corner
        full = np.asarray(
            jax.jit(lambda v: pr.reconstruct_spectrum(v, n))(jnp.asarray(x))
        )
        ref = np.concatenate(
            [x, np.conj(x[:, 1 : n // 2][:, ::-1])], axis=1
        )
        assert np.abs(full - ref).max() == 0
    finally:
        pr.CHUNK = old


@pytest.mark.parametrize('n1,n2', [(512, 512), (512, 1024)])
def test_stream_fourstep_kernel(n1, n2):
    # two-pass streaming four-step (interpret mode): all four variants
    import jax

    from dsc_tpu.fourier import pallas_stream as ps

    n = n1 * n2
    rng = np.random.default_rng(0)
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    ref = np.fft.fft(xr + 1j * xi)
    yr, yi = jax.jit(
        lambda a, b: ps.fourstep_stream_p(a, b, n1, n2, False)
    )(xr, xi)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    # split-bf16 three-pass matmuls: ~1e-5 relative (north star: 1e-4)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 3e-5
    # inverse with sign-flipped tables (no conj sandwich)
    ir, ii = jax.jit(
        lambda a, b: ps.fourstep_stream_p(a, b, n1, n2, True)
    )(np.asarray(yr), np.asarray(yi))
    assert np.abs(np.asarray(ir) - xr).max() < 5e-3
    assert np.abs(np.asarray(ii) - xi).max() < 5e-3
    # real-input phase A (rfft path)
    zr, zi = jax.jit(
        lambda a: ps.fourstep_stream_p(a, None, n1, n2, False)
    )(xr)
    refr = np.fft.fft(xr)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    assert np.abs(z - refr).max() / np.abs(refr).max() < 3e-5
    # real-output inverse (irfft tail)
    wr, wnone = jax.jit(
        lambda a, b: ps.fourstep_stream_p(a, b, n1, n2, True, True)
    )(np.asarray(yr), np.asarray(yi))
    assert wnone is None
    assert np.abs(np.asarray(wr) - xr).max() < 5e-3


def test_stream_fourstep_batched():
    # batched rows through the streaming kernel: the tile loop runs
    # B*n_tiles iterations with dynamic row offsets (VERDICT r1 item 5)
    import jax

    from dsc_tpu.fourier import pallas_stream as ps

    n1 = n2 = 512
    n = n1 * n2
    b = 3
    rng = np.random.default_rng(5)
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    ref = np.fft.fft(xr + 1j * xi, axis=-1)
    yr, yi = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, False)
    )(xr, xi)
    assert yr.shape == (b, n)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 3e-5
    # batched real-input forward + batched real-output inverse roundtrip
    zr, zi = jax.jit(
        lambda a: ps.fourstep_stream_p(a, None, n1, n2, False)
    )(xr)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    refr = np.fft.fft(xr, axis=-1)
    assert np.abs(z - refr).max() / np.abs(refr).max() < 3e-5
    wr, _ = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, True, True)
    )(np.asarray(zr), np.asarray(zi))
    assert np.abs(np.asarray(wr) - xr).max() < 5e-3


def test_stream_fourstep_small_factors_grouped():
    # 256x256 factors are only stream-eligible when batched (super-row
    # grouping keeps the DMAs large); check numerics through the grouped
    # tile loop with a group size that doesn't divide into one DMA
    import jax

    from dsc_tpu.fourier import pallas_stream as ps

    assert not ps.supported(256, 256, np.complex64, batch=1)
    assert ps.supported(256, 256, np.complex64, batch=6)
    n1 = n2 = 256
    n = n1 * n2
    b = 6
    assert ps._group(b, n1) == 6
    rng = np.random.default_rng(11)
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    ref = np.fft.fft(xr + 1j * xi, axis=-1)
    yr, yi = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, False)
    )(xr, xi)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 3e-5
    # grouped inverse roundtrip
    wr, wi = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, True)
    )(np.asarray(yr), np.asarray(yi))
    w = np.asarray(wr) + 1j * np.asarray(wi)
    assert np.abs(w - (xr + 1j * xi)).max() < 5e-4


def test_stream_fourstep_multi_group_batched():
    # batch > FACTOR_MAX//n so the grouped tile loop runs MULTIPLE row
    # groups (bg > 0): exercises the dynamic tt//nt split combined with
    # g>1 segmented out-DMAs and the (2, 2, g) semaphore array — the
    # branch the single-group (batch == g) tests never reach
    import jax

    from dsc_tpu.fourier import pallas_stream as ps

    n1 = n2 = 256
    n = n1 * n2
    b = 2 * (ps.FACTOR_MAX // 256)  # force exactly two row groups
    g = ps._group(b, n1)
    assert g == b // 2 and b // g == 2  # two groups
    rng = np.random.default_rng(23)
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    ref = np.fft.fft(xr + 1j * xi, axis=-1)
    yr, yi = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, False)
    )(xr, xi)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 3e-5
    # multi-group inverse roundtrip
    wr, wi = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, True)
    )(np.asarray(yr), np.asarray(yi))
    w = np.asarray(wr) + 1j * np.asarray(wi)
    assert np.abs(w - (xr + 1j * xi)).max() < 5e-4


def test_stream_unsupported_when_grouping_degrades():
    # ADVICE r2: a batch sharing no divisor with FACTOR_MAX//f must not
    # take the stream path (g would degrade to 1 -> 128 KiB latency-bound
    # tiles); eligibility now gates on the ACHIEVABLE group size
    from dsc_tpu.fourier import pallas_stream as ps

    # a prime batch larger than the max group shares no divisor -> g=1
    bad = ps.FACTOR_MAX // 256 + 5
    while any(bad % d == 0 for d in range(2, min(bad, 33))):
        bad += 1
    assert not ps.supported(256, 256, np.complex64, batch=bad)
    assert ps.supported(256, 256, np.complex64, batch=32)
    assert not ps.supported(256, 256, np.complex64, batch=1)


def test_stream_path_end_to_end(monkeypatch):
    # dsc.rfft/irfft routed through the streaming kernel (interpret mode)
    monkeypatch.setattr(fft_config, 'STREAM_MODE', 'on')
    from dsc_tpu.fourier import plan as fft_plan

    monkeypatch.setattr(fft_plan, 'BASE_MAX', 512)
    monkeypatch.setattr(fft_plan, 'RFFT_PACK_MAX', 2**17)
    fft_plan.clear_plans()
    try:
        n = 2**18  # 512 x 512 split
        x = np.random.randn(n).astype(np.float32)
        spec = dsc.rfft(dsc.from_numpy(x))
        ref = np.fft.rfft(x)
        err = np.abs(spec.numpy() - ref).max() / np.abs(ref).max()
        assert err < 3e-5
        back = dsc.irfft(spec)
        assert np.abs(back.numpy() - x).max() < 1e-4
    finally:
        fft_plan.clear_plans()
