"""Per-round TPU hardware smoke test (VERDICT r1 weak #3 / item 6).

The pytest suite runs the Pallas kernels in interpret mode on CPU; this
script runs the COMPILED kernels on the real chip — the paths with
Mosaic-specific failure modes — and fail-fasts on any accuracy miss:

  - public planar rfft/irfft roundtrip at 2^20 (streaming kernels)
  - batched streaming kernel (4 x 2^18)
  - pallas_map: scalar operand, odd remainder tile, multi-output
  - planar filterFFT chain (rfft -> planar mul -> irfft)
  - small-n paths: Pallas base kernel + untangle rfft, fft/ifft roundtrip
  - STFT model forward

Run:  cd /root/repo && python benchmarks/tpu_smoke.py
Takes a few minutes of remote compiles on first run. Results land in
benchmarks/smoke_results.json ({check, err, bound, ok, backend, ts} per
row — machine-checkable per round, VERDICT r2 item 6) and are summarized
in benchmarks/PERF.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'smoke_results.json')


def main() -> int:
    from bench import wait_for_backend

    wait_for_backend()  # the axon tunnel goes UNAVAILABLE for stretches

    import jax

    import dsc_tpu as dsc

    if jax.default_backend() != 'tpu':
        print('WARNING: not on TPU — this run does not validate Mosaic '
              'compiled paths', file=sys.stderr)

    dsc.init(int(2**32))
    rng = np.random.default_rng(0)
    t_start = time.time()
    backend = jax.default_backend()
    rows = []

    def check(name, err, bound):
        good = bool(err < bound)
        status = 'ok' if good else 'FAIL'
        print(f'  {name:<44} {err:9.2e} (bound {bound:g}) {status}')
        rows.append({
            'check': name,
            'err': float(err),
            'bound': float(bound),
            'ok': good,
            'backend': backend,
            'ts': time.strftime('%Y-%m-%dT%H:%M:%S%z'),
        })
        return good

    ok = True

    # public planar chain at 2^20 (streaming kernels)
    n = 2**20
    x = rng.standard_normal(n).astype(np.float32)
    spec = dsc.rfft(dsc.from_numpy(x))
    assert spec._planar is not None and spec._planar.hermitian
    ref = np.fft.rfft(x)
    ok &= check('public rfft 2^20 (planar, stream)',
                np.abs(spec.numpy() - ref).max() / np.abs(ref).max(), 1e-4)
    back = dsc.irfft(spec)
    ok &= check('public irfft roundtrip', np.abs(back.numpy() - x).max(),
                1e-4)

    # planar filterFFT chain
    taps = np.blackman(4097).astype(np.float32)
    k = dsc.rfft(dsc.from_numpy(taps), n=n)
    conv = dsc.irfft(spec * k)
    refc = np.fft.irfft(ref * np.fft.rfft(taps, n))
    ok &= check('planar filter chain (rfft*rfft->irfft)',
                np.abs(conv.numpy() - refc).max() / np.abs(refc).max(), 1e-4)

    # non-hermitian irfft: reconstruct kernel + inverse (a complex-scalar
    # multiply breaks the conjugate mirror; half-T storage cannot
    # represent that, so the op densifies — either way irfft takes the
    # reconstruction fallback)
    rot = spec * (0.5 + 0.5j)
    assert rot._planar is None or not rot._planar.hermitian
    back2 = dsc.irfft(rot)
    ref2 = np.fft.irfft(ref * (0.5 + 0.5j), n)
    ok &= check('irfft via reconstruct kernel (non-hermitian)',
                np.abs(back2.numpy() - ref2).max()
                / max(np.abs(ref2).max(), 1e-6), 1e-4)

    # batched public planar rfft/irfft
    xb2 = rng.standard_normal((2, 2**18)).astype(np.float32)
    sb = dsc.rfft(dsc.from_numpy(xb2))
    assert sb._planar is not None and sb._planar.re.shape == (2, 2**18)
    refsb = np.fft.rfft(xb2, axis=-1)
    ok &= check('batched public rfft (2 x 2^18)',
                np.abs(sb.numpy() - refsb).max() / np.abs(refsb).max(), 1e-4)
    bb = dsc.irfft(sb)
    ok &= check('batched public irfft roundtrip',
                np.abs(bb.numpy() - xb2).max(), 1e-4)

    # batched grouped streaming: 256-factor split only stream-eligible
    # with batch (super-row DMA grouping)
    xg = rng.standard_normal((8, 2**16)).astype(np.float32)
    sg = dsc.rfft(dsc.from_numpy(xg))
    refg = np.fft.rfft(xg, axis=-1)
    ok &= check('grouped batched rfft (8 x 2^16)',
                np.abs(sg.numpy() - refg).max() / np.abs(refg).max(), 1e-4)
    bg = dsc.irfft(sg)
    ok &= check('grouped batched irfft roundtrip',
                np.abs(bg.numpy() - xg).max(), 1e-4)

    # batched streaming kernel
    from dsc_tpu.fourier import pallas_stream as ps

    b, n1, n2 = 4, 512, 512
    xr = rng.standard_normal((b, n1 * n2)).astype(np.float32)
    xi = rng.standard_normal((b, n1 * n2)).astype(np.float32)
    yr, yi = jax.jit(
        lambda a, c: ps.fourstep_stream_p(a, c, n1, n2, False)
    )(xr, xi)
    refb = np.fft.fft(xr + 1j * xi, axis=-1)
    ok &= check('batched stream 4 x 2^18',
                np.abs(np.asarray(yr) + 1j * np.asarray(yi) - refb).max()
                / np.abs(refb).max(), 1e-4)

    # pallas_map: scalar operand + odd remainder, multi-output
    import jax.numpy as jnp

    from dsc_tpu.ops import pallas_map as pm

    ne = 2**22 + 2048
    a = rng.standard_normal(ne).astype(np.float32)
    got = np.asarray(pm.stream_map(jnp.multiply, a, np.float32(3.0)))
    ok &= check('pallas_map scalar + remainder',
                float(np.abs(got - a * 3).max()), 1e-6)
    # the reference grid shape: 28125 rows of 128, 1469-row non-8-aligned
    # remainder tile
    a2 = rng.standard_normal((60, 60000)).astype(np.float32)
    b2 = rng.standard_normal((60, 60000)).astype(np.float32)
    got2 = np.asarray(pm.stream_map(jnp.add, jnp.asarray(a2), jnp.asarray(b2)))
    ok &= check('pallas_map non-8-aligned remainder (60,60000)',
                float(np.abs(got2 - (a2 + b2)).max()), 1e-6)
    ar, ai, br, bi = (rng.standard_normal(2**22).astype(np.float32)
                      for _ in range(4))
    gr, gi = pm.stream_map_multi(
        lambda p, q, r, s: (p * r - q * s, p * s + q * r),
        (ar, ai, br, bi), (np.float32, np.float32))
    w = (ar + 1j * ai) * (br + 1j * bi)
    ok &= check('pallas_map multi-output (complex mul)',
                max(np.abs(np.asarray(gr) - w.real).max(),
                    np.abs(np.asarray(gi) - w.imag).max()), 1e-5)

    # 2^25 / 2^26: the streaming path past FACTOR_MAX^2/4 (8192-factor
    # slabs; VERDICT r2 item 3 — no size cliff below memory)
    x25 = rng.standard_normal(2**25).astype(np.float32)
    s25 = dsc.rfft(dsc.from_numpy(x25))
    ref25 = np.fft.rfft(x25)
    ok &= check('rfft 2^25 (8192x4096 stream)',
                np.abs(s25.numpy() - ref25).max() / np.abs(ref25).max(),
                1e-4)
    b25 = dsc.irfft(s25)
    ok &= check('irfft 2^25 roundtrip', np.abs(b25.numpy() - x25).max(),
                2e-4)
    del s25, b25, ref25
    x26 = rng.standard_normal(2**26).astype(np.float32)
    s26 = dsc.rfft(dsc.from_numpy(x26))
    # full np.fft at 2^26 is heavy host-side; roundtrip + DC term pin it
    v0 = s26[0]  # 1-element unwrap -> python scalar
    v0 = v0 if isinstance(v0, complex) else complex(v0.numpy())
    dc = abs(v0 - x26.sum()) / (abs(x26).sum() + 1)
    ok &= check('rfft 2^26 DC term', dc, 1e-4)
    b26 = dsc.irfft(s26)
    ok &= check('irfft 2^26 roundtrip', np.abs(b26.numpy() - x26).max(),
                5e-4)
    del s26, b26, x26

    # 2^27: past the streaming window (n2 would exceed FACTOR_MAX), so
    # the public rfft routes to the XLA four-step engine — the size
    # cliff is a measured slowdown, not a failure (VERDICT r4 item 8;
    # bound/route documented in PERF.md round-5 notes)
    x27 = rng.standard_normal(2**27).astype(np.float32)
    t27 = time.time()
    s27 = dsc.rfft(dsc.from_numpy(x27))
    v0 = s27[0]  # 1-element unwrap -> python scalar
    v0 = v0 if isinstance(v0, complex) else complex(v0.numpy())
    dc = abs(v0 - x27.sum()) / (abs(x27).sum() + 1)
    ok &= check('rfft 2^27 DC term (XLA four-step route)', dc, 1e-4)
    b27 = dsc.irfft(s27)
    ok &= check('irfft 2^27 roundtrip', np.abs(b27.numpy() - x27).max(),
                1e-3)
    print(f'  # 2^27 pair wall (incl compile on first run): '
          f'{time.time() - t27:.1f}s')
    del s27, b27, x27

    # batched non-last-axis streaming (VERDICT r2 item 5)
    xax = rng.standard_normal((2**18, 8)).astype(np.float32)
    sax = dsc.rfft(dsc.from_numpy(xax), axis=0)
    refax = np.fft.rfft(xax, axis=0)
    ok &= check('batched rfft over axis 0 (2^18 x 8)',
                np.abs(sax.numpy() - refax).max() / np.abs(refax).max(),
                1e-4)
    bax = dsc.irfft(sax, axis=0)
    ok &= check('batched irfft over axis 0 roundtrip',
                np.abs(bax.numpy() - xax).max(), 2e-4)

    # broadcast-row streaming elementwise (VERDICT r2 item 2)
    ab = rng.standard_normal((4096, 4096)).astype(np.float32)
    rb = rng.standard_normal((1, 4096)).astype(np.float32)
    gb2 = dsc.add(dsc.from_numpy(ab), dsc.from_numpy(rb))
    ok &= check('pallas_map broadcast row (4096x4096 + 1x4096)',
                float(np.abs(gb2.numpy() - (ab + rb)).max()), 1e-6)

    # complex pow on-chip: runs as exp(b*log a) on real planes — the one
    # dsc_ops.h specialization previously untested on TPU (VERDICT r2
    # item 4); must never touch XLA's native complex transcendental
    # lowering (which wedges this backend)
    zc = (rng.standard_normal((60, 6000))
          + 1j * rng.standard_normal((60, 6000))).astype(np.complex64)
    pw = dsc.power(dsc.from_numpy(zc), 2.5)
    refp = zc ** np.complex64(2.5)
    ok &= check('complex pow (real-formula planes, c32)',
                np.abs(pw.numpy() - refp).max() / np.abs(refp).max(), 1e-4)

    # plan-cache LRU eviction with LARGE (2^18-size) plans: the streaming
    # path generates tables in-kernel and never touches the cache, so
    # force the dense XLA path (STREAM_MODE off) — a deliberately tiny
    # cache then evicts/rebuilds multi-MiB twiddle sets on-chip
    # (VERDICT r2 item 6)
    from dsc_tpu.fourier import config as fft_config
    from dsc_tpu.fourier import plan as fft_plan

    old_cap, old_mode = fft_plan.MAX_FFT_PLANS, fft_config.STREAM_MODE
    fft_plan.MAX_FFT_PLANS = 2
    fft_config.STREAM_MODE = 'off'
    try:
        xs18 = rng.standard_normal(2**18).astype(np.float32)
        ref18 = np.fft.rfft(xs18)
        e1 = (np.abs(dsc.rfft(dsc.from_numpy(xs18)).numpy() - ref18).max()
              / np.abs(ref18).max())
        xs19 = rng.standard_normal(2**19).astype(np.float32)
        _ = dsc.rfft(dsc.from_numpy(xs19))     # second big plan
        dsc.plan_fft(4096, dsc.Dtype.F32)      # evicts the 2^18 plan
        dsc.plan_fft(8192, dsc.Dtype.F32)      # evicts the 2^19 plan
        e2 = (np.abs(dsc.rfft(dsc.from_numpy(xs18)).numpy() - ref18).max()
              / np.abs(ref18).max())           # rebuild after eviction
        assert fft_plan.num_plans() <= 2
        ok &= check('plan-cache eviction w/ 2^18-sized plans (dense path)',
                    max(e1, e2), 1e-4)
    finally:
        fft_plan.MAX_FFT_PLANS = old_cap
        fft_config.STREAM_MODE = old_mode

    # small-n paths: base Pallas kernel + untangle rfft; fft/ifft roundtrip
    xs = rng.standard_normal(4096).astype(np.float32)
    specs = dsc.rfft(dsc.from_numpy(xs))
    refs = np.fft.rfft(xs)
    ok &= check('small rfft 4096 (base kernel + untangle)',
                np.abs(specs.numpy() - refs).max() / np.abs(refs).max(),
                1e-4)
    xc = (rng.standard_normal(2048)
          + 1j * rng.standard_normal(2048)).astype(np.complex64)
    rt = dsc.ifft(dsc.fft(dsc.from_numpy(xc)))
    ok &= check('fft/ifft 2048 roundtrip', np.abs(rt.numpy() - xc).max(),
                1e-4)

    # STFT model forward
    from dsc_tpu.models import STFT

    sigl = rng.standard_normal(2**14).astype(np.float32)
    stft = STFT(frame=256, hop=128)
    S = stft(dsc.from_numpy(sigl))
    ok &= check('STFT forward (finite, shaped)',
                0.0 if np.isfinite(S.numpy()).all() else 1.0, 0.5)

    # overlap-save block convolution (batched FFT engine, models/ola.py)
    from dsc_tpu.models import ISTFT, OverlapSave

    sol = rng.standard_normal(2**16).astype(np.float32)
    tol = rng.standard_normal(129).astype(np.float32)
    yol = OverlapSave(tol, fft_n=2048)(dsc.from_numpy(sol))
    rol = np.convolve(sol, tol)
    ok &= check('overlap-save conv 2^16 (fft_n=2048 blocks)',
                np.abs(yol.numpy() - rol).max() / np.abs(rol).max(), 1e-4)

    # complex STFT -> ISTFT overlap-add round-trip
    zst = STFT(frame=256, hop=64, mode='complex')(dsc.from_numpy(sigl))
    yst = ISTFT(frame=256, hop=64)(zst).numpy()
    span = (zst.shape[0] - 1) * 64 + 256
    ok &= check('ISTFT(STFT) round-trip interior',
                np.abs(yst[256:span - 256] - sigl[256:span - 256]).max(),
                1e-4)

    # dsc.compile: the filterFFT chain as ONE fused XLA program, with the
    # planar/hermitian spectrum crossing the trace boundary (fuse.py)
    @dsc.compile
    def fused_filt(s, t):
        return dsc.irfft(dsc.rfft(s, n=2**21) * dsc.rfft(t, n=2**21))

    sc = rng.standard_normal(2**20).astype(np.float32)
    tc = np.blackman(255).astype(np.float32)
    outc = fused_filt(dsc.from_numpy(sc), dsc.from_numpy(tc))
    refcv = np.fft.irfft(np.fft.rfft(sc, 2**21) * np.fft.rfft(tc, 2**21))
    ok &= check('dsc.compile filterFFT 2^20 (one program)',
                np.abs(outc.numpy() - refcv).max() / np.abs(refcv).max(),
                1e-4)
    fused_filt(dsc.from_numpy(sc), dsc.from_numpy(tc))
    ok &= check('dsc.compile program cache (1 program, 2 calls)',
                0.0 if fused_filt.n_programs == 1 else 1.0, 0.5)

    # resample + hilbert pipelines (planar rfft/irfft programs)
    from dsc_tpu.models import hilbert, resample
    xs = rng.standard_normal(2**16).astype(np.float32)
    Xf = np.fft.fft(xs)
    numr = 2**14
    Yf = np.zeros(numr, complex)
    Yf[: numr // 2] = Xf[: numr // 2]
    Yf[-(numr // 2 - 1):] = Xf[-(numr // 2 - 1):]
    Yf[numr // 2] = Xf[numr // 2] + Xf[len(xs) - numr // 2]
    ref_rs = np.fft.ifft(Yf).real * (numr / len(xs))
    got_rs = resample(dsc.from_numpy(xs), numr).numpy()
    ok &= check('resample 2^16 -> 2^14 (fourier)',
                np.abs(got_rs - ref_rs).max(), 1e-4)
    hmul = np.zeros(len(xs))
    hmul[0] = hmul[len(xs) // 2] = 1
    hmul[1:len(xs) // 2] = 2
    ref_h = np.fft.ifft(Xf * hmul)
    got_h = hilbert(dsc.from_numpy(xs)).numpy()
    ok &= check('hilbert analytic signal 2^16',
                np.abs(got_h - ref_h).max(), 1e-4)

    # welch PSD + firwin design (scipy.signal is the model-layer oracle)
    import scipy.signal as sps

    from dsc_tpu.models import firwin, welch

    _, pxw = welch(dsc.from_numpy(xs), fs=1000.0, nperseg=1024)
    _, pxw_ref = sps.welch(xs, fs=1000.0, nperseg=1024)
    ok &= check('welch PSD 2^16 (nperseg=1024)',
                np.abs(pxw.numpy() - pxw_ref).max() / pxw_ref.max(), 2e-4)
    tapw = firwin(65, 0.3)
    ok &= check('firwin lowpass taps (device sinc/window ops)',
                np.abs(tapw.numpy() - sps.firwin(65, 0.3)).max(), 1e-5)

    # IIR: butter design + associative-scan sosfilt on-chip
    from dsc_tpu.models import butter, sosfilt

    sosd = butter(4, 0.25, 'low')
    xi = rng.standard_normal(2**16).astype(np.float32)
    yi = sosfilt(sosd, dsc.from_numpy(xi)).numpy()
    ri = sps.sosfilt(sosd, xi.astype(np.float64))
    ok &= check('sosfilt 2^16 (assoc-scan IIR, butter(4,0.25))',
                np.abs(yi - ri).max() / np.abs(ri).max(), 1e-3)

    # rational-rate polyphase resample + device chirp synthesis
    from dsc_tpu.models import chirp, resample_poly

    xq = rng.standard_normal(3000).astype(np.float32)
    yq = resample_poly(dsc.from_numpy(xq), 3, 2).numpy()
    rq = sps.resample_poly(xq.astype(np.float64), 3, 2)
    ok &= check('resample_poly 3/2 (batched planar-FFT upfirdn)',
                np.abs(yq - rq).max() / np.abs(rq).max(), 1e-3)
    tq = np.arange(2048) / 8000.0
    yc = chirp(dsc.from_numpy(tq.astype(np.float32)), 100.0, tq[-1],
               900.0).numpy()
    rc = sps.chirp(tq, 100.0, tq[-1], 900.0)
    ok &= check('chirp synthesis (device f64 phase math)',
                np.abs(yc - rc).max(), 1e-3)

    # exact any-length DFT via Bluestein + savgol smoothing on-chip
    from dsc_tpu.models import czt, savgol_filter

    xz = (rng.standard_normal(1000)
          + 1j * rng.standard_normal(1000)).astype(np.complex64)
    yz = czt(dsc.from_numpy(xz)).numpy()
    rz = np.fft.fft(xz.astype(np.complex128))
    ok &= check('czt 1000 == exact non-pow2 DFT (Bluestein)',
                np.abs(yz - rz).max() / np.abs(rz).max(), 1e-4)
    xs2 = np.sin(np.linspace(0, 6, 4096)).astype(np.float32)
    ys2 = savgol_filter(dsc.from_numpy(xs2), 21, 4).numpy()
    rs2 = sps.savgol_filter(xs2.astype(np.float64), 21, 4)
    ok &= check('savgol_filter 21/4 (interp edges)',
                np.abs(ys2 - rs2).max(), 1e-3)

    # dsc.map: fused elementwise chain in one streaming pass
    nm = 2**23
    xm = rng.standard_normal(nm).astype(np.float32)
    ym = rng.standard_normal(nm).astype(np.float32)
    fused = dsc.map(lambda a, b: dsc.clip(a * b + 0.5, -1.0, 1.0))
    gm = fused(dsc.from_numpy(xm), dsc.from_numpy(ym))
    ok &= check('dsc.map fused chain (2^23, one pass)',
                np.abs(gm.numpy() - np.clip(xm * ym + 0.5, -1.0, 1.0)).max(),
                1e-6)
    ok &= check('dsc.map took the streaming path',
                0.0 if next(iter(fused._programs.values()))[0] == 'stream'
                else 1.0, 0.5)

    # window generators on device (kaiser rides the i0 kernel) and the
    # 2-D FFT composition
    wk = dsc.kaiser(1024, 8.6)
    ok &= check('kaiser window (device i0)',
                np.abs(wk.numpy() - np.kaiser(1024, 8.6)).max(), 1e-5)
    x2d = rng.standard_normal((8, 256, 512)).astype(np.float32)
    z2 = dsc.rfft2(dsc.from_numpy(x2d))
    ref2d = np.fft.rfft2(x2d)
    ok &= check('rfft2 (8 x 256 x 512)',
                np.abs(z2.numpy() - ref2d).max() / np.abs(ref2d).max(), 1e-4)
    back2d = dsc.irfft2(z2)
    ok &= check('irfft2 roundtrip', np.abs(back2d.numpy() - x2d).max(), 1e-4)

    # scipy window tier + the estimators built on it (round 3)
    import scipy.signal as sps

    wcb = dsc.get_window(('chebwin', 90.0), 256)
    ok &= check('get_window chebwin upload',
                np.abs(wcb.numpy() - sps.get_window(('chebwin', 90.0),
                                                    256)).max(), 1e-5)
    from dsc_tpu.models import lombscargle, multitaper, welch as m_welch

    xw = rng.standard_normal(4096).astype(np.float32)
    _, pw = m_welch(dsc.from_numpy(xw), fs=1000.0, window='flattop',
                    nperseg=512)
    _, pwr = sps.welch(xw.astype(np.float64), fs=1000.0, window='flattop',
                       nperseg=512)
    ok &= check('welch flattop window',
                np.abs(pw.numpy() - pwr).max() / pwr.max(), 2e-4)
    xmt = (np.sin(2 * np.pi * 60.0 * np.arange(2048) / 1000.0)
           + 0.5 * rng.standard_normal(2048)).astype(np.float32)
    fmt, pmt = multitaper(dsc.from_numpy(xmt), fs=1000.0, nw=4.0)
    pk = float(fmt.numpy()[np.argmax(pmt.numpy())])
    ok &= check('multitaper adaptive peak at 60 Hz', abs(pk - 60.0), 2.0)
    tls = np.sort(rng.uniform(0, 10, 512))
    yls = np.cos(2 * np.pi * 3.0 * tls) + 0.4 * rng.standard_normal(512)
    fls = np.linspace(0.5, 40.0, 640) * 2 * np.pi
    gls = lombscargle(dsc.from_numpy(tls), dsc.from_numpy(yls),
                      dsc.from_numpy(fls)).numpy()
    rls = sps.lombscargle(tls, yls, fls)
    ok &= check('lombscargle (f64 phase on device)',
                np.abs(gls - rls).max() / np.abs(rls).max(), 1e-5)

    # scipy.fft-parity tier: exact-length (Bluestein) DFT, DCT/DST,
    # FFTLog Hankel — the trig/chirp twiddle paths on compiled kernels
    import scipy.fft as sft

    from dsc_tpu import transforms as tfm

    xe = rng.standard_normal((4, 1000)).astype(np.float32)  # non-pow2
    xe64 = xe.astype(np.float64)
    ze = tfm.fft(dsc.from_numpy(xe))
    re = sft.fft(xe64)
    ok &= check('transforms.fft exact n=1000 (Bluestein)',
                np.abs(ze.numpy() - re).max() / np.abs(re).max(), 1e-4)
    yd = tfm.dct(dsc.from_numpy(xe), type=2, norm='ortho')
    rd = sft.dct(xe64, type=2, norm='ortho')
    ok &= check('transforms.dct-II ortho n=1000',
                np.abs(yd.numpy() - rd).max() / np.abs(rd).max(), 1e-4)
    ys = tfm.dst(dsc.from_numpy(xe), type=4)
    rs = sft.dst(xe64, type=4)
    ok &= check('transforms.dst-IV n=1000',
                np.abs(ys.numpy() - rs).max() / np.abs(rs).max(), 1e-4)
    offh = tfm.fhtoffset(0.05, 0.5)
    yh = tfm.fht(dsc.from_numpy(xe[:, :512]), 0.05, 0.5, offset=offh)
    rh = sft.fht(xe64[:, :512], 0.05, 0.5, offset=offh)
    ok &= check('transforms.fht (FFTLog, low-ringing offset)',
                np.abs(yh.numpy() - rh).max() / np.abs(rh).max(), 1e-4)

    # CWT + ShortTimeFFT on compiled kernels (VERDICT r3 item 1: the two
    # model-tier families the round-3 smoke never exercised on-chip)
    from scipy.signal._peak_finding import _cwt as sp_cwt
    from scipy.signal._peak_finding import _ricker as sp_ricker

    from dsc_tpu.models import ShortTimeFFT, cwt, ricker

    xcw = rng.standard_normal(2048).astype(np.float32)
    wid = np.arange(1, 17).astype(np.float64)
    gcw = cwt(dsc.from_numpy(xcw), ricker, wid).numpy()
    rcw = sp_cwt(xcw.astype(np.float64), sp_ricker, wid)
    ok &= check('cwt ricker 2048 x 16 widths (batched FFT)',
                np.abs(gcw - rcw).max() / np.abs(rcw).max(), 1e-3)
    SFT = ShortTimeFFT(sps.get_window('hann', 256).astype(np.float64),
                       hop=64, fs=1000.0)
    xst = rng.standard_normal(4000).astype(np.float32)
    Sst = SFT.stft(dsc.from_numpy(xst))
    SFT_ref = sps.ShortTimeFFT(sps.get_window('hann', 256), hop=64,
                               fs=1000.0)
    Sref = SFT_ref.stft(xst.astype(np.float64))
    ok &= check('ShortTimeFFT.stft hann-256/64',
                np.abs(Sst.numpy() - Sref).max() / np.abs(Sref).max(), 1e-4)
    xrt = SFT.istft(Sst, k1=len(xst)).numpy()
    ok &= check('ShortTimeFFT istft(stft) roundtrip',
                np.abs(xrt - xst).max(), 1e-4)

    with open(RESULTS_PATH, 'w') as f:
        json.dump({'ok': bool(ok), 'n_checks': len(rows),
                   'backend': backend,
                   'elapsed_s': round(time.time() - t_start, 1),
                   'checks': rows}, f, indent=1)
    print(f'TPU smoke: {"ALL OK" if ok else "FAILURES"} '
          f'({time.time() - t_start:.0f}s, backend={jax.default_backend()}) '
          f'-> {RESULTS_PATH}')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
