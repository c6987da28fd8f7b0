"""Context / memory-accounting contract (reference dsc.cpp:150-322,
context.py)."""

import numpy as np
import pytest

import dsc_tpu as dsc
from dsc_tpu import context as ctx_mod


def test_double_init_raises():
    # session fixture already initialized (reference context.py:29-34)
    with pytest.raises(RuntimeError):
        dsc.init(2**20)


def test_used_mem_tracks_buffers():
    before = dsc.used_mem()
    t = dsc.zeros((256, 256))  # 256 KiB f32
    assert dsc.used_mem() - before == 256 * 256 * 4
    del t
    import gc

    gc.collect()
    assert dsc.used_mem() == before


def test_views_share_accounting():
    before = dsc.used_mem()
    t = dsc.zeros((64, 64))
    v = t.reshape(4096)
    w = dsc.cast(t, dsc.Dtype.F32)
    # views don't allocate (reference buffer refcounting, dsc.cpp:293-303)
    assert dsc.used_mem() - before == 64 * 64 * 4
    del t, v, w


def test_clear_contract_live_tensors_survive():
    # DELIBERATE divergence from the reference (documented in README and
    # context.clear's docstring): dsc_ctx_clear resets the whole main
    # buffer — used_mem drops to 0 and every tensor dies
    # (dsc.cpp:287-291). With live-object accounting over XLA-managed
    # buffers, invalidating live Python tensors would leave dangling
    # wrappers, so clear() instead (a) empties the FFT plan cache and
    # (b) reaps only DEAD buffers; live tensors keep their bytes and
    # stay valid.
    from dsc_tpu.fourier import plan as fft_plan

    before = dsc.used_mem()
    t = dsc.from_numpy(np.ones((64, 64), dtype=np.float32))
    dsc.plan_fft(1024)
    assert fft_plan.num_plans() > 0
    dsc.clear()
    assert fft_plan.num_plans() == 0          # plan cache emptied
    assert dsc.used_mem() - before == 64 * 64 * 4  # live tensor kept
    assert float(t.numpy().sum()) == 64 * 64       # and still valid
    del t


def test_alloc_cap_fails_fast():
    # allocator exhaustion is fatal in the reference
    # (dsc_allocator.cpp:112-114); here it raises MemoryError
    ctx = ctx_mod._get_ctx()
    with pytest.raises(MemoryError):
        ctx.alloc(ctx.main_mem + 1)


def test_print_mem_usage(capsys):
    dsc.print_mem_usage()
    out = capsys.readouterr().out
    assert 'bytes' in out


def test_manual_seed_reproducible():
    dsc.manual_seed(1234)
    a = dsc.randn(32).numpy()
    dsc.manual_seed(1234)
    b = dsc.randn(32).numpy()
    assert np.allclose(a, b)
