"""Test harness configuration.

Mirrors the reference suite's fixtures (test_ops.py:16-35): one dsc.init per
session, dsc.clear() after each test, and the all_close oracle helper
(atol=rtol=1e-5, equal_nan).

Tests run on the CPU backend with 8 virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so sharding tests
exercise a real multi-device mesh without TPU hardware (SURVEY §4
implication). Set DSC_TEST_TPU=1 to run against the real chip instead.
"""

import os

import numpy as np
import pytest

if not os.environ.get('DSC_TEST_TPU'):
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    )
    import jax

    # The axon sitecustomize imports jax at interpreter startup, so a plain
    # env var is too late — go through the config API.
    jax.config.update('jax_platforms', 'cpu')

import dsc_tpu as dsc  # noqa: E402

# Modules auto-marked `slow` (skipped by CI's -m "not slow" fast job,
# .github/workflows/tests.yml): the interpret-mode Pallas suites — every
# simulated DMA step of the big-n streaming kernels runs in the
# emulator — plus the randomized fuzz sweep. The full suite runs
# locally / pre-release (~30 min on 2 cores).
SLOW_MODULES = {
    'test_stream_t', 'test_pallas_fft', 'test_pallas_map', 'test_packed',
    'test_packed_fused', 'test_fuzz', 'test_sharding', 'test_compile',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope='session', autouse=True)
def session_fixture():
    dsc.init(int(2**32), int(2**30))
    yield


@pytest.fixture(autouse=True)
def teardown_fixture():
    yield
    dsc.clear()


def all_close(actual, target, eps=1e-5):
    diffs = ~np.isclose(actual, target, atol=eps, rtol=eps, equal_nan=True)
    return np.asarray(actual)[diffs].size == 0


def random_nd(shape, dtype=np.float64):
    x = np.random.randn(*tuple(shape))
    if np.dtype(dtype).kind == 'c':
        x = x + 1j * np.random.randn(*tuple(shape))
    return x.astype(dtype)


DTYPES = [np.float32, np.float64, np.complex64, np.complex128]
DSC_DTYPES = {
    np.float32: dsc.Dtype.F32,
    np.float64: dsc.Dtype.F64,
    np.complex64: dsc.Dtype.C32,
    np.complex128: dsc.Dtype.C64,
}


@pytest.fixture
def oracle():
    return all_close
