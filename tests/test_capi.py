"""Python-level tests of the C-ABI surface (dsc_tpu.capi): the same handle
protocol the C++ shim drives (cpp/src/dsc_shim.cpp). The full C++ harness
runs via ``make -C cpp test``."""

import numpy as np

from dsc_tpu import capi

from conftest import all_close


def test_roundtrip_buffer():
    x = np.random.randn(3, 4).astype(np.float32)
    h = capi.tensor_from_buffer(x.tobytes(), 0, (3, 4))
    assert capi.tensor_shape(h) == (3, 4)
    assert capi.tensor_dtype(h) == 0
    back = np.frombuffer(capi.tensor_to_buffer(h), dtype=np.float32).reshape(3, 4)
    assert np.array_equal(back, x)
    capi.tensor_free(h)


def test_ops_through_handles():
    x = np.random.randn(8).astype(np.float32)
    hx = capi.tensor_from_buffer(x.tobytes(), 0, (8,))
    hy = capi.unary_op('exp', hx)
    got = np.frombuffer(capi.tensor_to_buffer(hy), dtype=np.float32)
    assert all_close(got, np.exp(x))

    hs = capi.binary_scalar('mul', hx, 2.0, 0.0, 0, 0)
    got = np.frombuffer(capi.tensor_to_buffer(hs), dtype=np.float32)
    assert all_close(got, x * 2.0)

    hr = capi.reduce_op('sum', hx, -1, 0)
    got = np.frombuffer(capi.tensor_to_buffer(hr), dtype=np.float32)
    assert all_close(got, np.asarray([x.sum()]))

    for h in (hx, hy, hs, hr):
        capi.tensor_free(h)


def test_fft_through_handles():
    x = np.random.randn(64).astype(np.float32)
    hx = capi.tensor_from_buffer(x.tobytes(), 0, (64,))
    hf = capi.fft_op('rfft', hx, -1, -1)
    got = np.frombuffer(capi.tensor_to_buffer(hf), dtype=np.complex64)
    assert all_close(got, np.fft.rfft(x).astype(np.complex64))
    hb = capi.fft_op('irfft', hf, -1, -1)
    got = np.frombuffer(capi.tensor_to_buffer(hb), dtype=np.float32)
    assert all_close(got, x, eps=1e-4)


def test_slices_through_handles():
    NONE = 2**31 - 1
    x = np.random.randn(5, 5).astype(np.float32)
    h = capi.tensor_from_buffer(x.tobytes(), 0, (5, 5))
    # x[1, ::-1]
    hs = capi.get_slice(h, (1, NONE), (1, NONE), (1, -1), (1, 0))
    got = np.frombuffer(capi.tensor_to_buffer(hs), dtype=np.float32)
    assert all_close(got, x[1, ::-1])
    # x[2:4, 1] = [9, 9]
    hv = capi.tensor_from_buffer(
        np.asarray([9.0, 9.0], np.float32).tobytes(), 0, (2,)
    )
    capi.set_slice(h, hv, (2, 1), (4, 1), (1, 1), (0, 1))
    got = np.frombuffer(capi.tensor_to_buffer(h), dtype=np.float32).reshape(5, 5)
    x[2:4, 1] = 9.0
    assert all_close(got, x)
